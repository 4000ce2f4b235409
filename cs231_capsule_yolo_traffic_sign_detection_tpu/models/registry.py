"""Model registry: model name -> flax module construction.

Mirrors the reference's model/loss/predict/metric registry
(reference main.py:258-265); the loss/predict/metric wiring lives in
`train.driver` to avoid import cycles.  NOTE the reference defines the
'darkcapsule' registry row twice (main.py:263-264) — dict semantics
make the second row (metric = detect_and_recog_acc) the effective one;
we reproduce that effective binding.
"""

from .convnet import ConvNet
from .capsule_net import CapsuleNet
from .darknet import DarkNet
from .darkcapsule import DarkCapsuleNet

MODEL_REGISTRY = {
    "cnn": ConvNet,
    "capsule": CapsuleNet,
    "darknet_d": DarkNet,
    "darknet_r": DarkNet,
    "darkcapsule": DarkCapsuleNet,
}


def resolve_routing_impl(impl, model=None):
    """'auto' -> the fused Pallas kernel where it wins, XLA elsewhere.

    Measured on TPU v5e (scripts/bench_routing.py, BASELINE.md): at the
    CapsuleNet shape (1296 nodes -> 43 caps x 16 dims) the fused kernel
    wins 1.7x fwd / 2.4x fwd+bwd with ~5e-7 parity, so it is the TPU
    default for 'capsule'.  At the darkcapsule shape (512 nodes -> 1
    cap x 5 dims per grid cell) the tiny contraction is XLA-friendly
    and the kernel LOSES ~3-4x, so 'auto' keeps XLA there.  (With a
    single output capsule CapsuleRouting now short-circuits to the
    closed form ops.capsule.routed_single_capsule regardless of this
    choice — the impl only governs the n_caps > 1 shapes.)  On CPU/GPU
    backends interpret-mode Pallas would be far slower than XLA, so
    'auto' keeps XLA off-TPU.  Explicit 'pallas'/'xla' always wins.
    """
    if impl != "auto":
        return impl
    if model == "darkcapsule":
        return "xla"
    import jax

    if jax.default_backend() == "tpu":
        return "pallas"
    # tunneled TPU backends may report a different platform name; the
    # device kind still identifies real TPU hardware
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = ""
    return "pallas" if "tpu" in str(kind).lower() else "xla"


def _compute_dtype(params):
    import jax.numpy as jnp

    name = str(params.get("compute_dtype", "float32")).lower()
    if name in ("float32", "f32", ""):
        # None = flax dtype inference (promote inputs/params), NOT a
        # forced f32 cast — the f64 parity tests rely on f64 flowing
        # through unmolested
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name == "int8":
        # quantized SERVING path (ops/quant.py, engaged by predict/
        # bench): modules are built f32 and quantized post-restore;
        # training rejects int8 in the Trainer
        return None
    raise ValueError(f"unknown compute dtype {name!r}")


def build_model(params, routing_impl=None):
    """Instantiate the flax module for `params.model`."""
    name = params.model
    impl = resolve_routing_impl(
        routing_impl or params.get("routing_impl", "auto"), model=name)
    dropout = float(params.get("dropout", 0.0))
    dtype = _compute_dtype(params)
    if name == "cnn":
        return ConvNet(n_classes=params.n_classes, dropout=dropout,
                       dtype=dtype)
    if name == "capsule":
        return CapsuleNet(n_classes=params.n_classes, routing_impl=impl,
                          dtype=dtype)
    remat = bool(params.get("remat", False))
    if name in ("darknet_d", "darknet_r"):
        return DarkNet(
            n_boxes=params.n_boxes, n_classes=params.n_classes,
            dropout=dropout, dtype=dtype, remat=remat,
        )
    if name == "darkcapsule":
        return DarkCapsuleNet(n_grid=params.n_grid, routing_impl=impl,
                              dtype=dtype, remat=remat)
    raise ValueError(f"unknown model {name!r}")

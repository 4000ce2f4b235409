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


def resolve_routing_impl(impl):
    """'auto' -> the fused Pallas kernel on TPU, XLA elsewhere.

    The Pallas routing kernel (ops/routing_pallas.py) is the TPU
    default: it wins over the XLA path on hardware (BASELINE.md) and is
    parity-tested fwd+bwd.  On CPU/GPU backends interpret-mode Pallas
    would be far slower than XLA, so 'auto' keeps XLA there.
    """
    if impl != "auto":
        return impl
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


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
    raise ValueError(f"unknown compute dtype {name!r}")


def build_model(params, routing_impl=None):
    """Instantiate the flax module for `params.model`."""
    name = params.model
    impl = resolve_routing_impl(
        routing_impl or params.get("routing_impl", "auto"))
    dropout = float(params.get("dropout", 0.0))
    dtype = _compute_dtype(params)
    if name == "cnn":
        return ConvNet(n_classes=params.n_classes, dropout=dropout,
                       dtype=dtype)
    if name == "capsule":
        return CapsuleNet(n_classes=params.n_classes, routing_impl=impl,
                          dtype=dtype)
    if name in ("darknet_d", "darknet_r"):
        return DarkNet(
            n_boxes=params.n_boxes, n_classes=params.n_classes,
            dropout=dropout, dtype=dtype,
        )
    if name == "darkcapsule":
        return DarkCapsuleNet(n_grid=params.n_grid, routing_impl=impl,
                              dtype=dtype)
    raise ValueError(f"unknown model {name!r}")

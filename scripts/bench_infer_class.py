"""Classifier serving throughput: cnn + capsule e2e inference.

Completes the serving picture next to bench.py's detector headline:
jitted forward (conv stack / routing) + argmax, device-loop methodology
(one dispatch, ITERS steps chained on device, D2H-scalar barrier, RTT
subtracted).  The reference counterpart is the torch no-grad forward
of predict_fns.py:60-73 on CPU, executed from /root/reference.

Run serially on the chip:
    python scripts/bench_infer_class.py [cnn|capsule|all] 2>log
Prints one JSON line per model.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (probe + reference machinery pattern)

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(model_name):
    import jax
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        ConvNet, CapsuleNet)
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models.registry \
        import resolve_routing_impl

    # BENCH_DTYPE=bfloat16 serves the conv stacks bf16 (MXU-native);
    # squash/routing stay f32 inside the modules regardless (same
    # policy as training).  Default f32 = exact reference numerics.
    # Unknown values are an error, not a silent f32 fallback.
    name = os.environ.get("BENCH_DTYPE", "float32").lower()
    if name in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    elif name in ("float32", "f32"):
        dtype = None
    else:
        raise SystemExit(f"BENCH_DTYPE={name!r} not supported here "
                         "(float32 | bfloat16)")
    if model_name == "cnn":
        model = ConvNet(n_classes=43, dropout=0.0, dtype=dtype)
    else:
        model = CapsuleNet(
            n_classes=43, dtype=dtype,
            routing_impl=resolve_routing_impl("auto", model="capsule"))
    x0 = jnp.zeros((BATCH, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x0, train=False)

    def step(variables, x):
        y = model.apply(variables, x, train=False)
        return jnp.sum(jnp.argmax(y, axis=-1).astype(jnp.float32))

    @jax.jit
    def pipeline_n(variables, x):
        def body(_, acc):
            return acc + step(variables, x + acc * 1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, 32, 32, 3).astype(np.float32))
    return pipeline_n, variables, x


def measure(model_name):
    pipeline_n, variables, x = build(model_name)
    t0 = time.perf_counter()
    v = float(pipeline_n(variables, x))
    log(f"[bench_class] {model_name}: compile+first "
        f"{time.perf_counter()-t0:.1f}s (checksum {v:.0f})")
    dt = bench.device_chain_seconds(pipeline_n, (variables, x))
    ips = BATCH * ITERS / dt
    log(f"[bench_class] {model_name}: {ITERS} x batch {BATCH} in "
        f"{dt:.3f}s -> {ips:.1f} img/s")
    return ips


def reference_cpu(model_name, n_images=8):
    """Torch no-grad forward from /root/reference on CPU."""
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        import torch

        ref_models = importlib.import_module("models")

        class P:
            device = "cpu"
            dropout = 0.0
            n_classes = 43
            use_recon = False
            model = model_name

        torch.set_num_threads(os.cpu_count() or 1)
        net = (ref_models.ConvNet(P()) if model_name == "cnn"
               else ref_models.CapsuleNet(P()))
        net.eval()
        x = torch.from_numpy(
            np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32))
        with torch.no_grad():
            net(x)  # warmup
            t0 = time.perf_counter()
            for _ in range(n_images):
                net(x)
            dt = time.perf_counter() - t0
        ips = n_images / dt
        log(f"[bench_class] reference {model_name} cpu: {ips:.2f} img/s")
        return ips
    except Exception as e:
        log(f"[bench_class] reference {model_name} failed: "
            f"{type(e).__name__}: {e}")
        return None
    finally:
        sys.path.remove("/root/reference")


def main():
    global BATCH, ITERS

    import jax

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which not in ("all", "cnn", "capsule"):
        raise SystemExit(f"unknown model {which!r} (cnn | capsule | all)")
    models = ["cnn", "capsule"] if which == "all" else [which]

    suffix = ""  # CPU-fallback numbers must never look like TPU ones
    if os.environ.get("BENCH_FORCE_CPU") or not bench.tpu_available():
        log("[bench_class] TPU unavailable -> CPU fallback")
        jax.config.update("jax_platforms", "cpu")
        BATCH, ITERS = 16, 2
        suffix = "_cpu_fallback"
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:
        log(f"[bench_class] compilation cache unavailable: {e}")

    dtype = os.environ.get("BENCH_DTYPE", "float32").lower()
    for m in models:
        ips = measure(m)
        base = reference_cpu(m)
        print(json.dumps({
            "metric": f"gtsrb_{m}_inference_throughput{suffix}",
            "value": round(ips, 2),
            "unit": "img/s",
            "dtype": dtype,  # bf16 rows must be distinguishable from f32
            "batch": BATCH,
            "vs_baseline": round(ips / base, 2) if base else -1.0,
        }))


if __name__ == "__main__":
    main()

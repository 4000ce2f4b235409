"""Benchmark the optional on-device NMS extension.

The reference has NO suppression beyond confidence thresholding
(reference utils.py:288-334), so `ops.decode.nms_mask` is an extension
that is OFF by default everywhere.  This harness measures what turning
it on costs: the full e2e pipeline (darknet_r @ 448 forward + full-width
grid decode) with and without greedy NMS over the conf-sorted candidate
list, same methodology as bench.py (device-loop, D2H-scalar barrier).

Run serially on the chip:
    python scripts/bench_nms.py 2>bench_nms.log

Prints one JSON line with both throughputs and the relative cost.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (repo-root bench harness: probe + constants)

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
SIZE = int(os.environ.get("BENCH_SIZE", "448"))
N_BOXES = 1
N_CLASSES = 43
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dtype="bfloat16", nms=False):
    import jax
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import decode

    model = DarkNet(n_boxes=N_BOXES, n_classes=N_CLASSES, dropout=0.0)
    x0 = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if dtype == "bfloat16":
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, variables)

    g = SIZE // 32

    def step(variables, x):
        if dtype == "bfloat16":
            x = x.astype(jnp.bfloat16)
        y = model.apply(variables, x, train=False).astype(jnp.float32)
        d = decode.decode_grid(
            y, n_classes=N_CLASSES, n_boxes=N_BOXES, img_size=SIZE,
            max_boxes=g * g * N_BOXES, conf_th=0.5)
        valid = d["valid"]
        if nms:
            valid = decode.nms_mask(d["xy"], d["conf"], valid, iou_th=0.5)
        return (jnp.sum(d["conf"]) + jnp.sum(d["xy"])
                + jnp.sum(valid.astype(jnp.float32)))

    @jax.jit
    def pipeline_n(variables, x):
        def body(_, acc):
            return acc + step(variables, x + acc * 1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))
    if dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
    return pipeline_n, variables, x


def measure(tag, dtype, nms):
    pipeline_n, variables, x = build(dtype, nms)
    t0 = time.perf_counter()
    v = float(pipeline_n(variables, x))  # compile + warmup
    log(f"[bench_nms] {tag}: compile+first {time.perf_counter()-t0:.1f}s "
        f"(checksum {v:.2f})")
    dt = bench.device_chain_seconds(pipeline_n, (variables, x))
    ips = BATCH * ITERS / dt
    log(f"[bench_nms] {tag}: {ITERS} x batch {BATCH} in {dt:.3f}s "
        f"-> {ips:.1f} img/s")
    return ips


def main():
    import jax

    metric = "gtsdb_e2e_inference_with_nms"
    if os.environ.get("BENCH_FORCE_CPU") or not bench.tpu_available():
        log("[bench_nms] TPU unavailable -> CPU (numbers not comparable)")
        jax.config.update("jax_platforms", "cpu")
        global BATCH, ITERS
        BATCH, ITERS = 2, 2
        metric += "_cpu_fallback"  # never record a CPU number as on-chip
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:
        log(f"[bench_nms] compilation cache unavailable: {e}")

    dtype = bench.normalize_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    if dtype == "int8":
        raise SystemExit("bench_nms measures the f32/bf16 pipeline; "
                         "use bench.py for int8 serving")
    base = measure("decode only", dtype, nms=False)
    with_nms = measure("decode+NMS", dtype, nms=True)
    print(json.dumps({
        "metric": metric,
        "value": round(with_nms, 2),
        "unit": "img/s",
        "dtype": dtype,
        "batch": BATCH,
        "without_nms": round(base, 2),
        "nms_cost_pct": round(100.0 * (1 - with_nms / base), 2),
    }))


if __name__ == "__main__":
    main()

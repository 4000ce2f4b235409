"""Serving latency: per-request time of the detector pipeline vs batch.

Throughput (bench.py) answers the offline/bulk question; this answers
the online-serving one: how long does ONE batch of the e2e pipeline
(darknet_r forward + full-width grid decode) take on the chip at small
batch sizes?  Methodology matches bench.py: ITERS pipeline executions
chained inside one compiled program (device-loop), timed by a D2H
scalar fetch with the tunnel RTT subtracted — so the reported ms/step
is pure device time, the number an on-TPU serving process would see.

Run serially on the chip:
    python scripts/bench_latency.py [batches...] [--dtype bf16|f32|int8]
    # default batches: 1 8 32 128
Prints one JSON line per batch size.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (shared device-loop timing methodology)

SIZE = 448
N_BOXES = 1
N_CLASSES = 43
ITERS = 20

DTYPES = ("bfloat16", "float32", "int8")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_args(argv):
    """[batches...] [--dtype bf16|f32|int8 | --dtype=...] -> (batches,
    dtype).  Unknown dtypes are an error, not a silent f32 run."""
    batches, dtype = [], "bfloat16"
    it = iter(argv)
    for a in it:
        if a.startswith("--dtype"):
            v = a.split("=", 1)[1] if "=" in a else next(it, "")
            dtype = {"bf16": "bfloat16", "f32": "float32"}.get(v, v)
            if dtype not in DTYPES:
                raise SystemExit(
                    f"unknown dtype {v!r} (want bf16|f32|int8)")
        else:
            batches.append(int(a))
    return (batches or [1, 8, 32, 128]), dtype


def bench_batch(batch, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import decode
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant

    model = DarkNet(n_boxes=N_BOXES, n_classes=N_CLASSES, dropout=0.0)
    x0 = jnp.zeros((batch, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    if dtype == "bfloat16":
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, variables)
    elif dtype == "int8":
        cal = jnp.asarray(np.random.RandomState(0).rand(
            min(batch, 32), SIZE, SIZE, 3).astype(np.float32))
        variables = quant.quantize_darknet(variables, x_cal=cal)

    def step(variables, x):
        if dtype == "int8":
            y = quant.darknet_int8_resident_apply(
                variables, x.astype(jnp.float32),
                n_boxes=N_BOXES, n_classes=N_CLASSES)
        else:
            if dtype == "bfloat16":
                x = x.astype(jnp.bfloat16)
            y = model.apply(variables, x, train=False)
        y = y.astype(jnp.float32)
        g = SIZE // 32
        d = decode.decode_grid(
            y, n_classes=N_CLASSES, n_boxes=N_BOXES, img_size=SIZE,
            max_boxes=g * g * N_BOXES, conf_th=0.5)
        return (jnp.sum(d["conf"]) + jnp.sum(d["xy"])
                + jnp.sum(d["classes"]).astype(jnp.float32))

    @jax.jit
    def pipeline_n(variables, x):
        def body(_, acc):
            return acc + step(variables, x + acc * 1e-30)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, SIZE, SIZE, 3).astype(np.float32))
    if dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)

    t0 = time.perf_counter()
    v = float(pipeline_n(variables, x))
    log(f"[latency] b={batch} compile+first: {time.perf_counter()-t0:.1f}s")

    dt = bench.device_chain_seconds(pipeline_n, (variables, x))
    ms = dt / ITERS * 1e3
    return {"batch": batch, "dtype": dtype,
            "ms_per_batch": round(ms, 3),
            "ms_per_image": round(ms / batch, 3),
            "img_per_s": round(batch * ITERS / dt, 1),
            "checksum": round(v, 2)}


def main():
    batches, dtype = parse_args(sys.argv[1:])

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    log(f"[latency] backend {jax.default_backend()} dtype {dtype}")

    rows = []
    for b in batches:
        try:
            r = bench_batch(b, dtype)
        except Exception as e:
            print(json.dumps({"batch": b, "dtype": dtype,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        rows.append(r)
        print(json.dumps(r), flush=True)
    if len(rows) > 1:
        log("| batch | ms/batch | ms/img | img/s |")
        log("|---|---|---|---|")
        for r in rows:
            log("| {batch} | {ms_per_batch} | {ms_per_image} "
                "| {img_per_s} |".format(**r))


if __name__ == "__main__":
    main()

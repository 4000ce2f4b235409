"""Training-step throughput benchmark (TPU).

Measures steady-state images/sec of the full compiled train step
(forward + loss + backward + Adam + BN update) per model config.
Timing via device-scalar fetch (see bench.py for why: over the
tunneled backend only a D2H fetch actually waits).

Usage:
    python scripts/bench_train.py [model|all] [batch] [dtype] [remat]
    # e.g. python scripts/bench_train.py all 32 bfloat16
    # e.g. python scripts/bench_train.py darknet_r 256 bfloat16 remat
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache: reruns skip the multi-minute compiles
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer

CONFIGS = {
    "cnn": dict(n_classes=43),
    "capsule": dict(n_classes=43),
    "darknet_r": dict(n_boxes=1, n_classes=43, darknet_input=448, n_grid=14),
    "darknet_d": dict(n_boxes=2, n_classes=0, darknet_input=448, n_grid=14),
    "darkcapsule": dict(n_classes=43, n_grid=7, darknet_input=224),
}


def bench_one(model, batch, dtype="float32", iters=10, remat=False):
    kw = dict(
        model=model, batch_size=batch, lr_runtime=1e-3, lr_decay=0.1,
        n_epochs=1, eval_every=1, train_frac=1, recon=True,
        recon_coef=5e-4, dropout=0.0, l_coord=5.0, l_noobj=0.5,
        n_boxes=2, n_grid=14, darknet_input=448, capsule_input=32,
        compute_dtype=dtype, remat=remat,
    )
    kw.update(CONFIGS[model])
    p = Params(**kw)
    trainer = Trainer(p, verbose=False)
    x, y, _, _ = synthetic_dataset(model, p, n_train=batch, n_eval=1)
    # match the driver's HBM-resident dataset dtype (bf16-resident
    # batches under the bf16 policy — the model's entry cast is a no-op)
    x = jnp.asarray(x[:batch], trainer._x_dtype)
    y = jnp.asarray(y[:batch])

    t0 = time.perf_counter()
    state, loss, _, _ = trainer.train_step(trainer.state, x, y, 1e-3)
    _ = float(loss)
    compile_s = time.perf_counter() - t0

    for _ in range(3):
        state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
    _ = float(loss)
    dt = time.perf_counter() - t0
    return {
        "model": model, "batch": batch, "dtype": dtype,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(dt / iters * 1e3, 2),
        "img_per_s": round(batch * iters / dt, 1),
    }


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "darknet_r"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    remat = len(sys.argv) > 4 and sys.argv[4] in ("remat", "1", "true")

    models = list(CONFIGS) if model == "all" else [model]
    results = []
    for m in models:
        try:
            r = bench_one(m, batch, dtype, remat=remat)
            r["remat"] = remat
        except Exception as e:  # e.g. OOM at large batch: keep going
            print(json.dumps({"model": m, "batch": batch, "dtype": dtype,
                              "remat": remat,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) > 1:
        print("\n| model | batch | dtype | ms/step | img/s |")
        print("|---|---|---|---|---|")
        for r in results:
            print("| {model} | {batch} | {dtype} | {ms_per_step} "
                  "| {img_per_s} |".format(**r))


if __name__ == "__main__":
    main()

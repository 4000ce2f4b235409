"""Device-trace profile of the full compiled train step.

Same methodology as the serving profile (scripts/profile_infer.py +
scripts/profile_report.py), aimed at training: builds the Trainer's
compiled step (forward + loss + backward + Adam + BN update) for one
model config, captures a jax.profiler device trace of a few steady
steps, then joins per-fusion device times against the optimized HLO —
a "where the training time goes" table for BASELINE.md.

Usage:
    python scripts/profile_train.py [model] [batch] [dtype]
    # e.g. python scripts/profile_train.py darknet_r 128 bfloat16
"""

import glob
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TRACE_DIR = "/tmp/cyt_trace_train"


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from bench_train import CONFIGS, bench_one  # noqa: F401 (CONFIGS)
    from profile_report import device_op_times, fusion_roots
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        synthetic_dataset,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
        Trainer,
    )

    model = sys.argv[1] if len(sys.argv) > 1 else "darknet_r"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    kw = dict(
        model=model, batch_size=batch, lr_runtime=1e-3, lr_decay=0.1,
        n_epochs=1, eval_every=1, train_frac=1, recon=True,
        recon_coef=5e-4, dropout=0.0, l_coord=5.0, l_noobj=0.5,
        n_boxes=2, n_grid=14, darknet_input=448, capsule_input=32,
        compute_dtype=dtype,
    )
    kw.update(CONFIGS[model])
    p = Params(**kw)
    trainer = Trainer(p, verbose=False)
    x, y, _, _ = synthetic_dataset(model, p, n_train=batch, n_eval=1)
    # match the driver's HBM-resident dataset dtype (bf16-resident
    # under the bf16 policy, train/driver.py _x_dtype)
    x = jnp.asarray(x[:batch], trainer._x_dtype)
    y = jnp.asarray(y[:batch])

    t0 = time.perf_counter()
    state, loss, _, _ = trainer.train_step(trainer.state, x, y, 1e-3)
    print(f"[profile] compile+first step {time.perf_counter()-t0:.1f}s "
          f"(loss {float(loss):.4f})", file=sys.stderr)
    for _ in range(3):
        state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
    _ = float(loss)

    traced = False
    try:
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(3):
                state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
            _ = float(loss)
        traced = True
    except Exception as e:
        print(f"[profile] profiler unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # optimized HLO of the very train step we just drove
    hlo = trainer.train_step.lower(state, x, y, 1e-3).compile().as_text()
    roots = fusion_roots(hlo)
    print(f"[profile] HLO: {len(hlo.splitlines())} lines, "
          f"{len(roots)} named ops", file=sys.stderr)

    files = sorted(glob.glob(
        os.path.join(TRACE_DIR, "plugins/profile/*/*.trace.json.gz")))
    if not (traced and files):
        print("no trace captured; analytic bench only "
              "(scripts/bench_train.py)")
        return
    tp = files[-1]
    dur, cnt = device_op_times(tp)
    # Drop the per-step span markers (named "0","1",...) and whole-module
    # spans (jit_*): they cover the entire step, so counting them doubles
    # (triples) the total against the per-op track.
    for name in [n for n in dur if n.isdigit() or n.startswith("jit_")]:
        del dur[name], cnt[name]
    steps = max(cnt.values()) if cnt else 1
    total = sum(dur.values())
    print(f"trace: {tp}")
    print(f"model={model} batch={batch} dtype={dtype}")
    print(f"device total: {total/1e3/steps:.2f} ms/step (x{steps} steps)\n")
    print(f"{'ms/step':>8} {'%':>5}  op")
    shown = 0.0
    for name, d in dur.most_common(40):
        if name.startswith("jit_"):
            continue
        kind, root = roots.get(name, ("?", "?"))
        ms = d / 1e3 / steps
        pct = 100.0 * d / total if total else 0
        shown += d
        print(f"{ms:8.3f} {pct:5.1f}  {name} [{kind}] {root[:110]}")
    print(f"\n(top ops cover {100.0*shown/total:.0f}% of device time)")


if __name__ == "__main__":
    main()

"""MFU estimate for the full compiled train step.

Same methodology as the serving estimate (scripts/mfu.py): analytic
FLOPs/image from XLA's own cost model on the CPU backend — here for the
complete train step (forward + loss + backward + Adam + BN update) that
scripts/bench_train.py times — combined with a measured img/s against
the TPU v5e bf16 peak (197 TFLOP/s).

Usage:
    python scripts/mfu_train.py [model] [batch] [dtype] [measured_img_per_s]
    # e.g. python scripts/mfu_train.py darknet_r 128 bfloat16 1226
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

V5E_PEAK_BF16 = 197e12


def main():
    from bench_train import CONFIGS
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
    ips = float(sys.argv[4]) if len(sys.argv) > 4 else None

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
    x = jnp.asarray(x[:batch], jnp.float32)
    y = jnp.asarray(y[:batch])

    compiled = trainer.train_step.lower(trainer.state, x, y, 1e-3).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    per_img = flops / batch
    print(f"{model} train step @ batch {batch} ({dtype}): "
          f"{flops/1e9:.2f} GFLOP/step, {per_img/1e9:.3f} GFLOP/image")
    if ips:
        tps = per_img * ips
        print(f"measured {ips:.0f} img/s -> {tps/1e12:.1f} TFLOP/s "
              f"= {100*tps/V5E_PEAK_BF16:.1f}% of v5e bf16 peak")


if __name__ == "__main__":
    main()

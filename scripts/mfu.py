"""MFU estimate for the flagship inference pipeline (darknet_r @ 448).

Computes analytic FLOPs/image from XLA's own cost model on the CPU
backend (`compiled.cost_analysis()` — backend-independent HLO flop
count of the same forward+decode program bench.py times), then combines
it with a measured img/s to report model FLOPs utilization against the
TPU v5e peak (197 TFLOP/s bf16).

Usage: python scripts/mfu.py [measured_img_per_s]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (  # noqa: E402
    DarkNet,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (  # noqa: E402
    decode,
)

BATCH, SIZE, N_BOXES, N_CLASSES = 32, 448, 1, 43
V5E_PEAK_BF16 = 197e12


def main():
    ips = float(sys.argv[1]) if len(sys.argv) > 1 else None

    model = DarkNet(n_boxes=N_BOXES, n_classes=N_CLASSES, dropout=0.0)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def step(variables, x):
        y = model.apply(variables, x, train=False)
        g = SIZE // 32
        d = decode.decode_grid(y, n_classes=N_CLASSES, n_boxes=N_BOXES,
                               img_size=SIZE, max_boxes=g * g * N_BOXES,
                               conf_th=0.5)
        return (jnp.sum(d["conf"]) + jnp.sum(d["xy"])
                + jnp.sum(d["classes"]).astype(jnp.float32))

    compiled = jax.jit(step).lower(variables, x).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost["flops"])
    per_img = flops / BATCH
    print(f"analytic pipeline FLOPs: {flops:.3e} / batch {BATCH} "
          f"= {per_img:.3e} per image ({per_img/1e9:.2f} GFLOP/img)")
    if ips:
        achieved = ips * per_img
        print(f"at {ips:.0f} img/s: {achieved/1e12:.2f} TFLOP/s "
              f"-> MFU {100*achieved/V5E_PEAK_BF16:.1f}% of v5e bf16 peak "
              f"({V5E_PEAK_BF16/1e12:.0f} TFLOP/s)")


if __name__ == "__main__":
    main()

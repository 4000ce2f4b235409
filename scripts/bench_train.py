"""Training-step throughput benchmark (TPU).

Measures steady-state images/sec of the full compiled train step
(forward + loss + backward + Adam + BN update) for a chosen model.
Timing via device-scalar fetch (see bench.py for why).

Usage: python scripts/bench_train.py [model] [batch]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
    Trainer, model_input_shape,
)

CONFIGS = {
    "cnn": dict(n_classes=43),
    "capsule": dict(n_classes=43),
    "darknet_r": dict(n_boxes=1, n_classes=43, darknet_input=448, n_grid=14),
    "darknet_d": dict(n_boxes=2, n_classes=0, darknet_input=448, n_grid=14),
    "darkcapsule": dict(n_classes=43, n_grid=7, darknet_input=224),
}


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "darknet_r"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    kw = dict(
        model=model, batch_size=batch, lr_runtime=1e-3, lr_decay=0.1,
        n_epochs=1, eval_every=1, train_frac=1, recon=True,
        recon_coef=5e-4, dropout=0.0, l_coord=5.0, l_noobj=0.5,
        n_boxes=2, n_grid=14, darknet_input=448, capsule_input=32,
    )
    kw.update(CONFIGS[model])
    p = Params(**kw)
    trainer = Trainer(p, verbose=False)
    x, y, _, _ = synthetic_dataset(model, p, n_train=batch, n_eval=1)
    x = jnp.asarray(x[:batch], jnp.float32)
    y = jnp.asarray(y[:batch])

    t0 = time.perf_counter()
    state, loss, _, _ = trainer.train_step(trainer.state, x, y, 1e-3)
    _ = float(loss)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    iters = 10
    for _ in range(3):
        state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, _, _ = trainer.train_step(state, x, y, 1e-3)
    _ = float(loss)
    dt = time.perf_counter() - t0
    print(f"{model} train: {iters} x batch {batch} in {dt:.3f}s -> "
          f"{batch * iters / dt:.1f} img/s ({dt/iters*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()

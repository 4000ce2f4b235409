"""Capsule interpretability: perturb each of the 16 dims of the true
class capsule by -0.25..+0.25 (11 steps) and decode to image grids.

Reference parity: capsule_interpret.py:54-68 — writes img/orig.png and
img/{dim}-{step}.png reconstruction sweeps.
"""

import argparse
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

import cs231_capsule_yolo_traffic_sign_detection_tpu as cyt
from cs231_capsule_yolo_traffic_sign_detection_tpu import config
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import loader
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer


def main(sample_index=90, model_dir=None, restore_file="best"):
    import cv2

    param_dir = model_dir or "./experiments/capsule"
    params = cyt.Params(os.path.join(param_dir, "params.json"))
    params.model = "capsule"
    params.recon = True
    params.recon_coef = 5e-4
    params.train_frac = 1
    params.lr_runtime = 1e-3

    data_dir = config.data_dir["capsule"]
    try:
        with open(data_dir + "/eval.p", "rb") as f:
            x, y = pickle.load(f)
    except (FileNotFoundError, OSError):
        print("[interpret] dataset absent; using synthetic eval data")
        _, _, x, y = loader.synthetic_dataset("capsule", params, 4, 128)

    trainer = Trainer(params, verbose=False)
    try:
        from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
            checkpoint as ckpt,
        )

        path = ckpt.checkpoint_path(param_dir, restore_file)
        print("Restoring parameters from {}".format(path))
        trainer.restore(path, param_dir, params.train_frac)
    except FileNotFoundError:
        print("[interpret] no checkpoint found; using random init")

    xx = jnp.asarray(x[sample_index:sample_index + 1], jnp.float32)
    yy = jnp.asarray(np.array(y[sample_index]).reshape(1,))

    model, variables = trainer.model, trainer.state.variables
    caps = model.apply(variables, xx, method=model.capsules)
    t = np.asarray(caps[jnp.arange(1), yy])[0]          # (16,)

    decode = jax.jit(
        lambda v, t: model.apply(v, t, method=model.decode))

    os.makedirs("img", exist_ok=True)
    cv2.imwrite("img/orig.png", np.clip(
        np.asarray(xx[0]) * 128.0 + 128, 0, 255).astype(np.uint8))
    cc = np.arange(11) * 0.05 - 0.25
    for v in range(16):
        for i, c in enumerate(cc):
            t_pert = t.copy()
            t_pert[v] += c
            decoded = decode(variables, jnp.asarray(t_pert[None]))
            img = np.clip(np.asarray(decoded)[0] * 128.0 + 128,
                          0, 255).astype(np.uint8)
            cv2.imwrite(f"img/{v}-{i}.png", img)
    print("wrote img/{dim}-{step}.png sweeps")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sample_index", nargs="?", type=int, default=90,
                    help="eval-set sample to perturb (default 90, "
                         "like the reference)")
    ap.add_argument("--model_dir", default=None,
                    help="experiment dir with params.json + checkpoint "
                         "(default ./experiments/capsule)")
    ap.add_argument("--restore", default="best", choices=["best", "last"],
                    help="which checkpoint to restore (default best)")
    a = ap.parse_args()
    main(a.sample_index, model_dir=a.model_dir, restore_file=a.restore)

"""Ablation curves: reload best checkpoints across train fractions and
compute pr/acc/auc on the test set.

Reference parity: plot_cnn_capsule.py:20-98 — the checkpoint layout
./experiments/{name}s/{name}{frac}/best.ckpt is preserved.
"""

import os
import pickle

import numpy as np

import cs231_capsule_yolo_traffic_sign_detection_tpu as cyt
from cs231_capsule_yolo_traffic_sign_detection_tpu import config
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import loader
from cs231_capsule_yolo_traffic_sign_detection_tpu.metrics import (
    recog_acc, recog_auc, recog_pr,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import class_pred


def load_params(model_dir, name):
    params = cyt.Params(os.path.join(model_dir, "params.json"))
    params.model = name
    params.recon = True
    params.recon_coef = 5e-4
    params.train_frac = 1
    params.lr_runtime = 1e-3
    return params


def plot_metrics(name):
    param_dir = "./experiments/" + name
    data_dir = config.data_dir[name]
    params = load_params(param_dir, name)

    try:
        with open(data_dir + "/test.p", "rb") as f:
            x, y = pickle.load(f)
    except (FileNotFoundError, OSError):
        print("[plot] dataset absent; using synthetic test data")
        _, _, x, y = loader.synthetic_dataset(name, params, 4, 64)

    prs, accs, aucs = [], [], []
    for fr in np.arange(0.1, 1.1, 0.1):
        model_dir = "./experiments/{}s/{}{:.1f}".format(name, name, fr)
        try:
            y_hat, _ = class_pred(x, model_dir, params, "best")
        except FileNotFoundError:
            print(f"[plot] missing checkpoint for frac {fr:.1f}; skipping")
            continue
        prs.append(recog_pr(y, y_hat, params))
        accs.append(recog_acc(y, y_hat, params))
        aucs.append(recog_auc(y, y_hat, params))
        print(accs[-1])

    np.save(f"{name}_prs.npy", prs)
    np.save(f"{name}_accs.npy", accs)
    np.save(f"{name}_aucs.npy", aucs)
    return prs, accs, aucs


if __name__ == "__main__":
    for name in ("cnn", "capsule"):
        plot_metrics(name)

"""Measure the torch reference's CPU training throughput.

Runs the reference driver (/root/reference, executed in place — never
copied) against the SAME deterministic synthetic GTSRB dataset our
framework uses, in a scratch working directory, and times one training
epoch.  Complements bench.py's inference baseline; results go into
BASELINE.md.

Usage: python scripts/run_reference_baseline.py [n_train]
"""

import json
import os
import pickle
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)

REF = "/root/reference"


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    work = "/tmp/refrun"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work + "/data/GTSRB", exist_ok=True)
    os.makedirs(work + "/experiments/cnn", exist_ok=True)

    # params.json: 1 epoch (config data; schema matches the reference)
    with open(work + "/experiments/cnn/params.json", "w") as f:
        json.dump({
            "batch_size": 64, "n_classes": 43, "lr": 1e-3,
            "n_epochs": 1, "dropout": 0.5, "lr_decay": 0.1,
        }, f)

    p = Params(model="cnn", n_classes=43)
    x_tr, y_tr, x_ev, y_ev = synthetic_dataset("cnn", p,
                                               n_train=n_train, n_eval=64)
    with open(work + "/data/GTSRB/train.p", "wb") as f:
        pickle.dump((x_tr, y_tr), f)
    with open(work + "/data/GTSRB/eval.p", "wb") as f:
        pickle.dump((x_ev, y_ev), f)

    # torchvision is imported (unused) by the reference's predict_fns;
    # it's not in this image — provide an empty stub on the path
    os.makedirs(work + "/stubs/torchvision", exist_ok=True)
    open(work + "/stubs/torchvision/__init__.py", "w").close()
    with open(work + "/stubs/torchvision/transforms.py", "w") as f:
        f.write("")
    # torchsummary likewise absent; the reference only prints a summary
    with open(work + "/stubs/torchsummary.py", "w") as f:
        f.write("def summary(model, input_shape=None, **kw):\n"
                "    print('[stub torchsummary]', type(model).__name__,"
                " input_shape)\n")
    # torch-0.4 compat shim: the reference's Flatten calls .view on a
    # non-contiguous tensor (models.py:10), which torch 2.x rejects;
    # fall back to .reshape exactly where 0.4 would have succeeded
    with open(work + "/stubs/sitecustomize.py", "w") as f:
        f.write(
            "import torch\n"
            "_orig_view = torch.Tensor.view\n"
            "def _view(self, *a, **k):\n"
            "    try:\n"
            "        return _orig_view(self, *a, **k)\n"
            "    except RuntimeError:\n"
            "        return self.reshape(*a, **k)\n"
            "torch.Tensor.view = _view\n")

    env = dict(os.environ, PYTHONPATH=work + "/stubs:" + REF)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, REF + "/main.py", "--model", "cnn",
         "--mode", "train", "--no_metric"],
        cwd=work, env=env, capture_output=True, text=True, timeout=3600)
    dt = time.perf_counter() - t0
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    if proc.returncode != 0:
        print(json.dumps({"ok": False, "returncode": proc.returncode}))
        return
    # one epoch = train pass over n_train + eval pass over 64
    ips = n_train / dt
    print(json.dumps({
        "ok": True,
        "reference_cnn_train_epoch_s": round(dt, 2),
        "reference_cnn_train_img_per_s": round(ips, 2),
        "n_train": n_train,
    }))


if __name__ == "__main__":
    main()

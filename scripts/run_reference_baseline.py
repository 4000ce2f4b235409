"""Measure the torch reference's CPU training throughput.

Runs the reference driver (/root/reference, executed in place — never
copied) against the SAME deterministic synthetic GTSRB dataset our
framework uses, in a scratch working directory, and times one training
epoch.  Complements bench.py's inference baseline; results go into
BASELINE.md.  The workdir/stub machinery is importable
(`prepare_reference_workdir`, `run_reference`) and reused by the
end-to-end convergence parity test (tests/test_convergence_parity.py).

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

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)

REF = "/root/reference"


def prepare_reference_workdir(work, n_train=512, n_eval=64, n_epochs=1,
                              params_json=None, model="cnn"):
    """Scratch dir with synthetic data + stubs so the reference runs.

    Returns the env dict to use with run_reference.  The stubs cover
    packages the reference imports but this image lacks (torchvision,
    torchsummary) and a torch-0.4 `.view` compat shim (the reference's
    Flatten views non-contiguous tensors, models.py:10).

    Model-aware (VERDICT r2 item 5): classifiers get GTSRB-style data,
    the detectors GTSDB-style grid labels at whatever n_grid /
    darknet_input the params_json asks for (the reference DarkNet is
    fully convolutional, so 64px / n_grid=2 runs fine on this box).
    """
    shutil.rmtree(work, ignore_errors=True)
    data_sub = "GTSRB" if model in ("cnn", "capsule") else "GTSDB"
    os.makedirs(f"{work}/data/{data_sub}", exist_ok=True)
    os.makedirs(work + "/experiments/" + model, exist_ok=True)

    cfg = {
        "batch_size": 64, "n_classes": 43, "lr": 1e-3,
        "n_epochs": n_epochs, "dropout": 0.5, "lr_decay": 0.1,
    }
    if model not in ("cnn", "capsule"):
        cfg.update({
            "batch_size": 8, "n_boxes": 2, "n_grid": 2,
            "darknet_input": 64, "l_coord": 5.0, "l_noobj": 0.5,
        })
    if params_json:
        cfg.update(params_json)
    with open(work + f"/experiments/{model}/params.json", "w") as f:
        json.dump(cfg, f)

    p = Params(model=model, n_classes=cfg["n_classes"],
               **{k: cfg[k] for k in
                  ("n_boxes", "n_grid", "darknet_input") if k in cfg})
    x_tr, y_tr, x_ev, y_ev = synthetic_dataset(model, p,
                                               n_train=n_train,
                                               n_eval=n_eval)
    with open(f"{work}/data/{data_sub}/train.p", "wb") as f:
        pickle.dump((x_tr, y_tr), f)
    with open(f"{work}/data/{data_sub}/eval.p", "wb") as f:
        pickle.dump((x_ev, y_ev), f)

    os.makedirs(work + "/stubs/torchvision", exist_ok=True)
    open(work + "/stubs/torchvision/__init__.py", "w").close()
    with open(work + "/stubs/torchvision/transforms.py", "w") as f:
        f.write("")
    with open(work + "/stubs/torchsummary.py", "w") as f:
        f.write("def summary(model, input_shape=None, **kw):\n"
                "    print('[stub torchsummary]', type(model).__name__,"
                " input_shape)\n")
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

    return dict(os.environ, PYTHONPATH=work + "/stubs:" + REF)


def run_reference(work, env, model="cnn", mode="train", extra_args=(),
                  timeout=3600):
    """Run the reference main.py in the prepared workdir."""
    return subprocess.run(
        [sys.executable, REF + "/main.py", "--model", model,
         "--mode", mode, *extra_args],
        cwd=work, env=env, capture_output=True, text=True,
        timeout=timeout)


def main():
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    work = "/tmp/refrun"
    env = prepare_reference_workdir(work, n_train=n_train)

    t0 = time.perf_counter()
    proc = run_reference(work, env, extra_args=("--no_metric",))
    dt = time.perf_counter() - t0
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    if proc.returncode != 0:
        print(json.dumps({"ok": False, "returncode": proc.returncode}))
        return
    ips = n_train / dt
    print(json.dumps({
        "ok": True,
        "reference_cnn_train_epoch_s": round(dt, 2),
        "reference_cnn_train_img_per_s": round(ips, 2),
        "n_train": n_train,
    }))


if __name__ == "__main__":
    main()

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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)

REF = "/root/reference"


def prepare_reference_workdir(work, n_train=512, n_eval=64, n_epochs=1,
                              params_json=None, model="cnn",
                              capture_avg_iou=False):
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
    if capture_avg_iou:
        with open(work + "/stubs/sitecustomize.py", "a") as f:
            f.write(_CAPTURE_AVG_IOU_HOOK)

    return dict(os.environ, PYTHONPATH=work + "/stubs:" + REF)


# Spy on the reference's dark_loss side channel: it writes
# params.avg_iou after every call (loss_fns.py:141), but only the
# darknet_d train loop ever prints it (main.py:93-94).  Appending each
# value to a file exposes it for darknet_r too — pure observation, no
# reference code touched.  Call order per epoch is n_train_batches then
# n_eval_batches (main.py:170-172), so the consumer segments by batch
# counts.
_CAPTURE_AVG_IOU_HOOK = """
import os as _os
import loss_fns as _lf

_orig_dark_loss = _lf.dark_loss


def _spy_dark_loss(y_hat, y, params, *a, **k):
    out = _orig_dark_loss(y_hat, y, params, *a, **k)
    with open(_os.path.join(_os.getcwd(), "ref_avg_iou.txt"), "a") as f:
        f.write("%r\\n" % float(params.avg_iou))
    return out


_lf.dark_loss = _spy_dark_loss
"""


def prepare_reference_predict_workdir(work, model="darknet_r", n_test=6,
                                      params_json=None, combine=None,
                                      capture=True, test_data=None):
    """Extend a scratch workdir so the reference's `--mode predict`
    runs (reference main.py:293-374): synthetic GTSDB test split, raw
    PNG frames + test_names.npy (predict rebuilds x from raw frames,
    main.py:305-306), class_names.txt (plot.py:18-19), and — when
    `capture` — a sitecustomize spy that records the reference's
    predict-time y_hat grid and decoded boxes (first two
    utils.y_to_boxes_vec calls: dark_pred's y_hat then ground truth,
    predict_fns.py:46-51) plus the combine_y_hat tensors, all WITHOUT
    copying or modifying any reference code.

    The same data files are what our framework's predict mode reads, so
    one call prepares either side's workdir; checkpoints are placed by
    the caller (ours as experiments/<model>/last.ckpt, the reference's
    as last.pth.tar via interop.export_torch_checkpoint).

    Class models (cnn/capsule) take the reference's class_model branch
    (main.py:309-317): GTSRB test.p only — no raw frames — and the spy
    instead captures the y_hat scores class_pred returns (via the
    recog_acc call at main.py:313).

    `test_data=(x_te, y_te)` substitutes caller-provided test tensors
    for the synthetic_dataset eval draw (the predict-parity legs use
    IoU-friendly large-sign scenes so trained detections above the
    reference's fixed conf_th=0.5 are deterministic).

    Returns the env dict for run_reference.
    """
    import cv2

    env = prepare_reference_workdir(
        work, n_train=4, n_eval=4, n_epochs=1,
        params_json=params_json, model=model)

    with open(work + f"/experiments/{model}/params.json") as f:
        cfg = json.load(f)
    p = Params(model=model, n_classes=cfg["n_classes"],
               **{k: cfg[k] for k in
                  ("n_boxes", "n_grid", "darknet_input") if k in cfg})
    if test_data is not None:
        x_te, y_te = test_data
    else:
        _, _, x_te, y_te = synthetic_dataset(model, p, n_train=2,
                                             n_eval=n_test)

    if model in ("cnn", "capsule"):
        with open(work + "/data/GTSRB/test.p", "wb") as f:
            pickle.dump((x_te, y_te), f)
        with open(work + "/stubs/sitecustomize.py", "a") as f:
            f.write(_NUMPY2_COMPAT)
            if capture:
                f.write(_CAPTURE_CLASS_HOOK)
        return env

    with open(work + "/data/GTSDB/test.p", "wb") as f:
        pickle.dump((x_te, y_te), f)

    # raw full-frame uint8 images: reconstructed from the centered test
    # tensors, written losslessly (PNG) so both frameworks cv2.imread
    # identical arrays; a size rotation exercises the image_hw rescale
    raw_dir = work + "/data/GTSDB/raw_GTSDB"
    os.makedirs(raw_dir, exist_ok=True)
    frames = (x_te * 128.0 + 128.0).clip(0, 255).astype("uint8")
    size = int(cfg.get("darknet_input", 64))
    hw_cycle = [(size, size), (size + size // 2, size), (size, size * 2)]
    names = []
    for i, fr in enumerate(frames):
        h, w = hw_cycle[i % len(hw_cycle)]
        img = fr if (h, w) == fr.shape[:2] else cv2.resize(fr, (w, h))
        name = "im{:03d}.png".format(i)
        cv2.imwrite(os.path.join(raw_dir, name), img)
        names.append(name)
    np.save(work + "/data/GTSDB/test_names.npy", np.array(names))
    with open(work + "/data/GTSDB/class_names.txt", "w") as f:
        f.write("\n".join(
            "sign_{:02d}".format(c) for c in range(cfg["n_classes"] or 43)))

    if combine:
        cdir = work + "/experiments/" + combine
        os.makedirs(cdir, exist_ok=True)
        with open(cdir + "/params.json", "w") as f:
            json.dump({"batch_size": 8, "n_classes": 43, "lr": 1e-3,
                       "n_epochs": 1, "dropout": 0.0, "lr_decay": 0.1},
                      f)

    with open(work + "/stubs/sitecustomize.py", "a") as f:
        f.write(_NUMPY2_COMPAT)
        if capture:
            f.write(_CAPTURE_HOOK)
    return env


# numpy 2.x rejects loadtxt(delimiter='\\n'), which the reference uses
# to read class_names.txt one-entry-per-line (plot.py:19).  Dropping
# the delimiter restores numpy 1.x's effective behavior for those files
# (names contain no whitespace).  Environment compat only — same class
# of shim as the torch-0.4 .view fallback above.
_NUMPY2_COMPAT = """
import numpy as _np_compat

_orig_loadtxt = _np_compat.loadtxt


def _loadtxt_nl(*a, **k):
    if k.get("delimiter") in ("\\n", "\\r"):
        k.pop("delimiter")
    return _orig_loadtxt(*a, **k)


_np_compat.loadtxt = _loadtxt_nl
"""


# Spy appended to the torch-0.4 compat sitecustomize for predict-parity
# runs: wraps two reference utils functions to dump their tensors into
# the cwd.  Pure observation — inputs/outputs pass through untouched.
_CAPTURE_HOOK = """
import os as _os
import numpy as _np
import utils as _u

_orig_ytb = _u.y_to_boxes_vec
_ytb_calls = [0]


def _spy_ytb(y, params, image_hw=None, conf_th=0.5):
    out = _orig_ytb(y, params, image_hw=image_hw, conf_th=conf_th)
    if _ytb_calls[0] < 2:  # dark_pred's y_hat + ground-truth calls only
        cls = out[2] if out[2] is not None else _np.zeros(0)
        _np.savez(_os.path.join(_os.getcwd(),
                                "ref_decode_%d.npz" % _ytb_calls[0]),
                  y=_np.asarray(y, _np.float32), idx=out[0], xy=out[1],
                  cls=_np.asarray(cls))
    _ytb_calls[0] += 1
    return out


_u.y_to_boxes_vec = _spy_ytb

_orig_comb = _u.combine_y_hat


def _spy_comb(images, dark_y_hat, class_y_hat, image_indices, boxes_xy,
              params):
    out = _orig_comb(images, dark_y_hat, class_y_hat, image_indices,
                     boxes_xy, params)
    _np.savez(_os.path.join(_os.getcwd(), "ref_combine.npz"),
              dark_y_hat=_np.asarray(dark_y_hat, _np.float32),
              class_y_hat=_np.asarray(class_y_hat, _np.float32),
              image_indices=_np.asarray(image_indices),
              boxes_xy=_np.asarray(boxes_xy),
              combined=_np.asarray(out, _np.float32))
    return out


_u.combine_y_hat = _spy_comb
"""


# Class-model predict spy: the reference's class_pred branch
# (main.py:309-317) computes recog_pr/acc/auc on the scores class_pred
# returned; wrapping metrics.recog_acc captures (y, y_hat) without
# touching any reference code.  First call only — in predict mode
# that IS the class_pred output (train mode never runs under this
# workdir).
_CAPTURE_CLASS_HOOK = """
import os as _os
import numpy as _np
import metrics as _metrics

_orig_racc = _metrics.recog_acc
_racc_calls = [0]


def _spy_racc(y, y_hat, params):
    if _racc_calls[0] == 0:
        _np.savez(_os.path.join(_os.getcwd(), "ref_class_pred.npz"),
                  y=_np.asarray(y), y_hat=_np.asarray(y_hat, _np.float32))
    _racc_calls[0] += 1
    return _orig_racc(y, y_hat, params)


_metrics.recog_acc = _spy_racc
"""


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

"""Offline builder tests against tiny synthetic raw dataset trees.

Exercises the GTSRB per-class CSV ingest (reference build_data.py:16-60)
and the GTSDB gt.txt -> YOLO grid-label build (reference
build_data.py:63-169) including the .npy artifact variant, without the
real datasets.
"""

import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import build


def _fake_gtsrb(root, n_classes=3, per_class=12):
    rng = np.random.RandomState(0)
    for c in range(43):
        if c >= n_classes:
            # builder iterates all 43 classes; give the rest empty CSVs
            d = os.path.join(root, "Images", format(c, "05d"))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"GT-{format(c, '05d')}.csv"), "w") as f:
                f.write("Filename;Width;Height;Roi.X1;Roi.Y1;Roi.X2;Roi.Y2;ClassId\n")
            continue
        d = os.path.join(root, "Images", format(c, "05d"))
        os.makedirs(d, exist_ok=True)
        rows = ["Filename;Width;Height;Roi.X1;Roi.Y1;Roi.X2;Roi.Y2;ClassId"]
        for i in range(per_class):
            name = f"{i:05d}_{0:05d}.ppm"
            im = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, name), im)
            # varying ROI sizes: the reference's per-class np.array(x)
            # must stay an object array (its .tolist() would otherwise
            # hand plain nested lists to cv2.resize)
            x2 = 30 + (i % 8)
            rows.append(f"{name};40;40;2;2;{x2};{x2};{c}")
        with open(os.path.join(d, f"GT-{format(c, '05d')}.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")


def _fake_gtsdb(root, n_images=12):
    rng = np.random.RandomState(0)
    raw = os.path.join(root, "raw_GTSDB")
    os.makedirs(raw, exist_ok=True)
    gt_lines = []
    for i in range(n_images):
        name = f"{i:05d}.ppm"
        im = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(raw, name), im)
        # one box per image
        x1, y1 = rng.randint(0, 100), rng.randint(0, 80)
        gt_lines.append(f"{name};{x1};{y1};{x1+30};{y1+30};{rng.randint(43)}")
    with open(os.path.join(raw, "gt.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")


def test_gtsrb_builder(tmp_path):
    root = str(tmp_path / "GTSRB")
    _fake_gtsrb(root)
    np.random.seed(0)
    build.gtsrb(root=root, save_npy=True)

    with open(root + "/train.p", "rb") as f:
        x_tr, y_tr = pickle.load(f)
    assert x_tr.shape[1:] == (32, 32, 3)
    assert x_tr.dtype == np.float32
    # centered to [-1, 1]
    assert x_tr.min() >= -1.0 and x_tr.max() <= 1.0
    # 10/10/80 split per class of 12 -> eval/test 1 each, train 10
    assert len(y_tr) == 3 * 10
    assert os.path.exists(root + "/train_X.npy")
    assert os.path.exists(root + "/test_names.npy")


def test_gtsdb_builder(tmp_path):
    root = str(tmp_path / "GTSDB")
    _fake_gtsdb(root)
    params = Params(n_grid=4, n_classes=43, darknet_input=64, add_signs=1)
    np.random.seed(0)
    build.gtsdb(params, aug_size=0, root=root, save_npy=True)

    with open(root + "/train.p", "rb") as f:
        x_tr, y_tr = pickle.load(f)
    assert x_tr.shape[1:] == (64, 64, 3)
    assert y_tr.shape[1:] == (4, 4, 5 + 43)
    # every image got exactly one labeled cell
    assert np.all(y_tr[..., 0].sum(axis=(1, 2)) == 1)
    # label geometry: normalized cwh in [0, 1]
    obj = y_tr[..., 0] == 1
    assert np.all(y_tr[obj][:, 1:5] >= 0) and np.all(y_tr[obj][:, 1:5] <= 1)
    # names index saved for predict mode
    assert os.path.exists(root + "/train_names.npy")
    assert os.path.exists(root + "/test_X.npy")


# NOTE: a direct artifact-parity test vs the reference's gtsrb() is not
# possible in this environment: the reference builder depends on
# numpy<1.24 semantics (np.int, and np.array() of ragged crop lists
# auto-becoming object arrays) and raises under numpy 2.x.  Builder
# semantics are instead pinned by the structural assertions above and
# the box-geometry parity tests (test_boxes_reference_parity.py).

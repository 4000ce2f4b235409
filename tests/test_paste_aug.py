"""Paste-augmentation golden tests (reference build_data.py:171-288).

On a deterministic synthetic raw tree (seeded RNG): occlusion of the
existing sign, pasted new signs, and the regenerated grid labels are
checked value-by-value against geometry recomputed with the host box
library.
"""

import os
import random

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import build
from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import boxes as bx


@pytest.fixture
def gtsrb_tree(tmp_path):
    """Tiny GTSRB Images tree: 3 classes x 2 signs, constant-color ROIs."""
    root = str(tmp_path / "Images")
    rng = np.random.RandomState(1)
    for c in range(3):
        cname = format(c, "05d")
        d = os.path.join(root, cname)
        os.makedirs(d)
        rows = ["Filename;Width;Height;Roi.X1;Roi.Y1;Roi.X2;Roi.Y2;ClassId"]
        for i in range(2):
            name = f"{i:05d}_{0:05d}.ppm"
            im = np.full((40, 40, 3), 30 * (c + 1) + i, np.uint8)
            cv2.imwrite(os.path.join(d, name), im)
            rows.append(f"{name};40;40;4;4;36;36;{c}")
        with open(os.path.join(d, f"GT-{cname}.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")
    return root


def _params(**over):
    base = dict(n_grid=4, n_classes=43, darknet_input=64, add_signs=2)
    base.update(over)
    return Params(**base)


def test_paste_aug_occludes_and_pastes(gtsrb_tree):
    params = _params()
    random.seed(3)
    np.random.seed(3)
    image = np.zeros((120, 160, 3), np.uint8)  # black scene
    box_xy = np.array([[10.0, 10.0, 40.0, 40.0]])  # one existing sign
    classes = np.array([7])

    xs, ys = build.gtsdb_aug_(params, image, box_xy, classes,
                              class_dir=gtsrb_tree)
    (x_aug,), (y_aug,) = xs, ys

    assert x_aug.shape == (64, 64, 3)
    assert y_aug.shape == (4, 4, 5 + 43)

    # the existing sign's box was occluded: constant-color GTSRB ROIs
    # mean the pasted region is nonzero everywhere on the black scene
    occ = image[10:40, 10:40]
    assert occ.min() > 0

    n_boxes = int(y_aug[..., 0].sum())
    # one occluded + up to add_signs new (dict-dedup can merge repeats,
    # grid-cell collisions can overwrite) — never more, at least one
    assert 1 <= n_boxes <= 1 + params.add_signs

    # label geometry: every labeled cell denormalizes to a region of
    # the mutated image whose pixels are nonzero (pasted sign pixels)
    rows, cols = np.nonzero(y_aug[..., 0])
    cwh = bx.denorm_boxes_cwh_vec(
        (64, 64), 4, y_aug[rows, cols, 1:5], np.stack([rows, cols], 1))
    for x1, y1, x2, y2 in np.asarray(bx.cwh_to_xy_vec(cwh)):
        xi1, yi1 = max(int(x1), 0), max(int(y1), 0)
        xi2, yi2 = min(int(np.ceil(x2)), 64), min(int(np.ceil(y2)), 64)
        region = x_aug[yi1:yi2, xi1:xi2]
        assert region.size and region.max() > 0, (x1, y1, x2, y2)

    # classes are one-hot from the pasted signs (classes 0..2 here)
    cls = np.nonzero(y_aug[rows, cols, 5:])[1]
    assert len(cls) == n_boxes
    assert np.all(cls < 3)


def test_paste_aug_label_matches_recomputed_geometry(gtsrb_tree):
    """Occluded-sign label: the grid row/col and normalized cwh must be
    exactly what normalize_box_cwh yields for the original box."""
    params = _params(add_signs=0)
    random.seed(5)
    np.random.seed(5)
    image = np.zeros((120, 160, 3), np.uint8)
    box_xy = np.array([[32.0, 16.0, 64.0, 48.0]])

    _, (y_aug,) = build.gtsdb_aug_(params, image, box_xy,
                                   np.array([0]), class_dir=gtsrb_tree)

    resized = bx.resize_box_xy((120, 160), [64, 64], [32, 16, 64, 48])
    cwh = bx.xy_to_cwh(resized)
    (xc, yc, w, h), (r, c) = bx.normalize_box_cwh([64, 64], 4, cwh)
    np.testing.assert_allclose(y_aug[r, c, 0:5], [1, xc, yc, w, h],
                               rtol=1e-6)
    assert y_aug[..., 0].sum() == 1


def test_gtsdb_build_with_aug(tmp_path, gtsrb_tree):
    """Artifact-level: gtsdb(aug_size=1) produces base + aug rows with
    valid labels in every split."""
    root = str(tmp_path / "GTSDB")
    raw = os.path.join(root, "raw_GTSDB")
    os.makedirs(raw)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(10):
        name = f"{i:05d}.ppm"
        cv2.imwrite(os.path.join(raw, name),
                    (rng.rand(120, 160, 3) * 50).astype(np.uint8))
        x1, y1 = rng.randint(0, 100), rng.randint(0, 80)
        lines.append(f"{name};{x1};{y1};{x1+30};{y1+30};{rng.randint(43)}")
    with open(os.path.join(raw, "gt.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    params = _params(add_signs=1)
    random.seed(0)
    np.random.seed(0)
    build.gtsdb(params, aug_size=1, root=root, class_dir=gtsrb_tree)

    import pickle
    with open(os.path.join(root, "train.p"), "rb") as f:
        x_tr, y_tr = pickle.load(f)
    # 10 images: split=1 -> 8 base train + 8 aug train rows
    assert len(y_tr) == 16
    assert x_tr.shape[1:] == (64, 64, 3)
    # every row has at least one object, normalized geometry in range
    assert np.all(y_tr[..., 0].sum(axis=(1, 2)) >= 1)
    obj = y_tr[..., 0] == 1
    assert y_tr[obj][:, 1:5].min() >= 0 and y_tr[obj][:, 1:5].max() <= 1

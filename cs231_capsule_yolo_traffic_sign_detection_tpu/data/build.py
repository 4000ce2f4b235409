"""Offline dataset builders: GTSRB crops and GTSDB YOLO grid labels.

Rebuilds the reference's artifact pipeline (reference build_data.py:16-60
`gtsrb`, :63-169 `gtsdb`, :171-288 `gtsdb_aug_`; the .npy variant
build_data_npy.py saves the same tensors as arrays plus *_names.npy
image-name indices consumed by predict mode, reference main.py:305-306).
Here one builder serves both artifact families via `save_npy`.

Artifact semantics preserved: per-class 10/10/80 eval/test/train split,
ROI crop -> 32x32 -> center_rgb for GTSRB; gt.txt -> resize ->
one-object-per-grid-cell label tensor (conflicts skipped and counted,
reference build_data.py:96-98) for GTSDB; class_names.txt parsed from
the GTSDB Readme.  Deviations (COMPAT.md): image file order is sorted
(the reference inherits os.listdir order), GTSDB tensors are stored
float32 (the reference pickles float64; values are identical since
pixels are small integers), and the aug-concat gate uses the aug_size
argument (the reference consults a module-global argparse value,
build_data.py:144, and crashes when imported without it).
"""

import csv
import os
import pickle
import random

import numpy as np

from .. import config
from ..ops import boxes as box_ops
from .loader import center_rgb, shuffle_aug


def get_image_name(i):
    """Class id -> zero-padded .ppm file name (reference utils.py:156-168)."""
    name = format(int(i), "05d") + ".ppm"
    assert len(name) == 9
    return name


def _shuffle_with_names(x, y, names):
    i = np.random.permutation(len(y))
    return x[i], y[i], [names[j] for j in i]


# ---------------------------------------------------------------------------
# GTSRB (classification crops)
# ---------------------------------------------------------------------------

def gtsrb(root=None, save_npy=False):
    """Build GTSRB train/eval/test artifacts from the raw per-class CSVs.

    Reference parity: build_data.py:16-60.  CSV schema per class dir
    `Images/000XX/GT-000XX.csv`:
    Filename;Width;Height;Roi.X1;Roi.Y1;Roi.X2;Roi.Y2;ClassId.
    Each crop is the ROI slice im[Y1:Y2, X1:X2], resized to 32x32 after
    the split, float32, centered to [-1, 1]; splits are 10% eval / 10%
    test / 80% train per class, shuffled within class and again per
    split.  `save_npy` additionally writes *_X/_Y.npy and *_names.npy
    (a TPU-build extension: the reference's npy variant keeps GTSRB as
    pickles and has no GTSRB name index).
    """
    import cv2

    root = root or config.GTSRB
    splits = {k: ([], [], []) for k in ("train", "eval", "test")}

    for c in range(43):
        class_name = format(c, "05d")
        prefix = os.path.join(root, "Images", class_name)
        crops, labels, names = [], [], []
        with open(os.path.join(prefix, "GT-" + class_name + ".csv")) as f:
            reader = csv.reader(f, delimiter=";")
            next(reader, None)
            for row in reader:
                im = cv2.imread(os.path.join(prefix, row[0]))
                x1, y1, x2, y2 = (int(row[3]), int(row[4]),
                                  int(row[5]), int(row[6]))
                crops.append(im[y1:y2, x1:x2, :])
                labels.append(c)
                names.append(class_name + "/" + row[0])
        if not labels:
            continue
        perm = np.random.permutation(len(labels))
        crops = [crops[j] for j in perm]
        names = [names[j] for j in perm]
        split = len(labels) // 10
        for key, sl in (("eval", slice(0, split)),
                        ("test", slice(split, 2 * split)),
                        ("train", slice(2 * split, None))):
            xs, ys, ns = splits[key]
            xs.extend(crops[sl])
            ys.extend([c] * len(crops[sl]))
            ns.extend(names[sl])

    out = {}
    for key, (xs, ys, ns) in splits.items():
        x = np.array([cv2.resize(im, (32, 32)) for im in xs],
                     dtype=np.float32)
        x = center_rgb(x)
        x, y, ns = _shuffle_with_names(x, np.array(ys), ns)
        out[key] = (x, y, ns)
        with open(os.path.join(root, key + ".p"), "wb") as f:
            pickle.dump((x, y), f)
        if save_npy:
            np.save(os.path.join(root, key + "_X"), x)
            np.save(os.path.join(root, key + "_Y"), y)
            np.save(os.path.join(root, key + "_names"), np.array(ns))

    print("GTSRB build done:",
          {k: out[k][0].shape for k in ("train", "eval", "test")})


# ---------------------------------------------------------------------------
# GTSDB (detection scenes + YOLO grid labels)
# ---------------------------------------------------------------------------

def _grid_label(y, box_xy, cls, orig_hw, resized_hw, n_grid, n_classes):
    """Write one ground-truth box into the grid tensor y (in place).

    Returns 1 when the target cell is already occupied (the box is
    skipped — one object per cell, reference build_data.py:96-98),
    else 0.
    """
    resized = box_ops.resize_box_xy(orig_hw, resized_hw, box_xy)
    cwh = box_ops.xy_to_cwh(resized)
    (xc, yc, w, h), (row, col) = box_ops.normalize_box_cwh(
        resized_hw, n_grid, cwh)
    if y[row, col, 0] == 1:
        return 1
    y[row, col, 0:5] = [1, xc, yc, w, h]
    if n_classes:
        y[row, col, 5 + int(cls)] = 1
    return 0


def _write_class_names(raw_dir, root):
    """class_names.txt from the GTSDB Readme (reference build_data.py:159-162)."""
    readme = os.path.join(raw_dir, "Readme.txt")
    if not os.path.exists(readme):
        print("[gtsdb] no Readme.txt; skipping class_names.txt")
        return
    with open(readme, errors="replace") as f:
        lines = [l.rstrip("\n") for l in f.readlines()[39:]]
    names = [l.split("=")[1] for l in lines if "=" in l]
    with open(os.path.join(root, "class_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


def gtsdb(params, aug_size=0, root=None, save_npy=False, class_dir=None):
    """Build GTSDB train/eval/test artifacts from raw_GTSDB/gt.txt.

    Reference parity: build_data.py:63-169.  Per scene: resize to
    darknet_input^2, label tensor y[n_grid, n_grid, 5+C] with
    [1, xc, yc, w, h] per object cell (center cell-relative, w/h
    image-relative) and a one-hot class when C > 0; `aug_size` paste
    augmentations per scene; joint shuffle keeping augmentations with
    their source image; 10/10/80 split; center_rgb.  `save_npy` writes
    *_X/_Y.npy and *_names.npy (the raw image file per split row, used
    by predict mode to reload full-resolution frames).
    """
    import cv2

    root = root or config.GTSDB
    raw_dir = os.path.join(root, "raw_GTSDB")
    image_files = sorted(f for f in os.listdir(raw_dir)
                         if f.endswith(".ppm"))
    data_size = len(image_files)
    raw = np.atleast_2d(
        np.loadtxt(os.path.join(raw_dir, "gt.txt"),
                   delimiter=";", dtype=str))
    gt_names = raw[:, 0]
    gt_boxes = raw[:, 1:5].astype(float)
    gt_classes = raw[:, 5].astype(int)

    size = int(params.darknet_input)
    n_grid, n_classes = int(params.n_grid), int(params.n_classes)

    X, Y, X_aug, Y_aug = [], [], [], []
    conflicts = 0
    for name in image_files:
        image = cv2.imread(os.path.join(raw_dir, name))
        resized = cv2.resize(image, (size, size))
        X.append(resized)

        y = np.zeros((n_grid, n_grid, 5 + n_classes), np.float32)
        idx = np.nonzero(gt_names == name)[0]
        for j in idx:
            conflicts += _grid_label(
                y, gt_boxes[j], gt_classes[j], image.shape[:2],
                resized.shape[:2], n_grid, n_classes)
        Y.append(y)

        for _ in range(aug_size):
            # NOTE: like the reference (build_data.py:109, :244), the
            # paste mutates `image` in place, so successive aug copies
            # of one scene accumulate pasted signs.
            xa, ya = gtsdb_aug_(params, image, gt_boxes[idx],
                                gt_classes[idx], class_dir=class_dir)
            X_aug.extend(xa)
            Y_aug.extend(ya)

    X = np.asarray(X)
    Y = np.asarray(Y)
    X_aug = np.asarray(X_aug, np.uint8).reshape(-1, size, size, 3) \
        if X_aug else np.zeros((0, size, size, 3), np.uint8)
    Y_aug = np.asarray(Y_aug, np.float32).reshape(
        -1, n_grid, n_grid, 5 + n_classes) \
        if Y_aug else np.zeros((0, n_grid, n_grid, 5 + n_classes),
                               np.float32)

    X, Y, X_aug, Y_aug, perm = shuffle_aug(X, Y, X_aug, Y_aug)

    split = data_size // 10
    split_aug = data_size * aug_size // 10
    parts = {
        "eval": (X[:split], Y[:split],
                 X_aug[:split_aug], Y_aug[:split_aug]),
        "test": (X[split:2 * split], Y[split:2 * split],
                 X_aug[split_aug:2 * split_aug],
                 Y_aug[split_aug:2 * split_aug]),
        "train": (X[2 * split:], Y[2 * split:],
                  X_aug[2 * split_aug:], Y_aug[2 * split_aug:]),
    }
    name_idx = {"eval": perm[:split], "test": perm[split:2 * split],
                "train": perm[2 * split:]}

    files_arr = np.array(image_files)
    shapes = {}
    for key, (x, y, xa, ya) in parts.items():
        if aug_size > 0:
            x = np.concatenate((x, xa), axis=0)
            y = np.concatenate((y, ya), axis=0)
        x = center_rgb(x.astype(np.float32))
        shapes[key] = (x.shape, y.shape)
        with open(os.path.join(root, key + ".p"), "wb") as f:
            pickle.dump((x, y), f)
        if save_npy:
            np.save(os.path.join(root, key + "_X"), x)
            np.save(os.path.join(root, key + "_Y"), y)
            np.save(os.path.join(root, key + "_names"),
                    files_arr[name_idx[key]])

    _write_class_names(raw_dir, root)
    print("GTSDB build done:", shapes,
          "boxes:", gt_boxes.shape[0], "conflicts:", conflicts)


# ---------------------------------------------------------------------------
# Paste augmentation (reference build_data.py:171-288)
# ---------------------------------------------------------------------------

def _pick_random_sign(class_dir):
    """One random (class_name, sign_file) from the GTSRB Images tree."""
    class_name = random.choice(os.listdir(class_dir))
    while "0" not in class_name:
        class_name = random.choice(os.listdir(class_dir))
    sign_name = random.choice(os.listdir(os.path.join(class_dir,
                                                      class_name)))
    while "ppm" not in sign_name:
        sign_name = random.choice(os.listdir(os.path.join(class_dir,
                                                          class_name)))
    return class_name, sign_name


def _sign_row(class_dir, class_name, sign_name):
    """[W, H, X1, Y1, X2, Y2, class] for one GTSRB sign from its CSV."""
    table = np.atleast_2d(np.loadtxt(
        os.path.join(class_dir, class_name, "GT-" + class_name + ".csv"),
        delimiter=";", dtype=str))[1:]
    sel = np.nonzero(table[:, 0] == sign_name)[0][0]
    return table[sel, 1:8].astype(int)


def gtsdb_aug_(params, image, box_xy, classes, class_dir=None):
    """Paste-augment one GTSDB scene with random GTSRB signs.

    Reference parity: build_data.py:171-288.  Every existing sign is
    occluded by a random GTSRB sign resized into its box (label keeps
    the box, class becomes the pasted sign's), then `params.add_signs`
    new signs are pasted at random positions; the YOLO grid label is
    regenerated from scratch for the pasted set.  `image` is mutated in
    place (reference behavior).  `classes` is accepted for surface
    parity but unused — classes come from the pasted signs.  Returns
    ([resized_image], [y]).
    """
    import cv2

    class_dir = class_dir or os.path.join(config.GTSRB, "Images")
    size = int(params.darknet_input)
    resized_hw = [size, size]
    n_grid = int(params.n_grid)
    n_classes = int(params.n_classes)

    num_orig = box_xy.shape[0]
    signs = {}
    for _ in range(num_orig + int(params.add_signs)):
        class_name, sign_name = _pick_random_sign(class_dir)
        # dict keyed by file name: a re-drawn sign overwrites its
        # earlier entry (reference build_data.py:211 has the same
        # collision behavior)
        signs[sign_name] = _sign_row(class_dir, class_name, sign_name)

    y = np.zeros((n_grid, n_grid, 5 + n_classes), np.float32)
    for idx, (sign_name, row) in enumerate(signs.items()):
        w_, h_, fx1, fy1, fx2, fy2, cls = (int(v) for v in row)
        sign_im = cv2.imread(os.path.join(
            class_dir, get_image_name(cls)[:-4], sign_name))

        if idx < num_orig:
            # occlude an existing sign: resize the crop into its box
            tx1, ty1, tx2, ty2 = box_xy[idx].astype(int)
            patch = cv2.resize(sign_im[fy1:fy2, fx1:fx2],
                               (tx2 - tx1, ty2 - ty1))
            image[ty1:ty2, tx1:tx2] = patch
            new_xy = [tx1, ty1, tx2, ty2]
        else:
            # paste a new sign at a random position (reference draws
            # the range from the CSV's W/H columns, build_data.py:263)
            x_start = np.random.randint(0, image.shape[1] - w_)
            y_start = np.random.randint(0, image.shape[0] - h_)
            tx1, ty1 = x_start, y_start
            tx2, ty2 = x_start + (fx2 - fx1), y_start + (fy2 - fy1)
            image[ty1:ty2, tx1:tx2] = sign_im[fy1:fy2, fx1:fx2]
            new_xy = [tx1, ty1, tx2, ty2]

        resized_xy = box_ops.resize_box_xy(image.shape[:2], resized_hw,
                                           new_xy)
        cwh = box_ops.xy_to_cwh(resized_xy)
        (xc, yc, bw, bh), (r, c) = box_ops.normalize_box_cwh(
            resized_hw, n_grid, cwh)
        y[r, c, 0:5] = [1, xc, yc, bw, bh]
        if n_classes:
            y[r, c, 5 + cls] = 1

    resized_image = cv2.resize(image, (size, size))
    return [resized_image], [y]

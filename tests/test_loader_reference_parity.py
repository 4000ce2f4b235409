"""Loader parity vs the reference's OWN data utils, executed in place.

The reference's utils.py (imported from /root/reference, never copied)
provides center_rgb / shuffle / shuffle_aug / augmentation / load_data;
our rebuilt data/loader.py must match them numerically (and in RNG
consumption for the shuffles).
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from cs231_capsule_yolo_traffic_sign_detection_tpu.data import loader


@pytest.fixture(scope="module")
def ref_utils():
    import importlib

    return importlib.import_module("utils")


def test_center_rgb_matches_reference(rng, ref_utils):
    x = (rng.rand(4, 8, 8, 3) * 255).astype(np.float32)
    np.testing.assert_array_equal(loader.center_rgb(x),
                                  ref_utils.center_rgb(x))


def test_shuffle_matches_reference_rng_stream(rng, ref_utils):
    x = rng.rand(16, 3).astype(np.float32)
    y = rng.randint(0, 43, 16)
    np.random.seed(11)
    rx, ry = ref_utils.shuffle(x.copy(), y.copy())
    np.random.seed(11)
    ox, oy = loader.shuffle(x.copy(), y.copy())
    np.testing.assert_array_equal(rx, ox)
    np.testing.assert_array_equal(ry, oy)


def test_shuffle_aug_matches_reference(rng, ref_utils):
    n, aug = 6, 2
    x = rng.rand(n, 4, 4, 3).astype(np.float32)
    y = rng.rand(n, 2, 2, 5).astype(np.float32)
    x_aug = rng.rand(n * aug, 4, 4, 3).astype(np.float32)
    y_aug = rng.rand(n * aug, 2, 2, 5).astype(np.float32)

    np.random.seed(5)
    r = ref_utils.shuffle_aug(x.copy(), y.copy(), x_aug.copy(),
                              y_aug.copy())
    np.random.seed(5)
    o = loader.shuffle_aug(x.copy(), y.copy(), x_aug.copy(), y_aug.copy())
    for a, b in zip(r, o):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augmentation_matches_reference(rng, ref_utils):
    """Effective-behavior parity incl. RNG consumption: the reference's
    shift branch draws two randints it never uses (utils.py:128-137)."""
    x = rng.uniform(-1, 1, (3, 8, 8, 3)).astype(np.float64)
    for model in ("cnn", "darknet_r"):
        np.random.seed(9)
        theirs = ref_utils.augmentation(x.copy(), model)
        np.random.seed(9)
        ours = loader.augmentation(x.copy(), model)
        np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_load_data_matches_reference(tmp_path, rng, ref_utils):
    d = str(tmp_path)
    x_tr = rng.rand(6, 4, 4, 3).astype(np.float32)
    y_tr = rng.randint(0, 43, 6)
    x_ev = rng.rand(3, 4, 4, 3).astype(np.float32)
    y_ev = rng.randint(0, 43, 3)
    with open(d + "/train.p", "wb") as f:
        pickle.dump((x_tr, y_tr), f)
    with open(d + "/eval.p", "wb") as f:
        pickle.dump((x_ev, y_ev), f)
    for stem, x, y in (("train", x_tr, y_tr), ("eval", x_ev, y_ev)):
        np.save(os.path.join(d, stem + "_X"), x)
        np.save(os.path.join(d, stem + "_Y"), y)

    for npy in (False, True):
        theirs = ref_utils.load_data(d, npy=npy)
        ours = loader.load_data(d, npy=npy)
        for a, b in zip(theirs, ours):
            np.testing.assert_array_equal(a, b)


def test_make_small_data_matches_reference(tmp_path, rng, ref_utils):
    d = str(tmp_path)
    x_tr = rng.rand(8, 4, 4, 3).astype(np.float32)
    y_tr = rng.randint(0, 43, 8)
    with open(d + "/train.p", "wb") as f:
        pickle.dump((x_tr, y_tr), f)
    with open(d + "/eval.p", "wb") as f:
        pickle.dump((x_tr[:4], y_tr[:4]), f)

    ref_utils.make_small_data(d, 3)
    with open(d + "/train_small.p", "rb") as f:
        ref_small = pickle.load(f)
    loader.make_small_data(d, 3)
    with open(d + "/train_small.p", "rb") as f:
        our_small = pickle.load(f)
    np.testing.assert_array_equal(ref_small[0], our_small[0])
    np.testing.assert_array_equal(ref_small[1], our_small[1])
    assert ref_small[0].shape[0] == 3

"""Online data loading and host-side data utilities.

Covers the reference's data utils (reference utils.py:91-168):
`load_data` (pickle or .npy artifacts), `make_small_data` (overfit-mode
subset), `center_rgb`, runtime `augmentation` (defined but never called
by the reference driver — its call site is commented out at reference
main.py:56), `shuffle` and `shuffle_aug`.

TPU-build addition: a deterministic synthetic-data fallback
(`synthetic_dataset`, `load_or_synthesize`) so every CLI mode runs in
environments where the GTSRB/GTSDB artifacts are absent.  Synthetic
classification data is class-separable (per-class template + noise) and
synthetic detection scenes contain one axis-aligned "sign" per image
with a correctly normalized YOLO grid label, so training can actually
reduce the loss and the predict/metric paths see plausible geometry.
"""

import os
import pickle

import numpy as np

from .. import config
from ..ops import boxes as box_ops


# ---------------------------------------------------------------------------
# Artifact loading (reference utils.py:91-120)
# ---------------------------------------------------------------------------

def _strip_pickle_suffix(path):
    return path[:-2] if path.endswith(".p") else path


def load_data(data_dir, is_small=False, npy=False):
    """Load (x_tr, y_tr, x_ev, y_ev) from build artifacts.

    Reference parity: utils.py:91-113.  One deviation: small files are
    always pickles (that is all `make_small_data` ever writes), so
    `is_small=True, npy=True` loads the pickle instead of crashing on a
    nonexistent `train_small_X.npy` like the reference would.
    """
    if is_small:
        train_path = data_dir + config.tr_sm_d
        eval_path = data_dir + config.ev_sm_d
        npy = False
    else:
        train_path = data_dir + config.tr_d
        eval_path = data_dir + config.ev_d

    if not npy:
        with open(train_path, "rb") as f:
            x_tr, y_tr = pickle.load(f)
        with open(eval_path, "rb") as f:
            x_ev, y_ev = pickle.load(f)
    else:
        train_stem = _strip_pickle_suffix(train_path)
        eval_stem = _strip_pickle_suffix(eval_path)
        x_tr = np.load(train_stem + "_X.npy")
        y_tr = np.load(train_stem + "_Y.npy")
        x_ev = np.load(eval_stem + "_X.npy")
        y_ev = np.load(eval_stem + "_Y.npy")
    return x_tr, y_tr, x_ev, y_ev


def make_small_data(data_dir, n=128, npy=False):
    """Write the first n train/eval samples as *_small.p pickles.

    Reference parity: utils.py:115-120 (overfit mode's 3-sample set).
    """
    x_tr, y_tr, x_ev, y_ev = load_data(data_dir, npy=npy)
    with open(data_dir + config.tr_sm_d, "wb") as f:
        pickle.dump((x_tr[:n], y_tr[:n]), f)
    with open(data_dir + config.ev_sm_d, "wb") as f:
        pickle.dump((x_ev[:n], y_ev[:n]), f)


# ---------------------------------------------------------------------------
# Host utilities (reference utils.py:122-168)
# ---------------------------------------------------------------------------

def center_rgb(x):
    """uint8-range pixels -> centered floats in [-1, 1].

    Reference parity: utils.py:122-123.
    """
    return (x - 128.0) / 128


def shuffle(x, y):
    """Joint random permutation.  Reference parity: utils.py:146-148."""
    i = np.random.permutation(len(y))
    return x[i], y[i]


def shuffle_aug(x, y, x_aug, y_aug):
    """Permute base data and per-image augmentations with ONE index.

    Returns (x, y, x_aug, y_aug, perm).  Reference parity:
    utils.py:150-154 — the augmented tensors are grouped per base image
    (reshaped to len(y) rows), permuted with the same index, and
    restored, so augmentations follow their source image through the
    split.  The permutation is returned for the *_names.npy indices.
    """
    x_aug = np.asarray(x_aug)
    y_aug = np.asarray(y_aug)
    x_shape, y_shape = x_aug.shape, y_aug.shape
    i = np.random.permutation(len(y))
    if x_aug.size:
        x_grp = x_aug.reshape(x.shape[0], -1)[i].reshape(*x_shape)
        y_grp = y_aug.reshape(y.shape[0], -1)[i].reshape(*y_shape)
    else:
        x_grp, y_grp = x_aug, y_aug
    return x[i], y[i], x_grp, y_grp, i


def augmentation(x, model_name, max_shift=4, max_lightness_increase=0.05):
    """Runtime augmentation, matching the reference's EFFECTIVE behavior.

    Reference parity: utils.py:126-143, where the random-shift branch
    computes `shifted_image` and then never uses it (dead store) and the
    returned tensor is the HSV-lightness-jittered ORIGINAL image,
    rescaled to [0, 1] (not re-centered).  The reference driver never
    calls this (the call is commented out, reference main.py:56); it is
    provided for surface completeness with the effective semantics.
    """
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    _, h, w, _ = x.shape
    if model_name in ("capsule", "cnn"):
        # consume the same RNG draws as the reference's dead branch so a
        # caller interleaving augmentation with other np.random use sees
        # the same stream
        np.random.randint(-max_shift, max_shift + 1, size=2)

    hsv = rgb_to_hsv((np.asarray(x).reshape(-1, 3) + 1) / 2)
    hsv[:, 2] += np.random.rand() * max_lightness_increase
    return hsv_to_rgb(hsv).reshape(-1, h, w, 3)


# ---------------------------------------------------------------------------
# Synthetic fallback (TPU-build addition; no reference counterpart)
# ---------------------------------------------------------------------------

def _synthetic_classification(templates, n, rng):
    # templates are shared between the train and eval draws (one
    # per-class prototype): re-drawing them per split would make the
    # eval set structurally unrelated to what was trained on, and every
    # synthetic-fallback eval curve pure noise
    n_classes = templates.shape[0]
    y = (np.arange(n) % n_classes).astype(np.int64)
    x = templates[y] + 0.1 * rng.randn(n, *templates.shape[1:])
    return np.clip(x, -1.0, 1.0).astype(np.float32), y


def _synthetic_detection(params, n, rng, size):
    g = int(params.n_grid)
    n_classes = int(params.get("n_classes", 0) or 0)
    x = rng.uniform(-1.0, -0.8, (n, size, size, 3)).astype(np.float32)
    y = np.zeros((n, g, g, 5 + n_classes), np.float32)
    lo, hi = max(size // 8, 2), max(size // 3, 3)
    for i in range(n):
        w = int(rng.randint(lo, hi))
        h = int(rng.randint(lo, hi))
        x1 = int(rng.randint(0, size - w))
        y1 = int(rng.randint(0, size - h))
        c = i % n_classes if n_classes else 0
        # a flat, bright, class-tinted rectangle = the "sign"
        tint = 0.4 + 0.6 * ((c % 7) / 6.0)
        x[i, y1:y1 + h, x1:x1 + w, :] = [tint, 1.0 - tint, 0.8]
        cwh = box_ops.xy_to_cwh([x1, y1, x1 + w, y1 + h])
        (xc, yc, bw, bh), (row, col) = box_ops.normalize_box_cwh(
            (size, size), g, cwh)
        y[i, row, col, 0:5] = [1.0, xc, yc, bw, bh]
        if n_classes:
            y[i, row, col, 5 + c] = 1.0
    return x, y


def synthetic_dataset(model_name, params, n_train, n_eval):
    """Deterministic synthetic (x_tr, y_tr, x_ev, y_ev) for a model.

    Classification models get class-separable 32x32 crops; detection
    models get one synthetic sign per scene with a YOLO grid label.
    Uses a private RandomState so the global np.random stream (which
    drives epoch shuffling, reference main.py:45) is untouched.
    """
    rng = np.random.RandomState(0)
    if model_name in ("cnn", "capsule"):
        n_classes = int(params.get("n_classes", 43) or 43)
        size = int(params.get("capsule_input", 32) or 32)
        templates = rng.uniform(-1.0, 1.0, (n_classes, size, size, 3))
        x_tr, y_tr = _synthetic_classification(templates, n_train, rng)
        x_ev, y_ev = _synthetic_classification(templates, n_eval, rng)
    else:
        size = int(params.darknet_input)
        if model_name == "darkcapsule":
            # the capsule grid reshape requires input = 32 * n_grid
            # (see models/darkcapsule.py, COMPAT.md)
            size = 32 * int(params.n_grid)
        x_tr, y_tr = _synthetic_detection(params, n_train, rng, size)
        x_ev, y_ev = _synthetic_detection(params, n_eval, rng, size)
    return x_tr, y_tr, x_ev, y_ev


# synthetic fallback sizes: classification sets are cheap (32x32);
# detection scenes at 448^2 are ~2.4 MB each, keep the set modest
_SYNTH_FULL = {"classification": (512, 128), "detection": (64, 16)}
_SYNTH_SMALL = (3, 3)


def load_or_synthesize(data_dir, params, is_small=False, npy=False):
    """load_data with a deterministic synthetic fallback.

    The real artifacts win when present; otherwise the synthetic set
    sized for the mode (3/3 for overfit, mirroring the reference's
    make_small_data(3) at main.py:288) is generated in-process.
    """
    try:
        return load_data(data_dir, is_small=is_small, npy=npy)
    except (FileNotFoundError, OSError):
        pass
    model = params.get("model", "cnn")
    kind = ("classification" if model in ("cnn", "capsule")
            else "detection")
    n_train, n_eval = _SYNTH_SMALL if is_small else _SYNTH_FULL[kind]
    print("[data] artifacts missing under {!r}; using deterministic "
          "synthetic data ({} train / {} eval)".format(
              data_dir, n_train, n_eval))
    return synthetic_dataset(model, params, n_train, n_eval)

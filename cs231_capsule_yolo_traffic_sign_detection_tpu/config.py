"""Static configuration constants.

Mirrors the reference's config layer (reference: config.py:1-53): model
registry names, dataset roots, per-model data/experiment directories,
input shapes and plotting colors.  One deliberate difference: input
shapes are NHWC (TPU-native layout) instead of the reference's CHW
(reference config.py:36-42).
"""

import os

# model list (reference config.py:2)
model_names = ["cnn", "capsule", "darknet_d", "darknet_r", "darkcapsule"]

# data folders (reference config.py:5-6)
GTSRB = "data/GTSRB"
GTSDB = "data/GTSDB"

# data file names (reference config.py:9-15)
tr_d = "/train.p"
ev_d = "/eval.p"
te_d = "/test.p"

tr_sm_d = "/train_small.p"
ev_sm_d = "/eval_small.p"
te_sm_d = "/test_small.p"

# per-model data directory (reference config.py:18-24)
data_dir = {
    "cnn": GTSRB,
    "capsule": GTSRB,
    "darknet_d": GTSDB,
    "darknet_r": GTSDB,
    "darkcapsule": GTSDB,
}

# per-model experiment directory (reference config.py:27-33)
model_dir = {
    "cnn": "experiments/cnn",
    "capsule": "experiments/capsule",
    "darknet_d": "experiments/darknet_d",
    "darknet_r": "experiments/darknet_r",
    "darkcapsule": "experiments/darkcapsule",
}

# input shapes, NHWC (reference config.py:36-42 is CHW).
# NOTE: the reference declares 224 for darkcapsule (config.py:41) while
# its experiments/darkcapsule/params.json says darknet_input=448; the
# model's reshape only works at 224 with n_grid=7 — see COMPAT.md.
input_shape = {
    "cnn": (32, 32, 3),
    "capsule": (32, 32, 3),
    "darknet_d": (448, 448, 3),
    "darknet_r": (448, 448, 3),
    "darkcapsule": (224, 224, 3),
}

# plot colors (reference config.py:45-50)
colors = [
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c",
    "#98df8a", "#d62728", "#ff9896", "#9467bd", "#c5b0d5",
    "#8c564b", "#c49c94", "#e377c2", "#f7b6d2", "#7f7f7f",
    "#c7c7c7", "#bcbd22", "#dbdb8d", "#17becf", "#9edae5",
]

# maximum number of samples used for the train/eval metric
# (reference config.py:53)
max_metric_samples = 1000


def repo_root() -> str:
    """Root of this repository (directory containing the package)."""
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

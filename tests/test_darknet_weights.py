"""Pretrained darknet19 npz loader test (reference models.py:238-269).

Builds a synthetic npz with the TF-format key layout
('{i}-<scope>/kernel:0', biases/gamma/moving_mean/moving_variance) and
checks the variables land in the right blocks with HWIO kernels.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
from cs231_capsule_yolo_traffic_sign_detection_tpu.models.darknet import (
    DARKNET_LAYERS, load_darknet19_npz,
)


def _make_npz(path, n_layers=18):
    arrs = {}
    in_c = 3
    rng = np.random.RandomState(0)
    for i, (out_c, k, _) in enumerate(DARKNET_LAYERS[:n_layers]):
        arrs[f"{i}-scope/kernel:0"] = rng.randn(k, k, in_c, out_c).astype(
            np.float32)
        arrs[f"{i}-scope/biases:0"] = rng.randn(out_c).astype(np.float32)
        arrs[f"{i}-scope/gamma:0"] = rng.rand(out_c).astype(np.float32)
        arrs[f"{i}-scope/moving_mean:0"] = rng.randn(out_c).astype(np.float32)
        arrs[f"{i}-scope/moving_variance:0"] = rng.rand(out_c).astype(
            np.float32)
        in_c = out_c
    np.savez(path, **arrs)
    return arrs


def test_load_darknet19_npz(tmp_path):
    npz_path = str(tmp_path / "darknet19_weights.npz")
    arrs = _make_npz(npz_path)

    model = DarkNet(n_boxes=2, n_classes=0, dropout=0.0)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    new_vars = load_darknet19_npz(variables, npz_path, n_load_layer=18)

    for i in range(1, 19):
        blk = new_vars["params"][f"block_{i}"]
        np.testing.assert_array_equal(
            np.asarray(blk[f"conv_{i}"]["kernel"]),
            arrs[f"{i-1}-scope/kernel:0"])
        np.testing.assert_array_equal(
            np.asarray(blk[f"bn_{i}"]["scale"]),
            arrs[f"{i-1}-scope/gamma:0"])
        np.testing.assert_array_equal(
            np.asarray(new_vars["batch_stats"][f"block_{i}"][f"bn_{i}"]["mean"]),
            arrs[f"{i-1}-scope/moving_mean:0"])

    # head conv untouched by the loader
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["conv_19"]["kernel"]),
        np.asarray(variables["params"]["conv_19"]["kernel"]))

    # n_load_layer truncation: layer 10+ stays at init
    part = load_darknet19_npz(variables, npz_path, n_load_layer=9)
    np.testing.assert_array_equal(
        np.asarray(part["params"]["block_10"]["conv_10"]["kernel"]),
        np.asarray(variables["params"]["block_10"]["conv_10"]["kernel"]))
    assert not np.array_equal(
        np.asarray(part["params"]["block_9"]["conv_9"]["kernel"]),
        np.asarray(variables["params"]["block_9"]["conv_9"]["kernel"]))

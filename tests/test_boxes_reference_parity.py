"""Box-utils parity vs the reference's own utils.py (executed from
/root/reference)."""

import sys

import numpy as np
import pytest

pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import boxes as B


@pytest.fixture
def ref_utils():
    import importlib

    return importlib.import_module("utils")


def _grid(rng, det_params, batch=3):
    g, C, nb = det_params.n_grid, det_params.n_classes, det_params.n_boxes
    return rng.rand(batch, g, g, 5 * nb + C)


def test_y_to_boxes_vec_matches_reference(det_params, rng, ref_utils):
    y = _grid(rng, det_params)
    for conf_th in (0.3, 0.5, 0.9):
        oi, ox, oc = B.y_to_boxes_vec(y, det_params, conf_th=conf_th)
        ri, rx, rc = ref_utils.y_to_boxes_vec(y, det_params, conf_th=conf_th)
        np.testing.assert_array_equal(oi, ri)
        np.testing.assert_allclose(ox, rx, rtol=1e-12)
        np.testing.assert_array_equal(oc, rc)


def test_y_to_boxes_vec_image_hw_matches_reference(det_params, rng, ref_utils):
    y = _grid(rng, det_params, batch=2)
    image_hw = np.array([[120, 160], [64, 64]])
    oi, ox, oc = B.y_to_boxes_vec(y, det_params, image_hw=image_hw,
                                  conf_th=0.5)
    ri, rx, rc = ref_utils.y_to_boxes_vec(y, det_params, image_hw=image_hw,
                                          conf_th=0.5)
    np.testing.assert_array_equal(oi, ri)
    np.testing.assert_allclose(ox, rx, rtol=1e-12)


def test_combine_y_hat_matches_reference(det_params, rng, ref_utils):
    g = det_params.n_grid
    images = [np.zeros((100, 120, 3)), np.zeros((64, 64, 3))]
    dark = rng.rand(2, g, g, 5 * det_params.n_boxes)
    class_probs = rng.rand(3, 43)
    image_indices = np.array([0, 0, 1])
    boxes_xy = np.array([[10.0, 10.0, 30.0, 30.0],
                         [50.0, 40.0, 80.0, 70.0],
                         [5.0, 5.0, 20.0, 20.0]])
    ours = B.combine_y_hat(images, dark, class_probs, image_indices,
                           boxes_xy, det_params)
    theirs = ref_utils.combine_y_hat(images, dark, class_probs,
                                     image_indices, boxes_xy, det_params)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_polar_transform_matches_reference(rng, ref_utils):
    import torch
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.polar import (
        polar_transform,
    )

    x = rng.rand(2, 4, 4, 5)
    r_o, phi_o = polar_transform(jnp.asarray(x))
    r_r, phi_r = ref_utils.polar_transform(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(r_o), r_r.numpy(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(phi_o), phi_r.numpy(), rtol=1e-7,
                               atol=1e-9)

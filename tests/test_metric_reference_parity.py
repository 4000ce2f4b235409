"""Metric parity: our metric suite vs the reference's own functions,
executed from /root/reference on identical inputs.

The reference metric stack (decode -> confusion -> 11-point AP sweep)
is pure numpy/sklearn, so it runs as-is; numbers must match exactly
(our sweep is a vectorized/C++ reformulation of the same math).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")


@pytest.fixture
def ref_metrics():
    import importlib

    # the reference's metrics module imports torch/matplotlib/sklearn
    return importlib.import_module("metrics")


def _grids(rng, det_params, batch=4):
    g, C, B = det_params.n_grid, det_params.n_classes, det_params.n_boxes
    y = np.zeros((batch, g, g, 5 + C))
    for i in range(batch):
        for _ in range(2):
            r, c = rng.randint(0, g, 2)
            y[i, r, c, 0:5] = [1, rng.rand(), rng.rand(),
                               rng.rand() * 0.3 + 0.1, rng.rand() * 0.3 + 0.1]
            if C:
                y[i, r, c, 5:] = 0
                y[i, r, c, 5 + rng.randint(C)] = 1
    y_hat = rng.rand(batch, g, g, 5 * B + C)
    return y, y_hat


def test_detect_acc_matches_reference(det_params, rng, ref_metrics):
    from cs231_capsule_yolo_traffic_sign_detection_tpu import metrics as M

    y, y_hat = _grids(rng, det_params)
    ours = M.detect_acc(y, y_hat, det_params)
    theirs = ref_metrics.detect_acc(y, y_hat, det_params)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_detect_AP_matches_reference(det_params, rng, ref_metrics):
    from cs231_capsule_yolo_traffic_sign_detection_tpu import metrics as M

    y, y_hat = _grids(rng, det_params, batch=3)
    ours = M.detect_AP(y, y_hat, det_params)
    theirs = ref_metrics.detect_AP(y, y_hat, det_params)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_detect_and_recog_acc_matches_reference(det_params, rng, ref_metrics):
    from cs231_capsule_yolo_traffic_sign_detection_tpu import metrics as M

    y, y_hat = _grids(rng, det_params)
    ours = M.detect_and_recog_acc(y, y_hat, det_params)
    theirs = ref_metrics.detect_and_recog_acc(y, y_hat, det_params)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_recog_metrics_match_reference(det_params, rng, ref_metrics):
    from cs231_capsule_yolo_traffic_sign_detection_tpu import metrics as M

    det_params.n_classes = 43
    y = rng.randint(0, 43, 200)
    y_hat = rng.rand(200, 43)
    np.testing.assert_allclose(
        M.recog_acc(y, y_hat, det_params),
        ref_metrics.recog_acc(y, y_hat, det_params), rtol=1e-12)
    np.testing.assert_allclose(
        M.recog_auc(y, y_hat, det_params),
        ref_metrics.recog_auc(y, y_hat, det_params), rtol=1e-12)
    np.testing.assert_allclose(
        M.recog_pr(y, y_hat, det_params),
        ref_metrics.recog_pr(y, y_hat, det_params), rtol=1e-12)

"""On-device crop+bilinear-resize (ops/crop.py) vs the host path.

The host reference for each element is exactly what the two-stage
pipeline does: viz.draw_boxes' integer clipped slice + cv2.resize
INTER_LINEAR (predict.py dark_pred crops tail).
"""

import numpy as np
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop import (
    crop_resize_bilinear,
)

cv2 = pytest.importorskip("cv2")

OUT = 32


def _host_crop(image, box, out=OUT):
    h, w = image.shape[:2]
    x1, y1, x2, y2 = box
    crop = image[max(int(y1), 0):max(min(int(y2), h), 0),
                 max(int(x1), 0):max(min(int(x2), w), 0)]
    if crop.size == 0:
        return np.zeros((out, out, image.shape[2]), np.float32)
    return cv2.resize(crop, (out, out), interpolation=cv2.INTER_LINEAR)


def test_matches_cv2_inter_linear(rng):
    img = rng.rand(448, 448, 3).astype(np.float32) * 255.0
    boxes = np.array([
        [10.0, 20.0, 74.0, 90.0],      # plain interior box
        [10.7, 20.2, 74.9, 90.6],      # fractional corners (truncated)
        [0.0, 0.0, 448.0, 448.0],      # full frame
        [400.0, 400.0, 448.0, 448.0],  # corner-hugging
        [440.0, 440.0, 500.0, 500.0],  # pokes past bottom-right (clip)
        [-20.0, -10.0, 40.0, 50.0],    # pokes past top-left (clip)
        [5.0, 5.0, 6.0, 6.0],          # single source pixel
    ], np.float32)

    got = np.asarray(crop_resize_bilinear(img[None], boxes[None], OUT))[0]
    for i, b in enumerate(boxes):
        want = _host_crop(img, b)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-3,
                                   err_msg=f"box {i}: {b}")


def test_degenerate_and_masked_boxes_zero(rng):
    img = rng.rand(64, 64, 3).astype(np.float32)
    boxes = np.array([
        [10.0, 10.0, 10.0, 30.0],    # zero width
        [10.0, 10.0, 30.0, 10.0],    # zero height
        [70.0, 70.0, 90.0, 90.0],    # entirely outside
        [-30.0, -30.0, -5.0, -5.0],  # entirely outside (negative)
        [5.0, 5.0, 20.0, 20.0],      # fine, but masked below
    ], np.float32)
    valid = np.array([True, True, True, True, False])

    got = np.asarray(crop_resize_bilinear(img[None], boxes[None], OUT,
                                          valid=valid[None]))[0]
    assert got.shape == (5, OUT, OUT, 3)
    np.testing.assert_array_equal(got, np.zeros_like(got))


def test_batched_shapes_and_batch_independence(rng):
    imgs = rng.rand(3, 96, 96, 3).astype(np.float32) * 255.0
    boxes = rng.rand(3, 4, 4).astype(np.float32) * 96.0
    boxes[..., 2:] = boxes[..., :2] + 10.0 + boxes[..., 2:] / 4
    got = np.asarray(crop_resize_bilinear(imgs, boxes, 16))
    assert got.shape == (3, 4, 16, 16, 3)
    for b in range(3):
        for m in range(4):
            want = _host_crop(imgs[b], boxes[b, m], out=16)
            np.testing.assert_allclose(got[b, m], want, rtol=1e-5,
                                       atol=1e-3)

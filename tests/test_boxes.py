"""Box geometry golden tests (reference utils.py:174-372 semantics)."""

import numpy as np
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import boxes as B


def test_xy_cwh_roundtrip():
    box = [10.0, 20.0, 50.0, 80.0]
    cwh = B.xy_to_cwh(box)
    assert cwh == [30.0, 50.0, 40.0, 60.0]
    assert B.cwh_to_xy(cwh) == box


def test_resize_box():
    out = B.resize_box_xy((100, 200), (50, 50), [20, 10, 40, 30])
    assert out == [5.0, 5.0, 10.0, 15.0]


def test_normalize_box_cwh():
    # image 64x64, 4x4 grid (cell 16px); box center (20, 40), size 8x8
    cwh, pos = B.normalize_box_cwh((64, 64), 4, [20, 40, 8, 8])
    assert pos == [2, 1]             # row = 40//16, col = 20//16
    np.testing.assert_allclose(cwh, [(20 - 16) / 16, (40 - 32) / 16,
                                     8 / 64, 8 / 64])


def test_denorm_inverts_normalize():
    image_hw = (64, 64)
    n_grid = 4
    orig = [20.0, 40.0, 8.0, 12.0]
    cwh, pos = B.normalize_box_cwh(image_hw, n_grid, orig)
    out = B.denorm_boxes_cwh_vec(
        image_hw, n_grid, np.array([cwh]), np.array([pos]))
    np.testing.assert_allclose(out[0], orig, atol=1e-9)


def test_y_to_boxes_vec_matches_manual(det_params):
    g, C = det_params.n_grid, det_params.n_classes
    y = np.zeros((2, g, g, 5 + C))
    # image 0: box at cell (1,2), center offset (.5,.5), size .25
    y[0, 1, 2, 0:5] = [1, 0.5, 0.5, 0.25, 0.25]
    y[0, 1, 2, 5 + 7] = 1
    # image 1: box at cell (3,0)
    y[1, 3, 0, 0:5] = [1, 0.0, 1.0, 0.5, 0.125]
    y[1, 3, 0, 5 + 42] = 1

    idx, xy, cls = B.y_to_boxes_vec(y, det_params, conf_th=0.5)
    assert idx.tolist() == [0, 1]
    assert cls.tolist() == [7, 42]
    # cell size = 64/4 = 16; image 0 center = ((2+.5)*16, (1+.5)*16) = (40, 24)
    np.testing.assert_allclose(xy[0], [40 - 8, 24 - 8, 40 + 8, 24 + 8])
    # image 1 center = ((0+0)*16, (3+1)*16) = (0, 64), w=32, h=8
    np.testing.assert_allclose(xy[1], [-16, 60, 16, 68])


def test_cwh_to_xy_grid_matches_reference_frame():
    # the loss-side conversion does NOT add row/col offsets
    cwh = jnp.array([[[0.5, 0.5, 0.25, 0.25]]])
    xy = B.cwh_to_xy_grid(cwh, img_size=64, n_grid=4)
    # xc*16 = 8, w*64/2 = 8
    np.testing.assert_allclose(np.asarray(xy)[0, 0], [0, 0, 16, 16])


def test_iou_xy():
    a = jnp.array([[[0.0, 0.0, 10.0, 10.0]]])
    b = jnp.array([[[5.0, 5.0, 15.0, 15.0]]])
    iou = np.asarray(B.iou_xy(a, b))[0, 0, 0]
    np.testing.assert_allclose(iou, 25.0 / 175.0)
    # disjoint
    c = jnp.array([[[20.0, 20.0, 30.0, 30.0]]])
    assert np.asarray(B.iou_xy(a, c))[0, 0, 0] == 0.0


def test_combine_y_hat(det_params):
    g = det_params.n_grid
    images = [np.zeros((64, 64, 3))]
    dark = np.random.RandomState(0).rand(1, g, g, 10)
    class_probs = np.eye(43)[[3]]
    # one box whose center lands in cell (1, 2): center (40, 24)
    boxes_xy = np.array([[32.0, 16.0, 48.0, 32.0]])
    out = B.combine_y_hat(images, dark, class_probs, [0], boxes_xy, det_params)
    assert out.shape == (1, g, g, 10 + 43)
    np.testing.assert_allclose(out[0, 1, 2, 10:], class_probs[0])
    np.testing.assert_allclose(out[..., :10], dark)

"""Bounding-box geometry library.

Covers the reference's box utils (reference utils.py:174-372): corner/
center conversions, resize, YOLO grid normalization, vectorized
denormalization and the grid decode `y_to_boxes_vec`.

Two tiers:
  * host tier (numpy) — used by the offline data builders and the
    metric suite, byte-matching the reference numerics;
  * device tier (jnp, static shapes) — used inside jitted losses and
    the on-device decode path (`ops.decode`), where the reference's
    `np.argwhere` dynamic shapes are replaced with masks / top-k.
"""

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Scalar host helpers (reference utils.py:174-230)
# ---------------------------------------------------------------------------

def xy_to_cwh(box_xy):
    """Corner box [x1,y1,x2,y2] -> center box [xc,yc,w,h].

    Reference parity: utils.py:174-184.
    """
    x1, y1, x2, y2 = box_xy
    return [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1]


def cwh_to_xy(box_cwh):
    """Center box [xc,yc,w,h] -> corner box [x1,y1,x2,y2].

    Reference parity: utils.py:186-196.
    """
    xc, yc, w, h = box_cwh
    return [xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2]


def resize_box_xy(orig_hw, resized_hw, box_xy):
    """Rescale corner coords from an image of `orig_hw` to `resized_hw`.

    Reference parity: utils.py:198-213.
    """
    orig_h, orig_w = orig_hw
    resized_h, resized_w = resized_hw
    x1, y1, x2, y2 = box_xy
    wr = 1.0 * resized_w / orig_w
    hr = 1.0 * resized_h / orig_h
    return [x1 * wr, y1 * hr, x2 * wr, y2 * hr]


def normalize_box_cwh(image_hw, n_grid, box_cwh):
    """Normalize a center box to YOLO grid coordinates.

    Returns ([xc_cell, yc_cell, w_img, h_img], [row, col]) where the
    center is relative to its grid cell and w/h relative to the image.

    Reference parity: utils.py:215-230.
    """
    image_h, image_w = image_hw
    xc, yc, box_w, box_h = box_cwh
    norm_w = 1.0 * box_w / image_w
    norm_h = 1.0 * box_h / image_h

    grid_w = 1.0 * image_w / n_grid
    grid_h = 1.0 * image_h / n_grid
    col = int(xc / grid_w)
    row = int(yc / grid_h)
    norm_xc = 1.0 * (xc - col * grid_w) / grid_w
    norm_yc = 1.0 * (yc - row * grid_h) / grid_h
    return [norm_xc, norm_yc, norm_w, norm_h], [row, col]


# ---------------------------------------------------------------------------
# Vectorized host tier (reference utils.py:233-334)
# ---------------------------------------------------------------------------

def denorm_boxes_cwh_vec(image_hw, n_grid, norm_cwh, grid_indices):
    """Denormalize grid-relative boxes back to image pixels.

    Args:
      image_hw: (h, w) tuple shared by all boxes, or (num_boxes, 2).
      n_grid: grid resolution.
      norm_cwh: (num_boxes, 4) normalized [xc, yc, w, h].
      grid_indices: (num_boxes, 2) [row, col] per box.

    Reference parity: utils.py:233-252.
    """
    image_hw = np.asarray(image_hw, dtype=np.float64).reshape(-1, 2)
    image_wh = image_hw[:, [1, 0]]
    grids_wh = 1.0 * image_wh / n_grid
    scale = np.concatenate((grids_wh, image_wh), axis=1)
    cwh = np.asarray(norm_cwh, dtype=np.float64) * scale
    cwh[:, 0:2] += np.asarray(grid_indices)[:, [1, 0]] * grids_wh
    return cwh


def cwh_to_xy_vec(cwh):
    """(num_boxes, 4) center boxes -> corner boxes.

    Reference parity: utils.py:254-269.
    """
    cwh = np.asarray(cwh)
    xy = np.empty_like(cwh)
    half_w = cwh[:, 2] / 2
    half_h = cwh[:, 3] / 2
    xy[:, 0] = cwh[:, 0] - half_w
    xy[:, 1] = cwh[:, 1] - half_h
    xy[:, 2] = cwh[:, 0] + half_w
    xy[:, 3] = cwh[:, 1] + half_h
    return xy


def y_to_boxes_vec(y, params, image_hw=None, conf_th=0.5):
    """Decode a YOLO grid tensor into flat box lists (host numpy).

    Args:
      y: (batch, n_grid, n_grid, 5*B + C) network output or ground truth
         (B=1 for ground truth).
      params: needs n_classes, darknet_input.
      image_hw: None -> all boxes mapped to darknet_input^2; else
         (batch, 2) per-image sizes.
      conf_th: confidence threshold (strict >).

    Returns:
      (image_indices (num_boxes,), xy (num_boxes, 4), classes or None)

    Reference parity: utils.py:288-334.  NOTE there is no NMS anywhere
    in the reference; thresholding is the only suppression.  See
    `ops.decode` for the static-shape on-device equivalent.
    """
    y = np.asarray(y)
    batch_size, n_grid, _, D = y.shape
    C = params.n_classes
    B = int((D - C) / 5)

    y_boxes = y[:, :, :, 0 : 5 * B].reshape(batch_size, n_grid, n_grid, B, 5)
    mask = y_boxes[:, :, :, :, 0] > conf_th
    indices = np.argwhere(mask)  # (num_boxes, 4): [img, row, col, b]

    cwh = y_boxes[mask][:, 1:5]
    image_indices = indices[:, 0]
    grid_indices = indices[:, 1:3]

    if image_hw is None:
        image_hw = (params.darknet_input, params.darknet_input)
    else:
        image_hw = np.asarray(image_hw)[image_indices]

    cwh = denorm_boxes_cwh_vec(image_hw, n_grid, cwh, grid_indices)
    xy = cwh_to_xy_vec(cwh)

    if C != 0:
        y_classes = y[:, :, :, 5 * B :]
        onehot = y_classes[indices[:, 0], indices[:, 1], indices[:, 2]]
        classes = np.argmax(onehot, axis=1)
    else:
        classes = None
    return image_indices, xy, classes


def combine_y_hat(images, dark_y_hat, class_y_hat, image_indices, boxes_xy, params):
    """Write classifier probabilities back into detector grid cells.

    Two-stage (darknet -> cnn/capsule) pipeline support: for each
    detected box, find its grid cell in the resized frame and append
    the classifier's class probabilities after the box channels.

    Reference parity: utils.py:336-351.
    """
    dark_y_hat = np.asarray(dark_y_hat)
    batch_size, n_grid, _, B = dark_y_hat.shape
    n_classes = class_y_hat.shape[1]

    y_hat = np.zeros((batch_size, n_grid, n_grid, B + n_classes))
    y_hat[:, :, :, 0:B] = dark_y_hat

    resized_hw = (params.darknet_input, params.darknet_input)
    for i, index in enumerate(image_indices):
        orig_hw = images[index].shape[0:2]
        resized_box_xy = resize_box_xy(orig_hw, resized_hw, boxes_xy[i])
        box_cwh = xy_to_cwh(resized_box_xy)
        _, (row, col) = normalize_box_cwh(resized_hw, params.n_grid, box_cwh)
        # a box center exactly on the right/bottom image edge (a
        # saturated sigmoid can emit 1.0) computes row/col == n_grid;
        # the reference would IndexError there (utils.py:336-351) —
        # clamp to the last cell (COMPAT.md, crash-fix class)
        row = min(row, n_grid - 1)
        col = min(col, n_grid - 1)
        y_hat[index, row, col, B:] = class_y_hat[i, :]
    return y_hat


# ---------------------------------------------------------------------------
# Device tier (jnp, static shapes) — used inside jitted losses
# ---------------------------------------------------------------------------

def cwh_to_xy_grid(cwh, img_size, n_grid):
    """Grid-frame center boxes -> corner boxes, on device.

    Matches the reference's loss-side conversion (utils.py:353-371,
    `cwh_to_xy_torch`): xc,yc are scaled by the grid cell size and w,h
    by the full image, WITHOUT adding the cell's row/col offset — both
    prediction and target of a given cell share this frame, so the IoU
    that feeds the YOLO loss is unchanged.  Works on any leading batch
    shape with trailing dim 4.
    """
    grid_size = 1.0 * img_size / n_grid
    xc = cwh[..., 0] * grid_size
    yc = cwh[..., 1] * grid_size
    half_w = cwh[..., 2] * img_size / 2
    half_h = cwh[..., 3] * img_size / 2
    return jnp.stack(
        [xc - half_w, yc - half_h, xc + half_w, yc + half_h], axis=-1
    )


def iou_xy(boxes_a, boxes_b):
    """IoU between corner boxes with broadcasting over leading dims.

    boxes_a: (..., A, 4), boxes_b: (..., B, 4) -> iou (..., A, B).
    Device-tier equivalent of the loss-side IoU (reference
    loss_fns.py:26-58) generalized to broadcast instead of expand.
    """
    a = boxes_a[..., :, None, :]
    b = boxes_b[..., None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter)

"""On-device YOLO grid decode with static shapes.

The reference decodes detections on the host with `np.argwhere`
(reference utils.py:288-334), which is a dynamic-shape operation XLA
cannot compile.  The TPU-native formulation decodes ALL grid cells in
parallel into a fixed-size box tensor plus a validity mask, sorted by
confidence (top-k), so the entire predict path — forward pass included
— runs in one jitted program.  The host converts the fixed-size output
to the reference's flat ragged lists with a trivial mask.

There is deliberately no NMS: the reference has none (SURVEY.md §2 #8),
so parity metrics see identical box sets.  `nms_mask` below is an
optional extension, OFF by default.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import iou_xy


@functools.partial(jax.jit, static_argnames=("n_classes", "n_boxes", "max_boxes", "img_size"))
def decode_grid(y, *, n_classes, n_boxes, img_size, max_boxes=None, conf_th=0.5):
    """Decode (batch, g, g, 5B+C) into fixed-size per-image box lists.

    max_boxes defaults to ALL g*g*B candidates so no above-threshold
    box is ever silently dropped (the reference returns every one,
    utils.py:288-334).  Pass a smaller static cap only when the caller
    can bound detections (e.g. benchmarking) — and then it is an
    explicit, visible choice.

    Returns dict of device arrays:
      conf:    (batch, max_boxes) confidence, descending.
      xy:      (batch, max_boxes, 4) corner boxes in img_size frame.
      classes: (batch, max_boxes) int32 argmax class (0 if C==0).
      valid:   (batch, max_boxes) bool, conf > conf_th.
      idx:     (batch, max_boxes) int32 original candidate index in
               row-major (row, col, box) grid order — the reference's
               np.argwhere emission order (utils.py:313); to_flat_host
               uses it to restore that order on the host.

    Numerics match the host reference (utils.py:288-334): denormalize
    center to cell offset + cell index, w/h to image scale, cwh->xy.
    """
    batch, g, _, D = y.shape
    B, C = n_boxes, n_classes
    assert D == 5 * B + C, (D, B, C)
    if max_boxes is None:
        max_boxes = g * g * B

    yb = y[..., : 5 * B].reshape(batch, g, g, B, 5)
    conf = yb[..., 0]                                   # (batch,g,g,B)
    cwh = yb[..., 1:5]

    grid_size = img_size / g
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    xc = (cwh[..., 0] + cols[None, :, :, None]) * grid_size
    yc = (cwh[..., 1] + rows[None, :, :, None]) * grid_size
    w = cwh[..., 2] * img_size
    h = cwh[..., 3] * img_size
    xy = jnp.stack(
        [xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], axis=-1
    )                                                   # (batch,g,g,B,4)

    if C != 0:
        cls = jnp.argmax(y[..., 5 * B :], axis=-1).astype(jnp.int32)
        cls = jnp.broadcast_to(cls[..., None], conf.shape)
    else:
        cls = jnp.zeros(conf.shape, jnp.int32)

    n_cand = g * g * B
    k = min(max_boxes, n_cand)
    conf_f = conf.reshape(batch, n_cand)
    top_conf, top_idx = jax.lax.top_k(conf_f, k)
    take = jax.vmap(lambda a, i: a[i])
    out_xy = take(xy.reshape(batch, n_cand, 4), top_idx)
    out_cls = take(cls.reshape(batch, n_cand), top_idx)
    valid = top_conf > conf_th

    if k < max_boxes:  # pad to the static max_boxes width
        pad = max_boxes - k
        top_conf = jnp.pad(top_conf, ((0, 0), (0, pad)))
        out_xy = jnp.pad(out_xy, ((0, 0), (0, pad), (0, 0)))
        out_cls = jnp.pad(out_cls, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        top_idx = jnp.pad(top_idx, ((0, 0), (0, pad)))

    return {"conf": top_conf, "xy": out_xy, "classes": out_cls,
            "valid": valid, "idx": top_idx.astype(jnp.int32)}


def to_flat_host(decoded, image_hw=None, img_size=None, with_classes=True):
    """Convert fixed-size device output to the reference's flat lists.

    Args:
      decoded: dict from `decode_grid` (device or host arrays).
      image_hw: optional (batch, 2) original image sizes; boxes are
        rescaled from the img_size frame (matching the reference's
        behavior of denormalizing directly into each image's frame,
        utils.py:320-325).
      img_size: network input size (needed when image_hw given).

    Returns (image_indices, xy, classes_or_None) exactly like
    `ops.boxes.y_to_boxes_vec` — always a 3-tuple.  Callers that need
    extra per-slot arrays flattened in the same order use
    `to_flat_host_with_extras` (a stable 4-tuple) instead of a
    shape-shifting return here.

    Per-image box order is the reference's np.argwhere grid-scan order
    (row, col, box — utils.py:313), restored from decode_grid's `idx`
    (the device output is confidence-sorted by top_k).  Order matters
    downstream: the two-stage crops feed combine_y_hat, whose same-cell
    writes are last-wins (utils.py:336-351).
    """
    out, _ = to_flat_host_with_extras(
        decoded, None, image_hw=image_hw, img_size=img_size,
        with_classes=with_classes)
    return out


def to_flat_host_with_extras(decoded, extras, image_hw=None, img_size=None,
                             with_classes=True):
    """`to_flat_host` plus extra per-slot arrays, stable 4-tuple.

    `extras` is a dict of (batch, max_boxes, ...) arrays flattened in
    the SAME restored grid order as the boxes (e.g. the fused two-stage
    path's per-slot classifier scores).  Returns
    ((image_indices, xy, classes_or_None), flat_extras); flat_extras is
    {} when extras is None/empty.
    """
    conf = np.asarray(decoded["conf"])
    xy = np.asarray(decoded["xy"])
    cls = np.asarray(decoded["classes"])
    valid = np.asarray(decoded["valid"])
    idx = np.asarray(decoded["idx"]) if "idx" in decoded else None
    extras = {k: np.asarray(v) for k, v in (extras or {}).items()}

    img_idx, boxes, classes = [], [], []
    extras_out = {k: [] for k in extras}
    for i in range(conf.shape[0]):
        m = valid[i]
        order = (np.argsort(idx[i][m]) if idx is not None
                 else np.arange(int(m.sum())))
        b = xy[i][m][order]
        if image_hw is not None:
            hscale = image_hw[i][0] / img_size
            wscale = image_hw[i][1] / img_size
            b = b * np.array([wscale, hscale, wscale, hscale])
        img_idx.append(np.full(b.shape[0], i, dtype=np.int64))
        boxes.append(b)
        classes.append(cls[i][m][order])
        for k, arr in extras.items():
            extras_out[k].append(arr[i][m][order])
    image_indices = np.concatenate(img_idx) if img_idx else np.zeros(0, np.int64)
    xy_out = np.concatenate(boxes) if boxes else np.zeros((0, 4))
    cls_out = np.concatenate(classes) if classes else np.zeros(0, np.int64)
    out = (image_indices, xy_out, (cls_out if with_classes else None))
    flat_extras = {
        k: (np.concatenate(v) if v
            else np.zeros((0,) + extras[k].shape[2:], extras[k].dtype))
        for k, v in extras_out.items()
    }
    return out, flat_extras


def nms_mask(xy, conf, valid, iou_th=0.5):
    """Optional on-device greedy NMS over a fixed-size, conf-sorted list.

    Extension beyond the reference (which has NO suppression other than
    the confidence threshold); OFF by default everywhere.  Returns an
    updated validity mask.
    """
    n = xy.shape[-2]

    def body(i, keep):
        # shared IoU helper; degenerate padded slots (zero-area boxes)
        # produce 0/0 -> treated as IoU 0, never suppressing anything
        iou = jnp.nan_to_num(
            iou_xy(xy[..., i, None, :], xy)[..., 0, :])
        later = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) > i
        kill = (iou > iou_th) & later & keep[..., i, None]
        return keep & ~kill

    keep = jax.lax.fori_loop(0, n, body, valid)
    return keep

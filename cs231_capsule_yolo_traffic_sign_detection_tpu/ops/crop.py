"""On-device crop + bilinear resize for the two-stage pipeline.

The product two-stage path (predict.dark_class_pred, reference
predict_fns.py:75-82) hops through the host between the stages: fetch
the detector outputs, slice each detection out of the frame with
numpy, cv2.resize it to the classifier input, re-upload.  Measured at
~40% of the pipeline's non-link time (BASELINE.md combine section).
This module is the TPU-native alternative: a fixed-size masked
gather + bilinear sample that crops every decoded box directly from
the device-resident network input, so detect -> crop -> classify can
compile into ONE program (export.make_two_stage_fn).

Semantics match the host path per element (viz.draw_boxes +
cv2.resize INTER_LINEAR, tests/test_crop.py):
  * integer crop window [int(x1), int(x2)) clipped to the frame
    (viz.py:38-47 incl. the negative-edge clip deviation, COMPAT.md);
  * cv2 bilinear sampling: dst pixel j reads src coordinate
    (j + 0.5) * crop/out - 0.5, corners clamped inside the crop
    (border replicate), fractional weights;
  * degenerate windows (empty after clipping) and masked-out boxes
    yield all-zero crops — the same zero substitution the host path
    makes (predict.py dark_pred crops tail).

DEVIATION (opt-in only): the device path crops from the RESIZED
network input (e.g. 448x448), not the original full-resolution frame —
the full-res frames never reach the device.  A sign that spans s
pixels of the 448 frame is sampled from s pixels instead of the
~s*(original/448) pixels the host path sees.  Documented in COMPAT.md.
"""

import functools

import jax
import jax.numpy as jnp


def _axis_samples(lo, hi, size, out):
    """1-D cv2-style sample positions inside an integer crop window.

    lo/hi: clipped integer crop bounds (scalars, traced); size: frame
    extent (static); out: output extent (static).  Returns (idx0,
    idx1, frac) each (out,) — absolute gather indices of the two
    neighbors and the bilinear weight of idx1.
    """
    n = hi - lo                                     # crop extent, >= 0
    n_safe = jnp.maximum(n, 1)
    j = jnp.arange(out, dtype=jnp.float32)
    r = (j + 0.5) * (n_safe.astype(jnp.float32) / out) - 0.5
    r0 = jnp.floor(r).astype(jnp.int32)
    frac = r - r0.astype(jnp.float32)
    # border replicate, cv2-style: a sample left of pixel 0 reads pixel
    # 0 with ZERO fraction (not a 0/1 mix); right of the last pixel both
    # neighbors collapse to it, making frac irrelevant there
    frac = jnp.where(r0 < 0, 0.0, frac)
    i0 = jnp.clip(r0, 0, n_safe - 1)
    i1 = jnp.minimum(i0 + 1, n_safe - 1)
    # absolute, clamped to the frame for gather safety (masked anyway
    # when the window is degenerate)
    idx0 = jnp.clip(lo + i0, 0, size - 1)
    idx1 = jnp.clip(lo + i1, 0, size - 1)
    return idx0, idx1, frac


def _crop_one(image, box, out):
    """image (H, W, C), box (4,) x1,y1,x2,y2 pixels -> (out, out, C)."""
    h, w = image.shape[0], image.shape[1]
    # host parity: int() truncation, then clip (viz.py:45-47; negatives
    # truncate toward zero but are clipped to 0 anyway)
    x1 = jnp.clip(jnp.trunc(box[0]).astype(jnp.int32), 0, w)
    y1 = jnp.clip(jnp.trunc(box[1]).astype(jnp.int32), 0, h)
    x2 = jnp.clip(jnp.trunc(box[2]).astype(jnp.int32), 0, w)
    y2 = jnp.clip(jnp.trunc(box[3]).astype(jnp.int32), 0, h)
    ok = (x2 > x1) & (y2 > y1)

    xi0, xi1, fx = _axis_samples(x1, x2, w, out)
    yi0, yi1, fy = _axis_samples(y1, y2, h, out)

    # separable bilinear: gather the two row planes, then mix columns
    rows0 = image[yi0]                               # (out, W, C)
    rows1 = image[yi1]
    rows = rows0 + fy[:, None, None] * (rows1 - rows0)
    cols0 = rows[:, xi0]                             # (out, out, C)
    cols1 = rows[:, xi1]
    res = cols0 + fx[None, :, None] * (cols1 - cols0)
    return jnp.where(ok, res, jnp.zeros_like(res))


@functools.partial(jax.jit, static_argnames=("out",))
def crop_resize_bilinear(images, boxes, out, valid=None):
    """Batched masked crop+resize.

    images (B, H, W, C) float; boxes (B, M, 4) corner boxes in pixel
    coordinates of `images`' frame; valid (B, M) bool optional —
    False boxes come back all-zero.  Returns (B, M, out, out, C).
    """
    fn = jax.vmap(jax.vmap(functools.partial(_crop_one, out=out),
                           in_axes=(None, 0)), in_axes=(0, 0))
    crops = fn(images.astype(jnp.float32), boxes.astype(jnp.float32))
    if valid is not None:
        crops = jnp.where(valid[:, :, None, None, None], crops,
                          jnp.zeros_like(crops))
    return crops

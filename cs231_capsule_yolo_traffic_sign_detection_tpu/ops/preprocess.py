"""On-device (fused XLA) image preprocessing.

The reference's predict path resizes every raw image on the host with
cv2 before the forward pass (reference predict_fns.py:36-38).  This
module moves the resize (+ optional [-1,1] centering, reference
utils.py:122-123) onto the device so raw uint8 frames stream straight
into HBM and the whole preprocess+forward+decode pipeline is one
compiled program.

Opt-in (`params.device_preprocess`): jax.image.resize's bilinear
kernel differs from cv2.INTER_LINEAR by rounding details, so the
default stays host-cv2 for byte parity with the reference.  NOTE the
reference does NOT center detector inputs at predict time (it feeds
raw 0-255 values, predict_fns.py:38) while training data is centered —
we reproduce that quirk; `center=True` is available for sane serving.
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "center"))
def preprocess_batch(images_u8, size, center=False):
    """(B, H, W, 3) uint8 -> (B, size, size, 3) float32 on device."""
    x = images_u8.astype(jnp.float32)
    b = x.shape[0]
    # antialias off matches cv2.INTER_LINEAR's plain bilinear sampling
    # (jax defaults to an antialiased triangle kernel when downscaling)
    x = jax.image.resize(x, (b, size, size, 3), method="bilinear",
                         antialias=False)
    if center:
        x = (x - 128.0) / 128.0
    return x


def preprocess_images(images, size, center=False):
    """List of same-shape host images -> device batch; returns None when
    shapes are ragged (caller falls back to host cv2)."""
    shapes = {im.shape for im in images}
    if len(shapes) != 1:
        return None
    import numpy as np

    batch = jnp.asarray(np.stack(images))
    return preprocess_batch(batch, size, center)

"""Hyperspherical (polar) transform for the darkcapsule loss.

Maps a YOLO target vector (r, x, y, w, h) to a presence scalar r plus a
5-d unit direction built from hyperspherical angles, so a capsule's
orientation can encode box geometry and its norm the objectness.

Reference parity: utils.py:65-85 (`polar_transform`); angles are
f1=x*pi, f2=y*pi, f3=h*pi, f4=w*2*pi (note h before w, as in the
reference).
"""

import numpy as np
import jax.numpy as jnp


def polar_transform(x):
    """x: (..., 5) [r, x, y, w, h] -> (r (...,), direction (..., 5)).

    Pure jnp; differentiable; static shapes.
    """
    assert x.shape[-1] == 5, "polar transform failed, dimension mismatched"
    r = x[..., 0]
    f1 = x[..., 1] * np.pi
    f2 = x[..., 2] * np.pi
    f3 = x[..., 4] * np.pi        # h
    f4 = x[..., 3] * np.pi * 2    # w

    s1, c1 = jnp.sin(f1), jnp.cos(f1)
    s2, c2 = jnp.sin(f2), jnp.cos(f2)
    s3, c3 = jnp.sin(f3), jnp.cos(f3)
    s4, c4 = jnp.sin(f4), jnp.cos(f4)

    x_hat = jnp.stack(
        [
            s1,
            s1 * c2,
            s1 * s2 * c3,
            s1 * s2 * s3 * c4,
            s1 * s2 * s3 * s4,
        ],
        axis=-1,
    )
    return r, x_hat

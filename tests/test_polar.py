"""polar_transform golden tests (reference utils.py:65-85)."""

import numpy as np
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.polar import polar_transform


def _torch_polar(x):
    """Independent torch re-implementation of the reference formulas."""
    import torch

    x = torch.from_numpy(x)
    sh = x.shape
    x = x.reshape(-1, 5)
    r, xx, yy, w, h = torch.chunk(x, 5, 1)
    f1, f2, f3, f4 = xx * np.pi, yy * np.pi, h * np.pi, w * np.pi * 2
    s1, c1 = torch.sin(f1), torch.cos(f1)
    s2, c2 = torch.sin(f2), torch.cos(f2)
    s3, c3 = torch.sin(f3), torch.cos(f3)
    s4, c4 = torch.sin(f4), torch.cos(f4)
    x_hat = torch.cat(
        [s1, s1 * c2, s1 * s2 * c3, s1 * s2 * s3 * c4, s1 * s2 * s3 * s4], 1)
    return r.reshape(*sh[:-1]).numpy(), x_hat.reshape(*sh[:-1], 5).numpy()


def test_polar_matches_torch(rng):
    x = rng.rand(2, 3, 3, 5).astype(np.float64)
    r, phi = polar_transform(jnp.asarray(x))
    r_t, phi_t = _torch_polar(x)
    np.testing.assert_allclose(np.asarray(r), r_t, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(phi), phi_t, rtol=1e-12)


def test_polar_norm_identity(rng):
    # The reference uses s1 (not c1) for the first component
    # (utils.py:78), so ||phi||^2 == 2*sin(pi*x)^2 — NOT unit norm.
    # (This is why the darkcapsule losses rescale capsules by sqrt(2).)
    x = rng.rand(4, 5)
    _, phi = polar_transform(jnp.asarray(x))
    np.testing.assert_allclose(
        np.sum(np.asarray(phi) ** 2, axis=-1),
        2 * np.sin(np.pi * x[:, 1]) ** 2, rtol=1e-6)

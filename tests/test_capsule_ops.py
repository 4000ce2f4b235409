"""Capsule primitive tests: squash, priors, routing — golden values
cross-checked against an independent torch implementation of the
reference formulas (models.py:64-79)."""

import numpy as np
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import capsule as C


def test_squash_norm_properties(rng):
    v = jnp.asarray(rng.randn(4, 10, 8).astype(np.float32))
    out = np.asarray(C.squash(v))
    n_in = np.linalg.norm(np.asarray(v), axis=-1)
    n_out = np.linalg.norm(out, axis=-1)
    # squash maps norm n -> n^2/(1+n^2): always < 1, monotone
    np.testing.assert_allclose(n_out, n_in**2 / (1 + n_in**2), rtol=1e-5)
    # direction preserved
    cos = np.sum(out * np.asarray(v), -1) / (n_in * n_out)
    np.testing.assert_allclose(cos, 1.0, rtol=1e-5)


def test_squash_zero_safe():
    v = jnp.zeros((2, 3, 8))
    out = np.asarray(C.squash(v))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 0.0)


def _torch_routing(x, w, n_iter=3):
    """Independent re-implementation of the reference routing math in
    torch (formulas from models.py:64-79) for cross-validation."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x)
    w = torch.from_numpy(w)  # (n_nodes, n_caps, in_C, out_C)

    def squash(v):
        sq = (v ** 2).sum(dim=-1, keepdim=True)
        return sq / (1 + sq) * v / torch.sqrt(sq)

    priors = (x[:, :, None, None, :] @ w[None]).squeeze(3)
    logits = torch.zeros_like(priors)
    for i in range(n_iter):
        probs = F.softmax(logits, dim=2)
        outputs = squash((probs * priors).sum(dim=1, keepdim=True))
        if i != n_iter - 1:
            logits = logits + (priors * outputs).sum(dim=-1, keepdim=True)
    return outputs.numpy()


def test_routing_matches_torch_formulas(rng):
    batch, nodes, caps, in_c, out_c = 3, 24, 7, 8, 16
    x = rng.randn(batch, nodes, in_c).astype(np.float64)
    w = 0.1 * rng.randn(nodes, caps, in_c, out_c).astype(np.float64)

    priors = C.compute_priors(jnp.asarray(x), jnp.asarray(w))
    ours = np.asarray(C.dynamic_routing(priors, n_iter=3))
    theirs = _torch_routing(x, w, n_iter=3)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)


def test_capsule_norm():
    v = jnp.array([[[3.0, 4.0]]])
    np.testing.assert_allclose(np.asarray(C.capsule_norm(v)), [[5.0]])


def test_single_capsule_closed_form_matches_loop(rng):
    """n_caps==1 (DarkCapsuleNet's head, reference models.py:368-370):
    the routing softmax is over a singleton axis, so the full
    3-iteration loop must equal squash(sum_n priors) — the closed form
    routed_single_capsule computes with one fused contraction."""
    batch, nodes, in_c, out_c = 4, 512, 8, 5
    x = rng.randn(batch, nodes, in_c).astype(np.float64)
    w = 0.1 * rng.randn(nodes, 1, in_c, out_c).astype(np.float64)

    priors = C.compute_priors(jnp.asarray(x), jnp.asarray(w))
    loop = np.asarray(C.dynamic_routing(priors, n_iter=3)[:, 0])
    closed = np.asarray(C.routed_single_capsule(jnp.asarray(x),
                                                jnp.asarray(w)))
    np.testing.assert_allclose(closed, loop, rtol=1e-12, atol=1e-14)
    # and against the executing torch reference formulas
    theirs = _torch_routing(x, w, n_iter=3)[:, 0]
    np.testing.assert_allclose(closed, theirs, rtol=1e-10, atol=1e-12)

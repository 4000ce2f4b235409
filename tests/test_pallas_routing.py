"""Numerical parity: fused Pallas routing kernel vs the XLA path.

On CPU the kernel runs in interpreter mode (same program, emulated);
the compiled TPU path is exercised by bench.py and the driver when
--routing pallas is selected.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import capsule as C
from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import routing_pallas as RP


def _xla(x, w, n_iter=3):
    priors = C.compute_priors(jnp.asarray(x), jnp.asarray(w))
    return np.asarray(C.dynamic_routing(priors, n_iter=n_iter)[:, 0])


def test_pallas_parity_capsulenet_shape(rng):
    # CapsuleNet-like: N=1296 nodes, K=43 caps, D=16 — but shrunk nodes
    # for CPU interpreter speed (N=160 keeps the same padding paths)
    B, N, K, in_c, D = 2, 160, 43, 8, 16
    x = rng.randn(B, N, in_c).astype(np.float32)
    w = (0.1 * rng.randn(N, K, in_c, D)).astype(np.float32)

    ours = np.asarray(RP._route(
        jnp.asarray(x), jnp.asarray(w), 3, interpret=True))
    ref = _xla(x, w)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_pallas_parity_darkcapsule_shape(rng):
    # DarkCapsuleNet-like: N=512, K=1, D=5
    B, N, K, in_c, D = 3, 512, 1, 8, 5
    x = rng.randn(B, N, in_c).astype(np.float32)
    w = (0.1 * rng.randn(N, K, in_c, D)).astype(np.float32)

    ours = np.asarray(RP._route(
        jnp.asarray(x), jnp.asarray(w), 3, interpret=True))
    ref = _xla(x, w)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_pallas_grad_matches_xla(rng):
    B, N, K, in_c, D = 2, 64, 7, 8, 16
    x = jnp.asarray(rng.randn(B, N, in_c).astype(np.float32))
    w = jnp.asarray((0.1 * rng.randn(N, K, in_c, D)).astype(np.float32))

    def loss_pallas(x, w):
        return jnp.sum(RP.routed_capsules_pallas(x, w, 3) ** 2)

    def loss_xla(x, w):
        priors = C.compute_priors(x, w)
        return jnp.sum(C.dynamic_routing(priors, 3)[:, 0] ** 2)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x), rtol=1e-4,
                               atol=1e-6)


def test_pallas_bf16_parity_band(rng):
    """bf16 kernel variant (VERDICT r2 item 2): same program with bf16
    operand storage + single-pass MXU contractions, f32 accumulation.
    Must stay within a bf16-rounding band of the f32 kernel."""
    B, N, K, in_c, D = 2, 160, 43, 8, 16
    x = rng.randn(B, N, in_c).astype(np.float32)
    w = (0.1 * rng.randn(N, K, in_c, D)).astype(np.float32)

    f32 = np.asarray(RP._route(
        jnp.asarray(x), jnp.asarray(w), 3, interpret=True))
    bf16 = np.asarray(RP._route(
        jnp.asarray(x), jnp.asarray(w), 3, interpret=True, bf16=True))
    assert bf16.dtype == np.float32  # caps output stays f32
    # one bf16 rounding on operands/products, f32 accumulation; caps
    # values are O(0.1-1) post-squash
    np.testing.assert_allclose(bf16, f32, rtol=0.05, atol=5e-3)
    # and it must still agree with the XLA reference within that band
    np.testing.assert_allclose(bf16, _xla(x, w), rtol=0.05, atol=5e-3)


def test_pallas_bf16_grad_band(rng):
    B, N, K, in_c, D = 2, 64, 7, 8, 16
    x = jnp.asarray(rng.randn(B, N, in_c).astype(np.float32))
    w = jnp.asarray((0.1 * rng.randn(N, K, in_c, D)).astype(np.float32))

    def loss(bf16):
        def f(x, w):
            return jnp.sum(RP.routed_capsules_pallas(x, w, 3, bf16) ** 2)
        return jax.grad(f, argnums=(0, 1))(x, w)

    gx_b, gw_b = loss(True)
    gx_f, gw_f = loss(False)
    # gradient state stays f32; errors are bf16 operand rounding only.
    # atol anchored to each gradient's own scale (tiny near-zero
    # elements see absolute bf16 noise)
    np.testing.assert_allclose(
        np.asarray(gx_b), np.asarray(gx_f), rtol=0.08,
        atol=0.02 * float(np.abs(np.asarray(gx_f)).max()))
    np.testing.assert_allclose(
        np.asarray(gw_b), np.asarray(gw_f), rtol=0.08,
        atol=0.02 * float(np.abs(np.asarray(gw_f)).max()))

"""Fused space-to-depth input stage (ops/input_stage.py).

The rewrite must be EXACT (same function, different schedule):
pool2x2(leaky(conv3x3(x) + b)) == leaky(max_phases(conv_s2d(x) + b)).
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
    input_stage, quant)


def _direct(x, w, b, slope=0.1):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    y = jax.nn.leaky_relu(y, slope)
    return nn.max_pool(y, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("hw,cin,cout", [(16, 3, 32), (8, 5, 7)])
def test_input_stage_exact(hw, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
    w = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    b = jnp.asarray(rng.randn(cout).astype(np.float32))

    want = _direct(x, w, b)
    wp, bp = input_stage.phase_kernel(w, b)
    got = input_stage.input_stage_apply(x, wp, bp, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_space_to_depth_layout():
    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    s = input_stage.space_to_depth(x)
    assert s.shape == (2, 2, 2, 12)
    # channel (2a+b)*C + c is original pixel (2p+a, 2q+b, c)
    for a in range(2):
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(s[0, 1, 0, (2 * a + b) * 3:(2 * a + b) * 3 + 3]),
                np.asarray(x[0, 2 + a, 0 + b, :]))


@pytest.fixture(scope="module")
def darknet_setup():
    model = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.RandomState(1)

    def perturb(path, a):
        names = [getattr(p, "key", "") for p in path]
        if any(str(n).startswith("bn_") for n in names):
            return a + jnp.asarray(
                0.05 * np.abs(rng.randn(*a.shape)).astype(np.float32))
        return a

    variables = jax.tree_util.tree_map_with_path(perturb, dict(variables))
    return model, variables, x, model.apply(variables, x, train=False)


def test_serving_apply_fused_matches_model_f32(darknet_setup):
    model, variables, x, y_ref = darknet_setup
    p = input_stage.prepare_serving(variables, fuse_input=True)
    y = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), atol=5e-5)


def test_serving_apply_bf16_tracks_f32(darknet_setup):
    model, variables, x, y_ref = darknet_setup
    p = input_stage.prepare_serving(variables, fuse_input=True)
    y = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.bfloat16)
    err = np.abs(np.asarray(y) - np.asarray(y_ref))
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.12, err.max()


def test_serving_apply_jits(darknet_setup):
    """The prepared pytree is arrays-only: jit over it directly."""
    model, variables, x, _ = darknet_setup
    p = input_stage.prepare_serving(variables, fuse_input=True)

    @jax.jit
    def f(p, x):
        return input_stage.darknet_serving_apply(
            p, x, n_boxes=1, n_classes=43, dtype=jnp.float32)

    y1 = f(p, x)
    y2 = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)


def test_input_stage_pallas_matches_xla(darknet_setup):
    """The Pallas fused input-stage kernel (interpreter on CPU) tracks
    the XLA s2d formulation within bf16 tolerance."""
    model, variables, x, _ = darknet_setup
    p = input_stage.prepare_serving(variables, fuse_input=True)
    want = input_stage.input_stage_apply(
        x.astype(jnp.bfloat16), p["wp"].astype(jnp.bfloat16),
        p["bp"], 32)
    got = input_stage.input_stage_pallas(x, p["wp"], p["bp"], 32)
    assert got.shape == want.shape
    err = np.abs(np.asarray(got, np.float32)
                 - np.asarray(want, np.float32))
    assert err.mean() < 5e-3, err.mean()
    assert err.max() < 0.1, err.max()


def test_serving_apply_pallas_input_end_to_end(darknet_setup):
    model, variables, x, y_ref = darknet_setup
    p = input_stage.prepare_serving(variables, fuse_input=True)
    y = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.bfloat16,
        pallas_pool=True, pallas_input=True)
    err = np.abs(np.asarray(y) - np.asarray(y_ref))
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.15, err.max()

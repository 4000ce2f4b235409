"""Fused max-pool+leaky kernel (ops/pool_pallas.py), interpreter mode.

Exactness: maxpool2_leaky(x) == max_pool(leaky_relu(x)) — equal by
monotonicity of leaky ReLU (slope > 0), bit-for-bit in f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import pool_pallas


def _ref(x, slope=0.1):
    return nn.max_pool(jax.nn.leaky_relu(x, slope), (2, 2),
                       strides=(2, 2))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16), (1, 28, 28, 64), (3, 4, 6, 5), (2, 224, 16, 32),
])
def test_pool_leaky_exact_f32(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape)
                    .astype(np.float32))
    got = pool_pallas.maxpool2_leaky(x, 0.1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_ref(x)))


def test_pool_leaky_bf16():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 32)
                    .astype(np.float32)).astype(jnp.bfloat16)
    got = pool_pallas.maxpool2_leaky(x, 0.1)
    want = _ref(x.astype(jnp.float32)).astype(jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=1e-2, atol=1e-2)


def test_pool_leaky_negative_values_use_slope():
    x = -jnp.ones((1, 4, 4, 8), jnp.float32)
    got = pool_pallas.maxpool2_leaky(x, 0.1)
    np.testing.assert_allclose(np.asarray(got), -0.1 * np.ones((1, 2, 2, 8)),
                               rtol=1e-6)


def test_serving_apply_pallas_pool_matches_xla():
    """darknet_serving_apply(pallas_pool=True) == the XLA pool path."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        DarkNet)
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        input_stage)

    model = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    p = input_stage.prepare_serving(variables, fuse_input=True)
    y_xla = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.float32,
        pallas_pool=False)
    y_pl = input_stage.darknet_serving_apply(
        p, x, n_boxes=1, n_classes=43, dtype=jnp.float32,
        pallas_pool=True)
    np.testing.assert_allclose(
        np.asarray(y_pl), np.asarray(y_xla), rtol=1e-5, atol=1e-5)

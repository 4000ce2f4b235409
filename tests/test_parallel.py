"""Multi-device tests on the 8-device virtual CPU mesh.

Validates that the train step is sharding-agnostic: batch sharded over
'data' (data parallelism; XLA inserts the grad psum) and, for the
capsule model, routing weights sharded over 'model' (tensor
parallelism on the output-capsule axis)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu import parallel as par
from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer


def _params(model, **over):
    base = dict(
        model=model, n_classes=43, batch_size=8, lr_runtime=1e-3,
        lr_decay=0.1, n_epochs=1, eval_every=1, train_frac=1,
        recon=True, recon_coef=5e-4, dropout=0.0,
        n_boxes=1, n_grid=2, darknet_input=64, capsule_input=32,
    )
    base.update(over)
    return Params(**base)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def _copy_state(state):
    """Deep-copy a TrainState (train_step donates its input buffers)."""
    import jax as _jax

    return _jax.tree_util.tree_map(jnp.array, state)


def test_dp_train_step_matches_single_device():
    """Loss and gradients of the sharded step match the single-device
    step.  Compared in float64 where they agree to machine epsilon; in
    f32 the comparison is polluted by reduction-order noise on grads
    that cancel over ~1e4 terms (BN betas, pre-BN conv biases)."""
    p = _params("cnn")
    trainer = Trainer(p, verbose=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 32, 32, 3))           # f64 (x64 on)
    y = jnp.asarray(rng.randint(0, 43, 8))

    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (
        make_grad_fn,
    )

    def to_f64(t):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if hasattr(a, "dtype") and a.dtype == jnp.float32
            else jnp.array(a), t)

    grad_fn = make_grad_fn(trainer.model, trainer.model_name,
                           trainer.loss_cfg)
    state0 = to_f64(trainer.state)
    loss1, grads1 = grad_fn(_copy_state(state0), x, y)

    mesh = par.make_mesh(n_data=8, n_model=1)
    state_sharded = par.shard_state(state0, mesh)
    xs, ys = par.shard_batch((x, y), mesh)
    loss2, grads2 = grad_fn(state_sharded, xs, ys)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-12)
    flat1 = jax.tree_util.tree_flatten_with_path(grads1)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(grads2)[0]
    for (path, a), (_, b) in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12,
            err_msg="/".join(str(getattr(q, "key", "")) for q in path))


def test_tp_routing_sharded_capsule():
    p = _params("capsule", batch_size=4)
    trainer = Trainer(p, verbose=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 43, 4))

    state0 = _copy_state(trainer.state)
    _, loss1, _, _ = trainer.train_step(_copy_state(state0), x, y, 1e-3)

    mesh = par.make_mesh(n_data=4, n_model=2)
    state_sharded = par.shard_state(state0, mesh, shard_routing=True)
    xs, ys = par.shard_batch((x, y), mesh)
    _, loss2, _, _ = trainer.train_step(state_sharded, xs, ys, 1e-3)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_detector_dp_step():
    p = _params("darknet_r", batch_size=8)
    trainer = Trainer(p, verbose=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    g = p.n_grid
    y = np.zeros((8, g, g, 5 + 43), np.float32)
    y[:, 0, 0, 0:5] = [1, 0.5, 0.5, 0.2, 0.2]
    y[:, 0, 0, 5] = 1

    mesh = par.make_mesh(n_data=8)
    state = par.shard_state(trainer.state, mesh)
    xs, ys = par.shard_batch((x, jnp.asarray(y)), mesh)
    state, loss, aux, y_hat = trainer.train_step(state, xs, ys, 1e-3)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(aux["avg_iou"]))
    assert y_hat.shape == (8, g, g, 5 + 43)

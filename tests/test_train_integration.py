"""End-to-end training integration tests (the reference's overfit-mode
sanity check, SURVEY.md §4): each model drives its loss down on a tiny
synthetic set through the full jitted train step."""

import os

import numpy as np
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer


def _params(model, **over):
    base = dict(
        model=model, n_classes=43, batch_size=8, lr_runtime=1e-3,
        lr_decay=0.1, n_epochs=2, eval_every=1, train_frac=1,
        recon=True, recon_coef=5e-4, dropout=0.0,
        n_boxes=2, n_grid=2, darknet_input=64, capsule_input=32,
    )
    base.update(over)
    return Params(**base)


def _run_epochs(params, n_epochs=3, n=16):
    x_tr, y_tr, _, _ = synthetic_dataset(params.model, params,
                                         n_train=n, n_eval=4)
    trainer = Trainer(params, verbose=False)
    losses = []
    for _ in range(n_epochs):
        loss, _ = trainer.train_epoch(x_tr, y_tr, lr=params.lr_runtime,
                                      metric_on=False)
        losses.append(loss)
    return losses, trainer


def test_cnn_overfits():
    losses, _ = _run_epochs(_params("cnn"), n_epochs=5)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_capsule_trains_with_recon():
    losses, _ = _run_epochs(_params("capsule"), n_epochs=3)
    assert losses[-1] < losses[0]


def test_darknet_r_trains():
    p = _params("darknet_r", n_boxes=1, batch_size=4)
    losses, trainer = _run_epochs(p, n_epochs=3, n=8)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_darknet_d_trains():
    p = _params("darknet_d", n_classes=0, batch_size=4)
    losses, _ = _run_epochs(p, n_epochs=2, n=8)
    assert np.isfinite(losses).all()


def test_darkcapsule_trains():
    p = _params("darkcapsule", batch_size=4)
    losses, _ = _run_epochs(p, n_epochs=3, n=8)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from flax import serialization
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )

    p = _params("cnn")
    losses, trainer = _run_epochs(p, n_epochs=1)
    d = str(tmp_path / "ck")
    ckpt.save_checkpoint(trainer.state_dict(1, None), is_best=True,
                         checkpoint_dir=d)

    trainer2 = Trainer(p, verbose=False)
    raw = ckpt.load_checkpoint(d + "/best.ckpt")
    trainer2.state = serialization.from_state_dict(trainer2.state,
                                                   raw["state"])
    for a, b in zip(jax.tree_util.tree_leaves(trainer.state.params),
                    jax.tree_util.tree_leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert raw["epoch"] == 1


def test_ckpt_every_gates_last_saves(tmp_path, monkeypatch):
    """--ckpt_every N: `last` written every Nth epoch and on the final
    epoch; `best` still written the moment the metric improves (here:
    epoch 1, the only is_best epoch under no_metric's constant -1)."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        driver as drv,
    )

    calls = []
    orig = drv.ckpt.save_checkpoint

    def spy(state, is_best, checkpoint_dir):
        calls.append((state["epoch"], is_best))
        return orig(state, is_best=is_best, checkpoint_dir=checkpoint_dir)

    monkeypatch.setattr(drv.ckpt, "save_checkpoint", spy)
    np.random.seed(0)
    p = _params("cnn", n_epochs=5, ckpt_every=3)
    md = str(tmp_path / "m")
    os.makedirs(md, exist_ok=True)
    drv.train_and_evaluate(p, str(tmp_path / "nodata"), md,
                           no_metric=True, seed=0, progress=False)
    assert [e for e, _ in calls] == [1, 3, 5]
    assert [b for _, b in calls] == [True, False, False]
    d = md + str(p.train_frac)
    assert os.path.exists(os.path.join(d, "last.ckpt"))
    assert os.path.exists(os.path.join(d, "best.ckpt"))


def test_plateau_semantics():
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.plateau import (
        ReduceLROnPlateau,
    )

    s = ReduceLROnPlateau(lr=1.0, factor=0.1, patience=2)
    for loss in [1.0, 0.9, 0.8]:           # improving: no decay
        s.step(loss)
    assert s.lr == 1.0
    s.step(0.8)  # bad 1
    s.step(0.8)  # bad 2
    assert s.lr == 1.0
    s.step(0.8)  # bad 3 > patience -> decay
    assert abs(s.lr - 0.1) < 1e-12


def test_reproducible_training():
    """Same seed => bit-identical training trajectory (functional RNG)."""
    import numpy as np

    losses = []
    for _ in range(2):
        np.random.seed(123)
        p = _params("cnn", batch_size=8)
        ls, _ = _run_epochs(p, n_epochs=2, n=16)
        losses.append(ls)
    assert losses[0] == losses[1]


def test_device_data_path_matches_host_path():
    """The HBM-resident gather path consumes the same RNG stream and
    produces bit-identical losses to the host batching path."""
    import numpy as np

    traces = []
    for device_data in (True, False):
        np.random.seed(7)
        p = _params("cnn", batch_size=8, device_data=device_data)
        losses, _ = _run_epochs(p, n_epochs=2, n=24)
        traces.append(losses)
    assert traces[0] == traces[1]


def test_host_path_mesh_epoch_survives_deep_queue():
    """Regression: host batching (device_data=False) under --mesh.

    Each batch is a host->sharded upload feeding an 8-partition step;
    with ~64 of those queued plus the epoch-end jnp.stack fan-in,
    jaxlib 0.9.0's in-process CPU collectives deadlocked their
    rendezvous and SIGABRT'd the process (40 s timeout, one partition
    never started).  Trainer._drain_before_fanin +
    _throttle_mesh_queue bound the queue; this drives a full-width
    epoch (64 batches) through the host path on the 8-device mesh and
    pins the trajectory to the device-resident mesh path.
    """
    traces = []
    for device_data in (True, False):
        np.random.seed(11)
        p = _params("cnn", batch_size=8, device_data=device_data,
                    mesh="data=8")
        losses, _ = _run_epochs(p, n_epochs=1, n=512)
        traces.append(losses)
    assert np.isfinite(traces[1]).all()
    np.testing.assert_allclose(traces[1], traces[0], rtol=1e-6)


def test_freeze_mask_keeps_moments_zero():
    """Frozen params must not move AND their Adam moments must stay
    exactly zero (the reference never hands frozen params to the
    optimizer, main.py:280 — resuming with the freeze lifted must
    start from zero moments, COMPAT.md #9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cs231_capsule_yolo_traffic_sign_detection_tpu.losses import (
        LossConfig)
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models.darknet import (
        DarkNet, darknet_freeze_mask)
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import steps

    model = DarkNet(n_boxes=1, n_classes=3, dropout=0.0)
    state = steps.init_state(model, None, (64, 64, 3), seed=0)
    mask = darknet_freeze_mask(state.params, fine_tune=2)
    cfg = LossConfig(n_classes=3, n_boxes=1, n_grid=2, darknet_input=64)
    step = steps.make_train_step(model, "darknet_r", cfg,
                                 freeze_mask=mask, donate=False)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    y = np.zeros((2, 2, 2, 8), np.float32)
    y[:, 0, 0, 0] = 1.0
    y[:, 0, 0, 1:5] = [0.5, 0.5, 0.2, 0.2]
    y[:, 0, 0, 5] = 1.0
    y = jnp.asarray(y)

    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for _ in range(3):
        state, loss, _, _ = step(state, x, y, 1e-3)
    assert np.isfinite(float(loss))

    opt = state.opt_state
    mu = opt.mu if hasattr(opt, "mu") else opt[0].mu
    flat_mask = jax.tree_util.tree_leaves(mask)
    for m, p_before, p_after, mom in zip(
            flat_mask,
            jax.tree_util.tree_leaves(p0),
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(mu)):
        if not m:  # frozen leaf
            np.testing.assert_array_equal(np.asarray(p_after), p_before)
            assert not np.asarray(mom).any(), "frozen moment accumulated"
        else:      # trainable leaf must actually move
            assert not np.array_equal(np.asarray(p_after), p_before)

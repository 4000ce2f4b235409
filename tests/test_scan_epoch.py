"""--scan_epoch: whole-epoch lax.scan programs vs the per-batch loop.

The scan path (train/steps.py:make_train_epoch/make_eval_epoch,
driver._scan_epoch_run) reproduces the per-batch path's semantics:
same batch composition and order (np.array_split over the same
permutation), same RNG stream, same math.  Semantic equality is pinned
at single-step granularity (bitwise loss/y_hat below); multi-epoch
trajectories are compared in a band because the two differently
compiled programs round the backward pass differently at ~1e-9 and
Adam's early steps behave like sign(g), amplifying that to lr-sized
weight deltas (same effect documented in test_mesh_cli.py).
Extension, off by default (COMPAT.md).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (
    make_train_epoch,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _params(model, batch, scan, **over):
    base = dict(
        model=model, n_classes=43, batch_size=batch, lr_runtime=1e-3,
        lr_decay=0.1, n_epochs=1, eval_every=1, train_frac=1,
        recon=True, recon_coef=5e-4, dropout=0.0, l_coord=5.0,
        l_noobj=0.5, n_boxes=2, n_grid=2, darknet_input=64,
        capsule_input=32, scan_epoch=scan,
    )
    base.update(over)
    return Params(**base)


@pytest.mark.parametrize("model", ["cnn", "darknet_r"])
def test_scan_single_step_bitwise_matches_step(model):
    """One scan iteration IS the train step: loss and y_hat bitwise."""
    np.random.seed(0)
    p = _params(model, 8, True)
    x, y, _, _ = synthetic_dataset(model, p, n_train=8, n_eval=4)
    t_loop = Trainer(p, verbose=False)
    t_scan = Trainer(p, verbose=False)

    xd = jnp.asarray(x, jnp.float32)
    yd = jnp.asarray(y)
    _, loss_a, _, y_hat_a = t_loop.train_step(t_loop.state, xd, yd, 1e-3)

    fn = make_train_epoch(t_scan.model, t_scan.model_name, t_scan.loss_cfg)
    idx = jnp.arange(8, dtype=jnp.int32)[None, :]
    _, losses, _, y_hats = fn(t_scan.state, xd, yd, idx, 1e-3)

    assert float(loss_a) == float(losses[0])
    np.testing.assert_array_equal(np.asarray(y_hat_a),
                                  np.asarray(y_hats[0]))


def _run_epochs(model, scan, n=20, batch=8, n_epochs=3):
    """Train + eval epochs; n=20, batch=8 -> np.array_split yields
    batch sizes [7, 7, 6], exercising the two-group scan path."""
    np.random.seed(0)
    p = _params(model, batch, scan)
    x_tr, y_tr, x_ev, y_ev = synthetic_dataset(model, p, n_train=n,
                                               n_eval=max(4, batch // 2))
    trainer = Trainer(p, verbose=False)
    assert trainer.scan_epoch == scan
    tr_losses, ev_losses = [], []
    for _ in range(n_epochs):
        loss, _ = trainer.train_epoch(x_tr, y_tr, lr=p.lr_runtime,
                                      metric_on=False)
        ev, _ = trainer.eval_epoch(x_ev, y_ev, metric_on=False)
        tr_losses.append(loss)
        ev_losses.append(ev)
    return tr_losses, ev_losses


@pytest.mark.parametrize("model", ["cnn", "darknet_r"])
def test_scan_epoch_trajectory_band(model):
    tr_a, ev_a = _run_epochs(model, scan=False)
    tr_b, ev_b = _run_epochs(model, scan=True)
    np.testing.assert_allclose(tr_a, tr_b, rtol=1e-2)
    np.testing.assert_allclose(ev_a, ev_b, rtol=1e-2)


def test_scan_epoch_metric_and_iou_side_channels():
    """The train metric and darknet_d's avg_iou print flow through the
    scan path."""
    np.random.seed(0)
    p = _params("cnn", 8, True)
    x_tr, y_tr, _, _ = synthetic_dataset("cnn", p, n_train=16, n_eval=4)
    trainer = Trainer(p, verbose=False)
    loss, metric = trainer.train_epoch(x_tr, y_tr, lr=p.lr_runtime,
                                       metric_on=True)
    assert np.isfinite(loss)
    assert 0.0 <= metric <= 1.0

    np.random.seed(0)
    pd = _params("darknet_d", 4, True, n_classes=0)
    x_tr, y_tr, _, _ = synthetic_dataset("darknet_d", pd, n_train=8,
                                         n_eval=4)
    td = Trainer(pd, verbose=False)
    loss, _ = td.train_epoch(x_tr, y_tr, lr=pd.lr_runtime,
                             metric_on=False)
    assert np.isfinite(loss)


def test_scan_epoch_composes_with_mesh():
    """scan + mesh: the scan body's sharding constraint reproduces the
    loop-with-mesh trajectory (band — see module docstring) on the
    8-device CPU mesh."""

    def run(scan):
        np.random.seed(0)
        p = _params("cnn", 8, scan, mesh="data=8")
        x_tr, y_tr, _, _ = synthetic_dataset("cnn", p, n_train=32,
                                             n_eval=8)
        trainer = Trainer(p, verbose=False)
        assert trainer.mesh is not None
        assert trainer.scan_epoch == scan
        losses = []
        for _ in range(3):
            loss, _ = trainer.train_epoch(x_tr, y_tr, lr=p.lr_runtime,
                                          metric_on=False)
            losses.append(loss)
        return losses

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(a, b, rtol=1e-2)


@pytest.mark.slow
def test_cli_scan_epoch_flag(tmp_path):
    """main.py --scan_epoch trains end to end and writes histories."""
    d = tmp_path / "cnn_scan"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "batch_size": 8, "n_classes": 43, "lr": 1e-3,
        "n_epochs": 2, "dropout": 0.0, "lr_decay": 0.1,
    }))
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        # --mesh off: the subprocess inherits the harness's 8-virtual-
        # device XLA_FLAGS, and an 8-way mesh on this 1-core box can
        # push the run past the timeout; the scan+mesh composition has
        # its own test (test_scan_epoch_composes_with_mesh)
        "import sys; sys.argv = ['main.py', '--model', 'cnn', '--mode',"
        " 'train', '--no_metric', '--train_frac', '0.1',"
        " '--model_dir', %r, '--scan_epoch', '--mesh', 'off'];"
        "sys.path.insert(0, %r);"
        "import main; main.main()" % (str(d), REPO)
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    losses = np.load(d / "losses_tr.npy")
    assert losses.shape == (2,) and np.isfinite(losses).all()


def test_resolve_scan_setting():
    """--scan_epoch auto = on-for-TPU; strings and bools both accepted."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
        Trainer)

    # tests run CPU-forced, so auto resolves off here
    assert Trainer._resolve_scan("auto") is False
    assert Trainer._resolve_scan("on") is True
    assert Trainer._resolve_scan("off") is False
    assert Trainer._resolve_scan(True) is True
    assert Trainer._resolve_scan(False) is False


def test_explicit_scan_with_stream_warns_and_streams(capsys):
    """--scan_epoch on x --stream: scan gathers from the HBM-resident
    dataset --stream exists to avoid, so the streamed per-batch loop
    runs and an explicit 'on' says so (auto falls back silently)."""
    p = _params("cnn", 8, "on", stream=True)
    t = Trainer(p, seed=0, verbose=True)
    assert t.scan_epoch is False and t.stream is True
    assert "[scan_epoch] ignored" in capsys.readouterr().out

    # the notice respects verbose=False like every other driver
    # diagnostic (ADVICE r2) — programmatic runs stay silent
    t1q = Trainer(p, seed=0, verbose=False)
    assert t1q.scan_epoch is False
    assert "[scan_epoch]" not in capsys.readouterr().out

    p2 = _params("cnn", 8, "auto", stream=True)
    t2 = Trainer(p2, seed=0, verbose=True)
    assert t2.scan_epoch is False
    assert "[scan_epoch]" not in capsys.readouterr().out

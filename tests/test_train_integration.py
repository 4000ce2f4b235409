"""End-to-end training integration tests (the reference's overfit-mode
sanity check, SURVEY.md §4): each model drives its loss down on a tiny
synthetic set through the full jitted train step."""

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

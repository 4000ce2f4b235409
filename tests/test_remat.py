"""--remat (activation rematerialization) equivalence tests.

`DarkNet(remat=True)` / `DarkCapsuleNet(remat=True)` wrap each conv
block in `nn.remat` (jax.checkpoint): the backward pass recomputes the
block internals instead of keeping them live.  This is a pure
memory/FLOPs trade — the math is identical, so loss and gradients must
match the plain path exactly.  The flag exists so the 448px detectors
can train at batches past the plain-path HBM limit (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.losses import LossConfig
from cs231_capsule_yolo_traffic_sign_detection_tpu.models.darknet import (
    DarkNet,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.models.registry import (
    build_model,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.train import steps


def _tiny_detector_batch(rng, batch=2, size=64, n_boxes=1, n_classes=3):
    g = size // 32
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    y = np.zeros((batch, g, g, 5 + n_classes), np.float32)
    y[:, 0, 1, 0] = 1.0                       # one object
    y[:, 0, 1, 1:5] = [0.5, 0.5, 0.2, 0.3]
    y[:, 0, 1, 5 + 1] = 1.0
    return x, jnp.asarray(y)


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_darknet_remat_grads_match_plain(dtype):
    rng = np.random.RandomState(0)
    x, y = _tiny_detector_batch(rng)
    loss_cfg = LossConfig(l_coord=5.0, l_noobj=0.5, n_boxes=1,
                          n_classes=3, n_grid=2, darknet_input=64)

    outs = {}
    for remat in (False, True):
        model = DarkNet(n_boxes=1, n_classes=3, dropout=0.0, dtype=dtype,
                        remat=remat)
        state = steps.init_state(model, None, (64, 64, 3), seed=0)
        grad_fn = steps.make_grad_fn(model, "darknet_r", loss_cfg)
        loss, grads = grad_fn(state, x, y)
        outs[remat] = (float(loss), jax.tree_util.tree_map(np.asarray, grads))

    # the param trees must be structurally identical (remat must not
    # rename or reshape anything — the checkpoint loader depends on it)
    flat_a = jax.tree_util.tree_leaves_with_path(outs[False][1])
    flat_b = jax.tree_util.tree_leaves_with_path(outs[True][1])
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]

    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-6)
    for (path, ga), (_, gb) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            ga, gb, rtol=1e-6, atol=1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_remat_with_dropout_runs_and_updates():
    """Dropout RNG must thread through the lifted remat (same stream)."""
    rng = np.random.RandomState(1)
    x, y = _tiny_detector_batch(rng)
    loss_cfg = LossConfig(l_coord=5.0, l_noobj=0.5, n_boxes=1,
                          n_classes=3, n_grid=2, darknet_input=64)
    model = DarkNet(n_boxes=1, n_classes=3, dropout=0.3, remat=True)
    state = steps.init_state(model, None, (64, 64, 3), seed=0)
    step = steps.make_train_step(model, "darknet_r", loss_cfg, donate=False)
    new_state, loss, _, _ = step(state, x, y, 1e-3)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1


def test_registry_plumbs_remat_flag():
    p = Params(model="darknet_r", n_boxes=1, n_classes=3, dropout=0.0,
               remat=True)
    assert build_model(p).remat is True
    p2 = Params(model="darkcapsule", n_grid=7, dropout=0.0, remat=True)
    assert build_model(p2).remat is True
    p3 = Params(model="darknet_r", n_boxes=1, n_classes=3, dropout=0.0)
    assert build_model(p3).remat is False

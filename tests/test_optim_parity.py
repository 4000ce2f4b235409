"""Optimizer/scheduler parity vs torch.

The reference trains with torch.optim.Adam (main.py:280) and
ReduceLROnPlateau stepped on the train loss (main.py:164,174).  Check
our optax-based step math and plateau state machine reproduce torch's
trajectories exactly on synthetic sequences.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (
    make_optimizer,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.plateau import (
    ReduceLROnPlateau,
)


def test_adam_trajectory_matches_torch(rng):
    lr = 1e-3
    w0 = rng.randn(5).astype(np.float64)
    grads = [rng.randn(5).astype(np.float64) for _ in range(20)]

    # torch
    wt = torch.tensor(w0.copy(), requires_grad=True)
    opt = torch.optim.Adam([wt], lr=lr)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # ours: scale_by_adam + (-lr * update), as in make_train_step
    import optax

    tx = make_optimizer()
    w = jnp.asarray(w0)
    state = tx.init(w)
    for g in grads:
        upd, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, -lr * upd)

    np.testing.assert_allclose(np.asarray(w), wt.detach().numpy(),
                               rtol=1e-10)


def test_plateau_matches_torch_scheduler(rng):
    losses = list(np.abs(rng.randn(60)).astype(np.float64))

    wt = torch.zeros(1, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, "min", factor=0.5)

    ours = ReduceLROnPlateau(lr=1.0, factor=0.5)
    for loss in losses:
        sched.step(loss)
        ours.step(loss)
        torch_lr = opt.param_groups[0]["lr"]
        assert abs(ours.lr - torch_lr) < 1e-12, (ours.lr, torch_lr)

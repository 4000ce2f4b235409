"""bf16 mixed-precision training: convergence band vs f32.

The --dtype bfloat16 policy runs conv/dense matmuls in bf16 with f32
master params, Adam moments and BN stats (models/*, VERDICT r1 item 3).
These tests pin (a) that the policy actually trains — loss decreases on
the same synthetic set — and (b) that it lands in a band around the f32
trajectory, i.e. mixed precision changes rounding, not behavior.
"""

import numpy as np

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import Trainer


def _train(model, dtype, n_epochs=5, n=16, batch=8, **over):
    np.random.seed(0)
    base = dict(
        model=model, n_classes=43, batch_size=batch, lr_runtime=1e-3,
        lr_decay=0.1, n_epochs=n_epochs, eval_every=1, train_frac=1,
        recon=True, recon_coef=5e-4, dropout=0.0,
        n_boxes=2, n_grid=2, darknet_input=64, capsule_input=32,
        compute_dtype=dtype,
    )
    base.update(over)
    p = Params(**base)
    x_tr, y_tr, _, _ = synthetic_dataset(model, p, n_train=n, n_eval=4)
    trainer = Trainer(p, verbose=False)
    losses = []
    for _ in range(n_epochs):
        loss, _ = trainer.train_epoch(x_tr, y_tr, lr=p.lr_runtime,
                                      metric_on=False)
        losses.append(loss)
    return losses, trainer


def test_bf16_master_params_stay_f32():
    import jax
    import jax.numpy as jnp

    _, trainer = _train("cnn", "bfloat16", n_epochs=1)
    for leaf in jax.tree_util.tree_leaves(trainer.state.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype
    if trainer.state.batch_stats is not None:
        for leaf in jax.tree_util.tree_leaves(trainer.state.batch_stats):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_bf16_cnn_convergence_band():
    f32, _ = _train("cnn", "float32")
    bf16, _ = _train("cnn", "bfloat16")
    assert bf16[-1] < bf16[0], bf16
    # same trajectory up to mixed-precision rounding: final loss within
    # a generous multiplicative band of the f32 run
    assert bf16[-1] < 1.5 * f32[-1] + 0.1, (f32, bf16)


def test_bf16_capsule_convergence_band():
    f32, _ = _train("capsule", "float32", n_epochs=3)
    bf16, _ = _train("capsule", "bfloat16", n_epochs=3)
    assert bf16[-1] < bf16[0], bf16
    assert bf16[-1] < 1.5 * f32[-1] + 0.1, (f32, bf16)


def test_bf16_darknet_loss_finite():
    bf16, _ = _train("darknet_r", "bfloat16", n_epochs=2, n=8, batch=4,
                     n_boxes=1)
    assert np.isfinite(bf16).all()
    assert bf16[-1] < bf16[0]


def test_bf16_resident_batches_match_host_f32_batches():
    """Under the bf16 policy the HBM-resident dataset is stored bf16
    (driver._x_dtype): the model's entry cast becomes a no-op with
    IDENTICAL values (the f32->bf16 rounding happens once at placement
    instead of every step), so the loss trajectory must be bit-equal to
    the host-f32-batches path where the step does the cast itself."""

    def run(device_data):
        losses, _ = _train("cnn", "bfloat16", n_epochs=3,
                           device_data=device_data)
        return losses

    a = run(True)    # bf16-resident device dataset
    b = run(False)   # host f32 batches, cast inside the jitted step
    assert a == b, (a, b)


def test_x_dtype_policy_gating():
    import jax.numpy as jnp

    _, t_cnn = _train("cnn", "bfloat16", n_epochs=1)
    assert t_cnn._x_dtype == jnp.bfloat16
    _, t_f32 = _train("cnn", "float32", n_epochs=1)
    assert t_f32._x_dtype == jnp.float32
    # capsule's reconstruction loss consumes x in f32 -> stays f32
    _, t_cap = _train("capsule", "bfloat16", n_epochs=1, n=8, batch=4)
    assert t_cap._x_dtype == jnp.float32


def test_bf16_pallas_routing_convergence_band():
    """bf16 Pallas routing kernel variant (VERDICT r2 item 2): training
    with --dtype bfloat16 --routing pallas must track the f32 pallas
    run.  Interpret-mode kernels on CPU — tiny shapes."""
    f32, _ = _train("capsule", "float32", n_epochs=2, n=8, batch=4,
                    routing_impl="pallas")
    bf16, _ = _train("capsule", "bfloat16", n_epochs=2, n=8, batch=4,
                     routing_impl="pallas")
    assert bf16[-1] < bf16[0], bf16
    assert bf16[-1] < 1.5 * f32[-1] + 0.1, (f32, bf16)

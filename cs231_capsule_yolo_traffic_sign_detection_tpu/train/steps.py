"""Jitted train/eval steps over a functional TrainState.

The reference's hot loop moves every batch host->device, runs eager
torch ops, and copies all logits back per batch (reference
main.py:55-72).  Here one `train_step` is traced and compiled once:
forward + loss + backward + Adam update + BN stat update fused into a
single XLA program, with the learning rate as a traced scalar (so the
plateau scheduler never recompiles) and donated state buffers.

Sharding-agnostic: steps close over no device placement.  With a mesh
(`--mesh`, parallel.mesh), the Trainer device_puts the TrainState
replicated (routing weights optionally tensor-sharded over 'model') and
each batch sharded on the batch axis; XLA inserts the gradient
all-reduce.  Without a mesh everything lands on the default device,
matching the reference's single-device placement (main.py:231).
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import LossConfig, LOSS_REGISTRY


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any
    step: jnp.ndarray

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def make_optimizer():
    """Adam moments with torch defaults; LR applied inside the step."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0)


def init_variables(model, input_shape, seed=0, batch_size=2,
                   needs_labels=False):
    """Initialize model variables only (no optimizer state).

    Used directly by the predict path, which restores weights without
    ever building optimizer moments (the reference's predict also
    restores the model only, predict_fns.py:32-34).

    needs_labels: capsule-style models whose init must trace the recon
    branch (requires a labels argument).
    """
    rng = jax.random.PRNGKey(seed)
    init_rng, state_rng = jax.random.split(rng)
    x = jnp.zeros((batch_size, *input_shape), jnp.float32)
    kwargs = {}
    if needs_labels:
        kwargs = dict(y=jnp.zeros((batch_size,), jnp.int32), recon=True)
    variables = model.init({"params": init_rng, "dropout": init_rng}, x,
                           train=False, **kwargs)
    return variables, state_rng


def init_state(model, params_cfg, input_shape, seed=0, batch_size=2,
               needs_labels=False):
    """Initialize model variables + optimizer state."""
    variables, state_rng = init_variables(
        model, input_shape, seed=seed, batch_size=batch_size,
        needs_labels=needs_labels)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = make_optimizer().init(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=state_rng,
        step=jnp.zeros((), jnp.int32),
    )


def _forward(model, variables, x, y, loss_cfg: LossConfig, model_name,
             train, rngs, mutable):
    """Model forward + loss; returns (loss, (aux, new_model_state, y_hat))."""
    wants_recon = model_name == "capsule" and loss_cfg.recon
    call_kwargs = dict(train=train, rngs=rngs)
    if mutable:
        call_kwargs["mutable"] = ["batch_stats"]

    if wants_recon:
        out = model.apply(variables, x, y=y, recon=True, **call_kwargs)
    else:
        out = model.apply(variables, x, **call_kwargs)

    new_model_state = {}
    if mutable:
        out, new_model_state = out

    if wants_recon:
        y_hat, recon = out
        loss, aux = LOSS_REGISTRY[model_name](y_hat, y, loss_cfg, x, recon)
    else:
        y_hat = out
        loss, aux = LOSS_REGISTRY[model_name](y_hat, y, loss_cfg)
    return loss, (aux, new_model_state, y_hat)


def _build_train_step(model, model_name: str, loss_cfg: LossConfig,
                      freeze_mask: Optional[Any] = None) -> Callable:
    """The raw (unjitted) train step; shared by the per-batch jit and
    the whole-epoch scan."""
    tx = make_optimizer()

    def step(state: TrainState, x, y, lr):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return _forward(
                model, variables, x, y, loss_cfg, model_name,
                train=True, rngs={"dropout": dropout_rng},
                mutable=state.batch_stats is not None,
            )

        (loss, (aux, new_model_state, y_hat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # Freeze BEFORE the optimizer: with zero gradients from step 0,
        # Adam's moments for frozen params stay exactly zero and their
        # updates are 0/(0+eps) = 0 — matching the reference, which
        # excludes frozen params from the optimizer entirely
        # (main.py:280), so a later resume-with-unfreeze starts from
        # zero moments, not stale accumulated ones.
        if freeze_mask is not None:
            grads = jax.tree_util.tree_map(
                lambda g, m: jnp.where(m, g, jnp.zeros_like(g)),
                grads, freeze_mask,
            )

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        if freeze_mask is not None:
            # belt-and-braces: also zero the updates, so frozen params
            # cannot move even when resuming a checkpoint whose moments
            # predate the grad-side masking above
            updates = jax.tree_util.tree_map(
                lambda u, m: jnp.where(m, u, jnp.zeros_like(u)),
                updates, freeze_mask,
            )
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            params=params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            rng=rng,
            step=state.step + 1,
        )
        return new_state, loss, aux, y_hat

    return step


def make_train_step(model, model_name: str, loss_cfg: LossConfig,
                    freeze_mask: Optional[Any] = None,
                    donate: bool = True) -> Callable:
    """Build the jitted training step.

    Returns step(state, x, y, lr) -> (state, loss, aux, y_hat).
    """
    step = _build_train_step(model, model_name, loss_cfg, freeze_mask)
    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_train_epoch(model, model_name: str, loss_cfg: LossConfig,
                     freeze_mask: Optional[Any] = None,
                     donate: bool = True,
                     batch_sharding: Optional[Any] = None) -> Callable:
    """Whole-epoch training as ONE compiled program (`--scan_epoch`).

    epoch(state, x_all, y_all, idx, lr) -> (state, losses, auxes, y_hats)

    `idx` is an (n_batch, bs) int32 matrix of dataset indices — one row
    per batch, in epoch order.  Each `lax.scan` step gathers its batch
    from the HBM-resident dataset and runs the exact same train step as
    the per-batch path, so batch composition, order, RNG stream and
    math are identical; only the dispatch granularity changes (one
    launch per epoch instead of per batch).  The driver calls this once
    per distinct batch size (np.array_split yields at most two).

    Outputs are stacked along a leading n_batch axis; losses (n_batch,),
    y_hats (n_batch, bs, ...).

    batch_sharding: optional NamedSharding (batch axis over 'data');
    under a mesh the gathered batch is constrained to it so GSPMD
    shards the step exactly like the per-batch loop's place_batch.
    """
    step = _build_train_step(model, model_name, loss_cfg, freeze_mask)

    def body_shard(xb, yb):
        # mirror parallel.mesh.place_batch: shard only when the batch
        # divides the 'data' axis, else leave replicated (ragged-tail
        # group); the decision is static per compiled group shape
        if batch_sharding is None:
            return xb, yb
        if xb.shape[0] % batch_sharding.mesh.shape["data"] != 0:
            return xb, yb
        return (jax.lax.with_sharding_constraint(xb, batch_sharding),
                jax.lax.with_sharding_constraint(yb, batch_sharding))

    def epoch(state: TrainState, x_all, y_all, idx, lr):
        def body(carry, ib):
            xb = jnp.take(x_all, ib, axis=0)
            yb = jnp.take(y_all, ib, axis=0)
            xb, yb = body_shard(xb, yb)
            new_carry, loss, aux, y_hat = step(carry, xb, yb, lr)
            return new_carry, (loss, aux, y_hat)

        state, (losses, auxes, y_hats) = jax.lax.scan(body, state, idx)
        return state, losses, auxes, y_hats

    donate_argnums = (0,) if donate else ()
    return jax.jit(epoch, donate_argnums=donate_argnums)


def make_eval_epoch(model, model_name: str, loss_cfg: LossConfig,
                    batch_sharding: Optional[Any] = None) -> Callable:
    """Whole-epoch evaluation as one compiled program (`--scan_epoch`).

    epoch(state, x_all, y_all, idx) -> (losses, auxes, y_hats); same
    batch semantics as `make_train_epoch`, state read-only.
    """

    def eval_step(state, x, y):
        loss, (aux, _, y_hat) = _forward(
            model, state.variables, x, y, loss_cfg, model_name,
            train=False, rngs={}, mutable=False,
        )
        return loss, aux, y_hat

    def epoch(state: TrainState, x_all, y_all, idx):
        def body(carry, ib):
            xb = jnp.take(x_all, ib, axis=0)
            yb = jnp.take(y_all, ib, axis=0)
            if (batch_sharding is not None
                    and xb.shape[0]
                    % batch_sharding.mesh.shape["data"] == 0):
                xb = jax.lax.with_sharding_constraint(xb, batch_sharding)
                yb = jax.lax.with_sharding_constraint(yb, batch_sharding)
            return carry, eval_step(state, xb, yb)

        _, (losses, auxes, y_hats) = jax.lax.scan(body, jnp.zeros(()), idx)
        return losses, auxes, y_hats

    return jax.jit(epoch)


def make_grad_fn(model, model_name: str, loss_cfg: LossConfig) -> Callable:
    """Jitted (state, x, y) -> (loss, grads); used by parity tests."""

    def fn(state: TrainState, x, y):
        _, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            return _forward(
                model, variables, x, y, loss_cfg, model_name,
                train=True, rngs={"dropout": dropout_rng},
                mutable=state.batch_stats is not None,
            )

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return loss, grads

    return jax.jit(fn)


def make_eval_step(model, model_name: str, loss_cfg: LossConfig) -> Callable:
    """Build the jitted evaluation step: (state, x, y) -> (loss, aux, y_hat)."""

    def step(state: TrainState, x, y):
        loss, (aux, _, y_hat) = _forward(
            model, state.variables, x, y, loss_cfg, model_name,
            train=False, rngs={}, mutable=False,
        )
        return loss, aux, y_hat

    return jax.jit(step)


def make_predict_step(model) -> Callable:
    """Jitted inference-only forward: (variables, x) -> y_hat."""

    @jax.jit
    def step(variables, x):
        return model.apply(variables, x, train=False)

    return step

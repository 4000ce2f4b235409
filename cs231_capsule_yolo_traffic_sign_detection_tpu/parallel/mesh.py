"""Device-mesh parallelism layer.

The reference is strictly single-process / single-device (reference
main.py:231; SURVEY.md §2.2: no distributed constructs of any kind).
This module is the new first-class infrastructure of the TPU build:

  * a `Mesh` over ('data', 'model') spanning ICI;
  * batch-dim sharding for inputs (data parallelism — XLA inserts the
    gradient psum);
  * optional tensor sharding of the capsule routing weights over the
    output-capsule axis ('model') — the one genuinely shardable model
    axis in this workload (the routing contraction's output dim), kept
    collective-free until the class-norm reduction;
  * helpers used by tests (8-device CPU mesh via
    --xla_force_host_platform_device_count) and by the driver's
    multi-chip dry run.

Train/eval steps are sharding-agnostic: they close over no placement;
placement comes purely from the shardings of their inputs, the
idiomatic jit/GSPMD pattern.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization (DCN) — `jax.distributed.initialize`.

    On single-host (this environment) it is a no-op.  On a multi-host
    TPU pod slice, call before any jax op; afterwards `jax.devices()`
    spans all hosts and the same `make_mesh`/`shard_*` helpers lay the
    'data' axis across hosts (collectives ride ICI within a slice, DCN
    across slices).  The per-host data loader should feed each process
    its batch shard via `jax.make_array_from_process_local_data`.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh over ('data', 'model').  Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (n_data, n_model, n_total)
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs sharded on the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def routing_param_spec(path) -> P:
    """PartitionSpec for a param leaf: shard capsule routing weights
    (n_nodes, n_caps, in_c, out_c) over 'model' on the n_nodes axis —
    the routing contraction dimension (1296 nodes for CapsuleNet),
    so the weighted node-sum becomes a sharded partial sum and XLA
    inserts the psum over 'model'.  (The caps axis is 43 — prime — and
    cannot be evenly device_put-sharded.)  Everything else replicated."""
    keys = [str(getattr(p, "key", "")) for p in path]
    if keys and keys[-1] == "route_weights":
        return P("model", None, None, None)
    return P()


def shard_state(state, mesh: Mesh, shard_routing: bool = False):
    """device_put a TrainState: params replicated (or routing-sharded),
    everything else replicated."""

    def put_params(path, leaf):
        spec = routing_param_spec(path) if shard_routing else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(put_params, state.params)
    rest_sharding = replicated_sharding(mesh)
    new = state.replace(
        params=params,
        batch_stats=jax.device_put(state.batch_stats, rest_sharding)
        if state.batch_stats is not None else None,
        opt_state=jax.tree_util.tree_map(
            lambda l: jax.device_put(l, rest_sharding), state.opt_state),
        rng=jax.device_put(state.rng, rest_sharding),
        step=jax.device_put(state.step, rest_sharding),
    )
    return new


def shard_batch(batch, mesh: Mesh):
    """device_put arrays sharded along the leading batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)

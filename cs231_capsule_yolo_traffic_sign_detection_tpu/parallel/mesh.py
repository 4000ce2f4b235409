"""Device-mesh parallelism layer.

The reference is strictly single-process / single-device (reference
main.py:231; SURVEY.md §2.2: no distributed constructs of any kind).
This module is the new first-class infrastructure of the TPU build:

  * a `Mesh` over ('data', 'model') spanning ICI;
  * batch-dim sharding for inputs (data parallelism — XLA inserts the
    gradient psum);
  * optional tensor sharding of the capsule routing weights over the
    n_nodes axis on 'model' — the routing CONTRACTION dimension (1296
    nodes for CapsuleNet), this workload's one genuinely shardable long
    axis (SURVEY.md §5): the weighted node-sum becomes sharded partial
    sums and XLA inserts the psum (see `routing_param_spec`);
  * helpers used by tests (8-device CPU mesh via
    --xla_force_host_platform_device_count) and by the driver's
    multi-chip dry run.

Train/eval steps are sharding-agnostic: they close over no placement;
placement comes purely from the shardings of their inputs, the
idiomatic jit/GSPMD pattern.
"""

import functools
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Batches between dispatch-queue drains on the CPU-backend mesh paths
# (train epoch loop and predict's batched forward).  jaxlib 0.9.0's
# in-process CPU collectives intermittently trip their 40 s rendezvous
# timeout when deep queues of multi-partition programs pile up on an
# oversubscribed host; draining every few batches keeps the queue
# shallow.  One tuning constant shared by every consumer — see
# train/driver.py:Trainer._throttle_mesh_queue for the full analysis.
CPU_MESH_QUEUE = 8


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host initialization (DCN) — `jax.distributed.initialize`.

    On single-host (this environment) it is a no-op.  On a multi-host
    TPU pod slice, call before any jax op; afterwards `jax.devices()`
    spans all hosts and the same `make_mesh`/`shard_*` helpers lay the
    'data' axis across hosts (collectives ride ICI within a slice, DCN
    across slices).  Per-host data then flows through
    `global_batch_from_process_local` below.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the artifact-writing process (process_index 0).

    Multi-host runs execute `train_and_evaluate` once per process with
    an identical trajectory (same seeds, same global arrays); exactly
    one process writes checkpoints / loss histories / TB scalars so
    shared filesystems see no concurrent-writer races.  Single-process:
    always True.
    """
    return jax.process_index() == 0


def gather_replicated(x, mesh: Mesh):
    """All-gather a mesh-sharded array so every process can read it.

    Host-side consumers (`np.asarray` for metrics) need a fully
    addressable array; under process_count > 1 a batch-sharded output
    has shards on other hosts.  A jitted identity with a replicated
    out-sharding makes XLA insert the all-gather (over ICI on a real
    pod).  No-op single-process or without a mesh, so the common paths
    never pay a dispatch.
    """
    if mesh is None or jax.process_count() == 1:
        return x
    return _replicated_identity(NamedSharding(mesh, P()))(x)


@functools.lru_cache(maxsize=8)
def _replicated_identity(repl: NamedSharding):
    """Jitted identity with a replicated out-sharding, cached per
    sharding: a fresh `jax.jit(lambda ...)` per call would defeat the
    jit cache (new function identity) and retrace every metric epoch.
    Bounded (a handful of shardings is ever live at once) so long-lived
    processes that build many distinct meshes — test drivers — don't
    pin every Mesh and its compiled executable forever."""
    return jax.jit(lambda a: a, out_shardings=repl)


def process_batch_slice(n_global: int, process_index=None, process_count=None):
    """Row range [lo, hi) of the global batch owned by this process.

    Multi-host data loading (SURVEY.md §7.9): each host loads only its
    contiguous slice of the global batch; `global_batch_from_process_local`
    assembles the sharded global array from those slices without any
    cross-host data movement (addressable shards only).
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per, rem = divmod(n_global, pc)
    lo = pi * per + min(pi, rem)
    hi = lo + per + (1 if pi < rem else 0)
    return lo, hi


def _distinct_row_slices(index_map, n_global: int):
    """Distinct leading-axis slices of an addressable-device index map.

    `index_map` is `sharding.addressable_devices_indices_map(shape)`:
    device -> tuple of per-dim slices.  Replica devices (e.g. the
    'model' axis) share a slice and are deduplicated; the result is
    sorted by start, which is the order
    `jax.make_array_from_process_local_data` packs each distinct
    addressable slice into the process-local array.
    """
    uniq = {}
    for idx in index_map.values():
        s = idx[0]
        lo = 0 if s.start is None else int(s.start)
        hi = n_global if s.stop is None else int(s.stop)
        uniq[(lo, hi)] = None
    return sorted(uniq)


def process_row_slices(n_global: int, mesh: Mesh):
    """Global-row slices this process must load for `batch_sharding(mesh)`.

    Derived from the sharding's own addressable-device index map, so it
    is correct for any device/process layout — unlike an equal
    per-process split (`process_batch_slice`), which breaks whenever
    the layout isn't "each process owns one equal contiguous chunk":
    process count not dividing the batch in data-axis proportions,
    model-axis replication spanning processes (two processes holding
    the same rows), or data=1 meshes where EVERY process needs all
    rows.  The process-local batch is the concatenation of these
    slices, in order — exactly what
    `jax.make_array_from_process_local_data` expects.
    """
    sh = batch_sharding(mesh)
    return _distinct_row_slices(
        sh.addressable_devices_indices_map((n_global,)), n_global)


def global_batch_from_process_local(local_batch, mesh: Mesh, n_global=None):
    """Assemble a globally batch-sharded array from per-process rows.

    `local_batch` holds only this process's rows (the concatenation of
    `process_row_slices`).  Uses `jax.make_array_from_process_local_data`,
    which places each host's rows on its own addressable devices of the
    'data' axis — the idiomatic multi-host input path (no host ever
    materializes the global batch).  Single-process: equivalent to
    `shard_batch`.

    Pass `n_global` whenever the local rows may differ from the global
    batch (multi-host): it pins the global shape explicitly, covering
    replication layouts where shape inference from local data would
    guess wrong (e.g. every process holding all rows under data=1).
    """
    sh = batch_sharding(mesh)
    # run-invariant; hoisted out of make() so the per-batch hot path
    # doesn't re-query the runtime for every tree leaf of every batch
    single_process = jax.process_count() == 1

    def make(a):
        a = np.asarray(a)
        gs = None if n_global is None else (int(n_global),) + a.shape[1:]
        if gs is not None and single_process:
            gs = None  # single-process: jax requires local == global
        return jax.make_array_from_process_local_data(sh, a, gs)

    return jax.tree_util.tree_map(make, local_batch)


def parse_mesh_spec(spec, n_local: Optional[int] = None):
    """Parse the CLI --mesh spec into (n_data, n_model) or None.

    Grammar:
      'off' | 'none' | '1'      -> None (single-device, reference behavior)
      'auto'                    -> all local devices on 'data' when >1,
                                   else None
      'data=N[,model=M]'        -> explicit axis sizes
    """
    if spec is None:
        return None
    spec = str(spec).strip().lower()
    if spec in ("off", "none", "1", ""):
        return None
    if n_local is None:
        n_local = len(jax.devices())
    if spec == "auto":
        return (n_local, 1) if n_local > 1 else None
    n_data, n_model = None, 1
    for part in spec.split(","):
        key, _, val = part.partition("=")
        key, val = key.strip(), val.strip()
        if key == "data":
            n_data = int(val)
        elif key == "model":
            n_model = int(val)
        else:
            raise ValueError(f"bad --mesh spec {spec!r} (part {part!r})")
    if n_data is None:
        raise ValueError(f"--mesh spec {spec!r} needs data=N")
    if n_data * n_model > n_local:
        raise ValueError(
            f"--mesh {spec!r} wants {n_data * n_model} devices, "
            f"only {n_local} available")
    if n_data == 1 and n_model == 1:
        return None
    return (n_data, n_model)


def maybe_make_mesh(spec) -> Optional[Mesh]:
    """CLI spec -> Mesh, or None when single-device suffices."""
    parsed = parse_mesh_spec(spec)
    if parsed is None:
        return None
    n_data, n_model = parsed
    return make_mesh(n_data=n_data, n_model=n_model)


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
    (n_nodes, n_caps, in_c, out_c) over 'model' on axis 0 — n_nodes,
    the routing contraction dimension (1296 nodes for CapsuleNet) —
    so the weighted node-sum becomes a sharded partial sum and XLA
    inserts the psum over 'model'.  The n_caps axis would be the other
    candidate, but it is 43 (prime) and cannot be evenly sharded.
    Everything else replicated."""
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


def place_batch(batch, mesh: Mesh):
    """Shard a batch when its size divides the 'data' axis, else replicate.

    The driver's np.array_split batching (reference main.py:45-48)
    produces a ragged tail when the dataset size is not a multiple of
    batch_size; replicating that tail keeps the numerics byte-identical
    to single-device (the compiled step is sharding-agnostic) at the
    cost of duplicated tail compute — no padding, no masked-loss
    surgery.
    """
    n_data = mesh.shape["data"]
    sharded = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(a):
        sh = sharded if a.shape[0] % n_data == 0 else repl
        return jax.device_put(a, sh)

    return jax.tree_util.tree_map(put, batch)

"""Training/evaluation orchestration — the reference main.py driver,
rebuilt around jitted functional steps.

Reference parity: main.py:42-217 — per-epoch: host shuffle +
np.array_split batching, train epoch, eval epoch, plateau LR step on
the TRAIN loss, TB scalars (train_loss/eval_loss/train_metric/
eval_metric), last/best checkpoints into model_dir+str(train_frac),
.npy loss/metric histories, metric on <=1000 subsampled rows,
avg_iou prints for darknet_d.

TPU-native differences: the hot loop is a single compiled train_step
(forward+loss+backward+Adam+BN update); logits stay on device until the
per-epoch metric fetch (the reference copies all logits host-side every
batch, main.py:68); LR reaches the step as a traced scalar.
"""

import os

import numpy as np
import jax

from .. import config
from ..data import loader as data_loader
from ..data import stream as data_stream
from ..losses import LossConfig
from ..metrics import METRIC_REGISTRY
from ..models import build_model
from ..models.darknet import load_darknet19_npz, darknet_freeze_mask
from ..parallel import mesh as par
from . import checkpoint as ckpt
from .plateau import ReduceLROnPlateau
from .steps import (init_state, make_train_step, make_eval_step,
                    make_train_epoch, make_eval_epoch)
from .summary import summarize


def model_input_shape(params):
    """NHWC input shape for the current model."""
    name = params.model
    if name in ("cnn", "capsule"):
        return config.input_shape[name]
    size = int(params.darknet_input)
    if name == "darkcapsule":
        # the capsule grid reshape requires input = 32 * n_grid
        # (224 for the reference g=7 — its 448 config is broken,
        # COMPAT.md)
        size = 32 * int(params.n_grid)
    return (size, size, 3)


class Trainer:
    """Owns model, state, and compiled steps for one experiment."""

    _POSTFIX_EVERY = 16  # batches between live-loss progress fetches

    def __init__(self, params, seed=0, verbose=True):
        if str(params.get("compute_dtype", "float32")).lower() == "int8":
            raise ValueError(
                "--dtype int8 is a serving-only extension (predict / "
                "bench, ops/quant.py); train with float32 or bfloat16")
        self.params = params
        self.loss_cfg = LossConfig.from_params(params)
        self.model_name = params.model

        # The mesh decision must precede model construction: when the
        # routing weights are tensor-sharded over 'model'
        # (--mesh data=N,model=M with a capsule head), the routing must
        # run as XLA ops — GSPMD can partition those and insert the
        # psum over the node contraction, but a pallas_call has no SPMD
        # partitioning rule and cannot consume a sharded operand (the
        # TPU 'auto' default would otherwise pick Pallas for capsule).
        self.mesh = par.maybe_make_mesh(params.get("mesh", "off"))
        self._shard_routing = (
            self.mesh is not None
            and self.mesh.shape["model"] > 1
            and self.model_name in ("capsule", "darkcapsule")
        )
        if (self._shard_routing
                and str(params.get("routing_impl", "auto")) != "xla"):
            if str(params.get("routing_impl", "auto")) == "pallas":
                print("[mesh] routing weights sharded over 'model': "
                      "forcing --routing xla (the Pallas kernel cannot "
                      "consume a sharded operand)")
            params.routing_impl = "xla"

        self.model = build_model(params)
        self.metric = METRIC_REGISTRY[self.model_name]
        self.needs_labels = (
            self.model_name == "capsule" and self.loss_cfg.recon
        )
        self.state = init_state(
            self.model, params, model_input_shape(params), seed=seed,
            batch_size=2, needs_labels=self.needs_labels,
        )
        if verbose:
            summarize(self.state.variables, title=self.model_name)

        freeze_mask = None
        fine_tune = int(params.get("fine_tune", -1) or -1)
        if params.get("do_fine_tune", False):
            npz = params.get("pretrained_weights", "./darknet19_weights.npz")
            if os.path.exists(npz):
                variables = load_darknet19_npz(
                    self.state.variables, npz, n_load_layer=18)
                self.state = self.state.replace(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"],
                )
                print(f"Load weights from {npz}")
            else:
                print(f"[fine_tune] pretrained weights {npz!r} not found; "
                      "training from scratch")
            if fine_tune > 0:
                freeze_mask = darknet_freeze_mask(self.state.params, fine_tune)

        # --mesh: multi-device placement (new infrastructure; the
        # reference is single-device, main.py:231).  The compiled steps
        # are sharding-agnostic, so engaging the mesh is purely a matter
        # of where state and batches are device_put: params replicated
        # (routing weights optionally tensor-sharded over 'model'),
        # batches sharded over 'data'; XLA inserts the gradient psum.
        # (self.mesh / self._shard_routing were decided above, before
        # model construction.)
        if self.mesh is not None:
            self.state = par.shard_state(
                self.state, self.mesh, shard_routing=self._shard_routing)
            if verbose:
                print("[mesh] data={} model={} (routing sharded: {})".format(
                    self.mesh.shape["data"], self.mesh.shape["model"],
                    self._shard_routing))

        self.train_step = make_train_step(
            self.model, self.model_name, self.loss_cfg,
            freeze_mask=freeze_mask,
        )
        self.eval_step = make_eval_step(
            self.model, self.model_name, self.loss_cfg)

        self._freeze_mask = freeze_mask
        self._scan_train_fn = None
        self._scan_eval_fn = None

        # HBM-resident dataset cache: the whole dataset is device_put
        # once and batches are device-side gathers driven by tiny index
        # arrays — no per-step image transfer (the reference re-uploads
        # every batch every epoch, main.py:57-59).  Both datasets fit
        # comfortably in HBM (SURVEY.md §7).
        #
        # --stream covers the opposite regime (dataset larger than HBM):
        # host-resident (possibly memmapped) arrays, batches gathered
        # ahead of the device by the native threaded prefetcher
        # (data/stream.py) and uploaded per step.  Batch composition,
        # order, and RNG consumption are identical to the default path.
        self.stream = bool(params.get("stream", False))
        self.device_data = (bool(params.get("device_data", True))
                            and not self.stream)
        self._data_cache = {}
        # Under the bf16 policy the model's first op casts x to bf16
        # (models/darknet.py:60 etc.); storing the HBM-resident dataset
        # bf16 makes that cast a no-op with bit-identical values (same
        # f32->bf16 rounding, applied once at placement instead of
        # every step).  The train-step device profile measured the
        # per-step input convert at ~4.3 ms/step for darknet_r@b128 —
        # and XLA clones it into the conv1 dW fusion, so it was paid
        # twice.  Halves the dataset HBM footprint too.  capsule keeps
        # f32: its reconstruction loss consumes x directly in f32.
        import jax.numpy as jnp

        self._x_dtype = jnp.float32
        if (getattr(self.model, "dtype", None) == jnp.bfloat16
                and not self.needs_labels):
            self._x_dtype = jnp.bfloat16

        # --scan_epoch: whole-epoch lax.scan programs (one dispatch per
        # epoch per distinct batch size).  Identical batch composition,
        # order, and RNG stream as the per-batch loop; built lazily so
        # the default path never pays their compile.  Requires the
        # HBM-resident dataset.  Composes with --mesh: the scan body
        # constrains each gathered batch to the 'data' sharding, so
        # GSPMD shards the step exactly like the loop's place_batch.
        # 'auto' (the CLI default) resolves to on-for-TPU: measured
        # 4.5x per-epoch wall on the chip with an identical loss
        # trajectory (BASELINE.md), off elsewhere (CPU epochs are
        # compile-dominated at test sizes).
        scan_setting = params.get("scan_epoch", False)
        self.scan_epoch = (self._resolve_scan(scan_setting)
                           and self.device_data)
        if (not self.scan_epoch and self.stream
                and self._resolve_scan(scan_setting)
                and str(scan_setting).lower() != "auto"):
            # explicit --scan_epoch on with --stream: scan gathers from
            # the HBM-resident dataset, which --stream's whole point is
            # not to have — say so instead of silently ignoring the ask
            # ('auto' falls back silently by design).  Gated on verbose
            # like every other driver diagnostic (programmatic
            # verbose=False runs stay silent).
            if verbose:
                print("[scan_epoch] ignored: --stream keeps the dataset "
                      "host-resident, the per-batch streamed loop runs")

    @staticmethod
    def _resolve_scan(setting):
        """Map a --scan_epoch setting (bool | 'auto' | 'on' | 'off')
        to a concrete bool; 'auto' = TPU backend only."""
        if isinstance(setting, str):
            s = setting.lower()
            if s == "auto":
                return jax.default_backend() == "tpu"
            return s in ("on", "true", "1")
        return bool(setting)

    def _device_dataset(self, tag, x):
        import jax.numpy as jnp

        key = (tag, x.shape, x.dtype.str)
        if key not in self._data_cache:
            for stale in [k for k in self._data_cache if k[0] == tag]:
                del self._data_cache[stale]
            arr = jnp.asarray(x, self._x_dtype)
            if self.mesh is not None:
                # replicate the dataset: permuted batch gathers then
                # slice locally with no collectives; batches are
                # re-placed batch-sharded by _place_batch
                arr = jax.device_put(arr, par.replicated_sharding(self.mesh))
            self._data_cache[key] = arr
        return self._data_cache[key]

    def _place_batch(self, x_bch, y_bch):
        """Mesh placement for one batch (no-op without a mesh)."""
        import jax.numpy as jnp

        if self.mesh is None:
            return x_bch, y_bch
        return par.place_batch((x_bch, jnp.asarray(y_bch)), self.mesh)

    def _stream_mesh_batches(self, x, y, perm, n_batch):
        """--stream x --mesh: the multi-host input path (SURVEY.md §7.9).

        Each process's prefetcher gathers only the rows its devices
        address in every global batch — the slices come from the batch
        sharding's own index map (par.process_row_slices: possibly
        several slices, identical rows on replica processes, ALL rows
        under data=1) — and the batch-sharded global array is then
        assembled collective-free from the addressable rows
        (jax.make_array_from_process_local_data) — no host ever
        materializes a batch it doesn't own.  Ragged tails (global rows
        not a multiple of the 'data' axis) cannot take an uneven
        sharding, so they arrive in full on every process and are
        replicated — byte-identical to place_batch's tail rule, which
        keeps the compiled step's numerics equal to single-device.
        Yields placed batches whose shardings match what _place_batch
        would choose, so the epoch loop's placement is an identity.
        """
        import jax.numpy as jnp

        n_data = self.mesh.shape["data"]
        memo = {}  # an epoch has <=2 distinct global batch sizes

        def row_slices(n):
            if n not in memo:
                memo[n] = par.process_row_slices(n, self.mesh)
            return memo[n]

        for xb, yb, n_glob in data_stream.iter_batches_process_local(
                x, y, perm, n_batch, shard_rows=n_data,
                row_slices=row_slices):
            if n_glob % n_data == 0:
                yield par.global_batch_from_process_local(
                    (xb, yb), self.mesh, n_global=n_glob)
            else:
                yield par.place_batch(
                    (jnp.asarray(xb), jnp.asarray(yb)), self.mesh)

    # Batches between queue drains on the CPU-backend mesh path (see
    # _throttle_mesh_queue); shared with predict's batched forward.
    _CPU_MESH_QUEUE = par.CPU_MESH_QUEUE

    def _drain_before_fanin(self, parts):
        """Drain the dispatch queue before an epoch-end fan-in (mesh).

        On jaxlib 0.9.0's CPU runtime, dispatching a WIDE program (the
        epoch-end stack/concat over dozens of per-batch outputs) while
        a deep queue of multi-partition mesh programs is still in
        flight can deadlock the collective rendezvous: one device's
        partition never starts, the 40 s rendezvous timeout trips, and
        the process aborts (reproduced deterministically with >=64
        queued 8-partition train steps + a 64-ary jnp.stack; 64 steps
        alone or a pre-drained stack complete fine).  Single-device
        queues are immune, so this costs nothing without a mesh; the
        deadlock is specific to the CPU runtime's in-process
        collectives, so real TPU meshes skip the sync too (it would
        trade the epoch-end overlap for nothing — the float() fetch
        right after syncs anyway).
        """
        if self.mesh is not None and jax.default_backend() == "cpu":
            jax.block_until_ready(parts)

    def _throttle_mesh_queue(self, i_bch, ref):
        """Bound the in-flight queue in mesh epochs on the CPU backend.

        The same jaxlib 0.9.0 CPU runtime that deadlocks on wide
        fan-ins (see _drain_before_fanin) also intermittently trips its
        40 s collective-rendezvous timeout when dozens of 8-partition
        programs sit queued behind per-batch host->sharded uploads on
        an oversubscribed host (the virtual-8-device test mesh runs on
        one core): a partition of a queued step can be starved past the
        timeout, which aborts the whole process.  Draining every
        _CPU_MESH_QUEUE batches keeps the queue shallow so no program
        can wait starved behind a long convoy.  CPU-backend only: the
        race is in the CPU runtime's in-process collectives, and on
        TPU pods this would cost real pipelining.
        """
        if (self.mesh is not None
                and (i_bch + 1) % self._CPU_MESH_QUEUE == 0
                and jax.default_backend() == "cpu"):
            jax.block_until_ready(ref)

    def _device_labels(self, tag, y):
        """Device-cached labels in their native dtype (no f32 cast)."""
        import jax.numpy as jnp

        key = (tag, y.shape, y.dtype.str)
        if key not in self._data_cache:
            for stale in [k for k in self._data_cache if k[0] == tag]:
                del self._data_cache[stale]
            arr = jnp.asarray(y)
            if self.mesh is not None:
                arr = jax.device_put(arr, par.replicated_sharding(self.mesh))
            self._data_cache[key] = arr
        return self._data_cache[key]

    @staticmethod
    def _group_splits(splits):
        """Stack np.array_split's output into index matrices, one per
        distinct batch size (array_split puts all larger splits first,
        so at most two contiguous groups)."""
        groups, start = [], 0
        while start < len(splits):
            size, end = len(splits[start]), start
            while end < len(splits) and len(splits[end]) == size:
                end += 1
            groups.append(np.stack(splits[start:end]).astype(np.int32))
            start = end
        return groups

    def _scan_epoch_run(self, train, x, y, perm_or_order, lr=None):
        """Run one epoch through the whole-epoch scan programs.

        Returns (avg_loss, avg_iou, y_hat_np) with identical batch
        composition/order/math to the per-batch loop.
        """
        import jax.numpy as jnp

        params = self.params
        n = len(perm_or_order)
        n_batch = (n + params.batch_size - 1) // params.batch_size
        tag = "train" if train else "eval"
        x_dev = self._device_dataset(tag, x)
        y_dev = self._device_labels(tag + "_y", y)

        batch_sh = (par.batch_sharding(self.mesh)
                    if self.mesh is not None else None)
        if train and self._scan_train_fn is None:
            self._scan_train_fn = make_train_epoch(
                self.model, self.model_name, self.loss_cfg,
                freeze_mask=self._freeze_mask, batch_sharding=batch_sh)
        if not train and self._scan_eval_fn is None:
            self._scan_eval_fn = make_eval_epoch(
                self.model, self.model_name, self.loss_cfg,
                batch_sharding=batch_sh)

        losses_parts, iou_parts, y_hat_parts = [], [], []
        for idx in self._group_splits(
                np.array_split(perm_or_order, n_batch)):
            idx_dev = jnp.asarray(idx)
            if train:
                self.state, losses, auxes, y_hats = self._scan_train_fn(
                    self.state, x_dev, y_dev, idx_dev, lr)
            else:
                losses, auxes, y_hats = self._scan_eval_fn(
                    self.state, x_dev, y_dev, idx_dev)
            losses_parts.append(losses)
            if "avg_iou" in auxes:
                iou_parts.append(auxes["avg_iou"])
            y_hat_parts.append(
                y_hats.reshape((-1,) + y_hats.shape[2:]))

        avg_loss = float(jnp.mean(jnp.concatenate(losses_parts)))
        avg_iou = (float(jnp.mean(jnp.concatenate(iou_parts)))
                   if iou_parts else 0.0)
        y_hat_dev = jnp.concatenate(y_hat_parts, axis=0)
        return avg_loss, avg_iou, y_hat_dev

    # -- epochs ------------------------------------------------------------

    def _epoch_metric(self, avg_loss, avg_iou, y_hat_dev, y, metric_on,
                      tag):
        """Shared epoch tail: metric on <=1000 subsampled rows + the
        darknet_d avg_iou print.  Same np.random consumption as the
        reference (choice only when metric is on and n > cap)."""
        params = self.params
        n = y.shape[0]
        metric_score = -1
        if metric_on:
            # multi-host: epoch outputs are batch-sharded across
            # processes; all-gather so the host-side metric can read
            # them (no-op single-process / without a mesh)
            y_hat = np.asarray(
                par.gather_replicated(y_hat_dev, self.mesh))
            yy = y
            if n > config.max_metric_samples:
                i = np.random.choice(n, config.max_metric_samples).astype(int)
                yy, y_hat = y[i], y_hat[i]
            metric_score = self.metric(yy, y_hat, params)
        if self.model_name == "darknet_d":
            print("{} avg iou: {:05.3f}".format(
                "train" if tag == "train" else "test", avg_iou))
        # dark_loss's aux signal, exposed for every detector (the
        # reference prints it for darknet_d only, main.py:93-94; the
        # convergence-parity tests compare it cross-framework for
        # darknet_r too)
        self.last_avg_iou = avg_iou
        return avg_loss, metric_score

    def train_epoch(self, x, y, lr, metric_on=True, progress=None):
        """One training epoch.  Reference parity: main.py:42-95."""
        import jax.numpy as jnp

        params = self.params
        n = y.shape[0]
        n_batch = (n + params.batch_size - 1) // params.batch_size

        if self.scan_epoch:
            perm = np.random.permutation(n)
            avg_loss, avg_iou, y_hat_dev = self._scan_epoch_run(
                True, x, y, perm, lr=lr)
            if progress is not None:
                progress.set_postfix(loss="{:05.3f}".format(avg_loss))
                progress.update(n_batch)
            return self._epoch_metric(
                avg_loss, avg_iou, y_hat_dev, y[perm], metric_on,
                "train")

        # _stream_mesh_batches yields batches ALREADY placed with the
        # exact shardings _place_batch would choose; re-placing them
        # would be a semantic identity paying per-batch dispatch
        # overhead on the hot loop.
        pre_placed = False
        if self.device_data:
            # device-resident images: shuffle = permuted index gather on
            # device (same np.random.permutation consumption as the host
            # path, so RNG-dependent behavior is unchanged)
            x_dev = self._device_dataset("train", x)
            perm = np.random.permutation(n)
            y = y[perm]
            # gather lazily, one batch per loop iteration: an eager
            # list of jnp.take results would hold a full permuted COPY
            # of the dataset in HBM for the whole epoch on top of the
            # cached dataset
            batches = (
                (jnp.take(x_dev, jnp.asarray(i), axis=0), yb)
                for i, yb in zip(np.array_split(perm, n_batch),
                                 np.array_split(y, n_batch))
            )
        elif self.stream:
            # host-streaming (--stream): same permutation draw as the
            # other paths; the native threaded prefetcher
            # (data/stream.py) gathers each batch ahead of the device.
            # With a mesh, each process streams only its rows of every
            # global batch (_stream_mesh_batches).
            perm = np.random.permutation(n)
            batches = (self._stream_mesh_batches(x, y, perm, n_batch)
                       if self.mesh is not None
                       else data_stream.iter_batches(x, y, perm, n_batch))
            pre_placed = self.mesh is not None
            y = np.asarray(y[perm])  # labels only, for the metric tail
        else:
            x, y = data_loader.shuffle(x, y)
            x_split = [b.astype(np.float32)
                       for b in np.array_split(x, n_batch)]
            batches = zip(x_split, np.array_split(y, n_batch))

        # device scalars accumulate without per-batch host syncs.  The
        # live-loss postfix is throttled: float(loss) is a D2H fetch
        # that blocks on the whole dispatched chain, and over the
        # tunneled TPU backend one such sync costs ~0.4s — fetching it
        # every batch made the epoch 100x slower than the compiled step
        # (measured: 2.3 it/s vs a 4ms train step).  Dispatch stays
        # async; the bar advances every batch, the loss refreshes every
        # _POSTFIX_EVERY batches and at epoch end.
        losses, ious = [], []
        y_hat_parts = []
        for i_bch, (x_bch, y_bch) in enumerate(batches):
            if not pre_placed:
                x_bch, y_bch = self._place_batch(x_bch, y_bch)
            self.state, loss, aux, y_hat_bch = self.train_step(
                self.state, x_bch, y_bch, lr)
            y_hat_parts.append(y_hat_bch)
            losses.append(loss)
            if "avg_iou" in aux:
                ious.append(aux["avg_iou"])
            self._throttle_mesh_queue(i_bch, loss)
            if progress is not None:
                if (i_bch + 1) % self._POSTFIX_EVERY == 0 \
                        or i_bch + 1 == n_batch:
                    progress.set_postfix(
                        loss="{:05.3f}".format(float(loss)))
                progress.update()
        # one device-side reduction + one fetch per epoch: each fresh
        # scalar fetch over the tunnel costs a full RTT, so per-batch
        # float() lists would cost n_batch RTTs
        self._drain_before_fanin((losses, ious, y_hat_parts))
        avg_loss = float(jnp.mean(jnp.stack(losses)))
        avg_iou = float(jnp.mean(jnp.stack(ious))) if ious else 0.0
        return self._epoch_metric(
            avg_loss, avg_iou, jnp.concatenate(y_hat_parts, axis=0), y,
            metric_on, "train")

    def eval_epoch(self, x, y, metric_on=True):
        """One evaluation epoch.  Reference parity: main.py:98-143."""
        import jax.numpy as jnp

        params = self.params
        n = y.shape[0]
        n_batch = (n + params.batch_size - 1) // params.batch_size

        if self.scan_epoch:
            avg_loss, avg_iou, y_hat_dev = self._scan_epoch_run(
                False, x, y, np.arange(n))
            return self._epoch_metric(
                avg_loss, avg_iou, y_hat_dev, y, metric_on, "eval")

        pre_placed = False  # see train_epoch: stream x mesh pre-places
        if self.device_data:
            x_dev = self._device_dataset("eval", x)
            bounds = np.cumsum([len(b) for b in
                                np.array_split(np.arange(n), n_batch)])
            # lazy slices (see train_epoch: eager lists duplicate the
            # dataset in HBM for the epoch)
            batches = (
                (x_dev[lo:hi], yb)
                for (lo, hi), yb in zip(
                    zip(np.concatenate([[0], bounds[:-1]]), bounds),
                    np.array_split(y, n_batch))
            )
        elif self.stream:
            batches = (self._stream_mesh_batches(
                           x, y, np.arange(n), n_batch)
                       if self.mesh is not None
                       else data_stream.iter_batches(
                           x, y, np.arange(n), n_batch))
            pre_placed = self.mesh is not None
        else:
            x_split = [b.astype(np.float32)
                       for b in np.array_split(x, n_batch)]
            batches = zip(x_split, np.array_split(y, n_batch))

        losses, ious = [], []
        y_hat_parts = []
        for i_bch, (x_bch, y_bch) in enumerate(batches):
            if not pre_placed:
                x_bch, y_bch = self._place_batch(x_bch, y_bch)
            loss, aux, y_hat_bch = self.eval_step(
                self.state, x_bch, y_bch)
            y_hat_parts.append(y_hat_bch)
            losses.append(loss)
            if "avg_iou" in aux:
                ious.append(aux["avg_iou"])
            self._throttle_mesh_queue(i_bch, loss)
        self._drain_before_fanin((losses, ious, y_hat_parts))
        avg_loss = float(jnp.mean(jnp.stack(losses)))
        avg_iou = float(jnp.mean(jnp.stack(ious))) if ious else 0.0
        return self._epoch_metric(
            avg_loss, avg_iou, jnp.concatenate(y_hat_parts, axis=0), y,
            metric_on, "eval")

    # -- checkpoint glue ---------------------------------------------------

    def state_dict(self, epoch, plateau):
        from flax import serialization

        return {
            "epoch": epoch,
            "state": serialization.to_state_dict(self.state),
            "plateau": plateau.state_dict() if plateau else {},
        }

    def restore(self, path, model_dir=None, train_frac=None):
        from flax import serialization

        fallbacks = []
        if model_dir is not None and train_frac is not None:
            fallbacks.append(model_dir + str(train_frac))
        raw = ckpt.load_checkpoint(path, target=None, fallback_dirs=fallbacks)
        self.state = serialization.from_state_dict(self.state, raw["state"])
        if self.mesh is not None:  # restored leaves arrive host-side
            self.state = par.shard_state(
                self.state, self.mesh, shard_routing=self._shard_routing)
        return raw


def train_and_evaluate(params, data_dir, model_dir, is_small=False,
                       restore_file=None, writer=None, no_metric=False,
                       seed=0, progress=True):
    """Full training run.  Reference parity: main.py:146-217."""
    # Multi-host: every process runs the identical trajectory (same
    # seeds and global arrays — the compiled steps are global-semantics
    # programs); exactly one writes artifacts.  Single-process: True.
    primary = par.is_primary()
    trainer = Trainer(params, seed=seed,
                      verbose=bool(params.get("summary", True)) and primary)
    plateau = ReduceLROnPlateau(
        lr=params.lr_runtime, factor=params.lr_decay)

    if restore_file is not None:
        restore_path = ckpt.checkpoint_path(model_dir, restore_file)
        print("Restoring parameters from {}".format(restore_path))
        raw = trainer.restore(restore_path, model_dir, params.train_frac)
        if raw.get("plateau"):
            plateau.load_state_dict(raw["plateau"])

    if (params.get("stream", False) and params.get("npy", False)
            and not is_small):
        # streaming + npy artifacts: memmap X so images stay on disk
        # until the prefetcher's worker threads fault them in
        try:
            x_tr, y_tr = data_stream.open_memmap_dataset(data_dir, "train")
            x_ev, y_ev = data_stream.open_memmap_dataset(data_dir, "eval")
        except (FileNotFoundError, OSError):
            x_tr, y_tr, x_ev, y_ev = data_loader.load_or_synthesize(
                data_dir, params, is_small=is_small, npy=True)
    else:
        x_tr, y_tr, x_ev, y_ev = data_loader.load_or_synthesize(
            data_dir, params, is_small=is_small,
            npy=params.get("npy", False))
    to_frac = int(y_tr.shape[0] * params.train_frac)
    x_tr, y_tr = x_tr[:to_frac], y_tr[:to_frac]

    losses_tr, losses_ev, metrics_tr, metrics_ev = [], [], [], []
    best_metric_ev = float("-inf")
    best_loss_ev = float("inf")

    # --async_ckpt: D2H + serialize + write happen on a worker thread
    # (same last/best semantics; COMPAT.md #29 for when it pays).  The
    # flush runs in a finally so an exception mid-training (OOM, ^C)
    # still lands every enqueued checkpoint on disk before unwinding —
    # the sync path's crash behavior.
    async_ckpt = (ckpt.AsyncCheckpointer()
                  if params.get("async_ckpt", False) else None)
    save_ckpt = async_ckpt.save if async_ckpt else ckpt.save_checkpoint
    # --ckpt_every N: save `last` every Nth epoch (and on the final
    # epoch); `best` is still written the moment the eval metric
    # improves, so best semantics are identical to the reference's
    # per-epoch torch.save (main.py:181-188).  Default 1 = reference
    # behavior.  Motivation: over a slow D2H link the per-epoch
    # checkpoint dominates the detector epoch (10-17 s of a ~10.5 s
    # epoch body, BASELINE.md epoch anatomy); the only cost of N>1 is
    # that a crash loses up to N-1 epochs of `last` progress.
    ckpt_every = max(1, int(params.get("ckpt_every", 1) or 1))

    try:
        for epoch in range(params.n_epochs):
            if_eval = ((epoch + 1) % params.eval_every == 0)
            metric_on = if_eval and not no_metric

            bar = None
            if progress and primary:
                from tqdm import trange
                n_batch = ((len(y_tr) + params.batch_size - 1)
                           // params.batch_size)
                bar = trange(n_batch)

            loss_tr, metric_tr = trainer.train_epoch(
                x_tr, y_tr, plateau.lr, metric_on=metric_on, progress=bar)
            loss_ev, metric_ev = trainer.eval_epoch(
                x_ev, y_ev, metric_on=metric_on)
            if bar is not None:
                bar.close()

            plateau.step(loss_tr)

            if writer is not None:
                writer.add_scalar("train_loss", loss_tr, epoch)
                writer.add_scalar("eval_loss", loss_ev, epoch)

            is_best = metric_ev > best_metric_ev
            if primary and (is_best or (epoch + 1) % ckpt_every == 0
                            or epoch + 1 == params.n_epochs):
                save_ckpt(
                    trainer.state_dict(epoch + 1, plateau),
                    is_best=is_best,
                    checkpoint_dir=model_dir + str(params.train_frac),
                )
            if is_best:
                best_metric_ev = metric_ev
            if loss_ev < best_loss_ev:
                best_loss_ev = loss_ev

            if if_eval:
                if writer is not None:
                    writer.add_scalar("train_metric", metric_tr, epoch)
                    writer.add_scalar("eval_metric", metric_ev, epoch)
                if primary:
                    print(
                        "epoch {} | train loss: {:05.3f} | "
                        "eval loss: {:05.3f} |"
                        " best eval loss: {:05.3f} | "
                        "train metric: {:05.3f} | eval metric: {:05.3f} | "
                        "best eval metric {:05.3f}".format(
                            epoch + 1, loss_tr, loss_ev, best_loss_ev,
                            metric_tr, metric_ev, best_metric_ev))
                metrics_tr.append(metric_tr)
                metrics_ev.append(metric_ev)
                if primary:
                    np.save(os.path.join(model_dir, "metrics_tr"), metrics_tr)
                    np.save(os.path.join(model_dir, "metrics_ev"), metrics_ev)

            losses_tr.append(loss_tr)
            losses_ev.append(loss_ev)
            if primary:
                np.save(os.path.join(model_dir, "losses_tr"), losses_tr)
                np.save(os.path.join(model_dir, "losses_ev"), losses_ev)
    finally:
        if async_ckpt is not None:
            # every enqueued save is on disk past here; worker joined
            async_ckpt.flush()
    if writer is not None:
        writer.close()
    return best_metric_ev

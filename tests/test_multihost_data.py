"""Multi-host data loading (SURVEY §7.9 / VERDICT r1 item 9).

Real multi-host needs multiple processes; here the per-process slice
logic is tested with faked process indices, and the assembly path
(`jax.make_array_from_process_local_data`) runs single-process against
the 8-device CPU mesh, where it must be value-identical to the plain
sharded device_put.
"""

import os

import numpy as np
import jax

from cs231_capsule_yolo_traffic_sign_detection_tpu import parallel as par


def test_process_batch_slices_partition_the_batch():
    """Slices across all processes are disjoint and cover [0, n)."""
    for n, pc in [(64, 4), (13, 4), (7, 8), (8, 1)]:
        rows = []
        for pi in range(pc):
            lo, hi = par.process_batch_slice(n, process_index=pi,
                                             process_count=pc)
            assert 0 <= lo <= hi <= n
            rows.extend(range(lo, hi))
        assert rows == list(range(n)), (n, pc, rows)


def test_process_batch_slice_sizes_balanced():
    for n, pc in [(64, 4), (13, 4)]:
        sizes = [
            (lambda lo_hi: lo_hi[1] - lo_hi[0])(
                par.process_batch_slice(n, pi, pc))
            for pi in range(pc)
        ]
        assert max(sizes) - min(sizes) <= 1


def test_distinct_row_slices_dedups_replicas_and_sorts():
    """Per-process row slices come from the sharding's index map:
    model-axis replicas share a slice (dedup), slices sort by start,
    and a data=1 layout (full replication) yields the whole range."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.parallel.mesh import (
        _distinct_row_slices,
    )

    # two local devices = model replicas of the same data shard
    assert _distinct_row_slices(
        {"d0": (slice(0, 3),), "d1": (slice(0, 3),)}, 6) == [(0, 3)]
    # two data shards owned out of device order -> sorted by start
    assert _distinct_row_slices(
        {"d0": (slice(4, 8),), "d1": (slice(0, 4),)}, 8) == [(0, 4), (4, 8)]
    # data=1: every device addresses all rows (slice(None))
    assert _distinct_row_slices({"d0": (slice(None),)}, 6) == [(0, 6)]


def test_process_row_slices_vs_equal_split():
    """The pod layouts the equal per-process split gets wrong
    (VERDICT r2 review finding): 4 single-device processes on
    data=2,model=2 need 3/3/3/3 rows of a 6-row batch (two processes
    per replica pair), not process_batch_slice's 2/2/1/1; data=1
    multi-process needs ALL rows everywhere, not a split."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.parallel.mesh import (
        _distinct_row_slices,
    )

    # process 1 of 4 owns device (data=0, model=1): rows [0,3)
    assert _distinct_row_slices({"p1d": (slice(0, 3),)}, 6) == [(0, 3)]
    assert par.process_batch_slice(6, 1, 4) != (0, 3)  # the old bug
    # data=1, model=4: each process's device addresses every row
    assert _distinct_row_slices({"pXd": (slice(None),)}, 6) == [(0, 6)]
    assert par.process_batch_slice(6, 2, 4) != (0, 6)


def test_process_row_slices_single_process_covers_batch():
    """Single process: the slices are the mesh's data shards in order,
    covering [0, n) exactly — so the streamed local batch equals the
    global batch and the path stays byte-identical to non-streaming."""
    mesh = par.make_mesh(n_data=4, n_model=2)
    slices = par.process_row_slices(16, mesh)
    assert slices == [(0, 4), (4, 8), (8, 12), (12, 16)]


def test_iter_batches_row_slices_gathers_union(tmp_path):
    """The streaming iterator gathers exactly the concatenation of the
    row_slices ranges of each global batch."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data import stream

    rng = np.random.RandomState(0)
    x = rng.rand(8, 3).astype(np.float32)
    y = np.arange(8, dtype=np.int64)
    perm = np.asarray([3, 1, 7, 5, 0, 2, 6, 4])
    out = list(stream.iter_batches_process_local(
        x, y, perm, n_batch=1, shard_rows=2,
        row_slices=lambda n: [(0, 2), (6, 8)]))
    assert len(out) == 1
    xb, yb, n_glob = out[0]
    assert n_glob == 8
    want = perm[[0, 1, 6, 7]]
    np.testing.assert_array_equal(yb, y[want])
    np.testing.assert_allclose(xb, x[want], atol=1e-6)


def test_global_batch_from_process_local_single_process():
    mesh = par.make_mesh(n_data=8, n_model=1)
    rng = np.random.RandomState(0)
    x = rng.rand(16, 4).astype(np.float32)

    lo, hi = par.process_batch_slice(16)  # single process: full range
    assert (lo, hi) == (0, 16)
    global_x = par.global_batch_from_process_local(x[lo:hi], mesh)

    assert global_x.shape == (16, 4)
    assert global_x.sharding.spec == par.batch_sharding(mesh).spec
    np.testing.assert_array_equal(np.asarray(global_x), x)

    # value-identical to the plain device_put path
    ref = par.shard_batch(jax.numpy.asarray(x), mesh)
    np.testing.assert_array_equal(np.asarray(global_x), np.asarray(ref))


def test_checkpoint_writes_only_on_process_zero(tmp_path, monkeypatch):
    """Multi-host: every process holds the same replicated state; only
    process 0 may write, or concurrent writers race on the same path."""
    import os

    import jax

    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )

    d = str(tmp_path / "ckpts")
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    ckpt.save_checkpoint({"epoch": 1, "state": {}}, is_best=True,
                         checkpoint_dir=d)
    assert not os.path.exists(os.path.join(d, "last.ckpt"))

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    ckpt.save_checkpoint({"epoch": 1, "state": {}}, is_best=True,
                         checkpoint_dir=d)
    assert os.path.exists(os.path.join(d, "last.ckpt"))
    assert os.path.exists(os.path.join(d, "best.ckpt"))


def test_async_checkpointer_roundtrip(tmp_path):
    """Async writes land the same last/best files as the sync path,
    in order, and flush() makes them durable."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )

    d = str(tmp_path / "a")
    ac = ckpt.AsyncCheckpointer()
    for epoch in range(1, 4):
        ac.save({"epoch": epoch, "state": {"w": np.full((4,), epoch,
                                                        np.float32)}},
                is_best=(epoch == 2), checkpoint_dir=d)
    ac.flush()

    last = ckpt.load_checkpoint(os.path.join(d, "last.ckpt"))
    best = ckpt.load_checkpoint(os.path.join(d, "best.ckpt"))
    assert last["epoch"] == 3 and best["epoch"] == 2
    np.testing.assert_array_equal(last["state"]["w"],
                                  np.full((4,), 3, np.float32))
    np.testing.assert_array_equal(best["state"]["w"],
                                  np.full((4,), 2, np.float32))


def test_async_checkpointer_surfaces_worker_errors(tmp_path):
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )
    import pytest

    target = str(tmp_path / "blocked")
    with open(target, "w") as f:  # a FILE where the dir must go
        f.write("x")
    ac = ckpt.AsyncCheckpointer()
    ac.save({"epoch": 1, "state": {}}, is_best=False, checkpoint_dir=target)
    with pytest.raises(OSError):
        ac.flush()


def test_async_checkpointer_cli_trajectory(tmp_path):
    """--async_ckpt through train_and_evaluate: identical artifacts to
    the sync path (same seed, synthetic data)."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
        train_and_evaluate,
    )

    def run(async_ckpt, sub):
        np.random.seed(0)  # the driver shuffles via global np.random
        md = str(tmp_path / sub)
        os.makedirs(md, exist_ok=True)
        p = Params(model="cnn", n_classes=43, dropout=0.0, seed=0,
                   train_frac=1.0, recon=True, recon_coef=5e-4,
                   routing_impl="xla", batch_size=8, n_epochs=2,
                   eval_every=1, lr_decay=0.1, lr_runtime=1e-3,
                   mesh="off", scan_epoch="off", async_ckpt=async_ckpt,
                   summary=False)
        train_and_evaluate(p, str(tmp_path / "nodata"), md,
                           no_metric=True, seed=0, progress=False)
        return ckpt.load_checkpoint(os.path.join(md + "1.0", "last.ckpt"))

    sync = run(False, "s")
    asyn = run(True, "a")
    assert sync["epoch"] == asyn["epoch"] == 2
    a = jax.tree_util.tree_leaves(sync["state"]["params"])
    b = jax.tree_util.tree_leaves(asyn["state"]["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_checkpointer_shutdown(tmp_path):
    """flush() joins the worker thread (no leak per training run) and
    the instance refuses reuse afterwards."""
    import pytest

    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )

    d = str(tmp_path / "x")
    ac = ckpt.AsyncCheckpointer()
    ac.save({"epoch": 1, "state": {}}, is_best=False, checkpoint_dir=d)
    ac.flush()
    assert not ac._thread.is_alive()
    ac.flush()  # idempotent
    with pytest.raises(RuntimeError, match="after flush"):
        ac.save({"epoch": 2, "state": {}}, is_best=False, checkpoint_dir=d)

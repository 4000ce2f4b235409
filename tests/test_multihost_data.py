"""Multi-host data loading (SURVEY §7.9 / VERDICT r1 item 9).

Real multi-host needs multiple processes; here the per-process slice
logic is tested with faked process indices, and the assembly path
(`jax.make_array_from_process_local_data`) runs single-process against
the 8-device CPU mesh, where it must be value-identical to the plain
sharded device_put.
"""

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

"""Host-streaming data path (data/stream.py + native/prefetch.cpp).

The streaming pipeline must be byte-identical to the driver's default
batching (shuffle + np.array_split, reference main.py:45-48): same
permutation in, same batch arrays out — whether the native threaded
prefetcher or the numpy fallback assembles them, and whether X lives in
RAM or in a memmapped .npy artifact.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cs231_capsule_yolo_traffic_sign_detection_tpu.data import (  # noqa: E402
    loader, stream)


def reference_batches(x, y, perm, n_batch):
    """The driver's host path: split the permuted arrays."""
    xs = [b.astype(np.float32) for b in np.array_split(x[perm], n_batch)]
    ys = np.array_split(y[perm], n_batch)
    return list(zip(xs, ys))


@pytest.mark.parametrize("n,n_batch", [(32, 4), (37, 5), (8, 8), (3, 7)])
def test_iter_batches_matches_array_split(n, n_batch):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 6, 6, 3).astype(np.float32)
    y = rng.randint(0, 43, n).astype(np.int64)
    perm = rng.permutation(n)

    got = list(stream.iter_batches(x, y, perm, n_batch))
    want = reference_batches(x, y, perm, n_batch)
    assert len(got) == len(want)
    for (gx, gy), (wx, wy) in zip(got, want):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)
        assert gx.dtype == np.float32 and gy.dtype == np.int64


def test_iter_batches_detection_grid_labels():
    """Y rows are opaque bytes: f32 YOLO grids survive unchanged."""
    rng = np.random.RandomState(1)
    x = rng.randn(11, 4, 4, 3).astype(np.float32)
    y = rng.randn(11, 7, 7, 48).astype(np.float32)
    perm = rng.permutation(11)
    got = list(stream.iter_batches(x, y, perm, 3))
    for (gx, gy), (wx, wy) in zip(got, reference_batches(x, y, perm, 3)):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)


def test_uint8_rows_stream_center_rgb_normalized():
    """u8 stores are centered in the gather: (v - 128) / 128, exactly
    the loader's center_rgb (reference utils.py:122-123)."""
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (19, 5, 5, 3)).astype(np.uint8)
    y = rng.randint(0, 43, 19).astype(np.int64)
    perm = rng.permutation(19)
    got = list(stream.iter_batches(x, y, perm, 4))
    want = loader.center_rgb(x[perm].astype(np.float32))
    np.testing.assert_array_equal(np.concatenate([g for g, _ in got]), want)


def test_native_and_fallback_agree(monkeypatch):
    rng = np.random.RandomState(3)
    x = rng.randn(25, 3, 3, 3).astype(np.float32)
    y = rng.randint(0, 9, 25).astype(np.int64)
    perm = rng.permutation(25)

    native = list(stream.iter_batches(x, y, perm, 4))
    if stream.get_lib() is None:
        pytest.skip("native prefetcher unavailable (no toolchain)")
    monkeypatch.setattr(stream, "get_lib", lambda: None)
    fallback = list(stream.iter_batches(x, y, perm, 4))
    for (nx, ny), (fx, fy) in zip(native, fallback):
        np.testing.assert_array_equal(nx, fx)
        np.testing.assert_array_equal(ny, fy)


def test_memmap_inputs(tmp_path):
    rng = np.random.RandomState(4)
    x = rng.randn(15, 4, 4, 3).astype(np.float32)
    y = rng.randint(0, 5, 15).astype(np.int64)
    np.save(tmp_path / "train_X.npy", x)
    np.save(tmp_path / "train_Y.npy", y)
    xm = np.load(tmp_path / "train_X.npy", mmap_mode="r")
    ym = np.load(tmp_path / "train_Y.npy", mmap_mode="r")

    perm = rng.permutation(15)
    got = list(stream.iter_batches(xm, ym, perm, 4))
    for (gx, gy), (wx, wy) in zip(got, reference_batches(x, y, perm, 4)):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)


def test_empty_permutation_yields_nothing():
    x = np.zeros((0, 2, 2, 3), np.float32)
    y = np.zeros((0,), np.int64)
    assert list(stream.iter_batches(x, y, np.zeros(0, np.int64), 1)) == []


def test_open_memmap_dataset(tmp_path):
    d = str(tmp_path)
    x = np.arange(24, dtype=np.float32).reshape(2, 2, 2, 3)
    y = np.array([1, 2], np.int64)
    np.save(tmp_path / "train_X.npy", x)
    np.save(tmp_path / "train_Y.npy", y)
    xm, ym = stream.open_memmap_dataset(d, "train")
    assert isinstance(xm, np.memmap)
    np.testing.assert_array_equal(np.asarray(xm), x)
    np.testing.assert_array_equal(np.asarray(ym), y)


# ---------------------------------------------------------------------------
# Product surface: --stream through main.py
# ---------------------------------------------------------------------------

def _run_cli(args, cwd):
    env = dict(os.environ)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['main.py'] + %r;"
        "sys.path.insert(0, %r);"
        "import main; main.main()" % (args, REPO)
    )
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_cli_stream_matches_default_trajectory(tmp_path):
    """`--stream` feeds the identical batch values, so the single-device
    loss trajectory matches the default HBM-resident path."""
    dirs = []
    for tag in ("default", "stream"):
        d = tmp_path / f"cnn_{tag}"
        d.mkdir()
        (d / "params.json").write_text(json.dumps({
            "batch_size": 8, "n_classes": 43, "lr": 1e-3,
            "n_epochs": 2, "dropout": 0.0, "lr_decay": 0.1,
        }))
        dirs.append(str(d))
    default_dir, stream_dir = dirs

    r1 = _run_cli(["--model", "cnn", "--mode", "train", "--no_metric",
                   "--model_dir", default_dir, "--mesh", "off"],
                  cwd=str(tmp_path))
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _run_cli(["--model", "cnn", "--mode", "train", "--no_metric",
                   "--model_dir", stream_dir, "--mesh", "off", "--stream"],
                  cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]

    l1 = np.load(os.path.join(default_dir, "losses_tr.npy"))
    l2 = np.load(os.path.join(stream_dir, "losses_tr.npy"))
    assert l1.shape == l2.shape == (2,)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    e1 = np.load(os.path.join(default_dir, "losses_ev.npy"))
    e2 = np.load(os.path.join(stream_dir, "losses_ev.npy"))
    np.testing.assert_allclose(e1, e2, rtol=1e-6)


# ---------------------------------------------------------------------------
# Multi-host composition (SURVEY §7.9 x --stream)
# ---------------------------------------------------------------------------

def test_process_local_slices_partition_each_batch():
    """Across all (faked) processes, the per-process slices of every
    global batch concatenate back to exactly that batch."""
    rng = np.random.RandomState(5)
    x = rng.randn(37, 3, 3, 3).astype(np.float32)
    y = rng.randint(0, 9, 37).astype(np.int64)
    perm = rng.permutation(37)
    n_batch, pc = 5, 4

    want = reference_batches(x, y, perm, n_batch)
    got = [list(stream.iter_batches_process_local(
        x, y, perm, n_batch, process_index=pi, process_count=pc))
        for pi in range(pc)]
    for b, (wx, wy) in enumerate(want):
        xs = np.concatenate([got[pi][b][0] for pi in range(pc)])
        ys = np.concatenate([got[pi][b][1] for pi in range(pc)])
        np.testing.assert_array_equal(xs, wx)
        np.testing.assert_array_equal(ys, wy)
        for pi in range(pc):
            assert got[pi][b][2] == len(wy)  # n_global_rows


def test_process_local_single_process_equals_iter_batches():
    rng = np.random.RandomState(6)
    x = rng.randn(20, 2, 2, 3).astype(np.float32)
    y = rng.randint(0, 5, 20).astype(np.int64)
    perm = rng.permutation(20)
    a = list(stream.iter_batches(x, y, perm, 4))
    b = list(stream.iter_batches_process_local(
        x, y, perm, 4, process_index=0, process_count=1))
    assert len(a) == len(b)
    for (ax, ay), (bx, by, ng) in zip(a, b):
        np.testing.assert_array_equal(ax, bx)
        np.testing.assert_array_equal(ay, by)
        assert ng == len(ay)


def test_process_local_shard_rows_keeps_ragged_tail_full():
    """With ``shard_rows`` set (the mesh 'data' axis), batches whose
    global size is a multiple are sliced per process; ragged batches
    arrive IN FULL on every process — they must be replicated, since a
    concrete array cannot take an uneven leading-axis sharding."""
    rng = np.random.RandomState(8)
    n, n_batch, pc, shard = 36, 5, 4, 8  # split sizes: 8,7,7,7,7
    x = rng.randn(n, 2, 2, 3).astype(np.float32)
    y = rng.randint(0, 5, n).astype(np.int64)
    perm = rng.permutation(n)

    want = reference_batches(x, y, perm, n_batch)
    assert [len(wy) for _, wy in want] == [8, 7, 7, 7, 7]
    got = [list(stream.iter_batches_process_local(
        x, y, perm, n_batch, process_index=pi, process_count=pc,
        shard_rows=shard)) for pi in range(pc)]
    for b, (wx, wy) in enumerate(want):
        if len(wy) % shard == 0:  # sliced: concatenation reassembles
            xs = np.concatenate([got[pi][b][0] for pi in range(pc)])
            np.testing.assert_array_equal(xs, wx)
            assert all(len(got[pi][b][1]) == len(wy) // pc
                       for pi in range(pc))
        else:  # ragged: every process already holds the full batch
            for pi in range(pc):
                np.testing.assert_array_equal(got[pi][b][0], wx)
                np.testing.assert_array_equal(got[pi][b][1], wy)
        for pi in range(pc):
            assert got[pi][b][2] == len(wy)


@pytest.mark.slow
def test_stream_mesh_trajectory_matches_default(tmp_path):
    """--stream x --mesh through train_and_evaluate: the process-local
    assembly path produces the same loss trajectory as the default
    HBM-resident path ON THE SAME MESH (same seed, synthetic data).

    The control runs mesh="data=8" too: against a single-device run
    only ~1e-2 agreement is possible (f32 grad-psum reduction order,
    see test_mesh_cli) — holding the mesh fixed isolates exactly what
    this test is about, the streaming assembly path."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
        train_and_evaluate,
    )

    def run(sub, **over):
        np.random.seed(0)  # the driver shuffles via global np.random
        md = str(tmp_path / sub)
        os.makedirs(md, exist_ok=True)
        p = Params(model="cnn", n_classes=43, dropout=0.0, seed=0,
                   train_frac=1.0, recon=True, recon_coef=5e-4,
                   routing_impl="xla", batch_size=8, n_epochs=2,
                   eval_every=1, lr_decay=0.1, lr_runtime=1e-3,
                   mesh="off", scan_epoch="off", summary=False)
        for k, v in over.items():
            setattr(p, k, v)
        train_and_evaluate(p, str(tmp_path / "nodata"), md,
                           no_metric=True, seed=0, progress=False)
        return (np.load(os.path.join(md, "losses_tr.npy")),
                np.load(os.path.join(md, "losses_ev.npy")))

    tr0, ev0 = run("meshonly", mesh="data=8")
    tr1, ev1 = run("streammesh", stream=True, mesh="data=8")
    np.testing.assert_allclose(tr1, tr0, rtol=1e-6)
    np.testing.assert_allclose(ev1, ev0, rtol=1e-6)


def test_process_local_assembles_global_batch_on_mesh():
    """Single-process end-to-end: the local slice feeds
    global_batch_from_process_local and comes back batch-sharded over
    the 8-device mesh with the right global values."""
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.parallel import (
        mesh as par)

    mesh = par.make_mesh()  # all 8 virtual devices on 'data'
    rng = np.random.RandomState(7)
    x = rng.randn(32, 2, 2, 3).astype(np.float32)
    y = rng.randint(0, 5, 32).astype(np.int64)
    perm = rng.permutation(32)
    for xb, yb, n_glob in stream.iter_batches_process_local(
            x, y, perm, 2):
        g = par.global_batch_from_process_local(
            jnp.asarray(xb), mesh, n_global=n_glob)
        assert g.shape[0] == n_glob
        np.testing.assert_allclose(np.asarray(g), xb, rtol=0, atol=0)

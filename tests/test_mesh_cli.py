"""Mesh reachability from the product surface (VERDICT r1 item 2).

The reference is single-device (reference main.py:231); our `--mesh`
flag engages the data-parallel mesh inside the SAME user-facing driver.
These tests run `main.py --mode train` as a subprocess on an 8-device
virtual CPU mesh and assert (a) the mesh path executes, and (b) the
loss trajectory matches the single-device run (the compiled step is
sharding-agnostic; only reduction order differs, so f32 agreement is
tight but not bitwise).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# Full-matrix CLI trainings (subprocess, several minutes each on the
# 1-core box) — nightly tier.  Smoke-tier mesh coverage lives in
# test_parallel.py (step-level) and test_cli.py (CLI surface).
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['main.py'] + %r;"
        "sys.path.insert(0, %r);"
        "import main; main.main()" % (args, REPO)
    )
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture
def model_dirs(tmp_path):
    """Two identical tiny cnn experiment dirs (mesh-off / mesh-on)."""
    dirs = []
    for tag in ("single", "mesh"):
        d = tmp_path / f"cnn_{tag}"
        d.mkdir()
        (d / "params.json").write_text(json.dumps({
            "batch_size": 8, "n_classes": 43, "lr": 1e-3,
            "n_epochs": 3, "dropout": 0.0, "lr_decay": 0.1,
        }))
        dirs.append(str(d))
    return dirs


def test_cli_mesh_trajectory_matches_single_device(model_dirs, tmp_path):
    single_dir, mesh_dir = model_dirs
    cwd = str(tmp_path)

    r1 = _run(["--model", "cnn", "--mode", "train", "--no_metric",
               "--model_dir", single_dir, "--mesh", "off"], cwd=cwd)
    assert r1.returncode == 0, r1.stderr[-2000:]

    r2 = _run(["--model", "cnn", "--mode", "train", "--no_metric",
               "--model_dir", mesh_dir, "--mesh", "data=8"], cwd=cwd)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "[mesh] data=8 model=1" in r2.stdout, r2.stdout[-2000:]

    l1 = np.load(os.path.join(single_dir, "losses_tr.npy"))
    l2 = np.load(os.path.join(mesh_dir, "losses_tr.npy"))
    assert l1.shape == l2.shape == (3,)
    # Identical synthetic data + init + shuffles; the runs differ only
    # in f32 reduction order (grad psum / per-device conv batching).
    # Adam's early steps behave like sign(g), so ~1e-7 grad noise on
    # near-zero elements flips to +-lr-sized weight deltas — 1e-2
    # relative loss agreement over epochs is the realistic f32 band.
    # Step-level EXACT parity (f64, machine epsilon) is proven in
    # test_parallel.py::test_dp_train_step_matches_single_device.
    np.testing.assert_allclose(l1, l2, rtol=1e-2)

    e1 = np.load(os.path.join(single_dir, "losses_ev.npy"))
    e2 = np.load(os.path.join(mesh_dir, "losses_ev.npy"))
    np.testing.assert_allclose(e1, e2, rtol=1e-2)


def test_cli_mesh_model_axis_shards_routing(tmp_path):
    """--mesh data=4,model=2 engages tensor-sharded routing for the
    capsule model through the product CLI (step-level numerical parity
    of the sharded routing is proven in test_parallel.py)."""
    d = tmp_path / "capsule_tp"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "batch_size": 8, "n_classes": 43, "lr": 1e-3,
        "n_epochs": 1, "dropout": 0.0, "lr_decay": 0.1,
    }))
    r = _run(["--model", "capsule", "--mode", "train", "--no_metric",
              "--train_frac", "0.05", "--model_dir", str(d),
              "--mesh", "data=4,model=2"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[mesh] data=4 model=2 (routing sharded: True)" in r.stdout, (
        r.stdout[-2000:])
    losses = np.load(os.path.join(str(d), "losses_tr.npy"))
    assert losses.shape == (1,) and np.isfinite(losses).all()


def test_cli_mesh_composes_with_bf16(model_dirs, tmp_path):
    """--mesh data=8 x --dtype bfloat16: the pod user's flag pair.
    bf16 step numerics vs f32 are banded in test_bf16_training.py; here
    the composition must execute through the CLI and still learn."""
    _, mesh_dir = model_dirs
    r = _run(["--model", "cnn", "--mode", "train", "--no_metric",
              "--model_dir", mesh_dir, "--mesh", "data=8",
              "--dtype", "bfloat16"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[mesh] data=8 model=1" in r.stdout, r.stdout[-2000:]
    losses = np.load(os.path.join(mesh_dir, "losses_tr.npy"))
    assert losses.shape == (3,) and np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cli_mesh_composes_with_remat(tmp_path):
    """--mesh data=8 x --remat on a detector (remat's target model
    family; gradient bit-equality vs plain is pinned in test_remat.py).
    224px/g=7 keeps the CPU cost testable — same stride-32 relation as
    the reference's 448/14 (reference config.py:40-41)."""
    d = tmp_path / "dr_remat"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "batch_size": 8, "n_classes": 43, "lr": 1e-4, "n_epochs": 1,
        "dropout": 0.0, "lr_decay": 0.1, "l_coord": 5, "l_noobj": 0.5,
        "n_boxes": 1, "darknet_input": 224, "n_grid": 7,
    }))
    r = _run(["--model", "darknet_r", "--mode", "train", "--no_metric",
              "--train_frac", "0.05", "--model_dir", str(d),
              "--mesh", "data=8", "--remat"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[mesh] data=8 model=1" in r.stdout, r.stdout[-2000:]
    losses = np.load(os.path.join(str(d), "losses_tr.npy"))
    assert losses.shape == (1,) and np.isfinite(losses).all()


def test_cli_mesh_auto_engages_on_multidevice(model_dirs, tmp_path):
    """Default --mesh auto picks up all local devices."""
    _, mesh_dir = model_dirs
    r = _run(["--model", "cnn", "--mode", "train", "--no_metric",
              "--model_dir", mesh_dir], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[mesh] data=8 model=1" in r.stdout, r.stdout[-2000:]
    assert "epoch 1" in r.stdout


def test_cli_predict_under_mesh_matches_single_device(tmp_path):
    """--mode predict --mesh data=8 (VERDICT r3 item 5): weights are
    replicated, the batch is sharded, and there is NO cross-device
    reduction anywhere in the serving path — so the detect metrics must
    equal the single-device predict BYTE-for-byte, not just within a
    band (predict.py:57-59, _batched_forward)."""
    d = tmp_path / "dr_pmesh"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "batch_size": 8, "n_classes": 43, "lr": 1e-3, "n_epochs": 1,
        "dropout": 0.0, "lr_decay": 0.1, "l_coord": 5, "l_noobj": 0.5,
        "n_boxes": 1, "darknet_input": 64, "n_grid": 2,
    }))
    cwd = str(tmp_path)
    r = _run(["--model", "darknet_r", "--mode", "train", "--no_metric",
              "--model_dir", str(d), "--mesh", "off"], cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]

    def read_metrics():
        with open(os.path.join(str(d), "metric_output.txt")) as f:
            return f.read()

    r1 = _run(["--model", "darknet_r", "--mode", "predict",
               "--restore", "last", "--model_dir", str(d),
               "--mesh", "off"], cwd=cwd)
    assert r1.returncode == 0, r1.stderr[-2000:]
    single = read_metrics()
    assert "detect_AP" in single and "detect_acc" in single

    r2 = _run(["--model", "darknet_r", "--mode", "predict",
               "--restore", "last", "--model_dir", str(d),
               "--mesh", "data=8"], cwd=cwd)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert read_metrics() == single

"""CLI surface smoke tests (subprocess, CPU, synthetic data).

Drives `python main.py` exactly as a user would: train + overfit modes
with a tiny custom model_dir, plus the argument-error paths.  The
heavier detector/predict CLI paths run on TPU via scripts/smoke_e2e.sh.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # honored? axon overrides; force via -c
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['main.py'] + %r;"
        "sys.path.insert(0, %r);"
        "import main; main.main()" % (args, REPO)
    )
    return subprocess.run([sys.executable, "-c", code], cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.fixture
def tiny_model_dir(tmp_path):
    d = tmp_path / "cnn_tiny"
    d.mkdir()
    (d / "params.json").write_text(json.dumps({
        "batch_size": 8, "n_classes": 43, "lr": 1e-3,
        "n_epochs": 1, "dropout": 0.0, "lr_decay": 0.1,
    }))
    return str(d)


def test_load_params_plumbs_cli_flags(tiny_model_dir):
    """Every CLI flag that load_params forwards lands on the Params
    object (in-process; the subprocess tests cover end-to-end use).
    Includes the reference quirks: --recon_coef arrives as str and is
    coerced (COMPAT.md #2), the optimizer lr comes from --lr only."""
    import main as cli_main

    args = cli_main.parser.parse_args([
        "--model", "cnn", "--mode", "train", "--recon_coef", "7e-4",
        "--lr", "3e-3", "--ckpt_every", "4", "--mesh", "off",
        "--dtype", "bfloat16", "--scan_epoch", "off", "--stream",
        "--remat", "--async_ckpt", "--routing", "xla",
    ])
    p = cli_main.load_params(tiny_model_dir, args, with_writer=False)
    assert p.recon_coef == 7e-4 and isinstance(p.recon_coef, float)
    assert p.lr_runtime == 3e-3
    assert p.ckpt_every == 4
    assert p.mesh == "off" and p.compute_dtype == "bfloat16"
    assert p.scan_epoch == "off" and p.stream and p.remat
    assert p.async_ckpt and p.routing_impl == "xla"


def test_cli_train_and_restore(tiny_model_dir, tmp_path):
    cwd = str(tmp_path)
    r = _run(["--model", "cnn", "--mode", "train", "--no_metric",
              "--model_dir", tiny_model_dir], cwd=cwd)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 1" in r.stdout
    assert os.path.exists(tiny_model_dir + "1/last.ckpt")

    # restore + continue training (reference --restore last surface)
    r2 = _run(["--model", "cnn", "--mode", "train", "--no_metric",
               "--model_dir", tiny_model_dir, "--restore", "last"],
              cwd=cwd)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Restoring parameters from" in r2.stdout


def test_cli_bad_model(tmp_path):
    r = _run(["--model", "nope"], cwd=str(tmp_path))
    assert "Did not recognize model" in r.stdout


def test_cli_predict_requires_restore(tiny_model_dir, tmp_path):
    r = _run(["--model", "cnn", "--mode", "predict",
              "--model_dir", tiny_model_dir], cwd=str(tmp_path))
    assert "Must give restore file" in r.stdout


def test_cli_overfit_mode(tiny_model_dir, tmp_path):
    """Overfit mode: dataset absent -> synthetic small set, full loop."""
    r = _run(["--model", "cnn", "--mode", "overfit", "--no_metric",
              "--model_dir", tiny_model_dir], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "epoch 1" in r.stdout

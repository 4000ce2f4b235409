"""Unit tests for the L6 analysis/experiment scripts.

Covers SURVEY §2.1 rows 32-34: the ablation sweep driver
(grid_search_class.py), the history viewer (experiments/plot_loss.py),
and the capsule interpretability sweep (capsule_interpret.py) — all
rebuilt in this repo's idiom (reference grid_search_class.py:1-11,
experiments/plot_loss.py:1-18, capsule_interpret.py:54-68).
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- plot_loss


@pytest.fixture(scope="module")
def plot_loss():
    return _load("experiments/plot_loss.py", "plot_loss_script")


def test_load_histories_collects_existing_files(tmp_path, plot_loss):
    np.save(tmp_path / "losses_tr.npy", np.array([3.0, 2.0, 1.0]))
    np.save(tmp_path / "metrics_ev.npy", np.array([0.1, 0.4]))
    h = plot_loss.load_histories(str(tmp_path))
    assert set(h) == {"losses_tr", "metrics_ev"}
    np.testing.assert_array_equal(h["losses_tr"], [3.0, 2.0, 1.0])


def test_summarize_reports_min_for_losses_max_for_metrics(plot_loss):
    lines = plot_loss.summarize({
        "losses_tr": np.array([3.0, 1.0, 2.0]),
        "metrics_ev": np.array([0.1, 0.5, 0.3]),
    })
    joined = "\n".join(lines)
    assert "losses_tr: 3 epochs, min=1 @ epoch 1" in joined
    assert "metrics_ev: 3 epochs, max=0.5 @ epoch 1" in joined


def test_plot_loss_main_saves_figure(tmp_path, plot_loss, capsys):
    np.save(tmp_path / "losses_tr.npy", np.array([3.0, 2.0]))
    np.save(tmp_path / "losses_ev.npy", np.array([3.5, 2.5]))
    out = tmp_path / "fig.png"
    plot_loss.main([str(tmp_path), "--out", str(out), "--log"])
    assert out.exists() and out.stat().st_size > 0
    assert "losses_tr" in capsys.readouterr().out


def test_plot_loss_main_errors_on_empty_dir(tmp_path, plot_loss):
    with pytest.raises(SystemExit):
        plot_loss.main([str(tmp_path)])


# ---------------------------------------------------------- grid_search


@pytest.fixture(scope="module")
def grid_search():
    return _load("grid_search_class.py", "grid_search_script")


def _stub_main(tmp_path, rc=0):
    """A fake main.py that records its argv as JSON lines."""
    (tmp_path / "main.py").write_text(
        "import json, sys\n"
        "with open('calls.jsonl', 'a') as f:\n"
        "    f.write(json.dumps(sys.argv[1:]) + '\\n')\n"
        f"sys.exit({rc})\n")


def test_sweep_runs_each_model_frac_combination(tmp_path, monkeypatch,
                                                grid_search):
    _stub_main(tmp_path)
    monkeypatch.chdir(tmp_path)
    results = grid_search.sweep(["cnn", "capsule"], [0.5, 1.0],
                                extra_args=("--no_metric",))
    assert [rc for _, rc in results] == [0, 0, 0, 0]
    calls = [json.loads(l) for l in
             (tmp_path / "calls.jsonl").read_text().splitlines()]
    assert len(calls) == 4
    assert calls[0] == ["--model", "cnn", "--train_frac", "0.5",
                        "--no_metric"]
    assert calls[-1] == ["--model", "capsule", "--train_frac", "1.0",
                         "--no_metric"]


def test_sweep_stop_on_error_halts(tmp_path, monkeypatch, grid_search):
    _stub_main(tmp_path, rc=3)
    monkeypatch.chdir(tmp_path)
    results = grid_search.sweep(["cnn"], [0.5, 1.0], stop_on_error=True)
    assert len(results) == 1 and results[0][1] == 3


def test_grid_search_main_exit_code_reflects_failures(tmp_path, monkeypatch,
                                                      grid_search, capsys):
    _stub_main(tmp_path)
    monkeypatch.chdir(tmp_path)
    rc = grid_search.main(["--models", "cnn", "--fracs", "1.0"])
    assert rc == 0
    assert "1/1 runs succeeded" in capsys.readouterr().out


# ------------------------------------------------------ capsule_interpret


@pytest.mark.slow
def test_capsule_interpret_writes_perturbation_grids(tmp_path, monkeypatch):
    interpret = _load("capsule_interpret.py", "capsule_interpret_script")
    exp = tmp_path / "capsule"
    exp.mkdir()
    (exp / "params.json").write_text(json.dumps({
        "batch_size": 4, "n_classes": 43, "lr": 1e-3,
        "n_epochs": 1, "dropout": 0.0, "lr_decay": 0.1,
    }))
    monkeypatch.chdir(tmp_path)
    # no checkpoint in model_dir -> random-init path (prints a notice)
    interpret.main(sample_index=1, model_dir=str(exp))
    assert (tmp_path / "img" / "orig.png").exists()
    # 16 dims x 11 steps
    pngs = [p for p in (tmp_path / "img").iterdir()
            if p.name != "orig.png"]
    assert len(pngs) == 16 * 11

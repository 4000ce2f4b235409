"""Viewer for the per-epoch history arrays written by train_and_evaluate.

The trainer appends ``losses_tr/ev.npy`` and ``metrics_tr/ev.npy`` under the
experiment directory (same artifact names as the reference driver,
main.py:208-214); this CLI summarizes them and renders a labeled figure.

Usage::

    python experiments/plot_loss.py experiments/capsule [--out fig.png] [--log]

Unlike the reference's viewer this one takes argparse options, plots the
metric curves alongside the losses, and saves to a file when ``--out`` is
given (this box is headless, so an interactive ``show()`` would be useless).
"""

import argparse
from pathlib import Path

import numpy as np


def load_histories(exp_dir):
    """Return {name: 1-D array} for every history file present in exp_dir."""
    out = {}
    for name in ("losses_tr", "losses_ev", "metrics_tr", "metrics_ev"):
        path = Path(exp_dir) / f"{name}.npy"
        if path.exists():
            out[name] = np.asarray(np.load(path)).ravel()
    return out


def summarize(histories):
    lines = []
    for name, arr in sorted(histories.items()):
        if arr.size == 0:
            lines.append(f"{name}: empty")
            continue
        kind = "loss" if name.startswith("losses") else "metric"
        best = arr.min() if kind == "loss" else arr.max()
        word = "min" if kind == "loss" else "max"
        lines.append(
            f"{name}: {arr.size} epochs, {word}={best:.6g} @ epoch"
            f" {int(arr.argmin() if kind == 'loss' else arr.argmax())},"
            f" last={arr[-1]:.6g}"
        )
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("exp_dir", help="experiment dir holding losses_*.npy / metrics_*.npy")
    ap.add_argument("--out", default=None, help="save the figure here instead of showing it")
    ap.add_argument("--log", action="store_true", help="log-scale the loss axis")
    args = ap.parse_args(argv)

    histories = load_histories(args.exp_dir)
    if not histories:
        ap.error(f"no history .npy files found under {args.exp_dir}")
    for line in summarize(histories):
        print(line)

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    have_metrics = any(k.startswith("metrics") for k in histories)
    fig, axes = plt.subplots(1, 2 if have_metrics else 1, figsize=(10, 4))
    axes = np.atleast_1d(axes)

    for name in ("losses_tr", "losses_ev"):
        if name in histories:
            axes[0].plot(histories[name], label={"losses_tr": "train", "losses_ev": "eval"}[name])
    axes[0].set_xlabel("epoch")
    axes[0].set_ylabel("loss")
    if args.log:
        axes[0].set_yscale("log")
    axes[0].legend()
    axes[0].set_title("loss")

    if have_metrics:
        for name in ("metrics_tr", "metrics_ev"):
            if name in histories:
                axes[1].plot(
                    histories[name], label={"metrics_tr": "train", "metrics_ev": "eval"}[name]
                )
        axes[1].set_xlabel("epoch")
        axes[1].set_ylabel("metric")
        axes[1].legend()
        axes[1].set_title("metric")

    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=120)
        print(f"saved {args.out}")
    else:
        plt.show()


if __name__ == "__main__":
    main()

"""Train-fraction ablation sweep over the classification models.

Runs ``main.py --mode train`` once per (model, train_frac) combination via
subprocess, mirroring the reference's ablation harness (reference
grid_search_class.py:1-11) but with a configurable model list, fraction
range, pass-through args, and a fail-fast option.

Usage::

    python grid_search_class.py                        # capsule, fracs .1..1.0
    python grid_search_class.py --models cnn capsule --fracs 0.25 0.5 1.0
    python grid_search_class.py -- --eval_every 5      # extra main.py flags
"""

import argparse
import subprocess
import sys


def sweep(models, fracs, extra_args=(), stop_on_error=False, python=sys.executable):
    """Run the sweep; returns the list of (cmd, returncode)."""
    results = []
    for model in models:
        for frac in fracs:
            cmd = [python, "main.py", "--model", model, "--train_frac", str(frac)]
            cmd += list(extra_args)
            print("[grid_search] running:", " ".join(cmd), flush=True)
            rc = subprocess.run(cmd).returncode
            results.append((cmd, rc))
            if rc != 0:
                print(f"[grid_search] FAILED (rc={rc}): {' '.join(cmd)}", file=sys.stderr)
                if stop_on_error:
                    return results
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models", nargs="+", default=["capsule"])
    ap.add_argument(
        "--fracs",
        nargs="+",
        type=float,
        default=[round(0.1 * i, 1) for i in range(1, 11)],
    )
    ap.add_argument("--stop-on-error", action="store_true")
    ap.add_argument("extra", nargs="*", help="extra flags passed through to main.py (after --)")
    args = ap.parse_args(argv)

    results = sweep(args.models, args.fracs, args.extra, args.stop_on_error)
    failed = [(c, rc) for c, rc in results if rc != 0]
    print(f"[grid_search] {len(results) - len(failed)}/{len(results)} runs succeeded")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())

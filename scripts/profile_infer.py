"""Attempt a device profile of the serving pipeline.

jax.profiler.trace may or may not be supported over the tunneled
backend; if it works, the trace lands under /tmp/cyt_trace (inspect
with TensorBoard elsewhere) and this script prints the captured file
list.  Falls back gracefully with a clear message if the profiler is
unavailable — the analytic MFU path (scripts/mfu.py) is the reliable
alternative in this environment.
"""

import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))  # _serving_prof


def main():
    import jax
    import jax.numpy as jnp

    import _serving_prof

    batch, size = 128, 448
    dtype = os.environ.get("PROF_DTYPE", "bfloat16")
    print(f"[profile] serving dtype: {dtype}", file=sys.stderr)
    step_fn, variables, x_dtype = _serving_prof.build(dtype, batch, size)
    step = jax.jit(step_fn)

    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, size, size, 3).astype(np.float32)).astype(x_dtype)
    print("warmup:", float(step(variables, x)), file=sys.stderr)

    out = "/tmp/cyt_trace"
    try:
        with jax.profiler.trace(out):
            for _ in range(3):
                v = step(variables, x)
            print("traced:", float(v), file=sys.stderr)
        files = glob.glob(os.path.join(out, "**", "*"), recursive=True)
        print("trace files:", len(files))
        for f in sorted(files)[-10:]:
            print(" ", f, os.path.getsize(f) if os.path.isfile(f) else "dir")
    except Exception as e:
        print(f"profiler unavailable on this backend: "
              f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

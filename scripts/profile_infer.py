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


def main():
    import jax
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import decode

    batch, size = 128, 448
    model = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def step(variables, x):
        y = model.apply(variables, x.astype(jnp.bfloat16),
                        train=False).astype(jnp.float32)
        g = size // 32
        d = decode.decode_grid(y, n_classes=43, n_boxes=1, img_size=size,
                               max_boxes=g * g, conf_th=0.5)
        return jnp.sum(d["conf"]) + jnp.sum(d["xy"])

    x = jnp.asarray(np.random.RandomState(0).rand(
        batch, size, size, 3).astype(np.float32)).astype(jnp.bfloat16)
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

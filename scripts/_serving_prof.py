"""Shared serving-program builder for the profiler pair.

scripts/profile_infer.py (captures the device trace) and
scripts/profile_report.py (joins the trace with the optimized HLO)
must build the IDENTICAL program or the join misattributes ops — so
the step construction lives here once.  PROF_DTYPE selects the
pipeline: 'bfloat16' (default serving path) or 'int8' (the
int8-resident chain, the fastest measured serving path — BASELINE.md).
Mirrors bench.py's step semantics exactly.
"""

import numpy as np


def build(dtype="bfloat16", batch=128, size=448):
    """Returns (step_fn, variables, x_dtype) for the serving profile."""
    if dtype not in ("bfloat16", "int8"):
        raise ValueError(
            f"PROF_DTYPE={dtype!r}: profile either 'bfloat16' (default "
            "serving path) or 'int8' (the int8-resident chain)")
    import jax
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import decode

    model = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    g = size // 32

    def _decode_sum(y):
        d = decode.decode_grid(y, n_classes=43, n_boxes=1, img_size=size,
                               max_boxes=g * g, conf_th=0.5)
        return jnp.sum(d["conf"]) + jnp.sum(d["xy"])

    if dtype == "int8":
        from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant

        cal = jnp.asarray(np.random.RandomState(0).rand(
            min(batch, 32), size, size, 3).astype(np.float32))
        variables = quant.quantize_darknet(variables, x_cal=cal)

        def step(v, x):
            y = quant.darknet_int8_resident_apply(
                v, x.astype(jnp.float32), n_boxes=1, n_classes=43)
            return _decode_sum(y.astype(jnp.float32))

        return step, variables, jnp.float32

    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, variables)

    def step(v, x):
        y = model.apply(v, x.astype(jnp.bfloat16),
                        train=False).astype(jnp.float32)
        return _decode_sum(y)

    return step, variables, jnp.bfloat16

"""Fused 2x2 max-pool + LeakyReLU Pallas kernel.

The serving profile (BASELINE.md) shows XLA computing
pool2x2(leaky(conv)) as reduce-window + a SEPARATE elementwise
select pass at the pooled resolution — a full extra HBM round trip per
pool stage (~3 ms/step at batch 128).  Since LeakyReLU is monotone,
pool(leaky(x)) == leaky(pool(x)); this kernel reads the conv output
once, reduces the 2x2 window and applies the leaky slope in VMEM, and
writes only the pooled tensor — the minimum possible IO for the stage.

Exact math parity with `max_pool(leaky_relu(x))` is pinned in
tests/test_pool_pallas.py; CPU tests run the Pallas interpreter
(same convention as ops/routing_pallas.py).

MEASURED OUTCOME (chip, bf16 batch 128 — BASELINE.md): engaging this
kernel in the serving pipeline LOSES to plain XLA (2576 vs 4500-4683
img/s e2e).  The un-pooled conv output must still be written to HBM
for the kernel to read (Pallas can't fuse into XLA's conv), so the
round trip this kernel saves is replaced by its own block traffic,
and the small ≤8-row blocks (forced by the 16 MB scoped-VMEM limit at
c=64, w=224) pipeline worse than XLA's fused reduce-window.  Kept
opt-in (BENCH_SERVING=fused) as the measured record; parity-tested.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pool_leaky_kernel(x_ref, o_ref, *, slope, rows, wo, c):
    # x arrives pre-reshaped (in XLA, a free row-major view) as
    # (1, 2*rows, wo, 2, c): the column parity is its own small axis,
    # so both pool maxima are plain axis reduces — no strided slices
    # (unsupported gathers) and no tiled-dim shape casts (unsupported
    # layout inference) inside the kernel.
    x = x_ref[0]                        # (2*rows, wo, 2, c)
    x = x.reshape(rows, 2, wo, 2, c)    # leading-dim split only
    m = jnp.max(x, axis=1)              # (rows, wo, 2, c)
    m = jnp.max(m, axis=2)              # (rows, wo, c)
    # leaky(x) == max(x, slope*x) for 0 < slope < 1: comparison-free
    # (Mosaic rejects bf16 compare+select on this target)
    y = jnp.maximum(m, m * slope)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_block_rows(ho):
    # largest divisor of the pooled height that keeps the kernel's
    # padded VMEM temporaries (the parity axis tiles 2 -> 8 sublanes)
    # inside the 16 MB scoped budget
    for r in (8, 7, 4, 2, 1):
        if ho % r == 0:
            return r
    return 1


@functools.partial(jax.jit, static_argnames=("negative_slope", "interpret"))
def maxpool2_leaky(x, negative_slope=0.1, interpret=None):
    """leaky(max_pool_2x2(x)) == max_pool_2x2(leaky(x)), one pass.

    x: [B, H, W, C] with H, W even.  Output [B, H//2, W//2, C] in
    x.dtype.  Falls back to the interpreter off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    ho, wo = h // 2, w // 2
    rows = _pick_block_rows(ho)

    kernel = functools.partial(
        _pool_leaky_kernel, slope=negative_slope, rows=rows, wo=wo, c=c)
    xv = x.reshape(b, h, wo, 2, c)  # free row-major view
    return pl.pallas_call(
        kernel,
        grid=(b, ho // rows),
        in_specs=[pl.BlockSpec(
            (1, 2 * rows, wo, 2, c),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, rows, wo, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, c), x.dtype),
        interpret=interpret,
    )(xv)

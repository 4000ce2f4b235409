"""Fused serving input stage: space-to-depth conv1 + in-channel pooling.

The profiled serving bottleneck (BASELINE.md) is the input stage:
conv1 448^2 x (3->32) runs at ~8% MFU (contraction depth 3*3*3=27 pads
the 128-lane MXU) and writes a 1.6 GB pre-pool tensor that maxpool1
immediately re-reads.  This module rewrites the stage EXACTLY:

    pool2x2(leaky(BN(conv3x3(x))))
  = leaky(max_{4 phases} conv3x3_s2d(space_to_depth(x)))

Each pooled output pixel is the max of 4 stride-1 conv outputs (the
2x2 pool window).  On the space-to-depth image (448^2 x 3 ->
224^2 x 12) each of those 4 "phase" convolutions is a 3x3 conv with a
rearranged, zero-padded kernel; stacking the 4 phases along output
channels gives ONE conv [3,3,12,4*32] with contraction depth 108 —
84% MXU lane utilization instead of 21% — whose output reduces to the
pooled result with a channel-group max.  LeakyReLU commutes with max
(monotone), so it is applied after.  BN is folded into the conv
(ops/quant.fold_darknet).  Bit-for-bit the same function class as the
model's first block; parity pinned in tests/test_input_stage.py.

The reference has no counterpart (torch conv1 + MaxPool2d,
reference models.py:132-137); this is a TPU-specific serving rewrite,
engaged opt-in by the bench/serving path (BENCH_SERVING).

MEASURED OUTCOME (chip captures, bf16 batch 128 — see BASELINE.md):
the plain XLA model path wins.  model 4602-4683 img/s; s2d (this
module's XLA formulation) 4500; s2d + Pallas pool 2576; full Pallas
input-stage kernel (input_stage_pallas) 109.  XLA's conv1+pool
compilation is already within ~2% of the hand rewrites' best, and the
Pallas variants lose to block re-fetch overlap + VPU relayout costs.
The module stays as the measured record and as the BN-folding serving
utility (prepare_serving); all modes remain parity-tested.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.darknet import DARKNET_LAYERS
from . import quant


def space_to_depth(x):
    """[B, 2H, 2W, C] -> [B, H, W, 4C]; channel order (a, b, c) =
    (row phase, col phase, original channel)."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, w, a, b2, c
    return x.reshape(b, h, w, 4 * c)


def _tap_split(t):
    """Map a full-resolution tap offset t = d + u - 1 (d: pool phase,
    u: kernel tap, both 0-based) onto (s2d spatial offset r in 0..2,
    within-pixel phase a in 0..1): t = 2*(r - 1) + a."""
    r = (t + 2) // 2
    a = t - 2 * (r - 1)
    return r, a


def phase_kernel(w, bias):
    """Rearrange a [3,3,Cin,Cout] kernel into the s2d phase-stacked
    form [3,3,4*Cin,4*Cout] plus the phase-stacked bias [4*Cout].

    Output channel m = phase*Cout + cout where phase = 2*di + dj is
    the pool-window position; s2d input channel = (2*a + b)*Cin + c.
    """
    w = np.asarray(w)
    bias = np.asarray(bias)
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            phase = 2 * di + dj
            for u in range(3):
                r, a = _tap_split(di + u - 1)
                for v in range(3):
                    s, b = _tap_split(dj + v - 1)
                    wp[r, s, (2 * a + b) * cin:(2 * a + b + 1) * cin,
                       phase * cout:(phase + 1) * cout] += w[u, v]
    bp = np.tile(bias, 4)
    return jnp.asarray(wp), jnp.asarray(bp)


def input_stage_apply(x, wp, bp, n_out, negative_slope=0.1):
    """leaky(max over phases of conv_s2d(x)) — the fused input stage.

    x: [B, 2H, 2W, C] raw input; wp/bp from `phase_kernel`.
    Returns [B, H, W, n_out], exactly pool2x2(leaky(conv(x) + bias)).
    """
    xs = space_to_depth(x)
    y = jax.lax.conv_general_dilated(
        xs, wp.astype(xs.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bp.astype(y.dtype)
    b, h, w, _ = y.shape
    y = jnp.max(y.reshape(b, h, w, 4, n_out), axis=3)
    return jax.nn.leaky_relu(y, negative_slope)


def _s2d_rows_pad(x):
    """[B, 2H, 2W, C] -> row-major padded s2d image [B, H+2, 4C, W+2]
    (one zero ring on the spatial dims = the conv's (1,1) padding).

    The s2d channel axis sits at position 2 so the kernel's
    overlapping row window (an Element-indexed BlockSpec dim) is NOT
    one of the last two dims — Mosaic requires those to be 8/128
    aligned or full-size, which an overlap window can't satisfy."""
    xs = space_to_depth(x)
    xs = jnp.transpose(xs, (0, 1, 3, 2))               # (B, H, 4C, W)
    return jnp.pad(xs, ((0, 0), (1, 1), (0, 0), (1, 1)))


def _input_stage_kernel(x_ref, w_ref, b_ref, o_ref, *, rows, n_out, w):
    """One (image, row-tile) per program; rows are statically unrolled.

    Per row: gather the 9 taps (each a (12, w) slice), merge them into
    a (108, w) patch (a leading+sublane merge Mosaic supports), run ONE
    K=108 matmul against the phase-stacked kernel, phase-max + leaky,
    store the pooled row.  Everything is static — Mosaic on this chip
    rejects dot/stack bodies under dynamically-indexed slices (probed:
    fori/program_id row variants crash the remote compiler; the static
    body compiles).

    x_ref: (1, rows+2, 12, w+2) bf16 (Element-indexed overlapping row
    window on dim 1);  w_ref: (4*n_out, 108) bf16;  b_ref:
    (4*n_out, 1) f32;  o_ref: (1, rows, n_out, w) row-major tile.
    """
    for r in range(rows):
        taps = [x_ref[0, r + u, :, pl.ds(v, w)]
                for u in range(3) for v in range(3)]   # 9 x (12, w)
        patch = jnp.stack(taps, axis=0).reshape(9 * 12, w)
        acc = jax.lax.dot_general(
            w_ref[:], patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (4*n_out, w)
        acc = acc + b_ref[:]
        m = jnp.max(acc.reshape(4, n_out, w), axis=0)  # (n_out, w)
        # leaky(x) == max(x, slope*x) for 0 < slope < 1: comparison-
        # free (Mosaic rejects bf16 compare+select on this target)
        y = jnp.maximum(m, m * 0.1)
        o_ref[0, r] = y.astype(o_ref.dtype)


def input_stage_pallas(x, wp, bp, n_out=32, rows=8, interpret=None):
    """Pallas fused input stage: phase convs + in-VMEM pooling.

    Same math as `input_stage_apply` but the 4-phase accumulators
    never leave VMEM — the kernel writes ONLY the pooled tensor
    (0.41 GB instead of the 1.6 GB pre-pool intermediate that makes
    conv1 + pool1 the profiled bandwidth bottleneck, BASELINE.md).
    The kernel emits channels-first tiles (the row matmul's natural
    layout); one XLA transpose restores NHWC for conv2.
    """
    import functools

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    assert h % rows == 0, (h, rows)
    xs = _s2d_rows_pad(x.astype(jnp.bfloat16))    # (B, h+2, 12, w+2)
    # (3,3,12,4n) -> (108, 4n) flattened tap-major -> (4n, 108)
    wt = jnp.asarray(wp).reshape(9 * 4 * c, 4 * n_out).T
    wt = wt.astype(jnp.bfloat16)
    bt = jnp.asarray(bp, jnp.float32).reshape(4 * n_out, 1)

    kernel = functools.partial(
        _input_stage_kernel, rows=rows, n_out=n_out, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[
            # overlapping row window lives on dim 1 (Element-indexed);
            # the last two block dims (12, w+2) are full-size, which
            # Mosaic accepts unconditionally.  Mosaic requires ALL
            # dims of a spec to be Element once one is, so the rest
            # are Element too (with block-index -> element-offset
            # conversion in the index map).
            pl.BlockSpec((pl.Element(1), pl.Element(rows + 2),
                          pl.Element(4 * c), pl.Element(w + 2)),
                         lambda i, j: (i, j * rows, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_out, 9 * 4 * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_out, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, n_out, w),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n_out, w), jnp.bfloat16),
        interpret=interpret,
    )(xs, wt, bt)
    return jnp.transpose(out, (0, 1, 3, 2))       # NHWC for conv2


def prepare_serving(variables, fuse_input=True, eps=1e-5):
    """Fold BN and (optionally) build the phase-stacked input kernel.

    Returns an arrays-only pytree for `darknet_serving_apply` — the
    host-side numpy rearrangement in `phase_kernel` happens here, not
    under jit.
    """
    layers, head = quant.fold_darknet(variables, eps)
    p = {"layers": layers, "head": head}
    if fuse_input:
        wp, bp = phase_kernel(layers[0]["w"], layers[0]["b"])
        p["wp"], p["bp"] = wp, bp
    return p


def darknet_serving_apply(p, x, *, n_boxes, n_classes,
                          dtype=jnp.bfloat16, pallas_pool=False,
                          pallas_input=False):
    """BN-folded serving forward, jit-friendly.

    `p` from `prepare_serving`.  When p carries the phase kernel
    ("wp"/"bp"), the first conv+pool pair runs via the space-to-depth
    rewrite; otherwise this is quant.darknet_folded_apply in `dtype`.
    With pallas_pool=True the remaining pool stages run through the
    fused max-pool+leaky kernel (ops/pool_pallas.py) — one HBM pass
    instead of reduce-window + a separate elementwise select (exact by
    monotonicity: pool(leaky(x)) == leaky(pool(x))).  Heads
    (sigmoid/softmax) stay f32.
    """
    from . import pool_pallas

    layers, head = p["layers"], p["head"]
    x = x.astype(dtype)
    start = 0
    if "wp" in p:
        assert DARKNET_LAYERS[0][2] == "mp"
        if pallas_input:
            # fused kernel: phase accumulators never leave VMEM
            x = input_stage_pallas(x, p["wp"], p["bp"], 32).astype(dtype)
        else:
            x = input_stage_apply(x, p["wp"].astype(dtype), p["bp"], 32)
        start = 1
    for (feats, k, after), L in list(
            zip(DARKNET_LAYERS, layers))[start:]:
        x = quant._conv(x, L["w"].astype(dtype), k) + L["b"].astype(dtype)
        if after == "mp" and pallas_pool:
            x = pool_pallas.maxpool2_leaky(x, 0.1)
            continue
        x = jax.nn.leaky_relu(x, 0.1)
        if after == "mp":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
    out = quant._conv(x, head.astype(dtype), 1).astype(jnp.float32)
    return quant._head(out, n_boxes, n_classes)

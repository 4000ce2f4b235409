"""Fused Pallas TPU kernel for capsule dynamic routing.

The XLA path (ops.capsule.dynamic_routing) materializes the priors
tensor (B, N, K, D) in HBM and re-reads it from HBM in every routing
iteration (probs*priors contraction + agreement update) — ~5 full
passes of HBM traffic for 3 iterations.  This kernel loads each batch
element's priors into VMEM ONCE and runs all iterations on-chip:
softmax over capsules, weighted node-sum, squash, and the agreement
logit update never touch HBM.

Layout: priors are produced directly in a lane-friendly transposed
layout (B, K*D, N) — capsule-major rows, nodes on the 128-wide lane
axis — by fusing the transpose into the votes einsum.  K is padded so
K*D is a multiple of 8 sublanes and N to a multiple of 128 lanes.
Per-capsule reductions over the D sub-rows use a small constant
group-sum matmul (MXU) instead of sublane reshapes.

Reference numerics: models.py:64-79 (squash + 3-iteration routing,
softmax over the output-capsule dim).  Parity is tested against the
XLA path in tests/test_pallas_routing.py.

The op is differentiable via custom_vjp with a second fused kernel for
the backward pass (`_routing_bwd_kernel`): it recomputes the routing
iterations in VMEM and emits d(priors) in one pass; the chain to
dx/d(route_weights) is the two-einsum VJP of the votes matmul.  Grad
parity vs the XLA path is tested in tests/test_pallas_routing.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .capsule import compute_priors, dynamic_routing

_NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _routing_kernel(priors_ref, out_ref, *, n_iter, K, D, K_pad, N):
    """One batch element: priors_ref (K_pad*D, N_pad) -> out (K_pad*D,).

    Rows are capsule-major: row k*D+d holds vote component d of capsule
    k across all N nodes (lanes).  Lanes >= N and rows >= K*D are zero
    padding.
    """
    KD = K_pad * D
    N_pad = priors_ref.shape[2]
    priors = priors_ref[0]                                 # (KD, N_pad)

    # lane mask for node padding
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, N_pad), 1)
    node_mask = (lane_ids < N).astype(priors.dtype)        # (K_pad, N_pad)

    # constant group matrices: gsum (K_pad, KD) sums a capsule's D rows,
    # its transpose grep (KD, K_pad) broadcasts one value per capsule to
    # its D rows.  Matmul-based (MXU) to avoid sublane reshape/repeat
    # relayouts.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, KD), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, KD), 1)
    gsum = (col_ids // D == row_ids).astype(priors.dtype)  # (K_pad, KD)
    rep_ids = jax.lax.broadcasted_iota(jnp.int32, (KD, K_pad), 0)
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (KD, K_pad), 1)
    grep = (rep_ids // D == rep_cols).astype(priors.dtype)  # (KD, K_pad)

    # capsule-padding mask for the softmax (padded capsules -> -inf)
    cap_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, N_pad), 0)
    cap_neg = jnp.where(cap_ids < K, 0.0, _NEG_INF).astype(priors.dtype)

    def squash_caps(s):
        """s: (KD, 1) summed votes -> squashed v (KD, 1)."""
        sq = jnp.dot(gsum, s * s, preferred_element_type=s.dtype,
                     precision=jax.lax.Precision.HIGHEST)  # (K_pad,1)
        # NOTE: full-precision 1/sqrt, not lax.rsqrt — inside Mosaic the
        # latter lowers to the hardware's unrefined rsqrt approximation
        # (~0.3% rel error), which breaks parity with the XLA path.
        scale = sq / (1.0 + sq) / jnp.sqrt(sq + 1e-12)
        scale_rep = jnp.dot(grep, scale, preferred_element_type=s.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        return s * scale_rep

    def routed_outputs(logits):
        # softmax over capsules (sublane dim) per node (lane)
        shifted = logits + cap_neg
        m = jnp.max(shifted, axis=0, keepdims=True)
        e = jnp.exp(shifted - m)
        probs = e / jnp.sum(e, axis=0, keepdims=True)      # (K_pad, N_pad)
        probs = probs * node_mask
        probs_rep = jnp.dot(grep, probs,
                            preferred_element_type=priors.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        s = jnp.sum(probs_rep * priors, axis=1, keepdims=True)  # (KD, 1)
        return squash_caps(s)

    def body(_, logits):
        v = routed_outputs(logits)                         # (KD, 1)
        # agreement: delta[k, n] = sum_d priors[kD+d, n] * v[kD+d]
        delta = jnp.dot(gsum, priors * v,
                        preferred_element_type=priors.dtype,
                        precision=jax.lax.Precision.HIGHEST)  # (K_pad, N_pad)
        return logits + delta

    logits0 = jnp.zeros((K_pad, N_pad), priors.dtype)
    logits = jax.lax.fori_loop(0, n_iter - 1, body, logits0)
    v = routed_outputs(logits)                             # (KD, 1)
    out_ref[0] = v


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def routed_capsules_pallas(x, route_weights, n_iter=3):
    """x (B, N, in_C), route_weights (N, K, in_C, D) -> caps (B, K, D).

    Equivalent to compute_priors + dynamic_routing (squeezed), with the
    routing loop fused in VMEM.  Differentiable: the backward pass is a
    second fused kernel that recomputes the routing iterations in VMEM
    and emits d(priors); the chain to dx/dW is two XLA einsums.
    """
    return _routed_forward(x, route_weights, n_iter)


def _routing_bwd_kernel(priors_ref, gbar_ref, dp_ref, *, n_iter, K, D,
                        K_pad, N):
    """VJP of the routing loop wrt the (padded, transposed) priors.

    Recomputes the forward iterations in VMEM (storing only the tiny
    per-iteration logits/v), then walks them in reverse:
      * squash VJP (closed-form derivative of the scale),
      * weighted-node-sum VJP (gives both d(probs) and d(priors)),
      * masked softmax VJP over the capsule (sublane) axis,
      * agreement VJP (gives d(priors) and the previous iteration's
        d(v)).
    All broadcasts across the D sub-rows of a capsule use the same
    gsum/grep constant matmuls as the forward kernel.
    """
    KD = K_pad * D
    N_pad = priors_ref.shape[2]
    priors = priors_ref[0]                                  # (KD, N_pad)
    gbar = gbar_ref[0]                                      # (KD, 1)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, N_pad), 1)
    node_mask = (lane_ids < N).astype(priors.dtype)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, KD), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, KD), 1)
    gsum = (col_ids // D == row_ids).astype(priors.dtype)   # (K_pad, KD)
    rep_ids = jax.lax.broadcasted_iota(jnp.int32, (KD, K_pad), 0)
    rep_cols = jax.lax.broadcasted_iota(jnp.int32, (KD, K_pad), 1)
    grep = (rep_ids // D == rep_cols).astype(priors.dtype)  # (KD, K_pad)

    cap_ids = jax.lax.broadcasted_iota(jnp.int32, (K_pad, N_pad), 0)
    cap_neg = jnp.where(cap_ids < K, 0.0, _NEG_INF).astype(priors.dtype)

    hi = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=priors.dtype,
                       precision=hi)

    def softmax_probs(logits):
        shifted = logits + cap_neg
        m = jnp.max(shifted, axis=0, keepdims=True)
        e = jnp.exp(shifted - m)
        return e / jnp.sum(e, axis=0, keepdims=True) * node_mask

    def node_sum(probs):
        """s[kd] = sum_n probs[k,n] * priors[kd,n]."""
        return jnp.sum(dot(grep, probs) * priors, axis=1, keepdims=True)

    def squash_parts(s):
        n2 = dot(gsum, s * s)                               # (K_pad, 1)
        u = 1.0 / (1.0 + n2)
        w = 1.0 / jnp.sqrt(n2 + 1e-12)
        sc = n2 * u * w
        # d(sc)/d(n2), closed form
        scp = u * w - n2 * u * u * w - 0.5 * n2 * u * (w ** 3)
        return sc, scp

    # ---- forward recompute, keeping per-iteration logits and v ----
    logits_list = []
    v_list = []
    L = jnp.zeros((K_pad, N_pad), priors.dtype)
    for _ in range(n_iter - 1):
        logits_list.append(L)
        probs = softmax_probs(L)
        s = node_sum(probs)
        sc, _ = squash_parts(s)
        v = s * dot(grep, sc)
        v_list.append(v)
        L = L + dot(gsum, priors * v)
    logits_list.append(L)

    # ---- reverse sweep ----
    dP = jnp.zeros((KD, N_pad), priors.dtype)
    vbar = gbar
    Lbar = jnp.zeros((K_pad, N_pad), priors.dtype)
    for i in range(n_iter - 1, -1, -1):
        L = logits_list[i]
        probs = softmax_probs(L)
        s = node_sum(probs)
        sc, scp = squash_parts(s)

        # squash VJP: sbar = sc*vbar + 2*s*rep(scp * <s, vbar>_k)
        dot_sv = dot(gsum, s * vbar)                        # (K_pad, 1)
        sbar = vbar * dot(grep, sc) + 2.0 * s * dot(grep, scp * dot_sv)

        # node-sum VJP
        probsbar = dot(gsum, priors * sbar)                 # (K_pad, N_pad)
        dP = dP + dot(grep, probs) * sbar

        # masked softmax VJP over the capsule axis
        inner = jnp.sum(probs * probsbar, axis=0, keepdims=True)
        Lbar = Lbar + probs * (probsbar - inner)

        if i > 0:
            # L_i = L_{i-1} + gsum @ (priors * v_{i-1})
            lrep = dot(grep, Lbar)                          # (KD, N_pad)
            vbar = jnp.sum(priors * lrep, axis=1, keepdims=True)
            dP = dP + v_list[i - 1] * lrep
            # identity part of the sum: Lbar carries to L_{i-1}

    dp_ref[0] = dP


def _routed_backward_dp(priors, gbar, n_iter, K, D, K_pad, N,
                        interpret=None):
    """Run the backward kernel: (B,KD,N_pad), (B,KD,1) -> dP."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, KD, N_pad = priors.shape

    kernel = functools.partial(
        _routing_bwd_kernel, n_iter=n_iter, K=K, D=D, K_pad=K_pad, N=N)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KD, N_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KD, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KD, N_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KD, N_pad), priors.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(priors, gbar)


def _priors_transposed(x, route_weights):
    """Votes in kernel layout (B, K, D, N) (transpose fused into einsum)."""
    return jnp.einsum(
        "bni,nkio->bkon", x, route_weights,
        preferred_element_type=jnp.promote_types(x.dtype, route_weights.dtype),
    )


def _routed_forward(x, route_weights, n_iter, interpret=None):
    if interpret is None:
        # Mosaic kernels need a TPU; CPU (tests) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    B, N, _ = x.shape
    _, K, _, D = route_weights.shape
    # K padded so the group matmul rows stay tiny yet sublane-aligned
    K_pad = max(_round_up(K, 8), 8)
    N_pad = _round_up(N, 128)
    KD = K_pad * D

    priors = _priors_transposed(x, route_weights)          # (B, K, D, N)
    priors = jnp.pad(
        priors, ((0, 0), (0, K_pad - K), (0, 0), (0, N_pad - N)))
    priors = priors.reshape(B, KD, N_pad)

    kernel = functools.partial(
        _routing_kernel, n_iter=n_iter, K=K, D=D, K_pad=K_pad, N=N)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, KD, N_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KD, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KD, 1), priors.dtype),
        # the double-buffered priors block (2 x KD x N_pad f32) plus
        # elementwise temporaries slightly exceed the 16MB default
        # scoped-vmem limit at CapsuleNet size; raise it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(priors)

    caps = out[:, :, 0].reshape(B, K_pad, D)[:, :K, :]
    return caps


def _fwd(x, route_weights, n_iter):
    return _routed_forward(x, route_weights, n_iter), (x, route_weights)


def _bwd(n_iter, residuals, g):
    """Fused-kernel VJP: recompute priors (one einsum), run the
    backward routing kernel for d(priors), then chain to dx/dW with
    two einsums (the VJP of the votes matmul)."""
    x, route_weights = residuals
    B, N, _ = x.shape
    _, K, _, D = route_weights.shape
    K_pad = max(_round_up(K, 8), 8)
    N_pad = _round_up(N, 128)
    KD = K_pad * D

    priors = _priors_transposed(x, route_weights)
    priors = jnp.pad(
        priors, ((0, 0), (0, K_pad - K), (0, 0), (0, N_pad - N)))
    priors = priors.reshape(B, KD, N_pad)

    gbar = jnp.pad(g, ((0, 0), (0, K_pad - K), (0, 0)))
    gbar = gbar.reshape(B, KD, 1)

    dp = _routed_backward_dp(priors, gbar, n_iter, K, D, K_pad, N)
    dp = dp.reshape(B, K_pad, D, N_pad)[:, :K, :, :N]       # (B, K, D, N)

    dx = jnp.einsum("bkdn,nkid->bni", dp, route_weights,
                    preferred_element_type=x.dtype)
    dw = jnp.einsum("bni,bkdn->nkid", x, dp,
                    preferred_element_type=route_weights.dtype)
    return dx, dw


def routed_capsules_xla_bwd(x, route_weights, n_iter=3):
    """Reference VJP path (XLA recompute) kept for parity testing."""
    priors = compute_priors(x, route_weights)
    return dynamic_routing(priors, n_iter=n_iter)[:, 0]


routed_capsules_pallas.defvjp(_fwd, _bwd)

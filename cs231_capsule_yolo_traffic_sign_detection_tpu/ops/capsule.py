"""Capsule primitives: squash and dynamic routing (XLA reference path).

This is the numerical core of the capsule models (reference
models.py:46-83, `CapsuleLayer`).  Here we implement it as pure
functions over arrays:

  * `squash` — the capsule nonlinearity (reference models.py:64-67);
  * `compute_priors` — the vote matmul `x @ route_weights`
    (reference models.py:71);
  * `dynamic_routing` — the 3-iteration routing-by-agreement loop
    (reference models.py:74-79) written with `lax.fori_loop` so XLA
    sees a single compiled loop body.

A fused Pallas kernel with identical numerics lives in
`ops.routing_pallas`; models select between the two via
`routing_impl` ('xla' | 'pallas').
"""

import jax
import jax.numpy as jnp

# Guard against 0/0 at exactly zero-norm capsules.  The reference
# divides by sqrt(||v||^2) with no epsilon (models.py:67) and would NaN
# at v=0; v=0 never occurs in practice, and for any nonzero v this term
# is dwarfed by ||v||^2.  Documented in COMPAT.md.
_SQUASH_EPS = 1e-12


def squash(v, axis=-1):
    """Capsule squash: (||v||^2 / (1 + ||v||^2)) * v / ||v||.

    Reference parity: models.py:64-67.
    """
    squared_norm = jnp.sum(v * v, axis=axis, keepdims=True)
    scale = squared_norm / (1.0 + squared_norm)
    return scale * v * jax.lax.rsqrt(squared_norm + _SQUASH_EPS)


def compute_priors(x, route_weights, accum_dtype=None):
    """Prediction votes u_hat = x @ W per (node, capsule).

    Args:
      x: (batch, n_nodes, in_C) input capsule vectors.
      route_weights: (n_nodes, n_caps, in_C, out_C).
      accum_dtype: MXU accumulation type; defaults to the promoted
        input type (pass jnp.float32 explicitly for bf16 inputs).

    Returns:
      priors: (batch, n_nodes, n_caps, out_C).

    Reference parity: models.py:71 — `x[:, :, None, None, :] @
    route_weights` then squeeze; we express it as an einsum so XLA maps
    it onto batched MXU matmuls.
    """
    pt = accum_dtype or jnp.promote_types(x.dtype, route_weights.dtype)
    return jnp.einsum(
        "bni,nkio->bnko", x, route_weights,
        preferred_element_type=pt,
    )


def dynamic_routing(priors, n_iter=3):
    """Routing-by-agreement over prediction votes.

    Args:
      priors: (batch, n_nodes, n_caps, out_C).
      n_iter: number of routing iterations (3 in the reference).

    Returns:
      outputs: (batch, 1, n_caps, out_C) squashed output capsules.

    Reference parity: models.py:72-79.  The softmax normalizes the
    routing logits over the *output capsule* dimension (dim=2), the
    weighted sum contracts the node dimension, and the agreement term
    `sum(priors * outputs)` updates the logits on every iteration but
    the last.
    """

    def one_iter(logits):
        probs = jax.nn.softmax(logits, axis=2)
        outputs = squash(
            jnp.sum(probs * priors, axis=1, keepdims=True)
        )
        return outputs

    def body(_, logits):
        outputs = one_iter(logits)
        delta = jnp.sum(priors * outputs, axis=-1, keepdims=True)
        return logits + delta

    logits0 = jnp.zeros_like(priors)
    logits = jax.lax.fori_loop(0, n_iter - 1, body, logits0)
    return one_iter(logits)


def routed_single_capsule(x, route_weights, accum_dtype=None):
    """Closed form of dynamic routing for n_caps == 1.

    With a single output capsule the routing softmax normalizes over a
    singleton axis (reference models.py:74, `F.softmax(logits, dim=2)`
    with n_caps == 1, as instantiated by DarkCapsuleNet at
    models.py:368-370), so `probs == 1` identically and every iteration
    returns the same `squash(sum_n priors)`; the agreement update
    changes the logits but can never change the probs.  The whole
    3-iteration loop therefore reduces algebraically to ONE contraction
    (the node-sum fused into the votes matmul — the (B, N, 1, D) priors
    tensor is never materialized) followed by a squash.  Numerics match
    the loop up to f32 summation order.

    Args:
      x: (batch, n_nodes, in_C).
      route_weights: (n_nodes, 1, in_C, out_C).

    Returns:
      (batch, 1, out_C) squashed output capsule — same as
      `dynamic_routing(compute_priors(x, w))[:, 0]`.
    """
    pt = accum_dtype or jnp.promote_types(x.dtype, route_weights.dtype)
    s = jnp.einsum("bni,nkio->bko", x, route_weights,
                   preferred_element_type=pt)
    return squash(s)


def capsule_norm(caps, axis=-1):
    """Capsule length ||v||_2 — the class score (reference models.py:117)."""
    return jnp.sqrt(jnp.sum(caps * caps, axis=axis))

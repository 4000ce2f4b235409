"""CapsuleNet — capsule classifier with dynamic routing + reconstruction.

Reference parity: models.py:46-124.  Topology: 9x9 conv to 256ch
(32->24), primary capsules (8-d vectors over 16x9x9=1296 nodes via a
k8 s2 conv), routing to n_classes capsules of dim 16, class scores =
capsule norms, plus a reconstruction decoder fed the ground-truth class
capsule during training.

TPU-first notes: the reference's 8 parallel Conv2d's (models.py:60-62)
are one 128-channel conv here (identical function class and init
distribution, one MXU call instead of 8); routing runs either as pure
XLA (`ops.capsule.dynamic_routing`) or as the fused Pallas kernel
(`ops.routing_pallas`), selected by `routing_impl`.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.capsule import (
    squash,
    compute_priors,
    dynamic_routing,
    routed_single_capsule,
    capsule_norm,
)
from .init import routing_weights_init, torch_kernel_init, torch_bias_init
from .layers import torch_conv, ReconDecoder


class PrimaryCapsules(nn.Module):
    """Conv -> capsules mode of the reference CapsuleLayer.

    n_caps parallel convs fused into one; output (B, n_nodes, n_caps)
    squashed capsule vectors.  Node ordering is (position, channel)
    versus the reference's (channel, position) — a fixed permutation of
    the routing weights' node axis (documented in COMPAT.md).
    """

    n_caps: int = 8
    out_c: int = 16
    kernel: int = 8
    stride: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        y = torch_conv(
            x,
            self.n_caps * self.out_c,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=0,
            dtype=self.dtype,
        )
        if self.dtype is not None:
            y = y.astype(jnp.float32)  # squash/routing always f32
        b, h, w, _ = y.shape
        y = y.reshape(b, h * w, self.n_caps, self.out_c)
        y = y.transpose(0, 1, 3, 2).reshape(b, h * w * self.out_c, self.n_caps)
        return squash(y)


class CapsuleRouting(nn.Module):
    """Capsules -> capsules mode of the reference CapsuleLayer.

    Dynamic routing by agreement (reference models.py:69-79); returns
    (B, n_caps, out_c).
    """

    n_caps: int
    n_nodes: int
    in_c: int
    out_c: int
    n_iter: int = 3
    impl: str = "xla"  # 'xla' | 'pallas'
    # bf16 storage + single-pass MXU contractions inside the Pallas
    # kernel (f32 accumulation/softmax/squash); set under --dtype
    # bfloat16.  The XLA impl ignores it (routing stays f32 there).
    bf16: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "route_weights",
            routing_weights_init,
            (self.n_nodes, self.n_caps, self.in_c, self.out_c),
        )
        if self.n_caps == 1:
            # closed form: the routing softmax is over a singleton axis
            # so the whole loop is squash(sum_n priors), one fused
            # contraction — see ops.capsule.routed_single_capsule.
            # Applies to DarkCapsuleNet (reference models.py:368-370);
            # supersedes the pallas/xla choice for this shape.
            return routed_single_capsule(x, w)
        if self.impl == "pallas":
            from ..ops.routing_pallas import routed_capsules_pallas

            return routed_capsules_pallas(x, w, self.n_iter, self.bf16)
        priors = compute_priors(x, w)
        return dynamic_routing(priors, n_iter=self.n_iter)[:, 0]


class CapsuleNet(nn.Module):
    n_classes: int = 43
    routing_impl: str = "xla"
    # convs/decoder compute dtype; bfloat16 additionally engages the
    # bf16 Pallas routing variant (XLA routing stays f32 regardless)
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.conv1 = nn.Conv(
            256, (9, 9), padding="VALID",
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(3 * 9 * 9),
            dtype=self.dtype,
            name="conv1",
        )
        self.primary_capsules = PrimaryCapsules(dtype=self.dtype)
        self.traffic_sign_capsules = CapsuleRouting(
            n_caps=self.n_classes,
            n_nodes=16 * 9 * 9,
            in_c=8,
            out_c=16,
            impl=self.routing_impl,
            # --dtype bfloat16 engages the bf16 Pallas routing variant
            # (measured on-chip, BASELINE.md); the XLA impl stays f32
            bf16=self.dtype == jnp.bfloat16,
        )
        self.decoder = ReconDecoder(dtype=self.dtype)

    def __call__(self, x, y: Optional[jax.Array] = None, recon: bool = False,
                 train: bool = False):
        caps = self.capsules(x)
        scores = capsule_norm(caps)
        if not recon:
            if self.is_initializing():
                # register decoder params even when the recon branch is
                # unused (the reference builds the decoder in __init__
                # unconditionally, models.py:96-111) so checkpoints are
                # mode-independent
                self.decoder(jnp.zeros((x.shape[0], 16), x.dtype))
            return scores
        t = jnp.take_along_axis(caps, y[:, None, None], axis=1)[:, 0]
        decoded = self.decoder(t)
        return scores, decoded

    def capsules(self, x):
        """Class capsules (B, n_classes, 16) — exposed for interpretability."""
        x = jax.nn.relu(self.conv1(x))
        x = self.primary_capsules(x)
        return self.traffic_sign_capsules(x)

    def decode(self, t):
        """Decode a (B, 16) capsule — used by capsule_interpret."""
        return self.decoder(t)

"""DarkCapsuleNet — detection via a capsule head over grid cells.

Reference parity: models.py:340-400 (+ the unused variants
DarkCapsuleNet2 models.py:271-337 and DarkCapsuleNet3 models.py:403-463,
implemented for inventory completeness; never registered by the driver,
same as the reference).

The reference front-end ends in a memory-order reinterpretation: the
(B, 256, 28, 28) NCHW activation is viewed as (B, 256, 4, 4*g^2),
chunked into g^2 blocks, and each block re-read as 512 capsule nodes of
dim 8 (models.py:393-396).  We replicate that exact value mapping with
static transposes/reshapes (XLA fuses them into the surrounding ops),
then batch ONE shared routing layer over all g^2 cells at once — a
single large routed matmul instead of a per-cell loop.

Input-shape note: this only works at 224x224 input (28 = 4*7 with
n_grid=7).  The reference's config.py:41 says 224 while its
experiments/darkcapsule/params.json says 448 (broken there) — we
resolve to 224; see COMPAT.md.
"""

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from .capsule_net import CapsuleRouting, PrimaryCapsules
from .layers import ConvBNLeaky


def _grid_capsules(x, n_grid):
    """NHWC conv activations -> (g^2 * B, 512, 8) capsule nodes.

    Value-exact replication of the reference reshape (models.py:393-396)
    on NHWC input: transpose to NCHW, view (B,256,4,4g^2), chunk into
    g^2 blocks of (B,256,4,4), per-block permute to (B,4,4,256) and
    flatten to (B,512,8); stacked with cell-major order.
    """
    b, h, w, c = x.shape
    g2 = n_grid * n_grid
    assert c * h * w == 512 * 8 * g2, (x.shape, n_grid)
    x = x.transpose(0, 3, 1, 2)                     # (B, 256, 28, 28)
    x = x.reshape(b, c, 4, g2, 4)                   # chunk axis: g^2 blocks
    x = x.transpose(3, 0, 2, 4, 1)                  # (g^2, B, 4, 4, 256)
    return x.reshape(g2 * b, 512, 8)


class DarkCapsuleNet(nn.Module):
    n_grid: int = 7
    routing_impl: str = "xla"
    dtype: Optional[jnp.dtype] = None  # conv stack only; routing is f32
    remat: bool = False  # rematerialize conv blocks (see DarkNet.remat)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        g = self.n_grid
        block_cls = (nn.remat(ConvBNLeaky, static_argnums=(2,))
                     if self.remat else ConvBNLeaky)
        # 5-layer conv stack, stride 8 total (reference models.py:346-365)
        specs = [
            (128, 3, (1, 1)),
            (256, 3, (1, 1)),
            (64, 4, (2, 2)),
            (128, 4, (2, 2)),
            (256, 4, (2, 2)),
        ]
        for i, (feats, k, s) in enumerate(specs, start=1):
            x = block_cls(
                feats, kernel=(k, k), strides=s, padding=1, use_bias=True,
                negative_slope=0.1, bn_momentum=0.9, name_idx=i,
                name=f"block_{i}", dtype=self.dtype,
            )(x, train)

        # NOTE: the reference feeds raw conv features into routing with
        # no squash (models.py:398) — routing mode never squashes its
        # input (models.py:69-79).  We match that.
        nodes = _grid_capsules(x, g)                # (g^2*B, 512, 8)
        caps = CapsuleRouting(
            n_caps=1, n_nodes=512, in_c=8, out_c=5,
            impl=self.routing_impl, name="traffic_sign_capsules",
        )(nodes)                                    # (g^2*B, 1, 5)
        caps = caps.reshape(g, g, b, 5).transpose(2, 0, 1, 3)
        return caps                                 # (B, g, g, 5)


class DarkCapsuleNet2(nn.Module):
    """Unused reference variant (models.py:271-337): strided conv stack
    to 7x7x512, 1x1 primary capsules, routing to g^2 cell capsules of
    dim 5+C."""

    n_grid: int = 7
    n_classes: int = 43
    dropout: float = 0.0
    routing_impl: str = "xla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        g = self.n_grid
        for i, feats in enumerate((32, 64, 128, 256, 512), start=1):
            x = ConvBNLeaky(
                feats, kernel=(4, 4), strides=(2, 2), padding=1,
                use_bias=True, negative_slope=0.1, bn_momentum=0.9,
                dropout=self.dropout, name_idx=i, name=f"block_{i}",
                dtype=self.dtype,
            )(x, train=train)
        x = PrimaryCapsules(n_caps=8, out_c=16, kernel=1, stride=1)(x)
        caps = CapsuleRouting(
            n_caps=g * g, n_nodes=16 * 7 * 7, in_c=8,
            out_c=5 + self.n_classes, impl=self.routing_impl,
            name="traffic_sign_capsules",
        )(x)                                        # (B, g^2, 5+C)
        return caps.reshape(b, g, g, -1)


class DarkCapsuleNet3(nn.Module):
    """Unused reference variant (models.py:403-463): DarkCapsuleNet
    front-end, routing each cell to n_classes capsules of dim 5+16."""

    n_grid: int = 7
    n_classes: int = 43
    routing_impl: str = "xla"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        g = self.n_grid
        specs = [
            (128, 3, (1, 1)),
            (256, 3, (1, 1)),
            (64, 4, (2, 2)),
            (128, 4, (2, 2)),
            (256, 4, (2, 2)),
        ]
        for i, (feats, k, s) in enumerate(specs, start=1):
            x = ConvBNLeaky(
                feats, kernel=(k, k), strides=s, padding=1, use_bias=True,
                negative_slope=0.1, bn_momentum=0.9, name_idx=i,
                name=f"block_{i}", dtype=self.dtype,
            )(x, train=train)
        nodes = _grid_capsules(x, g)
        caps = CapsuleRouting(
            n_caps=self.n_classes, n_nodes=512, in_c=8, out_c=5 + 16,
            impl=self.routing_impl, name="traffic_sign_capsules",
        )(nodes)                                    # (g^2*B, C, 21)
        caps = caps.reshape(g, g, b, self.n_classes, 21)
        return caps.transpose(2, 0, 1, 3, 4)        # (B, g, g, C, 21)

"""Shared NHWC building blocks (conv+BN+LeakyReLU, decoder).

Conv/dense helpers are plain functions that instantiate flax modules
with torch-default initialization — keeping the parameter tree flat
(`block_i/conv_i/kernel`) so the pretrained-weight loader and the
fine-tune freeze mask address layers directly.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .init import torch_kernel_init, torch_bias_init


def torch_conv(x, features, kernel: Tuple[int, int], strides=(1, 1),
               padding: int = 0, use_bias: bool = True, name=None,
               dtype=None):
    """nn.Conv with torch-default init and explicit symmetric padding.

    `dtype` is the computation dtype (bf16 under the mixed-precision
    policy — MXU native); params stay f32 (flax param_dtype default),
    so master weights / Adam moments are full precision.
    """
    fan_in = kernel[0] * kernel[1] * x.shape[-1]
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=[(padding, padding)] * 2,
        use_bias=use_bias,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )(x)


def torch_dense(x, features, name=None, dtype=None):
    return nn.Dense(
        features,
        kernel_init=torch_kernel_init,
        bias_init=torch_bias_init(x.shape[-1]),
        dtype=dtype,
        name=name,
    )(x)


class ConvBNLeaky(nn.Module):
    """conv -> BatchNorm -> LeakyReLU [-> dropout], the detector block.

    `bn_momentum` follows the flax convention (decay of the running
    average): torch momentum m corresponds to flax momentum 1-m.
    Reference blocks: models.py:132-220 (DarkNet, torch momentum 0.01
    -> 0.99 here) and models.py:346-365 (DarkCapsuleNet, torch default
    0.1 -> 0.9 here).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = False
    negative_slope: float = 0.1
    bn_momentum: float = 0.99
    dropout: float = 0.0
    name_idx: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        suffix = f"_{self.name_idx}" if self.name_idx is not None else ""
        x = torch_conv(x, self.features, self.kernel, self.strides,
                       self.padding, use_bias=self.use_bias,
                       name=f"conv{suffix}", dtype=self.dtype)
        # BatchNorm runs at the policy dtype but is numerically safe:
        # flax computes the batch statistics in (at least) f32
        # internally and the running stats / scale / bias params stay
        # f32 (param_dtype default) — dtype only casts the normalized
        # OUTPUT.  Leaving it f32 instead doubles the HBM traffic of
        # every BN/leaky/pool epilogue and its backward at the big
        # early resolutions: the train-step device profile measured
        # those f32 epilogues at ~23% of the darknet_r step, and this
        # cast is worth +29-30% train throughput for the 448px
        # detectors (BASELINE.md, training profile).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            name=f"bn{suffix}",
            dtype=self.dtype,
        )(x)
        x = jax.nn.leaky_relu(x, self.negative_slope)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ReconDecoder(nn.Module):
    """Capsule reconstruction decoder (reference models.py:96-111).

    dense 16->256, unflatten to (4,4,16), then 3x (nearest-neighbor
    upsample + 3x3 conv + relu) and a final 3-channel tanh conv.
    NHWC throughout; output (B, 32, 32, 3) in f32 (the reconstruction
    MSE is computed full-precision regardless of compute dtype).
    """

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        b = t.shape[0]
        x = torch_dense(t, 16 * 4 * 4, dtype=self.dtype)
        x = jax.nn.relu(x)
        x = x.reshape(b, 16, 4, 4).transpose(0, 2, 3, 1)  # CHW view -> NHWC
        for size, feat in ((8, 4), (16, 8), (32, 16)):
            x = jax.image.resize(x, (b, size, size, x.shape[-1]), "nearest")
            x = torch_conv(x, feat, (3, 3), padding=1, dtype=self.dtype)
            x = jax.nn.relu(x)
        x = torch_conv(x, 3, (3, 3), padding=1, dtype=self.dtype)
        if self.dtype is not None:
            x = x.astype(jnp.float32)
        return jnp.tanh(x)

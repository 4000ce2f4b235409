"""ConvNet — the plain CNN classifier for GTSRB.

Reference parity: models.py:22-43.  Two conv+BN+LeakyReLU+dropout
blocks (64, 128 channels), 2x2 max-pool, then FC 128*16*16 -> 128 ->
n_classes.  NHWC; the flatten order differs from torch's CHW flatten
(a fixed permutation of the first dense layer's input — same function
class, irrelevant without weight porting).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import torch_conv, torch_dense


class ConvNet(nn.Module):
    n_classes: int = 43
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 policy)

    @nn.compact
    def __call__(self, x, train: bool = False):
        for feats in (64, 128):
            x = torch_conv(x, feats, (3, 3), padding=1, dtype=self.dtype)
            # dtype casts only the normalized output; stats compute in
            # f32 and running stats stay f32 (see layers.ConvBNLeaky)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = jax.nn.leaky_relu(x, 0.01)  # torch LeakyReLU default slope
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = torch_dense(x, 128, dtype=self.dtype)
        x = jax.nn.relu(x)
        out = torch_dense(x, self.n_classes, dtype=self.dtype)
        if self.dtype is not None:
            out = out.astype(jnp.float32)  # CE loss is full-precision
        return out

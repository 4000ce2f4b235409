"""DarkNet — Darknet-19-style YOLO-v1 backbone + grid head.

Reference parity: models.py:126-269.  19 bias-free convs with
BN(momentum 0.01 torch == 0.99 flax) + LeakyReLU(0.1), dropout after
most, 5 max-pools (stride 32: 448 -> 14 grid).  The head conv emits
5*n_boxes + n_classes channels; sigmoid over the box part, softmax over
the class part (reference models.py:226-236).  NHWC end-to-end, so the
reference's final NCHW->NHWC permute disappears.

Also provides the pretrained `darknet19_weights.npz` loader
(reference models.py:238-269): the npz stores TF-format HWIO conv
kernels, which is exactly the flax layout — no permute needed (the
reference had to permute to OIHW).
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import flax

from .layers import ConvBNLeaky, torch_conv

# (out_channels, kernel_size, what follows: 'mp' max-pool | 'drop' | None)
# Reference models.py:132-223.
DARKNET_LAYERS = [
    (32, 3, "mp"),
    (64, 3, "mp"),
    (128, 3, "drop"),
    (64, 1, "drop"),
    (128, 3, "mp"),
    (256, 3, "drop"),
    (128, 1, "drop"),
    (256, 3, "mp"),
    (512, 3, "drop"),
    (256, 1, "drop"),
    (512, 3, "drop"),
    (256, 1, "drop"),
    (512, 3, "mp"),
    (1024, 3, "drop"),
    (512, 1, "drop"),
    (1024, 3, "drop"),
    (512, 1, "drop"),
    (1024, 3, "drop"),
]


class DarkNet(nn.Module):
    n_boxes: int = 2
    n_classes: int = 0
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 policy)
    remat: bool = False  # rematerialize conv blocks in the backward pass

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # --remat: wrap each conv block in jax.checkpoint so only the
        # block boundaries stay live for the backward pass (the
        # BN/LeakyReLU intermediates inside a block are recomputed).
        # Trades ~one extra forward of block FLOPs for roughly half the
        # activation memory at 448px — the lever for batches past the
        # plain-path HBM limit.  The module instance counts as argument
        # 0 of the lifted __call__, so `train` is static arg 2.
        block_cls = (nn.remat(ConvBNLeaky, static_argnums=(2,))
                     if self.remat else ConvBNLeaky)
        for i, (feats, k, after) in enumerate(DARKNET_LAYERS, start=1):
            x = block_cls(
                feats,
                kernel=(k, k),
                padding=1 if k == 3 else 0,
                use_bias=False,
                negative_slope=0.1,
                bn_momentum=0.99,
                dropout=self.dropout if after == "drop" else 0.0,
                name_idx=i,
                name=f"block_{i}",
                dtype=self.dtype,
            )(x, train)
            if after == "mp":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        split = 5 * self.n_boxes
        out = torch_conv(
            x, split + self.n_classes, (1, 1), padding=0, use_bias=False,
            name="conv_19", dtype=self.dtype,
        )
        if self.dtype is not None:
            out = out.astype(jnp.float32)  # heads + loss in f32 always

        y_box = jax.nn.sigmoid(out[..., :split])
        if self.n_classes == 0:
            return y_box
        y_cls = jax.nn.softmax(out[..., split:], axis=-1)
        return jnp.concatenate([y_box, y_cls], axis=-1)


def load_darknet19_npz(variables, npz_path, n_load_layer=18):
    """Merge pretrained darknet19 weights into a variables pytree.

    npz keys are '{i}-<scope>/<name>:0' with i 0-based; layer index =
    i+1.  kernel:0 -> conv kernel (HWIO, native to flax), gamma:0 /
    biases:0 -> BN scale/bias, moving_mean:0 / moving_variance:0 -> BN
    running stats.  Only layers <= n_load_layer are loaded (the head is
    always trained from scratch, reference main.py:274).

    Reference parity: models.py:238-269 (`DarkNet.load_weights`).
    """
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])
    pretrained = np.load(npz_path)

    for key in pretrained.files:
        v = pretrained[key]
        index_s, layer = key.split("-")
        index = int(index_s) + 1
        if index > n_load_layer:
            continue
        _, name = layer.split("/")
        block = f"block_{index}"
        if name == "kernel:0":
            tgt = params[block][f"conv_{index}"]
            assert tgt["kernel"].shape == v.shape, (key, v.shape)
            tgt["kernel"] = jnp.asarray(v)
        elif name == "gamma:0":
            params[block][f"bn_{index}"]["scale"] = jnp.asarray(v)
        elif name == "biases:0":
            params[block][f"bn_{index}"]["bias"] = jnp.asarray(v)
        elif name == "moving_mean:0":
            batch_stats[block][f"bn_{index}"]["mean"] = jnp.asarray(v)
        elif name == "moving_variance:0":
            batch_stats[block][f"bn_{index}"]["var"] = jnp.asarray(v)
        else:
            raise ValueError(f"unknown pretrained tensor {key}")

    return dict(variables, params=params, batch_stats=batch_stats)


def darknet_freeze_mask(params, fine_tune: int):
    """Pytree of bools: True where a param is TRAINABLE.

    Freezes all params in blocks with layer index <= fine_tune,
    mirroring the reference's requires_grad=False loop
    (reference main.py:273-278).  Feed to `optax.masked`.
    """

    def block_index(path):
        for p in path:
            key = getattr(p, "key", None)
            if isinstance(key, str) and key.startswith(("block_", "conv_")):
                try:
                    return int(key.split("_")[1])
                except ValueError:
                    return None
        return None

    def mask_leaf(path, _):
        idx = block_index(path)
        return not (idx is not None and idx <= fine_tune)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)

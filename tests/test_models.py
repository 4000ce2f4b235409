"""Model forward-shape and range tests (all five configurations)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
    ConvNet, CapsuleNet, DarkNet, DarkCapsuleNet, DarkCapsuleNet3,
)


def _init_and_apply(model, x, **kwargs):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False, **kwargs)
    return variables, model.apply(variables, x, train=False, **kwargs)


def test_convnet_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    _, scores = _init_and_apply(ConvNet(n_classes=43, dropout=0.5), x)
    assert scores.shape == (2, 43)


def test_capsule_net_shapes():
    x = jnp.zeros((2, 32, 32, 3))
    model = CapsuleNet(n_classes=43)
    variables, scores = _init_and_apply(model, x)
    assert scores.shape == (2, 43)
    # scores are capsule norms: in [0, 1) after squash
    s = np.asarray(scores)
    assert (s >= 0).all() and (s < 1).all()

    y = jnp.array([3, 7])
    scores2, recon = model.apply(variables, x, y=y, recon=True, train=False)
    assert scores2.shape == (2, 43)
    assert recon.shape == (2, 32, 32, 3)
    assert (np.abs(np.asarray(recon)) <= 1).all()  # tanh output


@pytest.mark.parametrize("n_boxes,n_classes", [(2, 0), (1, 43)])
def test_darknet_shapes(n_boxes, n_classes):
    # 64px input -> 5 maxpools -> 2x2 grid
    x = jnp.zeros((2, 64, 64, 3))
    model = DarkNet(n_boxes=n_boxes, n_classes=n_classes, dropout=0.0)
    _, y = _init_and_apply(model, x)
    assert y.shape == (2, 2, 2, 5 * n_boxes + n_classes)
    y = np.asarray(y)
    box = y[..., : 5 * n_boxes]
    assert (box >= 0).all() and (box <= 1).all()         # sigmoid
    if n_classes:
        cls = y[..., 5 * n_boxes:]
        np.testing.assert_allclose(cls.sum(-1), 1.0, rtol=1e-5)  # softmax


def test_darkcapsule_shapes():
    # input 32*g with g=2 -> conv stride 8 -> 8x8x256 -> 4 cells of 512x8
    x = jnp.zeros((2, 64, 64, 3))
    model = DarkCapsuleNet(n_grid=2)
    _, caps = _init_and_apply(model, x)
    assert caps.shape == (2, 2, 2, 5)


def test_darkcapsule_grid_mapping_matches_torch_view():
    """The NHWC reshape replicates torch's memory reinterpretation
    (reference models.py:393-396) value-for-value."""
    import torch

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models.darkcapsule import (
        _grid_capsules,
    )

    B, C, H, W, g = 2, 256, 8, 8, 2
    rng = np.random.RandomState(0)
    nchw = rng.randn(B, C, H, W).astype(np.float32)

    # torch reference ops
    t = torch.from_numpy(nchw)
    chunks = torch.chunk(t.reshape(B, C, 4, 4 * g**2), g**2, 3)
    t_nodes = torch.cat(
        [c.permute(0, 2, 3, 1).contiguous().view(B, -1, 8).unsqueeze(0)
         for c in chunks], 0).view(-1, 512, 8).numpy()

    nhwc = jnp.asarray(nchw.transpose(0, 2, 3, 1))
    ours = np.asarray(_grid_capsules(nhwc, g))
    np.testing.assert_allclose(ours, t_nodes, rtol=0, atol=0)


def test_darkcapsule3_shapes():
    x = jnp.zeros((1, 64, 64, 3))
    model = DarkCapsuleNet3(n_grid=2, n_classes=43)
    _, caps = _init_and_apply(model, x)
    assert caps.shape == (1, 2, 2, 43, 21)


def test_darknet_freeze_mask():
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models.darknet import (
        darknet_freeze_mask,
    )

    x = jnp.zeros((1, 64, 64, 3))
    model = DarkNet(n_boxes=2, n_classes=0)
    variables, _ = _init_and_apply(model, x)
    mask = darknet_freeze_mask(variables["params"], fine_tune=18)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen = [p for p, v in flat if not v]
    trainable = [p for p, v in flat if v]
    # blocks 1..18 frozen, head conv_19 trainable
    assert len(trainable) >= 1
    assert any("conv_19" in "/".join(str(k.key) for k in p) for p in trainable)
    assert all(
        "conv_19" not in "/".join(str(k.key) for k in p) for p in frozen)
    assert len(frozen) > 30


def test_darkcapsule2_shapes():
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        DarkCapsuleNet2,
    )

    # 5 stride-2 convs: 224 -> 7; fixed 16*7*7 routing nodes
    x = jnp.zeros((1, 224, 224, 3))
    model = DarkCapsuleNet2(n_grid=7, n_classes=43)
    _, caps = _init_and_apply(model, x)
    assert caps.shape == (1, 7, 7, 5 + 43)

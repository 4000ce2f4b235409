"""Exact forward parity vs the torch reference with IDENTICAL weights.

Builds the reference models by executing /root/reference (never
copying), converts their randomly-initialized state_dicts into our
flax variable layout (OIHW->HWIO kernels, CHW->HWC flatten
permutation for dense layers), and compares forward outputs on the
same inputs.  This pins down layer semantics (padding, BN epsilon/
momentum mode, LeakyReLU slopes, head activations) to floating-point
tolerance.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")  # execute the reference, don't copy

# torch-0.4 compat: the reference calls .view on non-contiguous tensors
# (models.py:10, :81), which torch 2.x rejects; fall back to .reshape
_orig_view = torch.Tensor.view


def _view_compat(self, *a, **k):
    try:
        return _orig_view(self, *a, **k)
    except RuntimeError:
        return self.reshape(*a, **k)


torch.Tensor.view = _view_compat

import jax
import jax.numpy as jnp


class _RefParams:
    device = "cpu"
    dropout = 0.0
    n_classes = 43
    n_boxes = 2
    n_grid = 2
    darknet_input = 64


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def _conv_kernel(t_weight):
    """torch OIHW -> flax HWIO."""
    return _t2j(t_weight.permute(2, 3, 1, 0))


def _bn(dst_params, dst_stats, ref_bn):
    dst_params["scale"] = _t2j(ref_bn.weight)
    dst_params["bias"] = _t2j(ref_bn.bias)
    dst_stats["mean"] = _t2j(ref_bn.running_mean)
    dst_stats["var"] = _t2j(ref_bn.running_var)


def test_darknet_forward_parity():
    import models as ref_models  # /root/reference/models.py

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import DarkNet

    p = _RefParams()
    p.n_boxes, p.n_classes = 2, 43
    torch.manual_seed(0)
    ref = ref_models.DarkNet(p)
    ref.eval()

    ours = DarkNet(n_boxes=2, n_classes=43, dropout=0.0)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    seq = ref.model
    for i in range(1, 19):
        params[f"block_{i}"][f"conv_{i}"]["kernel"] = _conv_kernel(
            getattr(seq, f"conv_{i}").weight)
        _bn(params[f"block_{i}"][f"bn_{i}"],
            stats[f"block_{i}"][f"bn_{i}"], getattr(seq, f"bn_{i}"))
    params["conv_19"]["kernel"] = _conv_kernel(seq.conv_19.weight)
    variables = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    our_out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))

    assert our_out.shape == ref_out.shape == (2, 2, 2, 5 * 2 + 43)
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


def test_convnet_forward_parity():
    import models as ref_models

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import ConvNet

    p = _RefParams()
    torch.manual_seed(0)
    ref = ref_models.ConvNet(p)
    ref.eval()

    ours = ConvNet(n_classes=43, dropout=0.0)
    x = np.random.RandomState(1).rand(3, 32, 32, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    seq = ref.cnn
    # blocks: conv(0) bn(1) relu drop conv(4) bn(5) relu drop pool
    params["Conv_0"]["kernel"] = _conv_kernel(seq[0].weight)
    params["Conv_0"]["bias"] = _t2j(seq[0].bias)
    _bn(params["BatchNorm_0"], stats["BatchNorm_0"], seq[1])
    params["Conv_1"]["kernel"] = _conv_kernel(seq[4].weight)
    params["Conv_1"]["bias"] = _t2j(seq[4].bias)
    _bn(params["BatchNorm_1"], stats["BatchNorm_1"], seq[5])

    # dense over the flatten: torch flattens CHW (c*256 + h*16 + w),
    # ours flattens HWC (h*16*128 + w*128 + c); permute the input axis
    C, H, W = 128, 16, 16
    h, w, c = np.meshgrid(np.arange(H), np.arange(W), np.arange(C),
                          indexing="ij")
    ours_to_torch = (c * H * W + h * W + w).reshape(-1)
    w10 = seq[10].weight.detach().numpy()          # (128, C*H*W) CHW-major
    params["Dense_0"]["kernel"] = jnp.asarray(w10[:, ours_to_torch].T)
    params["Dense_0"]["bias"] = _t2j(seq[10].bias)
    params["Dense_1"]["kernel"] = _t2j(seq[12].weight.t())
    params["Dense_1"]["bias"] = _t2j(seq[12].bias)
    variables = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    our_out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)


def test_capsulenet_forward_parity():
    """CapsuleNet: fused primary-caps conv + node-permutation of the
    routing weights reproduces the reference exactly."""
    import models as ref_models

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        CapsuleNet,
    )

    p = _RefParams()
    torch.manual_seed(0)
    ref = ref_models.CapsuleNet(p)
    ref.eval()

    ours = CapsuleNet(n_classes=43)
    x = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    import flax

    params = flax.core.unfreeze(variables["params"])

    params["conv1"]["kernel"] = _conv_kernel(ref.conv1.weight)
    params["conv1"]["bias"] = _t2j(ref.conv1.bias)

    # primary caps: reference has 8 convs of 16 channels; ours is one
    # 128-channel conv ordered (cap j, channel c) = j*16 + c
    ref_caps = ref.primary_capsules.capsules
    k = torch.cat([cap.weight for cap in ref_caps], dim=0)   # (128, 256, 8, 8)
    b = torch.cat([cap.bias for cap in ref_caps], dim=0)
    pc = params["primary_capsules"]["Conv_0"]
    pc["kernel"] = _conv_kernel(k)
    pc["bias"] = _t2j(b)

    # routing weights: reference nodes are (channel c in 16, pos p in 81)
    # -> n_ref = c*81 + p; ours are (pos p, channel c) -> n_our = p*16+c.
    # Our vector dim is the cap index j in both.
    w_ref = ref.traffic_sign_capsules.route_weights[0]       # (1296, 43, 8, 16)
    ref_index_for_our = np.empty(1296, np.int64)
    # our node (p, c) at index p*16+c maps to reference index c*81+p
    for pos in range(81):
        for ch in range(16):
            ref_index_for_our[pos * 16 + ch] = ch * 81 + pos
    params["traffic_sign_capsules"]["route_weights"] = _t2j(
        w_ref[ref_index_for_our])
    variables = dict(variables, params=params)

    with torch.no_grad():
        ref_scores = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    our_scores = np.asarray(
        ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-4, atol=1e-5)


def test_darkcapsule_forward_parity():
    """DarkCapsuleNet: conv stack + value-exact grid reshape + shared
    routing; node order matches the reference exactly (no permutation
    needed — see test_models.test_darkcapsule_grid_mapping)."""
    import models as ref_models

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        DarkCapsuleNet,
    )

    p = _RefParams()
    p.n_grid = 2
    torch.manual_seed(0)
    ref = ref_models.DarkCapsuleNet(p)
    ref.eval()

    ours = DarkCapsuleNet(n_grid=2)
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    for i in range(1, 6):
        conv = getattr(ref.conv, f"conv_{i}")
        params[f"block_{i}"][f"conv_{i}"]["kernel"] = _conv_kernel(conv.weight)
        params[f"block_{i}"][f"conv_{i}"]["bias"] = _t2j(conv.bias)
        _bn(params[f"block_{i}"][f"bn_{i}"],
            stats[f"block_{i}"][f"bn_{i}"], getattr(ref.conv, f"bn_{i}"))
    params["traffic_sign_capsules"]["route_weights"] = _t2j(
        ref.traffic_sign_capsules.route_weights[0])
    variables = {"params": params, "batch_stats": stats}

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    our_out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    assert our_out.shape == ref_out.shape == (2, 2, 2, 5)
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)

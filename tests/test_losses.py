"""Loss parity tests vs independent torch implementations of the
reference formulas (loss_fns.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu import losses as L


@pytest.fixture
def loss_cfg():
    return L.LossConfig(
        n_classes=43, n_boxes=2, n_grid=4, darknet_input=64,
        l_coord=5.0, l_noobj=0.5, recon=True, recon_coef=5e-4,
    )


def test_cnn_loss_matches_torch(rng, loss_cfg):
    import torch
    import torch.nn.functional as F

    scores = rng.randn(8, 43).astype(np.float64)
    y = rng.randint(0, 43, size=8)

    ours, _ = L.cnn_loss(jnp.asarray(scores), jnp.asarray(y), loss_cfg)
    t = (-F.log_softmax(torch.from_numpy(scores), dim=1)
         .gather(1, torch.from_numpy(y).unsqueeze(1))).sum() / 8
    np.testing.assert_allclose(float(ours), float(t), rtol=1e-10)


def test_capsule_loss_matches_torch(rng, loss_cfg):
    import torch
    import torch.nn.functional as F

    scores = rng.rand(8, 43).astype(np.float64)
    y = rng.randint(0, 43, size=8)
    x = rng.randn(8, 32, 32, 3).astype(np.float64)
    recon = rng.randn(8, 32, 32, 3).astype(np.float64)

    ours, _ = L.capsule_loss(
        jnp.asarray(scores), jnp.asarray(y), loss_cfg,
        jnp.asarray(x), jnp.asarray(recon))

    ts = torch.from_numpy(scores)
    left = F.relu(0.9 - ts) ** 2
    right = F.relu(ts - 0.1) ** 2
    labels = torch.eye(43)[torch.from_numpy(y)].double()
    margin = (labels * left + 0.5 * (1 - labels) * right).sum()
    rec = 5e-4 * ((torch.from_numpy(x) - torch.from_numpy(recon)) ** 2).sum()
    np.testing.assert_allclose(float(ours), float((margin + rec) / 8),
                               rtol=1e-10)


def _torch_dark_loss(y_pred, y_true, B, C, l_coord, l_noobj, img, g):
    """Independent torch implementation of the reference YOLO loss
    formulas (loss_fns.py:60-142), with the same masked-gather
    structure, for cross-validation of our fixed-shape version."""
    import torch

    y_pred = torch.from_numpy(y_pred)
    y_true = torch.from_numpy(y_true).double()
    bs = y_true.shape[0]

    pb = y_pred[..., : 5 * B].reshape(bs, g, g, B, 5)
    tb = y_true[..., :5].reshape(bs, g, g, 1, 5)
    obj = tb[:, :, :, 0, 0] == 1
    noobj = tb[:, :, :, 0, 0] == 0

    def to_xy(cwh):
        gs = img / g
        out = torch.zeros_like(cwh)
        out[..., 0] = cwh[..., 0] * gs - cwh[..., 2] * img / 2
        out[..., 1] = cwh[..., 1] * gs - cwh[..., 3] * img / 2
        out[..., 2] = cwh[..., 0] * gs + cwh[..., 2] * img / 2
        out[..., 3] = cwh[..., 1] * gs + cwh[..., 3] * img / 2
        return out

    noobj_pc = (pb[noobj][:, :, 0] ** 2).sum()

    t_cwh = tb[obj][:, :, 1:5]
    p_cwh = pb[obj][:, :, 1:5]
    p_pc = pb[obj][:, :, 0]
    n_obj = t_cwh.shape[0]

    p_xy = to_xy(p_cwh)
    t_xy = to_xy(t_cwh)
    lt = torch.max(p_xy[:, :, :2], t_xy[:, :, :2].expand(n_obj, B, 2))
    rb = torch.min(p_xy[:, :, 2:], t_xy[:, :, 2:].expand(n_obj, B, 2))
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    a1 = (p_xy[:, :, 2] - p_xy[:, :, 0]) * (p_xy[:, :, 3] - p_xy[:, :, 1])
    a2 = ((t_xy[:, :, 2] - t_xy[:, :, 0])
          * (t_xy[:, :, 3] - t_xy[:, :, 1])).expand(n_obj, B)
    iou = inter / (a1 + a2 - inter)
    max_iou, max_idx = iou.max(dim=1)

    is_t = torch.zeros_like(iou)
    is_t[range(n_obj), max_idx] = 1
    tm, ntm = is_t == 1, is_t == 0

    noobj_pc = noobj_pc + (p_pc[ntm] ** 2).sum()
    obj_pc = ((p_pc[tm] - max_iou) ** 2).sum()
    xy = ((p_cwh[tm][:, 0:2] - t_cwh[:, 0, 0:2]) ** 2).sum()
    whl = ((torch.sqrt(p_cwh[tm][:, 2:4])
            - torch.sqrt(t_cwh[:, 0, 2:4])) ** 2).sum()
    cls = 0.0
    if C:
        cls = ((y_true[..., 5:][obj] - y_pred[..., 5 * B:][obj]) ** 2).sum()

    loss = (l_coord * xy + l_coord * whl + obj_pc + l_noobj * noobj_pc
            + cls) / bs
    return float(loss), float(max_iou.mean())


def _random_det_batch(rng, bs, g, B, C, n_obj_per_img=2):
    y_pred = rng.rand(bs, g, g, 5 * B + C) * 0.8 + 0.1
    if C:
        cls = y_pred[..., 5 * B:]
        y_pred[..., 5 * B:] = cls / cls.sum(-1, keepdims=True)
    y_true = np.zeros((bs, g, g, 5 + C))
    for i in range(bs):
        for _ in range(n_obj_per_img):
            r, c = rng.randint(0, g, 2)
            y_true[i, r, c, 0:5] = [
                1, rng.rand(), rng.rand(),
                rng.rand() * 0.3 + 0.05, rng.rand() * 0.3 + 0.05]
            if C:
                y_true[i, r, c, 5:] = 0
                y_true[i, r, c, 5 + rng.randint(C)] = 1
    return y_pred, y_true


@pytest.mark.parametrize("C", [0, 43])
def test_dark_loss_matches_torch(rng, C):
    g, B, bs, img = 4, 2, 3, 64
    y_pred, y_true = _random_det_batch(rng, bs, g, B, C)
    cfg = L.LossConfig(n_classes=C, n_boxes=B, n_grid=g, darknet_input=img,
                       l_coord=5.0, l_noobj=0.5)
    ours, aux = L.dark_loss(jnp.asarray(y_pred), jnp.asarray(y_true), cfg)
    theirs, their_iou = _torch_dark_loss(y_pred, y_true, B, C, 5.0, 0.5,
                                         img, g)
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-8)
    np.testing.assert_allclose(float(aux["avg_iou"]), their_iou, rtol=1e-8)


def test_dark_loss_zero_objects(rng):
    """The reference NameErrors on a zero-object batch
    (loss_fns.py:141); we define avg_iou = 0 (COMPAT.md)."""
    g, B, bs = 4, 2, 3
    y_pred = rng.rand(bs, g, g, 5 * B).astype(np.float64)
    y_true = np.zeros((bs, g, g, 5))
    cfg = L.LossConfig(n_classes=0, n_boxes=B, n_grid=g, darknet_input=64)
    loss, aux = L.dark_loss(jnp.asarray(y_pred), jnp.asarray(y_true), cfg)
    assert np.isfinite(float(loss))
    assert float(aux["avg_iou"]) == 0.0
    # only the noobj term should remain
    expected = 0.5 * np.sum(y_pred.reshape(bs, g, g, B, 5)[..., 0] ** 2) / bs
    np.testing.assert_allclose(float(loss), expected, rtol=1e-8)


def test_dark_loss_gradients_finite(rng):
    import jax

    g, B, C, bs = 4, 2, 43, 2
    y_pred, y_true = _random_det_batch(rng, bs, g, B, C)
    cfg = L.LossConfig(n_classes=C, n_boxes=B, n_grid=g, darknet_input=64)

    def f(p):
        return L.dark_loss(p, jnp.asarray(y_true), cfg)[0]

    grad = jax.grad(f)(jnp.asarray(y_pred))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_darkcapsule_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    g, bs, C = 4, 3, 43
    caps = rng.randn(bs, g, g, 5).astype(np.float64) * 0.3
    y = np.zeros((bs, g, g, 5 + C))
    y[:, 1, 2, 0:5] = [1, 0.3, 0.7, 0.2, 0.4]

    cfg = L.LossConfig(n_classes=C, n_grid=g, recon=True)
    ours, _ = L.darkcapsule_loss(jnp.asarray(caps), jnp.asarray(y), cfg)

    # independent torch version of loss_fns.py:187-204 (without recon)
    tc = torch.from_numpy(caps)
    ty = torch.from_numpy(y).double()
    from test_polar import _torch_polar

    y_r, y_phi = _torch_polar(y[..., :5])
    y_r, y_phi = torch.from_numpy(y_r), torch.from_numpy(y_phi)
    cap_r = (tc ** 2).sum(dim=-1) ** 0.5
    left = F.relu(0.9 - cap_r) ** 2
    right = F.relu(cap_r - 0.1) ** 2
    margin = y_r * left + 0.5 * (1 - y_r) * right
    coord = -tc * y_phi
    expected = (margin.sum() + coord.sum()) / bs
    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-10)


def test_dark_loss_grad_finite_with_underflowed_wh(rng):
    """A sigmoid-underflowed (exactly 0) w/h in a MASKED-OUT box — a
    no-object cell or a non-responsible box — must not NaN the
    gradient: sqrt'ing every lane gives those entries a 0 * inf
    cotangent.  The reference only sqrt's gathered responsible boxes
    (loss_fns.py:127), so the masked rewrite must not widen the
    failure surface."""
    import jax

    g, B, C, bs = 4, 2, 3, 2
    y_pred = rng.rand(bs, g, g, 5 * B + C).astype(np.float64)
    y_true = np.zeros((bs, g, g, 5 + C))
    # one object cell so both branches of the loss are active
    y_true[:, 1, 1, 0] = 1.0
    y_true[:, 1, 1, 1:5] = [0.5, 0.5, 0.25, 0.25]
    y_true[:, 1, 1, 5] = 1.0
    # underflow w/h to exactly 0 in a no-object cell's boxes AND in the
    # object cell's (likely non-responsible) second box
    boxes = y_pred[..., : 5 * B].reshape(bs, g, g, B, 5)
    boxes[:, 0, 0, :, 3:5] = 0.0
    boxes[:, 1, 1, 1, 3:5] = 0.0
    cfg = L.LossConfig(n_classes=C, n_boxes=B, n_grid=g, darknet_input=64)

    def f(p):
        return L.dark_loss(p, jnp.asarray(y_true), cfg)[0]

    loss = f(jnp.asarray(y_pred))
    grad = jax.grad(f)(jnp.asarray(y_pred))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()

"""Loss functions — pure jnp, static shapes, jit-safe.

Covers the reference loss suite (reference loss_fns.py): cnn_loss,
capsule_loss, dark_loss (YOLO-v1) and darkcapsule_loss (+ the unused
variants darkcapsule2/3_loss for inventory completeness).

The central TPU-native rewrite is `dark_loss`: the reference gathers
object cells with boolean advanced indexing (loss_fns.py:87-133),
producing data-dependent shapes XLA cannot compile.  Here every cell is
computed and multiplied by obj/noobj masks — identical numerics, fixed
shapes, one fused XLA program.  The reference's side-channel
`params.avg_iou = mean(max_iou)` (loss_fns.py:141) becomes an explicit
aux output, and the zero-object batch that NameErrors in the reference
yields avg_iou=0 here (COMPAT.md).

All losses share the signature
    loss_fn(y_hat, y, cfg, x=None, recon=None) -> (loss, aux_dict)
where cfg is a `LossConfig` of static floats/ints (hashable for jit).
"""

import dataclasses

import jax
import jax.numpy as jnp

from .ops.boxes import cwh_to_xy_grid, iou_xy
from .ops.polar import polar_transform


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss hyperparameters extracted from Params."""

    n_classes: int = 43
    n_boxes: int = 2
    n_grid: int = 14
    darknet_input: int = 448
    l_coord: float = 5.0
    l_noobj: float = 0.5
    recon: bool = True
    recon_coef: float = 5e-4

    @classmethod
    def from_params(cls, params):
        return cls(
            n_classes=int(params.get("n_classes", 43)),
            n_boxes=int(params.get("n_boxes", 2)),
            n_grid=int(params.get("n_grid", 14)),
            darknet_input=int(params.get("darknet_input", 448)),
            l_coord=float(params.get("l_coord", 5.0)),
            l_noobj=float(params.get("l_noobj", 0.5)),
            recon=bool(params.get("recon", True)),
            recon_coef=float(params.get("recon_coef", 5e-4)),
        )


def cnn_loss(scores, y, cfg: LossConfig, x=None, recon=None):
    """Softmax cross-entropy, sum over batch / batch_size.

    Reference parity: loss_fns.py:6-8.
    """
    logp = jax.nn.log_softmax(scores, axis=1)
    picked = jnp.take_along_axis(logp, y[:, None], axis=1)
    return -jnp.sum(picked) / y.shape[0], {}


def capsule_loss(scores, y, cfg: LossConfig, x=None, recon=None):
    """Margin loss + optional reconstruction MSE (sum-reduced) / batch.

    Reference parity: loss_fns.py:11-23 — margin
    T*relu(0.9-s)^2 + 0.5*(1-T)*relu(s-0.1)^2 summed over all entries.
    """
    left = jax.nn.relu(0.9 - scores) ** 2
    right = jax.nn.relu(scores - 0.1) ** 2
    labels = jax.nn.one_hot(y, cfg.n_classes, dtype=scores.dtype)
    margin = labels * left + 0.5 * (1.0 - labels) * right
    loss = jnp.sum(margin)

    if cfg.recon and recon is not None:
        loss = loss + cfg.recon_coef * jnp.sum((x - recon) ** 2)
    return loss / y.shape[0], {}


def dark_loss(y_pred, y_true, cfg: LossConfig, x=None, recon=None):
    """YOLO-v1 loss, masked fixed-shape formulation.

    y_pred: (batch, g, g, 5*B + C); y_true: (batch, g, g, 5 + C).
    Returns (loss, {'avg_iou': mean max-IoU over object cells}).

    Reference parity: loss_fns.py:60-142.  Per object cell the
    responsible box is the one of the B predictions with max IoU
    against the target (both converted to a shared grid-scaled corner
    frame, utils.py:353-371, fully detached); losses:
      * responsible pc -> (pc - iou)^2,
      * xy L2 and (sqrt w / sqrt h) L2 with weight l_coord,
      * pc^2 of no-object cells AND non-responsible boxes in object
        cells, both accumulated into one term scaled by l_noobj
        (loss_fns.py:87-89, :113-114),
      * class L2 on object cells;
    total divided by batch size.
    """
    y_true = y_true.astype(y_pred.dtype)
    B, C = cfg.n_boxes, cfg.n_classes
    batch_size, g = y_true.shape[0], y_true.shape[1]

    pred_boxes = y_pred[..., : 5 * B].reshape(batch_size, g, g, B, 5)
    true_boxes = y_true[..., :5].reshape(batch_size, g, g, 1, 5)

    obj = (true_boxes[:, :, :, 0, 0] == 1.0).astype(y_pred.dtype)
    noobj = (true_boxes[:, :, :, 0, 0] == 0.0).astype(y_pred.dtype)

    pred_pc = pred_boxes[..., 0]                       # (b,g,g,B)
    pred_cwh = pred_boxes[..., 1:5]
    true_cwh = true_boxes[..., 1:5]                    # (b,g,g,1,4)

    # no-object cells: sum of pc^2 over all B boxes
    noobj_loss_pc = jnp.sum(noobj[..., None] * pred_pc**2)

    # IoU of every predicted box vs its cell's target, shared frame
    pred_xy = cwh_to_xy_grid(pred_cwh, cfg.darknet_input, g)
    true_xy = cwh_to_xy_grid(
        jax.lax.stop_gradient(true_cwh), cfg.darknet_input, g
    )
    # also stop-gradient through the predicted corner frame: the
    # reference detaches BOTH conversions (utils.py:370)
    pred_xy = jax.lax.stop_gradient(pred_xy)
    iou = iou_xy(pred_xy, true_xy)[..., 0]             # (b,g,g,B)
    iou = jnp.nan_to_num(iou)                          # empty target boxes -> 0/0
    max_iou = jnp.max(iou, axis=-1)                    # (b,g,g)
    responsible = jax.nn.one_hot(
        jnp.argmax(iou, axis=-1), B, dtype=y_pred.dtype
    )                                                  # (b,g,g,B)

    obj_b = obj[..., None]                             # (b,g,g,1)

    # boxes in object cells that are NOT responsible join the noobj term
    noobj_loss_pc = noobj_loss_pc + jnp.sum(
        obj_b * (1.0 - responsible) * pred_pc**2
    )

    # responsible boxes: confidence regressed to the (detached) IoU
    obj_loss_pc = jnp.sum(
        obj_b * responsible
        * (pred_pc - jax.lax.stop_gradient(max_iou)[..., None]) ** 2
    )

    resp = (obj_b * responsible)[..., None]            # (b,g,g,B,1)
    obj_loss_xy = jnp.sum(resp * (pred_cwh[..., 0:2] - true_cwh[..., 0:2]) ** 2)
    # sqrt only where the mask selects: sqrt'ing EVERY box would give
    # masked-out lanes with an exactly-underflowed w/h (sigmoid -> 0.0)
    # a 0 * inf = NaN cotangent that poisons the shared weights — a
    # failure surface the reference's gathered formulation
    # (loss_fns.py:127) never has.  Responsible boxes keep the
    # reference's exact semantics, including torch's inf-grad-at-0 edge
    # (SURVEY §7 "sqrt w gradients at 0").
    resp_on = resp > 0
    wh_safe = jnp.where(resp_on, jnp.maximum(pred_cwh[..., 2:4], 0.0), 1.0)
    obj_loss_wh = jnp.sum(jnp.where(
        resp_on,
        (jnp.sqrt(wh_safe) - jnp.sqrt(true_cwh[..., 2:4])) ** 2,
        0.0,
    ))

    if C != 0:
        pred_cls = y_pred[..., 5 * B :]
        true_cls = y_true[..., 5:]
        obj_loss_class = jnp.sum(obj[..., None] * (true_cls - pred_cls) ** 2)
    else:
        obj_loss_class = 0.0

    loss = (
        cfg.l_coord * obj_loss_xy
        + cfg.l_coord * obj_loss_wh
        + obj_loss_pc
        + cfg.l_noobj * noobj_loss_pc
        + obj_loss_class
    ) / batch_size

    n_obj = jnp.sum(obj)
    avg_iou = jnp.where(n_obj > 0, jnp.sum(obj * max_iou) / jnp.maximum(n_obj, 1.0), 0.0)
    return loss, {"avg_iou": avg_iou}


def darkcapsule_loss(caps, y, cfg: LossConfig, x=None, recon=None):
    """Capsule detection loss: margin on capsule norm vs presence +
    alignment of capsule orientation with the polar-transformed target.

    caps: (batch, g, g, 5); y: (batch, g, g, 5 + C).
    Reference parity: loss_fns.py:187-204.  NOTE the reference adds the
    reconstruction MSE OUTSIDE the /batch division (loss_fns.py:203) —
    reproduced; and its recon branch crashes when recon is None while
    params.recon is True (main.py never passes recon for darkcapsule) —
    here the branch simply requires recon to be provided (COMPAT.md).
    """
    y = y.astype(caps.dtype)
    y_r, y_phi = polar_transform(y[..., :5])

    cap_r = jnp.sqrt(jnp.sum(caps**2, axis=-1))
    left = jax.nn.relu(0.9 - cap_r) ** 2
    right = jax.nn.relu(cap_r - 0.1) ** 2
    margin = y_r * left + 0.5 * (1.0 - y_r) * right

    coord = -caps * y_phi

    loss = (jnp.sum(margin) + jnp.sum(coord)) / y.shape[0]
    if cfg.recon and recon is not None:
        loss = loss + jnp.sum((x - recon) ** 2)
    return loss, {}


def darkcapsule2_loss(caps, y, cfg: LossConfig, x=None, recon=None):
    """Unused reference variant (loss_fns.py:145-160)."""
    y = y.astype(caps.dtype)
    caps = caps * jnp.sqrt(2.0)
    y_r, y_phi = polar_transform(y[..., :5])
    y_cls = y[..., 5:]
    cap_phi, cap_cls = caps[..., :5], caps[..., 5:]

    cap_r = jnp.sqrt(jnp.sum(caps**2, axis=-1))
    left = jax.nn.relu(0.9 - cap_r) ** 2
    right = jax.nn.relu(cap_r - 0.1) ** 2
    obj_loss = y_r * left + 0.5 * (1.0 - y_r) * right

    coord_loss = -cap_phi * y_phi
    class_loss = (cap_cls - y_cls) ** 2
    total = jnp.sum(obj_loss) + jnp.sum(coord_loss) + jnp.sum(class_loss)
    return total / y.shape[0], {}


def darkcapsule3_loss(caps, y, cfg: LossConfig, x=None, recon=None):
    """Unused reference variant (loss_fns.py:163-184)."""
    y = y.astype(caps.dtype)
    caps = caps * jnp.sqrt(2.0)
    y_r, y_phi = polar_transform(y[..., :5])
    y_cls = y[..., 5:]
    cap_phi, cap_other = caps[..., :5], caps[..., 5:]

    cap_r = jnp.sqrt(jnp.sum(cap_other**2, axis=-1))
    left = jax.nn.relu(0.9 - cap_r) ** 2
    right = jax.nn.relu(cap_r - 0.1) ** 2
    y_cls = y_cls * y_r[..., None]

    margin = y_cls * left + 0.5 * (1.0 - y_cls) * right
    coord = -cap_phi * y_phi[..., None, :]

    loss = (jnp.sum(margin) + jnp.sum(coord)) / y.shape[0]
    if cfg.recon and recon is not None:
        loss = loss + jnp.sum((x - recon) ** 2)
    return loss, {}


LOSS_REGISTRY = {
    "cnn": cnn_loss,
    "capsule": capsule_loss,
    "darknet_d": dark_loss,
    "darknet_r": dark_loss,
    "darkcapsule": darkcapsule_loss,
}

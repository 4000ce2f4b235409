"""Detection metrics: IoU confusion, 11-point AP sweeps, F1 scores.

Reference parity: metrics.py:99-370.  The reference's detect_AP
re-decodes the full batch and runs four nested Python loops for every
(iou_th, conf_th) pair — O(10*100*images*G*P) scalar IoU calls.  Here
each image is decoded ONCE keeping per-box confidences, the pairwise
IoU matrix is computed once, and the whole (10 x 100) threshold sweep
is evaluated as a batched boolean reduction — identical numbers,
orders of magnitude faster.  A C++ kernel (native/) can accelerate the
per-image reduction further; numpy is the portable default.
"""

import numpy as np

from .. import config
from ..ops import boxes as box_ops

IOU_THS = np.linspace(0.5, 0.95, 10)
CONF_THS = np.linspace(0, 1, 100)


# ---------------------------------------------------------------------------
# Reference-parity scalar API (metrics.py:99-190)
# ---------------------------------------------------------------------------

def calc_iou_individual(gt_box, pred_box):
    """IoU of one gt and one pred corner box.

    Scalar entry point kept for reference-parity of the metric API
    (its numbers match reference metrics.py:99-133, including the
    exact-0 return for non-overlapping boxes and the assertion on
    inverted corners); computation delegates to the vectorized matrix
    below rather than scalar arithmetic.
    """
    gt = np.asarray(gt_box, dtype=float)
    pred = np.asarray(pred_box, dtype=float)
    for name, b in (("pred", pred), ("gt", gt)):
        if b[2] < b[0] or b[3] < b[1]:
            raise AssertionError(
                f"inverted corners in {name} box {b.tolist()}")
    return float(_pairwise_iou(gt[None, :], pred[None, :])[0, 0])


def _pairwise_iou(gt_xy, pred_xy):
    """(G,4) x (P,4) -> (G,P) IoU matrix (vectorized calc_iou_individual)."""
    if gt_xy.shape[0] == 0 or pred_xy.shape[0] == 0:
        return np.zeros((gt_xy.shape[0], pred_xy.shape[0]))
    g = gt_xy[:, None, :]
    p = pred_xy[None, :, :]
    lt = np.maximum(g[..., :2], p[..., :2])
    rb = np.minimum(g[..., 2:], p[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_g = (g[..., 2] - g[..., 0]) * (g[..., 3] - g[..., 1])
    area_p = (p[..., 2] - p[..., 0]) * (p[..., 3] - p[..., 1])
    # the scalar reference returns exactly 0 when boxes don't touch
    return np.where(inter > 0, inter / (area_g + area_p - inter), 0.0)


def single_img_confusion(y_, y_hat_, iou_th):
    """tp/fp/fn for one image at one IoU threshold.

    Reference parity: metrics.py:136-147 — a gt counts as hit if ANY
    pred overlaps it above iou_th; a pred counts as hit if it overlaps
    ANY gt.
    """
    iou = _pairwise_iou(np.asarray(y_), np.asarray(y_hat_))
    hits = iou > iou_th
    n_gt_hit = int(hits.any(axis=1).sum())
    n_pred_hit = int(hits.any(axis=0).sum())
    n1, n2 = iou.shape
    return n_gt_hit, n2 - n_pred_hit, n1 - n_gt_hit


def precision_and_recall(tp, fp, fn):
    """Reference parity: metrics.py:150-160."""
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    return precision, recall


def average_precision(p, r):
    """11-point interpolated AP.  Reference parity: metrics.py:180-190."""
    p, r = np.asarray(p), np.asarray(r)
    prec_at_rec = []
    for recall_level in np.linspace(0.0, 1.0, 11):
        idx = np.flatnonzero(r >= recall_level)
        prec_at_rec.append(np.max(p[idx]) if idx.size else 0.0)
    return float(np.mean(prec_at_rec))


def plot_pr_curve(p, r, label=None, color=None, ax=None, name="default"):
    """Scatter one PR series onto `ax` (created on first call).

    Produces the same artifact class as the reference's PR plots
    (metrics.py:163-177): recall on x, precision on y, axes padded past
    1.0 so points at exactly 1.0 stay visible, one labeled series per
    IoU threshold accumulated onto a shared Axes.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(10, 8))
    ax.scatter(np.asarray(r), np.asarray(p), s=20,
               color=color if color is not None else config.colors[0],
               label=label)
    pad = 1.1  # keep the (1.0, 1.0) corner inside the frame
    ax.set(xlabel="recall", ylabel="precision",
           xlim=(0.0, pad), ylim=(0.0, pad),
           title=f"Precision-Recall curve for {name}")
    return ax


# ---------------------------------------------------------------------------
# Vectorized decode + sweep machinery (TPU-build fast path)
# ---------------------------------------------------------------------------

def decode_with_conf(y, params, image_hw=None):
    """Decode every grid cell/box with its confidence retained.

    Same geometry as ops.boxes.y_to_boxes_vec (reference
    utils.py:288-334) but without thresholding, so one decode serves
    every confidence threshold of the sweep.

    Returns per-image lists: conf (Ni,), xy (Ni, 4), cls (Ni,) or None.
    """
    y = np.asarray(y)
    batch, g, _, D = y.shape
    C = params.n_classes
    B = int((D - C) / 5)

    if B <= 0:
        # Reference quirk, reproduced: detect_and_recog_mAP mutates
        # n_classes to 43 (metrics.py:285), so on the darknet_d
        # (C=0) --combine leg the 5-channel ground truth decodes with
        # C=43 -> negative B.  numpy's reshape treats the negative dim
        # as "infer" over the empty channel slice, and np.argwhere of
        # the empty mask emits nothing (utils.py:307-331): zero boxes,
        # never a crash.  The combine metrics then come out nan/0 on
        # both sides — tests/test_predict_reference_parity.py pins it.
        empty_cls = None if C == 0 else np.zeros(0, np.int64)
        return [{"conf": np.zeros(0, np.float32),
                 "xy": np.zeros((0, 4), np.float64),
                 "cls": empty_cls} for _ in range(batch)]

    yb = y[..., : 5 * B].reshape(batch, g, g, B, 5)
    conf = yb[..., 0].reshape(batch, -1)

    rows, cols = np.meshgrid(np.arange(g), np.arange(g), indexing="ij")
    grid_idx = np.stack([rows, cols], -1)[None, :, :, None, :]
    grid_idx = np.broadcast_to(grid_idx, (batch, g, g, B, 2)).reshape(-1, 2)

    cwh_flat = yb[..., 1:5].reshape(-1, 4)
    if image_hw is None:
        hw = (params.darknet_input, params.darknet_input)
        hw_flat = hw
    else:
        hw_flat = np.repeat(np.asarray(image_hw), g * g * B, axis=0)
    cwh_px = box_ops.denorm_boxes_cwh_vec(hw_flat, g, cwh_flat, grid_idx)
    xy = box_ops.cwh_to_xy_vec(cwh_px).reshape(batch, -1, 4)

    if C != 0:
        cls = np.argmax(y[..., 5 * B :], axis=-1)             # (batch,g,g)
        cls = np.broadcast_to(cls[..., None], (batch, g, g, B)).reshape(batch, -1)
    else:
        cls = None

    out = []
    for i in range(batch):
        out.append({
            "conf": conf[i],
            "xy": xy[i],
            "cls": None if cls is None else cls[i],
        })
    return out


def confusion_sweep(gt, pred, iou_ths, conf_ths, cls_filter=None,
                    use_native=True):
    """TP/FP/FN over the full (iou_th x conf_th) grid, all images.

    gt/pred: outputs of decode_with_conf.  cls_filter: restrict both
    sets to one class id.  Thresholding is strict `conf > th`, matching
    the reference decode (utils.py:313).

    Dispatches to the C++ kernel (native/confusion.cpp via ctypes) when
    available; the numpy path below is the portable reference
    implementation (parity-tested in tests/test_metrics.py).
    """
    if use_native:
        from ._native import confusion_sweep_native

        out = confusion_sweep_native(gt, pred, iou_ths, conf_ths, cls_filter)
        if out is not None:
            return out

    iou_ths = np.asarray(iou_ths)
    conf_ths = np.asarray(conf_ths)
    nI, nC = iou_ths.size, conf_ths.size
    TP = np.zeros((nI, nC), np.int64)
    FP = np.zeros((nI, nC), np.int64)
    FN = np.zeros((nI, nC), np.int64)

    for gt_i, pr_i in zip(gt, pred):
        g_keep = slice(None) if cls_filter is None else (gt_i["cls"] == cls_filter)
        p_keep = slice(None) if cls_filter is None else (pr_i["cls"] == cls_filter)
        g_conf, g_xy = gt_i["conf"][g_keep], gt_i["xy"][g_keep]
        p_conf, p_xy = pr_i["conf"][p_keep], pr_i["xy"][p_keep]

        gmask = g_conf[None, :] > conf_ths[:, None]           # (nC,G)
        pmask = p_conf[None, :] > conf_ths[:, None]           # (nC,P)
        n_gt = gmask.sum(-1)                                  # (nC,)
        n_pred = pmask.sum(-1)

        iou = _pairwise_iou(g_xy, p_xy)                       # (G,P)
        hits = iou[None] > iou_ths[:, None, None]             # (nI,G,P)

        # gt hit by any included pred / pred hitting any included gt
        gt_hit = (hits[:, None] & pmask[None, :, None, :]).any(-1)   # (nI,nC,G)
        tp = (gt_hit & gmask[None]).sum(-1)                   # (nI,nC)
        pred_hit = (hits[:, None] & gmask[None, :, :, None]).any(-2) # (nI,nC,P)
        n_pred_hit = (pred_hit & pmask[None]).sum(-1)

        TP += tp
        FP += n_pred[None] - n_pred_hit
        FN += n_gt[None] - tp

    return TP, FP, FN


def _pr_curves(TP, FP, FN):
    with np.errstate(divide="ignore", invalid="ignore"):
        p = np.where(TP + FP > 0, TP / np.maximum(TP + FP, 1), 0.0)
        r = np.where(TP + FN > 0, TP / np.maximum(TP + FN, 1), 0.0)
    return p, r


# ---------------------------------------------------------------------------
# Public metric functions (reference metrics.py:193-370)
# ---------------------------------------------------------------------------

def detect_AP(y, y_hat, params, show=False, save=False, save_dir=None):
    """COCO-style AP: 11-point AP averaged over IoU .5:.05:.95, with a
    100-point confidence sweep.  Reference parity: metrics.py:193-242.
    """
    gt = decode_with_conf(y, params)
    pred = decode_with_conf(y_hat, params)
    TP, FP, FN = confusion_sweep(gt, pred, IOU_THS, CONF_THS)
    p, r = _pr_curves(TP, FP, FN)

    ax = None
    avg_ps = []
    for i, iou_th in enumerate(IOU_THS):
        avg_ps.append(average_precision(p[i], r[i]))
        if show or save:
            ax = plot_pr_curve(p[i], r[i], label="iou={:.2f}".format(iou_th),
                               color=config.colors[i * 2], ax=ax,
                               name=params.model)
    if show or save:
        import matplotlib.pyplot as plt
        plt.legend()
        if save:
            if save_dir is None:
                save_dir = config.model_dir[params.model]
            plt.savefig(save_dir + "/d_AP.png")
        if show:
            plt.show()
    return float(np.mean(avg_ps))


def detect_acc(y, y_hat, params):
    """F1 at conf .5 / IoU .5.  Reference parity: metrics.py:245-261."""
    gt = decode_with_conf(y, params)
    pred = decode_with_conf(y_hat, params)
    TP, FP, FN = confusion_sweep(gt, pred, [0.5], [0.5])
    p, r = precision_and_recall(int(TP[0, 0]), int(FP[0, 0]), int(FN[0, 0]))
    return 2 * p * r / (p + r + 1e-8)


def detect_and_recog_acc(y, y_hat, params, show=False, save=False):
    """Class-wise F1 at conf .5 / IoU .5.

    Reference parity: metrics.py:264-281 (confusion accumulated per
    class then a single F1).
    """
    gt = decode_with_conf(y, params)
    pred = decode_with_conf(y_hat, params)
    TP = FP = FN = 0
    for c in range(params.n_classes):
        tp, fp, fn = confusion_sweep(gt, pred, [0.5], [0.5], cls_filter=c)
        TP += int(tp[0, 0])
        FP += int(fp[0, 0])
        FN += int(fn[0, 0])
    p, r = precision_and_recall(TP, FP, FN)
    return 2 * p * r / (p + r + 1e-8)


def detect_and_recog_mAP(y, y_hat, params, show=False, save=False, save_dir=None):
    """Per-class COCO-style AP averaged over classes present in gt.

    Reference parity: metrics.py:284-339 (including forcing
    n_classes=43, metrics.py:285, and per-class PR PNG artifacts).
    """
    params.n_classes = 43
    gt = decode_with_conf(y, params)
    pred = decode_with_conf(y_hat, params)

    avg_ps = []
    for c in range(params.n_classes):
        TP, FP, FN = confusion_sweep(gt, pred, IOU_THS, CONF_THS, cls_filter=c)
        p, r = _pr_curves(TP, FP, FN)
        ax = None
        if show or save:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.figure(c, figsize=(10, 8))
            ax = plt.gca()
        for i, iou_th in enumerate(IOU_THS):
            avg_ps.append(average_precision(p[i], r[i]))
            if show or save:
                ax = plot_pr_curve(p[i], r[i], label="iou={:.2f}".format(iou_th),
                                   color=config.colors[i * 2], ax=ax,
                                   name=params.model)
        if save:
            import matplotlib.pyplot as plt
            plt.legend()
            if save_dir is None:
                save_dir = config.model_dir[params.model]
            plt.savefig(save_dir + "/d&r_mAP_class_{}.png".format(c))
        if show:
            import matplotlib.pyplot as plt
            plt.legend()
            plt.show()

    y = np.asarray(y)
    present = np.sign(y[:, :, :, 5:].reshape(-1, 43).sum(axis=0)) > 0
    avg_ps = np.asarray(avg_ps).reshape(params.n_classes, -1)[present]
    return float(np.mean(avg_ps))


def darkcapsule_acc(y, y_hat, params):
    """Detection F1 for the 43-capsule darkcapsule3 head, packed as
    int(p*100)+r.  Reference parity: metrics.py:342-370 (expects
    y_hat of shape (B, g, g, 43, 21)).
    """
    y = np.asarray(y)
    y_hat = np.asarray(y_hat) * np.sqrt(2)
    y_cls = y[:, :, :, 5:]
    cap_other = y_hat[:, :, :, :, 5:]
    pred_cls = np.argmax(np.sqrt(np.sum(cap_other**2, -1)), -1)
    b, g, _ = pred_cls.shape
    pred_onehot = np.eye(params.n_classes)[pred_cls.reshape(-1)].reshape(b, g, g, -1)

    combined = np.sum(y_hat * np.expand_dims(y_cls, 4), 3).squeeze()
    combined = np.concatenate((combined[:, :, :, :5], pred_onehot), 3)

    gt = decode_with_conf(y, params)
    pred = decode_with_conf(combined, params)
    TP, FP, FN = confusion_sweep(gt, pred, [0.5], [0.5])
    p, r = precision_and_recall(int(TP[0, 0]), int(FP[0, 0]), int(FN[0, 0]))
    return int(p * 100) + r


def darkcapsule_cell_f1(y, y_hat, params):
    """Cell-presence F1 for DarkCapsuleNet's (B, g, g, 5) output.

    Our binding for the 'darkcapsule' train metric: the reference's
    effective registry row (detect_and_recog_acc, main.py:264) cannot
    consume a 5-channel capsule grid and crashes — see COMPAT.md.
    Presence prediction = capsule norm > 0.5 vs. the target's
    objectness bit.
    """
    y = np.asarray(y)
    y_hat = np.asarray(y_hat)
    cap_r = np.sqrt(np.sum(y_hat**2, axis=-1))
    pred = cap_r > 0.5
    true = y[..., 0] == 1
    tp = np.sum(pred & true)
    fp = np.sum(pred & ~true)
    fn = np.sum(~pred & true)
    p, r = precision_and_recall(int(tp), int(fp), int(fn))
    return 2 * p * r / (p + r + 1e-8)

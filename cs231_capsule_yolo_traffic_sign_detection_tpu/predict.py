"""Batch inference pipelines (predict mode).

Reference parity: predict_fns.py — checkpoint-restoring batch
inference, grid decode, drawing, and the two-stage darknet ->
cnn/capsule composition.

TPU-native: the forward pass AND the grid decode (confidence top-k)
run in one jitted program on device (`ops.decode.decode_grid`); only
the final ragged box lists and cv2 drawing are host-side.  The
reference runs decode in numpy per batch (predict_fns.py:46).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from . import viz
from .losses import LossConfig
from .models import build_model
from .ops import decode as decode_ops
from .parallel import mesh as par
from .train import checkpoint as ckpt
from .train.driver import model_input_shape
from .train.steps import init_variables, make_predict_step


def _dtype_name(params):
    """Normalized --dtype spelling for the serving-path branches.

    Mirrors models.registry._compute_dtype's alias set so 'bf16' and
    'bfloat16' (and 'f32'/'float32') select the same numerics here —
    previously the aliases silently diverged on the predict paths.
    """
    name = str(params.get("compute_dtype", "float32")).lower()
    if name in ("bfloat16", "bf16"):
        return "bfloat16"
    if name in ("float32", "f32", ""):
        return "float32"
    return name


def restore_variables(params, model_dir, restore_file):
    """Build the model and restore its variables from last/best.ckpt.

    Weights only — no optimizer moments are ever built (the reference's
    predict path also restores the model alone, predict_fns.py:32-34),
    and the model is traced once (init) instead of twice (init + first
    train step) as the old Trainer-based restore did.
    """
    model = build_model(params)
    needs_labels = (
        params.model == "capsule" and LossConfig.from_params(params).recon
    )
    variables, _ = init_variables(
        model, model_input_shape(params), seed=int(params.get("seed", 0)),
        batch_size=2, needs_labels=needs_labels)
    restore_path = ckpt.checkpoint_path(model_dir, restore_file)
    print("Restoring parameters from {}".format(restore_path))
    fallbacks = [model_dir + str(params.get("train_frac", 1))]
    raw = ckpt.load_checkpoint(restore_path, target=None,
                               fallback_dirs=fallbacks)
    # the checkpoint serializes the full TrainState; deserialize only
    # the weight collections against the freshly-initialized template
    template = {"params": variables["params"]}
    saved = {"params": raw["state"]["params"]}
    if "batch_stats" in variables and variables.get("batch_stats"):
        template["batch_stats"] = variables["batch_stats"]
        saved["batch_stats"] = raw["state"]["batch_stats"]
    restored = serialization.from_state_dict(template, saved)

    mesh = par.maybe_make_mesh(params.get("mesh", "off"))
    if mesh is not None:  # replicate weights across the mesh for predict
        restored = jax.device_put(restored, par.replicated_sharding(mesh))
    return model, restored, mesh


def _batched_forward(step, variables, x, batch_size, mesh=None):
    """All batches dispatched async, concatenated on device.

    Returns a DEVICE array: fetching per batch would pay one tunnel
    round-trip per batch, and callers that decode on device would
    re-upload the result.  Callers fetch once via np.asarray when they
    need host data.
    """
    outs = []
    cpu_mesh = mesh is not None and jax.default_backend() == "cpu"
    for i in range(0, x.shape[0], batch_size):
        xb = x[i : i + batch_size]
        if mesh is not None:
            xb = par.place_batch(jnp.asarray(xb), mesh)
        outs.append(step(variables, xb))
        if cpu_mesh and len(outs) % par.CPU_MESH_QUEUE == 0:
            # bound the queue: jaxlib 0.9.0's in-process CPU
            # collectives intermittently trip their rendezvous timeout
            # under deep multi-partition queues (see
            # Trainer._throttle_mesh_queue)
            jax.block_until_ready(outs[-1])
    if cpu_mesh:
        # drain before the wide fan-in: a many-ary concat dispatched
        # onto a deep queue of multi-partition programs can deadlock
        # jaxlib 0.9.0's CPU collective rendezvous (see
        # Trainer._drain_before_fanin).  CPU backend only — on a real
        # TPU mesh the deadlock does not exist and the extra host sync
        # would forfeit dispatch/concat overlap.
        jax.block_until_ready(outs)
    out = jnp.concatenate(outs, axis=0)
    # multi-process: the batch-sharded output spans non-addressable
    # devices, so callers' np.asarray would raise; all-gather to a
    # replicated (fully addressable) array.  No-op single-process.
    return par.gather_replicated(out, mesh)


def dark_pred(images, model_dir, params, restore_file, is_end=True,
              conf_th=0.5, y=None, use_nms=False):
    """Darknet detection inference.

    Reference parity: predict_fns.py:10-58.  Returns
      is_end:  (y_hat grid, annotated images)
      else:    (y_hat grid, crops, image_indices, boxes_xy)
    """
    import cv2

    model, variables, mesh = restore_variables(params, model_dir, restore_file)
    dtype_s = _dtype_name(params)
    use_int8 = dtype_s == "int8"
    if dtype_s == "bfloat16":
        # honor --dtype bfloat16 on the serving path like the exported
        # artifact does (export.make_detector_fn): bf16 weights + input,
        # f32 grid out.  Previously only int8 engaged here and bf16
        # silently served f32.
        from .export import _cast_variables

        variables = _cast_variables(variables, jnp.bfloat16)
        step = jax.jit(lambda v, xb: model.apply(
            v, xb.astype(jnp.bfloat16), train=False).astype(jnp.float32))
    elif not use_int8:
        step = make_predict_step(model)

    image_hw = np.array([image.shape[0:2] for image in images])
    size = model_input_shape(params)[0]

    x = None
    if params.get("device_preprocess", False):
        from .ops.preprocess import preprocess_images

        x = preprocess_images(images, size)  # None if ragged shapes
    if x is None:
        x = np.stack(
            [cv2.resize(im, (size, size)) for im in images]
        ).astype(np.float32)

    if use_int8:
        # opt-in quantized serving (--dtype int8, COMPAT.md #24): BN
        # folded + symmetric int8 weights, static activation scales
        # calibrated on the first batch (removes the dynamic abs-max
        # pass; later batches saturate beyond the calibrated range,
        # the standard static-int8 tradeoff)
        from .ops import quant

        variables = quant.quantize_darknet(
            variables, x_cal=jnp.asarray(x[: params.batch_size]))
        if mesh is not None:
            variables = jax.device_put(
                variables, par.replicated_sharding(mesh))
        nb, nc = int(params.n_boxes), int(params.n_classes)
        # static scales admit the int8-resident chain: inter-layer
        # activations stay int8 in HBM (bit-identical outputs,
        # tests/test_quant.py)
        step = jax.jit(lambda q, xb: quant.darknet_int8_resident_apply(
            q, xb, n_boxes=nb, n_classes=nc))

    y_hat_dev = _batched_forward(step, variables, x, params.batch_size, mesh)
    y_hat = np.asarray(y_hat_dev)  # single D2H for the host consumers

    # max_boxes defaults to ALL g*g*B candidates: the reference returns
    # every above-threshold box (utils.py:288-334), so a smaller static
    # cap would silently drop detections in dense scenes
    decoded = decode_ops.decode_grid(
        y_hat_dev,
        n_classes=params.n_classes,
        n_boxes=params.n_boxes,
        img_size=size,
        conf_th=conf_th,
    )
    if use_nms:
        decoded = dict(decoded)
        decoded["valid"] = decode_ops.nms_mask(
            decoded["xy"], decoded["conf"], decoded["valid"])
    image_indices, boxes_xy, classes = decode_ops.to_flat_host(
        decoded, image_hw=image_hw, img_size=size,
        with_classes=params.n_classes != 0)

    output_images, crops_bch = viz.draw_boxes_vec(
        images, image_indices, boxes_xy, classes)

    if y is not None:
        from .ops.boxes import y_to_boxes_vec

        t_idx, t_xy, t_cls = y_to_boxes_vec(
            y, params, image_hw=image_hw, conf_th=conf_th)
        output_images, _ = viz.draw_boxes_vec(
            output_images, t_idx, t_xy, t_cls, color=(0, 0, 255))

    if is_end:
        return y_hat, output_images

    ci = int(params.capsule_input)
    # degenerate boxes (clipped outside the image) yield empty crops;
    # substitute zeros to keep crop<->box alignment for combine_y_hat
    # (the reference crashes on these in cv2.resize)
    all_crops = [
        cv2.resize(crop, (ci, ci)) if crop.size > 0
        else np.zeros((ci, ci, 3), np.float32)
        for crops in crops_bch for crop in crops
    ]
    if all_crops:
        output_crops = np.array(all_crops)
    else:  # zero detections: keep the (0, h, w, 3) shape contract
        output_crops = np.zeros((0, ci, ci, 3), np.float32)
    return y_hat, output_crops, image_indices, boxes_xy


def class_pred(x, model_dir, params, restore_file):
    """Classifier inference: scores + argmax classes.

    Reference parity: predict_fns.py:60-73.
    """
    x = np.asarray(x, np.float32)
    if x.shape[0] == 0:  # zero crops from an upstream empty detection
        y_hat = np.zeros((0, params.n_classes), np.float32)
        return y_hat, np.zeros((0,), np.int64)
    model, variables, mesh = restore_variables(params, model_dir, restore_file)
    step = make_predict_step(model)
    y_hat = np.asarray(
        _batched_forward(step, variables, x, params.batch_size, mesh))
    return y_hat, np.argmax(y_hat, axis=1)


def dark_class_pred(images, dark_model_dir, dark_params, class_model_dir,
                    class_params, restore_file, device_crop=False,
                    max_crops=16):
    """Two-stage detect-then-classify pipeline.

    Reference parity: predict_fns.py:75-82.

    device_crop=True (opt-in extension, COMPAT #33): detect -> decode
    -> crop/resize/center -> classify compile into ONE device program
    (ops/crop.py bilinear sampler, cv2-parity) — no host round-trip
    between the stages.  Deviations: crops sampled from the resized
    network input rather than the full-resolution frame, and a static
    top-`max_crops` detections per image are classified.  Default off
    = the reference composition, unchanged.
    """
    from .data.loader import center_rgb
    from .ops.boxes import combine_y_hat

    if device_crop:
        return _dark_class_pred_fused(
            images, dark_model_dir, dark_params, class_model_dir,
            class_params, restore_file, max_crops=max_crops)

    dark_y_hat, dark_crops, image_indices, boxes_xy = dark_pred(
        images, dark_model_dir, dark_params, restore_file, is_end=False)
    dark_crops = center_rgb(dark_crops)
    class_y_hat, classes = class_pred(
        dark_crops, class_model_dir, class_params, restore_file)
    output_images, _ = viz.draw_boxes_vec(
        images, image_indices, boxes_xy, classes)
    y_hat = combine_y_hat(
        images, dark_y_hat, class_y_hat, image_indices, boxes_xy, dark_params)
    return y_hat, output_images


def _dark_class_pred_fused(images, dark_model_dir, dark_params,
                           class_model_dir, class_params, restore_file,
                           max_crops=16, conf_th=0.5):
    """Fused two-stage pipeline: one device program per batch.

    Same return contract as `dark_class_pred` (combined y_hat grid +
    annotated images); see its docstring for the deviations.  The
    program is built by export.make_two_stage_fn /
    make_int8_two_stage_fn — the SAME composition the exported artifact
    serves — so `--dtype bfloat16` runs BOTH stages in bf16 and
    `--dtype int8` runs the calibrated int8-resident detector chain
    plus (for the cnn classifier) the calibrated int8 ConvNet chain;
    the capsule classifier stays f32 under int8 (no quantized routing
    — COMPAT.md #35).  The staged bench shows the classifier is the
    fused pipeline's dominant device cost (BASELINE.md), which is why
    it follows the serving dtype now (VERDICT r4 weak #3).
    """
    import cv2

    from . import export as export_mod
    from .ops.boxes import combine_y_hat

    det_model, det_vars, mesh = restore_variables(
        dark_params, dark_model_dir, restore_file)
    cls_model, cls_vars, _ = restore_variables(
        class_params, class_model_dir, restore_file)
    size = model_input_shape(dark_params)[0]
    ci = int(class_params.get("capsule_input", 32))
    nb, nc = int(dark_params.n_boxes), int(dark_params.n_classes)
    image_hw = np.array([im.shape[:2] for im in images])

    x = np.stack(
        [cv2.resize(im, (size, size)) for im in images]).astype(np.float32)

    common = dict(n_boxes=nb, n_classes=nc, img_size=size, cap_input=ci,
                  max_crops=max_crops, conf_th=conf_th, with_grid=True)
    dtype_s = _dtype_name(dark_params)
    if dtype_s == "int8":
        from .ops import quant

        x_cal = jnp.asarray(x[: int(dark_params.batch_size)])
        qparams = quant.quantize_darknet(det_vars, x_cal=x_cal)
        qparams_cls = None
        if class_params.model == "cnn":
            # calibrate the classifier on the crops the pipeline itself
            # produces from the calibration frames (export.make_crops_fn
            # is the fused tail minus the classifier); capsule stays f32
            # — no quantized routing (COMPAT.md #35)
            crops_cal = jax.jit(export_mod.make_crops_fn(
                det_model, det_vars, n_boxes=nb, n_classes=nc,
                img_size=size, cap_input=ci, max_crops=max_crops,
                conf_th=conf_th))(x_cal)
            qparams_cls = quant.quantize_convnet(cls_vars,
                                                 x_cal=crops_cal)
        if mesh is not None:
            qparams = jax.device_put(qparams, par.replicated_sharding(mesh))
            if qparams_cls is not None:
                qparams_cls = jax.device_put(
                    qparams_cls, par.replicated_sharding(mesh))
        fn = export_mod.make_int8_two_stage_fn(
            qparams, cls_model, cls_vars, qparams_cls=qparams_cls,
            **common)
    else:
        dt = jnp.bfloat16 if dtype_s == "bfloat16" else jnp.float32
        cls_dt = jnp.bfloat16 if dtype_s == "bfloat16" else None
        fn = export_mod.make_two_stage_fn(
            det_model, det_vars, cls_model, cls_vars, dtype=dt,
            cls_dtype=cls_dt, **common)
    step = jax.jit(fn)

    bs = int(dark_params.batch_size)
    outs = []
    for i in range(0, x.shape[0], bs):
        xb = jnp.asarray(x[i: i + bs])
        if mesh is not None:
            xb = par.place_batch(xb, mesh)
        # gather_replicated broadcasts its replicated out-sharding over
        # the output dict's leaves; multi-process host fetches below
        # need fully addressable arrays (no-op single-process)
        outs.append(par.gather_replicated(step(xb), mesh))
    y_hat = np.concatenate([np.asarray(o["grid"]) for o in outs], axis=0)
    scores = np.concatenate(
        [np.asarray(o["class_scores"]) for o in outs], axis=0)
    decoded = {k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)
               for k in ("conf", "xy", "classes", "valid", "idx")}

    # the static top-max_crops cap can truncate dense scenes relative
    # to the host path's full-width decode; the full grid is on host
    # here, so count and report any overflow instead of dropping it
    # silently (--max_crops raises the cap)
    b = y_hat.shape[0]
    all_conf = y_hat[..., : 5 * nb].reshape(b, -1, 5)[..., 0]
    n_above = int((all_conf > conf_th).sum())
    n_kept = int(np.asarray(decoded["valid"]).sum())
    if n_above > n_kept and par.is_primary():
        print("[device_crop] {} above-threshold detections exceed the "
              "static cap (max_crops={}, kept {}); pass a larger "
              "--max_crops to classify them all".format(
                  n_above - n_kept, max_crops, n_kept))

    (image_indices, boxes_xy, _), flat_extras = \
        decode_ops.to_flat_host_with_extras(
            decoded, {"scores": scores}, image_hw=image_hw, img_size=size,
            with_classes=True)
    class_y_hat = flat_extras["scores"]  # to_flat_host's box order
    classes = (np.argmax(class_y_hat, axis=1)
               if class_y_hat.shape[0] else np.zeros(0, np.int64))
    output_images, _ = viz.draw_boxes_vec(
        images, image_indices, boxes_xy, classes)
    y_hat = combine_y_hat(
        images, y_hat, class_y_hat, image_indices, boxes_xy, dark_params)
    return y_hat, output_images


PREDICT_REGISTRY = {
    "cnn": class_pred,
    "capsule": class_pred,
    "darknet_d": dark_pred,
    "darknet_r": dark_pred,
    "darkcapsule": None,  # reference main.py:263-265: no predict fn
}

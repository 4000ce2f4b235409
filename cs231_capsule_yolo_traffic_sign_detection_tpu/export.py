"""Serialized serving artifacts (jax.export / StableHLO).

Packages a trained model into ONE self-contained artifact — weights
baked in as constants, forward + on-device grid decode in a single
compiled program — that a serving process deserializes and calls
without this framework, flax, or the checkpoint format on its path
(only jax).  The artifact is the deployment unit the reference never
had (its predict path re-instantiates the torch model from source and
unpickles a checkpoint every run, reference predict_fns.py:10-58).

Artifacts record the lowering platform(s): export on the TPU host for
TPU serving, or pass ``platforms=("tpu", "cpu")`` for one artifact
that runs on both.  Version compatibility follows jax.export's
guarantees (forward-compatible StableHLO).

Functions:
  make_detector_fn / make_classifier_fn  — the canonical serving
    computations (shared with bench.py's methodology)
  export_serving        — trained variables -> serialized bytes
  save / load_serving   — file round-trip; load returns a callable
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


def _cast_variables(variables, dtype):
    """f32 weights -> serving dtype (shared by every serving-fn factory)."""
    if dtype == jnp.float32:
        return variables
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        variables)


def make_detector_fn(model, variables, *, n_boxes, n_classes, img_size,
                     conf_th=0.5, use_nms=False, dtype=jnp.float32):
    """End-to-end detection serving fn: x (B,S,S,3) f32 -> decode dict.

    Forward + full-width grid decode (every g*g*B candidate, like the
    reference's y_to_boxes_vec — no silent top-k truncation) in one
    program; optional on-device NMS (extension, reference has none).
    Weights are closed over, so the exported artifact is
    self-contained.
    """
    from .ops import decode as decode_ops

    variables = _cast_variables(variables, dtype)
    g = img_size // 32

    def fn(x):
        y = model.apply(variables, x.astype(dtype), train=False)
        y = y.astype(jnp.float32)
        d = decode_ops.decode_grid(
            y, n_classes=n_classes, n_boxes=n_boxes, img_size=img_size,
            max_boxes=g * g * n_boxes, conf_th=conf_th)
        if use_nms:
            d = dict(d)
            d["valid"] = decode_ops.nms_mask(d["xy"], d["conf"], d["valid"])
        return d

    return fn


def make_classifier_fn(model, variables, *, dtype=jnp.float32):
    """Classifier serving fn: x (B,32,32,3) f32 -> (scores, argmax)."""
    variables = _cast_variables(variables, dtype)

    def fn(x):
        scores = model.apply(variables, x.astype(dtype), train=False)
        scores = scores.astype(jnp.float32)
        return scores, jnp.argmax(scores, axis=-1)

    return fn


def make_int8_detector_fn(qparams, *, n_boxes, n_classes, img_size,
                          conf_th=0.5, use_nms=False):
    """int8-resident detection serving fn (VERDICT r2 item 3).

    Same contract as `make_detector_fn` but over the calibrated int8
    chain (`ops.quant.darknet_int8_resident_apply`): s8 x s8 -> s32
    convs with int8 inter-layer activations in HBM — the measured
    serving throughput champion (BASELINE.md).  The int8 weights,
    per-channel weight scales, AND the static activation scales are
    all closed over, so they serialize into the artifact as constants:
    the exported program is the exact graph the live `--dtype int8`
    predict path runs, calibration included.
    """
    from .ops import decode as decode_ops
    from .ops import quant

    g = img_size // 32

    def fn(x):
        y = quant.darknet_int8_resident_apply(
            qparams, x.astype(jnp.float32),
            n_boxes=n_boxes, n_classes=n_classes)
        d = decode_ops.decode_grid(
            y, n_classes=n_classes, n_boxes=n_boxes, img_size=img_size,
            max_boxes=g * g * n_boxes, conf_th=conf_th)
        if use_nms:
            d = dict(d)
            d["valid"] = decode_ops.nms_mask(d["xy"], d["conf"], d["valid"])
        return d

    return fn


def make_grid_fn(model, variables, *, dtype=jnp.float32):
    """Raw grid forward (darkcapsule): x -> (B, g, g, 5) f32."""
    variables = _cast_variables(variables, dtype)

    def fn(x):
        return model.apply(
            variables, x.astype(dtype), train=False).astype(jnp.float32)

    return fn


def _make_classify(cls_model, cls_vars, cls_dtype=None):
    """Classifier stage callable for the fused tail.

    cls_dtype=None runs f32; bf16 casts weights AND input so the score
    matmuls hit the MXU at bf16 (scores come back f32).  Previously the
    classifier was pinned f32 under every --dtype even though the
    staged bench shows the fused pipeline is classifier/crop-bound
    (VERDICT r4 weak #3).
    """
    if cls_dtype is None or cls_dtype == jnp.float32:
        return lambda flat: cls_model.apply(cls_vars, flat, train=False)
    cast_vars = _cast_variables(cls_vars, cls_dtype)
    return lambda flat: cls_model.apply(
        cast_vars, flat.astype(cls_dtype), train=False)


def _two_stage_tail(x, y, *, classify, n_boxes, n_classes,
                    img_size, cap_input, max_crops, conf_th, use_nms,
                    with_grid, with_crops=False):
    """Shared decode -> crop -> classify tail of the fused two-stage
    program (one implementation for every detector dtype variant).
    `classify` maps centered (B*max_crops, ci, ci, 3) crops to scores."""
    from .data.loader import center_rgb
    from .ops import decode as decode_ops
    from .ops.crop import crop_resize_bilinear

    d = decode_ops.decode_grid(
        y, n_classes=n_classes, n_boxes=n_boxes, img_size=img_size,
        max_boxes=max_crops, conf_th=conf_th)
    if use_nms:
        d = dict(d)
        d["valid"] = decode_ops.nms_mask(d["xy"], d["conf"], d["valid"])
    crops = crop_resize_bilinear(x, d["xy"], cap_input, valid=d["valid"])
    b, m = crops.shape[:2]
    flat = center_rgb(crops.reshape(b * m, cap_input, cap_input, -1))
    scores = classify(flat)
    scores = scores.astype(jnp.float32).reshape(b, m, -1)
    out = dict(d, class_scores=scores)
    if with_grid:
        out["grid"] = y
    if with_crops:
        out["crops"] = flat
    return out


def make_crops_fn(det_model, det_vars, *, n_boxes, n_classes, img_size,
                  cap_input=32, max_crops=16, conf_th=0.5,
                  dtype=jnp.float32):
    """Detect -> decode -> crop -> center, WITHOUT the classifier: the
    centered crop tensors the fused two-stage feeds its classifier.
    Used to produce classifier calibration batches (quant.
    quantize_convnet) from a detector-input calibration batch, so the
    static activation scales see exactly the serving distribution."""
    det_vars = _cast_variables(det_vars, dtype)
    tail = dict(classify=lambda flat: jnp.zeros(
                    (flat.shape[0], 1), jnp.float32),
                n_boxes=n_boxes, n_classes=n_classes, img_size=img_size,
                cap_input=cap_input, max_crops=max_crops, conf_th=conf_th,
                use_nms=False, with_grid=False, with_crops=True)

    def fn(x):
        y = det_model.apply(det_vars, x.astype(dtype), train=False)
        return _two_stage_tail(x, y.astype(jnp.float32), **tail)["crops"]

    return fn


def make_two_stage_fn(det_model, det_vars, cls_model, cls_vars, *,
                      n_boxes, n_classes, img_size, cap_input=32,
                      max_crops=16, conf_th=0.5, use_nms=False,
                      dtype=jnp.float32, cls_dtype=None,
                      with_grid=False):
    """Fused two-stage serving fn: detect -> crop -> classify, ONE program.

    The TPU-native composition of the reference's flagship demo
    (predict_fns.py:75-82): detector forward + grid decode, then the
    top `max_crops` detections are cropped from the device-resident
    network input and bilinear-resized to the classifier size
    (ops/crop.py — cv2-parity sampling), centered, and classified — no
    host round-trip between the stages (measured at ~40% of the host
    pipeline's non-link time, BASELINE.md).  Returns the decode dict
    plus `class_scores` (B, max_crops, n_classes); `with_grid` adds the
    raw detector grid under "grid" (the CLI combine path needs it for
    combine_y_hat).

    `dtype` runs the detector in f32 or bf16; `cls_dtype` does the same
    for the classifier (default None = f32; the CLI passes bf16 under
    `--dtype bfloat16` — the staged bench shows the classifier is the
    fused pipeline's dominant device cost, BASELINE.md).  For the
    int8-resident detector use `make_int8_two_stage_fn`.

    DEVIATION (opt-in; the product `--combine` path is unchanged):
    crops are sampled from the img_size input, not the original
    full-resolution frame, and only the top max_crops (an explicit
    static cap) are classified.  COMPAT.md #33.
    """
    det_vars = _cast_variables(det_vars, dtype)
    tail = dict(classify=_make_classify(cls_model, cls_vars, cls_dtype),
                n_boxes=n_boxes,
                n_classes=n_classes, img_size=img_size,
                cap_input=cap_input, max_crops=max_crops, conf_th=conf_th,
                use_nms=use_nms, with_grid=with_grid)

    def fn(x):
        y = det_model.apply(det_vars, x.astype(dtype), train=False)
        return _two_stage_tail(x, y.astype(jnp.float32), **tail)

    return fn


def make_int8_two_stage_fn(qparams, cls_model, cls_vars, *,
                           n_boxes, n_classes, img_size, cap_input=32,
                           max_crops=16, conf_th=0.5, use_nms=False,
                           with_grid=False, qparams_cls=None):
    """Fused two-stage serving fn over the int8-resident detector.

    Same contract and deviations as `make_two_stage_fn`, but the
    detector stage is the calibrated int8 chain
    (`ops.quant.darknet_int8_resident_apply`, the measured serving
    champion — BASELINE.md).  The classifier runs f32, or — when
    `qparams_cls` (from quant.quantize_convnet) is given — the
    calibrated int8 ConvNet chain, removing the fused pipeline's
    dominant remaining f32 cost (VERDICT r4 weak #3).  All int8
    weights, per-channel weight scales, and static activation scales
    are closed over, so they bake into an exported artifact exactly
    like `make_int8_detector_fn`'s.
    """
    from .ops import quant

    if qparams_cls is not None:
        classify = lambda flat: quant.convnet_int8_apply(  # noqa: E731
            qparams_cls, flat)
    else:
        classify = _make_classify(cls_model, cls_vars)
    tail = dict(classify=classify, n_boxes=n_boxes,
                n_classes=n_classes, img_size=img_size,
                cap_input=cap_input, max_crops=max_crops, conf_th=conf_th,
                use_nms=use_nms, with_grid=with_grid)

    def fn(x):
        y = quant.darknet_int8_resident_apply(
            qparams, x.astype(jnp.float32),
            n_boxes=n_boxes, n_classes=n_classes)
        return _two_stage_tail(x, y, **tail)

    return fn


def export_serving(fn, input_shape, *, batch=None, platforms=None):
    """Serialize a serving fn to portable bytes.

    `input_shape` is the per-example shape (H, W, C); `batch` fixes the
    batch dimension, or None exports a symbolic batch dimension (any
    batch size at call time).  If some op in the graph rejects shape
    polymorphism the export FAILS with a pointer to `batch=` — never
    silently writing a fixed-batch artifact under a symbolic-batch
    contract.
    """
    jitted = jax.jit(fn)
    if batch is not None:
        args = jax.ShapeDtypeStruct((batch, *input_shape), jnp.float32)
        return jax_export.export(jitted, platforms=platforms)(
            args).serialize()
    try:
        (b,) = jax_export.symbolic_shape("b")
        args = jax.ShapeDtypeStruct((b, *input_shape), jnp.float32)
        return jax_export.export(jitted, platforms=platforms)(
            args).serialize()
    except Exception as e:
        # only polymorphism failures earn the "pin batch=" advice;
        # anything else (unsupported platform op, a bug in fn) would
        # fail again at a fixed batch, so it propagates untouched
        msg = str(e).lower()
        if any(word in msg for word in
               ("symbolic", "polymorph", "dimension variable")):
            raise ValueError(
                "symbolic-batch export failed for this graph "
                f"({type(e).__name__}: {e}); re-export with an explicit "
                "batch= to pin the batch dimension instead") from e
        raise


def save(blob, path):
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_serving(path):
    """Deserialize an artifact; returns a jit-callable fn(x)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    @functools.wraps(exported.call)
    def call(x):
        return exported.call(jnp.asarray(x, jnp.float32))

    call.exported = exported
    return call


def export_from_checkpoint(params, model_dir, restore_file, *,
                           batch=None, conf_th=0.5, use_nms=False,
                           dtype=jnp.float32, platforms=None, x_cal=None):
    """Restore a trained checkpoint and export its serving artifact.

    dtype "int8" (string sentinel — there is no int8 *compute policy*,
    it is a different graph) exports the calibrated int8-resident
    detector chain; `x_cal` must then be a representative input batch
    (same scale the serving inputs will use) for the static activation
    scales.  Detectors only.
    """
    from .predict import restore_variables
    from .train.driver import model_input_shape

    if str(dtype) == "int8":
        # validate BEFORE the checkpoint restore so misuse fails fast
        if params.model not in ("darknet_d", "darknet_r"):
            raise ValueError(
                "int8 export is defined for the DarkNet detectors only "
                f"(got model={params.model!r})")
        if x_cal is None:
            raise ValueError(
                "int8 export needs a calibration batch: pass x_cal= "
                "(a representative (B, S, S, 3) input batch)")

    model, variables, _ = restore_variables(params, model_dir, restore_file)
    shape = model_input_shape(params)
    if str(dtype) == "int8":
        from .ops import quant

        qparams = quant.quantize_darknet(variables,
                                         x_cal=jnp.asarray(x_cal))
        fn = make_int8_detector_fn(
            qparams, n_boxes=int(params.n_boxes),
            n_classes=int(params.n_classes), img_size=shape[0],
            conf_th=conf_th, use_nms=use_nms)
    elif params.model in ("cnn", "capsule"):
        fn = make_classifier_fn(model, variables, dtype=dtype)
    elif params.model == "darkcapsule":
        # no grid decode: the reference defines no predict fn for
        # darkcapsule (main.py:263-265) and its (B, g, g, 5) capsule
        # output is polar-encoded, not a cwh box grid — export the raw
        # forward, like the training/eval consumers use it
        fn = make_grid_fn(model, variables, dtype=dtype)
    else:
        fn = make_detector_fn(
            model, variables, n_boxes=int(params.n_boxes),
            n_classes=int(params.n_classes), img_size=shape[0],
            conf_th=conf_th, use_nms=use_nms, dtype=dtype)
    return export_serving(fn, shape, batch=batch, platforms=platforms), fn


def export_two_stage_from_checkpoints(dark_params, dark_model_dir,
                                      class_params, class_model_dir,
                                      restore_file, *, batch=None,
                                      max_crops=16, conf_th=0.5,
                                      use_nms=False, dtype=jnp.float32,
                                      platforms=None, x_cal=None):
    """Restore detector + classifier checkpoints and export the fused
    two-stage pipeline (detect -> crop -> classify) as ONE artifact.

    The exported program is exactly what `main.py --combine …
    --device_crop` serves (predict._dark_class_pred_fused builds the
    same fn).  dtype "int8" exports the calibrated int8-resident
    detector chain and needs `x_cal` (a representative (B, S, S, 3)
    batch); the cnn classifier is then ALSO quantized (int8 ConvNet
    chain, calibrated on the crops the pipeline itself produces from
    x_cal).  bf16 runs both stages bf16.  The capsule classifier stays
    f32 under int8 (no quantized routing, COMPAT.md #35).
    """
    from .predict import restore_variables
    from .train.driver import model_input_shape

    if str(dtype) == "int8":
        if dark_params.model not in ("darknet_d", "darknet_r"):
            raise ValueError(
                "int8 two-stage export is defined for the DarkNet "
                f"detectors only (got model={dark_params.model!r})")
        if x_cal is None:
            raise ValueError(
                "int8 two-stage export needs a calibration batch: pass "
                "x_cal= (a representative (B, S, S, 3) input batch)")

    det_model, det_vars, _ = restore_variables(
        dark_params, dark_model_dir, restore_file)
    cls_model, cls_vars, _ = restore_variables(
        class_params, class_model_dir, restore_file)
    shape = model_input_shape(dark_params)
    common = dict(
        n_boxes=int(dark_params.n_boxes),
        n_classes=int(dark_params.n_classes), img_size=shape[0],
        cap_input=int(class_params.get("capsule_input", 32)),
        max_crops=max_crops, conf_th=conf_th, use_nms=use_nms)
    if str(dtype) == "int8":
        from .ops import quant

        x_cal = jnp.asarray(x_cal)
        qparams = quant.quantize_darknet(det_vars, x_cal=x_cal)
        qparams_cls = None
        if class_params.model == "cnn":
            crops_cal = jax.jit(make_crops_fn(
                det_model, det_vars, n_boxes=common["n_boxes"],
                n_classes=common["n_classes"], img_size=shape[0],
                cap_input=common["cap_input"], max_crops=max_crops,
                conf_th=conf_th))(x_cal)
            qparams_cls = quant.quantize_convnet(cls_vars,
                                                 x_cal=crops_cal)
        fn = make_int8_two_stage_fn(qparams, cls_model, cls_vars,
                                    qparams_cls=qparams_cls, **common)
    else:
        cls_dt = jnp.bfloat16 if dtype == jnp.bfloat16 else None
        fn = make_two_stage_fn(det_model, det_vars, cls_model, cls_vars,
                               dtype=dtype, cls_dtype=cls_dt, **common)
    return export_serving(fn, shape, batch=batch, platforms=platforms), fn


def selfcheck(call, fn, input_shape, batch=2, seed=0, atol=1e-5):
    """Run artifact vs live function on random data; raises on mismatch."""
    x = np.random.RandomState(seed).rand(
        batch, *input_shape).astype(np.float32)
    got = jax.tree_util.tree_leaves(call(x))
    want = jax.tree_util.tree_leaves(jax.jit(fn)(jnp.asarray(x)))
    if len(got) != len(want):  # explicit: asserts vanish under python -O
        raise ValueError(
            f"artifact returned {len(got)} output leaves, live model "
            f"returned {len(want)}")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   rtol=1e-5, atol=atol)
    return True

"""Serving-artifact export (cyt/export.py): serialize -> load -> parity.

The artifact must reproduce the live model exactly (same program, same
constants) through a file round-trip, with and without a symbolic
batch dimension, for both the detector (forward + decode + optional
NMS in one program) and a classifier.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cs231_capsule_yolo_traffic_sign_detection_tpu import export
from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
    ConvNet, DarkNet,
)


def _darknet_fn(use_nms=False, dtype=jnp.float32):
    model = DarkNet(n_boxes=2, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    fn = export.make_detector_fn(
        model, variables, n_boxes=2, n_classes=43, img_size=64,
        conf_th=0.1, use_nms=use_nms, dtype=dtype)
    return fn


def test_detector_roundtrip(tmp_path):
    fn = _darknet_fn(use_nms=True)
    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    path = export.save(blob, str(tmp_path / "det.stablehlo"))
    serve = export.load_serving(path)
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2)


def test_detector_symbolic_batch(tmp_path):
    fn = _darknet_fn()
    blob = export.export_serving(fn, (64, 64, 3), batch=None)
    path = export.save(blob, str(tmp_path / "det_poly.stablehlo"))
    serve = export.load_serving(path)
    for b in (1, 3):
        x = np.random.RandomState(b).rand(b, 64, 64, 3).astype(np.float32)
        got = jax.tree_util.tree_leaves(serve(x))
        want = jax.tree_util.tree_leaves(jax.jit(fn)(jnp.asarray(x)))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(w, np.float32),
                                       rtol=1e-5, atol=1e-5)


def test_classifier_bf16_roundtrip(tmp_path):
    model = ConvNet(n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x0, train=False)
    fn = export.make_classifier_fn(model, variables, dtype=jnp.bfloat16)
    blob = export.export_serving(fn, (32, 32, 3), batch=4)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "cls.stablehlo")))
    assert export.selfcheck(serve, fn, (32, 32, 3), batch=4)


def test_export_from_checkpoint(tmp_path):
    """Full path: write a checkpoint, export from it, verify parity."""
    from flax import serialization

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        build_model,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (
        init_state,
    )

    params = Params(model="cnn", n_classes=43, dropout=0.0, seed=0,
                    train_frac=1.0, recon=True, recon_coef=5e-4,
                    routing_impl="xla", batch_size=4, mesh="off")
    model = build_model(params)
    state = init_state(model, params, (32, 32, 3), seed=0)
    out_dir = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(
        {"epoch": 1, "state": serialization.to_state_dict(state),
         "plateau": {}},
        is_best=True, checkpoint_dir=out_dir)

    blob, fn = export.export_from_checkpoint(
        params, out_dir, "best", batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "from_ckpt.stablehlo")))
    assert export.selfcheck(serve, fn, (32, 32, 3), batch=2)

    # and the artifact really is self-contained: scores match the
    # checkpointed weights applied directly
    x = np.random.RandomState(2).rand(2, 32, 32, 3).astype(np.float32)
    direct = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False)
    scores, labels = serve(x)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)
    assert labels.shape == (2,)


def test_darkcapsule_exports_raw_grid(tmp_path):
    """Regression: darkcapsule outputs a polar-encoded (B, g, g, 5)
    grid — no box decode applies (the reference registers no predict fn
    for it, main.py:263-265); export must emit the raw forward instead
    of crashing in decode_grid."""
    from flax import serialization

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        build_model,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (
        checkpoint as ckpt,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (
        init_state,
    )

    params = Params(model="darkcapsule", n_classes=43, n_boxes=2, n_grid=2,
                    darknet_input=64, dropout=0.0, seed=0, train_frac=1.0,
                    recon=True, recon_coef=5e-4, routing_impl="xla",
                    batch_size=4, mesh="off")
    model = build_model(params)
    state = init_state(model, params, (64, 64, 3), seed=0)
    out_dir = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(
        {"epoch": 1, "state": serialization.to_state_dict(state),
         "plateau": {}},
        is_best=False, checkpoint_dir=out_dir)

    blob, fn = export.export_from_checkpoint(params, out_dir, "last",
                                             batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "dcaps.stablehlo")))
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2)
    out = serve(np.zeros((2, 64, 64, 3), np.float32))
    assert np.asarray(out).shape == (2, 2, 2, 5)


def test_multi_platform_artifact(tmp_path):
    """One artifact lowered for BOTH tpu and cpu (exported from the CPU
    host — cross-platform lowering) runs on the cpu backend."""
    model = ConvNet(n_classes=43, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    fn = export.make_classifier_fn(model, variables)
    blob = export.export_serving(fn, (32, 32, 3), batch=2,
                                 platforms=("tpu", "cpu"))
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "multi.stablehlo")))
    assert export.selfcheck(serve, fn, (32, 32, 3), batch=2)


def test_unknown_platform_artifact_rejected(tmp_path):
    """Artifacts record their platform; calling one lowered for a
    different backend fails loudly rather than silently recompiling."""
    fn = _darknet_fn()
    blob = export.export_serving(fn, (64, 64, 3), batch=1,
                                 platforms=("tpu",))
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "tpu_only.stablehlo")))
    x = np.zeros((1, 64, 64, 3), np.float32)
    with pytest.raises(ValueError, match="exported for platforms"):
        serve(x)  # running a tpu-lowered artifact on the CPU backend


def test_int8_detector_roundtrip(tmp_path):
    """int8-resident chain export (VERDICT r2 item 3): the artifact
    must reproduce the LIVE quant path (quantize_darknet +
    darknet_int8_resident_apply) exactly — scales baked as constants."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant

    model = DarkNet(n_boxes=2, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, train=False)

    rng = np.random.RandomState(0)
    x_cal = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    qparams = quant.quantize_darknet(variables, x_cal=jnp.asarray(x_cal))

    fn = export.make_int8_detector_fn(
        qparams, n_boxes=2, n_classes=43, img_size=64, conf_th=0.1,
        use_nms=True)

    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "det_int8.stablehlo")))
    # selfcheck compares the artifact against the identical live graph
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2)

    # and the baked program equals the live predict-path computation
    x = (np.random.RandomState(1).rand(2, 64, 64, 3) * 255).astype(
        np.float32)
    live = jax.jit(lambda q, xb: quant.darknet_int8_resident_apply(
        q, xb, n_boxes=2, n_classes=43))(qparams, jnp.asarray(x))
    # decode consumes the same grid: spot-check the raw confidences by
    # re-decoding live output and comparing the artifact's dict
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )

    want = decode_ops.decode_grid(live, n_classes=43, n_boxes=2,
                                  img_size=64, max_boxes=2 * 2 * 2,
                                  conf_th=0.1)
    got = serve(x)
    np.testing.assert_allclose(np.asarray(got["conf"], np.float32),
                               np.asarray(want["conf"], np.float32),
                               rtol=1e-6, atol=1e-6)


def test_int8_detector_symbolic_batch(tmp_path):
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant

    model = DarkNet(n_boxes=2, n_classes=0, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), x0, train=False)
    x_cal = (np.random.RandomState(0).rand(2, 64, 64, 3) * 255).astype(
        np.float32)
    qparams = quant.quantize_darknet(variables, x_cal=jnp.asarray(x_cal))
    fn = export.make_int8_detector_fn(
        qparams, n_boxes=2, n_classes=0, img_size=64, conf_th=0.1)
    blob = export.export_serving(fn, (64, 64, 3), batch=None)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "det_int8_poly.stablehlo")))
    for b in (1, 3):
        x = (np.random.RandomState(b).rand(b, 64, 64, 3) * 255).astype(
            np.float32)
        got = jax.tree_util.tree_leaves(serve(x))
        want = jax.tree_util.tree_leaves(jax.jit(fn)(jnp.asarray(x)))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g, np.float32),
                                       np.asarray(w, np.float32),
                                       rtol=1e-5, atol=1e-5)


def test_int8_export_requires_calibration(tmp_path):
    """export_from_checkpoint must refuse int8 without x_cal, and for
    non-detector models."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params

    p = Params(model="cnn", n_classes=43)
    with pytest.raises(ValueError, match="detectors only"):
        export.export_from_checkpoint(p, str(tmp_path), "last",
                                      dtype="int8", x_cal=None)


def test_two_stage_fused_roundtrip(tmp_path):
    """Fused detect->crop->classify program (COMPAT #33): artifact
    round-trip + the classifier scores must equal composing the stages
    by hand on device."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        center_rgb,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop import (
        crop_resize_bilinear,
    )

    det = DarkNet(n_boxes=2, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    cls = ConvNet(n_classes=43, dropout=0.0)
    cvars = cls.init(jax.random.PRNGKey(1),
                     jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)

    fn = export.make_two_stage_fn(
        det, dvars, cls, cvars, n_boxes=2, n_classes=43, img_size=64,
        max_crops=4, conf_th=0.2)

    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "two_stage.stablehlo")))
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2, atol=1e-4)

    # staged composition on device must agree with the fused program
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    got = jax.jit(fn)(x)
    y = det.apply(dvars, x, train=False)
    d = decode_ops.decode_grid(y, n_classes=43, n_boxes=2, img_size=64,
                               max_boxes=4, conf_th=0.2)
    crops = crop_resize_bilinear(x, d["xy"], 32, valid=d["valid"])
    flat = center_rgb(crops.reshape(8, 32, 32, 3))
    want = cls.apply(cvars, flat, train=False).reshape(2, 4, 43)
    np.testing.assert_allclose(np.asarray(got["class_scores"]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    # masked (invalid) detections produce the all-zero-crop scores
    assert got["class_scores"].shape == (2, 4, 43)


def test_int8_two_stage_fused_roundtrip(tmp_path):
    """int8-resident detector composed with the fused two-stage program
    (VERDICT r3 item 3): artifact round-trip, and the int8 detector
    grid inside the fused program must be bit-identical to the
    standalone int8-resident chain."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant

    det = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    cls = ConvNet(n_classes=43, dropout=0.0)
    cvars = cls.init(jax.random.PRNGKey(1),
                     jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    q = quant.quantize_darknet(dvars, x_cal=x)
    fn = export.make_int8_two_stage_fn(
        q, cls, cvars, n_boxes=1, n_classes=43, img_size=64,
        max_crops=4, conf_th=0.2, with_grid=True)

    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "two_stage_int8.stablehlo")))
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2, atol=1e-4)

    got = jax.jit(fn)(x)
    want_grid = quant.darknet_int8_resident_apply(
        q, x, n_boxes=1, n_classes=43)
    np.testing.assert_array_equal(np.asarray(got["grid"]),
                                  np.asarray(want_grid))
    assert got["class_scores"].shape == (2, 4, 43)


def test_two_stage_export_from_checkpoints_validates_int8():
    """export_two_stage_from_checkpoints must refuse int8 without x_cal
    and for non-detector first stages."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params

    dp = Params(model="darknet_r", n_classes=43, n_boxes=1, n_grid=2,
                darknet_input=64)
    cp = Params(model="cnn", n_classes=43, capsule_input=32)
    with pytest.raises(ValueError, match="calibration"):
        export.export_two_stage_from_checkpoints(
            dp, "/nonexistent", cp, "/nonexistent", "last",
            dtype="int8", x_cal=None)
    bad = Params(model="cnn", n_classes=43)
    with pytest.raises(ValueError, match="detectors only"):
        export.export_two_stage_from_checkpoints(
            bad, "/nonexistent", cp, "/nonexistent", "last",
            dtype="int8", x_cal=np.zeros((1, 64, 64, 3), np.float32))


def test_make_crops_fn_matches_tail(tmp_path):
    """make_crops_fn (classifier-calibration source) must emit exactly
    the centered crop tensors the fused tail feeds its classifier."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        center_rgb,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop import (
        crop_resize_bilinear,
    )

    det = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    fn = export.make_crops_fn(det, dvars, n_boxes=1, n_classes=43,
                              img_size=64, max_crops=4, conf_th=0.2)
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    got = np.asarray(jax.jit(fn)(x))

    y = det.apply(dvars, x, train=False)
    d = decode_ops.decode_grid(y, n_classes=43, n_boxes=1, img_size=64,
                               max_boxes=4, conf_th=0.2)
    crops = crop_resize_bilinear(x, d["xy"], 32, valid=d["valid"])
    want = np.asarray(center_rgb(crops.reshape(8, 32, 32, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_int8_two_stage_quantized_classifier(tmp_path):
    """int8 detector + int8 ConvNet classifier in ONE fused program
    (VERDICT r4 weak #3): the class scores must equal running
    quant.convnet_int8_apply on the crops decoded from the int8 grid,
    and the artifact round-trips."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        center_rgb,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops, quant,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop import (
        crop_resize_bilinear,
    )

    det = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    cls = ConvNet(n_classes=43, dropout=0.0)
    cvars = cls.init(jax.random.PRNGKey(1),
                     jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    q = quant.quantize_darknet(dvars, x_cal=x)
    crops_cal = jax.jit(export.make_crops_fn(
        det, dvars, n_boxes=1, n_classes=43, img_size=64,
        max_crops=4, conf_th=0.2))(x)
    qc = quant.quantize_convnet(cvars, x_cal=crops_cal)

    fn = export.make_int8_two_stage_fn(
        q, cls, cvars, n_boxes=1, n_classes=43, img_size=64,
        max_crops=4, conf_th=0.2, with_grid=True, qparams_cls=qc)
    got = jax.jit(fn)(x)

    y_grid = quant.darknet_int8_resident_apply(q, x, n_boxes=1,
                                               n_classes=43)
    np.testing.assert_array_equal(np.asarray(got["grid"]),
                                  np.asarray(y_grid))
    d = decode_ops.decode_grid(y_grid, n_classes=43, n_boxes=1,
                               img_size=64, max_boxes=4, conf_th=0.2)
    crops = crop_resize_bilinear(x, d["xy"], 32, valid=d["valid"])
    flat = center_rgb(crops.reshape(8, 32, 32, 3))
    want = np.asarray(quant.convnet_int8_apply(qc, flat)).reshape(2, 4, 43)
    np.testing.assert_allclose(np.asarray(got["class_scores"]), want,
                               rtol=1e-5, atol=1e-5)

    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "two_stage_int8x2.stablehlo")))
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2, atol=1e-4)


def test_two_stage_bf16_classifier():
    """cls_dtype=bf16 runs the classifier stage in bf16 (the CLI's
    --dtype bfloat16 fused path); scores track the f32 classifier
    within a bf16 rounding band and the detector grid is unchanged."""
    det = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    cls = ConvNet(n_classes=43, dropout=0.0)
    cvars = cls.init(jax.random.PRNGKey(1),
                     jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)

    common = dict(n_boxes=1, n_classes=43, img_size=64, max_crops=4,
                  conf_th=0.2, with_grid=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    f32 = jax.jit(export.make_two_stage_fn(det, dvars, cls, cvars,
                                           **common))(x)
    b16 = jax.jit(export.make_two_stage_fn(det, dvars, cls, cvars,
                                           cls_dtype=jnp.bfloat16,
                                           **common))(x)
    np.testing.assert_array_equal(np.asarray(f32["grid"]),
                                  np.asarray(b16["grid"]))
    s32, s16 = np.asarray(f32["class_scores"]), np.asarray(b16["class_scores"])
    assert s16.dtype == np.float32
    scale = np.abs(s32).max() + 1e-8
    assert (np.abs(s32 - s16) / scale).max() < 0.05


def test_two_stage_capsule_classifier_roundtrip(tmp_path):
    """The capsule classifier through the fused/exported two-stage
    (VERDICT r4 weak #4): XLA routing serializes; scores (= capsule
    norms, reference models.py:117) must equal composing the stages by
    hand.  Pallas routing is not exportable — the CLI predict path runs
    it live under jit; exports use routing_impl='xla' (COMPAT.md #35)."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        center_rgb,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        CapsuleNet,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop import (
        crop_resize_bilinear,
    )

    det = DarkNet(n_boxes=1, n_classes=43, dropout=0.0)
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)
    cls = CapsuleNet(n_classes=43, routing_impl="xla")
    cvars = cls.init(jax.random.PRNGKey(1),
                     jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)

    fn = export.make_two_stage_fn(
        det, dvars, cls, cvars, n_boxes=1, n_classes=43, img_size=64,
        max_crops=2, conf_th=0.2)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                    .astype(np.float32) * 255.0)
    got = jax.jit(fn)(x)
    assert got["class_scores"].shape == (2, 2, 43)

    y = det.apply(dvars, x, train=False)
    d = decode_ops.decode_grid(y, n_classes=43, n_boxes=1, img_size=64,
                               max_boxes=2, conf_th=0.2)
    crops = crop_resize_bilinear(x, d["xy"], 32, valid=d["valid"])
    flat = center_rgb(crops.reshape(4, 32, 32, 3))
    want = cls.apply(cvars, flat, train=False).reshape(2, 2, 43)
    np.testing.assert_allclose(np.asarray(got["class_scores"]),
                               np.asarray(want), rtol=1e-5, atol=1e-5)

    blob = export.export_serving(fn, (64, 64, 3), batch=2)
    serve = export.load_serving(export.save(
        blob, str(tmp_path / "two_stage_capsule.stablehlo")))
    assert export.selfcheck(serve, fn, (64, 64, 3), batch=2, atol=1e-4)

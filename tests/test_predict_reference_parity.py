"""End-to-end `--mode predict` parity vs the executing torch reference.

VERDICT r3 item 1 — the last uncompared product surface.  Every stage
of the predict pipeline is parity-tested in isolation elsewhere
(forwards, decode, metrics, loader); this test runs the COMPOSED
predict pipeline (reference main.py:293-374: restore -> resize ->
forward -> y_to_boxes_vec -> metrics -> metric_output.txt) in BOTH
frameworks with IDENTICAL weights — trained here, moved across with
interop.export_torch_checkpoint — on identical raw frames, and
compares:

  * the y_hat grid the detector emits (tolerance: f32 conv noise),
  * the decoded box list per image (indices exact, coords tolerance,
    classes exact — including the reference's np.argwhere grid-scan
    emission ORDER, utils.py:313),
  * every number in metric_output.txt,
  * for `--combine cnn`: the combine_y_hat grid write-back
    (utils.py:336-351) and combine-cnn_metric_output.txt.

Legs: darknet_r (B=1/C=43), darknet_d (B=2/C=0), the two-stage
matrix darknet_r --combine cnn / darknet_r --combine capsule (the
namesake capsule-YOLO composition) / darknet_d --combine cnn, and the
class-model branch (reference main.py:309-317) for cnn and capsule:
class_pred scores + recog_pr/acc/auc in metric_output.txt.  Reference code is executed in place via subprocess
(run_reference_baseline machinery) — never copied; its predict-time
tensors are captured by a sitecustomize spy.  Marked slow (each leg
trains a tiny model and runs both frameworks; torch CPU side ~1 min).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_reference_baseline import (  # noqa: E402
    prepare_reference_predict_workdir, run_reference,
)

from cs231_capsule_yolo_traffic_sign_detection_tpu import interop  # noqa: E402
from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (  # noqa: E402
    synthetic_dataset,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params  # noqa: E402
from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (  # noqa: E402
    checkpoint as ckpt,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (  # noqa: E402
    ReduceLROnPlateau, Trainer,
)

pytestmark = pytest.mark.slow

N_TEST = 6

DET_R_CFG = {"batch_size": 8, "n_boxes": 1, "n_grid": 2,
             "darknet_input": 64, "l_coord": 5.0, "l_noobj": 0.5,
             "dropout": 0.0, "n_classes": 43, "capsule_input": 32,
             "lr": 1e-3, "n_epochs": 1, "lr_decay": 0.1}
DET_D_CFG = dict(DET_R_CFG, n_boxes=2, n_classes=0)
CLS_CFG = {"batch_size": 8, "n_classes": 43, "dropout": 0.0,
           "lr": 1e-3, "n_epochs": 1, "lr_decay": 0.1}


def _easy_detection_scenes(p, n, seed):
    """Detection scenes with one LARGE sign (1/3..1/2 of the image
    side) — same scene family as data.loader._synthetic_detection but
    IoU-friendly: dark_loss trains confidence toward the responsible
    box's IoU (reference loss_fns.py:113-118), and big boxes reach
    IoU > the reference's fixed predict conf_th=0.5 within the legs'
    CPU-budget training.  With the loader's small signs (size//8..//3)
    the trained conf tops out at ~0.35-0.5, so whether any detection
    survives thresholding is numerical luck — and the --combine legs
    crash the reference on zero crops."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        boxes as box_ops,
    )

    rng = np.random.RandomState(seed)
    size = int(p.darknet_input)
    g = int(p.n_grid)
    n_cls = int(p.n_classes)
    x = rng.uniform(-1.0, -0.8, (n, size, size, 3)).astype(np.float32)
    y = np.zeros((n, g, g, 5 + n_cls), np.float32)
    lo, hi = size // 3, size // 2
    for i in range(n):
        w = int(rng.randint(lo, hi))
        h = int(rng.randint(lo, hi))
        x1 = int(rng.randint(0, size - w))
        y1 = int(rng.randint(0, size - h))
        c = i % n_cls if n_cls else 0
        tint = 0.4 + 0.6 * ((c % 7) / 6.0)
        x[i, y1:y1 + h, x1:x1 + w, :] = [tint, 1.0 - tint, 0.8]
        cwh = box_ops.xy_to_cwh([x1, y1, x1 + w, y1 + h])
        (xc, yc, bw, bh), (row, col) = box_ops.normalize_box_cwh(
            (size, size), g, cwh)
        y[i, row, col, 0:5] = [1.0, xc, yc, bw, bh]
        if n_cls:
            y[i, row, col, 5 + c] = 1.0
    return x, y


def _params_from_cfg(model, cfg):
    base = dict(model=model, lr_runtime=1e-3, eval_every=1, train_frac=1,
                recon=True, recon_coef=5e-4, routing_impl="xla",
                mesh="off", compute_dtype="float32", seed=0,
                capsule_input=32, n_epochs=1)
    base.update({k: v for k, v in cfg.items() if k != "lr"})
    return Params(**base)


def _train_ours(model, cfg, n_train=32, n_epochs=4):
    """A few epochs on the deterministic synthetic set: enough that the
    weights/BN stats are 'real' (not an init draw) without making the
    leg slow.  Returns (params, trainer-with-trained-state).

    Detectors train on large-sign scenes (_easy_detection_scenes); the
    weight preparation for the predict legs continues in
    _prepare_detector (BN re-estimation, raw-input baking, confidence
    readout) — see its docstring for why."""
    np.random.seed(0)
    p = _params_from_cfg(model, cfg)
    if model in ("darknet_r", "darknet_d"):
        x_tr, y_tr = _easy_detection_scenes(p, n_train, seed=1)
    else:
        x_tr, y_tr, _, _ = synthetic_dataset(model, p, n_train, 8)
    trainer = Trainer(p, verbose=False)
    plateau = ReduceLROnPlateau(lr=p.lr_runtime, factor=p.lr_decay)
    for _ in range(n_epochs):
        loss, _ = trainer.train_epoch(x_tr, y_tr, plateau.lr,
                                      metric_on=False)
        plateau.step(loss)
    return p, trainer, (x_tr, y_tr)


def _prepare_detector(trainer, p, x_tr, frames, y_te, size):
    """Make the trained detector's predict-time detections
    deterministic.  Three steps, all on the exported WEIGHTS (the test
    harness's weight prep — both frameworks then consume the identical
    checkpoint; no product code involved):

    1. Exact BN re-estimation: one train-mode pass over the training
       set, inverting the EMA (flax momentum 0.99 = the reference's
       torch momentum 0.01) to recover the true batch statistics — the
       legs' 64-step training budget moves the running stats only ~50%
       from their (0, 1) init, which leaves the eval-mode forward
       badly normalized.
    2. Raw-input baking: predict feeds detectors cv2-read frames with
       NO centering (reference predict_fns.py:36-43, its own quirk),
       while training data is center_rgb'd.  conv1 is linear and bn_1
       absorbs constants, so conv1/=128 and running_mean += sum(w)
       serve raw = 128*x+128 exactly as the trained net saw centered x
       (exact in the interior; zero-padding makes the one-pixel border
       ring see black instead of gray).
    3. Confidence readout: dark_loss trains confidence toward the
       responsible box's IoU (reference loss_fns.py:113-118), which
       after a CPU-budget training sits at ~0.3-0.45 — BELOW the
       reference's fixed predict conf_th=0.5, so whether any detection
       survives thresholding is numerical luck, and the --combine legs
       CRASH the reference on zero crops (class_pred permutes an empty
       array).  Instead of training 10x longer, the conf channel(s) of
       the 1x1 head are set to the min-norm least-squares readout of
       the GT objectness (+-3 logits) over the net's own block_18
       features on the exact predict frames: a linear probe fitted in
       closed form rather than by SGD.  Detections then sit at the GT
       cells with conf ~0.95 on BOTH sides, and every other channel
       (boxes, classes, all 18 conv blocks, BN, pooling) remains the
       trained network.  Trained-trajectory parity is covered by
       tests/test_convergence_parity.py; these legs compare the
       predict COMPOSITION at identical weights.
    """
    import cv2
    import flax
    import jax
    import jax.numpy as jnp

    model = trainer.model

    # 1. exact BN re-estimation (invert the EMA)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    _, mut = model.apply(
        variables, jnp.asarray(x_tr), train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    bs = jax.tree_util.tree_map(
        lambda n, o: (n - 0.99 * o) / 0.01,
        flax.core.unfreeze(dict(mut["batch_stats"])),
        flax.core.unfreeze(dict(trainer.state.batch_stats)))

    # 2. bake centering into conv1 + bn_1
    params = flax.core.unfreeze(trainer.state.params)
    w1 = np.asarray(params["block_1"]["conv_1"]["kernel"])
    params["block_1"]["conv_1"]["kernel"] = jnp.asarray(w1 / 128.0)
    bs["block_1"]["bn_1"]["mean"] = jnp.asarray(
        np.asarray(bs["block_1"]["bn_1"]["mean"]) + w1.sum(axis=(0, 1, 2)))
    trainer.state = trainer.state.replace(params=params, batch_stats=bs)

    # 3. fit the confidence readout on the exact predict inputs
    x_pred = jnp.asarray(np.stack(
        [cv2.resize(im, (size, size)) for im in frames]
    ).astype(np.float32))
    variables = {"params": trainer.state.params, "batch_stats": bs}
    _, inter = model.apply(
        variables, x_pred, train=False,
        capture_intermediates=lambda mdl, _name: mdl.name == "block_18",
        mutable=["intermediates"])
    feats = np.asarray(
        jax.tree_util.tree_leaves(inter["intermediates"])[0])
    n, g, _, c = feats.shape
    A = feats.reshape(n * g * g, c)
    t = np.where(y_te[..., 0].reshape(-1) > 0.5, 3.0, -3.0)
    wconf, *_ = np.linalg.lstsq(A, t, rcond=None)
    head = np.array(params["conv_19"]["kernel"])  # (1, 1, C, 5B[+C])
    for b in range(int(p.n_boxes)):
        head[0, 0, :, 5 * b] = wconf
    params["conv_19"]["kernel"] = jnp.asarray(head)
    trainer.state = trainer.state.replace(params=params)
    return trainer


def _run_our_cli(work, model, combine=None):
    args = ["--model", model, "--mode", "predict", "--restore", "last"]
    if combine:
        args += ["--combine", combine]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import sys; sys.argv = ['main.py'] + %r;"
        "sys.path.insert(0, %r);"
        "import main; main.main()" % (args, REPO)
    )
    env = dict(os.environ)
    return subprocess.run([sys.executable, "-c", code], cwd=work, env=env,
                          capture_output=True, text=True, timeout=1800)


def _parse_metric_output(path):
    with open(path) as f:
        txt = f.read()
    out = {}
    for part in txt.split(", "):
        if ":" in part:
            k, v = part.split(":", 1)
            try:
                out[k.strip()] = float(v)
            except ValueError:
                pass
    return out


def _build_leg(tmp_path_factory, model, cfg, combine=None):
    tag = model + (combine or "")
    ref_work = str(tmp_path_factory.mktemp("refpred_" + tag))
    our_work = str(tmp_path_factory.mktemp("ourpred_" + tag))
    test_data = None
    if model in ("darknet_r", "darknet_d"):
        test_data = _easy_detection_scenes(_params_from_cfg(model, cfg),
                                           N_TEST, seed=2)
    env = prepare_reference_predict_workdir(
        ref_work, model=model, params_json=cfg, combine=combine,
        n_test=N_TEST, test_data=test_data)
    prepare_reference_predict_workdir(
        our_work, model=model, params_json=cfg, combine=combine,
        n_test=N_TEST, capture=False, test_data=test_data)

    n_ep = 8 if model in ("darknet_r", "darknet_d") else 4
    p, trainer, (x_tr, _y_tr) = _train_ours(model, cfg, n_epochs=n_ep)
    if test_data is not None:
        frames = _load_raw_images(our_work)
        trainer = _prepare_detector(trainer, p, x_tr, frames,
                                    test_data[1],
                                    int(cfg.get("darknet_input", 64)))
    our_dir = os.path.join(our_work, "experiments", model)
    os.makedirs(our_dir, exist_ok=True)
    ckpt.save_checkpoint(trainer.state_dict(n_ep, None), is_best=False,
                         checkpoint_dir=our_dir)
    interop.export_torch_checkpoint(
        os.path.join(our_dir, "last.ckpt"), p,
        os.path.join(ref_work, "experiments", model, "last.pth.tar"))

    cls_p = None
    if combine:
        cls_p, cls_tr, _ = _train_ours(combine, CLS_CFG, n_train=64,
                                       n_epochs=2)
        cdir = os.path.join(our_work, "experiments", combine)
        os.makedirs(cdir, exist_ok=True)
        ckpt.save_checkpoint(cls_tr.state_dict(2, None), is_best=False,
                             checkpoint_dir=cdir)
        interop.export_torch_checkpoint(
            os.path.join(cdir, "last.ckpt"), cls_p,
            os.path.join(ref_work, "experiments", combine,
                         "last.pth.tar"))
        # the classifier leg's own params.json (reference load_params
        # reads it for the --combine model, main.py:330-334)
        with open(os.path.join(our_work, "experiments", combine,
                               "params.json"), "w") as f:
            json.dump(CLS_CFG, f)

    extra = ("--restore", "last")
    if combine:
        extra += ("--combine", combine)
    proc = run_reference(ref_work, env, model=model, mode="predict",
                         extra_args=extra)
    dec_path = os.path.join(ref_work, "ref_decode_0.npz")
    if combine and os.path.exists(dec_path):
        # fail loudly before the cryptic reference traceback: with zero
        # boxes above conf_th the --combine comparison is vacuous and
        # the reference itself crashes on the empty crop array (and at
        # exactly one crop its CapsuleNet .squeeze() drops the batch
        # dim, models.py:116)
        assert np.load(dec_path)["idx"].shape[0] >= 2, (
            "leg detector found <2 boxes above conf_th on the raw "
            "frames — adjust the _prepare_detector recipe")
    assert proc.returncode == 0, (proc.stdout[-2000:]
                                  + proc.stderr[-2000:])

    r = _run_our_cli(our_work, model, combine=combine)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    return dict(ref_work=ref_work, our_work=our_work, params=p,
                cls_params=cls_p)


def _load_raw_images(work):
    import cv2

    names = np.load(os.path.join(work, "data/GTSDB/test_names.npy"))
    return [cv2.imread(os.path.join(work, "data/GTSDB/raw_GTSDB", n))
            for n in names]


def _our_predict_arrays(leg, model):
    """Run OUR predict path in-process (the same dark_pred + decode the
    CLI drives) to expose the y_hat grid and flat box list."""
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import (
        dark_pred,
    )

    p = leg["params"]
    images = _load_raw_images(leg["our_work"])
    image_hw = np.array([im.shape[:2] for im in images])
    our_dir = os.path.join(leg["our_work"], "experiments", model)
    y_hat, _ = dark_pred(images, our_dir, p, "last")

    size = int(p.darknet_input)
    decoded = decode_ops.decode_grid(
        jnp.asarray(y_hat), n_classes=int(p.n_classes),
        n_boxes=int(p.n_boxes), img_size=size, conf_th=0.5)
    idx, xy, cls = decode_ops.to_flat_host(
        decoded, image_hw=image_hw, img_size=size,
        with_classes=int(p.n_classes) != 0)
    return y_hat, idx, xy, cls


def _assert_decode_matches(ref_npz, y_hat, idx, xy, cls):
    ref = np.load(ref_npz)
    np.testing.assert_allclose(y_hat, ref["y"], rtol=1e-4, atol=1e-4)
    assert idx.shape[0] == ref["idx"].shape[0], (
        "box count mismatch: ours {} vs reference {}".format(
            idx.shape[0], ref["idx"].shape[0]))
    np.testing.assert_array_equal(idx, ref["idx"])
    np.testing.assert_allclose(xy, ref["xy"], rtol=1e-3, atol=5e-2)
    if cls is not None and ref["cls"].size:
        np.testing.assert_array_equal(cls, ref["cls"])


def _assert_metric_files_match(ref_path, our_path, atol=5e-3):
    ref_m = _parse_metric_output(ref_path)
    our_m = _parse_metric_output(our_path)
    assert set(ref_m) == set(our_m), (ref_m, our_m)
    assert ref_m, "reference wrote no metrics"
    for k in ref_m:
        if np.isnan(ref_m[k]) or np.isnan(our_m[k]):
            # the darknet_d --combine leg's mAP is nan on BOTH sides by
            # reference quirk (metrics.py:285 mutates n_classes to 43,
            # the C=0 ground truth then masks out every class) — nan==
            # nan is the parity assertion there
            assert np.isnan(ref_m[k]) and np.isnan(our_m[k]), (
                k, ref_m[k], our_m[k])
            continue
        assert abs(ref_m[k] - our_m[k]) <= atol, (
            k, ref_m[k], our_m[k], ref_m, our_m)


@pytest.fixture(scope="module")
def leg_darknet_r(tmp_path_factory):
    return _build_leg(tmp_path_factory, "darknet_r", DET_R_CFG)


@pytest.fixture(scope="module")
def leg_darknet_d(tmp_path_factory):
    return _build_leg(tmp_path_factory, "darknet_d", DET_D_CFG)


@pytest.fixture(scope="module")
def leg_combine(tmp_path_factory):
    return _build_leg(tmp_path_factory, "darknet_r", DET_R_CFG,
                      combine="cnn")


def _assert_class_leg_matches(leg, model):
    """Shared body for the class-model legs (reference main.py:309-317):
    class_pred scores vs the captured reference call, argmax classes,
    every metric_output.txt number, and the PR/ROC PNG artifacts."""
    import pickle

    from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import (
        class_pred,
    )

    with open(os.path.join(leg["our_work"], "data/GTSRB/test.p"),
              "rb") as f:
        x, _ = pickle.load(f)
    our_dir = os.path.join(leg["our_work"], "experiments", model)
    y_hat, classes = class_pred(x, our_dir, leg["params"], "last")

    ref = np.load(os.path.join(leg["ref_work"], "ref_class_pred.npz"))
    np.testing.assert_allclose(y_hat, ref["y_hat"], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        classes, np.argmax(ref["y_hat"], axis=1))

    _assert_metric_files_match(
        os.path.join(leg["ref_work"], "experiments", model,
                     "metric_output.txt"),
        os.path.join(leg["our_work"], "experiments", model,
                     "metric_output.txt"))

    # recog_pr/recog_auc save=True plots written on both sides
    for work in (leg["ref_work"], leg["our_work"]):
        mdir = os.path.join(work, "experiments", model)
        pngs = [f for f in os.listdir(mdir) if f.endswith(".png")]
        assert pngs, "no PR/ROC artifacts in " + mdir


@pytest.fixture(scope="module")
def leg_cnn(tmp_path_factory):
    return _build_leg(tmp_path_factory, "cnn", CLS_CFG)


@pytest.fixture(scope="module")
def leg_capsule(tmp_path_factory):
    return _build_leg(tmp_path_factory, "capsule", CLS_CFG)


def test_cnn_class_predict_end_to_end(leg_cnn):
    _assert_class_leg_matches(leg_cnn, "cnn")


def test_capsule_class_predict_end_to_end(leg_capsule):
    _assert_class_leg_matches(leg_capsule, "capsule")


def test_darknet_r_predict_end_to_end(leg_darknet_r):
    leg = leg_darknet_r
    y_hat, idx, xy, cls = _our_predict_arrays(leg, "darknet_r")

    # grid + predicted boxes vs the reference's captured dark_pred call
    _assert_decode_matches(
        os.path.join(leg["ref_work"], "ref_decode_0.npz"),
        y_hat, idx, xy, cls)

    # ground-truth boxes decode identically too (call 2 in dark_pred)
    ref_gt = np.load(os.path.join(leg["ref_work"], "ref_decode_1.npz"))
    assert ref_gt["idx"].shape[0] == N_TEST  # one synthetic sign/frame

    # every number in metric_output.txt (detect_AP, detect_acc)
    _assert_metric_files_match(
        os.path.join(leg["ref_work"], "experiments/darknet_r",
                     "metric_output.txt"),
        os.path.join(leg["our_work"], "experiments/darknet_r",
                     "metric_output.txt"))

    # annotated outputs written on both sides, one per test frame
    assert len(os.listdir(os.path.join(
        leg["ref_work"], "experiments/darknet_r/output"))) == N_TEST
    assert len(os.listdir(os.path.join(
        leg["our_work"], "experiments/darknet_r/output"))) == N_TEST


def test_darknet_d_predict_end_to_end(leg_darknet_d):
    leg = leg_darknet_d
    y_hat, idx, xy, cls = _our_predict_arrays(leg, "darknet_d")
    _assert_decode_matches(
        os.path.join(leg["ref_work"], "ref_decode_0.npz"),
        y_hat, idx, xy, None)
    _assert_metric_files_match(
        os.path.join(leg["ref_work"], "experiments/darknet_d",
                     "metric_output.txt"),
        os.path.join(leg["our_work"], "experiments/darknet_d",
                     "metric_output.txt"))


def _assert_combine_leg_matches(leg, model, combine):
    """Shared body for the two-stage legs: crops -> classifier ->
    combine_y_hat grid write-back (reference predict_fns.py:75-82,
    utils.py:336-351) plus combine-<cls>_metric_output.txt."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import (
        dark_class_pred,
    )

    images = _load_raw_images(leg["our_work"])
    our_dark_dir = os.path.join(leg["our_work"], "experiments", model)
    our_cls_dir = os.path.join(leg["our_work"], "experiments", combine)
    y_comb, _ = dark_class_pred(
        images, our_dark_dir, leg["params"], our_cls_dir,
        leg["cls_params"], "last")

    ref = np.load(os.path.join(leg["ref_work"], "ref_combine.npz"))
    # combined grid: detector box channels tight; classifier channels
    # carry crop resampling + conv/routing noise through the score head
    # (identical crops from identical frames -> only f32 noise remains)
    b5 = 5 * int(leg["params"].n_boxes)
    assert y_comb.shape == ref["combined"].shape
    np.testing.assert_allclose(y_comb[..., :b5],
                               ref["combined"][..., :b5],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y_comb, ref["combined"],
                               rtol=1e-3, atol=1e-3)

    name = "combine-{}_metric_output.txt".format(combine)
    _assert_metric_files_match(
        os.path.join(leg["ref_work"], "experiments", model, name),
        os.path.join(leg["our_work"], "experiments", model, name))


def test_combine_predict_end_to_end(leg_combine):
    _assert_combine_leg_matches(leg_combine, "darknet_r", "cnn")


@pytest.fixture(scope="module")
def leg_combine_capsule(tmp_path_factory):
    return _build_leg(tmp_path_factory, "darknet_r", DET_R_CFG,
                      combine="capsule")


@pytest.fixture(scope="module")
def leg_combine_d(tmp_path_factory):
    return _build_leg(tmp_path_factory, "darknet_d", DET_D_CFG,
                      combine="cnn")


def test_combine_capsule_predict_end_to_end(leg_combine_capsule):
    """The namesake capsule-YOLO composition (VERDICT r4 item 1):
    capsule scores (= capsule norms, reference models.py:117) flow
    through crops -> combine_y_hat — numerics (dynamic routing) the cnn
    leg never touches.  Reference legality: main.py:301-303, 330-334."""
    _assert_combine_leg_matches(leg_combine_capsule, "darknet_r",
                                "capsule")


def test_combine_darknet_d_predict_end_to_end(leg_combine_d):
    """darknet_d (B=2/C=0) --combine cnn: the 10-channel dark grid +
    appended classifier channels.  The combine metrics are nan/0.0 on
    BOTH sides by reference quirk (metrics.py:285 mutates n_classes to
    43, the 5-channel ground truth then decodes to zero boxes and masks
    out every class) — reproduced, not fixed (COMPAT class: preserve
    observable behavior)."""
    _assert_combine_leg_matches(leg_combine_d, "darknet_d", "cnn")

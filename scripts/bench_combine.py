"""Two-stage `--combine` pipeline benchmark (VERDICT r2 item 4).

The reference's flagship demo (predict_fns.py:75-82): detect with
darknet @448, crop the detections on the host, resize/center them, run
the classifier over the crops, and write the class probabilities back
into the detector grid (combine_y_hat, utils.py:336-351).  This script
measures that composition end to end on the chip with the SAME public
pieces the product path uses, reporting img/s plus the share spent in
the host round-trip in the middle (D2H fetch -> cv2 crops/resize ->
re-upload as a classifier batch).

Stage anatomy (one repetition over the whole image set):
  preprocess  host cv2 resize of the raw frames to 448 (product does
              this too, dark_pred:117-121)
  detect      jitted forward + full-width on-device grid decode,
              batched; ends at the D2H fetch of the decode outputs
  crops       host: flat box lists -> draw + crop -> cv2 resize to 32
              -> center_rgb  (the host round-trip's host half)
  classify    jitted classifier forward over all crops, batched;
              ends at the D2H fetch of the scores
  combine     host: combine_y_hat grid write-back

Untrained nets give ~uniform sigmoid confidences, so the detection
density is CONTROLLED: the confidence threshold is calibrated from the
first batch's decoded confidences to hit ~--crops_per_image detections
per image (reported).  Weights are random-init — throughput does not
depend on their values.

Usage:
  python scripts/bench_combine.py [--n_images 256] [--batch 128]
      [--classifier capsule|cnn] [--dtype float32|bfloat16|int8]
      [--crops_per_image 2] [--repeats 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 448
N_BOXES = 1
N_CLASSES = 43
CAP_IN = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--classifier", default="capsule",
                    choices=["capsule", "cnn"])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="detector serving dtype (the classifier runs "
                         "f32; its share is tiny)")
    ap.add_argument("--crops_per_image", type=float, default=2.0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--device_crop", action="store_true",
                    help="fused detect->crop->classify in ONE device "
                         "program (ops/crop.py + export.make_two_stage_fn"
                         "; COMPAT #33) instead of the host crop hop")
    ap.add_argument("--max_crops", type=int, default=8,
                    help="device_crop: static per-image crop cap")
    ap.add_argument("--size", type=int, default=448,
                    help="detector input (448 = flagship; smaller for "
                         "CPU smoke tests)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (no TPU claim)")
    args = ap.parse_args()

    global SIZE
    SIZE = args.size

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import cv2
    import jax.numpy as jnp

    from cs231_capsule_yolo_traffic_sign_detection_tpu import viz
    from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader import (
        center_rgb,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        CapsuleNet, ConvNet, DarkNet,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import (
        decode as decode_ops,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops import quant
    from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.boxes import (
        combine_y_hat,
    )
    from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params

    log(f"[combine] backend={jax.default_backend()} dtype={args.dtype} "
        f"classifier={args.classifier} n_images={args.n_images} "
        f"batch={args.batch}")

    # ---- models (random init; see module docstring) --------------------
    det = DarkNet(n_boxes=N_BOXES, n_classes=N_CLASSES, dropout=0.0)
    x0 = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    dvars = det.init(jax.random.PRNGKey(0), x0, train=False)

    if args.dtype == "bfloat16":
        dvars = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, dvars)
    elif args.dtype == "int8":
        cal = jnp.asarray(np.random.RandomState(0).rand(
            32, SIZE, SIZE, 3).astype(np.float32) * 255.0)
        dvars = quant.quantize_darknet(dvars, x_cal=cal)

    if args.classifier == "capsule":
        cls_model = CapsuleNet(n_classes=N_CLASSES,
                               routing_impl="pallas"
                               if jax.default_backend() == "tpu" else "xla")
    else:
        cls_model = ConvNet(n_classes=N_CLASSES, dropout=0.0)
    c0 = jnp.zeros((2, CAP_IN, CAP_IN, 3), jnp.float32)
    cvars = cls_model.init(jax.random.PRNGKey(1), c0, train=False)

    g = SIZE // 32

    def det_forward(variables, x):
        if args.dtype == "int8":
            y = quant.darknet_int8_resident_apply(
                variables, x, n_boxes=N_BOXES, n_classes=N_CLASSES)
        else:
            y = det.apply(variables, x.astype(
                jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32),
                train=False).astype(jnp.float32)
        return y

    def det_step(variables, x, conf_th):
        y = det_forward(variables, x)
        d = decode_ops.decode_grid(
            y, n_classes=N_CLASSES, n_boxes=N_BOXES, img_size=SIZE,
            max_boxes=g * g * N_BOXES, conf_th=conf_th)
        # tiny device checksum: fetching it waits for the device chain
        # WITHOUT pulling the big tensors — splits detect into compute
        # vs D2H (over the tunneled backend the D2H of the full grid
        # dominates and is an artifact of the link, not the pipeline)
        chk = jnp.sum(d["conf"])
        return y, d, chk

    det_jit = jax.jit(det_step)
    cls_jit = jax.jit(
        lambda v, x: cls_model.apply(v, x, train=False).astype(jnp.float32))

    def fused_step(dv, cv, x, conf_th):
        """detect -> decode -> device crop/resize/center -> classify,
        one program (the export.make_two_stage_fn composition, inlined
        here so the int8 detector variant composes too)."""
        from cs231_capsule_yolo_traffic_sign_detection_tpu.data.loader \
            import center_rgb
        from cs231_capsule_yolo_traffic_sign_detection_tpu.ops.crop \
            import crop_resize_bilinear

        y = det_forward(dv, x)
        d = decode_ops.decode_grid(
            y, n_classes=N_CLASSES, n_boxes=N_BOXES, img_size=SIZE,
            max_boxes=args.max_crops, conf_th=conf_th)
        crops = crop_resize_bilinear(x, d["xy"], CAP_IN, valid=d["valid"])
        b, m = crops.shape[:2]
        flat = center_rgb(crops.reshape(b * m, CAP_IN, CAP_IN, 3))
        scores = cls_model.apply(cv, flat, train=False)
        scores = scores.astype(jnp.float32).reshape(b, m, -1)
        return y, d, scores, jnp.sum(d["conf"]) + jnp.sum(scores)

    fused_jit = jax.jit(fused_step)

    # ---- synthetic GTSDB-like frames -----------------------------------
    rng = np.random.RandomState(0)
    images = [(rng.rand(800, 1360, 3) * 255).astype(np.uint8)
              for _ in range(args.n_images)]
    image_hw = np.array([im.shape[:2] for im in images])

    # ---- calibrate the confidence threshold (controlled density) -------
    x_cal = np.stack([cv2.resize(im, (SIZE, SIZE))
                      for im in images[: args.batch]]).astype(np.float32)
    _, d_cal, _ = det_jit(dvars, jnp.asarray(x_cal), 0.0)
    conf = np.sort(np.asarray(d_cal["conf"]).ravel())[::-1]
    want = int(round(args.crops_per_image * x_cal.shape[0]))
    conf_th = float(conf[min(want, conf.size - 1)])
    log(f"[combine] calibrated conf_th={conf_th:.4f} "
        f"(target {args.crops_per_image}/img)")

    # ---- one full pipeline pass, staged ---------------------------------
    def pipeline():
        t = {}
        t0 = time.perf_counter()
        x = np.stack([cv2.resize(im, (SIZE, SIZE))
                      for im in images]).astype(np.float32)
        t["preprocess"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        xbs = [jnp.asarray(x[i: i + args.batch])
               for i in range(0, x.shape[0], args.batch)]
        for xb in xbs:
            float(xb[0, 0, 0, 0])  # barrier: upload landed
        t["h2d"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        ys, ds, scs, chks = [], [], [], []
        for xb in xbs:
            if args.device_crop:
                y, d, sc, chk = fused_jit(dvars, cvars, xb, conf_th)
                scs.append(sc)
            else:
                y, d, chk = det_jit(dvars, xb, conf_th)
            ys.append(y)
            ds.append(d)
            chks.append(chk)
        for chk in chks:
            float(chk)  # device chain done; big tensors still on device
        t["detect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        y_hat = np.concatenate([np.asarray(y) for y in ys], axis=0)
        decoded = {k: np.concatenate([np.asarray(d[k]) for d in ds], axis=0)
                   for k in ds[0]}
        scores = (np.concatenate([np.asarray(s) for s in scs], axis=0)
                  if args.device_crop else None)
        t["detect_d2h"] = time.perf_counter() - t0  # the fetch itself

        t0 = time.perf_counter()
        (image_indices, boxes_xy, classes0), _flat = \
            decode_ops.to_flat_host_with_extras(
                decoded,
                {"scores": scores} if args.device_crop else None,
                image_hw=image_hw, img_size=SIZE, with_classes=True)
        if args.device_crop:
            # annotation still happens (product behavior); the crops
            # were classified ON DEVICE inside the fused program
            viz.draw_boxes_vec(images, image_indices, boxes_xy, classes0)
            crops = None
        else:
            _, crops_bch = viz.draw_boxes_vec(
                images, image_indices, boxes_xy, classes0)
            all_crops = [
                cv2.resize(crop, (CAP_IN, CAP_IN)) if crop.size > 0
                else np.zeros((CAP_IN, CAP_IN, 3), np.float32)
                for crops in crops_bch for crop in crops
            ]
            crops = (np.array(all_crops, np.float32) if all_crops
                     else np.zeros((0, CAP_IN, CAP_IN, 3), np.float32))
            crops = center_rgb(crops)
        t["crops"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        if args.device_crop:
            # fused per-box scores, flattened in to_flat_host's order
            class_y_hat = _flat["scores"]
            n_crops_run = class_y_hat.shape[0]
        else:
            if crops.shape[0]:
                outs = []
                for i in range(0, crops.shape[0], args.batch):
                    outs.append(cls_jit(
                        cvars, jnp.asarray(crops[i: i + args.batch])))
                class_y_hat = np.concatenate([np.asarray(o) for o in outs],
                                             axis=0)
            else:
                class_y_hat = np.zeros((0, N_CLASSES), np.float32)
            n_crops_run = crops.shape[0]
        t["classify"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        p = Params(model="darknet_r", n_classes=N_CLASSES, n_boxes=N_BOXES,
                   n_grid=g, darknet_input=SIZE, capsule_input=CAP_IN)
        combined = combine_y_hat(images, y_hat, class_y_hat,
                                 image_indices, boxes_xy, p)
        t["combine"] = time.perf_counter() - t0
        return t, n_crops_run, combined

    log("[combine] warmup (compiles both stages)...")
    t_w, n_crops, _ = pipeline()
    log(f"[combine] warmup done: {t_w}; crops={n_crops}")

    runs = []
    for r in range(args.repeats):
        t, n_crops, _ = pipeline()
        runs.append(t)
        log(f"[combine] run {r}: " + " ".join(
            f"{k}={v * 1e3:.0f}ms" for k, v in t.items()))

    best = min(runs, key=lambda t: sum(t.values()))
    total = sum(best.values())
    n = args.n_images
    # the host round-trip in the middle of the pipeline: fetch the
    # detector outputs, crop/resize/center on host, (re-upload happens
    # inside classify's first dispatch), write back the combined grid
    host = (best["preprocess"] + best["detect_d2h"] + best["crops"]
            + best["combine"])
    print(f"\n=== two-stage --combine pipeline (darknet_r@{SIZE} + "
          f"{args.classifier}, detector dtype={args.dtype}) ===")
    print(f"images: {n}   crops: {n_crops} "
          f"({n_crops / n:.2f}/img)   batch: {args.batch}")
    for k, v in best.items():
        print(f"  {k:10s} {v * 1e3:8.1f} ms   {100 * v / total:5.1f}%")
    print(f"  {'TOTAL':10s} {total * 1e3:8.1f} ms   e2e {n / total:.1f} img/s")
    print(f"  host round-trip share (preprocess+d2h+crops+combine): "
          f"{100 * host / total:.1f}%")
    print(f"  e2e excl. preprocess: "
          f"{n / (total - best['preprocess']):.1f} img/s "
          "(frames pre-resized, serving-style)")
    no_tunnel = total - best["detect_d2h"] - best["h2d"]
    print(f"  e2e excl. h2d + detect D2H: {n / no_tunnel:.1f} img/s "
          "(PCIe-attached estimate; over this TUNNELED backend the "
          "~300 MB/batch image upload and ~10 MB grid fetch are "
          "link-bound, see BASELINE.md)")


if __name__ == "__main__":
    main()

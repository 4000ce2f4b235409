"""Export a trained model as a self-contained serving artifact.

    python scripts/export_serving.py --model darknet_r --restore best \
        [--model_dir DIR] [--out artifact.stablehlo] [--batch 128] \
        [--dtype bfloat16] [--nms] [--platforms tpu,cpu]

The artifact bakes the weights in and contains forward + on-device
grid decode in one compiled program; a serving process needs only
`jax` to run it:

    from cs231_capsule_yolo_traffic_sign_detection_tpu import export
    serve = export.load_serving("artifact.stablehlo")
    out = serve(images)        # (B, S, S, 3) float32

By default the batch dimension is exported symbolically (any batch at
call time); --batch pins it.  The artifact is verified against the
live model before the script exits.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--model", required=True)
    ap.add_argument("--restore", default="best", help="last | best")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--out", default=None,
                    help="output path (default <model_dir>/serving.stablehlo)")
    ap.add_argument("--batch", type=int, default=None,
                    help="pin the batch dim (default: symbolic)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "f32", "bfloat16", "bf16", "int8"],
                    help="serving dtype; int8 (detectors only) exports "
                         "the calibrated int8-resident chain with the "
                         "static activation scales baked in — "
                         "calibrated on the test split (synthetic "
                         "fallback), or pass --calib npy")
    ap.add_argument("--calib", default=None,
                    help="int8: .npy file with a representative "
                         "(B, S, S, 3) calibration batch (default: "
                         "first test batch, synthetic fallback)")
    ap.add_argument("--conf_th", type=float, default=0.5)
    ap.add_argument("--combine", default=None,
                    help="cnn | capsule: export the FUSED two-stage "
                         "pipeline (detect -> crop -> classify, "
                         "COMPAT #33) as one artifact; composes with "
                         "--dtype int8/bfloat16 (int8-resident "
                         "detector, f32 classifier)")
    ap.add_argument("--max_crops", type=int, default=16,
                    help="--combine: static per-image crop cap")
    ap.add_argument("--nms", action="store_true",
                    help="bake on-device NMS into the artifact")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current backend)")
    # default stays int 1 like main.py's: the checkpoint dir is
    # model_dir+str(train_frac) (reference quirk), so 1 -> "...1"
    ap.add_argument("--train_frac", type=float, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="export on the host CPU (no TPU claim)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from main import get_data_and_model_dir, load_params
    from cs231_capsule_yolo_traffic_sign_detection_tpu import export
    from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
        model_input_shape,
    )

    model_dir = args.model_dir or get_data_and_model_dir(args.model)[1]
    # derive the namespace from main's OWN parser defaults so new CLI
    # flags can never drift out of sync with this script
    import main as main_mod

    ns = main_mod.parser.parse_args([])
    ns.model = args.model
    ns.train_frac = args.train_frac
    ns.mesh = "off"
    ns.routing = "auto"
    params = load_params(model_dir, ns, with_writer=False)

    if args.dtype == "int8":
        dtype = "int8"
    elif args.dtype in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32
    platforms = tuple(args.platforms.split(",")) if args.platforms else None

    x_cal = None
    if dtype == "int8":
        import numpy as np

        if args.calib:
            x_cal = np.load(args.calib).astype(np.float32)
        else:
            # mirror predict.py's calibration source: the first
            # batch_size test inputs at model scale (synthetic fallback
            # when the dataset is absent — deterministic)
            from cs231_capsule_yolo_traffic_sign_detection_tpu.data import (
                loader as data_loader,
            )

            data_dir = get_data_and_model_dir(args.model)[0]
            try:
                import pickle

                with open(data_dir + "/test.p", "rb") as f:
                    x_cal, _ = pickle.load(f)
                x_cal = np.asarray(x_cal, np.float32)
            except (FileNotFoundError, OSError):
                _, _, x_cal, _ = data_loader.synthetic_dataset(
                    args.model, params, n_train=2,
                    n_eval=int(params.batch_size))
            x_cal = x_cal[: int(params.batch_size)]
        print(f"[export] int8 calibration batch: {x_cal.shape}")

    if args.combine:
        if args.combine not in ("cnn", "capsule"):
            ap.error("--combine must be cnn or capsule")
        if args.model not in ("darknet_d", "darknet_r"):
            ap.error("--combine exports the two-stage pipeline for the "
                     "DarkNet detectors only")
        cls_model_dir = get_data_and_model_dir(args.combine)[1]
        cls_ns = main_mod.parser.parse_args([])
        cls_ns.model = args.combine
        cls_ns.train_frac = args.train_frac
        cls_ns.mesh = "off"
        cls_params = load_params(cls_model_dir, cls_ns, with_writer=False)
        blob, fn = export.export_two_stage_from_checkpoints(
            params, model_dir, cls_params, cls_model_dir, args.restore,
            batch=args.batch, max_crops=args.max_crops,
            conf_th=args.conf_th, use_nms=args.nms, dtype=dtype,
            platforms=platforms, x_cal=x_cal)
    else:
        blob, fn = export.export_from_checkpoint(
            params, model_dir, args.restore, batch=args.batch,
            conf_th=args.conf_th, use_nms=args.nms, dtype=dtype,
            platforms=platforms, x_cal=x_cal)

    out = args.out or os.path.join(model_dir, "serving.stablehlo")
    export.save(blob, out)
    print(f"[export] wrote {out} ({len(blob) / 1e6:.1f} MB)")

    serve = export.load_serving(out)
    shape = model_input_shape(params)
    export.selfcheck(serve, fn, shape, batch=args.batch or 2)
    print("[export] self-check passed (artifact == live model)")


if __name__ == "__main__":
    main()

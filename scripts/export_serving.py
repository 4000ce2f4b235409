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
                    choices=["float32", "f32", "bfloat16", "bf16"],
                    help="serving compute dtype (int8 serving is a "
                         "calibrated predict-time path, not exportable "
                         "as a weights-baked artifact yet)")
    ap.add_argument("--conf_th", type=float, default=0.5)
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

    dtype = jnp.bfloat16 if args.dtype in ("bfloat16", "bf16") else jnp.float32
    platforms = tuple(args.platforms.split(",")) if args.platforms else None

    blob, fn = export.export_from_checkpoint(
        params, model_dir, args.restore, batch=args.batch,
        conf_th=args.conf_th, use_nms=args.nms, dtype=dtype,
        platforms=platforms)

    out = args.out or os.path.join(model_dir, "serving.stablehlo")
    export.save(blob, out)
    print(f"[export] wrote {out} ({len(blob) / 1e6:.1f} MB)")

    serve = export.load_serving(out)
    shape = model_input_shape(params)
    export.selfcheck(serve, fn, shape, batch=args.batch or 2)
    print("[export] self-check passed (artifact == live model)")


if __name__ == "__main__":
    main()

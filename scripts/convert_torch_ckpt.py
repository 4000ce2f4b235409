"""Migrate checkpoints between the torch reference and this framework.

Import (reference -> ours):
    python scripts/convert_torch_ckpt.py --model darknet_r \
        --pth /path/to/last.pth.tar --out experiments/darknet_r1 [--best]

Export (ours -> reference-loadable .pth.tar):
    python scripts/convert_torch_ckpt.py --model cnn \
        --ckpt experiments/cnn1/last.ckpt --to-torch /tmp/last.pth.tar

Weights and BN running stats always convert; Adam moments convert when
the torch optimizer state maps one-to-one onto the parameters (i.e. the
checkpoint was not fine-tuned with frozen layers), so training resumes
with the exact optimizer state.  See cyt.interop for the layout rules.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_params(model_name, train_frac=1):
    """Params via the SAME assembly path as every other entry point
    (main.load_params), so override semantics can't drift."""
    import main as main_mod
    from main import get_data_and_model_dir, load_params

    model_dir = get_data_and_model_dir(model_name)[1]
    # derive the namespace from main's OWN parser defaults so new CLI
    # flags can never drift out of sync with this script
    ns = main_mod.parser.parse_args([])
    ns.model = model_name
    ns.train_frac = train_frac
    ns.mesh = "off"
    ns.routing = "xla"  # template init only; no effect on shapes
    params = load_params(model_dir, ns, with_writer=False)
    if model_name in ("darknet_d", "darknet_r"):
        # conv shapes are input-size independent; a small template input
        # makes the one-off init cheap on the host CPU
        params.darknet_input = 64
    return params


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--model", required=True,
                    help="cnn | capsule | darknet_d | darknet_r | darkcapsule")
    ap.add_argument("--pth", help="reference .pth.tar to import")
    ap.add_argument("--out", help="output checkpoint dir for --pth "
                                  "(default: <model_dir><train_frac>)")
    ap.add_argument("--ckpt", help="our .ckpt to export")
    ap.add_argument("--to-torch", dest="to_torch",
                    help="output .pth.tar path for --ckpt")
    ap.add_argument("--best", action="store_true",
                    help="also write best.ckpt on import")
    ap.add_argument("--no-optim", action="store_true",
                    help="skip optimizer-moment conversion")
    # default stays int 1 like main.py's: the checkpoint dir is
    # model_dir+str(train_frac) (reference quirk), so 1 -> "...1"
    ap.add_argument("--train_frac", type=float, default=1,
                    help="train_frac suffix of the default --out dir")
    args = ap.parse_args()

    if bool(args.pth) == bool(args.ckpt):
        ap.error("give exactly one of --pth (import) or --ckpt (export)")
    if args.ckpt and not args.to_torch:
        ap.error("--ckpt needs --to-torch <out.pth.tar>")

    # conversion is a host job; don't claim (or wait for) the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cs231_capsule_yolo_traffic_sign_detection_tpu import interop
    from cs231_capsule_yolo_traffic_sign_detection_tpu import config

    params = build_params(args.model, args.train_frac)

    if args.pth:
        out_dir = args.out or (
            config.model_dir[args.model] + str(args.train_frac))
        path = interop.convert_torch_checkpoint(
            args.pth, params, out_dir, best=args.best,
            include_optim=not args.no_optim)
        print(f"[interop] wrote {path}" + (" (+ best.ckpt)" if args.best
                                           else ""))
    else:
        path = interop.export_torch_checkpoint(
            args.ckpt, params, args.to_torch,
            include_optim=not args.no_optim)
        print(f"[interop] wrote {path}")


if __name__ == "__main__":
    main()

"""CLI driver — same public surface as the reference main.py.

    python main.py --model {cnn,capsule,darknet_d,darknet_r,darkcapsule}
                   --mode {train,predict,overfit} [--restore last|best]
                   [--combine cnn|capsule] ...

Reference parity: main.py:22-39 (all 14 flags, including the quirks:
--recon is store_false so reconstruction defaults ON; --summary's
default makes it always true; --recon_coef arrives as str from the CLI
and is coerced here, where the reference would crash — COMPAT.md).
"""

import argparse
import os
import pickle
import sys

import numpy as np

import cs231_capsule_yolo_traffic_sign_detection_tpu as cyt
from cs231_capsule_yolo_traffic_sign_detection_tpu import config
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import (
    loader as data_loader,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.metrics import (
    recog_acc, recog_auc, recog_pr, detect_AP, detect_acc,
    detect_and_recog_acc, detect_and_recog_mAP,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import (
    dark_pred, class_pred, dark_class_pred,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.driver import (
    train_and_evaluate,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.logging_utils import (
    ScalarWriter,
)

parser = argparse.ArgumentParser()
parser.add_argument('--model', default='cnn', help=' | '.join(config.model_names))
parser.add_argument('--mode', default='train', help='train | predict | overfit')
parser.add_argument('--summary', default=True, help='if summarize model', action='store_true')
parser.add_argument('--seed', type=int, default=0, help='random seed')
parser.add_argument('--lr', type=float, default=1e-3, help='learning rate')
parser.add_argument('--dropout', type=float, default=-1, help='dropout rate')
parser.add_argument('--train_frac', type=float, default=1, help='fraction of train data')
parser.add_argument('--restore', default=None, help="last | best")
parser.add_argument('--combine', default=None, help="darknet_r | darknet_d")
parser.add_argument('--recon', help='if use reconstruction loss', action='store_false')
parser.add_argument('--recon_coef', default=5e-4, help='reconstruction coefficient')
parser.add_argument('--eval_every', default=1, type=int, help='evaluate metric every # epochs')
parser.add_argument('--fine_tune', default=-1, type=int, help='number of fixed layer in fine tuning')
parser.add_argument('--no_metric', help='do not compute metric', action='store_true')
parser.add_argument('--model_dir', default=None, help='model dir')
parser.add_argument('--show', default=False, help='save result', action='store_true')
parser.add_argument('--npy', default=False, help='data is npy file', action='store_true')
# TPU-build extensions (default values preserve reference behavior)
parser.add_argument('--routing', default='auto',
                    help='capsule routing impl: auto | xla | pallas '
                         '(auto = pallas on TPU, xla elsewhere)')
parser.add_argument('--nms', default=False, action='store_true',
                    help='enable on-device NMS in predict (extension; reference has none)')
parser.add_argument('--device_crop', default=False, action='store_true',
                    help='--combine only: fuse detect->crop->classify into '
                         'one device program (ops/crop.py; crops sampled '
                         'from the resized network input, static top-16 '
                         'per image — COMPAT #33). Default off = the '
                         'reference host composition')
parser.add_argument('--max_crops', default=16, type=int,
                    help='--device_crop only: static per-image cap on '
                         'detections fed to the classifier (the host '
                         'path decodes full-width; dense scenes beyond '
                         'the cap are reported and need a larger value)')
parser.add_argument('--mesh', default='auto',
                    help="device mesh: auto | off | data=N[,model=M] "
                         "(auto = all local devices data-parallel when >1; "
                         "the reference is single-device, main.py:231)")
parser.add_argument('--dtype', default='float32',
                    help='training compute dtype: float32 | bfloat16 '
                         '(bf16 keeps f32 master params/Adam moments/BN stats)')
parser.add_argument('--scan_epoch', nargs='?', const='on', default='auto',
                    choices=['auto', 'on', 'off'],
                    help='compile each train/eval epoch into one lax.scan '
                         'program (one dispatch per epoch; identical batches '
                         'and math to the per-batch loop).  auto (default) = '
                         'on when running on TPU (measured 4.5x per-epoch '
                         'wall), off elsewhere; bare --scan_epoch = on')
parser.add_argument('--remat', default=False, action='store_true',
                    help='rematerialize detector conv blocks in the backward '
                         'pass (jax.checkpoint): ~half the activation memory '
                         'for ~one extra forward of block FLOPs — unlocks '
                         'batches past the plain-path HBM limit; same math '
                         '(gradients match the plain path to float tolerance, '
                         'tests/test_remat.py)')
parser.add_argument('--async_ckpt', default=False, action='store_true',
                    help='write checkpoints on a background thread '
                         '(D2H + serialize + ~240MB write per epoch is '
                         '~3x the 448px detectors\' per-epoch compute; '
                         'same last/best semantics, flushed at exit)')
parser.add_argument('--ckpt_every', default=1, type=int,
                    help='save the last checkpoint every N epochs '
                         '(best-on-improvement always saved; default 1 '
                         '= reference behavior.  Over a slow D2H link '
                         'the per-epoch checkpoint dominates detector '
                         'epochs — see BASELINE.md epoch anatomy)')
parser.add_argument('--coordinator', default=None,
                    help='multi-host: coordinator address host:port '
                         '(jax.distributed). Launch one main.py per host '
                         'with the same --coordinator/--num_processes and '
                         'a distinct --process_id; --mesh then spans all '
                         "hosts' devices and process 0 writes artifacts")
parser.add_argument('--num_processes', default=None, type=int,
                    help='multi-host: total process count (with --coordinator)')
parser.add_argument('--process_id', default=None, type=int,
                    help='multi-host: this process\'s id (with --coordinator)')
parser.add_argument('--stream', default=False, action='store_true',
                    help='host-streaming data path for larger-than-HBM '
                         'datasets: batches assembled ahead of the device by '
                         'the native threaded prefetcher (memmap-friendly; '
                         'identical batches to the default path)')


def get_data_and_model_dir(model_name):
    """Reference parity: main.py:220-224."""
    if model_name not in config.model_names:
        print("Did not recognize model, choose from: ", *config.model_names)
        sys.exit()
    return config.data_dir[model_name], config.model_dir[model_name]


def load_params(model_dir, args, with_writer=True):
    """Merge params.json with CLI overrides.  Reference parity:
    main.py:227-241."""
    json_path = os.path.join(model_dir, 'params.json')
    params = cyt.Params(json_path)

    params.seed = args.seed
    if args.dropout >= 0:
        params.dropout = args.dropout
    params.model = args.model
    params.recon = args.recon
    params.recon_coef = float(args.recon_coef)
    params.eval_every = args.eval_every
    params.train_frac = args.train_frac
    params.npy = args.npy
    params.routing_impl = args.routing
    params.mesh = args.mesh
    params.compute_dtype = args.dtype
    params.scan_epoch = args.scan_epoch
    params.stream = args.stream
    params.remat = args.remat
    params.async_ckpt = args.async_ckpt
    params.ckpt_every = args.ckpt_every
    # reference quirk: --summary's default makes it always true
    # (main.py:25); wired through regardless so the flag is honored
    params.summary = bool(args.summary)
    # reference quirk preserved: the optimizer LR comes from --lr only;
    # the json 'lr'/'learning_rate' keys are dead (main.py:280)
    params.lr_runtime = args.lr
    params.do_fine_tune = args.fine_tune > 0
    if with_writer:
        params.writer = ScalarWriter()
    return params


def _enable_compile_cache():
    """Persistent XLA compilation cache (set CYT_COMPILE_CACHE=0 to
    disable, or to a path to relocate).  The 448px detector programs
    take 1-3 min to compile through the tunnel; cached reruns skip
    that.  The bench/profile scripts already use the same cache dir."""
    cache_dir = os.environ.get("CYT_COMPILE_CACHE", "/tmp/jax_cache")
    if cache_dir in ("", "0", "off"):
        return
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"[cache] persistent compilation cache unavailable: {e}")


def main():
    args = parser.parse_args()
    if args.coordinator is not None or args.num_processes is not None:
        # Multi-host entry (new infrastructure; the reference is
        # single-process, main.py:231).  Must run before the first jax
        # array op so the backend initializes with the full device set.
        from cs231_capsule_yolo_traffic_sign_detection_tpu import (
            parallel as par,
        )
        par.initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        import jax
        print("[distributed] process {}/{} sees {} devices "
              "({} local)".format(
                  jax.process_index(), jax.process_count(),
                  len(jax.devices()), len(jax.local_devices())))
    _enable_compile_cache()
    data_dir, model_dir = get_data_and_model_dir(args.model)
    if args.model_dir is not None:
        model_dir = args.model_dir

    # artifact writers live on process 0 only (multi-host; no-op change
    # single-process where is_primary() is always True)
    from cs231_capsule_yolo_traffic_sign_detection_tpu import parallel as par
    with_writer = args.mode != 'predict' and par.is_primary()
    params = load_params(model_dir, args, with_writer=with_writer)

    np.random.seed(args.seed)

    if args.mode == 'train':
        train_and_evaluate(
            params, data_dir, model_dir,
            restore_file=args.restore,
            writer=params.get('writer'),
            no_metric=args.no_metric,
            seed=args.seed,
        )

    if args.mode == 'overfit':
        try:
            data_loader.make_small_data(data_dir, 3, npy=args.npy)
        except (FileNotFoundError, OSError):
            print('[overfit] dataset absent; synthetic small set will be used')
        train_and_evaluate(
            params, data_dir, model_dir, is_small=True,
            restore_file=args.restore,
            writer=params.get('writer'),
            no_metric=args.no_metric,
            seed=args.seed,
        )

    if args.mode == 'predict':
        if args.restore is None:
            print('Must give restore file last/bast')
            sys.exit()

        class_model = args.model in ('cnn', 'capsule')
        detect_model = (args.model in ('darknet_d', 'darknet_r')
                        and args.combine is None)
        combine_model = (args.model in ('darknet_d', 'darknet_r')
                         and args.combine in ('cnn', 'capsule'))

        try:
            with open(data_dir + '/test.p', 'rb') as f:
                x, y = pickle.load(f)
        except (FileNotFoundError, OSError):
            print('[predict] dataset absent; using synthetic test data')
            _, _, x, y = data_loader.synthetic_dataset(
                args.model, params, n_train=4, n_eval=16)

        if not class_model:
            import cv2

            names_path = data_dir + '/test_names.npy'
            if os.path.exists(names_path):
                org_image_names = np.load(names_path)
                x = [cv2.imread(os.path.join(data_dir + '/raw_GTSDB', name))
                     for name in org_image_names]
            else:
                # reconstruct uint8 full-frame images from the stored
                # centered tensors (synthetic / raw-less runs)
                x = [np.clip(im * 128.0 + 128, 0, 255).astype(np.uint8)
                     for im in np.asarray(x)]

        # multi-process predict: every process participates in the
        # sharded forwards/gathers (collectives), but artifacts —
        # metric_output.txt, PR/ROC/AP plots, output/*.jpg — are
        # written by process 0 only, like the train path's is_primary
        # gating (train/driver.py).  Single-process: always True.
        primary = par.is_primary()

        metric_out = {}
        if class_model:
            y_hat, _ = class_pred(x, model_dir, params, args.restore)
            metric_out['recog_pr'] = recog_pr(
                y, y_hat, params, save=primary, save_dir=model_dir)
            metric_out['recog_acc'] = recog_acc(y, y_hat, params)
            metric_out['recog_auc'] = recog_auc(
                y, y_hat, params, save=primary, save_dir=model_dir)

        output = None
        if detect_model:
            save_dir = model_dir + '/detect_ap'
            os.makedirs(save_dir, exist_ok=True)
            y_hat, output = dark_pred(
                x, model_dir, params, args.restore, y=y, use_nms=args.nms)
            metric_out['detect_AP'] = detect_AP(
                y, y_hat, params, save=primary, save_dir=save_dir)
            metric_out['detect_acc'] = detect_acc(y, y_hat, params)

        if combine_model:
            class_model_dir = get_data_and_model_dir(args.combine)[1]
            class_args = argparse.Namespace(**vars(args))
            class_args.model = args.combine
            class_params = load_params(class_model_dir, class_args,
                                       with_writer=False)
            y_hat, output = dark_class_pred(
                x, model_dir, params, class_model_dir, class_params,
                args.restore, device_crop=args.device_crop,
                max_crops=args.max_crops)

            save_dir = model_dir + '/combine-{}_mAP'.format(args.combine)
            os.makedirs(save_dir, exist_ok=True)
            metric_out['detect_and_recog_mAP'] = detect_and_recog_mAP(
                y, y_hat, params, save=primary, save_dir=save_dir)
            metric_out['detect_and_recog_acc'] = detect_and_recog_acc(
                y, y_hat, params)

        save_path = model_dir + "/metric_output.txt"
        if combine_model:
            save_path = model_dir + "/combine-{}_metric_output.txt".format(
                args.combine)
        if primary:
            with open(save_path, "w") as text_file:
                for k, v in metric_out.items():
                    text_file.write("{}:{}, ".format(k, v))
                    print("{}:{}, ".format(k, v))

        if (detect_model or combine_model) and output is not None \
                and primary:
            import cv2

            save_dir = os.path.join(model_dir, 'output')
            os.makedirs(save_dir, exist_ok=True)
            for i, image in enumerate(output):
                cv2.imwrite(os.path.join(save_dir, str(i) + '.jpg'), image)


if __name__ == '__main__':
    main()

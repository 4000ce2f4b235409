"""Offline dataset build CLI (pickle artifacts).

Reference parity: build_data.py:290-296 — builds GTSDB by default
(GTSRB via --gtsrb, which the reference has commented out at
build_data.py:293).

    python build_data.py [--aug N] [--gtsrb] [--npy]
"""

import argparse

import numpy as np

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import build

parser = argparse.ArgumentParser()
parser.add_argument('--aug', default=0, help=' need data augmentation?')
parser.add_argument('--gtsrb', action='store_true',
                    help='also build the GTSRB classification set')
parser.add_argument('--npy', action='store_true',
                    help='additionally save .npy artifacts (+ name indices)')

if __name__ == "__main__":
    args = parser.parse_args()
    np.random.seed(0)
    if args.gtsrb:
        build.gtsrb(save_npy=args.npy)
    params = Params('./experiments/darknet_r/params.json')
    build.gtsdb(params, aug_size=int(args.aug), save_npy=args.npy)

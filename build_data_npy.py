"""Offline dataset build CLI, .npy variant.

Reference parity: build_data_npy.py — identical to build_data.py but
saving train/eval/test_{X,Y}.npy plus *_names.npy image-name indices
(consumed by predict mode, reference main.py:305-306).  Implemented as
the same builder with save_npy=True.
"""

import argparse

import numpy as np

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params
from cs231_capsule_yolo_traffic_sign_detection_tpu.data import build

parser = argparse.ArgumentParser()
parser.add_argument('--aug', default=0, help=' need data augmentation?')
parser.add_argument('--gtsrb', action='store_true')

if __name__ == "__main__":
    args = parser.parse_args()
    np.random.seed(0)
    if args.gtsrb:
        build.gtsrb(save_npy=True)
    params = Params('./experiments/darknet_r/params.json')
    build.gtsdb(params, aug_size=int(args.aug), save_npy=True)

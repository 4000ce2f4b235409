#!/bin/bash
# Full two-stage pipeline smoke on real hardware:
# detector train -> classifier train -> predict -> combined predict.
set -e
cd "$(dirname "$0")/.."
python main.py --model capsule --mode train --no_metric
python main.py --model darknet_r --mode train --no_metric --model_dir experiments/smoke_darknet_r
python main.py --model darknet_r --mode predict --restore last --model_dir experiments/smoke_darknet_r
python main.py --model darknet_r --mode predict --restore last --combine capsule --model_dir experiments/smoke_darknet_r
echo SMOKE_OK

#!/bin/bash
# Serial TPU benchmark sequence (round-2 re-capture, VERDICT item 1).
# Run in background WITHOUT timeout; TPU jobs must never be killed
# mid-flight and never run concurrently (.claude/skills/verify/SKILL.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_run.log}
exec > "$LOG" 2>&1

echo "=== [0] platform smoke $(date)"
python - <<'EOF'
import jax, jax.numpy as jnp
print("default_backend:", jax.default_backend())
d = jax.devices()[0]
print("device:", d, "| platform:", d.platform, "| kind:", d.device_kind)
print("probe:", float(jnp.sum(jnp.ones((8, 8)))))
from cs231_capsule_yolo_traffic_sign_detection_tpu.models.registry import (
    resolve_routing_impl)
print("routing auto ->", resolve_routing_impl("auto"))
EOF

echo "=== [1] routing bench capsule shape $(date)"
python scripts/bench_routing.py 64 capsule

echo "=== [2] routing bench darkcapsule shape $(date)"
python scripts/bench_routing.py 32 darkcapsule

echo "=== [3] bench.py bf16 (headline) $(date)"
BENCH_BOTH= BENCH_DTYPE=bfloat16 python bench.py

echo "=== [4] bench.py f32 $(date)"
BENCH_DTYPE=float32 python bench.py

echo "=== [5] train throughput all configs f32 $(date)"
python scripts/bench_train.py all 32 float32

echo "=== [6] train throughput all configs bf16 $(date)"
python scripts/bench_train.py all 32 bfloat16

echo "=== [6b] bench.py int8 (calibrated quantized serving) $(date)"
BENCH_DTYPE=int8 python bench.py

echo "=== [6c] on-device NMS cost $(date)"
python scripts/bench_nms.py

echo "=== [7] MFU analytic flops (CPU backend) $(date)"
python scripts/mfu.py

echo "=== [8] CLI drive: cnn train (verify skill) $(date)"
python main.py --model cnn --mode train

echo "=== [9] CLI drive: cnn predict $(date)"
python main.py --model cnn --mode predict --restore last

echo "=== [10] CLI drive: darknet_r predict (decode path) $(date)"
python main.py --model darknet_r --mode train
python main.py --model darknet_r --mode predict --restore last

echo "=== [11] multichip dryrun (CPU 8-dev mesh) $(date)"
python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

echo "=== DONE $(date)"

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

echo "=== [7] MFU analytic flops (CPU backend) $(date)"
python scripts/mfu.py

echo "=== DONE $(date)"

"""Checkpoint inspector: print epoch, plateau state, and param shapes.

Usage: python scripts/inspect_ckpt.py experiments/cnn1/last.ckpt
"""

import sys

import numpy as np
from flax import serialization


def main(path):
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    print("epoch:", raw.get("epoch"))
    if raw.get("plateau"):
        p = raw["plateau"]
        print(f"plateau: lr={p.get('lr')} best={p.get('best'):.6f} "
              f"bad_epochs={p.get('num_bad_epochs')}")
    total = 0
    state = raw.get("state", {})
    for section in ("params", "batch_stats"):
        tree = state.get(section) or {}
        stack = [((section,), tree)]
        while stack:
            path_keys, node = stack.pop()
            if isinstance(node, dict):
                for k, v in node.items():
                    stack.append((path_keys + (k,), v))
            else:
                arr = np.asarray(node)
                n = int(np.prod(arr.shape)) if arr.shape else 1
                if section == "params":
                    total += n
                print(f"{'/'.join(path_keys):<60} {str(arr.shape):<20} "
                      f"{arr.dtype}")
    print(f"total params: {total:,}")
    print("optimizer state:", "present" if state.get("opt_state") else "absent")


if __name__ == "__main__":
    main(sys.argv[1])

"""Model summary: parameter/shape tabulator over the JAX pytree.

Replaces the reference's torchsummary startup printout
(reference main.py:270-271), which doubles as a shape smoke test —
initializing the model against config.input_shape does the same here.
"""

import numpy as np
import jax


def summarize(variables, title="Model"):
    rows = []
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", {}))[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append((name, tuple(leaf.shape), n))

    bs_total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            variables.get("batch_stats", {}))[0]:
        bs_total += int(np.prod(leaf.shape)) if leaf.shape else 1

    width = max([len(r[0]) for r in rows] + [10])
    lines = [f"{'-' * (width + 30)}",
             f"{title} parameter summary",
             f"{'-' * (width + 30)}"]
    for name, shape, n in rows:
        lines.append(f"{name:<{width}}  {str(shape):<18} {n:>10,}")
    lines.append(f"{'-' * (width + 30)}")
    lines.append(f"Trainable params: {total:,}")
    if bs_total:
        lines.append(f"BatchNorm running stats: {bs_total:,}")
    lines.append(f"{'-' * (width + 30)}")
    text = "\n".join(lines)
    print(text)
    return total

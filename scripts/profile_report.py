"""Join the captured device trace with HLO fusion definitions.

Builds the same serving program as scripts/profile_infer.py (compile is
served from the persistent cache), dumps its optimized HLO, and joins
per-fusion device times from the newest /tmp/cyt_trace capture against
each fusion's root instruction — a readable "where the time goes" table
for BASELINE.md.
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))  # _serving_prof


def newest_trace():
    # the trace filename is <hostname>.trace.json.gz — don't assume
    # this box's hostname
    files = sorted(glob.glob(
        "/tmp/cyt_trace/plugins/profile/*/*.trace.json.gz"))
    return files[-1] if files else None


def device_op_times(trace_path):
    with gzip.open(trace_path) as f:
        t = json.load(f)
    ev = t.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid")) == "/device:TPU:0"):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return dur, cnt


def fusion_roots(hlo_text):
    """fusion name -> (kind, root op line) from optimized HLO."""
    roots = {}
    # computation bodies: '%fused_computation.N (...) -> ... {' ... 'ROOT ...'
    comp = None
    comp_root = {}
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?(\S+) \([^)]*\) -> .* {", line)
        if m:
            comp = m.group(1)
        if comp and "ROOT" in line:
            comp_root[comp] = line.strip()[:140]
    # instruction lines: '%fusion.N = ... fusion(...), kind=K, calls=%fused_computation.M'
    for m in re.finditer(
            r"%?([\w.\-]+) = \S+ fusion\(.*?kind=(\w+), calls=%?([\w.\-]+)",
            hlo_text):
        name, kind, callee = m.groups()
        roots[name] = (kind, comp_root.get(callee, "?"))
    # non-fusion named ops that show up in traces directly
    for m in re.finditer(r"%?([\w.\-]+) = \S+ (convolution|reduce-window|"
                         r"sort|reduce|copy|transpose)\(", hlo_text):
        roots.setdefault(m.group(1), ("op", m.group(2)))
    return roots


def main():
    import jax
    import jax.numpy as jnp

    import _serving_prof

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    batch, size = 128, 448
    dtype = os.environ.get("PROF_DTYPE", "bfloat16")
    print(f"[report] serving dtype: {dtype}", file=sys.stderr)
    step, variables, x_dtype = _serving_prof.build(dtype, batch, size)

    lowered = jax.jit(step).lower(variables, jnp.zeros(
        (batch, size, size, 3), x_dtype))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    roots = fusion_roots(hlo)
    print(f"[report] HLO: {len(hlo.splitlines())} lines, "
          f"{len(roots)} named ops", file=sys.stderr)

    tp = newest_trace()
    if tp is None:
        print("no trace found; run scripts/profile_infer.py first")
        return
    dur, cnt = device_op_times(tp)
    # drop the whole-module jit_* spans and the bare per-step digit
    # markers: they overlap the per-op fusions, so counting them in the
    # total doubles (triples) it and deflates every percentage
    # (same filter as profile_train.py)
    for name in [n for n in dur if n.startswith("jit_") or n.isdigit()]:
        del dur[name], cnt[name]
    steps = max(cnt.values()) if cnt else 1
    total = sum(dur.values())
    print(f"trace: {tp}")
    print(f"device total: {total/1e3/steps:.2f} ms/step "
          f"(x{steps} steps)\n")
    print(f"{'ms/step':>8} {'%':>5}  op")
    shown = 0.0
    for name, d in dur.most_common(30):
        kind, root = roots.get(name, ("?", "?"))
        ms = d / 1e3 / steps
        pct = 100.0 * d / total if total else 0
        shown += d
        print(f"{ms:8.3f} {pct:5.1f}  {name} [{kind}] {root[:110]}")
    print(f"\n(top ops cover {100.0*shown/total:.0f}% of device time)")


if __name__ == "__main__":
    main()

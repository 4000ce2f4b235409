"""Shared build-on-first-use loader for the C++ kernels in native/.

Both native extensions (the metrics confusion sweep and the streaming
prefetcher) compile their single .cpp with g++ the first time they are
used and dlopen the result; a missing toolchain or failed build returns
None and the caller falls back to its numpy path.  One implementation
here so build flags, staleness checks, and failure behavior cannot
drift between the two call sites.
"""

import ctypes
import os
import subprocess


def native_dir():
    from . import config

    return os.path.join(config.repo_root(), "native")


def load_native(lib_name, src_name, extra_flags=()):
    """Build (if absent or older than its source) and load
    native/<lib_name> from native/<src_name>; None on any failure."""
    d = native_dir()
    so = os.path.join(d, lib_name)
    src = os.path.join(d, src_name)
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                 "-std=c++17", *extra_flags, "-o", so, src],
                check=True, capture_output=True)
        return ctypes.CDLL(so)
    except Exception:
        return None

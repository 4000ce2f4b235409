"""Host-streaming batch pipeline (native prefetch + numpy fallback).

The train driver keeps datasets HBM-resident by default, but a dataset
larger than device memory has to stream from host RAM or disk.  This
module provides that path: batches are assembled ahead of the consumer
by the C++ ring-buffer prefetcher (native/prefetch.cpp, worker threads
that gather permuted rows while Python blocks on device fetches), with
a byte-identical pure-numpy fallback when no toolchain is available.

Semantics are pinned to the driver's host path (reference parity:
shuffle + np.array_split, reference main.py:45-48): given the same
permutation, `iter_batches` yields exactly the arrays
``np.array_split(x[perm], n_batch)`` / ``np.array_split(y[perm],
n_batch)`` with X rows as float32.

Extension beyond the reference: X may be stored uint8 (raw pixels); the
prefetcher fuses the loader's `center_rgb` normalization
((v - 128) / 128, reference utils.py:122-123) into the gather, so
raw-pixel stores stream at 1/4 the float32 footprint.  Memmapped .npy
artifacts (np.load(mmap_mode="r")) work as inputs unchanged — pages are
faulted in by the worker threads, off the consumer thread.
"""

import ctypes

import numpy as np

from ..native_util import load_native

_LIB = None
_TRIED = False


def get_lib():
    """Load (building if needed) libprefetch.so, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    lib = load_native("libprefetch.so", "prefetch.cpp",
                      extra_flags=("-pthread",))
    if lib is not None:
        i64 = ctypes.c_int64
        lp = ctypes.POINTER(i64)
        lib.pf_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            i64, i64, lp, lp, i64, ctypes.c_int, ctypes.c_int,
        ]
        lib.pf_create.restype = ctypes.c_void_p
        lib.pf_acquire.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.pf_acquire.restype = i64
        lib.pf_release.argtypes = [ctypes.c_void_p]
        lib.pf_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def batch_offsets(n, n_batch):
    """np.array_split boundaries: n_batch parts, larger splits first."""
    sizes = [len(s) for s in np.array_split(np.arange(n), n_batch)]
    return np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)


def _normalize_x(rows):
    if rows.dtype == np.uint8:
        return (rows.astype(np.float32) - 128.0) / 128.0
    return rows.astype(np.float32)


def _iter_numpy(x, y, perm, offsets):
    for lo, hi in zip(offsets[:-1], offsets[1:]):
        idx = perm[lo:hi]
        yield _normalize_x(x[idx]), y[idx].copy()


def iter_batches(x, y, perm, n_batch, ring=3, n_threads=2, copy=True):
    """Yield (x_f32, y) batches of x[perm]/y[perm] split n_batch ways.

    Uses the native threaded prefetcher when available; otherwise a
    byte-identical numpy generator.  With ``copy=False`` the native
    path yields zero-copy views into the ring slot, valid only until
    the next iteration — callers must consume (e.g. device_put) each
    batch before advancing.
    """
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    if perm.shape[0] == 0:
        return
    offsets = batch_offsets(perm.shape[0], n_batch)
    yield from _iter_offsets(x, y, perm, offsets, ring, n_threads, copy)


def iter_batches_process_local(x, y, perm, n_batch, process_index=None,
                               process_count=None, ring=3, n_threads=2,
                               copy=True, shard_rows=None, row_slices=None):
    """Multi-host streaming: this process's slice of each global batch.

    Composes the prefetcher with the pod data layout (SURVEY.md §7.9):
    the global batch b is perm[off[b]:off[b+1]]; each process gathers
    only the within-batch rows its devices address, and the sharded
    global array is assembled collective-free with
    parallel.mesh.global_batch_from_process_local.
    Yields (x_local_f32, y_local, n_global_rows).

    ``row_slices`` maps a global batch size to this process's list of
    (lo, hi) within-batch row slices (parallel.mesh.process_row_slices,
    derived from the sharding's addressable-device index map — correct
    for replication layouts and uneven process counts).  Without it the
    rows default to an equal contiguous per-process split
    (parallel.mesh.process_batch_slice).

    ``shard_rows`` (typically the mesh's 'data' axis size): a concrete
    jax.Array cannot take an uneven leading-axis sharding, so a batch
    whose global size is not a multiple of ``shard_rows`` must be
    REPLICATED by the consumer (the mesh driver's ragged-tail rule,
    parallel.mesh.place_batch) — such batches are yielded in full on
    every process (local rows == n_global_rows) instead of sliced.
    """
    from ..parallel.mesh import process_batch_slice

    perm = np.ascontiguousarray(perm, dtype=np.int64)
    if perm.shape[0] == 0:
        return
    offsets = batch_offsets(perm.shape[0], n_batch)
    sub, sub_off, globals_ = [], [0], []
    for lo, hi in zip(offsets[:-1], offsets[1:]):
        n_glob = int(hi - lo)
        if shard_rows is not None and n_glob % int(shard_rows) != 0:
            parts = [(0, n_glob)]  # ragged tail: full rows everywhere
        elif row_slices is not None:
            parts = [(int(s), int(e)) for s, e in row_slices(n_glob)]
        else:
            parts = [process_batch_slice(n_glob, process_index,
                                         process_count)]
        n_loc = 0
        for s, e in parts:
            sub.append(perm[lo + s: lo + e])
            n_loc += e - s
        sub_off.append(sub_off[-1] + n_loc)
        globals_.append(n_glob)
    sub_perm = (np.concatenate(sub) if sub
                else np.zeros(0, np.int64)).astype(np.int64)
    sub_off = np.asarray(sub_off, np.int64)
    for (xb, yb), n_glob in zip(
            _iter_offsets(x, y, sub_perm, sub_off, ring, n_threads, copy),
            globals_):
        yield xb, yb, n_glob


def _iter_offsets(x, y, perm, offsets, ring, n_threads, copy):
    lib = get_lib()
    x = np.ascontiguousarray(x) if not _is_contiguous(x) else x
    y = np.ascontiguousarray(y) if not _is_contiguous(y) else y
    x_native = x.dtype in (np.float32, np.uint8)
    if lib is None or not x_native:
        yield from _iter_numpy(x, y, perm, offsets)
        return

    x_row_elems = int(np.prod(x.shape[1:], dtype=np.int64))
    y_row_bytes = int(np.prod(y.shape[1:], dtype=np.int64)) * y.dtype.itemsize
    h = lib.pf_create(
        ctypes.c_void_p(_addr(x)), ctypes.c_void_p(_addr(y)),
        int(x.dtype == np.uint8), x_row_elems, y_row_bytes,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(len(offsets) - 1), int(ring), int(n_threads))
    if not h:  # allocation failure -> fallback
        yield from _iter_numpy(x, y, perm, offsets)
        return
    try:
        xp = ctypes.POINTER(ctypes.c_float)()
        yp = ctypes.c_void_p()
        while True:
            rows = lib.pf_acquire(h, ctypes.byref(xp), ctypes.byref(yp))
            if rows < 0:
                break
            if rows == 0:  # np.array_split emits empties when n_batch > n
                yield (np.zeros((0,) + x.shape[1:], np.float32),
                       np.zeros((0,) + y.shape[1:], y.dtype))
                lib.pf_release(h)
                continue
            xb = np.ctypeslib.as_array(
                xp, shape=(int(rows),) + x.shape[1:])
            yb = np.frombuffer(
                ctypes.cast(
                    yp, ctypes.POINTER(
                        ctypes.c_uint8 * (int(rows) * y_row_bytes))
                ).contents,
                dtype=y.dtype).reshape((int(rows),) + y.shape[1:])
            if copy:
                # copies taken: free the ring slot BEFORE yielding so
                # the workers refill it while the consumer runs its
                # step — releasing after the yield would idle one of
                # the `ring` slots for the whole consumer step
                xb, yb = xb.copy(), yb.copy()
                lib.pf_release(h)
                yield xb, yb
            else:
                # zero-copy views: the slot stays locked until the
                # consumer finishes with them
                yield xb, yb
                lib.pf_release(h)
    finally:
        lib.pf_destroy(h)


def _is_contiguous(a):
    return isinstance(a, np.ndarray) and a.flags["C_CONTIGUOUS"]


def _addr(a):
    # works for plain ndarrays and np.memmap alike
    return a.ctypes.data


def open_memmap_dataset(data_dir, split="train"):
    """Memmap a split's npy artifacts (X stays on disk until faulted).

    Artifact names follow the builder's npy variant
    (build_data_npy.py): ``<split>_X.npy`` / ``<split>_Y.npy``.
    """
    from .. import config

    stem = {"train": config.tr_d, "eval": config.ev_d,
            "test": config.te_d}[split]
    stem = stem[:-2] if stem.endswith(".p") else stem
    x = np.load(data_dir + stem + "_X.npy", mmap_mode="r")
    y = np.load(data_dir + stem + "_Y.npy", mmap_mode="r")
    return x, y

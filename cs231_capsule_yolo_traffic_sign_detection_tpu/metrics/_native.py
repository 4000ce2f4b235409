"""ctypes bindings for the native confusion-sweep kernel (native/).

Auto-builds native/libconfusion.so with g++ on first use (cached);
falls back silently to the numpy path when a toolchain is unavailable.
"""

import ctypes

import numpy as np

from ..native_util import load_native

_LIB = None
_TRIED = False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    lib = load_native("libconfusion.so", "confusion.cpp")
    if lib is not None:
        dp = ctypes.POINTER(ctypes.c_double)
        lp = ctypes.POINTER(ctypes.c_int64)
        lib.confusion_sweep_image.argtypes = [
            dp, dp, ctypes.c_int64,
            dp, dp, ctypes.c_int64,
            dp, ctypes.c_int64,
            dp, ctypes.c_int64,
            lp, lp, lp,
        ]
        lib.confusion_sweep_image.restype = None
    _LIB = lib
    return _LIB


def _cptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def confusion_sweep_native(gt, pred, iou_ths, conf_ths, cls_filter=None):
    """Native equivalent of metrics.detection.confusion_sweep.

    Returns (TP, FP, FN) int64 arrays of shape (n_iou, n_conf), or None
    if the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None

    iou_ths = np.ascontiguousarray(iou_ths, dtype=np.float64)
    conf_ths = np.ascontiguousarray(conf_ths, dtype=np.float64)
    nI, nC = iou_ths.size, conf_ths.size
    TP = np.zeros(nI * nC, np.int64)
    FP = np.zeros(nI * nC, np.int64)
    FN = np.zeros(nI * nC, np.int64)
    tp_p = TP.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    fp_p = FP.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    fn_p = FN.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    for gt_i, pr_i in zip(gt, pred):
        if cls_filter is None:
            g_xy, g_conf = gt_i["xy"], gt_i["conf"]
            p_xy, p_conf = pr_i["xy"], pr_i["conf"]
        else:
            gk = gt_i["cls"] == cls_filter
            pk = pr_i["cls"] == cls_filter
            g_xy, g_conf = gt_i["xy"][gk], gt_i["conf"][gk]
            p_xy, p_conf = pr_i["xy"][pk], pr_i["conf"][pk]
        g_xy = np.ascontiguousarray(g_xy, np.float64)
        g_conf = np.ascontiguousarray(g_conf, np.float64)
        p_xy = np.ascontiguousarray(p_xy, np.float64)
        p_conf = np.ascontiguousarray(p_conf, np.float64)
        lib.confusion_sweep_image(
            _cptr(g_xy), _cptr(g_conf), g_conf.size,
            _cptr(p_xy), _cptr(p_conf), p_conf.size,
            _cptr(iou_ths), nI, _cptr(conf_ths), nC,
            tp_p, fp_p, fn_p)

    return (TP.reshape(nI, nC), FP.reshape(nI, nC), FN.reshape(nI, nC))

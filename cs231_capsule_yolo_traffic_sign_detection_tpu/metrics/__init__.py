from .classification import recog_acc, recog_auc, recog_pr  # noqa: F401
from .detection import (  # noqa: F401
    calc_iou_individual,
    single_img_confusion,
    precision_and_recall,
    average_precision,
    detect_AP,
    detect_acc,
    detect_and_recog_acc,
    detect_and_recog_mAP,
    darkcapsule_acc,
    darkcapsule_cell_f1,
)

METRIC_REGISTRY = {
    "cnn": recog_acc,
    "capsule": recog_acc,
    "darknet_d": detect_acc,
    "darknet_r": detect_and_recog_acc,
    # Effective reference binding is detect_and_recog_acc (duplicate
    # registry key, reference main.py:263-264), but that combination
    # crashes on darkcapsule's (B,g,g,5) output — see COMPAT.md; we
    # bind a well-defined cell-presence F1 instead.
    "darkcapsule": darkcapsule_cell_f1,
}

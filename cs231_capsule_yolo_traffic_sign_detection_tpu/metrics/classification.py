"""Classification metrics: top-1 accuracy, ROC-AUC, PR average precision.

Reference parity: metrics.py:9-96.  AUC/PR run host-side on sklearn
(eval-only, not perf-critical); the PNG artifacts keep the reference's
filenames (r_auc.png / r_pr.png).
"""

import numpy as np

from .. import config


def recog_acc(y, y_hat, params=None):
    """Top-1 accuracy.  Reference parity: metrics.py:9-11."""
    y = np.asarray(y)
    return np.sum(y == np.argmax(y_hat, axis=1)) / y.shape[0]


def _save_dir(params, save_dir):
    if save_dir is not None:
        return save_dir
    return config.model_dir[params.model]


def recog_auc(y, y_hat, params, show=False, save=False, save_dir=None):
    """Per-class + micro-averaged ROC-AUC.

    Reference parity: metrics.py:13-51; returns the micro average.
    """
    from sklearn.metrics import auc, roc_curve

    n_classes = params.n_classes
    y1 = np.eye(n_classes)[np.asarray(y)]

    fpr, tpr, roc_auc = {}, {}, {}
    for i in range(n_classes):
        fpr[i], tpr[i], _ = roc_curve(y1[:, i], y_hat[:, i])
        roc_auc[i] = auc(fpr[i], tpr[i])

    fpr["micro"], tpr["micro"], _ = roc_curve(y1.ravel(), np.asarray(y_hat).ravel())
    roc_auc["micro"] = auc(fpr["micro"], tpr["micro"])

    if show or save:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(1)
        plt.step(fpr["micro"], tpr["micro"], color="darkorange", alpha=0.2,
                 where="post")
        plt.fill_between(fpr["micro"], tpr["micro"], step="post", alpha=0.2,
                         color="darkorange")
        plt.plot([0, 1], [0, 1], color="navy", lw=2, linestyle="--")
        plt.xlim([0.0, 1.0])
        plt.ylim([0.0, 1.05])
        plt.xlabel("False Positive Rate")
        plt.ylabel("True Positive Rate")
        plt.title("Average auc score, micro-averaged over"
                  "all classes: auc={0:0.2f}".format(roc_auc["micro"]))
        if save:
            plt.savefig(_save_dir(params, save_dir) + "/r_auc.png")
        if show:
            plt.show()

    return roc_auc["micro"]


def recog_pr(y, y_hat, params, show=False, save=False, save_dir=None):
    """Per-class + micro-averaged precision-recall AP.

    Reference parity: metrics.py:54-96; returns the micro AP.
    """
    from sklearn.metrics import average_precision_score, precision_recall_curve

    n_classes = params.n_classes
    y1 = np.eye(n_classes)[np.asarray(y)]
    y_hat = np.asarray(y_hat)

    precision, recall, average_prec = {}, {}, {}
    for i in range(n_classes):
        precision[i], recall[i], _ = precision_recall_curve(y1[:, i], y_hat[:, i])
        average_prec[i] = average_precision_score(y1[:, i], y_hat[:, i])

    precision["micro"], recall["micro"], _ = precision_recall_curve(
        y1.ravel(), y_hat.ravel())
    average_prec["micro"] = average_precision_score(y1, y_hat, average="micro")

    if show or save:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(2)
        plt.step(recall["micro"], precision["micro"], color="b", alpha=0.2,
                 where="post")
        plt.fill_between(recall["micro"], precision["micro"], step="post",
                         alpha=0.2, color="b")
        plt.xlabel("Recall")
        plt.ylabel("Precision")
        plt.ylim([0.0, 1.05])
        plt.xlim([0.0, 1.0])
        plt.title("Average precision score, micro-averaged over"
                  "all classes: AP={0:0.2f}".format(average_prec["micro"]))
        if save:
            plt.savefig(_save_dir(params, save_dir) + "/r_pr.png")
        if show:
            plt.show()

    return average_prec["micro"]

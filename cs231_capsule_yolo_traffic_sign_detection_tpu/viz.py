"""Host-side visualization: draw predicted boxes + class names (cv2).

Reference parity: plot.py:5-63 (`draw_boxes`, `draw_boxes_vec`) —
green rectangles for predictions, red for ground truth, class-name
text from data/GTSDB/class_names.txt, and per-box crops returned for
the two-stage pipeline.
"""

import os

import numpy as np

from . import config

_CLASS_NAMES_CACHE = {}


def _class_names():
    path = config.GTSDB + "/class_names.txt"
    if path not in _CLASS_NAMES_CACHE:
        if os.path.exists(path):
            # one name per line (reference plot.py:19 used
            # np.loadtxt(delimiter='\n'), which numpy 2.x rejects)
            with open(path) as f:
                names = np.array(
                    [ln.strip() for ln in f if ln.strip()])
        else:
            names = np.array([str(i) for i in range(43)])
        _CLASS_NAMES_CACHE[path] = names
    return _CLASS_NAMES_CACHE[path]


def draw_boxes(image, xy, classes=None, color=(0, 255, 0)):
    """Draw boxes on one image; returns (annotated copy, crops list).

    Reference parity: plot.py:5-34.
    """
    import cv2

    class_names = _class_names()
    new_img = image.copy()
    # clip crop coordinates to the frame: the decoder doesn't clip
    # boxes, and a box poking past the left/top edge (negative x1/y1)
    # would wrap around via negative indexing and yield an empty crop
    # where the sign's visible part exists (deviation from the
    # reference's unclipped slicing — COMPAT.md, undefined-behavior
    # fix; the drawn rectangles are unaffected, cv2 clips itself)
    h, w = image.shape[:2]
    crops = [image[max(int(y1), 0):max(min(int(y2), h), 0),
                   max(int(x1), 0):max(min(int(x2), w), 0)]
             for x1, y1, x2, y2 in xy]

    for i in range(xy.shape[0]):
        x1, y1, x2, y2 = xy[i].astype(int)
        cv2.rectangle(new_img, (x1, y1), (x2, y2), color, 1)
        if classes is not None:
            c = int(classes[i])
            xc, yc = (x1 + x2) // 2, (y1 + y2) // 2
            cv2.putText(new_img, str(class_names[c]), (xc, yc), 0, 0.5, color)

    return new_img, crops


def draw_boxes_vec(images, image_indices, xy, classes=None, color=(0, 255, 0)):
    """Draw boxes on a batch of images.

    Reference parity: plot.py:37-63.
    """
    new_images, crops_bch = [], []
    for i in range(len(images)):
        mask = image_indices == i
        cls_i = classes[mask] if classes is not None else None
        new_img, crops_img = draw_boxes(images[i], xy[mask], cls_i, color=color)
        new_images.append(new_img)
        crops_bch.append(crops_img)
    return new_images, crops_bch

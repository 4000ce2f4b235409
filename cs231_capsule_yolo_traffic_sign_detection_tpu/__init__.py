"""TPU-native rebuild of the capsule-YOLO traffic-sign framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference (Cranial-XIX/cs231-capsule-yolo-traffic-sign-detection):

  * five model configurations (cnn / capsule / darknet_d / darknet_r /
    darkcapsule) over GTSRB classification and GTSDB detection,
  * YOLO-v1-style losses and capsule dynamic routing,
  * the full train / predict / overfit driver surface,

re-designed TPU-first: NHWC tensors end-to-end, functional jitted train
steps over a pytree state, device-resident datasets, masked fixed-shape
losses (no data-dependent shapes inside jit), `jax.sharding.Mesh`-based
data/model parallelism, and a fused Pallas kernel for dynamic routing.

Import alias convention used throughout the repo:

    import cs231_capsule_yolo_traffic_sign_detection_tpu as cyt
"""

from . import config  # noqa: F401
from .params import Params  # noqa: F401

__version__ = "0.1.0"

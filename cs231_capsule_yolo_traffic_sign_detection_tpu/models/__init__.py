from .convnet import ConvNet  # noqa: F401
from .capsule_net import CapsuleNet  # noqa: F401
from .darknet import DarkNet  # noqa: F401
from .darkcapsule import DarkCapsuleNet, DarkCapsuleNet2, DarkCapsuleNet3  # noqa: F401
from .registry import build_model, MODEL_REGISTRY  # noqa: F401

"""Model registry: model name -> flax module construction.

Mirrors the reference's model/loss/predict/metric registry
(reference main.py:258-265); the loss/predict/metric wiring lives in
`train.driver` to avoid import cycles.  NOTE the reference defines the
'darkcapsule' registry row twice (main.py:263-264) — dict semantics
make the second row (metric = detect_and_recog_acc) the effective one;
we reproduce that effective binding.
"""

from .convnet import ConvNet
from .capsule_net import CapsuleNet
from .darknet import DarkNet
from .darkcapsule import DarkCapsuleNet

MODEL_REGISTRY = {
    "cnn": ConvNet,
    "capsule": CapsuleNet,
    "darknet_d": DarkNet,
    "darknet_r": DarkNet,
    "darkcapsule": DarkCapsuleNet,
}


def build_model(params, routing_impl=None):
    """Instantiate the flax module for `params.model`."""
    name = params.model
    impl = routing_impl or params.get("routing_impl", "xla")
    dropout = float(params.get("dropout", 0.0))
    if name == "cnn":
        return ConvNet(n_classes=params.n_classes, dropout=dropout)
    if name == "capsule":
        return CapsuleNet(n_classes=params.n_classes, routing_impl=impl)
    if name in ("darknet_d", "darknet_r"):
        return DarkNet(
            n_boxes=params.n_boxes, n_classes=params.n_classes,
            dropout=dropout,
        )
    if name == "darkcapsule":
        return DarkCapsuleNet(n_grid=params.n_grid, routing_impl=impl)
    raise ValueError(f"unknown model {name!r}")

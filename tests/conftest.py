"""Test harness config: force CPU with 8 virtual devices.

The standard JAX fake-multichip trick: multi-device sharding tests run
against --xla_force_host_platform_device_count=8 on CPU, so the data/
model-parallel code paths compile and execute without TPU hardware
(SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter start and pins the
# tunneled single-chip TPU backend; env vars set afterwards are ignored.
# config.update still wins as long as no backend has initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # allow f64 in parity tests

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params  # noqa: E402


# The `unit` tier (VERDICT r4 item 7): the pure-function test files —
# no subprocesses, no model training, no reference torch runs — as a
# sub-5-minute red-green inner loop:  python -m pytest -q -m unit
# (measured time recorded in pytest.ini).  Defined here, in one place,
# so the tier's membership is auditable.
UNIT_FILES = {
    "test_boxes.py", "test_polar.py", "test_losses.py", "test_decode.py",
    "test_metrics.py", "test_capsule_ops.py", "test_quant.py",
    "test_crop.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in UNIT_FILES:
            item.add_marker(pytest.mark.unit)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def det_params():
    """Detection params (darknet_r-like, tiny grid for speed)."""
    return Params(
        n_classes=43, n_boxes=2, n_grid=4, darknet_input=64,
        l_coord=5.0, l_noobj=0.5, batch_size=4, model="darknet_r",
        capsule_input=32, recon=True, recon_coef=5e-4,
    )


@pytest.fixture
def det_params_noclass():
    return Params(
        n_classes=0, n_boxes=2, n_grid=4, darknet_input=64,
        l_coord=5.0, l_noobj=0.5, batch_size=4, model="darknet_d",
        capsule_input=32, recon=True, recon_coef=5e-4,
    )

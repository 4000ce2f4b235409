"""Checkpoint interop: reference .pth.tar <-> our .ckpt, both directions.

Exercises cyt.interop through the real artifacts: a torch checkpoint
saved exactly the way the reference saves one (utils.py:40-49) is
imported and must reproduce the reference's forward outputs through our
restore path (weights + BN stats + Adam moments); the export direction
must strict-load back into the executing reference classes.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")  # execute the reference, don't copy

# torch-0.4 compat shim (same as test_torch_parity.py): the reference
# calls .view on non-contiguous tensors, which torch 2.x rejects
_orig_view = torch.Tensor.view


def _view_compat(self, *a, **k):
    try:
        return _orig_view(self, *a, **k)
    except RuntimeError:
        return self.reshape(*a, **k)


torch.Tensor.view = _view_compat

import jax.numpy as jnp  # noqa: E402

from cs231_capsule_yolo_traffic_sign_detection_tpu import interop  # noqa: E402
from cs231_capsule_yolo_traffic_sign_detection_tpu.params import Params  # noqa: E402
from cs231_capsule_yolo_traffic_sign_detection_tpu.train import (  # noqa: E402
    checkpoint as ckpt,
)
from cs231_capsule_yolo_traffic_sign_detection_tpu.train.steps import (  # noqa: E402
    init_variables,
)


class _RefParams:
    device = "cpu"
    dropout = 0.0
    n_classes = 43
    n_boxes = 2
    n_grid = 2
    darknet_input = 64


def _params_for(model, **over):
    base = dict(model=model, n_classes=43, n_boxes=2, n_grid=2,
                darknet_input=64, recon=True, recon_coef=5e-4,
                routing_impl="xla", batch_size=4, seed=0, train_frac=1.0,
                dropout=0.0, l_coord=5.0, l_noobj=0.5, capsule_input=32)
    base.update(over)
    return Params(**base)


def _save_reference_ckpt(ref_model, path, epoch=7, optim=None):
    """Write the exact payload the reference writes (utils.py:40-49)."""
    torch.save({
        "epoch": epoch,
        "state_dict": ref_model.state_dict(),
        "optim_dict": optim.state_dict() if optim is not None else {},
    }, path)


def test_cnn_import_full_path(tmp_path):
    """pth.tar -> convert CLI-equivalent -> our restore -> forward parity,
    including BN running stats and Adam moments."""
    import models as ref_models  # /root/reference/models.py

    torch.manual_seed(0)
    ref = ref_models.ConvNet(_RefParams())

    # two real Adam steps so BN stats and moments are non-trivial
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    rng = np.random.RandomState(0)
    ref.train()
    for _ in range(2):
        x = torch.from_numpy(rng.rand(4, 3, 32, 32).astype(np.float32))
        y = torch.from_numpy(rng.randint(0, 43, size=4))
        loss = torch.nn.functional.cross_entropy(ref(x), y)
        opt.zero_grad()
        loss.backward()
        opt.step()
    ref.eval()

    pth = str(tmp_path / "last.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=7, optim=opt)

    params = _params_for("cnn")
    out_dir = str(tmp_path / "converted")
    interop.convert_torch_checkpoint(pth, params, out_dir, best=True)
    assert os.path.exists(os.path.join(out_dir, "best.ckpt"))

    # restore through the product predict path
    from cs231_capsule_yolo_traffic_sign_detection_tpu.predict import (
        restore_variables,
    )

    params.mesh = "off"
    model, variables, _ = restore_variables(params, out_dir, "last")

    x = rng.rand(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)

    # moments: checkpoint carries the torch Adam state, mapped + permuted
    raw = ckpt.load_checkpoint(os.path.join(out_dir, "last.ckpt"))
    assert raw["epoch"] == 7
    assert int(np.asarray(raw["state"]["step"])) == 2
    assert int(np.asarray(raw["state"]["opt_state"]["count"])) == 2
    tsd = {k: v for k, v in ref.state_dict().items()}
    t_idx = interop._torch_param_order(tsd).index("cnn.12.weight")
    exp_avg = opt.state_dict()["state"][t_idx]["exp_avg"].numpy()
    np.testing.assert_allclose(
        raw["state"]["opt_state"]["mu"]["Dense_1"]["kernel"],
        exp_avg.T, rtol=1e-6, atol=1e-8)


def test_cnn_export_roundtrip(tmp_path):
    """our .ckpt -> .pth.tar -> strict torch load (weights + optimizer)."""
    import models as ref_models

    torch.manual_seed(1)
    ref = ref_models.ConvNet(_RefParams())
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    x = torch.randn(4, 3, 32, 32)
    loss = ref(x).square().mean()
    opt.zero_grad()
    loss.backward()
    opt.step()
    ref.eval()

    pth = str(tmp_path / "ref.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=3, optim=opt)
    params = _params_for("cnn")
    out_dir = str(tmp_path / "ours")
    ckpt_path = interop.convert_torch_checkpoint(pth, params, out_dir)

    back = str(tmp_path / "back.pth.tar")
    interop.export_torch_checkpoint(ckpt_path, params, back)
    payload = torch.load(back, map_location="cpu", weights_only=False)
    assert payload["epoch"] == 3

    torch.manual_seed(2)
    ref2 = ref_models.ConvNet(_RefParams())
    ref2.load_state_dict(payload["state_dict"])  # strict by default
    ref2.eval()
    opt2 = torch.optim.Adam(ref2.parameters(), lr=1e-3)
    opt2.load_state_dict(payload["optim_dict"])

    xs = torch.randn(3, 3, 32, 32)
    with torch.no_grad():
        np.testing.assert_allclose(ref2(xs).numpy(), ref(xs).numpy(),
                                   rtol=1e-5, atol=1e-6)
    # moments survive the double conversion bit-exactly (pure permutes)
    np.testing.assert_allclose(
        opt2.state_dict()["state"][0]["exp_avg"].numpy(),
        opt.state_dict()["state"][0]["exp_avg"].numpy(),
        rtol=0, atol=0)


def _template(model, input_shape, needs_labels=False):
    variables, _ = init_variables(model, input_shape, seed=0, batch_size=2,
                                  needs_labels=needs_labels)
    return variables


@pytest.mark.parametrize("name", ["darknet_r", "darkcapsule", "capsule"])
def test_mapping_forward_parity_and_reverse(name, tmp_path):
    """Direct torch_to_variables mapping: forward parity with the
    executing reference, then the inverse mapping strict-loads back."""
    import models as ref_models

    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import (
        CapsuleNet, DarkCapsuleNet, DarkNet,
    )

    p = _RefParams()
    torch.manual_seed(0)
    if name == "darknet_r":
        ref = ref_models.DarkNet(p)
        ours = DarkNet(n_boxes=2, n_classes=43, dropout=0.0)
        shape = (64, 64, 3)
    elif name == "darkcapsule":
        ref = ref_models.DarkCapsuleNet(p)
        ours = DarkCapsuleNet(n_grid=2, routing_impl="xla")
        shape = (64, 64, 3)
    else:
        ref = ref_models.CapsuleNet(p)
        ours = CapsuleNet(n_classes=43, routing_impl="xla")
        shape = (32, 32, 3)
    ref.eval()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    template = _template(ours, shape)
    variables = interop.torch_to_variables(sd, name, dict(template))

    x = np.random.RandomState(0).rand(2, *shape).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    our_out = np.asarray(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=1e-5)

    # reverse: strict-load into a fresh reference instance
    back = interop.variables_to_torch_state_dict(variables, name)
    torch.manual_seed(3)
    ref2 = type(ref)(p)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in back.items()})
    ref2.eval()
    with torch.no_grad():
        ref2_out = ref2(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ref2_out, ref_out, rtol=1e-5, atol=1e-6)


def test_unmapped_keys_raise():
    """Strictness: a stray tensor in the torch checkpoint is an error,
    not a silent drop."""
    from cs231_capsule_yolo_traffic_sign_detection_tpu.models import ConvNet

    import models as ref_models

    torch.manual_seed(0)
    ref = ref_models.ConvNet(_RefParams())
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    sd["mystery.weight"] = np.zeros((1,), np.float32)
    template = _template(ConvNet(n_classes=43, dropout=0.0), (32, 32, 3))
    with pytest.raises(ValueError, match="unmapped"):
        interop.torch_to_variables(sd, "cnn", dict(template))


def test_capsule_optimizer_export_order(tmp_path):
    """Regression: torch maps optimizer ids positionally over
    parameters() — the reference CapsuleNet registers primary-capsule
    weight/bias INTERLEAVED per child conv (models.py:60-62), while the
    fused conversion entries emit all weights then all biases.  The
    exported optim_dict must follow the reference order, or
    capsules.0.bias would receive capsules.1.weight's moments."""
    import models as ref_models

    torch.manual_seed(0)
    p = _RefParams()
    ref = ref_models.CapsuleNet(p)
    opt = torch.optim.Adam(ref.parameters(), lr=2e-4)
    # recon branch so EVERY param (decoder included) gets a gradient —
    # torch Adam creates state lazily, and the import falls back to
    # fresh moments for partially-covered optimizers by design
    scores, recon = ref(torch.randn(2, 3, 32, 32),
                        torch.tensor([1, 2]), recon=True)
    loss = scores.square().mean() + recon.square().mean()
    opt.zero_grad()
    loss.backward()
    opt.step()

    pth = str(tmp_path / "caps.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=2, optim=opt)
    params = _params_for("capsule")
    out_dir = str(tmp_path / "ours")
    ckpt_path = interop.convert_torch_checkpoint(pth, params, out_dir)
    back = str(tmp_path / "back.pth.tar")
    interop.export_torch_checkpoint(ckpt_path, params, back)
    payload = torch.load(back, map_location="cpu", weights_only=False)

    # lr survives the round trip (plateau state is absent in converted
    # checkpoints, so it falls back to params lr_runtime default — pin
    # only the moment mapping here)
    ref2 = ref_models.CapsuleNet(p)
    ref2.load_state_dict(payload["state_dict"])
    opt2 = torch.optim.Adam(ref2.parameters(), lr=2e-4)
    opt2.load_state_dict(payload["optim_dict"])

    # per-parameter moments must line up with the ORIGINAL optimizer's
    orig = opt.state_dict()["state"]
    rt = opt2.state_dict()["state"]
    names = [k for k, q in ref.named_parameters()]
    assert len(orig) == len(rt) == len(names)
    for i, name in enumerate(names):
        np.testing.assert_allclose(
            rt[i]["exp_avg"].numpy(), orig[i]["exp_avg"].numpy(),
            rtol=0, atol=0, err_msg=name)


def test_multigroup_optimizer_falls_back(tmp_path):
    """Two param groups can reorder torch's positional ids; the import
    must refuse the ambiguous mapping and start with fresh moments."""
    import models as ref_models

    torch.manual_seed(0)
    ref = ref_models.ConvNet(_RefParams())
    ps = list(ref.parameters())
    opt = torch.optim.Adam(
        [{"params": ps[2:]}, {"params": ps[:2], "lr": 1e-4}], lr=1e-3)
    loss = ref(torch.randn(2, 3, 32, 32)).square().mean()
    loss.backward()
    opt.step()

    pth = str(tmp_path / "mg.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=1, optim=opt)
    out_dir = str(tmp_path / "out")
    interop.convert_torch_checkpoint(pth, _params_for("cnn"), out_dir)
    raw = ckpt.load_checkpoint(os.path.join(out_dir, "last.ckpt"))
    assert int(np.asarray(raw["state"]["opt_state"]["count"])) == 0


def test_finetuned_optimizer_falls_back(tmp_path, capsys):
    """A fine-tuned checkpoint (optimizer saw only trainable params)
    converts weights but starts with fresh moments."""
    import models as ref_models

    torch.manual_seed(0)
    ref = ref_models.ConvNet(_RefParams())
    ref.cnn[0].weight.requires_grad_(False)
    opt = torch.optim.Adam(
        [q for q in ref.parameters() if q.requires_grad], lr=1e-3)
    loss = ref(torch.randn(2, 3, 32, 32)).square().mean()
    loss.backward()
    opt.step()

    pth = str(tmp_path / "ft.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=1, optim=opt)
    out_dir = str(tmp_path / "out")
    interop.convert_torch_checkpoint(pth, _params_for("cnn"), out_dir)
    raw = ckpt.load_checkpoint(os.path.join(out_dir, "last.ckpt"))
    assert int(np.asarray(raw["state"]["opt_state"]["count"])) == 0
    mu_leaf = raw["state"]["opt_state"]["mu"]["Conv_0"]["kernel"]
    assert float(np.abs(np.asarray(mu_leaf)).max()) == 0.0


def test_converted_checkpoint_seeds_plateau_lr(tmp_path):
    """The torch optimizer's live (possibly decayed) lr must survive
    conversion: the reference's resume restores it via optim_dict
    (main.py:151), so our driver's plateau scheduler is seeded with it
    instead of silently training at the CLI default."""
    import models as ref_models

    torch.manual_seed(0)
    ref = ref_models.ConvNet(_RefParams())
    opt = torch.optim.Adam(ref.parameters(), lr=2.5e-4)  # "decayed" lr
    loss = ref(torch.randn(2, 3, 32, 32)).square().mean()
    loss.backward()
    opt.step()

    pth = str(tmp_path / "lr.pth.tar")
    _save_reference_ckpt(ref, pth, epoch=4, optim=opt)
    out_dir = str(tmp_path / "out")
    interop.convert_torch_checkpoint(pth, _params_for("cnn"), out_dir)
    raw = ckpt.load_checkpoint(os.path.join(out_dir, "last.ckpt"))
    assert abs(float(raw["plateau"]["lr"]) - 2.5e-4) < 1e-12

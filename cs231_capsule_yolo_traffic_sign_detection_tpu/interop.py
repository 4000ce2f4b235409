"""Torch-checkpoint interop: migrate reference checkpoints, both ways.

The reference saves ``{'epoch', 'state_dict', 'optim_dict'}`` torch
pickles (reference utils.py:40-49, main.py:181-188).  This module
converts those into this framework's msgpack TrainState checkpoints —
weights, BN running statistics, and (when unambiguous) the Adam
moments, so a reference user can bring a trained model here without
retraining and resume optimization exactly.  The reverse direction
exports one of our checkpoints as a reference-loadable state_dict.

The tensor-layout mapping is the one the forward-parity tests pin
(tests/test_torch_parity.py, tests/test_interop.py):

- conv kernels: torch OIHW  ->  flax HWIO
- dense kernels: torch (out, in)  ->  flax (in, out)
- ConvNet's first dense layer additionally permutes its input axis
  (torch flattens CHW, we flatten HWC — reference models.py:40)
- CapsuleNet's 8 parallel primary-capsule convs (reference
  models.py:60-62) are one fused 128-channel conv here: concatenate
  along the output-channel axis
- CapsuleNet routing weights: our node order is (position, channel),
  the reference's is (channel, position) — a fixed permutation of the
  node axis (reference models.py:57-58; COMPAT.md)
- DarkCapsuleNet's registered-but-unused reconstruction decoder
  (reference models.py:372-387) has no counterpart in our module; its
  tensors are skipped on import and synthesized as zeros on export.
"""

import os

import numpy as np
from flax import serialization, traverse_util


# ---------------------------------------------------------------------------
# primitive tensor transforms (fwd: torch arrays -> ours, inv: ours -> torch)

def _conv_fwd(ws):
    return np.transpose(ws[0], (2, 3, 1, 0))  # OIHW -> HWIO


def _conv_inv(a):
    return [np.transpose(a, (3, 2, 0, 1))]


def _id_fwd(ws):
    return ws[0]


def _id_inv(a):
    return [a]


def _t_fwd(ws):
    return np.transpose(ws[0])  # torch Linear (out, in) -> flax (in, out)


def _t_inv(a):
    return [np.transpose(a)]


def _dense_chw_perm(chw, channels=128):
    """Index map: our HWC-flattened input axis -> torch's CHW index.

    ConvNet flattens the (H, W, C) pooled activation; the reference
    flattens (C, H, W) (reference models.py:40 via torch .view).
    """
    hw = chw // channels
    side = int(round(hw ** 0.5))
    assert side * side * channels == chw, (chw, channels)
    h, w, c = np.meshgrid(np.arange(side), np.arange(side),
                          np.arange(channels), indexing="ij")
    return (c * side * side + h * side + w).reshape(-1)


def _dense_chw_fwd(ws):
    w = ws[0]  # (out, C*H*W) CHW-major
    return np.ascontiguousarray(w[:, _dense_chw_perm(w.shape[1])].T)


def _dense_chw_inv(a):
    perm = _dense_chw_perm(a.shape[0])
    return [np.ascontiguousarray(a.T[:, np.argsort(perm)])]


def _fused_caps_fwd(ws):
    """8 torch convs (16, 256, 8, 8) -> one HWIO kernel (8, 8, 256, 128)."""
    return _conv_fwd([np.concatenate(ws, axis=0)])


def _fused_caps_inv(a):
    oihw = _conv_inv(a)[0]
    return list(np.split(oihw, 8, axis=0))


def _fused_bias_fwd(ws):
    return np.concatenate(ws, axis=0)


def _fused_bias_inv(a):
    return list(np.split(a, 8, axis=0))


def _caps_node_perm(n_pos=81, n_ch=16):
    """our node (pos p, channel c) at p*16+c <- reference node c*81+p."""
    pos = np.arange(n_pos)[:, None]
    ch = np.arange(n_ch)[None, :]
    return (ch * n_pos + pos).reshape(-1)


def _route_perm_fwd(ws):
    w = ws[0][0]  # drop the leading broadcast axis: (1, N, K, C, D) -> rest
    return w[_caps_node_perm()]


def _route_perm_inv(a):
    return [a[np.argsort(_caps_node_perm())][None]]


def _route_squeeze_fwd(ws):
    return ws[0][0]


def _route_squeeze_inv(a):
    return [a[None]]


class _Entry:
    """One mapped tensor group: torch state_dict keys <-> our leaf path."""

    def __init__(self, torch_keys, path, collection="params",
                 fwd=_id_fwd, inv=_id_inv):
        self.torch_keys = list(torch_keys)
        self.path = tuple(path)
        self.collection = collection
        self.fwd = fwd
        self.inv = inv


def _bn_entries(torch_prefix, our_parent, our_name):
    p = our_parent + (our_name,)
    return [
        _Entry([torch_prefix + ".weight"], p + ("scale",)),
        _Entry([torch_prefix + ".bias"], p + ("bias",)),
        _Entry([torch_prefix + ".running_mean"], p + ("mean",),
               collection="batch_stats"),
        _Entry([torch_prefix + ".running_var"], p + ("var",),
               collection="batch_stats"),
    ]


def _decoder_entries(torch_prefix="decoder", our_parent=("decoder",)):
    """Reconstruction decoder (reference models.py:96-111): Linear
    16->256 at torch index 0, then convs at sequential indices 4/7/10/12."""
    e = [
        _Entry([f"{torch_prefix}.0.weight"], our_parent + ("Dense_0", "kernel"),
               fwd=_t_fwd, inv=_t_inv),
        _Entry([f"{torch_prefix}.0.bias"], our_parent + ("Dense_0", "bias")),
    ]
    for j, idx in enumerate((4, 7, 10, 12)):
        e += [
            _Entry([f"{torch_prefix}.{idx}.weight"],
                   our_parent + (f"Conv_{j}", "kernel"),
                   fwd=_conv_fwd, inv=_conv_inv),
            _Entry([f"{torch_prefix}.{idx}.bias"],
                   our_parent + (f"Conv_{j}", "bias")),
        ]
    return e


def entries_for(model_name):
    """The full bidirectional tensor mapping for one model family."""
    if model_name == "cnn":
        e = [
            _Entry(["cnn.0.weight"], ("Conv_0", "kernel"),
                   fwd=_conv_fwd, inv=_conv_inv),
            _Entry(["cnn.0.bias"], ("Conv_0", "bias")),
            *_bn_entries("cnn.1", (), "BatchNorm_0"),
            _Entry(["cnn.4.weight"], ("Conv_1", "kernel"),
                   fwd=_conv_fwd, inv=_conv_inv),
            _Entry(["cnn.4.bias"], ("Conv_1", "bias")),
            *_bn_entries("cnn.5", (), "BatchNorm_1"),
            _Entry(["cnn.10.weight"], ("Dense_0", "kernel"),
                   fwd=_dense_chw_fwd, inv=_dense_chw_inv),
            _Entry(["cnn.10.bias"], ("Dense_0", "bias")),
            _Entry(["cnn.12.weight"], ("Dense_1", "kernel"),
                   fwd=_t_fwd, inv=_t_inv),
            _Entry(["cnn.12.bias"], ("Dense_1", "bias")),
        ]
        return e
    if model_name == "capsule":
        return [
            _Entry(["conv1.weight"], ("conv1", "kernel"),
                   fwd=_conv_fwd, inv=_conv_inv),
            _Entry(["conv1.bias"], ("conv1", "bias")),
            _Entry([f"primary_capsules.capsules.{j}.weight" for j in range(8)],
                   ("primary_capsules", "Conv_0", "kernel"),
                   fwd=_fused_caps_fwd, inv=_fused_caps_inv),
            _Entry([f"primary_capsules.capsules.{j}.bias" for j in range(8)],
                   ("primary_capsules", "Conv_0", "bias"),
                   fwd=_fused_bias_fwd, inv=_fused_bias_inv),
            _Entry(["traffic_sign_capsules.route_weights"],
                   ("traffic_sign_capsules", "route_weights"),
                   fwd=_route_perm_fwd, inv=_route_perm_inv),
            *_decoder_entries(),
        ]
    if model_name in ("darknet_d", "darknet_r"):
        e = []
        for i in range(1, 19):
            e.append(_Entry([f"model.conv_{i}.weight"],
                            (f"block_{i}", f"conv_{i}", "kernel"),
                            fwd=_conv_fwd, inv=_conv_inv))
            e += _bn_entries(f"model.bn_{i}", (f"block_{i}",), f"bn_{i}")
        e.append(_Entry(["model.conv_19.weight"], ("conv_19", "kernel"),
                        fwd=_conv_fwd, inv=_conv_inv))
        return e
    if model_name == "darkcapsule":
        e = []
        for i in range(1, 6):
            e.append(_Entry([f"conv.conv_{i}.weight"],
                            (f"block_{i}", f"conv_{i}", "kernel"),
                            fwd=_conv_fwd, inv=_conv_inv))
            e.append(_Entry([f"conv.conv_{i}.bias"],
                            (f"block_{i}", f"conv_{i}", "bias")))
            e += _bn_entries(f"conv.bn_{i}", (f"block_{i}",), f"bn_{i}")
        e.append(_Entry(["traffic_sign_capsules.route_weights"],
                        ("traffic_sign_capsules", "route_weights"),
                        fwd=_route_squeeze_fwd, inv=_route_squeeze_inv))
        return e
    raise ValueError(f"unknown model {model_name!r}")


# tensors present in reference state_dicts with no counterpart here
_BUFFER_SUFFIXES = ("num_batches_tracked",)
# DarkCapsuleNet registers a decoder it never calls (reference
# models.py:372-387); skipped on import, zero-filled on export so
# torch's strict load_state_dict accepts the result.
_DARKCAPSULE_DECODER_SHAPES = {
    "decoder.0.weight": (256, 16), "decoder.0.bias": (256,),
    "decoder.4.weight": (4, 16, 3, 3), "decoder.4.bias": (4,),
    "decoder.7.weight": (8, 4, 3, 3), "decoder.7.bias": (8,),
    "decoder.10.weight": (16, 8, 3, 3), "decoder.10.bias": (16,),
    "decoder.12.weight": (3, 16, 3, 3), "decoder.12.bias": (3,),
}


def _ignored(key, model_name):
    if key.endswith(_BUFFER_SUFFIXES):
        return True
    return model_name == "darkcapsule" and key.startswith("decoder.")


def torch_to_variables(state_dict, model_name, template_variables):
    """Map a reference state_dict onto our variables pytree.

    `state_dict` holds numpy arrays (or anything np.asarray accepts);
    `template_variables` supplies the pytree structure and the target
    shapes (from `train.steps.init_variables`).  Strict: unknown torch
    keys and unfilled template leaves both raise.
    """
    flat = {
        coll: traverse_util.flatten_dict(dict(tree))
        for coll, tree in template_variables.items() if tree
    }
    consumed = set()
    filled = {coll: set() for coll in flat}
    for entry in entries_for(model_name):
        arrays = [np.asarray(state_dict[k]) for k in entry.torch_keys]
        out = entry.fwd(arrays)
        target = flat[entry.collection]
        if entry.path not in target:
            raise KeyError(
                f"{model_name}: no template leaf {entry.path} "
                f"in {entry.collection}")
        want = np.shape(target[entry.path])
        if tuple(out.shape) != tuple(want):
            raise ValueError(
                f"{model_name}: {entry.torch_keys} -> {entry.path}: "
                f"shape {out.shape} != template {want}")
        target[entry.path] = out.astype(
            np.asarray(target[entry.path]).dtype)
        filled[entry.collection].add(entry.path)
        consumed.update(entry.torch_keys)

    leftover = [k for k in state_dict
                if k not in consumed and not _ignored(k, model_name)]
    if leftover:
        raise ValueError(f"{model_name}: unmapped torch tensors {leftover}")
    for coll, paths in filled.items():
        missing = set(flat[coll]) - paths
        if missing:
            raise ValueError(
                f"{model_name}: template {coll} leaves not covered by "
                f"the checkpoint: {sorted(missing)}")

    return {coll: traverse_util.unflatten_dict(tree)
            for coll, tree in flat.items()}


def variables_to_torch_state_dict(variables, model_name):
    """Inverse mapping: our params/batch_stats -> a reference state_dict.

    Key INSERTION ORDER matches the reference's module registration
    order — torch's optimizer state maps parameters positionally, so
    `_torch_param_order` over this dict must equal
    model.parameters() order in the reference classes.
    """
    flat = {
        coll: traverse_util.flatten_dict(dict(tree))
        for coll, tree in variables.items() if tree
    }
    out = {}
    for entry in entries_for(model_name):
        leaf = np.asarray(flat[entry.collection][entry.path], np.float32)
        for key, arr in zip(entry.torch_keys, entry.inv(leaf)):
            out[key] = np.ascontiguousarray(arr, np.float32)
        if entry.path[-1] == "var":  # BN: emit the torch-only counter
            out[entry.torch_keys[0].rsplit(".", 1)[0]
                + ".num_batches_tracked"] = np.zeros((), np.int64)
    if model_name == "darkcapsule":
        for key, shape in _DARKCAPSULE_DECODER_SHAPES.items():
            out[key] = np.zeros(shape, np.float32)
    return _reorder_like_reference(out, model_name)


def _reorder_like_reference(out, model_name):
    """Re-insert keys in the reference's registration order.

    Only CapsuleNet needs this: the fused primary-capsule entries emit
    all 8 conv weights then all 8 biases, while the reference registers
    weight/bias interleaved per child conv (models.py:60-62) — and
    torch optimizer ids follow that interleaved order.
    """
    if model_name != "capsule":
        return out
    keys = ["conv1.weight", "conv1.bias"]
    for j in range(8):
        keys += [f"primary_capsules.capsules.{j}.weight",
                 f"primary_capsules.capsules.{j}.bias"]
    keys.append("traffic_sign_capsules.route_weights")
    for idx in (0, 4, 7, 10, 12):
        keys += [f"decoder.{idx}.weight", f"decoder.{idx}.bias"]
    assert set(keys) == set(out), (sorted(set(out) - set(keys)),
                                   sorted(set(keys) - set(out)))
    return {k: out[k] for k in keys}


# ---------------------------------------------------------------------------
# optimizer-state conversion (Adam moments)

def _torch_param_order(state_dict):
    """Parameter (not buffer) keys in registration order == the order
    torch's model.parameters() fed the Adam constructor (reference
    main.py:280)."""
    buffers = ("running_mean", "running_var") + _BUFFER_SUFFIXES
    return [k for k in state_dict if not k.endswith(buffers)]


def torch_optim_to_adam_moments(optim_dict, state_dict, model_name):
    """Map a torch Adam state into (mu, nu, count) flat path dicts.

    Returns None — with a printed reason — when the mapping is
    ambiguous (e.g. a fine-tuned checkpoint whose optimizer saw only
    the trainable subset, reference main.py:273-280).
    """
    try:
        groups = optim_dict["param_groups"]
        ids = [i for g in groups for i in g["params"]]
        opt_state = optim_dict["state"]
    except (KeyError, TypeError):
        print("[interop] optim_dict is not a torch Adam state; "
              "starting with fresh moments")
        return None
    if len(groups) != 1:
        # multiple param groups can reorder ids vs registration order;
        # the positional mapping below would silently mis-assign moments
        print(f"[interop] optimizer has {len(groups)} param groups "
              "(the reference builds one, main.py:280); starting with "
              "fresh moments")
        return None
    order = _torch_param_order(state_dict)
    if len(ids) != len(order) or any(i not in opt_state for i in ids):
        have = sum(1 for i in ids if i in opt_state)
        print("[interop] optimizer state covers {} of {} params "
              "(zero-step, fine-tuned, or partial checkpoint); starting "
              "with fresh moments".format(have, len(order)))
        return None

    def moment(key, which):
        ent = opt_state[ids[order.index(key)]]
        return np.asarray(ent[which], np.float32)

    mu, nu = {}, {}
    count = 0
    for entry in entries_for(model_name):
        if entry.collection != "params":
            continue
        if any(_ignored(k, model_name) for k in entry.torch_keys):
            continue
        mu[entry.path] = entry.fwd(
            [moment(k, "exp_avg") for k in entry.torch_keys])
        nu[entry.path] = entry.fwd(
            [moment(k, "exp_avg_sq") for k in entry.torch_keys])
    for ent in opt_state.values():
        count = max(count, int(np.asarray(ent.get("step", 0)).item()))
    return mu, nu, count


# ---------------------------------------------------------------------------
# file-level conversion

def _load_torch_pickle(path):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints are torch-0.4 pickles; fall back to the
        # unrestricted loader for those
        return torch.load(path, map_location="cpu", weights_only=False)


def _init_template_state(params_cfg):
    from .losses import LossConfig
    from .models import build_model
    from .train.driver import model_input_shape
    from .train.steps import init_state

    model = build_model(params_cfg)
    needs_labels = (params_cfg.model == "capsule"
                    and LossConfig.from_params(params_cfg).recon)
    return init_state(model, params_cfg, model_input_shape(params_cfg),
                      seed=int(params_cfg.get("seed", 0)),
                      batch_size=2, needs_labels=needs_labels)


def convert_torch_checkpoint(pth_path, params_cfg, out_dir,
                             best=False, include_optim=True):
    """Reference .pth.tar -> our last.ckpt (+ best.ckpt when `best`).

    The written checkpoint is a full TrainState payload — restorable by
    both `--mode predict --restore` and `--mode train --restore` —
    with converted weights/BN stats, converted Adam moments when the
    optimizer state maps one-to-one, and the reference's saved epoch.
    """
    import jax.numpy as jnp

    from .train import checkpoint as ckpt

    raw = _load_torch_pickle(pth_path)
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v)
          for k, v in raw["state_dict"].items()}
    state = _init_template_state(params_cfg)

    template = {"params": serialization.to_state_dict(state.params)}
    if state.batch_stats:
        template["batch_stats"] = serialization.to_state_dict(
            state.batch_stats)
    converted = torch_to_variables(sd, params_cfg.model, template)

    new_params = serialization.from_state_dict(
        state.params, converted["params"])
    new_stats = state.batch_stats
    if "batch_stats" in converted:
        new_stats = serialization.from_state_dict(
            state.batch_stats, converted["batch_stats"])

    opt_state = state.opt_state  # fresh zero moments by default
    step = state.step
    if include_optim and raw.get("optim_dict"):
        moments = torch_optim_to_adam_moments(
            raw["optim_dict"], sd, params_cfg.model)
        if moments is not None:
            mu_flat, nu_flat, count = moments
            flat_template = traverse_util.flatten_dict(
                serialization.to_state_dict(new_params))
            missing = set(flat_template) - set(mu_flat)
            if missing:
                raise ValueError(
                    f"moments missing for params {sorted(missing)}")
            mu = serialization.from_state_dict(
                new_params, traverse_util.unflatten_dict(mu_flat))
            nu = serialization.from_state_dict(
                new_params, traverse_util.unflatten_dict(nu_flat))
            opt_state = state.opt_state._replace(
                count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu)
            step = jnp.asarray(count, jnp.int32)
            print(f"[interop] Adam moments converted (step={count})")

    new_state = state.replace(params=new_params, batch_stats=new_stats,
                              opt_state=opt_state, step=step)
    # seed the plateau scheduler with the torch optimizer's live lr:
    # the reference's resume restores it through optim_dict
    # (main.py:151), so a converted run must continue at the decayed
    # lr, not the CLI default.  Counters reset — exactly like the
    # reference, which constructs a fresh scheduler on resume.
    plateau_state = {}
    groups = (raw.get("optim_dict") or {}).get("param_groups") or []
    if groups and "lr" in groups[0]:
        plateau_state = {"lr": float(groups[0]["lr"])}
    payload = {
        "epoch": int(raw.get("epoch", 0)),
        "state": serialization.to_state_dict(new_state),
        "plateau": plateau_state,
    }
    ckpt.save_checkpoint(payload, is_best=best, checkpoint_dir=out_dir)
    return os.path.join(out_dir, "last.ckpt")


def export_torch_checkpoint(ckpt_path, params_cfg, out_path,
                            include_optim=True):
    """Our .ckpt -> a reference-loadable {'epoch','state_dict','optim_dict'}.

    The state_dict loads with torch's strict load_state_dict into the
    reference model classes; optim_dict (when included and the
    checkpoint carries Adam moments) loads into a torch.optim.Adam over
    model.parameters().
    """
    import torch

    from .train import checkpoint as ckpt

    raw = ckpt.load_checkpoint(ckpt_path, target=None)
    state = raw["state"]
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    sd = variables_to_torch_state_dict(variables, params_cfg.model)
    # np.array copies: msgpack-restored buffers are non-writable, which
    # torch.from_numpy warns about
    torch_sd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    optim_dict = {}
    if include_optim:
        # the checkpoint's plateau scheduler state carries the LIVE lr
        # (train/plateau.py state_dict); params only knows the CLI
        # default, which may not be what the run decayed to
        lr = (raw.get("plateau") or {}).get(
            "lr", params_cfg.get("lr_runtime", 1e-3))
        optim_dict = _export_adam_state(state, params_cfg.model, sd,
                                        lr=float(np.asarray(lr)))

    payload = {
        "epoch": int(np.asarray(raw.get("epoch", 0))),
        "state_dict": torch_sd,
        "optim_dict": optim_dict,
    }
    torch.save(payload, out_path)
    return out_path


def _export_adam_state(state, model_name, torch_sd, lr=1e-3):
    """Build a torch Adam state dict from our ScaleByAdamState."""
    import torch

    opt = state.get("opt_state", {})
    mu_tree, nu_tree = opt.get("mu"), opt.get("nu")
    if mu_tree is None or nu_tree is None:
        return {}
    count = int(np.asarray(opt.get("count", 0)))
    mu = traverse_util.flatten_dict(mu_tree)
    nu = traverse_util.flatten_dict(nu_tree)

    order = _torch_param_order(torch_sd)
    per_key_m, per_key_v = {}, {}
    for entry in entries_for(model_name):
        if entry.collection != "params":
            continue
        for key, arr in zip(entry.torch_keys,
                            entry.inv(np.asarray(mu[entry.path], np.float32))):
            per_key_m[key] = arr
        for key, arr in zip(entry.torch_keys,
                            entry.inv(np.asarray(nu[entry.path], np.float32))):
            per_key_v[key] = arr

    opt_state, ids = {}, []
    for i, key in enumerate(order):
        ids.append(i)
        m = per_key_m.get(key)
        v = per_key_v.get(key)
        if m is None:  # unused-decoder params: zero moments
            m = np.zeros_like(torch_sd[key], dtype=np.float32)
            v = np.zeros_like(torch_sd[key], dtype=np.float32)
        # np.array (not ascontiguousarray): jax buffers arrive as
        # read-only views, and torch.from_numpy on one is UB if the
        # tensor is ever written — copy into writable memory.
        opt_state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(np.array(m, dtype=np.float32)),
            "exp_avg_sq": torch.from_numpy(np.array(v, dtype=np.float32)),
        }
    return {
        "state": opt_state,
        "param_groups": [{
            "lr": lr,
            "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
            "amsgrad": False, "params": ids,
        }],
    }

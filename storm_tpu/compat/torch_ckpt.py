"""Torch (Lightning) checkpoint -> flax parameter conversion.

The reference's NCSN++ stores modules positionally
(`all_modules.{i}.<param>`, sgmse/backbones/ncsnpp.py:273); this framework
names the same modules `m{i}` with identical construction order
(storm_tpu/backbones/ncsnpp.py setup), so conversion is a pure name/layout
mapping:

    torch                         flax (this framework)
    ------------------------------------------------------------------
    all_modules.N.W               m{N}.W            (GaussianFourier)
    all_modules.N.weight (O,I)    m{N}.kernel (I,O)            (Linear)
    all_modules.N.weight (OIHW)   m{N}.kernel (HWIO)           (Conv2d)
    all_modules.N.GroupNorm_k.weight   m{N}.GroupNorm_k.scale
    all_modules.N.NIN_k.W/b       m{N}.NIN_k.W/b
    all_modules.N.Conv2d_0.weight m{N}.Conv2d_0_weight (HWIO)
    output_layer.weight/bias      output_layer.kernel/bias

EMA shadow parameters (torch-ema `shadow_params`, stored under 'ema' in the
checkpoint, sgmse/model.py:86-95) are positional over the trainable
parameters in state_dict order; `convert_lightning_checkpoint` rebuilds the
EMA tree by replaying that order.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: Dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_leaf(torch_key_tail: str, value: np.ndarray):
    """Map one torch parameter to (flax_name, converted_array)."""
    v = _to_np(value)
    if torch_key_tail == "weight":
        if v.ndim == 4:  # Conv2d OIHW -> HWIO
            return "kernel", np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 3:  # Conv1d OIW -> WIO
            return "kernel", np.transpose(v, (2, 1, 0))
        if v.ndim == 2:  # Linear (O,I) -> (I,O)
            return "kernel", v.T
        if v.ndim == 1:  # norm affine weight -> scale
            return "scale", v
    if torch_key_tail == "bias":
        return "bias", v
    # NIN W/b, GFP W keep their names and layouts
    return torch_key_tail, v


_GFP_KEYS = {"W"}  # GaussianFourierProjection frozen weight


def convert_backbone_state_dict(
    sd: Mapping[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Convert a torch NCSN++ state_dict (optionally under `prefix`, e.g.
    'dnn.' for ScoreModel / 'score_net.' for StoRM) into a flax param tree.
    """
    out: Dict[str, Any] = {}
    for key, value in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        v = _to_np(value)
        if parts == ["encoder", "weight"]:
            # ae-ncsnpp learned filterbank: Conv1d (O,I,W) -> (W,I,O)
            _set(out, ("encoder_w",), np.transpose(v, (2, 1, 0)))
            continue
        if parts == ["decoder", "weight"]:
            # ae-ncsnpp ConvTranspose1d (I,O,W) -> flipped (W,I,O): the flax
            # decoder is a lhs-dilated conv, which correlates where
            # conv_transpose convolves, hence the spatial flip
            _set(out, ("decoder_w",),
                 np.ascontiguousarray(np.transpose(v, (2, 0, 1))[::-1]))
            continue
        if parts[0] == "all_modules":
            idx = int(parts[1])
            rest = parts[2:]
            flax_path = [f"m{idx}"]
        elif parts[0] == "output_layer":
            rest = parts[1:]
            flax_path = ["output_layer"]
        else:
            # encoder/decoder (ae-ncsnpp) or other top-level modules
            rest = parts[1:]
            flax_path = [parts[0]]

        if len(rest) == 1:
            # direct param of the module (Conv/Linear/GroupNorm/GFP/NIN)
            # special-case the StyleGAN2 Conv2d_0 naming inside Up/Downsample
            name, conv = _convert_leaf(rest[0], v)
            _set(out, tuple(flax_path + [name]), conv)
        elif len(rest) == 2 and rest[0] == "Conv2d_0":
            # StyleGAN2 fused resample conv: flat params in this framework
            if rest[1] == "weight":
                _set(out, tuple(flax_path + ["Conv2d_0_weight"]),
                     np.transpose(v, (2, 3, 1, 0)))
            else:
                _set(out, tuple(flax_path + ["Conv2d_0_bias"]), v)
        else:
            # nested submodule (ResBlock/Attn internals): keep structure
            name, conv = _convert_leaf(rest[-1], v)
            _set(out, tuple(flax_path + rest[:-1] + [name]), conv)
    return out


def convert_convtasnet_state_dict(
    sd: Mapping[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Convert a torch ConvTasNet state_dict (sgmse/backbones/convtasnet.py)
    into this framework's flax param tree.

    Name scheme: `TCN.TCN.{i}.*` -> `TCN.TCN_{i}.*`, module params
    flattened (`conv1d.weight` -> `conv1d_w` (W,I,O)); norm weight->gain;
    PReLU weight->alpha; the ConvTranspose1d decoder kernel is spatially
    flipped for the lhs-dilated-conv formulation (see `decoder_w` note in
    `convert_backbone_state_dict`).
    """
    out: Dict[str, Any] = {}
    for key, value in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        v = _to_np(value)
        if key == "encoder.weight":
            _set(out, ("encoder_w",), np.transpose(v, (2, 1, 0)))
            continue
        if key == "decoder.weight":
            _set(out, ("decoder_w",),
                 np.ascontiguousarray(np.transpose(v, (2, 0, 1))[::-1]))
            continue
        parts = key.split(".")
        assert parts[0] == "TCN", f"unexpected ConvTasNet key {key}"
        if parts[1] == "LN":  # cLN/gLN: weight->gain
            name = {"weight": "gain", "bias": "bias"}[parts[2]]
            _set(out, ("TCN", "LN", name), v)
        elif parts[1] == "BN":  # bottleneck Conv1d, flat params
            if parts[2] == "weight":
                _set(out, ("TCN", "BN_w"), np.transpose(v, (2, 1, 0)))
            else:
                _set(out, ("TCN", "BN_b"), v)
        elif parts[1] == "output":  # Sequential(PReLU, Conv1d)
            if parts[2] == "0":
                _set(out, ("TCN", "output_prelu", "alpha"), v)
            elif parts[3] == "weight":
                _set(out, ("TCN", "output_w"), np.transpose(v, (2, 1, 0)))
            else:
                _set(out, ("TCN", "output_b"), v)
        elif parts[1] == "TCN":  # the dilated conv blocks
            blk = ("TCN", f"TCN_{int(parts[2])}")
            sub, leaf = parts[3], parts[4]
            if sub in ("conv1d", "dconv1d", "res_out", "skip_out"):
                if leaf == "weight":
                    _set(out, blk + (f"{sub}_w",), np.transpose(v, (2, 1, 0)))
                else:
                    _set(out, blk + (f"{sub}_b",), v)
            elif sub in ("reg1", "reg2"):
                name = {"weight": "gain", "bias": "bias"}[leaf]
                _set(out, blk + (sub, name), v)
            elif sub in ("nonlinearity1", "nonlinearity2"):
                _set(out, blk + (sub, "alpha"), v)
            else:
                raise ValueError(f"unexpected ConvTasNet key {key}")
        else:
            raise ValueError(f"unexpected ConvTasNet key {key}")
    return out


def convert_gagnet_state_dict(
    sd: Mapping[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Convert a torch GaGNet state_dict (sgmse/backbones/gagnet.py) into
    this framework's flax param tree.

    torch Sequential indices are resolved by role: GateConv2d's inner conv
    (any index, 4D OIHW) -> `*_gate.{w,b}` / flat (H,W,I,O); NormSwitch
    `.norm.weight/bias` -> `{scale,bias}`; PReLU 1-D `.weight` -> `alpha`;
    Conv1d (O,I,W) -> (W,I,O); ConvTranspose2d (I,O,H,W) -> flax
    ConvTranspose kernel (H,W,I,O).
    """
    out: Dict[str, Any] = {}

    def conv1d(v):
        return np.transpose(v, (2, 1, 0))

    def conv2d(v):
        return np.transpose(v, (2, 3, 1, 0))

    for key, value in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        if key.split(".")[-1] in ("running_mean", "running_var",
                                  "num_batches_tracked"):
            # norm_type="BN" running statistics are NOT params — extract
            # them with convert_gagnet_batch_stats and pass the result as
            # a "batch_stats" collection at eval (NormSwitch consumes it)
            continue
        v = _to_np(value)
        p = key.split(".")
        if p[0] == "en":
            if p[1] == "last_conv":
                # Sequential(GateConv2d, NormSwitch, PReLU)
                if p[2] == "0":  # gate conv: en.last_conv.0.conv.{k}.{w,b}
                    _set(out, ("en", "last_gate",
                               "w" if p[-1] == "weight" else "b"),
                         conv2d(v) if v.ndim == 4 else v)
                elif p[2] == "1":
                    _set(out, ("en", "last_norm",
                               "scale" if p[-1] == "weight" else "bias"), v)
                else:
                    _set(out, ("en", "last_prelu", "alpha"), v)
            elif p[1] == "meta_unet_list":
                mu = ("en", f"meta_unet_{int(p[2])}")
                sub = p[3]
                if sub == "in_conv":
                    if p[4] == "0":
                        _set(out, mu + ("in_conv_gate",
                                        "w" if p[-1] == "weight" else "b"),
                             conv2d(v) if v.ndim == 4 else v)
                    elif p[4] == "1":
                        _set(out, mu + ("in_conv_norm",
                                        "scale" if p[-1] == "weight" else "bias"),
                             v)
                    else:
                        _set(out, mu + ("in_conv_prelu", "alpha"), v)
                elif sub == "enco":
                    blk = mu + (f"enco_{int(p[4])}",)
                    if p[5] == "conv":
                        if p[6] == "0":
                            _set(out, blk + ("w" if p[-1] == "weight" else "b",),
                                 conv2d(v) if v.ndim == 4 else v)
                        elif p[6] == "1":
                            _set(out, blk + ("norm",
                                             "scale" if p[-1] == "weight" else "bias"),
                                 v)
                        else:
                            _set(out, blk + ("prelu", "alpha"), v)
                elif sub == "deco":
                    blk = mu + (f"deco_{int(p[4])}",)
                    if p[5] == "deconv":
                        if p[6] == "0":
                            if p[-1] == "weight":
                                # ConvTranspose2d (I,O,H,W) -> flax
                                # ConvTranspose kernel (H,W,I,O) with a
                                # spatial flip (flax does not flip; torch
                                # conv_transpose convolves)
                                _set(out, blk + ("deconv", "kernel"),
                                     np.ascontiguousarray(
                                         np.transpose(v, (2, 3, 0, 1))[::-1, ::-1]
                                     ))
                            else:
                                _set(out, blk + ("deconv", "bias"), v)
                        elif p[6] == "1":
                            _set(out, blk + ("norm",
                                             "scale" if p[-1] == "weight" else "bias"),
                                 v)
                        else:
                            _set(out, blk + ("prelu", "alpha"), v)
                else:
                    raise ValueError(f"unexpected GaGNet key {key}")
            else:
                raise ValueError(f"unexpected GaGNet key {key}")
        elif p[0] == "gags":
            blk = (f"gag_{int(p[1])}", p[2])  # glance_block / gaze_block
            sub = p[3]
            if sub == "in_conv_main":
                _set(out, blk + ("in_gated",
                                 "main_w" if p[-1] == "weight" else "main_b"),
                     conv1d(v) if v.ndim == 3 else v)
            elif sub == "in_conv_gate":
                _set(out, blk + ("in_gated",
                                 "gate_w" if p[-1] == "weight" else "gate_b"),
                     conv1d(v) if v.ndim == 3 else v)
            elif sub in ("linear_g", "linear_r", "linear_i"):
                _set(out, blk + (f"{sub}_w" if p[-1] == "weight" else f"{sub}_b",),
                     conv1d(v) if v.ndim == 3 else v)
            elif sub in ("tcn_g", "tcm_r", "tcm_i", "tcm_ri"):
                # {sub}.{i}.tcns.{j}.<SqueezedTCM param>
                grp = blk + (f"{sub}_{int(p[4])}", f"tcm_{int(p[6])}")
                tail = p[7:]
                if tail[0] == "in_conv":
                    _set(out, grp + ("in_conv_w",), conv1d(v))
                elif tail[0] == "d_conv":
                    if tail[1] == "0":
                        _set(out, grp + ("d_prelu", "alpha"), v)
                    elif tail[1] == "1":
                        _set(out, grp + ("d_norm",
                                         "scale" if tail[-1] == "weight" else "bias"),
                             v)
                    else:  # the dilated Conv1d (index 3, after the pad)
                        _set(out, grp + ("d_conv_w",), conv1d(v))
                elif tail[0] == "out_conv":
                    if tail[1] == "0":
                        _set(out, grp + ("out_prelu", "alpha"), v)
                    elif tail[1] == "1":
                        _set(out, grp + ("out_norm",
                                         "scale" if tail[-1] == "weight" else "bias"),
                             v)
                    else:
                        _set(out, grp + ("out_conv_w",), conv1d(v))
                else:
                    raise ValueError(f"unexpected GaGNet key {key}")
            else:
                raise ValueError(f"unexpected GaGNet key {key}")
        else:
            raise ValueError(f"unexpected GaGNet key {key}")
    return out


def convert_gagnet_batch_stats(
    sd: Mapping[str, Any], prefix: str = ""
) -> Optional[Dict[str, Any]]:
    """Extract torch BatchNorm running statistics from a GaGNet
    (norm_type="BN") state_dict as a flax "batch_stats" collection tree
    {module path -> {mean, var}}, or None for norm_type="IN" checkpoints.

    Each `...running_mean`/`...running_var` key shares its module prefix
    with the norm's `...weight` — the param converter already knows that
    mapping, so the stats key is routed through it with a proxy `weight`
    tail and the produced leaf path (ending in "scale") is rewritten to
    the stats leaf. Eval usage:

        bn = convert_gagnet_batch_stats(ref.state_dict())
        model.apply({"params": p, "batch_stats": bn}, x, t)
    """
    stats: Dict[str, Any] = {}
    found = False
    for key, value in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        tail = key.split(".")[-1]
        if tail not in ("running_mean", "running_var"):
            continue
        found = True
        proxy = convert_gagnet_state_dict(
            {key[: -len(tail)] + "weight": value}
        )
        path = []
        node = proxy
        while isinstance(node, dict):
            (k, node), = node.items()
            path.append(k)
        assert path[-1] == "scale", f"unexpected norm mapping for {key}"
        leaf = "mean" if tail == "running_mean" else "var"
        _set(stats, tuple(path[:-1]) + (leaf,), _to_np(value))
    return stats if found else None


def save_batch_stats(path: str, stats: Mapping[str, Any]):
    """Persist a batch_stats collection tree as JSON ({'a/b/mean': [...]})
    next to a converted checkpoint (side artifact; path convention shared
    with the int8-scales artifact via utils.tensors.flatten_tree)."""
    import json

    from ..utils.tensors import flatten_tree

    flat = {k: np.asarray(v).tolist()
            for k, v in flatten_tree(dict(stats)).items()}
    with open(path, "w") as f:
        json.dump(flat, f)


def load_batch_stats(path: str) -> Dict[str, Any]:
    """Inverse of save_batch_stats."""
    import json

    from ..utils.tensors import unflatten_tree

    with open(path) as f:
        flat = json.load(f)
    return unflatten_tree(
        {k: np.asarray(v, np.float32) for k, v in flat.items()}
    )


def validate_batch_stats(stats: Mapping[str, Any], params: Mapping[str, Any]):
    """Fail fast on a corrupt or mis-pathed running-stats tree.

    A partially populated batch_stats collection would otherwise silently
    mix eval-mode and batch-stat normalization across NormSwitch modules
    (advisor finding, round 2). Checks that every terminal node carries
    BOTH mean and var with matching shapes, and that each node's path
    resolves to a norm parameter node (one holding a per-channel 'scale'
    of the same length) in `params`. Raises ValueError with the offending
    path on mismatch."""

    def resolve(tree, path):
        node = tree
        for k in path:
            if not isinstance(node, Mapping) or k not in node:
                return None
            node = node[k]
        return node

    def walk(node, path):
        if not isinstance(node, Mapping):
            raise ValueError(f"batch_stats: unexpected leaf at {path}")
        if "mean" in node or "var" in node:
            if "mean" not in node or "var" not in node:
                raise ValueError(
                    f"batch_stats at {'/'.join(path)}: needs both mean and "
                    f"var, found {sorted(node)}"
                )
            m, v = np.asarray(node["mean"]), np.asarray(node["var"])
            if m.shape != v.shape:
                raise ValueError(
                    f"batch_stats at {'/'.join(path)}: mean shape {m.shape}"
                    f" != var shape {v.shape}"
                )
            target = resolve(params, path)
            scale = (target or {}).get("scale") if isinstance(
                target, Mapping) else None
            if scale is None or np.asarray(scale).shape != m.shape:
                raise ValueError(
                    f"batch_stats path {'/'.join(path)} does not resolve "
                    "to a norm parameter node with a matching 'scale' in "
                    "params — stats tree is mis-pathed for this model"
                )
            return
        for k, v in node.items():
            walk(v, path + (k,))

    walk(dict(stats), ())


def _iter_trainable_keys(sd: Mapping[str, Any]) -> Iterable[str]:
    """state_dict keys in order, skipping non-trainable entries: frozen
    params (GFP W is requires_grad=False in the reference and thus absent
    from torch-ema's shadow list) and BatchNorm buffers
    (running_mean/running_var/num_batches_tracked — buffers, not
    parameters, so torch-ema never shadows them; GaGNet norm_type='BN'
    checkpoints carry them)."""
    for key in sd:
        tail = key.split(".")[-1]
        if tail == "W" and "NIN" not in key:
            # GaussianFourierProjection.W (frozen)
            continue
        if tail in ("running_mean", "running_var", "num_batches_tracked"):
            continue
        yield key


_BACKBONE_CONVERTERS = {
    "ncsnpp": "convert_backbone_state_dict",
    "gagnet": "convert_gagnet_state_dict",
    "convtasnet": "convert_convtasnet_state_dict",
}


def _backbone_converter(backbone: str):
    for stem, fn_name in _BACKBONE_CONVERTERS.items():
        if backbone.replace("-", "").startswith(stem.replace("-", "")) or (
            stem == "ncsnpp" and "ncsnpp" in backbone
        ):
            return globals()[fn_name]
    raise ValueError(f"no converter for backbone {backbone!r}")


def convert_lightning_checkpoint(
    ckpt: Mapping[str, Any], prefix: str = "dnn.", backbone: str = "ncsnpp"
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a full Lightning checkpoint dict into (params, ema_params).

    Args:
        ckpt: loaded checkpoint (torch.load(..., map_location='cpu')):
            expects 'state_dict' and optionally 'ema' (torch-ema format with
            'shadow_params' positional list).
        prefix: backbone prefix inside the state_dict ('dnn.' for Score/
            Discriminative models; 'denoiser_net.' / 'score_net.' for StoRM).
        backbone: registry name routing to the right converter
            (ncsnpp*/ae-ncsnpp -> NCSN++, gagnet, convtasnet).
    """
    convert = _backbone_converter(backbone)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    params = convert(sd, prefix=prefix)

    ema = ckpt.get("ema")
    if not ema or "shadow_params" not in ema:
        return params, params
    shadow = list(ema["shadow_params"])
    ema_sd = dict(sd)
    trainable = [k for k in _iter_trainable_keys(sd) if k.startswith(prefix)]
    # torch-ema shadows ALL trainable params of the Lightning module in
    # parameters() order == state_dict order (python 3.7+ dicts);
    # select the slice belonging to this prefix
    all_trainable = list(_iter_trainable_keys(sd))
    if len(shadow) != len(all_trainable):
        raise ValueError(
            f"EMA shadow length {len(shadow)} != trainable params "
            f"{len(all_trainable)}"
        )
    for k, s in zip(all_trainable, shadow):
        ema_sd[k] = s
    ema_params = convert(ema_sd, prefix=prefix)
    return params, ema_params


def load_reference_checkpoint(path: str, mode: str = "storm", ckpt=None):
    """Load a reference Lightning .ckpt from disk into flax param trees.

    Args:
        path: .ckpt file (torch.save zipfile).
        mode: 'storm' (denoiser_net.+score_net.), 'score-only' or
            'denoiser-only' (dnn.).
        ckpt: optionally the already-torch.load'ed checkpoint dict (a
            multi-hundred-MB deserialization callers may want to do once).

    Returns:
        (params, ema_params, hparams): params trees shaped for this
        framework's models ({'denoiser', 'score'} dict for storm), plus the
        checkpoint's hyper_parameters dict for model reconstruction.
    """
    import torch

    if ckpt is None:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    hparams = dict(ckpt.get("hyper_parameters", {}))
    if mode == "storm":
        p_d, e_d = convert_lightning_checkpoint(
            ckpt, prefix="denoiser_net.",
            backbone=hparams.get("backbone_denoiser", "ncsnpp"))
        p_s, e_s = convert_lightning_checkpoint(
            ckpt, prefix="score_net.",
            backbone=hparams.get("backbone_score", "ncsnpp"))
        params = {"denoiser": p_d, "score": p_s}
        ema = {"denoiser": e_d, "score": e_s}
    else:
        params, ema = convert_lightning_checkpoint(
            ckpt, prefix="dnn.", backbone=hparams.get("backbone", "ncsnpp"))
    return params, ema, hparams


# ---------------------------------------------------------------------------
# Inverse direction (flax -> torch layout), used for round-trip testing and
# for exporting checkpoints back to the reference format.
# ---------------------------------------------------------------------------

def flax_to_torch_backbone(params: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a flax NCSN++ param tree into torch state_dict naming."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(v, path + [k])
            return
        v = np.asarray(node)
        parts = list(path)
        if parts == ["encoder_w"]:
            out[prefix + "encoder.weight"] = np.transpose(v, (2, 1, 0))
            return
        if parts == ["decoder_w"]:
            out[prefix + "decoder.weight"] = np.ascontiguousarray(
                np.transpose(v[::-1], (1, 2, 0))
            )
            return
        if parts[0].startswith("m") and parts[0][1:].isdigit():
            parts[0] = f"all_modules.{parts[0][1:]}"
        leaf = parts[-1]
        if leaf == "kernel":
            if v.ndim == 4:
                v = np.transpose(v, (3, 2, 0, 1))
            elif v.ndim == 3:
                v = np.transpose(v, (2, 1, 0))
            else:
                v = v.T
            parts[-1] = "weight"
        elif leaf == "scale":
            parts[-1] = "weight"
        elif leaf == "Conv2d_0_weight":
            v = np.transpose(v, (3, 2, 0, 1))
            parts[-1] = "Conv2d_0.weight"
        elif leaf == "Conv2d_0_bias":
            parts[-1] = "Conv2d_0.bias"
        out[prefix + ".".join(parts)] = v

    rec(params, [])
    return out

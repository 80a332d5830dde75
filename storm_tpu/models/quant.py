"""Post-training int8 calibration for NCSN++ serving (TPU MXU feature).

No upstream analogue — the reference serves fp32 on CUDA. This module turns
a trained (or converted) model into an int8-serving one:

1. **Collect** per-conv input max-abs statistics (`quant_stats` collection,
   recorded by nn/qconv.py `QuantizableConv`) by running the model on real
   inputs. For score networks the input distribution depends on the
   diffusion time, so statistics are gathered along an actual bf16 sampling
   trajectory (prior state at t=T through the final step at t=eps), not just
   at one t.
2. **Convert** the stats into per-conv activation scales (`a_scale =
   amax / 127`), keeping only convs whose input AND output channel counts
   are >= `min_channels` — small-channel convs (the quality-critical
   input/output projections, temb paths) gain nothing on the MXU and stay
   bf16.

Usage (serving):

    quant = calibrate_storm(model, params, y_batch, key, N=30)
    enhance = model.make_enhance(..., quant=quant)

The scales are tiny scalar pytrees mirroring the params structure; they can
be pickled alongside a checkpoint or re-derived in seconds at load time.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_scales(path: str, quant: Optional[Dict], meta: Optional[Dict] = None):
    """Persist a calibrated scale tree as JSON (tiny: one float per conv).

    Serving then skips the calibration pass entirely — scales are
    checkpoint artifacts, not per-process state. Path convention shared
    with the BatchNorm-stats artifact (utils.tensors.flatten_tree).

    `meta` records the calibration configuration (params source, N,
    min_channels, calibration length, ...); `load_scales(expect_meta=...)`
    recalibrates on mismatch instead of silently reusing stale scales.
    The write is atomic (temp file + os.replace) so a concurrent serving
    process never observes partial JSON."""
    import json
    import os

    from ..utils.tensors import flatten_tree

    flat = {k: float(np.asarray(v))
            for k, v in flatten_tree(quant or {}).items()}
    payload = {"_meta": dict(meta or {}), "scales": flat}
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_scales_with_meta(path: str):
    """Read a scale cache: returns (quant_tree_or_None, meta_or_None).

    quant is None when the file records that zero convs qualified (serve
    bf16 — still a valid cached result). meta is None for files written by
    the pre-metadata format (a bare flat tree); callers comparing against
    an expected calibration config should treat that as a mismatch."""
    import json

    from ..utils.tensors import unflatten_tree

    with open(path) as f:
        payload = json.load(f)
    if "_meta" in payload:
        meta, flat = payload.get("_meta", {}), payload.get("scales", {})
    else:  # legacy format: the whole file is the flat scale tree
        meta, flat = None, payload
    if not flat:
        return None, meta
    quant = unflatten_tree(
        {k: jnp.asarray(v, jnp.float32) for k, v in flat.items()}
    )
    return quant, meta


def load_scales(path: str) -> Optional[Dict]:
    """Inverse of save_scales. Returns None if the file holds no scales."""
    return load_scales_with_meta(path)[0]


def merge_stats(a: Optional[Dict], b: Optional[Dict]):
    """Elementwise max-merge of two `quant_stats` trees (same structure)."""
    if a is None:
        return b
    if b is None:
        return a
    return jax.tree_util.tree_map(jnp.maximum, a, b)


def scales_from_stats(
    stats: Optional[Dict],
    params: Dict,
    min_channels: int = 128,
    margin: float = 1.0,
) -> Optional[Dict]:
    """Convert an amax stats tree into an activation-scale tree.

    Walks the stats tree; each `{"amax": x}` node corresponds to a
    `QuantizableConv` whose kernel lives at the same path in `params`.
    Convs with in/out channels < `min_channels` are dropped (kept bf16).
    Returns None if nothing qualifies (then serving just stays bf16).
    """
    if stats is None:
        return None

    def walk(st_node, p_node):
        if not isinstance(st_node, dict):
            return None
        if "amax" in st_node:
            kernel = p_node.get("kernel") if isinstance(p_node, dict) else None
            if kernel is None:
                return None
            in_ch, out_ch = kernel.shape[-2], kernel.shape[-1]
            if in_ch < min_channels or out_ch < min_channels:
                return None
            amax = jnp.asarray(st_node["amax"], jnp.float32)
            return {"a_scale": jnp.maximum(amax * margin, 1e-12) / 127.0}
        out = {}
        for k, v in st_node.items():
            sub = walk(v, p_node.get(k, {}) if isinstance(p_node, dict) else {})
            if sub:
                out[k] = sub
        return out or None

    return walk(stats, params)


def num_quantized_convs(quant: Optional[Dict]) -> int:
    """Count of convs that will take the int8 path under this scale tree."""
    if quant is None:
        return 0
    return sum(
        1 for path, _ in jax.tree_util.tree_leaves_with_path(quant)
    )


def _score_trajectory_stats(
    model, params, Y, Y_denoised, cond, key, N: int, num_probe: int,
    score_stats_fn,
):
    """Gather score-net conv stats along a real bf16 sampling trajectory.

    Runs the production `pc_sample` with `intermediate=True` to get the
    per-step means, then probes the score net (with stats collection) at
    `num_probe` states spread over [T, eps], plus the prior state at t=T —
    covering the full range of diffusion-state magnitudes the quantized
    net will see.
    """
    from ..sampling.samplers import pc_sample

    sde_input = Y_denoised if Y_denoised is not None else Y
    kprior, ksamp = jax.random.split(key)

    def score_fn(x, t, y_sde):
        del y_sde
        return score_stats_fn(x, t, collect=False)

    @jax.jit
    def traj_fn(k):
        _, traj, _ = pc_sample(
            k, model.sde, score_fn, sde_input,
            predictor="reverse_diffusion", corrector="none", N=N,
            denoise=True, eps=model.t_eps, intermediate=True,
        )
        return traj

    traj = traj_fn(ksamp)
    timesteps = np.linspace(model.sde.T, model.t_eps, N, dtype=np.float32)

    stats = None
    B = sde_input.shape[0]
    # prior state at t=T (largest-magnitude input the net ever sees)
    xT = model.sde.prior_sampling(kprior, sde_input)
    probes = [(xT, np.float32(model.sde.T))]
    for i in np.unique(np.linspace(0, N - 1, num_probe).astype(int)):
        probes.append((traj[i], timesteps[i]))
    # jit once — every probe shares the same shapes, so the stats-collecting
    # apply compiles a single executable instead of once per probe
    probe_fn = jax.jit(lambda x_i, vec_t: score_stats_fn(x_i, vec_t, True)[1])
    for x_i, t_i in probes:
        vec_t = jnp.full((B,), t_i, jnp.float32)
        stats = merge_stats(stats, probe_fn(x_i, vec_t))
    return stats


def calibrate_storm(
    model, params, y, key, N: int = 30, num_probe: int = 8,
    min_channels: int = 128, margin: float = 1.0,
) -> Dict[str, Any]:
    """Calibrate int8 activation scales for a StochasticRegenerationModel.

    y: waveform batch (B, T) representative of serving data (a single
    enhancement batch is enough — post-GroupNorm activations make the
    scales insensitive to the exact content).

    Returns {"denoiser": tree|None, "score": tree|None} for
    `make_enhance(quant=...)`.
    """
    from .base import normalize_wav, prepare_spec

    y_n, _ = normalize_wav(jnp.asarray(y, jnp.float32))
    Y, _ = prepare_spec(y_n, model.stft_config, model.transform)

    stats_d = None
    Y_denoised = None
    if model.denoiser_net is not None:
        Y_denoised, stats_d = jax.jit(
            lambda Y_: model.forward_denoiser(params, Y_, collect_stats=True)
        )(Y)

    stats_s = None
    if model.score_net is not None:
        cond = model._conditioning(Y, Y_denoised)

        def score_stats_fn(x, t, collect):
            if collect:
                return model.forward_score(
                    params, x, t, cond, collect_stats=True
                )
            return model.forward_score(params, x, t, cond)

        stats_s = _score_trajectory_stats(
            model, params, Y, Y_denoised, cond, key, N, num_probe,
            score_stats_fn,
        )

    return {
        "denoiser": scales_from_stats(
            stats_d, params.get("denoiser", {}), min_channels, margin
        ),
        "score": scales_from_stats(
            stats_s, params.get("score", {}), min_channels, margin
        ),
    }


def calibrate_score_model(
    model, params, y, key, N: int = 50, num_probe: int = 8,
    min_channels: int = 128, margin: float = 1.0,
) -> Optional[Dict]:
    """Calibrate int8 activation scales for a ScoreModel (SGMSE+).

    Returns a scale tree for `make_enhance(quant=...)` (or None)."""
    from .base import normalize_wav, prepare_spec

    y_n, _ = normalize_wav(jnp.asarray(y, jnp.float32))
    Y, _ = prepare_spec(y_n, model.stft_config, model.transform)

    def score_stats_fn(x, t, collect):
        if collect:
            return model.score_apply(params, x, t, Y, collect_stats=True)
        return model.score_apply(params, x, t, Y)

    stats = _score_trajectory_stats(
        model, params, Y, None, None, key, N, num_probe, score_stats_fn,
    )
    return scales_from_stats(stats, params, min_channels, margin)


def calibrate_distill(
    model, params, y, key, num_probe: int = 4,
    min_channels: int = 128, margin: float = 1.0,
) -> Dict[str, Any]:
    """Calibrate int8 activation scales for one-step distilled serving.

    Unlike the trajectory calibration above, the distilled student sees
    exactly ONE diffusion state per request: the prior state
    x_T = D(y) + sigma(T) z at t=T (models/distill.py make_enhance). So
    calibration probes the denoiser forward once and the student score
    evaluation at `num_probe` prior draws (fresh z each), which covers the
    entire input distribution the quantized nets will ever see.

    `model`: a DistilledModel. Returns {"denoiser": tree|None,
    "score": tree|None} for `DistilledModel.make_enhance(quant=...)`.
    """
    from ..signal import cplx
    from ..utils.tensors import right_pad_dims
    from .base import normalize_wav, prepare_spec

    storm = model.storm
    y_n, _ = normalize_wav(jnp.asarray(y, jnp.float32))
    Y, _ = prepare_spec(y_n, storm.stft_config, storm.transform)

    Y_denoised, stats_d = jax.jit(
        lambda Y_: storm.forward_denoiser(params, Y_, collect_stats=True)
    )(Y)

    B = Y.shape[0]
    t_T = jnp.full((B,), storm.sde.T, jnp.float32)
    std_T = storm.sde.marginal_prob(Y, t_T, Y_denoised)[1]
    cond = storm._conditioning(Y, Y_denoised)

    probe_fn = jax.jit(lambda x_T: storm.forward_score(
        params, x_T, t_T, cond, collect_stats=True)[1])
    stats_s = None
    for k in jax.random.split(key, max(1, num_probe)):
        z = cplx.complex_normal(k, Y.shape[:-1])
        x_T = Y_denoised + right_pad_dims(std_T, Y) * z
        stats_s = merge_stats(stats_s, probe_fn(x_T))

    return {
        "denoiser": scales_from_stats(
            stats_d, params.get("denoiser", {}), min_channels, margin
        ),
        "score": scales_from_stats(
            stats_s, params.get("score", {}), min_channels, margin
        ),
    }


def calibrate_discriminative(
    model, params, y, min_channels: int = 128, margin: float = 1.0,
) -> Optional[Dict]:
    """Calibrate int8 activation scales for a DiscriminativeModel."""
    from .base import normalize_wav, prepare_spec

    y_n, _ = normalize_wav(jnp.asarray(y, jnp.float32))
    Y, _ = prepare_spec(y_n, model.stft_config, model.transform)
    _, stats = jax.jit(
        lambda Y_: model.apply(params, Y_, collect_stats=True)
    )(Y)
    return scales_from_stats(stats, params, min_channels, margin)

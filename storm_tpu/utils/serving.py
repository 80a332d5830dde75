"""Shared serving-CLI helpers (enhancement.py / evaluate.py).

int8 PTQ scale management: calibrate once on representative files, persist
the scales (with the calibration configuration) next to the checkpoint,
and reuse them on later runs with the same configuration. No upstream
analogue — the reference serves fp32 on CUDA (sgmse/model.py:720-767).
"""
from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np


def n_quantized(quant) -> int:
    """Total quantized-conv count over a possibly-two-net scale tree."""
    from ..models import quant as quant_mod

    if isinstance(quant, dict) and ("denoiser" in quant or "score" in quant):
        return sum(quant_mod.num_quantized_convs(v) for v in quant.values())
    return quant_mod.num_quantized_convs(quant)


def calibrate_or_load_scales(
    model,
    params,
    mode: str,
    ckpt_dir: str,
    calib_loader: Callable[[], List[np.ndarray]],
    key,
    *,
    N: int,
    min_channels: int,
    stream_chunk_s: float = 0.0,
    params_source: str = "ema",
    model_sr: int = 16000,
):
    """Return an int8 activation-scale tree for serving (or None = bf16).

    Scales are checkpoint artifacts: the first run calibrates on the files
    from `calib_loader()` and persists `<ckpt>/quant_int8_scales.json`
    together with the calibration configuration; later runs with a
    matching configuration (params source, coverage threshold, mode,
    streaming slice length) reuse them, and a mismatch recalibrates
    instead of silently serving stale scales (advisor fix, round 2).
    """
    import jax

    from ..models import quant as quant_mod

    calib_meta = {
        "params": params_source,
        "min_channels": min_channels,
        "mode": mode,
        "stream_chunk_s": stream_chunk_s,
        # effective trajectory length the scales were integrated over
        # (capped at 10 in calibrate_*): scales from an --N 2 run must not
        # be silently reused by an --N 50 run (advisor fix, round 3)
        "calib_N": min(N, 10) if mode in ("storm", "score-only") else 0,
    }
    cache = os.path.join(ckpt_dir, "quant_int8_scales.json")
    if os.path.exists(cache):
        quant, meta = quant_mod.load_scales_with_meta(cache)
        if meta is not None and all(
            meta.get(k) == v for k, v in calib_meta.items()
        ):
            print(f"int8 scales loaded from {cache} "
                  f"({n_quantized(quant)} convs quantized; 0 means every "
                  f"conv is below the {min_channels}-channel threshold and "
                  "serving is bf16)")
            return quant
        print("int8 scale cache config mismatch — recalibrating")

    # calibrate activation scales on representative files; the scales are
    # per-conv scalars, shared by every compile bucket. In streaming mode
    # the files may be arbitrarily long — calibrate on chunk-length
    # slices, or calibration itself would run the whole-utterance program
    # the streaming path exists to avoid
    calib = calib_loader()
    L = max(y.shape[-1] for y in calib)
    if stream_chunk_s > 0:
        L = min(L, int(stream_chunk_s * model_sr))
        calib = [y[..., :L] for y in calib]
    L = -(-L // (64 * model.stft_config.hop_length)) * (
        64 * model.stft_config.hop_length)
    y_cal = np.stack([
        np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, L - y.shape[-1])])
        for y in calib
    ]).astype(np.float32)
    if mode == "storm":
        quant = quant_mod.calibrate_storm(
            model, params, y_cal, key, N=min(N, 10),
            min_channels=min_channels)
    elif mode == "score-only":
        quant = quant_mod.calibrate_score_model(
            model, params, y_cal, key, N=min(N, 10),
            min_channels=min_channels)
    elif mode == "distill":
        # one-step student: calibration probes the single diffusion state
        # it serves at (the prior at t=T), not a trajectory
        quant = quant_mod.calibrate_distill(
            model, params, y_cal, key, min_channels=min_channels)
    else:
        quant = quant_mod.calibrate_discriminative(
            model, params, y_cal, min_channels=min_channels)
    try:
        # informational extras (not part of the reuse-match key set)
        calib_meta = dict(calib_meta, calib_len=int(L),
                          calib_files=int(y_cal.shape[0]))
        quant_mod.save_scales(cache, quant, meta=calib_meta)
        print(f"int8 calibration done ({n_quantized(quant)} convs "
              f"quantized; scales saved to {cache})")
    except OSError as e:  # read-only checkpoint dir: still serve
        print(f"int8 calibration done (scales not saved: {e})")
    return quant


def load_gagnet_batch_stats(ckpt_dir: str, params) -> Optional[dict]:
    """GaGNet norm_type="BN" running stats (side artifact written by
    compat/convert.py) — eval-mode BatchNorm semantics for converted
    checkpoints. Validates the tree against the model's norm parameters
    before use (advisor fix)."""
    bn_path = os.path.join(ckpt_dir, "gagnet_batch_stats.json")
    if not os.path.exists(bn_path):
        return None
    from ..compat.torch_ckpt import load_batch_stats, validate_batch_stats

    batch_stats = load_batch_stats(bn_path)
    validate_batch_stats(batch_stats, params)
    print(f"BatchNorm running stats loaded from {bn_path}")
    return batch_stats

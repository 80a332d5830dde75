"""Generate a synthetic speech-like enhancement corpus (wsj0 layout).

No real speech corpora are reachable in this environment, so quality
experiments (BASELINE.md) use synthetic "syllable-burst" utterances:
harmonic pulse trains with per-syllable formant filters and pitch contours,
amplitude-modulated into syllables — enough spectro-temporal structure for
ESTOI/SI-SDR to behave like on speech. Noisy mixtures add white+pink noise
at a configurable SNR range (reference mixing convention:
preprocessing/create_data.py:196-213).

    python scripts/make_synth_corpus.py --root /tmp/corpus --n_train 512

Layout: <root>/{tr,cv,tt}/{clean,noisy}/u****.wav  (wsj0 format).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_tpu.data.audio import save_wav  # noqa: E402

SR = 16000


def _formant_filter(x, rng, sr=SR):
    """2-3 random resonators (speech formant range)."""
    from scipy.signal import lfilter

    out = np.zeros_like(x)
    for _ in range(int(rng.integers(2, 4))):
        f0 = rng.uniform(300, 3200)
        bw = rng.uniform(80, 300)
        r = np.exp(-np.pi * bw / sr)
        theta = 2 * np.pi * f0 / sr
        b, a = [1 - r], [1.0, -2 * r * np.cos(theta), r * r]
        out += lfilter(b, a, x)
    return out


def make_utterance(rng, dur_s):
    """Syllable bursts: voiced pulse trains through formant filters with a
    pitch contour, plus occasional unvoiced (noise) syllables."""
    n = int(dur_s * SR)
    x = np.zeros(n, np.float64)
    t = 0
    while t < n:
        syl = int(rng.uniform(0.08, 0.25) * SR)  # syllable length
        gap = int(rng.uniform(0.02, 0.12) * SR)
        seg = np.zeros(syl)
        if rng.uniform() < 0.8:  # voiced
            f0 = rng.uniform(80, 260)
            drift = rng.uniform(-0.3, 0.3)
            phase = np.cumsum(f0 * (1 + drift * np.linspace(0, 1, syl)) / SR)
            # impulse train at pitch marks
            pulses = np.diff(np.floor(phase), prepend=0.0) > 0
            seg[pulses] = 1.0
        else:  # unvoiced
            seg = rng.standard_normal(syl) * 0.3
        seg = _formant_filter(seg, rng)
        env = np.hanning(2 * syl)[:syl] ** 0.5  # attack/decay
        seg *= env
        end = min(t + syl, n)
        x[t:end] += seg[: end - t]
        t += syl + gap
    peak = np.abs(x).max()
    return (0.3 * x / peak if peak > 0 else x).astype(np.float32)


def make_noise(rng, n):
    """White + pink mixture."""
    w = rng.standard_normal(n)
    # pink via cumulative filter (1/f-ish): leaky integrator
    p = np.zeros(n)
    acc = 0.0
    a = 0.98
    for_blocks = rng.standard_normal(n)
    # vectorized leaky integration via lfilter
    from scipy.signal import lfilter

    p = lfilter([1.0], [1.0, -a], for_blocks)
    p /= np.abs(p).std() + 1e-9
    mix = rng.uniform(0.3, 0.7)
    noise = mix * w + (1 - mix) * p
    return (noise / (noise.std() + 1e-9)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n_train", type=int, default=512)
    ap.add_argument("--n_valid", type=int, default=32)
    ap.add_argument("--n_test", type=int, default=32)
    ap.add_argument("--snr_lo", type=float, default=0.0)
    ap.add_argument("--snr_hi", type=float, default=8.0)
    ap.add_argument("--dur_lo", type=float, default=2.2)
    ap.add_argument("--dur_hi", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    for subset, count in (("tr", args.n_train), ("cv", args.n_valid),
                          ("tt", args.n_test)):
        for kind in ("clean", "noisy"):
            os.makedirs(os.path.join(args.root, subset, kind), exist_ok=True)
        for i in range(count):
            dur = rng.uniform(args.dur_lo, args.dur_hi)
            x = make_utterance(rng, dur)
            noise = make_noise(rng, len(x))
            snr = rng.uniform(args.snr_lo, args.snr_hi)
            # scale noise for target SNR over active speech power
            px = np.mean(x**2)
            pn = np.mean(noise**2)
            noise *= np.sqrt(px / (pn * 10 ** (snr / 10)))
            y = x + noise
            peak = max(np.abs(y).max(), 1.0)  # avoid clipping
            save_wav(os.path.join(args.root, subset, "clean", f"u{i:04d}.wav"),
                     x / peak)
            save_wav(os.path.join(args.root, subset, "noisy", f"u{i:04d}.wav"),
                     y / peak)
        print(f"{subset}: {count} pairs")


if __name__ == "__main__":
    main()

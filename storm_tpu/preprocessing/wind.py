"""Wind-noise synthesis (numpy).

The reference drives an external WindNoiseGenerator (Mirabilii et al.,
IWAENC 2022) that is "not distributed" with the repo
(preprocessing/simulate_wind_noise.py:4-7, README.md:66-67). This module
provides a native generator with the same control surface (sample rate,
duration, gustiness, wind-speed profile) following the paper's recipe:
low-frequency-dominated turbulence noise whose level and spectral tilt
follow a slowly varying wind-speed profile, with gust modulation.
"""
from __future__ import annotations

import numpy as np
from scipy.signal import lfilter


def make_wind_profile(
    rng: np.random.Generator,
    gustiness: float,
    magnitude_range=(200.0, 500.0),
    transition_threshold: float = 100.0,
) -> list[float]:
    """Random wind-speed profile with bounded transitions
    (simulate_wind_noise.py:37-48)."""
    n_points = max(1, int(1.5 * gustiness))
    profile = [float(rng.uniform(*magnitude_range))]
    while len(profile) < n_points:
        while True:
            p = float(rng.uniform(*magnitude_range))
            if abs(p - profile[-1]) < transition_threshold:
                break
        profile.append(p)
    return profile


def generate_wind_noise(
    duration: float = 8.0,
    fs: int = 16000,
    gustiness: float = 5.0,
    wind_profile=None,
    seed: int = 0,
):
    """Generate (signal, wind_profile_per_sample).

    Model: white noise -> 1/f^2-ish turbulence shaping (one-pole lowpass
    near 40 Hz plus a gentler broadband slope), amplitude and cutoff driven
    by the interpolated wind-speed profile; gusts add coherent low-rate
    amplitude modulation. Output normalized to 0.95 peak.
    """
    rng = np.random.default_rng(seed)
    n = int(duration * fs)
    if wind_profile is None:
        wind_profile = make_wind_profile(rng, gustiness)
    profile = np.asarray(wind_profile, np.float64)
    # smooth piecewise-linear interpolation of the profile over time
    knots = np.linspace(0, n - 1, max(len(profile), 2))
    vals = profile if len(profile) >= 2 else np.repeat(profile, 2)
    speed = np.interp(np.arange(n), knots, vals)  # arbitrary speed units
    speed_n = speed / (np.max(speed) + 1e-12)

    white = rng.standard_normal(n)
    # turbulence core: strong low-frequency emphasis (two cascaded
    # one-poles ~ 12 dB/oct above the cutoff)
    fc = 40.0  # Hz
    a = np.exp(-2.0 * np.pi * fc / fs)
    turb = lfilter([1.0 - a], [1.0, -a], white)
    turb = lfilter([1.0 - a], [1.0, -a], turb)
    # broadband hiss that grows faster than linearly with speed
    hiss = lfilter([1.0 - 0.7], [1.0, -0.7], rng.standard_normal(n))

    # gust modulation: low-rate (0.5-2 Hz) coherent fluctuations scaled by
    # gustiness
    g_rate = 0.5 + 1.5 * rng.random()
    g_phase = 2 * np.pi * rng.random()
    t = np.arange(n) / fs
    gust = 1.0 + 0.3 * np.tanh(gustiness / 5.0) * np.sin(
        2 * np.pi * g_rate * t + g_phase
    )

    # level follows ~ speed^3 for turbulence, speed^5 for hiss (speed-
    # dependent spectral tilt)
    sig = speed_n**3 * gust * turb + 0.05 * speed_n**5 * hiss
    peak = np.max(np.abs(sig)) + 1e-12
    return 0.95 * sig / peak, speed


class WindNoiseGenerator:
    """API-compatible stand-in for the Mirabilii et al. generator used by
    the reference driver (simulate_wind_noise.py:52-59)."""

    def __init__(self, fs: int, duration: float, generate: bool = True,
                 wind_profile=None, gustiness: float = 5.0,
                 start_seed: int = 0):
        self.fs = fs
        self.duration = duration
        self.wind_profile = wind_profile
        self.gustiness = gustiness
        self.seed = start_seed

    def generate_wind_noise(self):
        return generate_wind_noise(
            duration=self.duration, fs=self.fs, gustiness=self.gustiness,
            wind_profile=self.wind_profile, seed=self.seed,
        )

    def save_signal(self, signal, filename: str, num_ch: int = 1,
                    fs: int | None = None):
        from ..data.audio import save_wav

        del num_ch
        save_wav(filename, np.asarray(signal), fs or self.fs)

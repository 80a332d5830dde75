"""Tests for the preprocessing layer: room acoustics, compressor, wind,
and the dataset-creation CLIs end-to-end."""
import os
import subprocess
import sys

import numpy as np
import pytest

from storm_tpu.preprocessing import (
    generate_wind_noise,
    hard_clip,
    inverse_sabine,
    make_wind_profile,
    measure_rt60,
    nonlinear_mix,
    shoebox_rir,
    sidechain_compress,
    simulate_dry,
    simulate_shoebox,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inverse_sabine():
    a, order = inverse_sabine(0.5, [6.0, 5.0, 3.0])
    assert 0 < a < 1
    assert order >= 1
    # longer T60 -> less absorption
    a2, _ = inverse_sabine(1.0, [6.0, 5.0, 3.0])
    assert a2 < a


def test_shoebox_rir_direct_path():
    """max_order=0 = direct path only: single sinc at distance delay."""
    dim = [6.0, 5.0, 3.0]
    src, mic = [2.0, 2.0, 1.5], [4.0, 3.0, 1.5]
    rir = shoebox_rir(dim, src, mic, 0.99, 0, fs=16000)
    dist = np.linalg.norm(np.array(src) - np.array(mic))
    expect_delay = dist / 343.0 * 16000
    peak = np.argmax(np.abs(rir))
    assert abs(peak - expect_delay) < 2
    # amplitude ~ 1/(4 pi d)
    assert abs(np.max(np.abs(rir)) - 1 / (4 * np.pi * dist)) < 0.2 / (4 * np.pi * dist)


def test_rt60_of_simulated_room():
    """Measured RT60 of the hybrid RIR tracks the target within ~40%."""
    rng = np.random.default_rng(0)
    dim = [7.0, 6.0, 3.0]
    for t60 in (0.4, 0.8):
        _, rir = simulate_shoebox(
            np.zeros(10), dim, [2.0, 2.0, 1.5], [5.0, 4.0, 1.5],
            t60, fs=16000, rng=rng,
        )
        meas = measure_rt60(rir, fs=16000)
        assert 0.5 * t60 < meas < 1.6 * t60, f"target {t60}, measured {meas}"


def test_simulate_rooms_on_speech():
    rng = np.random.default_rng(1)
    # bandlimited test signal (fractional-delay sinc decorrelates white
    # noise at integer lags, which would make the correlation check moot)
    t = np.arange(8000) / 16000
    x = 0.1 * np.sin(2 * np.pi * (300 + 200 * t) * t)
    dim = [6.0, 5.0, 3.0]
    wet, rir = simulate_shoebox(x, dim, [2, 2, 1.5], [4, 3, 1.5], 0.5, rng=rng)
    assert len(wet) >= len(x)
    assert np.isfinite(wet).all()
    dry, _ = simulate_dry(x, dim, [2, 2, 1.5], [4, 3, 1.5])
    # dry room output is a scaled, delayed copy: high correlation
    lag = np.argmax(np.correlate(dry, x, "full")) - len(x) + 1
    aligned = dry[lag : lag + len(x)]
    c = np.corrcoef(aligned, x[: len(aligned)])[0, 1]
    assert c > 0.95


def test_sidechain_compressor_ducks_speech():
    sr = 16000
    t = np.arange(sr) / sr
    speech = 0.5 * np.sin(2 * np.pi * 300 * t)
    noise = np.zeros(sr)
    noise[sr // 2 :] = 0.8  # loud sidechain in second half
    out = sidechain_compress(speech, noise, sr=sr, threshold=0.1, ratio=8.0,
                             attack=5.0, release=100.0)
    rms_first = np.sqrt(np.mean(out[: sr // 4] ** 2))
    rms_second = np.sqrt(np.mean(out[-sr // 4 :] ** 2))
    assert rms_second < 0.5 * rms_first  # ducked when sidechain is loud
    # ratio=1 -> no compression
    out1 = sidechain_compress(speech, noise, sr=sr, ratio=1.0)
    np.testing.assert_allclose(out1, speech[: len(out1)], atol=1e-9)


def test_nonlinear_mix_and_clip():
    rng = np.random.default_rng(2)
    speech = rng.standard_normal(8000) * 0.3
    noise = rng.standard_normal(8000) * 0.2
    mix = nonlinear_mix(speech, noise)
    assert mix.shape == (8000,)
    clipped = hard_clip(mix, 0.5)
    assert clipped.max() <= 0.5 * mix.max() + 1e-12
    assert clipped.min() >= 0.5 * mix.min() - 1e-12


def test_wind_noise_generator():
    sig, speed = generate_wind_noise(duration=2.0, fs=16000, gustiness=5.0,
                                     seed=3)
    assert sig.shape == (32000,)
    assert np.abs(sig).max() <= 0.96
    # energy concentrated at low frequencies
    spec = np.abs(np.fft.rfft(sig))
    low = np.sum(spec[: len(spec) // 16] ** 2)
    high = np.sum(spec[len(spec) // 2 :] ** 2)
    assert low > 10 * high
    profile = make_wind_profile(np.random.default_rng(0), 10.0)
    assert len(profile) == 15
    diffs = np.abs(np.diff(profile))
    assert (diffs < 100.0).all()


@pytest.fixture
def speech_tree(tmp_path):
    from storm_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    for split in ("cv", "tr", "tt"):
        os.makedirs(tmp_path / "speech" / split)
        for i in range(2):
            n = int(rng.integers(8000, 16000))
            x = 0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
            save_wav(tmp_path / "speech" / split / f"s{i}.wav", x)
    # noise dir (wham-style flat wavs)
    os.makedirs(tmp_path / "noise")
    for i in range(3):
        save_wav(tmp_path / "noise" / f"n{i}.wav",
                 0.1 * rng.standard_normal(20000))
    return tmp_path


def test_create_data_cli_derev_enh(speech_tree):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "preprocessing", "create_data.py"),
         "--task", "derev+enh", "--speech", "dir", "--noise", "wham",
         "--root", str(speech_tree / "db"), "--dummy",
         "--speech_dir", str(speech_tree / "speech"),
         "--noise_dir", str(speech_tree / "noise")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    clean = os.listdir(speech_tree / "db" / "dir_derev+enh" / "audio" / "tr" / "clean")
    noisy = os.listdir(speech_tree / "db" / "dir_derev+enh" / "audio" / "tr" / "noisy")
    assert len(clean) == len(noisy) == 2
    assert "_t60=" in clean[0] and "_snr=" in clean[0]


def test_simulate_wind_and_nonlinear_mix_cli(speech_tree):
    wind_dir = speech_tree / "wind"
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "preprocessing", "simulate_wind_noise.py"),
         "--dir", str(wind_dir / "any"), "--n", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert len(os.listdir(wind_dir / "any")) == 2

    # template dirs for the mixing CLI: reuse wind for every split
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "preprocessing", "nonlinear_mixing.py"),
         "--speech_dir", str(speech_tree / "speech" / "{}"),
         "--noise_dir", str(wind_dir / "any").replace("any", "any"),
         "--root", str(speech_tree / "db2"), "--dummy"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    noisy = os.listdir(speech_tree / "db2" / "speech_in_noise_nonlinear" / "tr" / "noisy")
    assert len(noisy) == 2
    assert "_snr=" in noisy[0]

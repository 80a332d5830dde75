"""Tests for the native C++ WAV decode core."""
import numpy as np
import pytest

from storm_tpu import native
from storm_tpu.data.audio import load_wav, save_wav


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no g++ toolchain / native build failed")
    return True


def test_native_roundtrip_pcm16(tmp_path, lib_ok):
    rng = np.random.default_rng(0)
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(32000) / 16000)).astype(
        np.float32
    )
    p = tmp_path / "a.wav"
    save_wav(p, x, 16000)

    sr, ch, n = native.wav_info(str(p))
    assert (sr, ch, n) == (16000, 1, 32000)

    data, sr2, amax = native.load_wav_native(str(p))
    assert data.shape == (1, 32000)
    # 16-bit quantization tolerance
    np.testing.assert_allclose(data[0], x, atol=1.5 / 32768)
    assert abs(amax - np.abs(data).max()) < 1e-7


def test_native_multichannel(tmp_path, lib_ok):
    from scipy.io import wavfile

    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1000, 3)) * 0.1).astype(np.float32)
    p = tmp_path / "mc.wav"
    wavfile.write(p, 16000, (x * 32767).astype(np.int16))
    data, sr, amax = native.load_wav_native(str(p))
    assert data.shape == (3, 1000)
    np.testing.assert_allclose(data.T, x, atol=1.5 / 32768)


def test_load_wav_uses_native_and_matches_scipy(tmp_path, lib_ok):
    x = (0.3 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000))
    p = tmp_path / "b.wav"
    save_wav(p, x, 16000)
    d1, sr1 = load_wav(p)
    from scipy.io import wavfile

    sr2, d2 = wavfile.read(p)
    np.testing.assert_allclose(d1[0], d2.astype(np.float32) / 32768, atol=1e-6)


def test_native_float32_wav(tmp_path, lib_ok):
    from scipy.io import wavfile

    x = (np.random.default_rng(2).standard_normal(500) * 0.2).astype(np.float32)
    p = tmp_path / "f32.wav"
    wavfile.write(p, 16000, x)  # scipy writes float32 WAV (format 3)
    data, sr, amax = native.load_wav_native(str(p))
    np.testing.assert_allclose(data[0], x, atol=1e-7)

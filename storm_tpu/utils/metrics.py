"""Evaluation metrics and misc numeric helpers (host-side numpy).

Re-design of sgmse/util/other.py. PESQ is gated on the optional `pesq`
package (not available in this image); SI-SDR/SI-SIR/SI-SAR, LSD, SNR
helpers, alignment and WER are implemented natively.
"""
from __future__ import annotations

import warnings
from typing import Sequence

import numpy as np
import scipy.signal as ss
import scipy.stats

from ..signal.stft import STFTConfig, stft_real
from .stoi import stoi  # noqa: F401  (re-export; ESTOI via extended=True)

_PESQ_WARNED = False


def pesq_wb(sr: int, ref: np.ndarray, deg: np.ndarray) -> float:
    """Wide-band PESQ via the optional `pesq` package (ITU-T P.862.2).

    The reference calls `pesq(16000, x, x_hat, 'wb')`
    (sgmse/util/inference.py:48). P.862 is a licensed algorithm with no
    compact clean-room implementation; when the package is missing this
    returns NaN (and warns once) so evaluation pipelines keep running.
    """
    global _PESQ_WARNED
    try:
        import pesq as _pesq_mod
        from pesq import pesq as _pesq
        # a bare ModuleType shim (no __file__) is a test stub standing in
        # for the reference's import, not a usable PESQ implementation
        if getattr(_pesq_mod, "__file__", None) is None:
            raise ImportError("pesq module is a stub")
    except ImportError:
        if not _PESQ_WARNED:
            warnings.warn(
                "`pesq` package not installed — PESQ will be reported as NaN"
            )
            _PESQ_WARNED = True
        return float("nan")
    return float(_pesq(sr, np.asarray(ref), np.asarray(deg), "wb"))


def si_sdr(s: np.ndarray, s_hat: np.ndarray) -> float:
    """Scale-invariant SDR (sgmse/util/other.py:82-87)."""
    s = np.asarray(s, np.float64).reshape(-1)
    s_hat = np.asarray(s_hat, np.float64).reshape(-1)
    alpha = np.dot(s_hat, s) / np.linalg.norm(s) ** 2
    return float(
        10.0
        * np.log10(
            np.linalg.norm(alpha * s) ** 2
            / np.linalg.norm(alpha * s - s_hat) ** 2
        )
    )


def si_sdr_components(s_hat, s, n, eps: float = 1e-10):
    """Decompose into target/noise/artifact parts (other.py:21-32)."""
    s_hat = np.asarray(s_hat, np.float64)
    s = np.asarray(s, np.float64)
    n = np.asarray(n, np.float64)
    alpha_s = np.dot(s_hat, s) / (eps + np.linalg.norm(s) ** 2)
    s_target = alpha_s * s
    alpha_n = np.dot(s_hat, n) / (eps + np.linalg.norm(n) ** 2)
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    return s_target, e_noise, e_art


def energy_ratios(s_hat, s, n, eps: float = 1e-10):
    """SI-SDR / SI-SIR / SI-SAR (other.py:35-44)."""
    s_target, e_noise, e_art = si_sdr_components(s_hat, s, n)
    t2 = np.linalg.norm(s_target) ** 2
    sdr = 10 * np.log10(eps + t2 / (eps + np.linalg.norm(e_noise + e_art) ** 2))
    sir = 10 * np.log10(eps + t2 / (eps + np.linalg.norm(e_noise) ** 2))
    sar = 10 * np.log10(eps + t2 / (eps + np.linalg.norm(e_art) ** 2))
    return float(sdr), float(sir), float(sar)


def lsd(s_hat: np.ndarray, s: np.ndarray, eps: float = 1e-10) -> float:
    """Log-spectral distance via the framework STFT (other.py:16-19)."""
    cfg = STFTConfig()
    S_hat = stft_real(np.asarray(s_hat, np.float32), cfg)
    S = stft_real(np.asarray(s, np.float32), cfg)
    mag_hat = np.sqrt(np.asarray(S_hat[..., 0]) ** 2 + np.asarray(S_hat[..., 1]) ** 2)
    mag = np.sqrt(np.asarray(S[..., 0]) ** 2 + np.asarray(S[..., 1]) ** 2)
    lp_hat, lp = 2 * np.log(eps + mag_hat), 2 * np.log(eps + mag)
    return float(np.mean(np.sqrt(np.mean(np.abs(lp_hat - lp)))))


def snr_dB(s: np.ndarray, n: np.ndarray) -> float:
    """(other.py:96-100)."""
    s_power = np.sum(np.asarray(s) ** 2) / len(s)
    n_power = np.sum(np.asarray(n) ** 2) / len(n)
    return float(10 * np.log10(s_power / n_power))


def snr_scale_factor(speech, noise, snr: float) -> float:
    """Noise scale for a target mixing SNR (other.py:136-142)."""
    noise_var = np.var(noise)
    speech_var = np.var(speech)
    return float(np.sqrt(speech_var / (noise_var * 10.0 ** (snr / 10.0))))


def hp_filter(signal, cut_off: float = 80, order: int = 10, sr: int = 16000):
    """Butterworth high-pass (other.py:76-80)."""
    factor = cut_off / sr * 2
    sos = ss.butter(order, factor, "hp", output="sos")
    return ss.sosfilt(sos, signal)


def align(y: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Shift `y` to maximize cross-correlation with `ref` (other.py:153-157)."""
    y = np.asarray(y)
    ref = np.asarray(ref)
    lag = np.argmax(ss.fftconvolve(ref.squeeze(), np.flip(y.squeeze()))) - (
        ref.shape[-1] - 1
    )
    if lag:
        y = np.roll(y, lag, axis=-1)
    return y


def wer(r: Sequence[str], h: Sequence[str]) -> float:
    """Word error rate via Levenshtein distance (other.py:159-183)."""
    d = np.zeros((len(r) + 1, len(h) + 1), dtype=np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
            d[i, j] = min(sub, d[i, j - 1] + 1, d[i - 1, j] + 1)
    return float(d[len(r), len(h)]) / len(r)


def pydub_read(path, sr: int = 16000) -> np.ndarray:
    """Read arbitrary audio formats via pydub/ffmpeg (other.py:144-151).

    Gated on the optional `pydub` package (not in this image); plain WAVs
    should use storm_tpu.data.audio.load_wav instead."""
    try:
        from pydub import AudioSegment
    except ImportError as e:
        raise ImportError(
            "pydub is not installed; for WAV files use "
            "storm_tpu.data.audio.load_wav"
        ) from e
    y = AudioSegment.from_file(path).set_frame_rate(sr)
    samples = [s.get_array_of_samples() for s in y.split_to_mono()]
    fp = np.array(samples).T.astype(np.float32)
    fp /= np.iinfo(samples[0].typecode).max
    return fp


def mean_conf_int(data, confidence: float = 0.95):
    """(other.py:46-51)."""
    a = 1.0 * np.array(data)
    n = len(a)
    m, se = np.mean(a), scipy.stats.sem(a)
    h = se * scipy.stats.t.ppf((1 + confidence) / 2.0, n - 1)
    return m, h


def mean_std(data):
    data = np.asarray(data)
    data = data[~np.isnan(data)]
    return np.mean(data), np.std(data)


class Method:
    """Metric accumulator for result tables (other.py:59-74)."""

    def __init__(self, name: str, base_dir: str, metrics: Sequence[str]):
        self.name = name
        self.base_dir = base_dir
        self.metrics = {metric: [] for metric in metrics}

    def append(self, metric: str, value: float):
        self.metrics[metric].append(value)

    def get_mean_ci(self, metric: str):
        return mean_conf_int(np.array(self.metrics[metric]))

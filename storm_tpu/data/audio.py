"""Host-side WAV IO built on scipy (torchaudio is not available here).

Matches torchaudio.load semantics used by the reference
(sgmse/data_module.py:8, 80-81): returns float32 in [-1, 1], shape
(channels, num_samples).
"""
from __future__ import annotations

import numpy as np
from scipy.io import wavfile


_INT_SCALES = {
    np.dtype(np.int16): 1 << 15,
    np.dtype(np.int32): 1 << 31,
    np.dtype(np.uint8): 1 << 7,
}


def load_wav(path) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (data (C, T) float32 in [-1,1], sample_rate).

    Uses the native C++ decoder (storm_tpu.native) when available — it
    releases the GIL, so the threaded loader decodes in parallel on the
    single host core's SMT threads; falls back to scipy otherwise.
    """
    from .. import native

    if native.available():
        try:
            data, sr, _ = native.load_wav_native(str(path))
            return data, int(sr)
        except (IOError, RuntimeError):
            pass  # unusual encodings fall through to scipy
    sr, data = wavfile.read(path)
    if data.dtype in _INT_SCALES:
        if data.dtype == np.dtype(np.uint8):
            data = data.astype(np.float32) - 128.0
        data = np.asarray(data, np.float32) / _INT_SCALES[np.dtype(data.dtype)]
    else:
        data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # scipy gives (T, C)
    return np.ascontiguousarray(data), int(sr)


def save_wav(path, data, sr: int = 16000):
    """Write float32 (T,) or (C, T) audio in [-1, 1] as 16-bit PCM."""
    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.T
    data = np.clip(data, -1.0, 1.0)
    wavfile.write(path, sr, (data * 32767.0).astype(np.int16))

"""In-training evaluation harness (PESQ / SI-SDR / ESTOI).

Re-design of sgmse/util/inference.py:20-71. Enhancement runs through the
model's jitted `make_enhance` programs; variable utterance lengths are
handled with a bucketed compile cache (lengths padded up to a multiple of
64 STFT frames, so arbitrary-length wavs reuse a handful of executables —
the shape-polymorphism strategy anticipated in SURVEY.md §7).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from .metrics import pesq_wb, si_sdr
from .stoi import stoi


class BucketedEnhancer:
    """Caches jitted enhance programs per padded input length."""

    def __init__(self, model, params, bucket_frames: int = 64,
                 minibatch: Optional[int] = None, **enhance_kwargs):
        self.model = model
        self.params = params
        self.enhance_kwargs = enhance_kwargs
        hop = model.stft_config.hop_length
        self.bucket_samples = bucket_frames * hop
        self.minibatch = minibatch  # sequential chunking (sgmse/model.py:210-222)
        self._cache: Dict[int, object] = {}

    def padded_len(self, T: int) -> int:
        """Bucketed (compile-cache) input length for a T-sample utterance."""
        return -(-T // self.bucket_samples) * self.bucket_samples

    def _get(self, padded_len: int):
        fn = self._cache.get(padded_len)
        if fn is None:
            fn = self.model.make_enhance(padded_len, **self.enhance_kwargs)
            self._cache[padded_len] = fn
        return fn

    def __call__(self, y: np.ndarray, key) -> tuple[np.ndarray, int]:
        """y: (T,) or (B, T) waveform -> (x_hat same shape, nfe)."""
        squeeze = y.ndim == 1
        y = np.atleast_2d(np.asarray(y, np.float32))
        T = y.shape[-1]
        padded = self.padded_len(T)
        y_pad = np.pad(y, [(0, 0), (0, padded - T)])
        if self.minibatch is not None:
            # chunked serving: every chunk is row-padded to `minibatch`, so
            # ALL calls (including a lone ragged group) share one compiled
            # shape per bucket; each chunk gets its own PRNG stream
            chunks, nfe = [], 0
            for i in range(0, y_pad.shape[0], self.minibatch):
                chunk = y_pad[i : i + self.minibatch]
                rows = chunk.shape[0]
                if rows < self.minibatch:  # keep the jit cache to one shape
                    chunk = np.pad(chunk, [(0, self.minibatch - rows), (0, 0)])
                key, k = jax.random.split(key)
                xc, n = self._get(padded)(self.params, chunk, k)
                chunks.append(np.asarray(xc)[:rows])
                nfe += int(n)
            x_hat = np.concatenate(chunks, axis=0)
        else:
            x_hat, nfe = self._get(padded)(self.params, y_pad, key)
        x_hat = np.asarray(x_hat)[..., :T]
        return (x_hat[0] if squeeze else x_hat), int(nfe)


def evaluate_model(
    model,
    params,
    valid_set,
    num_eval_files: int,
    key: Optional[jax.Array] = None,
    spec: bool = False,
    audio: bool = False,
    sr: int = 16000,
    **enhance_kwargs,
):
    """Enhance the first `num_eval_files` raw validation utterances and
    average PESQ-wb / SI-SDR / ESTOI (sgmse/util/inference.py:20-71).

    Returns (pesq, si_sdr, estoi, spec_lists_or_None, audio_lists_or_None).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    enhancer = BucketedEnhancer(model, params, **enhance_kwargs)

    _pesq, _si_sdr, _estoi = 0.0, 0.0, 0.0
    n = min(num_eval_files, len(valid_set))
    spec_lists = ([], [], []) if spec else None
    audio_lists = ([], [], []) if audio else None
    MAX_VIS_SAMPLES = 10

    for i in range(n):
        x, y = valid_set.__getitem__(i, raw=True)  # (D, T) unnormalized
        x, y = x[0], y[0]  # first channel
        key, k = jax.random.split(key)
        x_hat, _nfe = enhancer(y, k)

        _si_sdr += si_sdr(x, x_hat)
        _pesq += pesq_wb(sr, x, x_hat)
        _estoi += stoi(x, x_hat, sr, extended=True)

        if spec and i < MAX_VIS_SAMPLES:
            from ..signal.stft import stft_real

            cfg = model.stft_config
            spec_lists[0].append(np.asarray(stft_real(y, cfg)))
            spec_lists[1].append(np.asarray(stft_real(x_hat, cfg)))
            spec_lists[2].append(np.asarray(stft_real(x, cfg)))
        if audio and i < MAX_VIS_SAMPLES:
            audio_lists[0].append(y)
            audio_lists[1].append(x_hat)
            audio_lists[2].append(x)

    return (
        _pesq / n,
        _si_sdr / n,
        _estoi / n,
        list(spec_lists) if spec else None,
        list(audio_lists) if audio else None,
    )

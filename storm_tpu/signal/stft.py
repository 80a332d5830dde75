"""Pure-JAX STFT / iSTFT numerically matching `torch.stft` / `torch.istft`.

The reference keeps all signal transforms in its data module
(sgmse/data_module.py:196-223): `torch.stft(sig, n_fft=510, hop_length=128,
window=hann(510), center=True, return_complex=True)` and the matching
`torch.istft(..., length=...)`. Checkpoint-parity PESQ requires matching this
bit-nearly.

TPU-native design notes:

- The TPU backend in this environment does **not** implement complex dtypes
  (and therefore no FFT ops). The device-side representation of every
  spectrogram in this framework is packed-real: a trailing axis of size 2
  holding (real, imag). See `storm_tpu.signal.cplx` for the arithmetic
  helpers.
- The DFT itself is computed as two real matmuls against fixed cos/sin
  matrices — for n_fft=510 this is a (510, 256) contraction that maps
  straight onto the MXU and is faster than an FFT would be at this size.
  Matmuls run at float32 (HIGHEST) precision for parity.
- The inverse overlap-add avoids scatter ops: frames are zero-padded to a
  multiple of the hop and accumulated with K=ceil(n_fft/hop) static
  slice-adds; the window-envelope normalizer is a host-side (numpy) constant
  folded into the program.

`stft`/`istft` (complex interface) are thin wrappers used on CPU for tests
and host-side tooling; jitted device code uses `stft_real`/`istft_real`.
"""
from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(window_length: int, periodic: bool = True, dtype=jnp.float32):
    """Hann window identical to `torch.hann_window(n, periodic=True)`."""
    n = jnp.arange(window_length, dtype=jnp.float32)
    denom = window_length if periodic else window_length - 1
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / denom))
    return w.astype(dtype)


def get_window(window_type: str, window_length: int, dtype=jnp.float32):
    """Window factory matching the reference (sgmse/data_module.py:19-25)."""
    if window_type == "sqrthann":
        return jnp.sqrt(hann_window(window_length, periodic=True, dtype=dtype))
    elif window_type == "hann":
        return hann_window(window_length, periodic=True, dtype=dtype)
    raise NotImplementedError(f"Window type {window_type} not implemented!")


def _window_np(window_type: str, n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * k / n))  # periodic hann
    if window_type == "hann":
        return w
    elif window_type == "sqrthann":
        return np.sqrt(w)
    raise NotImplementedError(f"Window type {window_type} not implemented!")


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """STFT front-end configuration.

    Defaults mirror the reference data module (sgmse/data_module.py:142-156):
    n_fft=510 -> 256 frequency bins, hop 128, periodic Hann, center=True.
    """

    n_fft: int = 510
    hop_length: int = 128
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1

    def window_array(self, dtype=jnp.float32):
        return get_window(self.window, self.n_fft, dtype=dtype)

    def num_frames(self, num_samples: int) -> int:
        padded = num_samples + (2 * (self.n_fft // 2) if self.center else 0)
        return 1 + (padded - self.n_fft) // self.hop_length

    def num_samples(self, num_frames: int) -> int:
        """Exact waveform length that produces `num_frames` STFT frames
        (the reference's training-crop formula, sgmse/data_module.py:95)."""
        assert self.center, "'center' must be True for current implementation"
        return (num_frames - 1) * self.hop_length


def _frame_idx(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    # (n_frames, n_fft) static gather indices (int32: the TPU backend has no
    # 64-bit scatter/gather)
    return (
        hop * np.arange(n_frames, dtype=np.int32)[:, None]
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )


@lru_cache(maxsize=8)
def _dft_matrices(n_fft: int, window: str):
    """Windowed forward DFT matrices: frames @ (C, S) == rfft(frames * w).

    Returns float32 numpy arrays of shape (n_fft, F) for the real (cos) and
    imaginary (-sin) parts of the one-sided DFT, with the analysis window
    folded in.
    """
    F = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(F, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = _window_np(window, n_fft)[:, None]
    C = (np.cos(ang) * w).astype(np.float32)
    S = (-np.sin(ang) * w).astype(np.float32)
    return C, S


@lru_cache(maxsize=8)
def _idft_matrices(n_fft: int, window: str):
    """Windowed inverse DFT matrices: re @ Ci + im @ Si == irfft(spec) * w.

    One-sided inverse real DFT with conjugate-symmetry weights
    (c_k = 2 except DC and Nyquist), synthesis window folded in.
    """
    F = n_fft // 2 + 1
    k = np.arange(F, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    c = np.full((F, 1), 2.0)
    c[0, 0] = 1.0
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0
    w = _window_np(window, n_fft)[None, :]
    Ci = (np.cos(ang) * c / n_fft * w).astype(np.float32)
    Si = (-np.sin(ang) * c / n_fft * w).astype(np.float32)
    return Ci, Si


@lru_cache(maxsize=32)
def _ola_envelope(n_frames: int, n_fft: int, hop: int, window: str):
    """Static overlap-added squared-window envelope (1/wsq, numpy).

    torch.istft divides the overlap-add by this envelope; it is a constant
    for a given frame count, so we fold its reciprocal into the program.
    """
    w2 = _window_np(window, n_fft) ** 2
    total = n_fft + hop * (n_frames - 1)
    env = np.zeros(total, dtype=np.float64)
    for t in range(n_frames):
        env[t * hop : t * hop + n_fft] += w2
    inv = np.where(env > 1e-11, 1.0 / np.maximum(env, 1e-30), 1.0)
    return inv.astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "pad_mode", "window"))
def _stft_real_impl(x, *, n_fft, hop_length, center, pad_mode, window):
    if center:
        pad = n_fft // 2
        pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_width, mode=pad_mode)
    n_frames = 1 + (x.shape[-1] - n_fft) // hop_length
    idx = _frame_idx(n_frames, n_fft, hop_length)
    frames = x[..., idx]  # (..., n_frames, n_fft)
    C, S = _dft_matrices(n_fft, window)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, C, precision=hi)  # (..., n_frames, F)
    im = jnp.matmul(frames, S, precision=hi)
    spec = jnp.stack([re, im], axis=-1)  # (..., n_frames, F, 2)
    return jnp.swapaxes(spec, -2, -3)  # (..., F, n_frames, 2)


def stft_real(x, config: STFTConfig = STFTConfig()):
    """STFT of a real signal, packed-real output.

    Args:
        x: real array (..., T).

    Returns:
        float32 array (..., F, n_frames, 2) with (real, imag) on the last
        axis — the packed-real equivalent of `torch.stft(return_complex=True)`.
    """
    return _stft_real_impl(
        x,
        n_fft=config.n_fft,
        hop_length=config.hop_length,
        center=config.center,
        pad_mode=config.pad_mode,
        window=config.window,
    )


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "center", "length", "window"),
)
def _istft_real_impl(spec, *, n_fft, hop_length, center, length, window):
    # spec: (..., F, n_frames, 2)
    spec = jnp.swapaxes(spec, -2, -3)  # (..., n_frames, F, 2)
    Ci, Si = _idft_matrices(n_fft, window)
    hi = jax.lax.Precision.HIGHEST
    frames = jnp.matmul(spec[..., 0], Ci, precision=hi) + jnp.matmul(
        spec[..., 1], Si, precision=hi
    )  # (..., n_frames, n_fft), synthesis-windowed
    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)

    # Overlap-add without scatter: pad frame length to K*hop and accumulate
    # with K static slice-adds over a chunked buffer.
    K = -(-n_fft // hop_length)
    pad_len = K * hop_length - n_fft
    if pad_len:
        frames = jnp.pad(
            frames, [(0, 0)] * (frames.ndim - 1) + [(0, pad_len)]
        )
    batch_shape = frames.shape[:-2]
    chunks = frames.reshape(batch_shape + (n_frames, K, hop_length))
    y = jnp.zeros(batch_shape + (n_frames + K - 1, hop_length), frames.dtype)
    for k in range(K):
        y = y.at[..., k : k + n_frames, :].add(chunks[..., :, k, :])
    y = y.reshape(batch_shape + ((n_frames + K - 1) * hop_length,))[..., :total]

    y = y * jnp.asarray(_ola_envelope(n_frames, n_fft, hop_length, window))

    pad = n_fft // 2 if center else 0
    if length is not None:
        # torch.istft with an explicit length slices [pad : pad+length] from
        # the full overlap-add (it may consume the center end-pad region) and
        # zero-pads only past the end of the reconstruction.
        end = min(pad + length, total)
        y = y[..., pad:end]
        cur = y.shape[-1]
        if cur < length:
            pad_width = [(0, 0)] * (y.ndim - 1) + [(0, length - cur)]
            y = jnp.pad(y, pad_width)
    elif center:
        y = y[..., pad : total - pad]
    return y


def istft_real(
    spec, config: STFTConfig = STFTConfig(), length: Optional[int] = None
):
    """Inverse STFT matching `torch.istft`, packed-real input.

    Args:
        spec: float array (..., F, n_frames, 2).
        length: optional exact output length.

    Returns:
        real array (..., T).
    """
    return _istft_real_impl(
        spec,
        n_fft=config.n_fft,
        hop_length=config.hop_length,
        center=config.center,
        length=length,
        window=config.window,
    )


# --------------------------------------------------------------------------
# Complex-dtype convenience wrappers (host / CPU / tests only — the TPU
# backend has no complex support).
# --------------------------------------------------------------------------

def stft(x, config: STFTConfig = STFTConfig(), window=None):
    """Complex-interface STFT: (..., T) -> complex64 (..., F, n_frames)."""
    del window  # window comes from config; kept for API familiarity
    s = stft_real(x, config)
    return jax.lax.complex(s[..., 0], s[..., 1])


def istft(
    spec,
    config: STFTConfig = STFTConfig(),
    length: Optional[int] = None,
    window=None,
):
    """Complex-interface iSTFT: complex (..., F, n_frames) -> (..., T)."""
    del window
    s = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
    return istft_real(s.astype(jnp.float32), config, length=length)

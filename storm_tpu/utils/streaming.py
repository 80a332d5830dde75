"""Fixed-memory streaming enhancement for long-form audio.

The reference enhances whole utterances in one U-Net pass (sgmse/model.py:
720-767, util/other.py:102-109 pads T to a multiple of 64): device memory —
and the bottleneck attention's quadratic cost — grow with utterance length,
so minute-scale recordings (meetings, podcasts, broadcast) eventually OOM
or crawl. There is no long-form path upstream; this is a TPU-serving
extension.

`stream_enhance` splits a long waveform into overlapping fixed-length
chunks, enhances ALL chunks as one batch through a `BucketedEnhancer`
(single compiled shape, MXU-saturating batch), and cross-fades the
overlaps with a linear sum-to-one (equal-amplitude) ramp. Properties:

- device memory is O(chunk_len * batch), independent of utterance length;
- every chunk reuses ONE compiled executable (the chunk length is fixed);
- chunk boundaries are blended over `overlap` samples with a linear
  (sum-to-one) crossfade: the denoised signal content on the two sides of
  an overlap is correlated (same input audio), so equal-amplitude is the
  artifact-free choice — only the low-energy stochastic residual differs
  between draws and takes the ~3 dB crossfade dip;
- normalization is per chunk (the reference normalizes per utterance,
  sgmse/model.py:730-731) — for program material with slow level changes
  this is a wash; for parity-critical evaluation use the non-streaming
  path.
"""
from __future__ import annotations

import numpy as np


def crossfade_ramp(n: int) -> np.ndarray:
    """Linear sum-to-one crossfade ramp: fade_in + fade_out = 1 everywhere
    (equal-amplitude — correct for correlated content)."""
    return ((np.arange(n) + 0.5) / n).astype(np.float32)


def stream_enhance(
    enhancer,
    y: np.ndarray,
    key,
    chunk_samples: int = 65536,
    overlap_samples: int = 8192,
    max_batch: int = 16,
):
    """Enhance an arbitrarily long waveform in fixed-size chunks.

    Args:
        enhancer: a `BucketedEnhancer` (utils/inference.py) — its compile
            cache sees exactly one input length, `chunk_samples`.
        y: (T,) or (D, T) waveform (numpy, 16 kHz).
        key: PRNG key (split per chunk batch).
        chunk_samples: chunk length; rounded up to the enhancer's bucket.
        overlap_samples: crossfaded overlap between consecutive chunks.
        max_batch: chunks enhanced per device call.

    Returns:
        (x_hat, nfe_total) with x_hat matching y's shape.
    """
    import jax

    y = np.asarray(y, np.float32)
    T = y.shape[-1]
    chunk_samples = enhancer.padded_len(int(chunk_samples))
    overlap_samples = int(overlap_samples)
    if not 0 <= overlap_samples < chunk_samples:
        raise ValueError("need 0 <= overlap_samples < chunk_samples")
    if T <= chunk_samples:
        x_hat, nfe = enhancer(y, key)
        return np.asarray(x_hat), int(nfe)

    hop = chunk_samples - overlap_samples
    starts = list(range(0, T - overlap_samples, hop))

    # chunked inference, all chunks batched through one compiled shape
    chunks = []
    for s in starts:
        c = y[..., s : s + chunk_samples]
        if c.shape[-1] < chunk_samples:
            c = np.pad(
                c,
                [(0, 0)] * (c.ndim - 1)
                + [(0, chunk_samples - c.shape[-1])],
            )
        chunks.append(c)
    outs = []
    nfe_total = 0
    for i in range(0, len(chunks), max_batch):
        batch = np.stack(chunks[i : i + max_batch])
        key, k = jax.random.split(key)
        xb, nfe = enhancer(batch, k)
        outs.append(np.asarray(xb))
        nfe_total += int(nfe)
    outs = np.concatenate(outs, axis=0)

    # sum-to-one overlap-add
    x_hat = np.zeros_like(y)
    ramp = crossfade_ramp(overlap_samples) if overlap_samples else None
    for j, s in enumerate(starts):
        seg = outs[j][..., : min(chunk_samples, T - s)]
        n = seg.shape[-1]
        w = np.ones(n, np.float32)
        if overlap_samples:
            if j > 0:  # fade in against the previous chunk's tail
                m = min(overlap_samples, n)
                w[:m] = ramp[:m]
            if j + 1 < len(starts):  # fade out under the next chunk's head
                w[n - overlap_samples:] = ramp[::-1]
        x_hat[..., s : s + n] += seg * w
    return x_hat, nfe_total

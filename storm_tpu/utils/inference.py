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
    """Caches jitted enhance programs per padded input length.

    With `data_parallel=True`, every minibatch chunk is sharded over all
    visible devices on a 1-D `jax.sharding.Mesh` (batch axis split,
    params replicated) — reverse diffusion is embarrassingly parallel over
    utterances, so serving throughput scales linearly with chip count.

    With `seq_parallel=k > 1`, the mesh becomes 2-D `(data, seq)` with k
    devices on the sequence axis: each utterance's spectrogram time-frame
    axis is sharded over those k chips for the whole reverse diffusion
    (GSPMD halo exchange through the U-Net; see
    models.base.spec_sharding_constraint). This is the latency axis —
    a single utterance uses k chips — and it composes with data
    parallelism on the remaining devices.
    """

    def __init__(self, model, params, bucket_frames: int = 64,
                 minibatch: Optional[int] = None,
                 data_parallel: bool = False, seq_parallel: int = 0,
                 **enhance_kwargs):
        self.model = model
        self.params = params
        self.enhance_kwargs = enhance_kwargs
        hop = model.stft_config.hop_length
        self.bucket_samples = bucket_frames * hop
        self.minibatch = minibatch  # sequential chunking (sgmse/model.py:210-222)
        self._cache: Dict[int, object] = {}
        self._data_sharding = None
        if seq_parallel and seq_parallel > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devices = np.array(jax.devices())
            if len(devices) % seq_parallel:
                raise ValueError(
                    f"seq_parallel={seq_parallel} must divide the device "
                    f"count ({len(devices)})"
                )
            n_data = len(devices) // seq_parallel if data_parallel else 1
            mesh = Mesh(
                devices[: n_data * seq_parallel].reshape(
                    n_data, seq_parallel
                ),
                ("data", "seq"),
            )
            if self.minibatch is None:
                self.minibatch = n_data
            elif self.minibatch % n_data:
                self.minibatch = -(-self.minibatch // n_data) * n_data
            self._data_sharding = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
            self.enhance_kwargs = dict(enhance_kwargs, mesh=mesh)
        elif data_parallel:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devices = np.array(jax.devices())
            mesh = Mesh(devices, ("data",))
            n = len(devices)
            if self.minibatch is None:
                self.minibatch = n
            elif self.minibatch % n:
                # row-padded chunks must split evenly across devices
                self.minibatch = -(-self.minibatch // n) * n
            self._data_sharding = NamedSharding(mesh, P("data"))
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            # commit the params to the device ONCE. Checkpoint restores
            # produce host (numpy) arrays; passing those to the jitted
            # enhance re-uploads the full ~220 MB parameter tree on EVERY
            # call — a hidden 2-3 s/batch tax on serving (measured: the
            # round-4/5 daemon ran 3.5x below bench.py's same-program
            # number for exactly this reason)
            self.params = jax.device_put(params)

    def padded_len(self, T: int) -> int:
        """Bucketed (compile-cache) input length for a T-sample utterance."""
        return -(-T // self.bucket_samples) * self.bucket_samples

    @property
    def supports_async(self) -> bool:
        """True when enhance_async is available (single-device serving
        path: no sequential minibatch chunking, no mesh sharding)."""
        return self.minibatch is None and self._data_sharding is None

    def enhance_async(self, y: np.ndarray, key):
        """Dispatch one batched enhance WITHOUT waiting for the result.

        Serving hot path (utils/server.py): JAX dispatch is asynchronous,
        so this returns device arrays immediately and the dynamic batcher
        can form/dispatch the next batch while this one executes —
        device-side work overlaps host-side response delivery. The caller
        finalizes with np.asarray (which blocks until the device is done).

        ``y``: float32 (B, T) (or (B, D, T) multichannel), row count
        already padded to a compiled shape. Returns (x_hat_dev, nfe_dev).
        """
        if not self.supports_async:
            raise NotImplementedError(
                "enhance_async requires minibatch=None and no mesh "
                "sharding (single-device serving path)"
            )
        y = np.asarray(y, np.float32)
        T = y.shape[-1]
        padded = self.padded_len(T)
        if padded != T:
            y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, padded - T)])
        x_hat, nfe = self._get(padded)(self.params, y, key)
        return x_hat, nfe

    def _get(self, padded_len: int):
        fn = self._cache.get(padded_len)
        if fn is None:
            fn = self.model.make_enhance(padded_len, **self.enhance_kwargs)
            self._cache[padded_len] = fn
        return fn

    def __call__(self, y: np.ndarray, key) -> tuple[np.ndarray, int]:
        """Enhance waveforms.

        Shapes (D = model.spatial_channels): for D == 1, (T,) or (B, T);
        for D > 1, (D, T) single utterance or (B, D, T) batch. The output
        matches the input shape.
        """
        y = np.asarray(y, np.float32)
        D = getattr(self.model, "spatial_channels", 1)
        if D == 1:
            squeeze = y.ndim == 1
            y = np.atleast_2d(y)
        else:
            squeeze = y.ndim == 2
            if squeeze:
                y = y[None]  # (1, D, T)
            if y.shape[1] != D:
                raise ValueError(
                    f"expected {D} spatial channels, got shape {y.shape}"
                )
        T = y.shape[-1]
        padded = self.padded_len(T)
        tail_pad = [(0, 0)] * (y.ndim - 1) + [(0, padded - T)]
        y_pad = np.pad(y, tail_pad)
        if self.minibatch is not None:
            # chunked serving: every chunk is row-padded to `minibatch`, so
            # ALL calls (including a lone ragged group) share one compiled
            # shape per bucket; each chunk gets its own PRNG stream
            chunks, nfe = [], 0
            for i in range(0, y_pad.shape[0], self.minibatch):
                chunk = y_pad[i : i + self.minibatch]
                rows = chunk.shape[0]
                if rows < self.minibatch:  # keep the jit cache to one shape
                    chunk = np.pad(
                        chunk,
                        [(0, self.minibatch - rows)]
                        + [(0, 0)] * (chunk.ndim - 1),
                    )
                key, k = jax.random.split(key)
                chunk_dev = (
                    jax.device_put(chunk, self._data_sharding)
                    if self._data_sharding is not None else chunk
                )
                xc, n = self._get(padded)(self.params, chunk_dev, k)
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
    minibatch: Optional[int] = 8,
    **enhance_kwargs,
):
    """Enhance the first `num_eval_files` raw validation utterances and
    average PESQ-wb / SI-SDR / ESTOI (sgmse/util/inference.py:20-71).

    Unlike the reference's serial per-file loop (its dominant eval cost at
    N reverse steps per file), files are grouped by bucketed length and
    enhanced in device batches of up to `minibatch`.

    Returns (pesq, si_sdr, estoi, spec_lists_or_None, audio_lists_or_None).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    enhancer = BucketedEnhancer(
        model, params, minibatch=minibatch, **enhance_kwargs
    )

    D = getattr(model, "spatial_channels", 1)
    n = min(num_eval_files, len(valid_set))
    items = [valid_set.__getitem__(i, raw=True) for i in range(n)]
    xs = [it[0][0] for it in items]  # metrics on first channel (reference)
    ys = [(it[1] if D > 1 else it[1][0]) for it in items]

    # group by compile bucket, enhance each group as one (chunked) batch
    groups: Dict[int, list] = {}
    for i, y in enumerate(ys):
        groups.setdefault(enhancer.padded_len(y.shape[-1]), []).append(i)
    x_hats = [None] * n
    for L, idxs in sorted(groups.items()):
        batch = np.stack([
            np.pad(ys[i], [(0, 0)] * (ys[i].ndim - 1)
                   + [(0, L - ys[i].shape[-1])])
            for i in idxs
        ]).astype(np.float32)
        key, k = jax.random.split(key)
        xh, _nfe = enhancer(batch, k)
        for j, i in enumerate(idxs):
            out = np.asarray(xh[j])[..., : ys[i].shape[-1]]
            x_hats[i] = out[0] if D > 1 else out

    _pesq, _si_sdr, _estoi = 0.0, 0.0, 0.0
    spec_lists = ([], [], []) if spec else None
    audio_lists = ([], [], []) if audio else None
    MAX_VIS_SAMPLES = 10

    for i in range(n):
        x, y, x_hat = xs[i], ys[i], x_hats[i]

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

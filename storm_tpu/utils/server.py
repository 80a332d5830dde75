"""Online-serving runtime: dynamic batching over the bucketed enhancer.

Beyond-reference (the reference enhances file-to-file from a CLI,
enhancement.py:43-72). This module is the production counterpart:
concurrent enhance requests are coalesced into padded-length-bucket
batches, so the chip runs the same large batched program whose throughput
is measured in BASELINE.md while per-request queueing latency stays
bounded by ``max_wait_ms``. The device is owned by ONE dispatcher thread —
callers block on an event, never touch JAX state, and the PRNG key chain
is split only by the dispatcher, keeping the served noise stream
deterministic for a given seed regardless of request arrival order.

`serve.py` wraps this in a stdlib HTTP front end; the batcher itself is
transport-agnostic and unit-testable with a fake enhancer.
"""
from __future__ import annotations

import io
import threading
import time
from typing import Dict, List, Optional

import numpy as np


class _Request:
    __slots__ = ("y", "event", "result", "error", "t_enqueue")

    def __init__(self, y: np.ndarray):
        self.y = y
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t_enqueue = time.monotonic()


class DynamicBatcher:
    """Coalesce concurrent enhance calls into per-bucket batches.

    Dispatch policy: a bucket is flushed as soon as it holds ``max_batch``
    requests, or when its oldest request has waited ``max_wait_ms`` —
    the standard linger trade-off (throughput vs tail latency). Buckets
    are served oldest-request-first so a rare length cannot be starved by
    a hot one.
    """

    def __init__(self, enhancer, key, max_batch: int = 8,
                 max_wait_ms: float = 100.0):
        self.enhancer = enhancer
        self.max_batch = max(1, int(max_batch))
        self.max_wait_s = max_wait_ms / 1e3
        self._key = key
        self._pending: Dict[int, List[_Request]] = {}
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        self.stats = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "audio_samples": 0, "device_s": 0.0, "errors": 0,
        }
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="storm-tpu-batcher")
        self._worker.start()

    # -- caller side ------------------------------------------------------

    def submit(self, y: np.ndarray, timeout: Optional[float] = None):
        """Enhance one utterance; blocks until its batch is served.

        ``y``: float32 (T,) mono or (D, T) multichannel, matching the
        model's ``spatial_channels``. Returns ``(x_hat, nfe)`` with the
        input's exact length (row/length padding is stripped here).
        """
        y = np.asarray(y, np.float32)
        req = _Request(y)
        bucket = self.enhancer.padded_len(y.shape[-1])
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self.stats["requests"] += 1
            self._pending.setdefault(bucket, []).append(req)
            self._wake.notify()
        if not req.event.wait(timeout):
            raise TimeoutError("enhance request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        with self._lock:
            self._closed = True
            self._wake.notify()
        self._worker.join(timeout=30)

    # -- dispatcher side --------------------------------------------------

    def _pick_locked(self) -> Optional[List[_Request]]:
        """Pop the batch to serve now, or None if nothing is due yet."""
        now = time.monotonic()
        best_bucket, best_age = None, -1.0
        for bucket, reqs in self._pending.items():
            if not reqs:
                continue
            age = now - reqs[0].t_enqueue
            if len(reqs) >= self.max_batch:
                age += 1e6  # full bucket: dispatch immediately
            if age > best_age:
                best_bucket, best_age = bucket, age
        if best_bucket is None:
            return None
        reqs = self._pending[best_bucket]
        if len(reqs) < self.max_batch and best_age < self.max_wait_s:
            return None  # linger
        take = reqs[: self.max_batch]
        rest = reqs[self.max_batch:]
        if rest:
            self._pending[best_bucket] = rest
        else:
            del self._pending[best_bucket]
        return take

    def _next_deadline_locked(self) -> Optional[float]:
        oldest = None
        for reqs in self._pending.values():
            if reqs:
                t = reqs[0].t_enqueue
                oldest = t if oldest is None else min(oldest, t)
        if oldest is None:
            return None
        return max(0.0, oldest + self.max_wait_s - time.monotonic())

    def _run(self):
        import jax

        while True:
            with self._lock:
                batch = self._pick_locked()
                while batch is None:
                    if self._closed and not any(self._pending.values()):
                        return
                    self._wake.wait(timeout=self._next_deadline_locked())
                    batch = self._pick_locked()
                self._key, k = jax.random.split(self._key)
            try:
                padded = self.enhancer.padded_len(
                    max(r.y.shape[-1] for r in batch)
                )
                ys = np.stack([
                    np.pad(r.y, [(0, 0)] * (r.y.ndim - 1)
                           + [(0, padded - r.y.shape[-1])])
                    for r in batch
                ])
                t0 = time.monotonic()
                x_hats, nfe = self.enhancer(ys, k)
                x_hats = np.asarray(x_hats)
                dt = time.monotonic() - t0
                with self._lock:
                    self.stats["batches"] += 1
                    self.stats["batched_requests"] += len(batch)
                    self.stats["device_s"] += dt
                    self.stats["audio_samples"] += sum(
                        r.y.shape[-1] for r in batch
                    )
                for r, x_hat in zip(batch, x_hats):
                    r.result = (x_hat[..., : r.y.shape[-1]], int(nfe))
                    r.event.set()
            except BaseException as e:  # propagate to every waiter
                with self._lock:
                    self.stats["errors"] += len(batch)
                for r in batch:
                    r.error = e
                    r.event.set()


# -- WAV bytes codec (HTTP payloads) --------------------------------------


def decode_wav_bytes(body: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 (C, T) in [-1, 1], sample_rate)."""
    from scipy.io import wavfile

    from ..data.audio import _INT_SCALES

    sr, data = wavfile.read(io.BytesIO(body))
    if data.dtype in _INT_SCALES:
        if data.dtype == np.dtype(np.uint8):
            data = data.astype(np.float32) - 128.0
        data = np.asarray(data, np.float32) / _INT_SCALES[np.dtype(data.dtype)]
    else:
        data = np.asarray(data, np.float32)
    data = data[None, :] if data.ndim == 1 else data.T
    return np.ascontiguousarray(data), int(sr)


def encode_wav_bytes(data: np.ndarray, sr: int = 16000) -> bytes:
    """float32 (T,) or (C, T) in [-1, 1] -> 16-bit PCM WAV bytes."""
    from scipy.io import wavfile

    data = np.asarray(data, np.float32)
    if data.ndim == 2:
        data = data.T
    buf = io.BytesIO()
    wavfile.write(buf, sr, (np.clip(data, -1.0, 1.0) * 32767.0)
                  .astype(np.int16))
    return buf.getvalue()

"""Online-serving runtime: dynamic batching over the bucketed enhancer.

Beyond-reference (the reference enhances file-to-file from a CLI,
enhancement.py:43-72). This module is the production counterpart:
concurrent enhance requests are coalesced into batches so the chip runs
the large batched programs whose throughput is measured in BASELINE.md
while per-request queueing latency stays bounded by ``max_wait_ms``. The
device is owned by ONE dispatcher thread — callers block on an event,
never touch JAX state, and the PRNG key chain is split only by the
dispatcher, keeping the served noise stream deterministic for a given
seed regardless of request arrival order.

Two batching decisions come straight from a measured real-chip load test
(round 4, BASELINE.md "serving daemon"):

- **Cross-bucket coalescing.** Per-length-bucket queues fragment mixed-
  length traffic (mean batch fill 2.5/16 at concurrency 8 on a 4-bucket
  corpus). One age-ordered queue is kept instead; a dispatch takes the
  oldest request plus whatever else is pending — same length bucket
  first, shorter next (they pad up), longer last — and pads everything
  to the largest bucket taken. Padding a 2.6 s utterance to 4.1 s wastes
  ≤ 40% of its rows' FLOPs; serving it alone in a 16-row program wastes
  94%.
- **Power-of-two row sizing.** A partial batch is padded to the next
  allowed row count (1, 2, 4, …, max_batch) instead of always to
  ``max_batch``, so a lone request costs a 1-row program, not a 16-row
  one. Each (rows, bucket) shape compiles once and is reused (the
  persistent JAX compilation cache keeps warm restarts cheap).

`serve.py` wraps this in a stdlib HTTP front end; the batcher itself is
transport-agnostic and unit-testable with a fake enhancer.
"""
from __future__ import annotations

import io
import threading
import time
from typing import List, Optional

import numpy as np


class _Request:
    __slots__ = ("y", "event", "result", "error", "t_enqueue")

    def __init__(self, y: np.ndarray):
        self.y = y
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t_enqueue = time.monotonic()


def _default_row_sizes(max_batch: int) -> List[int]:
    sizes, r = [], 1
    while r < max_batch:
        sizes.append(r)
        r *= 2
    sizes.append(max_batch)
    return sizes


class DynamicBatcher:
    """Coalesce concurrent enhance calls into dynamic batches.

    Dispatch policy: a batch is flushed as soon as ``max_batch`` requests
    are pending (any lengths — they coalesce, see module docstring), or
    when the oldest request has waited ``max_wait_ms`` — the standard
    linger trade-off (throughput vs tail latency). The oldest request is
    always in the dispatched batch, so no length can be starved.

    ``row_sizes`` are the allowed compiled batch shapes (a partial batch
    is zero-row-padded up to the smallest allowed size that fits);
    default 1, 2, 4, …, ``max_batch``. Pass ``[max_batch]`` to pin a
    single program shape (e.g. mesh-sharded serving, where the row count
    must stay divisible by the device count).
    """

    def __init__(self, enhancer, key, max_batch: int = 8,
                 max_wait_ms: float = 100.0,
                 row_sizes: Optional[List[int]] = None,
                 pipeline_depth: int = 2):
        self.enhancer = enhancer
        self.max_batch = max(1, int(max_batch))
        self.max_wait_s = max_wait_ms / 1e3
        self.row_sizes = sorted(set(
            int(r) for r in (row_sizes or _default_row_sizes(self.max_batch))
            if 1 <= int(r) <= self.max_batch)) or [self.max_batch]
        self._key = key
        self._pending: List[_Request] = []
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._closed = False
        self.stats = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "row_slots": 0, "audio_samples": 0, "device_s": 0.0,
            "errors": 0,
        }
        # Pipelined dispatch (when the enhancer supports async): the
        # dispatcher enqueues device work and immediately forms the next
        # batch; a finalizer thread blocks on each result and delivers
        # responses. Device execution thus overlaps the host-side response
        # write + client resubmit + linger that would otherwise serialize
        # with it (measured ~0.7 s per 16-row batch cycle, BASELINE.md
        # round-5 serving section). pipeline_depth bounds in-flight device
        # batches (1 executing + depth-1 queued).
        self._async = (pipeline_depth > 1
                       and getattr(enhancer, "supports_async", False))
        if self._async:
            import queue as _queue

            self._inflight = threading.Semaphore(pipeline_depth)
            self._completions: "_queue.Queue" = _queue.Queue()
            self._finalizer = threading.Thread(
                target=self._finalize_loop, daemon=True,
                name="storm-tpu-finalizer")
            self._finalizer.start()
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
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self.stats["requests"] += 1
            self._pending.append(req)
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
        if self._async:
            self._completions.put(None)  # after all dispatches are queued
            self._finalizer.join(timeout=60)

    # -- dispatcher side --------------------------------------------------

    def _pick_locked(self) -> Optional[List[_Request]]:
        """Pop the batch to serve now, or None if nothing is due yet."""
        if not self._pending:
            return None
        age = time.monotonic() - self._pending[0].t_enqueue
        if (len(self._pending) < self.max_batch
                and age < self.max_wait_s and not self._closed):
            return None  # linger for a fuller batch
        head = self._pending[0]
        head_bucket = self.enhancer.padded_len(head.y.shape[-1])

        # fill the rest of the batch around the oldest request: exact
        # bucket first (zero extra padding), shorter next (they pad up),
        # longer last (they raise the whole batch's padded length)
        def fill_rank(r: _Request):
            b = self.enhancer.padded_len(r.y.shape[-1])
            return (0 if b == head_bucket else (1 if b < head_bucket else 2),
                    r.t_enqueue)

        rest = sorted(self._pending[1:], key=fill_rank)
        take = [head] + rest[: self.max_batch - 1]
        taken = set(map(id, take))
        self._pending = [r for r in self._pending if id(r) not in taken]
        return take

    def _next_deadline_locked(self) -> Optional[float]:
        if not self._pending:
            return None
        return max(0.0, self._pending[0].t_enqueue + self.max_wait_s
                   - time.monotonic())

    def _run(self):
        import jax

        while True:
            with self._lock:
                batch = self._pick_locked()
                while batch is None:
                    if self._closed and not self._pending:
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
                rows = next(r for r in self.row_sizes if r >= len(batch))
                if rows > len(batch):  # pad to an allowed compiled shape
                    ys = np.pad(ys, [(0, rows - len(batch))]
                                + [(0, 0)] * (ys.ndim - 1))
                if self._async:
                    self._inflight.acquire()  # bound queued device work
                    try:
                        t0 = time.monotonic()
                        x_dev, nfe_dev = self.enhancer.enhance_async(ys, k)
                        self._completions.put(
                            (batch, rows, x_dev, nfe_dev, t0))
                    except BaseException:
                        self._inflight.release()
                        raise
                    continue
                t0 = time.monotonic()
                x_hats, nfe = self.enhancer(ys, k)
                self._deliver(batch, rows, np.asarray(x_hats), int(nfe), t0)
            except BaseException as e:
                self._fail(batch, e)

    def _deliver(self, batch, rows, x_hats, nfe, t0):
        dt = time.monotonic() - t0
        with self._lock:
            self.stats["batches"] += 1
            self.stats["batched_requests"] += len(batch)
            self.stats["row_slots"] += rows
            self.stats["device_s"] += dt
            self.stats["audio_samples"] += sum(
                r.y.shape[-1] for r in batch
            )
        for r, x_hat in zip(batch, x_hats[: len(batch)]):
            r.result = (x_hat[..., : r.y.shape[-1]], nfe)
            r.event.set()

    def _fail(self, batch, e: BaseException):  # propagate to every waiter
        with self._lock:
            self.stats["errors"] += len(batch)
        for r in batch:
            r.error = e
            r.event.set()

    def _finalize_loop(self):
        """Blocks on each in-flight device batch (FIFO) and delivers its
        responses while the dispatcher keeps the device fed."""
        while True:
            item = self._completions.get()
            if item is None:
                return
            batch, rows, x_dev, nfe_dev, t0 = item
            try:
                # np.asarray is the device sync point (block_until_ready
                # is unreliable on the tunneled backend)
                x_hats = np.asarray(x_dev)
                self._deliver(batch, rows, x_hats, int(nfe_dev), t0)
            except BaseException as e:
                self._fail(batch, e)
            finally:
                self._inflight.release()


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

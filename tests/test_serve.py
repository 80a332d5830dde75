"""Online serving: dynamic batcher semantics + the HTTP daemon end to end.

Beyond-reference surface (the reference serves file-to-file only,
enhancement.py:43-72); these tests pin the batching contract the
throughput tables rely on: concurrent same-bucket requests coalesce into
one device program, partial batches dispatch after the linger window, and
each caller gets its own exact-length result back.
"""
import http.client
import threading
import time

import jax
import numpy as np
import pytest


class FakeEnhancer:
    """Length-bucketing double: output = 2*input, records batch shapes."""

    def __init__(self, bucket=64, delay_s=0.0):
        self.bucket = bucket
        self.delay_s = delay_s
        self.calls = []

    def padded_len(self, T):
        return -(-T // self.bucket) * self.bucket

    def __call__(self, ys, key):
        self.calls.append(ys.shape)
        if self.delay_s:
            time.sleep(self.delay_s)
        return 2.0 * ys, 7


def _submit_concurrently(batcher, waves):
    outs = [None] * len(waves)

    def work(i):
        outs[i] = batcher.submit(waves[i])

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(len(waves))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return outs


class _SlowResult:
    """Device-array stand-in whose materialization (np.asarray ->
    __array__) blocks, like a still-executing TPU batch."""

    def __init__(self, value, delay_s):
        self._value = value
        self._delay_s = delay_s

    def __array__(self, dtype=None, copy=None):
        time.sleep(self._delay_s)
        return np.asarray(self._value, dtype)


class FakeAsyncEnhancer(FakeEnhancer):
    """Async-capable double: dispatch returns immediately; the result
    blocks at np.asarray. Records dispatch timestamps to prove the
    batcher pipelines (dispatch N+1 before N's result is consumed)."""

    supports_async = True

    def __init__(self, bucket=64, device_s=0.1):
        super().__init__(bucket)
        self.device_s = device_s
        self.dispatch_t = []

    def enhance_async(self, ys, key):
        self.calls.append(ys.shape)
        self.dispatch_t.append(time.monotonic())
        return _SlowResult(2.0 * ys, self.device_s), 7


def test_batcher_pipelines_async_dispatch():
    """With an async enhancer, batch N+1 is dispatched while batch N is
    still 'executing' (its result not yet materialized), and every caller
    still gets its own exact-length result."""
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeAsyncEnhancer(device_s=0.15)
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=2,
                       max_wait_ms=10.0, pipeline_depth=2)
    try:
        waves = [np.full(100 + i, 0.5, np.float32) for i in range(6)]
        outs = _submit_concurrently(b, waves)
        for y, (x, nfe) in zip(waves, outs):
            assert x.shape == y.shape and nfe == 7
            np.testing.assert_allclose(x, 2.0 * y)
        assert b.stats["batches"] == len(enh.dispatch_t)
        assert b.stats["batched_requests"] == 6
        assert b.stats["errors"] == 0
        # pipelining proof: at least one dispatch gap is shorter than the
        # fake device time (the serial batcher could never go below it)
        gaps = [b - a for a, b in zip(enh.dispatch_t, enh.dispatch_t[1:])]
        assert gaps and min(gaps) < enh.device_s
    finally:
        b.close()


def test_batcher_async_propagates_finalize_errors():
    from storm_tpu.utils.server import DynamicBatcher

    class Boom(_SlowResult):
        def __array__(self, dtype=None, copy=None):
            raise RuntimeError("device exploded")

    class FailingAsync(FakeAsyncEnhancer):
        def enhance_async(self, ys, key):
            self.calls.append(ys.shape)
            return Boom(None, 0.0), 7

    enh = FailingAsync()
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=2,
                       max_wait_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="device exploded"):
            b.submit(np.zeros(50, np.float32), timeout=10)
        assert b.stats["errors"] == 1
        # the batcher survives: a follow-up healthy submit still fails in
        # enhance (same fake) but the worker/finalizer threads are alive
        assert b._worker.is_alive() and b._finalizer.is_alive()
    finally:
        b.close()


def test_batcher_coalesces_full_bucket():
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer(delay_s=0.05)
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=4,
                       max_wait_ms=5000.0)
    try:
        waves = [np.full(100 + i, 0.5, np.float32) for i in range(4)]
        outs = _submit_concurrently(b, waves)
        for y, (x, nfe) in zip(waves, outs):
            assert x.shape == y.shape and nfe == 7
            np.testing.assert_allclose(x, 2.0 * y)
        # all four lengths pad to the same 128-sample bucket -> one call
        assert (4, 128) in enh.calls
        assert b.stats["batches"] >= 1
        assert b.stats["batched_requests"] == 4
    finally:
        b.close()


def test_batcher_linger_dispatches_partial_batch():
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer()
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=8,
                       max_wait_ms=30.0)
    try:
        t0 = time.monotonic()
        x, _ = b.submit(np.ones(50, np.float32), timeout=10)
        assert time.monotonic() - t0 < 5.0
        assert x.shape == (50,)
        assert enh.calls == [(1, 64)]
    finally:
        b.close()


def test_batcher_coalesces_across_buckets():
    """Mixed-length requests share one batch (shorter ones pad up)."""
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer(delay_s=0.05)
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=4,
                       max_wait_ms=2000.0)
    try:
        waves = [np.ones(40, np.float32), np.ones(200, np.float32),
                 np.ones(50, np.float32), np.ones(220, np.float32)]
        outs = _submit_concurrently(b, waves)
        for y, (x, _) in zip(waves, outs):
            assert x.shape == y.shape
        # one call, every request padded to the largest bucket taken
        assert enh.calls == [(4, 256)]
        assert b.stats["batches"] == 1
        assert b.stats["batched_requests"] == 4
    finally:
        b.close()


def test_batcher_prefers_same_bucket_fill():
    """Fill around the oldest request favors its own length bucket."""
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer(delay_s=0.4)
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=2,
                       max_wait_ms=50.0)
    try:
        waves = [np.ones(70, np.float32),   # prime: dispatched alone
                 np.ones(40, np.float32),   # bucket 64 (head of batch 2)
                 np.ones(200, np.float32),  # bucket 256 (skipped over)
                 np.ones(50, np.float32)]   # bucket 64 (picked with head)
        outs = [None] * len(waves)

        def work(i):
            outs[i] = b.submit(waves[i], timeout=30)

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(len(waves))]
        # stagger arrivals: prime dispatches after the 50 ms linger, the
        # next three queue up while the enhancer is busy for 400 ms
        for t in threads:
            t.start()
            time.sleep(0.1)
        for t in threads:
            t.join(timeout=30)
        for y, (x, _) in zip(waves, outs):
            assert x.shape == y.shape
        # batch 2 = the two bucket-64 requests (same-bucket fill beats
        # FIFO), leaving the 256 request to its own exact-bucket batch
        assert enh.calls == [(1, 128), (2, 64), (1, 256)]
    finally:
        b.close()


def test_batcher_pads_rows_to_power_of_two():
    """A partial batch compiles the next allowed row count, not max."""
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer(delay_s=0.05)
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=16,
                       max_wait_ms=100.0)
    try:
        waves = [np.ones(40 + i, np.float32) for i in range(3)]
        outs = _submit_concurrently(b, waves)
        for y, (x, _) in zip(waves, outs):
            assert x.shape == y.shape
        assert enh.calls == [(4, 64)]  # 3 requests -> 4-row program
        assert b.stats["row_slots"] == 4
        assert b.stats["batched_requests"] == 3
    finally:
        b.close()


def test_batcher_pinned_row_size():
    """row_sizes=[max] keeps every program at the mesh-divisible shape."""
    from storm_tpu.utils.server import DynamicBatcher

    enh = FakeEnhancer()
    b = DynamicBatcher(enh, jax.random.PRNGKey(0), max_batch=4,
                       max_wait_ms=20.0, row_sizes=[4])
    try:
        x, _ = b.submit(np.ones(50, np.float32), timeout=10)
        assert x.shape == (50,)
        assert enh.calls == [(4, 64)]
    finally:
        b.close()


def test_batcher_propagates_errors():
    from storm_tpu.utils.server import DynamicBatcher

    class Boom(FakeEnhancer):
        def __call__(self, ys, key):
            raise ValueError("kaput")

    b = DynamicBatcher(Boom(), jax.random.PRNGKey(0), max_batch=1,
                       max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="kaput"):
            b.submit(np.ones(10, np.float32), timeout=10)
        assert b.stats["errors"] == 1
    finally:
        b.close()


def test_wav_bytes_roundtrip():
    from storm_tpu.utils.server import decode_wav_bytes, encode_wav_bytes

    x = (0.4 * np.sin(2 * np.pi * 440 * np.arange(1000) / 16000)
         ).astype(np.float32)
    y, sr = decode_wav_bytes(encode_wav_bytes(x, 16000))
    assert sr == 16000 and y.shape == (1, 1000)
    # encode truncates to int16 and decode divides by 32768: up to ~2 LSB
    np.testing.assert_allclose(y[0], x, atol=2.5 / 32768)


@pytest.fixture(scope="module")
def tiny_server(tmp_path_factory):
    from storm_tpu.ckpt import save_checkpoint
    from storm_tpu.models.factory import build_model

    import serve

    out = tmp_path_factory.mktemp("srv_ckpt") / "ckpt"
    config = {"mode": "regen-joint-training", "nf": 8, "ch_mult": [1, 1],
              "image_size": 64, "sde": "ouve"}
    model = build_model(dict(config))
    state = model.init_state(jax.random.PRNGKey(0), (1, 256, 64))
    save_checkpoint(str(out), state, config)

    args = serve.build_argparser().parse_args([
        "--ckpt", str(out), "--mode", "storm", "--N", "2",
        "--corrector", "none", "--batch", "2", "--max_wait_ms", "200",
        "--port", "0",
    ])
    httpd, batcher = serve.build_server(args)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[:2]
    httpd.shutdown()
    batcher.close()


def test_build_server_warmup_buckets_and_row_sizes(tmp_path):
    """--warmup_buckets warms every (row, bucket) shape; --row_sizes bounds
    the ladder (max_batch is always appended so full batches dispatch)."""
    from storm_tpu.ckpt import save_checkpoint
    from storm_tpu.models.factory import build_model

    import serve

    out = tmp_path / "ckpt"
    # minimal program: every warmed (row, bucket) shape is a real XLA
    # compile, and the warmup/bucket semantics are mode-independent — use
    # the discriminative model (one net pass, no sampler scan) so each of
    # the 2x2 shapes compiles in seconds, not tens of seconds
    config = {"mode": "denoiser-only", "nf": 4, "ch_mult": [1, 1],
              "image_size": 64}
    model = build_model(dict(config))
    state = model.init_state(jax.random.PRNGKey(0), (1, 256, 64))
    save_checkpoint(str(out), state, config)

    args = serve.build_argparser().parse_args([
        "--ckpt", str(out), "--mode", "denoiser-only", "--N", "1",
        "--corrector", "none", "--batch", "2", "--port", "0",
        "--warmup_s", "0.5", "--warmup_buckets", "0.25,1.0",
        "--row_sizes", "1",
    ])
    httpd, batcher = serve.build_server(args)
    try:
        assert batcher.row_sizes == [1, 2]  # max_batch appended
        # the bucket grid is 64 frames * hop 128 = 8192 samples: 0.25 s
        # and 0.5 s dedup into the 8192 bucket, 1.0 s warms 16384
        assert sorted(batcher.enhancer._cache) == [8192, 16384]
    finally:
        httpd.server_close()
        batcher.close()


def test_http_healthz_and_enhance(tiny_server):
    from storm_tpu.utils.server import decode_wav_bytes, encode_wav_bytes

    host, port = tiny_server
    conn = http.client.HTTPConnection(host, port, timeout=600)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200
    import json
    health = json.loads(r.read())
    assert health["status"] == "ok" and health["backend"] == "cpu"

    rng = np.random.default_rng(0)
    wav = encode_wav_bytes(rng.standard_normal(4000).astype(np.float32) * 0.1)
    conn.request("POST", "/enhance", body=wav,
                 headers={"Content-Type": "audio/wav"})
    r = conn.getresponse()
    assert r.status == 200, r.read()[:500]
    nfe = int(r.getheader("X-NFE"))
    assert nfe >= 2  # denoiser + >=1 reverse step
    x, sr = decode_wav_bytes(r.read())
    assert sr == 16000 and x.shape == (1, 4000)
    assert np.isfinite(x).all()

    conn.request("GET", "/stats")
    r = conn.getresponse()
    stats = json.loads(r.read())
    assert stats["requests"] == 1 and stats["audio_s"] == 0.25

    # malformed payload -> 400, server stays up
    conn.request("POST", "/enhance", body=b"not a wav")
    r = conn.getresponse()
    assert r.status == 400
    r.read()
    conn.close()

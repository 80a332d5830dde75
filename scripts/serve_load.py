"""Load-test the online serving daemon (serve.py).

Fires concurrent /enhance requests from a directory of 16 kHz wavs against
a running server and reports aggregate serving throughput + latency
percentiles + the server's own batching counters. The throughput number is
directly comparable to bench.py's audio-s/s/chip (same device program;
this adds HTTP + dynamic-batching overhead on top).

    python serve.py --ckpt <c> --mode storm --warmup_s 4 &
    python scripts/serve_load.py --url http://127.0.0.1:8571 \
        --dir /tmp/corpus/audio/tt/noisy --requests 64 --concurrency 16
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import threading
import time
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8571")
    ap.add_argument("--dir", required=True, help="directory of 16 kHz wavs")
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=16)
    ap.add_argument("--json", default=None, help="write the report here")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, "*.wav")))
    if not files:
        raise SystemExit(f"no wavs in {args.dir}")
    payloads = []
    for i in range(args.requests):
        with open(files[i % len(files)], "rb") as f:
            payloads.append(f.read())

    # one warm request so compile time doesn't pollute the measurement
    urllib.request.urlopen(urllib.request.Request(
        args.url + "/enhance", data=payloads[0], method="POST"), timeout=3600
    ).read()
    stats0 = json.loads(urllib.request.urlopen(
        args.url + "/stats", timeout=60).read())

    lat, lock = [], threading.Lock()
    audio_bytes = [0]
    idx = [0]

    errors = [0]

    def worker():
        while True:
            with lock:
                if idx[0] >= len(payloads):
                    return
                body = payloads[idx[0]]
                idx[0] += 1
            t0 = time.perf_counter()
            try:
                out = urllib.request.urlopen(urllib.request.Request(
                    args.url + "/enhance", data=body, method="POST"),
                    timeout=3600).read()
            except Exception:
                # a draining/SIGTERM'd server refuses new connections:
                # count it and keep the report for the requests that DID
                # complete (the drain test depends on this)
                with lock:
                    errors[0] += 1
                continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)
                audio_bytes[0] += len(out) - 44  # PCM16 payload

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker)
               for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    def _get_json(path):
        try:
            return json.loads(urllib.request.urlopen(
                args.url + path, timeout=60).read())
        except Exception:
            return {}  # server already gone (drain test)

    stats1 = _get_json("/stats") or dict(stats0)
    health = _get_json("/healthz")
    health.pop("status", None)
    audio_s = audio_bytes[0] / 2 / 16000
    if not lat:
        raise SystemExit("no request completed; nothing to report")
    lat.sort()
    n_batches = stats1["batches"] - stats0["batches"]
    row_slots = stats1["row_slots"] - stats0["row_slots"]
    batched = stats1["batched_requests"] - stats0["batched_requests"]
    report = {
        "requests": len(lat),
        "errors": errors[0],
        "concurrency": args.concurrency,
        "wall_s": round(wall, 3),
        "audio_s": round(audio_s, 2),
        "audio_s_per_s": round(audio_s / wall, 3),
        "latency_p50_s": round(lat[len(lat) // 2], 3),
        "latency_p95_s": round(lat[int(len(lat) * 0.95)], 3),
        "server_batches": n_batches,
        "mean_batch": round(batched / max(1, n_batches), 2),
        # fraction of dispatched batch rows carrying a real request (the
        # rest is row-ladder padding) — measured over THIS run only
        "batch_fill": round(batched / row_slots, 4) if row_slots else None,
        # serving configuration from the server itself, so this report is
        # self-describing and reconcilable with bench.py rows
        "server_config": health,
    }
    print(json.dumps(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

#!/bin/bash
# Round-5 serving measurement runbook (VERDICT round-4 next #1).
#
# Starts serve.py at the production config (int8 + deepcache K=3, N=50 ald,
# full power-of-two row ladder, warm buckets covering the testbed), load-tests
# it at concurrency 8/16/32 with >=128 requests each, then exercises SIGTERM
# drain under live load. All reports are self-describing (server_config
# embedded by scripts/serve_load.py).
#
#   bash scripts/run_serve_measurement.sh /root/data/ckpt_prod \
#       /root/data/corpus/tt/noisy docs
set -euo pipefail
CKPT=${1:-/root/data/ckpt_prod}
WAVDIR=${2:-/root/data/corpus/tt/noisy}
OUT=${3:-docs}
PORT=${PORT:-8571}

# NOTE on warmup lengths: the batcher pads each utterance to an 8192-sample
# (64-frame) bucket. The primary testbed is uniform 2.04 s files -> the
# 32768-sample bucket, so warm 2.0 s, NOT 2.1 s (2.1 s rounds to the 40960
# bucket — round 4 warmed that one and then compiled every (row, 32768)
# shape mid-load-test, which is one root cause of its 1.508 audio-s/s).
# The extra buckets cover the variable-length secondary testbed (2.2-4.0 s).
echo "[runbook] starting server (production config: int8 + dc3, N=50 ald)"
python serve.py --ckpt "$CKPT" --mode storm \
    --quant int8 --calib_dir "$WAVDIR" --deepcache 3 \
    --N 50 --corrector ald --batch 16 \
    --warmup_s 2.0 --warmup_buckets 2.6,3.1,3.6,4.1 \
    --port "$PORT" > /tmp/serve_r5.log 2>&1 &
echo $! > /tmp/serve.pid
echo "[runbook] server pid $(cat /tmp/serve.pid); waiting for readiness"

for i in $(seq 1 720); do
    if curl -s --max-time 5 "http://127.0.0.1:$PORT/healthz" | grep -q '"ok"'; then
        echo "[runbook] ready after ${i}x10s"; break
    fi
    sleep 10
done
curl -s "http://127.0.0.1:$PORT/healthz"; echo

for C in 8 16 32; do
    echo "[runbook] load test: concurrency $C"
    python scripts/serve_load.py --url "http://127.0.0.1:$PORT" \
        --dir "$WAVDIR" --requests 128 --concurrency "$C" \
        --json "$OUT/serve_load_c${C}_r05.json"
done

if [ -d /root/data/corpus512/tt/noisy ]; then
    echo "[runbook] mixed-length load test (2.2-4.0 s files): coalescing + ladder"
    python scripts/serve_load.py --url "http://127.0.0.1:$PORT" \
        --dir /root/data/corpus512/tt/noisy --requests 128 --concurrency 16 \
        --json "$OUT/serve_load_mixedlen_c16_r05.json"
fi

echo "[runbook] SIGTERM drain under live load"
( python scripts/serve_load.py --url "http://127.0.0.1:$PORT" \
    --dir "$WAVDIR" --requests 32 --concurrency 8 \
    --json "$OUT/serve_load_drain_r05.json" || true ) &
LOAD=$!
sleep 6   # let requests queue
kill -TERM "$(cat /tmp/serve.pid)"
wait "$LOAD" || true
# the server must finish in-flight work, then exit cleanly
for i in $(seq 1 120); do
    ps -p "$(cat /tmp/serve.pid)" > /dev/null 2>&1 || break
    sleep 5
done
tail -3 /tmp/serve_r5.log
echo "[runbook] done"

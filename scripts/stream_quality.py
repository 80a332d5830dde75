"""Streaming-vs-whole-utterance quality measurement (VERDICT round 2 #7).

`--stream_chunk_s` serving (storm_tpu/utils/streaming.py) enhances long
recordings in fixed crossfaded chunks with per-chunk normalization — fixed
device memory instead of the reference's whole-utterance growth
(sgmse/model.py:720-767). The mechanical behavior is tested; this script
measures what the chunking COSTS perceptually: SI-SDR/ESTOI of streamed vs
whole-utterance enhancement of long (>= 60 s) synthetic utterances on a
converged checkpoint.

    python scripts/stream_quality.py --ckpt <dir> [--dur_s 64] [--n_files 4]
        [--chunk_s 4] [--overlap_s 0.5] [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from make_synth_corpus import SR, make_noise, make_utterance  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dur_s", type=float, default=64.0)
    ap.add_argument("--n_files", type=int, default=4)
    ap.add_argument("--chunk_s", type=float, default=4.0)
    ap.add_argument("--overlap_s", type=float, default=0.5)
    ap.add_argument("--snr_db", type=float, default=5.0)
    ap.add_argument("--N", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None)
    ap.add_argument("--quant", default=None, choices=("int8",),
                    help="serve both sides with W8A8 int8 (production "
                    "serving config; calibrated on crops of the test noise)")
    ap.add_argument("--quant_min_channels", type=int, default=128)
    ap.add_argument("--deepcache", type=int, default=0,
                    help="deep-feature cache refresh interval K "
                    "(production default in bench.py is 3)")
    ap.add_argument("--dtype", default="checkpoint",
                choices=("checkpoint", "float32", "bfloat16"),
                help="serving compute dtype override: bfloat16 is the production serving program (bench.py); default keeps the checkpoint training dtype (reference-exact)")
    ap.add_argument("--deepcache_depth", type=int, default=1)
    ap.add_argument("--timeit", action="store_true",
                    help="also measure steady-state chunked-serving "
                    "throughput (audio-s/s): re-streams every file once "
                    "after the quality pass absorbed all compiles")
    args = ap.parse_args()

    import jax

    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])
    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
    enable_jax_compilation_cache()
    from storm_tpu.ckpt import load_checkpoint
    from storm_tpu.models.factory import build_model
    from storm_tpu.utils.inference import BucketedEnhancer
    from storm_tpu.utils.metrics import si_sdr
    from storm_tpu.utils.stoi import stoi
    from storm_tpu.utils.streaming import stream_enhance

    config, state = load_checkpoint(args.ckpt)
    config = dict(config)
    if args.dtype != "checkpoint":
        config["dtype"] = args.dtype
    model = build_model(dict(config))
    params = state.ema_params

    rng = np.random.default_rng(args.seed)
    pairs = []
    for _ in range(args.n_files):
        x = make_utterance(rng, args.dur_s)
        n = make_noise(rng, len(x))
        g = np.sqrt((x**2).mean() / ((n**2).mean() * 10 ** (args.snr_db / 10)))
        y = (x + g * n).astype(np.float32)
        pairs.append((x.astype(np.float32), y))

    quant = None
    if args.quant == "int8":
        from storm_tpu.models import quant as quant_mod

        # calibrate on 8-s crops of the test noise (same trajectory-
        # calibration recipe as nfe_quality.py; full 64-s rows would not
        # fit the calibration batch in HBM)
        hop = model.stft_config.hop_length
        L = -(-8 * SR // (64 * hop)) * (64 * hop)
        y_cal = np.stack([y[:L] for _, y in pairs[:4]]).astype(np.float32)
        kcal = jax.random.PRNGKey(args.seed + 1)
        quant = quant_mod.calibrate_storm(
            model, params, y_cal, kcal, N=10,
            min_channels=args.quant_min_channels)
        n_q = sum(quant_mod.num_quantized_convs(v) for v in quant.values())
        if n_q == 0:
            raise SystemExit("--quant int8 quantized 0 convs; lower "
                             "--quant_min_channels")
        print(f"int8 calibration done ({n_q} convs quantized)")

    serve_kw = dict(sampler_type="pc", N=args.N, corrector="none",
                    quant=quant)
    if args.deepcache:
        serve_kw.update(deepcache=args.deepcache,
                        deepcache_depth=args.deepcache_depth)

    # Streaming batches fixed-size chunks (minibatch=args.batch); the
    # whole-utterance side must run batch 1 — BucketedEnhancer row-pads
    # every call to `minibatch`, and 8 rows x 64 s does not fit in HBM.
    enhancer = BucketedEnhancer(model, params, minibatch=args.batch,
                                **serve_kw)
    whole_enhancer = BucketedEnhancer(model, params, minibatch=1,
                                      **serve_kw)

    rows = []
    key = jax.random.PRNGKey(args.seed)
    for i, (x, y) in enumerate(pairs):
        key, k1, k2 = jax.random.split(key, 3)
        xw, _ = whole_enhancer(y, k1)
        xw = np.asarray(xw)[: len(x)]
        xs, _ = stream_enhance(
            enhancer, y, k2,
            chunk_samples=int(args.chunk_s * SR),
            overlap_samples=int(args.overlap_s * SR),
            max_batch=args.batch,
        )
        xs = np.asarray(xs)[: len(x)]
        row = {
            "file": i,
            "noisy_sisdr": float(si_sdr(x, y)),
            "whole_sisdr": float(si_sdr(x, xw)),
            "stream_sisdr": float(si_sdr(x, xs)),
            "noisy_estoi": float(stoi(x, y, SR, extended=True)),
            "whole_estoi": float(stoi(x, xw, SR, extended=True)),
            "stream_estoi": float(stoi(x, xs, SR, extended=True)),
        }
        rows.append(row)
        print(json.dumps(row))

    def mean(k):
        return float(np.mean([r[k] for r in rows]))

    stream_tput = None
    if args.timeit:
        # the quality loop above absorbed every (row, bucket) compile; this
        # pass re-streams the same audio timed (np.asarray = device sync)
        import time as _time

        key_t = jax.random.PRNGKey(args.seed + 2)
        t0 = _time.perf_counter()
        audio = 0.0
        for x, y in pairs:
            key_t, k = jax.random.split(key_t)
            xs_t, _ = stream_enhance(
                enhancer, y, k,
                chunk_samples=int(args.chunk_s * SR),
                overlap_samples=int(args.overlap_s * SR),
                max_batch=args.batch,
            )
            _ = np.asarray(xs_t)
            audio += len(x) / SR
        stream_tput = round(audio / (_time.perf_counter() - t0), 2)
        print(f"chunked-serving throughput: {stream_tput} audio-s/s")

    summary = {
        "dur_s": args.dur_s, "chunk_s": args.chunk_s,
        "overlap_s": args.overlap_s, "N": args.N,
        "quant": args.quant, "deepcache": args.deepcache,
        "deepcache_depth": args.deepcache_depth if args.deepcache else None,
        "noisy": [mean("noisy_sisdr"), mean("noisy_estoi")],
        "whole": [mean("whole_sisdr"), mean("whole_estoi")],
        "stream": [mean("stream_sisdr"), mean("stream_estoi")],
        "delta_sisdr": mean("stream_sisdr") - mean("whole_sisdr"),
        "delta_estoi": mean("stream_estoi") - mean("whole_estoi"),
        "stream_audio_s_per_s": stream_tput,
    }
    print("SUMMARY " + json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()

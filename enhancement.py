"""File-to-file enhancement CLI.

Same flag surface as the reference enhancement.py:25-72 (which, as
committed, has NameErrors — tqdm.tqdm/torchaudio.load after from-imports;
this CLI just works). Enhancement runs through the model's jitted program
with a bucketed compile cache for variable-length utterances; EMA (shadow)
parameters are used, like `model.eval(no_ema=False)` in the reference.
"""
from __future__ import annotations

import argparse
import glob
import os
import time






def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--test_dir", type=str, required=True,
                        help="Directory containing corrupted .wav files to enhance.")
    parser.add_argument("--enhanced_dir", type=str, required=True,
                        help="Where to write the cleaned files.")
    parser.add_argument("--ckpt", type=str, required=True,
                        help="Checkpoint directory (from train.py).")
    parser.add_argument("--mode", required=True,
                        choices=["score-only", "denoiser-only", "storm",
                                 "distill"])
    parser.add_argument("--sampler", type=str,
                        choices=("pc", "ode", "picard"), default="pc",
                        help="pc: predictor-corrector (reference default); "
                        "ode: deterministic probability-flow integrator — "
                        "with --ode-method etd2 this reaches comparable "
                        "quality at far fewer steps (see BASELINE.md); "
                        "picard: parallel-in-time probability flow (single-"
                        "file latency lever, --sweeps)")
    parser.add_argument("--predictor", type=str, default="reverse_diffusion",
                        choices=("reverse_diffusion", "euler_maruyama",
                                 "etd", "none"),
                        help="pc sampler predictor (model.enhance contract, "
                        "sgmse/model.py:649-669); etd is this framework's "
                        "exponential stochastic integrator")
    parser.add_argument("--corrector", type=str,
                        choices=("ald", "langevin", "none"), default="ald")
    parser.add_argument("--corrector-steps", dest="corrector_steps",
                        type=int, default=1)
    parser.add_argument("--snr", type=float, default=0.5)
    parser.add_argument("--N", type=int, default=50)
    parser.add_argument("--ode-method", dest="ode_method", type=str,
                        default="etd2",
                        choices=("euler", "heun", "rk4", "etd1", "etd2",
                                 "etd2-ms", "rk45"),
                        help="integrator for --sampler ode; rk45 is the "
                        "adaptive error-controlled Dormand-Prince pair "
                        "matching the reference's scipy solve_ivp RK45 "
                        "(sgmse/sampling/__init__.py:126-129) — it chooses "
                        "its own step count per utterance from --rtol/--atol "
                        "and ignores --N")
    parser.add_argument("--rtol", type=float, default=1e-5,
                        help="relative tolerance for --ode-method rk45 "
                        "(reference default 1e-5)")
    parser.add_argument("--atol", type=float, default=1e-5,
                        help="absolute tolerance for --ode-method rk45 "
                        "(reference default 1e-5)")
    parser.add_argument("--sweeps", type=int, default=8,
                        help="Picard iterations for --sampler picard")
    parser.add_argument("--dtype", default="checkpoint",
                    choices=("checkpoint", "float32", "bfloat16"),
                    help="serving compute dtype override: bfloat16 is the production serving program (bench.py); default keeps the checkpoint training dtype (reference-exact)")
    parser.add_argument("--no-ema", action="store_true",
                        help="use raw instead of EMA parameters")
    parser.add_argument("--timeit", action="store_true",
                        help="report RTF per file")
    parser.add_argument("--batch", type=int, default=1,
                        help="serving mode: group same-length-bucket files "
                        "into batches of up to this size for throughput")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard serving batches over ALL visible "
                        "devices (1-D mesh, batch-split; params replicated) "
                        "— implies batched serving")
    parser.add_argument("--seq_parallel", type=int, default=0,
                        help="model-parallel serving: shard each "
                        "spectrogram's time-frame axis over this many "
                        "devices for the whole reverse diffusion (latency "
                        "axis; GSPMD halo exchange). Composes with "
                        "--data_parallel on the remaining devices")
    parser.add_argument("--quant", default=None, choices=("int8",),
                        help="post-training W8A8 int8 serving: calibrates "
                        "activation scales on the first files, then runs "
                        "the large NCSN++ convs on the MXU's int8 path "
                        "(TPU perf feature, storm_tpu/models/quant.py)")
    parser.add_argument("--quant_min_channels", type=int, default=128,
                        help="int8 coverage threshold: convs whose in AND "
                        "out channel counts are >= this run int8; smaller "
                        "(quality-critical) convs stay bf16")
    parser.add_argument("--stream_chunk_s", type=float, default=0.0,
                        help="long-form streaming mode: enhance in fixed "
                        "chunks of this many seconds (crossfaded, fixed "
                        "device memory; storm_tpu/utils/streaming.py). "
                        "0 = whole-utterance (reference behavior)")
    parser.add_argument("--stream_overlap_s", type=float, default=0.5,
                        help="crossfaded overlap between streaming chunks")
    parser.add_argument("--deepcache", type=int, default=0,
                        help="deep-feature cache refresh interval for the "
                        "pc/ode samplers (DeepCache-style, "
                        "arXiv:2312.00858): "
                        "refresh the score net's deep U-Net features every "
                        "K steps and recompute only the top levels per "
                        "score eval. 0 = off (exact reference trajectory); "
                        "quality vs K measured in BASELINE.md")
    parser.add_argument("--deepcache_depth", type=int, default=1,
                        help="number of top U-Net levels recomputed per "
                        "cached score eval (--deepcache)")
    args = parser.parse_args()
    if args.data_parallel and args.batch <= 1:
        args.batch = 8

    import jax

    # sitecustomize latches the platform into jax.config, so an env var
    # alone cannot move this CLI off the TPU (used by CI/tests); see
    # train.py for the same override
    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])
    import numpy as np

    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
    enable_jax_compilation_cache()

    from storm_tpu.ckpt import load_checkpoint
    from storm_tpu.data.audio import load_wav, save_wav
    from storm_tpu.models.factory import build_model
    from storm_tpu.utils.inference import BucketedEnhancer

    os.makedirs(args.enhanced_dir, exist_ok=True)
    model_sr = 16000
    print(f"backend={jax.default_backend()}")

    config, state = load_checkpoint(args.ckpt)
    # CLI --mode overrides/validates the checkpoint's training mode
    ckpt_mode = config.get("mode", "regen-joint-training")
    expected = {"storm": ("regen-joint-training", "regen-freeze-denoiser"),
                "score-only": ("score-only",),
                "denoiser-only": ("denoiser-only",),
                "distill": ("distill",)}[args.mode]
    if ckpt_mode not in expected:
        raise SystemExit(
            f"--mode {args.mode} incompatible with checkpoint mode {ckpt_mode}"
        )
    config = dict(config)
    if args.dtype != "checkpoint":
        config["dtype"] = args.dtype
    model = build_model(dict(config))
    params = state.params if args.no_ema else state.ema_params

    noisy_files = sorted(glob.glob(os.path.join(args.test_dir, "*.wav")))
    if not noisy_files:
        raise SystemExit(f"no .wav files in {args.test_dir}")

    key = jax.random.PRNGKey(0)

    spatial_channels = int(config.get("spatial_channels", 1))

    def load_checked(path):
        y, sample_sr = load_wav(path)
        assert sample_sr == model_sr, (
            "You need to make sure sample_sr matches model_sr "
            "--> resample to 16kHz"
        )
        if spatial_channels > 1:
            if y.shape[0] < spatial_channels:
                raise SystemExit(
                    f"{path}: has {y.shape[0]} channels, model needs "
                    f"{spatial_channels}"
                )
            return y[:spatial_channels]  # (D, T)
        return y[0]

    quant = None
    if args.quant == "int8":
        from storm_tpu.utils.serving import calibrate_or_load_scales

        key, kcal = jax.random.split(key)
        quant = calibrate_or_load_scales(
            model, params, args.mode, args.ckpt,
            lambda: [load_checked(f) for f in noisy_files[:4]], kcal,
            N=args.N, min_channels=args.quant_min_channels,
            stream_chunk_s=args.stream_chunk_s,
            params_source="raw" if args.no_ema else "ema",
            model_sr=model_sr,
        )

    from storm_tpu.utils.serving import load_gagnet_batch_stats
    batch_stats = load_gagnet_batch_stats(args.ckpt, params)

    enhancer = BucketedEnhancer(
        model, params,
        minibatch=args.batch if args.batch > 1 else None,
        data_parallel=args.data_parallel, seq_parallel=args.seq_parallel,
        sampler_type=args.sampler, predictor=args.predictor,
        corrector=args.corrector, corrector_steps=args.corrector_steps,
        snr=args.snr, N=args.N, method=args.ode_method, sweeps=args.sweeps,
        rtol=args.rtol, atol=args.atol,
        quant=quant, batch_stats=batch_stats,
        deepcache=args.deepcache, deepcache_depth=args.deepcache_depth,
    )
    args.batch = max(args.batch, enhancer.minibatch or 1)

    if args.stream_chunk_s > 0:
        # fixed-memory long-form path: every file is enhanced in crossfaded
        # fixed-length chunks; all files share ONE compiled shape
        from storm_tpu.utils.streaming import stream_enhance

        if enhancer.minibatch is None:
            enhancer.minibatch = 8
        for f in noisy_files:
            y = load_checked(f)
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            x_hat, nfe = stream_enhance(
                enhancer, y, k,
                chunk_samples=int(args.stream_chunk_s * model_sr),
                overlap_samples=int(args.stream_overlap_s * model_sr),
                max_batch=enhancer.minibatch,
            )
            elapsed = time.perf_counter() - t0
            out = os.path.join(args.enhanced_dir, os.path.basename(f))
            save_wav(out, x_hat, model_sr)
            if args.timeit:
                rtf = elapsed / (x_hat.shape[-1] / model_sr)
                print(f"{os.path.basename(f)}: nfe={nfe} rtf={rtf:.4f}")
            else:
                print(os.path.basename(f))
        return

    if args.batch <= 1:
        for f in noisy_files:
            y = load_checked(f)
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            x_hat, nfe = enhancer(y, k)
            x_hat = np.asarray(x_hat)
            elapsed = time.perf_counter() - t0
            out = os.path.join(args.enhanced_dir, os.path.basename(f))
            save_wav(out, x_hat, model_sr)
            if args.timeit:
                rtf = elapsed / (x_hat.shape[-1] / model_sr)
                print(f"{os.path.basename(f)}: nfe={nfe} rtf={rtf:.4f}")
            else:
                print(os.path.basename(f))
        return

    # serving mode: group files by padded-length bucket (lengths probed
    # first — waveforms are loaded per group, not held all in memory), then
    # run groups of `--batch` through the enhancer, whose `minibatch` row
    # padding keeps one compiled shape per bucket even for ragged tails.
    # Reverse-diffusion compute is embarrassingly batch-parallel; batching
    # raises chip utilization ~3x at 27.8M-param NCSN++ sizes.
    def probe_len(path):
        try:
            from storm_tpu import native

            if native.available():
                _sr, _ch, n = native.wav_info(path)
                return int(n)
        except Exception:
            pass
        return load_checked(path).shape[-1]

    buckets = {}
    for f in noisy_files:
        buckets.setdefault(enhancer.padded_len(probe_len(f)), []).append(f)

    for padded, files in sorted(buckets.items()):
        for i in range(0, len(files), args.batch):
            group = files[i : i + args.batch]
            waves = [load_checked(f) for f in group]  # (T,) or (D, T)
            ys = np.stack([
                np.pad(y, [(0, 0)] * (y.ndim - 1)
                       + [(0, padded - y.shape[-1])])
                for y in waves
            ])
            key, k = jax.random.split(key)
            t0 = time.perf_counter()
            x_hats, nfe = enhancer(ys, k)
            elapsed = time.perf_counter() - t0
            audio_sec = sum(y.shape[-1] for y in waves) / model_sr
            for f, y, x_hat in zip(group, waves, np.asarray(x_hats)):
                out = os.path.join(args.enhanced_dir, os.path.basename(f))
                save_wav(out, x_hat[..., : y.shape[-1]], model_sr)
                print(os.path.basename(f))
            if args.timeit:
                print(f"  batch of {len(group)}: nfe={nfe} "
                      f"rtf={elapsed / audio_sec:.4f}")


if __name__ == "__main__":
    main()

"""Benchmark harness: StoRM enhancement throughput on one chip.

Primary metric (BASELINE.md): audio-seconds enhanced per wall-clock second
per chip at 50-step PC sampling with the reference CLI defaults
(reverse-diffusion predictor + 1 ald corrector step -> NFE=101 NCSN++
forwards per utterance, enhancement.py:33-36). Serving runs the production
configuration: W8A8 int8 PTQ convs (quality-neutral, BASELINE.md "int8
quality parity") + deep-feature caching at interval 3 (measured
quality-SUPERIOR to the exact trajectory on the converged production-width
model, BASELINE.md deepcache table). `--quant none` measures bf16;
`--deepcache 0` measures the exact reference trajectory.

`vs_baseline` is the ratio against the driver's north-star target of
10x real-time per chip (BASELINE.json).

Prints ONE JSON line.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np






def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=256,
                    help="STFT frames per utterance (256 ~ 2.04 s)")
    ap.add_argument("--N", type=int, default=50, help="reverse steps")
    ap.add_argument("--corrector", default="ald")
    ap.add_argument("--corrector-steps", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--train", action="store_true",
                    help="measure training throughput (joint StoRM step) "
                    "instead of enhancement")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the timed region to "
                    "DIR (TensorBoard-viewable). NOTE: the tunneled axon "
                    "backend in this CI crashes under the profiler — use on "
                    "standard TPU runtimes")
    ap.add_argument("--nf", type=int, default=None,
                    help="override backbone width (default: full 27.8M)")
    ap.add_argument("--backbone", default="ncsnpp",
                    help="registered backbone name for BOTH denoiser and "
                    "score nets (e.g. ncsnpplarge for the 65M config)")
    ap.add_argument("--quant", default="int8", choices=["none", "int8"],
                    help="serving quantization (default int8 W8A8 PTQ — "
                    "quality-neutral on a converged model, see BASELINE.md "
                    "int8 quality parity table; 'none' = bf16 serving)")
    ap.add_argument("--deepcache", type=int, default=3,
                    help="deep-feature cache refresh interval "
                    "(DeepCache-style, arXiv:2312.00858). Default 3 = "
                    "production serving config — measured quality-superior "
                    "to the exact trajectory on the converged production-"
                    "width model (BASELINE.md deepcache table); 0 = exact")
    ap.add_argument("--deepcache_depth", type=int, default=1)
    ap.add_argument("--distill", action="store_true",
                    help="measure distilled one-step serving (NFE=2: "
                    "denoiser + one-shot student, models/distill.py) "
                    "instead of the N-step sampler. Throughput is "
                    "weight-independent, so random weights measure the "
                    "same program a trained student serves")
    args = ap.parse_args()

    # soft wall-clock budget for the OPTIONAL extras (XLA cost analysis,
    # the secondary NFE=31 measurement): on days when the tunneled remote
    # compiler is slow (cold compiles here range 30 s .. 10 min), the
    # primary JSON line must never be starved by a nice-to-have detail
    # field. The primary measurement itself always runs to completion.
    t_start = time.perf_counter()
    import os
    import sys
    try:
        extras_budget_s = float(
            os.environ.get("STORM_TPU_BENCH_BUDGET_S", "1800"))
    except ValueError:
        # a malformed override must degrade to the default, never kill the
        # primary measurement (ADVICE round 3)
        print("warning: ignoring malformed STORM_TPU_BENCH_BUDGET_S="
              f"{os.environ['STORM_TPU_BENCH_BUDGET_S']!r}; using 1800",
              file=sys.stderr)
        extras_budget_s = 1800.0

    def extras_allowed():
        return time.perf_counter() - t_start < extras_budget_s

    # honor the CPU-test platform override like every other CLI
    # (train.py/evaluate.py/enhancement.py) — the sitecustomize preload
    # latches the tunneled-TPU backend otherwise
    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])

    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
    enable_jax_compilation_cache()
    from storm_tpu.models import StochasticRegenerationModel

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    extra = {"nf": args.nf} if args.nf else {}
    model = StochasticRegenerationModel.create(
        backbone_denoiser=args.backbone, backbone_score=args.backbone,
        sde="ouve", dtype=dtype, **extra,
    )

    import contextlib

    def profiled():
        if args.profile:
            return jax.profiler.trace(args.profile)
        return contextlib.nullcontext()

    sr = 16000
    hop = model.stft_config.hop_length
    num_samples = (args.frames - 1) * hop  # reference crop formula
    audio_sec = args.batch * num_samples / sr

    if args.train:
        spec_shape = (args.batch, model.stft_config.num_freqs, args.frames)
        state = model.init_state(jax.random.PRNGKey(0), spec_shape)
        kx, ky = jax.random.split(jax.random.PRNGKey(1))
        batch = (
            jax.random.normal(kx, spec_shape + (2,)) * 0.1,
            jax.random.normal(ky, spec_shape + (2,)) * 0.1,
        )
        # donation + on-device per-step RNG match the production train loop
        # (train.py): previous step's params/opt-state buffers are reused in
        # place and no host key split is dispatched per step
        step = model.make_train_step(donate=True, fold_step_rng=True)
        epoch_key = jax.random.PRNGKey(2)
        state, aux = step(state, batch, epoch_key)
        _ = float(aux["loss"])
        times = []
        with profiled():
            for i in range(args.reps):
                t0 = time.perf_counter()
                for _j in range(5):
                    state, aux = step(state, batch, epoch_key)
                _ = float(aux["loss"])
                times.append((time.perf_counter() - t0) / 5)
        wall = min(times)
        print(json.dumps({
            "metric": "train_utt_per_sec_per_chip",
            "value": round(args.batch / wall, 2),
            "unit": "utterances/s/chip",
            "vs_baseline": None,
            "detail": {
                "batch": args.batch, "frames": args.frames,
                "step_ms": round(wall * 1000, 1), "dtype": args.dtype,
                "backend": jax.default_backend(),
                "backbone": args.backbone,
            },
        }))
        return

    params = model.init_params(jax.random.PRNGKey(0), (1, 256, 64))
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, num_samples))
        * 0.1,
        jnp.float32,
    )
    key = jax.random.PRNGKey(1)

    if args.distill:
        from storm_tpu.models.distill import DistilledModel

        dmodel = DistilledModel(storm=model)
        dquant = None
        if args.quant == "int8":
            from storm_tpu.models.quant import (calibrate_distill,
                                                num_quantized_convs)
            dquant = calibrate_distill(dmodel, params, y[:4],
                                       jax.random.PRNGKey(7))
            nq = {k: num_quantized_convs(v) for k, v in dquant.items()}
            print(f"int8-quantized convs (distill): {nq}", file=sys.stderr)
        enhance2 = dmodel.make_enhance(quant=dquant)
        x_hat, nfe = enhance2(params, y, key)
        _ = np.asarray(x_hat)
        times = []
        with profiled():
            for i in range(args.reps):
                t0 = time.perf_counter()
                x_hat, nfe = enhance2(params, y, jax.random.PRNGKey(i + 2))
                _ = np.asarray(x_hat)
                times.append(time.perf_counter() - t0)
        wall = min(times)
        value = audio_sec / wall
        print(json.dumps({
            "metric": "audio_sec_per_sec_per_chip_distill_nfe2",
            "value": round(value, 2),
            "unit": "audio-sec/s/chip",
            "vs_baseline": round(value / 10.0, 3),
            "detail": {
                "batch": args.batch, "nfe": int(nfe),
                "wall_s": round(wall, 4), "dtype": args.dtype,
                "quant": args.quant,
                "backend": jax.default_backend(),
            },
        }))
        return

    quant = None
    if args.quant == "int8":
        from storm_tpu.models.quant import calibrate_storm, num_quantized_convs
        quant = calibrate_storm(model, params, y[:4], jax.random.PRNGKey(7),
                                N=min(args.N, 10), num_probe=4)
        nq = {k: num_quantized_convs(v) for k, v in quant.items()}
        print(f"int8-quantized convs: {nq}", file=sys.stderr)

    enhance = model.make_enhance(
        num_samples,
        N=args.N,
        corrector=args.corrector,
        corrector_steps=args.corrector_steps,
        quant=quant,
        deepcache=args.deepcache,
        deepcache_depth=args.deepcache_depth,
    )

    # compile + warmup. NOTE: block_until_ready does not reliably block on
    # the tunneled backend — synchronize via an explicit device->host
    # transfer instead.
    x_hat, nfe = enhance(params, y, key)
    _ = np.asarray(x_hat)

    def compiled_flops(fn, *a):
        """XLA's own FLOP count for the compiled program (None if the
        backend doesn't report one) — grounds the achieved-TFLOP/s number
        printed in `detail` without hand-counting conv shapes."""
        try:
            ca = fn.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"])
        except Exception:
            return None

    flops = (compiled_flops(enhance, params, y, key)
             if extras_allowed() else None)

    times = []
    with profiled():
        for i in range(args.reps):
            k = jax.random.PRNGKey(i + 2)
            t0 = time.perf_counter()
            x_hat, nfe = enhance(params, y, k)
            _ = np.asarray(x_hat)
            times.append(time.perf_counter() - t0)

    # also measure the model's own default serving schedule (N=30, no
    # corrector, NFE=31 — sgmse/model.py:720-721), which matches the
    # NFE=101 config in quality on a converged model (BASELINE.md) — the
    # quality-parity serving number, reported in `detail`
    nfe31 = None
    if (not args.train and args.N == 50 and args.corrector == "ald"
            and extras_allowed()):
        try:
            enhance31 = model.make_enhance(
                num_samples, N=30, corrector="none", quant=quant,
                deepcache=args.deepcache,
                deepcache_depth=args.deepcache_depth)
            x_hat, _ = enhance31(params, y, jax.random.PRNGKey(99))
            _ = np.asarray(x_hat)
            t31 = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                x_hat, _ = enhance31(params, y, jax.random.PRNGKey(100 + i))
                _ = np.asarray(x_hat)
                t31.append(time.perf_counter() - t0)
            nfe31 = round(audio_sec / min(t31), 2)
        except Exception as e:
            # secondary metric must never sink the run — but a real
            # regression in the quality-parity config must stay visible
            # (ADVICE round 3), so log it instead of printing bare null
            print(f"nfe31 measurement skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
            nfe31 = None

    # when the headline runs the approximate deepcache trajectory, also
    # measure the EXACT (deepcache=0) trajectory at the same schedule so
    # BENCH_r*.json self-documents both numbers (VERDICT round 3 #3c)
    exact_nfe = None
    if args.deepcache and extras_allowed():
        try:
            enhance_exact = model.make_enhance(
                num_samples, N=args.N, corrector=args.corrector,
                corrector_steps=args.corrector_steps, quant=quant,
                deepcache=0)
            x_hat, _ = enhance_exact(params, y, jax.random.PRNGKey(200))
            _ = np.asarray(x_hat)
            te = []
            for i in range(args.reps):
                t0 = time.perf_counter()
                x_hat, _ = enhance_exact(params, y, jax.random.PRNGKey(201 + i))
                _ = np.asarray(x_hat)
                te.append(time.perf_counter() - t0)
            exact_nfe = round(audio_sec / min(te), 2)
        except Exception as e:
            print(f"exact-trajectory measurement skipped: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            exact_nfe = None

    wall = min(times)
    value = audio_sec / wall  # audio-sec per second per chip
    target = 10.0  # north-star: >=10x real-time per chip
    print(json.dumps({
        "metric": "audio_sec_per_sec_per_chip_50step_pc",
        "value": round(value, 2),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / target, 3),
        "detail": {
            "batch": args.batch,
            "utt_sec": round(num_samples / sr, 3),
            "N": args.N,
            "nfe": int(nfe),
            "wall_s": round(wall, 4),
            "rtf_inv": round(value / args.batch, 2),
            "dtype": args.dtype,
            "backend": jax.default_backend(),
            "storm_default_nfe31_audio_sec_per_sec": nfe31,
            # exact (deepcache=0) trajectory at the same schedule; None when
            # the headline itself is exact or the extras budget ran out
            "exact_nfe101_audio_sec_per_sec": exact_nfe,
            "quant": args.quant,
            "deepcache": args.deepcache,
            "deepcache_depth": args.deepcache_depth,
            "backbone": args.backbone,
            "program_tflops": (round(flops / 1e12, 3)
                               if flops is not None else None),
            "achieved_tflops_per_s": (round(flops / wall / 1e12, 2)
                                      if flops is not None else None),
        },
    }))


if __name__ == "__main__":
    main()

"""Quality-vs-NFE sweep: PC sampler vs exponential integrators.

Produces the SI-SDR/ESTOI vs NFE table for BASELINE.md (VERDICT round-1
item 3): on a converged checkpoint, compare the reference's PC schedules
against this framework's ETD/Heun probability-flow integrators at low NFE.

    python scripts/nfe_quality.py --ckpt <dir> --base_dir <corpus> \
        [--num_files 16] [--json out.json]

Config grid (NFE = backbone evals per utterance, incl. 1 denoiser pass for
storm modes; sampling/__init__.py:65 accounting):
    pc   N=50 ald x1   (CLI default, NFE=101)
    pc   N=50 none     (NFE=51)
    pc   N=30 none     (StoRM enhance default, NFE=31)
    ode  heun  N=20    (NFE=41)
    ode  etd2  N=20    (NFE=41)
    ode  etd2  N=10    (NFE=21)
    ode  etd1  N=10    (NFE=11)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("pc N=50 ald", dict(sampler_type="pc", N=50, corrector="ald",
                         corrector_steps=1)),
    ("pc N=50 none", dict(sampler_type="pc", N=50, corrector="none")),
    ("pc N=30 none", dict(sampler_type="pc", N=30, corrector="none")),
    ("ode heun N=20", dict(sampler_type="ode", N=20, method="heun")),
    ("ode etd2 N=20", dict(sampler_type="ode", N=20, method="etd2")),
    ("ode etd2 N=10", dict(sampler_type="ode", N=10, method="etd2")),
    ("ode etd1 N=10", dict(sampler_type="ode", N=10, method="etd1")),
    ("ode etd2-ms N=20", dict(sampler_type="ode", N=20, method="etd2-ms")),
    ("ode etd2-ms N=10", dict(sampler_type="ode", N=10, method="etd2-ms")),
    # adaptive error-controlled integrator (VERDICT round-4 next #4): the
    # reference ODE path's actual behavior (scipy solve_ivp RK45 at
    # rtol=atol=1e-5, sgmse/sampling/__init__.py:126-129). NFE is
    # self-chosen per utterance from the tolerance; the reported nfe column
    # is the mean over eval batches.
    ("ode rk45 tol=1e-5", dict(sampler_type="ode", N=30, method="rk45",
                               rtol=1e-5, atol=1e-5)),
    ("ode rk45 tol=1e-3", dict(sampler_type="ode", N=30, method="rk45",
                               rtol=1e-3, atol=1e-3)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--base_dir", required=True)
    ap.add_argument("--format", default="wsj0")
    ap.add_argument("--num_files", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bucket_frames", type=int, default=128,
                    help="compile-bucket granularity (coarser = fewer "
                    "compiles, more padding)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quant", default=None, choices=("int8",),
                    help="run every config with W8A8 int8 serving "
                    "(models/quant.py) — for bf16-vs-int8 quality deltas")
    ap.add_argument("--quant_min_channels", type=int, default=128,
                    help="quantize convs with >= this many in/out channels "
                    "(default 128 = production; lower it for narrow toy "
                    "models, e.g. 32 for an nf=32 net, or NOTHING gets "
                    "quantized and the \"int8\" run silently measures bf16)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated substrings: only run configs "
                    "whose name matches one (e.g. 'pc N=30,pc N=50 ald')")
    ap.add_argument("--deepcache", type=int, default=0,
                    help="deep-feature cache refresh interval for pc/ode "
                    "configs (DeepCache-style; etd2-ms and picard configs "
                    "are skipped when set — no cache support)")
    ap.add_argument("--dtype", default="checkpoint",
                choices=("checkpoint", "float32", "bfloat16"),
                help="serving compute dtype override: bfloat16 is the production serving program (bench.py); default keeps the checkpoint training dtype (reference-exact)")
    ap.add_argument("--deepcache_depth", type=int, default=1)
    ap.add_argument("--timeit", action="store_true",
                    help="also measure steady-state audio-s/s per config "
                    "(re-runs the batches once after the compile-absorbing "
                    "quality pass)")
    args = ap.parse_args()

    import jax

    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])
    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
    enable_jax_compilation_cache()
    from storm_tpu.ckpt import load_checkpoint
    from storm_tpu.data.datamodule import SpecsDataModule
    from storm_tpu.models.factory import build_model
    from storm_tpu.utils.inference import BucketedEnhancer
    from storm_tpu.utils.metrics import si_sdr
    from storm_tpu.utils.stoi import stoi

    config, state = load_checkpoint(args.ckpt)
    config = dict(config)
    if args.dtype != "checkpoint":
        config["dtype"] = args.dtype
    model = build_model(dict(config))
    params = state.ema_params

    dm = SpecsDataModule(base_dir=args.base_dir, format=args.format)
    dm.setup("test")
    n = min(args.num_files, len(dm.test_set))
    items = [dm.test_set.__getitem__(i, raw=True) for i in range(n)]
    xs = [it[0][0] for it in items]
    ys = [it[1][0] for it in items]
    noisy_sisdr = float(np.mean([si_sdr(x, y) for x, y in zip(xs, ys)]))
    noisy_estoi = float(np.mean(
        [stoi(x, y, 16000, extended=True) for x, y in zip(xs, ys)]
    ))
    print(f"{n} test files; noisy: SI-SDR {noisy_sisdr:.2f} dB, "
          f"ESTOI {noisy_estoi:.3f}")

    quant = None
    if args.quant == "int8":
        from storm_tpu.models import quant as quant_mod

        hop = model.stft_config.hop_length
        L = max(len(y) for y in ys[:4])
        L = -(-L // (64 * hop)) * (64 * hop)
        y_cal = np.stack(
            [np.pad(y, (0, L - len(y))) for y in ys[:4]]
        ).astype(np.float32)
        kcal = jax.random.PRNGKey(args.seed + 1)
        mode = dict(config).get("mode", "regen-joint-training")
        mc = args.quant_min_channels
        if mode.startswith("regen"):
            quant = quant_mod.calibrate_storm(model, params, y_cal, kcal,
                                              N=10, min_channels=mc)
        elif mode == "score-only":
            quant = quant_mod.calibrate_score_model(
                model, params, y_cal, kcal, N=10, min_channels=mc)
        elif mode == "distill":
            quant = quant_mod.calibrate_distill(
                model, params, y_cal, kcal, min_channels=mc)
        else:
            quant = quant_mod.calibrate_discriminative(model, params, y_cal,
                                                       min_channels=mc)
        n_q = sum(quant_mod.num_quantized_convs(v)
                  for v in (quant.values() if isinstance(quant, dict)
                            and "denoiser" in quant else [quant]))
        if n_q == 0:
            raise SystemExit(
                f"--quant int8 quantized 0 convs at min_channels={mc}; "
                "lower --quant_min_channels or the run would silently "
                "measure bf16")
        print(f"int8 calibration done ({n_q} convs quantized)")

    configs = CONFIGS
    if args.configs:
        pats = [p.strip() for p in args.configs.split(",")]
        configs = [(nm, kw) for nm, kw in CONFIGS
                   if any(p in nm for p in pats)]

    if args.deepcache:
        # pc + ode support the cache; etd2-ms/picard do not (samplers.py)
        configs = [(nm, kw) for nm, kw in configs
                   if kw.get("sampler_type") in ("pc", "ode")
                   and kw.get("method") not in ("etd2-ms", "rk45")]
    if not configs:
        raise SystemExit(
            "no configs selected (--configs filter"
            + (" + --deepcache supported-sampler filter"
               if args.deepcache else "")
            + " matched nothing)"
        )

    results = []
    for name, kw in configs:
        if quant is not None:
            name = name + " +int8"
        if args.deepcache:
            name = name + f" +dc{args.deepcache}"
            kw = dict(kw, deepcache=args.deepcache,
                      deepcache_depth=args.deepcache_depth)
        enhancer = BucketedEnhancer(model, params, minibatch=args.batch,
                                    bucket_frames=args.bucket_frames,
                                    quant=quant, **kw)
        key = jax.random.PRNGKey(args.seed)
        # bucket-grouped batched enhancement
        groups = {}
        for i, y in enumerate(ys):
            groups.setdefault(enhancer.padded_len(len(y)), []).append(i)
        x_hats = [None] * n
        nfe = None
        for L, idxs in sorted(groups.items()):
            batch = np.stack(
                [np.pad(ys[i], (0, L - len(ys[i]))) for i in idxs]
            ).astype(np.float32)
            key, k = jax.random.split(key)
            xh, nfe_g = enhancer(batch, k)
            if nfe is None:
                # enhancer sums NFE over minibatch chunks; report per call
                n_chunks = -(-len(idxs) // args.batch)
                nfe = nfe_g // n_chunks
            for j, i in enumerate(idxs):
                x_hats[i] = np.asarray(xh[j])[: len(ys[i])]
        sisdr = float(np.mean([si_sdr(x, xh) for x, xh in zip(xs, x_hats)]))
        estoi = float(np.mean(
            [stoi(x, xh, 16000, extended=True) for x, xh in zip(xs, x_hats)]
        ))
        row = {"config": name, "nfe": int(nfe), "si_sdr": round(sisdr, 2),
               "estoi": round(estoi, 3), **kw}
        if args.timeit:
            # steady-state serving throughput for this config: the quality
            # pass above absorbed every compile, so re-run the same batches
            # timed (device sync via the np.asarray transfer)
            import time as _time

            t0 = _time.perf_counter()
            audio = 0.0
            for L, idxs in sorted(groups.items()):
                batch = np.stack(
                    [np.pad(ys[i], (0, L - len(ys[i]))) for i in idxs]
                ).astype(np.float32)
                key, k = jax.random.split(key)
                xh, _ = enhancer(batch, k)
                _ = np.asarray(xh)
                audio += sum(len(ys[i]) for i in idxs) / 16000.0
            row["audio_s_per_s"] = round(
                audio / (_time.perf_counter() - t0), 2)
        results.append(row)
        print(f"{name:18s} nfe={nfe:4d}  SI-SDR {sisdr:6.2f} dB  "
              f"ESTOI {estoi:.3f}"
              + (f"  {row['audio_s_per_s']} audio-s/s"
                 if "audio_s_per_s" in row else ""))

    tcol = " audio-s/s |" if args.timeit else ""
    print("\n| config | NFE | SI-SDR (dB) | ESTOI |" + tcol)
    print("|---|---|---|---|" + ("---|" if tcol else ""))
    print(f"| noisy input | — | {noisy_sisdr:.2f} | {noisy_estoi:.3f} |"
          + (" — |" if tcol else ""))
    for r in results:
        print(f"| {r['config']} | {r['nfe']} | {r['si_sdr']} | {r['estoi']} |"
              + (f" {r.get('audio_s_per_s', '—')} |" if tcol else ""))

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"noisy": {"si_sdr": noisy_sisdr, "estoi": noisy_estoi},
                       "results": results}, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

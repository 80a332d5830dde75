"""Test-set evaluation CLI: PESQ / SI-SDR / ESTOI (+ optional TIMIT WER).

The reference computes these metrics inside training (util/inference.py:20-71)
and ships a `wer` utility + transcription dataset for the TIMIT use case
(data_module.py:280-330, util/other.py:159-183) but no standalone eval
entry point; this CLI closes that surface:

    python evaluate.py --ckpt <dir> --mode storm --base_dir <corpus> \
        [--format wsj0|timit|...] [--N 30 --sampler pc ...] \
        [--wer --asr_cmd 'whisper-cli {wav}']

- metrics over the test split, mean +/- 95% CI per metric, optional CSV;
- --wer: enhance TIMIT test files, transcribe each enhanced wav with the
  user-provided ASR command ('{wav}' placeholder, stdout = hypothesis) and
  score WER against the dataset transcriptions. No ASR ships with this
  image, so the command is pluggable (tested with a stub).
"""
from __future__ import annotations

import argparse
import csv
import os
import shlex
import subprocess
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--mode", required=True,
                    choices=["score-only", "denoiser-only", "storm"])
    ap.add_argument("--base_dir", required=True)
    ap.add_argument("--format", default="wsj0",
                    choices=["wsj0", "vctk", "dns", "reverb_wsj0", "timit",
                             "voicebank"])
    ap.add_argument("--num_files", type=int, default=0,
                    help="cap on test files (0 = all)")
    ap.add_argument("--sampler", choices=("pc", "ode"), default="pc")
    ap.add_argument("--predictor", default="reverse_diffusion",
                    choices=("reverse_diffusion", "euler_maruyama", "etd",
                             "none"))
    ap.add_argument("--corrector", choices=("ald", "langevin", "none"),
                    default="ald")
    ap.add_argument("--corrector-steps", dest="corrector_steps", type=int,
                    default=1)
    ap.add_argument("--snr", type=float, default=0.5)
    ap.add_argument("--N", type=int, default=50)
    ap.add_argument("--ode-method", dest="ode_method", default="etd2",
                    choices=("euler", "heun", "rk4", "etd1", "etd2", "etd2-ms"))
    ap.add_argument("--batch", type=int, default=8,
                    help="enhancement minibatch per length bucket")
    ap.add_argument("--no-ema", action="store_true")
    ap.add_argument("--csv", default=None, help="write per-file metrics here")
    ap.add_argument("--wer", action="store_true",
                    help="also compute WER (needs timit-format "
                    "transcriptions/ + --asr_cmd)")
    ap.add_argument("--asr_cmd", default=None,
                    help="shell command with a {wav} placeholder whose "
                    "stdout is the transcript of that wav")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    # sitecustomize latches the platform into jax.config (see train.py)
    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])

    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache
    enable_jax_compilation_cache()
    from storm_tpu.ckpt import load_checkpoint
    from storm_tpu.data.audio import save_wav
    from storm_tpu.data.datamodule import (
        SpecsAndTranscriptionsDataModule,
        SpecsDataModule,
    )
    from storm_tpu.models.factory import build_model
    from storm_tpu.utils.inference import BucketedEnhancer
    from storm_tpu.utils.metrics import Method, pesq_wb, si_sdr, wer
    from storm_tpu.utils.stoi import stoi

    config, state = load_checkpoint(args.ckpt)
    model = build_model(dict(config))
    params = state.params if args.no_ema else state.ema_params

    if args.wer:
        if not args.asr_cmd:
            raise SystemExit("--wer requires --asr_cmd")
        dm = SpecsAndTranscriptionsDataModule(
            base_dir=args.base_dir, format="timit",
        )
    else:
        dm = SpecsDataModule(base_dir=args.base_dir, format=args.format)
    dm.setup("test")
    test_set = dm.test_set
    n = len(test_set) if not args.num_files else min(args.num_files,
                                                     len(test_set))
    print(f"evaluating {n} test files from {args.base_dir}")

    # GaGNet norm_type="BN" running stats (side artifact written by
    # compat/convert.py) — eval-mode BatchNorm for converted checkpoints
    batch_stats = None
    bn_path = os.path.join(args.ckpt, "gagnet_batch_stats.json")
    if os.path.exists(bn_path):
        from storm_tpu.compat.torch_ckpt import load_batch_stats

        batch_stats = load_batch_stats(bn_path)
        print(f"BatchNorm running stats loaded from {bn_path}")

    enhancer = BucketedEnhancer(
        model, params, minibatch=args.batch,
        sampler_type=args.sampler, predictor=args.predictor,
        corrector=args.corrector, corrector_steps=args.corrector_steps,
        snr=args.snr, N=args.N, method=args.ode_method,
        batch_stats=batch_stats,
    )

    metrics = ["pesq", "si_sdr", "estoi"] + (["wer"] if args.wer else [])
    method = Method(name=args.mode, base_dir=args.base_dir, metrics=metrics)
    rows = []
    key = jax.random.PRNGKey(args.seed)

    D = getattr(model, "spatial_channels", 1)
    for i in range(n):
        item = test_set.__getitem__(i, raw=True)
        x, y = item[0], item[1]
        transcription = item[2] if args.wer else None
        x0 = x[0]
        y_in = y if D > 1 else y[0]
        key, k = jax.random.split(key)
        x_hat, _nfe = enhancer(y_in, k)
        x_hat0 = x_hat[0] if D > 1 else x_hat

        row = {
            "file": os.path.basename(test_set.clean_files[i]),
            "pesq": pesq_wb(16000, x0, x_hat0),
            "si_sdr": si_sdr(x0, x_hat0),
            "estoi": stoi(x0, x_hat0, 16000, extended=True),
        }
        if args.wer:
            with tempfile.NamedTemporaryFile(suffix=".wav",
                                             delete=False) as f:
                save_wav(f.name, x_hat0, 16000)
                wav_path = f.name
            try:
                cmd = args.asr_cmd.format(wav=shlex.quote(wav_path))
                hyp = subprocess.run(
                    cmd, shell=True, capture_output=True, text=True,
                    timeout=600,
                ).stdout.strip()
            finally:
                os.unlink(wav_path)
            row["wer"] = wer(transcription.lower().split(),
                             hyp.lower().split())
        for m in metrics:
            method.append(m, row[m])
        rows.append(row)
        print(" ".join(
            [row["file"]] + [f"{m}={row[m]:.3f}" for m in metrics]
        ))

    print("--- mean +/- 95% CI ---")
    for m in metrics:
        mean, h = method.get_mean_ci(m)
        print(f"{m}: {mean:.3f} +/- {h:.3f}")

    if args.csv:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["file"] + metrics)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()

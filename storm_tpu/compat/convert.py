"""CLI: convert a reference Lightning .ckpt into a storm-tpu checkpoint.

    python -m storm_tpu.compat.convert --ckpt storm_wsj0.ckpt \
        --out ./converted/storm_wsj0 --mode storm

The output directory is loadable by enhancement.py / train.py
(--resume_from_checkpoint): orbax state {params, ema_params, opt_state,
step} + config.json. Hyperparameters stored in the torch checkpoint are
mapped onto this framework's config keys where recognizable; anything else
can be overridden with --set key=value.
"""
from __future__ import annotations

import argparse
import json


_HPARAM_KEYS = [
    "backbone", "backbone_denoiser", "backbone_score", "sde", "lr",
    "ema_decay", "t_eps", "loss_type", "loss_type_denoiser",
    "loss_type_score", "weighting_denoiser_to_score", "condition",
    "spatial_channels", "n_fft", "hop_length", "window", "spec_factor",
    "spec_abs_exponent", "theta", "sigma_min", "sigma_max", "beta_min",
    "beta_max", "stiffness",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .ckpt file")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--mode", default="storm",
                    choices=["storm", "score-only", "denoiser-only"])
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", help="config overrides")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ..ckpt import save_checkpoint
    from ..models import init_train_state, make_optimizer
    from ..models.factory import build_model
    from .torch_ckpt import load_reference_checkpoint

    import torch

    raw = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    params, ema, hparams = load_reference_checkpoint(
        args.ckpt, mode=args.mode, ckpt=raw)

    if not jax.tree.leaves(params):
        raise SystemExit(
            f"no parameters found under the expected prefixes for mode "
            f"{args.mode!r} — is this really a {args.mode} checkpoint? "
            "(storm checkpoints use denoiser_net./score_net., score-only "
            "and denoiser-only use dnn.)"
        )

    config = {
        "mode": {"storm": "regen-joint-training"}.get(args.mode, args.mode)
    }
    if args.mode == "storm" and hparams.get("mode"):
        config["mode"] = hparams["mode"]
    for k in _HPARAM_KEYS:
        if k in hparams and isinstance(hparams[k], (int, float, str, bool)):
            config[k] = hparams[k]
    for kv in args.set:
        if "=" not in kv:
            ap.error(f"--set expects KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        try:
            config[k] = json.loads(v)
        except json.JSONDecodeError:
            config[k] = v

    # validate converted tree against the config's model: strict on missing
    # keys and shape mismatches; EXTRA converted leaves are pruned with a
    # notice (the reference builds modules its forward never uses — e.g.
    # the discriminative NCSN++ still constructs temb Dense layers,
    # sgmse/backbones/ncsnpp.py:80-86 + layerspp.py:220-231 — and torch-ema
    # shadows them too; this model simply has no such parameters)
    from jax.tree_util import keystr, tree_flatten_with_path

    model = build_model(dict(config))
    expected = jax.eval_shape(
        lambda: model.init_params(jax.random.PRNGKey(0), (1, 256, 64))
    )

    def path_shapes(tree):
        return {keystr(p): tuple(v.shape)
                for p, v in tree_flatten_with_path(tree)[0]}

    exp, got = path_shapes(expected), path_shapes(params)
    missing = sorted(set(exp) - set(got))
    mismatched = sorted(k for k in set(exp) & set(got) if exp[k] != got[k])
    if missing or mismatched:
        detail = "".join(
            [f"\n  missing: {k} {exp[k]}" for k in missing[:10]]
            + [f"\n  shape: {k} expected {exp[k]} got {got[k]}"
               for k in mismatched[:10]]
        )
        raise SystemExit(
            "converted parameter tree does not match the model built from "
            "the config — architecture hparams (nf/ch_mult/image_size/...) "
            "likely differ; pass them with --set key=value" + detail
        )
    extra = sorted(set(got) - set(exp))
    if extra:
        print(f"pruning {len(extra)} converted leaves with no counterpart "
              f"in this model (unused-by-forward reference modules), e.g. "
              f"{extra[0]}")

        def prune(sub, ref):
            if not isinstance(sub, dict):
                return sub
            return {k: prune(sub[k], ref[k]) for k in sub if k in ref}

        params = prune(params, expected)
        ema = prune(ema, expected)

    state = init_train_state(params, make_optimizer(config.get("lr", 1e-4)))
    state = state.replace(ema_params=ema)
    save_checkpoint(args.out, state, config)

    # GaGNet norm_type="BN" running statistics ride along as a side
    # artifact; enhancement.py auto-loads it (NormSwitch eval semantics)
    from .torch_ckpt import convert_gagnet_batch_stats, save_batch_stats

    sd = raw.get("state_dict", raw)
    # the saved tree is exactly what make_enhance(batch_stats=...) expects:
    # flat collection for single-net modes (dnn.), nested
    # {"denoiser"/"score": tree} for storm — mirroring the quant layout
    stats = {}
    for prefix, net in (("dnn.", None), ("denoiser_net.", "denoiser"),
                        ("score_net.", "score")):
        if not any(k.startswith(prefix) and k.endswith("running_mean")
                   for k in sd):
            continue
        bn = convert_gagnet_batch_stats(sd, prefix=prefix)
        if bn is None:
            continue
        if net is None:
            stats = bn
        else:
            stats[net] = bn
    if stats:
        import os as _os

        p = _os.path.join(args.out, "gagnet_batch_stats.json")
        save_batch_stats(p, stats)
        print(f"BatchNorm running stats saved to {p}")
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {args.ckpt} -> {args.out} ({n/1e6:.2f}M params, "
          f"mode={config['mode']}); model config: "
          f"{json.dumps({k: v for k, v in config.items() if k != 'mode'})[:200]}")


if __name__ == "__main__":
    main()

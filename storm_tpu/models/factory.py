"""Model construction from a flat config dict (shared by CLIs/ckpts).

The reference reconstructs models from Lightning hparams
(enhancement.py:56-59); here a plain JSON-able dict plays that role.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ..signal.stft import STFTConfig
from ..signal.transforms import SpecTransform
from .discriminative import DiscriminativeModel
from .score import ScoreModel
from .storm import StochasticRegenerationModel

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_model(config: Dict[str, Any]):
    """Build a model object from a flat config dict (see train.py)."""
    cfg = dict(config)
    mode = cfg.pop("mode", "regen-joint-training")

    stft_config = STFTConfig(
        n_fft=cfg.pop("n_fft", 510),
        hop_length=cfg.pop("hop_length", 128),
        window=cfg.pop("window", "hann"),
    )
    transform = SpecTransform(
        factor=cfg.pop("spec_factor", 0.15),
        abs_exponent=cfg.pop("spec_abs_exponent", 0.5),
    )
    if "dtype" in cfg and isinstance(cfg["dtype"], str):
        cfg["dtype"] = _DTYPES[cfg["dtype"]]
    # JSON round-trips tuples as lists; backbone fields expect tuples
    for k in ("ch_mult", "attn_resolutions", "fir_kernel", "k1", "k2",
              "dilas"):
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = tuple(cfg[k])
    # SDE discretization count: CLI name sde_n -> dataclass field N
    if "sde_n" in cfg:
        cfg["N"] = cfg.pop("sde_n")

    common = dict(stft_config=stft_config, transform=transform)
    if mode in ("regen-joint-training", "regen-freeze-denoiser"):
        return StochasticRegenerationModel.create(mode=mode, **common, **cfg)
    elif mode == "distill":
        # one-step student of the StoRM PF-ODE (models/distill.py): the
        # architecture fields are the teacher's; distill_* are its own
        from .distill import DistilledModel

        distill_kwargs = {
            k: cfg.pop(k)
            for k in ("distill_N", "distill_method", "distill_gt_weight")
            if k in cfg
        }
        storm = StochasticRegenerationModel.create(
            mode="regen-joint-training", **common, **cfg
        )
        return DistilledModel(
            storm=storm, lr=cfg.get("lr", 1e-4),
            ema_decay=cfg.get("ema_decay", 0.999), **distill_kwargs,
        )
    elif mode == "score-only":
        cfg.pop("backbone_denoiser", None)
        cfg["backbone"] = cfg.pop("backbone_score", cfg.pop("backbone", "ncsnpp"))
        return ScoreModel.create(**common, **cfg)
    elif mode == "denoiser-only":
        cfg.pop("backbone_score", None)
        cfg["backbone"] = cfg.pop("backbone_denoiser", cfg.pop("backbone", "ncsnpp"))
        # SDE/t_eps args are meaningless for the pure denoiser
        for k in ("sde", "t_eps", "N", "theta", "sigma_min", "sigma_max",
                  "beta_min", "beta_max", "stiffness"):
            cfg.pop(k, None)
        return DiscriminativeModel.create(**common, **cfg)
    raise ValueError(f"Unknown mode {mode!r}")

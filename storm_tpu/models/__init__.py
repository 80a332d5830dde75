"""Model layer: functional training-state bundles (≙ reference L4,
sgmse/model.py).

Mode names follow the reference train CLI (train.py:33-38):
    score-only            -> ScoreModel
    denoiser-only         -> DiscriminativeModel
    regen-joint-training  -> StochasticRegenerationModel
    regen-freeze-denoiser -> StochasticRegenerationModel (frozen denoiser)
    distill               -> DistilledModel (beyond-reference: one-step
                             student of the StoRM probability-flow ODE)
"""
from .base import (
    TrainState,
    ema_update,
    init_train_state,
    make_optimizer,
    normalize_wav,
    prepare_spec,
    spec_to_wav,
    wav_to_spec,
)
from .discriminative import DiscriminativeModel, si_sdr_jax
from .distill import DistilledModel
from .score import ScoreModel
from .storm import StochasticRegenerationModel


def model_cls_for_mode(mode: str):
    """Dispatch `--mode` to a model class (reference train.py:33-38)."""
    if mode == "score-only":
        return ScoreModel
    elif mode == "denoiser-only":
        return DiscriminativeModel
    elif mode in ("regen-joint-training", "regen-freeze-denoiser"):
        return StochasticRegenerationModel
    elif mode == "distill":
        return DistilledModel
    raise ValueError(f"Unknown mode: {mode!r}")


__all__ = [
    "TrainState",
    "ema_update",
    "init_train_state",
    "make_optimizer",
    "normalize_wav",
    "prepare_spec",
    "spec_to_wav",
    "wav_to_spec",
    "ScoreModel",
    "DiscriminativeModel",
    "DistilledModel",
    "StochasticRegenerationModel",
    "si_sdr_jax",
    "model_cls_for_mode",
]

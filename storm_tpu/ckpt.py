"""Checkpointing: orbax state + JSON model config.

Replaces Lightning's checkpoint system (reference train.py:142-145,
sgmse/model.py:86-95): each checkpoint stores the full TrainState
(params, ema_params — the torch-ema shadow, opt_state, step) plus a
`config.json` with everything needed to rebuild the model, mirroring
Lightning's `save_hyperparameters`/`load_from_checkpoint` contract.

Checkpoint policies mirror the reference's two ModelCheckpoint callbacks +
save_last: tags `last`, `best_loss` (min valid_loss), `best_pesq`
(max ValidationPESQ).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .models import TrainState


def save_checkpoint(
    path: str, state: TrainState, config: dict, meta: Optional[dict] = None
):
    """Save state + config (+ optional training meta) under `path`,
    replacing an existing checkpoint.

    `meta` carries loop state the TrainState does not (epoch, early-stop
    counters, best scores) so a resumed run continues rather than restarts
    — the Lightning-resume fidelity contract (reference README.md:22,
    train.py:139-145).

    Refuses to delete a pre-existing directory that does not look like a
    checkpoint written by this function (guards against an --out pointing
    at a working directory)."""
    path = os.path.abspath(path)
    if os.path.exists(path):
        looks_like_ckpt = os.path.exists(
            os.path.join(path, "config.json")
        ) and os.path.exists(os.path.join(path, "state"))
        if os.listdir(path) and not looks_like_ckpt:
            raise ValueError(
                f"refusing to overwrite {path}: exists and is not a "
                "storm-tpu checkpoint directory"
            )
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)


def load_meta(path: str) -> Optional[dict]:
    """Training meta saved next to a checkpoint, or None (old checkpoints)."""
    p = os.path.join(os.path.abspath(path), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_config(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), "config.json")) as f:
        return json.load(f)


def load_checkpoint(
    path: str, target: Optional[TrainState] = None
) -> Tuple[dict, TrainState]:
    """Load (config, state). Pass `target` (an abstract/concrete TrainState)
    to restore with matching structure/sharding."""
    path = os.path.abspath(path)
    config = load_config(path)
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        # rebuild the state skeleton from the stored config so orbax can
        # restore with a typed target (shapes via eval_shape — no FLOPs)
        from .models.factory import build_model

        model = build_model(dict(config))
        target = jax.eval_shape(
            lambda: model.init_state(jax.random.PRNGKey(0))
        )
        state = ckptr.restore(os.path.join(path, "state"), target)
    else:
        state = ckptr.restore(
            os.path.join(path, "state"),
            jax.tree.map(np.asarray, jax.device_get(target)),
        )
    if isinstance(state, dict):
        state = TrainState(**state)
    return config, state


class CheckpointManager:
    """Tracks best-loss / best-quality / last checkpoints (train.py:139-145).

    The quality policy mirrors the reference's ModelCheckpoint on
    ValidationPESQ (reference train.py:144-145). PESQ is unavailable in
    this image (the `pesq` C library is absent, utils/metrics.py), so when
    pesq is NaN the policy falls back to ESTOI — documented substitution,
    see BASELINE.md — keeping the second checkpoint policy live. The tag
    stays `best_pesq` for CLI compatibility; meta.json records which metric
    actually drove it.
    """

    def __init__(self, ckpt_dir: str, config: dict):
        self.ckpt_dir = ckpt_dir
        self.config = config
        self.best_loss = float("inf")
        self.best_quality = -float("inf")
        self.quality_metric = None  # "pesq" or "estoi", set on first step
        os.makedirs(ckpt_dir, exist_ok=True)

    def restore_from_meta(self, meta: dict):
        """Adopt best scores from a resumed run so a worse checkpoint never
        overwrites a better one after resume."""
        self.best_loss = float(meta.get("best_loss", float("inf")))
        self.best_quality = float(meta.get("best_quality", -float("inf")))
        self.quality_metric = meta.get("quality_metric")

    def step(
        self,
        state: TrainState,
        valid_loss: Optional[float] = None,
        pesq: Optional[float] = None,
        estoi: Optional[float] = None,
        epoch: Optional[int] = None,
        bad_epochs: Optional[int] = None,
        best_valid: Optional[float] = None,
    ):
        if pesq is not None and np.isfinite(pesq):
            quality, metric = float(pesq), "pesq"
        elif estoi is not None and np.isfinite(estoi):
            quality, metric = float(estoi), "estoi"
        else:
            quality, metric = None, self.quality_metric
        if self.quality_metric is None:
            self.quality_metric = metric
        elif metric is not None and metric != self.quality_metric:
            raise ValueError(
                f"checkpoint quality metric changed mid-run: "
                f"{self.quality_metric} -> {metric}"
            )

        meta = {
            "epoch": epoch,
            "bad_epochs": bad_epochs,
            "best_valid": best_valid,
            "best_loss": self.best_loss,
            "best_quality": self.best_quality,
            "quality_metric": self.quality_metric,
        }

        if valid_loss is not None and valid_loss < self.best_loss:
            self.best_loss = float(valid_loss)
            meta["best_loss"] = self.best_loss
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best_loss"), state, self.config,
                meta=meta,
            )
        if quality is not None and quality > self.best_quality:
            self.best_quality = quality
            meta["best_quality"] = self.best_quality
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best_pesq"), state, self.config,
                meta=meta,
            )
        save_checkpoint(
            os.path.join(self.ckpt_dir, "last"), state, self.config, meta=meta
        )

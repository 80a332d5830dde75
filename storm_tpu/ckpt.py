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


def save_checkpoint(path: str, state: TrainState, config: dict):
    """Save state + config under `path` (replacing an existing checkpoint).

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
    """Tracks best-loss / best-PESQ / last checkpoints (train.py:139-145)."""

    def __init__(self, ckpt_dir: str, config: dict):
        self.ckpt_dir = ckpt_dir
        self.config = config
        self.best_loss = float("inf")
        self.best_pesq = -float("inf")
        os.makedirs(ckpt_dir, exist_ok=True)

    def step(
        self,
        state: TrainState,
        valid_loss: Optional[float] = None,
        pesq: Optional[float] = None,
    ):
        save_checkpoint(os.path.join(self.ckpt_dir, "last"), state, self.config)
        if valid_loss is not None and valid_loss < self.best_loss:
            self.best_loss = valid_loss
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best_loss"), state, self.config
            )
        if pesq is not None and np.isfinite(pesq) and pesq > self.best_pesq:
            self.best_pesq = pesq
            save_checkpoint(
                os.path.join(self.ckpt_dir, "best_pesq"), state, self.config
            )

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
import threading
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from .models import TrainState


def _checkpointer() -> ocp.StandardCheckpointer:
    """Orbax checkpointer scoped to the CURRENT process.

    Under multi-host training (train.py) saves are rank-zero-only (params
    are replicated) and restores are process-local reads from the shared
    filesystem — but a default orbax save/restore runs barriers over ALL
    processes, so process 0 would hang/mismatch while the others are
    already in the next epoch. Restricting active_processes to the calling
    process keeps every orbax barrier process-local; the state being saved
    is host-local numpy (device_get'd) so no cross-process coordination is
    needed."""
    if jax.process_count() > 1:
        from orbax.checkpoint import options as oopt

        pid = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=oopt.MultiprocessingOptions(
                primary_host=pid, active_processes={pid},
                barrier_sync_key_prefix=f"storm_tpu_p{pid}",
            )
        )
    return ocp.StandardCheckpointer()


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
    _check_overwrite_ok(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    # write into a sibling tmp dir, then swap — a crash mid-save never
    # destroys the previous checkpoint
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = _checkpointer()
    ckptr.save(os.path.join(tmp, "state"), state)
    ckptr.wait_until_finished()
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(config, f, indent=2, default=str)
    if meta is not None:
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    _swap_into_place(tmp, path)


def _swap_into_place(tmp: str, path: str):
    """Replace `path` with `tmp` without a window where neither exists.

    rmtree(path) then rename(tmp, path) would leave no checkpoint at all if
    the process dies between the two calls (code-review fix); instead the
    old dir is renamed aside first, so a crash at any point leaves either
    the old or the new checkpoint resolvable at `path` after cleanup."""
    old = path + ".old"
    if os.path.exists(old):  # leftover from an earlier crash
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def _check_overwrite_ok(path: str):
    if os.path.exists(path):
        looks_like_ckpt = os.path.exists(
            os.path.join(path, "config.json")
        ) and os.path.exists(os.path.join(path, "state"))
        if os.listdir(path) and not looks_like_ckpt:
            raise ValueError(
                f"refusing to overwrite {path}: exists and is not a "
                "storm-tpu checkpoint directory"
            )


def load_meta(path: str) -> Optional[dict]:
    """Training meta saved next to a checkpoint, or None (old checkpoints)."""
    p = os.path.join(os.path.abspath(path), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def load_config(path: str) -> dict:
    with open(os.path.join(os.path.abspath(path), "config.json")) as f:
        config = json.load(f)
    # A config written by train.py records the signal-processing fields
    # (train.py `_CONFIG_KEYS`); a hand-written/truncated one silently
    # rebuilds the model at ctor defaults (e.g. spec_factor 0.15 vs the
    # training CLI's 0.33) and serves garbage with no error. Warn loudly.
    missing = [k for k in ("n_fft", "hop_length", "window", "spec_factor",
                           "spec_abs_exponent") if k not in config]
    if missing:
        import warnings

        warnings.warn(
            f"checkpoint config {path} lacks {missing}; the model will be "
            "rebuilt with constructor defaults for these — if training "
            "used different values (train.py defaults differ: e.g. "
            "spec_factor 0.33 vs ctor 0.15), enhancement output will be "
            "silently wrong",
            stacklevel=2,
        )
    return config


def load_checkpoint(
    path: str, target: Optional[TrainState] = None
) -> Tuple[dict, TrainState]:
    """Load (config, state). Pass `target` (an abstract/concrete TrainState)
    to restore with matching structure/sharding."""
    path = os.path.abspath(path)
    config = load_config(path)
    ckptr = _checkpointer()
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
        overwrites a better one after resume (null = no value yet)."""
        if meta.get("best_loss") is not None:
            self.best_loss = float(meta["best_loss"])
        if meta.get("best_quality") is not None:
            self.best_quality = float(meta["best_quality"])
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

        loss_improved = valid_loss is not None and valid_loss < self.best_loss
        if loss_improved:
            self.best_loss = float(valid_loss)
        quality_improved = quality is not None and quality > self.best_quality
        if quality_improved:
            self.best_quality = quality

        def fin(v):
            # "no value yet" sentinels (inf/-inf) serialize as null, not as
            # the non-RFC-8259 'Infinity' token python's json would emit
            return v if v is not None and np.isfinite(v) else None

        meta = {
            "epoch": epoch,
            "bad_epochs": bad_epochs,
            "best_valid": fin(best_valid),
            "best_loss": fin(self.best_loss),
            "best_quality": fin(self.best_quality),
            "quality_metric": self.quality_metric,
        }

        # the state is serialized ONCE (into `last`); the best-tag policies
        # are directory copies — at 4 bytes/param x {params, ema, 2 Adam
        # moments} a re-serialization per tag would triple the epoch's
        # checkpoint I/O
        last = os.path.join(self.ckpt_dir, "last")
        save_checkpoint(last, state, self.config, meta=meta)
        if loss_improved:
            self._copy_tag(last, "best_loss")
        if quality_improved:
            self._copy_tag(last, "best_pesq")

    def _copy_tag(self, src: str, tag: str):
        dst = os.path.join(self.ckpt_dir, tag)
        _check_overwrite_ok(dst)
        tmp = dst + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(src, tmp)
        _swap_into_place(tmp, dst)


class AsyncCheckpointManager:
    """Non-blocking wrapper around CheckpointManager.

    `step_async` snapshots the TrainState ON DEVICE (a cheap HBM->HBM
    copy, dispatched before the next train step can donate those buffers
    away) and moves the expensive part — device->host transfer (~100 MB/s
    over a tunneled backend; ~9 s/epoch for the full 2x27.8M model) plus
    the orbax write — to a background thread, overlapping it with the next
    training epoch. At most one save is in flight; a second `step_async`
    first joins the previous one. Call `wait()` before reading the
    checkpoint or exiting.

    Worker exceptions are re-raised on the next `step_async`/`wait` call —
    a failed save must not be silently dropped.
    """

    def __init__(self, mgr: CheckpointManager):
        self.mgr = mgr
        self._thread: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None

    # expose the policy state (train.py reads these for logging/meta)
    @property
    def best_loss(self):
        return self.mgr.best_loss

    @property
    def quality_metric(self):
        return self.mgr.quality_metric

    def restore_from_meta(self, meta: dict):
        self.mgr.restore_from_meta(meta)

    def step_async(self, state: TrainState, **kwargs):
        self.wait()
        # device-side snapshot: enqueued on the stream before any later
        # donation reuses the buffers, so the background device_get reads
        # a stable copy
        snap = jax.tree_util.tree_map(jnp.copy, state)

        def run():
            try:
                self.mgr.step(jax.device_get(snap), **kwargs)
            except BaseException as e:  # noqa: BLE001 - re-raised on wait()
                self._err = e

        self._thread = threading.Thread(target=run, name="ckpt-save")
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err

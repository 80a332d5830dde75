"""AsyncCheckpointManager unit semantics (storm_tpu/ckpt.py).

The integration path (train.py epoch loop, kill-and-resume) is covered by
tests/test_train_cli.py; these pin the two subtle contracts in isolation:

- the device-side snapshot happens at step_async() time, so a later
  (donating) train step mutating the live state must not change what gets
  saved;
- worker-thread exceptions surface on the next wait()/step_async(), never
  silently dropped.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.ckpt import (
    AsyncCheckpointManager,
    CheckpointManager,
    load_checkpoint,
)
from storm_tpu.models import TrainState


def _state(v: float) -> TrainState:
    return TrainState(
        step=jnp.asarray(1, jnp.int32),
        params={"w": jnp.full((4,), v, jnp.float32)},
        ema_params={"w": jnp.full((4,), v, jnp.float32)},
        opt_state=(),
    )


def test_async_snapshot_precedes_later_mutation(tmp_path):
    mgr = AsyncCheckpointManager(
        CheckpointManager(str(tmp_path / "ck"), {"mode": "denoiser-only"}))
    state = _state(1.0)
    mgr.step_async(state, valid_loss=0.5, epoch=0, bad_epochs=0,
                   best_valid=0.5)
    # "donation": the live buffers move on while the save is in flight
    state = _state(2.0)

    mgr.wait()
    meta = json.load(open(tmp_path / "ck" / "last" / "meta.json"))
    assert meta["epoch"] == 0
    # best_loss tag is a copy of last (single serialization per epoch)
    assert os.path.isdir(tmp_path / "ck" / "best_loss")
    cfg, restored = load_checkpoint(str(tmp_path / "ck" / "last"),
                                    target=_state(0.0))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((4,), 1.0, np.float32))


def test_async_error_propagates(tmp_path):
    class Boom(CheckpointManager):
        def step(self, *a, **k):
            raise RuntimeError("disk on fire")

    mgr = AsyncCheckpointManager(
        Boom(str(tmp_path / "ck2"), {"mode": "denoiser-only"}))
    mgr.step_async(_state(1.0), valid_loss=0.5)
    with pytest.raises(RuntimeError, match="disk on fire"):
        mgr.wait()
    # error is consumed: manager is usable again afterwards
    mgr.wait()


def test_load_config_warns_on_truncated_config(tmp_path):
    """A config.json missing the signal-processing fields train.py records
    (n_fft/hop/window/spec_factor/...) must warn: the model would silently
    rebuild at ctor defaults (spec_factor 0.15 vs the training CLI's 0.33)
    and serve garbage — the round-5 ckpt_prod incident."""
    import json
    import warnings

    from storm_tpu.ckpt import load_config

    p = tmp_path / "ckpt"
    p.mkdir()
    (p / "config.json").write_text(
        json.dumps({"mode": "regen-joint-training", "sde": "ouve"}))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_config(str(p))
    assert any("spec_factor" in str(x.message) for x in w)

    (p / "config.json").write_text(json.dumps({
        "mode": "regen-joint-training", "sde": "ouve", "n_fft": 510,
        "hop_length": 128, "window": "hann", "spec_factor": 0.33,
        "spec_abs_exponent": 0.5,
    }))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_config(str(p))
    assert not w

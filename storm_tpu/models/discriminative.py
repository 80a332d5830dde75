"""DiscriminativeModel: direct predictive denoiser training.

Functional re-design of the reference `DiscriminativeModel`
(sgmse/model.py:320-373): the backbone is run as a plain denoiser
`x_hat = dnn(y, t=1)` with MSE/MAE/SI-SDR losses; its trained parameters can
be grafted into a StoRM model as the first-stage denoiser.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from ..backbones import BackboneRegistry
from ..signal import cplx
from ..signal.stft import STFTConfig
from ..signal.transforms import SpecTransform
from .base import (
    TrainState,
    ema_update,
    init_train_state,
    lift_spec,
    make_optimizer,
    normalize_wav,
    prepare_spec,
    spec_to_wav,
)


def si_sdr_jax(s, s_hat, eps: float = 1e-8):
    """Scale-invariant SDR of flattened signals (util/other.py:82-94)."""
    s = s.reshape(-1)
    s_hat = s_hat.reshape(-1)
    alpha = jnp.dot(s_hat, s) / (jnp.dot(s, s) + eps)
    e_target = alpha * s
    e_res = s_hat - e_target
    return 10.0 * jnp.log10(
        (jnp.sum(e_target**2) + eps) / (jnp.sum(e_res**2) + eps)
    )


@dataclasses.dataclass(frozen=True)
class DiscriminativeModel:
    dnn: Any  # flax module with discriminative=True
    stft_config: STFTConfig = STFTConfig()
    transform: SpecTransform = SpecTransform()
    lr: float = 1e-4
    ema_decay: float = 0.999
    loss_type: str = "mse"
    spatial_channels: int = 1

    @classmethod
    def create(
        cls,
        backbone: str = "ncsnpp",
        lr: float = 1e-4,
        ema_decay: float = 0.999,
        loss_type: str = "mse",
        stft_config: STFTConfig = STFTConfig(),
        transform: SpecTransform = SpecTransform(),
        **backbone_kwargs,
    ) -> "DiscriminativeModel":
        dnn_cls = BackboneRegistry.get_by_name(backbone)
        dnn = dnn_cls.from_kwargs(discriminative=True, **backbone_kwargs)
        return cls(
            dnn=dnn, lr=lr, ema_decay=ema_decay, loss_type=loss_type,
            spatial_channels=int(backbone_kwargs.get("spatial_channels", 1)),
            stft_config=stft_config, transform=transform,
        )

    @property
    def force_stft_out(self) -> bool:
        """Time-domain backbone (ConvTasNet): feed/return waveforms
        (sgmse/model.py:322-324)."""
        return bool(getattr(self.dnn, "FORCE_STFT_OUT", False))

    def init_params(self, key, spec_shape: Tuple[int, ...]):
        B, F, T = spec_shape
        t = jnp.ones((B,), jnp.float32)
        if self.force_stft_out:
            if self.spatial_channels != 1:
                raise NotImplementedError(
                    "time-domain backbones support spatial_channels=1 only"
                )
            y = jnp.zeros((B, (T - 1) * self.stft_config.hop_length), jnp.float32)
            return self.dnn.init(key, y, t)["params"]
        y = jnp.zeros((B, self.spatial_channels, F, T, 2), jnp.float32)
        return self.dnn.init(key, y, t)["params"]

    def init_state(self, key, spec_shape=(1, 256, 64)) -> TrainState:
        return init_train_state(
            self.init_params(key, spec_shape), make_optimizer(self.lr)
        )

    def apply(self, params, Y, train: bool = False, rng=None,
              quant=None, collect_stats: bool = False, batch_stats=None):
        """x_hat = dnn(y, t=1) (sgmse/model.py:322-327). Y: (B, F, T, 2) for
        spec backbones; for FORCE_STFT_OUT backbones Y is converted to time
        and the TIME-domain estimate is returned (sgmse/model.py:322-327).

        `quant`: optional int8 activation-scale tree (models/quant.py);
        `collect_stats=True` additionally returns the calibration amax
        tree; `batch_stats`: optional running-statistics collection for
        eval-mode BatchNorm (GaGNet norm_type="BN" checkpoints converted
        from torch — compat/torch_ckpt.py convert_gagnet_batch_stats)."""
        t = jnp.ones((Y.shape[0],), jnp.float32)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if self.force_stft_out:
            if Y.ndim == 2:
                # return_time batch: waveforms go straight in
                # (sgmse/model.py:344-347 with data_module.return_time)
                y_time = Y
            else:
                length = (Y.shape[-2] - 1) * self.stft_config.hop_length
                y_time = spec_to_wav(Y, self.stft_config, self.transform,
                                     length=length)
            out = self.dnn.apply(
                {"params": params}, y_time, t, train=train, rngs=rngs
            )
            return (out, {}) if collect_stats else out
        Y5, squeezed = lift_spec(Y)
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if collect_stats:
            out, st = self.dnn.apply(
                variables, Y5, t, train=train, rngs=rngs,
                mutable=["quant_stats"],
            )
            return (out[:, 0] if squeezed else out), st.get("quant_stats", {})
        out = self.dnn.apply(variables, Y5, t, train=train, rngs=rngs)
        return out[:, 0] if squeezed else out

    batch_reduction = "mean"

    def loss_per_example(self, params, key, batch, train: bool = False):
        """Per-example losses (B,) — used for masked validation over ragged
        tail batches (every file counts, unlike a skip)."""
        x, y = batch
        x_hat = self.apply(params, y, train=train, rng=key)
        if self.force_stft_out and x.ndim > 2:
            # spec batch: compare in the time domain (sgmse/model.py:329-331);
            # a return_time batch (B, T) is already time-domain
            length = (x.shape[-2] - 1) * self.stft_config.hop_length
            x = spec_to_wav(x, self.stft_config, self.transform, length=length)
        B = x.shape[0]
        diff = x - x_hat
        if self.loss_type == "mse":
            return 0.5 * jnp.sum(jnp.square(diff).reshape(B, -1), -1)
        elif self.loss_type == "mae":
            mag = jnp.abs(diff) if self.force_stft_out else cplx.cabs(diff)
            return 0.5 * jnp.sum(mag.reshape(B, -1), -1)
        elif self.loss_type == "sisdr":
            return -jax.vmap(si_sdr_jax)(
                x.reshape(B, -1), x_hat.reshape(B, -1)
            )
        raise NotImplementedError(self.loss_type)

    def loss_fn(self, params, key, batch, train: bool = True):
        loss = jnp.mean(
            self.loss_per_example(params, key, batch, train=train)
        )
        return loss, {"loss": loss}

    def make_train_step(self, donate: bool = True,
                        fold_step_rng: bool = False):
        """fold_step_rng: see StochasticRegenerationModel.make_train_step."""
        tx = make_optimizer(self.lr)

        def train_step(state: TrainState, batch, key):
            if fold_step_rng:
                key = jax.random.fold_in(key, state.step)
            (loss, aux), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(state.params, key, batch, True)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            ema_params = ema_update(state.ema_params, params, self.ema_decay, step)
            return (
                TrainState(step=step, params=params,
                           ema_params=ema_params, opt_state=opt_state),
                aux,
            )

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def make_enhance(self, num_samples: int = 0, quant=None,
                     batch_stats=None, mesh=None,
                     mesh_axes=("data", "seq"), **ignored_kwargs):
        """Single-pass enhancement (sgmse/model.py:345-363), jitted.

        `quant`: optional int8 activation-scale tree (models/quant.py);
        `batch_stats`: optional eval-mode BatchNorm running stats
        (GaGNet norm_type="BN", see apply); `mesh`/`mesh_axes`: optional
        model-parallel serving mesh (spectral backbones only — the
        time-domain FORCE_STFT_OUT path has no frame axis to shard, so it
        runs data-parallel on such a mesh)."""
        del num_samples
        from .base import spec_sharding_constraint

        constrain = spec_sharding_constraint(mesh, mesh_axes)

        @jax.jit
        def enhance(params, y, key):
            del key
            T_orig = y.shape[-1]
            y_n, norm = normalize_wav(y)
            if self.force_stft_out:
                # time-domain backbone consumes the waveform directly
                # (sgmse/model.py:349-352 with return_time)
                t = jnp.ones((y_n.shape[0],), jnp.float32)
                x_hat = self.dnn.apply({"params": params}, y_n, t)
                return x_hat[..., :T_orig] * norm, 1
            Y, _t_frames = prepare_spec(y_n, self.stft_config, self.transform)
            Y = constrain(Y)
            X_hat = self.apply(params, Y, quant=quant,
                               batch_stats=batch_stats)
            # full padded spec -> iSTFT(length=T_orig), reference behavior
            # (sgmse/model.py:362-363); see ScoreModel.make_enhance
            x_hat = spec_to_wav(
                X_hat, self.stft_config, self.transform, length=T_orig
            )
            return x_hat * norm, 1

        return enhance

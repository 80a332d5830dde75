"""ScoreModel: score-only training (SGMSE+) and enhancement.

Functional re-design of the reference `ScoreModel` (sgmse/model.py:24-310):
the backbone scores `x_t` conditioned on the noisy spec `y` (4 input
channels), trained by denoising score matching against an OU SDE whose
steady state is `y`. Sampling runs as a single on-device `lax.scan`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from ..backbones import BackboneRegistry
from ..sampling.samplers import ode_sample, pc_sample, picard_sample
from ..sde.sdes import SDERegistry
from ..signal import cplx
from ..signal.stft import STFTConfig
from ..signal.transforms import SpecTransform
from ..utils.tensors import right_pad_dims
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


@dataclasses.dataclass(frozen=True)
class ScoreModel:
    """Static model config bundling backbone, SDE and signal transforms."""

    dnn: Any  # flax module (score backbone, input_channels=4)
    sde: Any  # OUVE/OUVP dataclass
    stft_config: STFTConfig = STFTConfig()
    transform: SpecTransform = SpecTransform()
    lr: float = 1e-4
    ema_decay: float = 0.999
    t_eps: float = 0.03
    loss_type: str = "mse"
    spatial_channels: int = 1

    @classmethod
    def create(
        cls,
        backbone: str = "ncsnpp",
        sde: str = "ouve",
        lr: float = 1e-4,
        ema_decay: float = 0.999,
        t_eps: float = 0.03,
        loss_type: str = "mse",
        stft_config: STFTConfig = STFTConfig(),
        transform: SpecTransform = SpecTransform(),
        **backbone_kwargs,
    ) -> "ScoreModel":
        """Mirror of the reference ctor wiring (sgmse/model.py:44-52):
        backbone gets input_channels=4 (x_t and y as complex channels)."""
        dnn_cls = BackboneRegistry.get_by_name(backbone)
        dnn = dnn_cls.from_kwargs(input_channels=4, **backbone_kwargs)
        sde_cls = SDERegistry.get_by_name(sde)
        sde_fields = {f.name for f in dataclasses.fields(sde_cls) if f.init}
        sde_obj = sde_cls(
            **{k: v for k, v in backbone_kwargs.items() if k in sde_fields}
        )
        return cls(
            dnn=dnn, sde=sde_obj, lr=lr, ema_decay=ema_decay, t_eps=t_eps,
            loss_type=loss_type,
            spatial_channels=int(backbone_kwargs.get("spatial_channels", 1)),
            stft_config=stft_config, transform=transform,
        )

    # --- parameters -------------------------------------------------------

    def init_params(self, key, spec_shape: Tuple[int, ...]):
        """spec_shape: (B, F, T) of a single compressed spec."""
        B, F, T = spec_shape
        D = self.spatial_channels
        x = jnp.zeros((B, 2 * D, F, T, 2), jnp.float32)  # [x_t, y] x D
        t = jnp.ones((B,), jnp.float32)
        return self.dnn.init(key, x, t)["params"]

    def init_state(self, key, spec_shape=(1, 256, 64)) -> TrainState:
        return init_train_state(
            self.init_params(key, spec_shape), make_optimizer(self.lr)
        )

    # --- forward ----------------------------------------------------------

    def score_apply(
        self, params, x, t, y, train: bool = False, rng=None,
        quant=None, collect_stats: bool = False, batch_stats=None,
    ):
        """score = -dnn(cat[x, y], t) (sgmse/model.py:130-136).

        x, y: (B, F, T, 2) or multichannel (B, D, F, T, 2) packed-real
        compressed specs; output has x's shape.

        `quant`: optional int8 activation-scale tree (models/quant.py);
        `collect_stats=True` additionally returns the calibration amax
        tree."""
        x5, squeezed = lift_spec(x)
        y5, _ = lift_spec(y)
        dnn_input = jnp.concatenate([x5, y5], axis=1)  # (B, 2D, F, T, 2)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        variables = {"params": params}
        if quant is not None:
            variables["quant"] = quant
        if batch_stats is not None:
            # eval-mode BatchNorm running stats (GaGNet norm_type="BN")
            variables["batch_stats"] = batch_stats
        if collect_stats:
            out, st = self.dnn.apply(
                variables, dnn_input, t, train=train, rngs=rngs,
                mutable=["quant_stats"],
            )
            return -(out[:, 0] if squeezed else out), st.get("quant_stats", {})
        out = self.dnn.apply(variables, dnn_input, t, train=train, rngs=rngs)
        return -(out[:, 0] if squeezed else out)

    # --- loss / training --------------------------------------------------

    def _err_loss_per_example(self, err):
        """Per-example 0.5 * sum |err|^2 (or |err| for mae), shape (B,)."""
        B = err.shape[0]
        if self.loss_type == "mse":
            return 0.5 * jnp.sum(jnp.square(err).reshape(B, -1), axis=-1)
        elif self.loss_type == "mae":
            return 0.5 * jnp.sum(cplx.cabs(err).reshape(B, -1), axis=-1)
        raise NotImplementedError(self.loss_type)

    def _err_loss(self, err):
        """mse: mean_b(0.5 * sum |err|^2); mae likewise on |err|
        (sgmse/model.py:113-124)."""
        return jnp.mean(self._err_loss_per_example(err))

    # batch combination used by `loss_fn`; train.py's masked validation path
    # needs this to aggregate per-example losses the same way (mean here,
    # sum for StoRM's `_reduce`)
    batch_reduction = "mean"

    def loss_per_example(self, params, key, batch, train: bool = False):
        """Per-example DSM losses (B,) — used for masked validation over
        ragged tail batches (every file counts, unlike a skip)."""
        x, y = batch
        kt, kz, kd = jax.random.split(key, 3)
        B = x.shape[0]
        t = (
            jax.random.uniform(kt, (B,), jnp.float32)
            * (self.sde.T - self.t_eps)
            + self.t_eps
        )
        z = cplx.complex_normal(kz, x.shape[:-1])
        mean, std = self.sde.marginal_prob(x, t, y)
        sigmas = right_pad_dims(std, x)
        perturbed = mean + sigmas * z
        score = self.score_apply(params, perturbed, t, y, train=train, rng=kd)
        return self._err_loss_per_example(score * sigmas + z)

    def loss_given_tz(self, params, batch, t, z, train: bool = False, rng=None):
        """DSM loss with injected diffusion times `t` (B,) and noise `z`
        (packed-real, x-shaped) — the deterministic core of `loss_fn`, used
        directly by the reference-parity tests (sgmse/model.py:138-154)."""
        x, y = batch  # compressed specs (B, F, T, 2)
        mean, std = self.sde.marginal_prob(x, t, y)
        sigmas = right_pad_dims(std, x)
        perturbed = mean + sigmas * z
        score = self.score_apply(params, perturbed, t, y, train=train, rng=rng)
        err = score * sigmas + z
        loss = self._err_loss(err)
        return loss, {"loss": loss}

    def loss_fn(self, params, key, batch, train: bool = True):
        """Denoising score-matching loss (sgmse/model.py:138-154)."""
        x, y = batch  # compressed specs (B, F, T, 2)
        kt, kz, kd = jax.random.split(key, 3)
        B = x.shape[0]
        t = (
            jax.random.uniform(kt, (B,), jnp.float32)
            * (self.sde.T - self.t_eps)
            + self.t_eps
        )
        z = cplx.complex_normal(kz, x.shape[:-1])
        return self.loss_given_tz(params, batch, t, z, train=train, rng=kd)

    def make_train_step(self, donate: bool = True,
                        fold_step_rng: bool = False):
        """One jitted optimizer step incl. EMA (sgmse/model.py:80-83).

        fold_step_rng: see StochasticRegenerationModel.make_train_step."""
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
                TrainState(
                    step=step, params=params,
                    ema_params=ema_params, opt_state=opt_state,
                ),
                aux,
            )

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # --- enhancement ------------------------------------------------------

    def make_enhance(
        self,
        num_samples: int,
        sampler_type: str = "pc",
        predictor: str = "reverse_diffusion",
        corrector: str = "ald",
        N: int = 50,
        corrector_steps: int = 1,
        snr: float = 0.5,
        probability_flow: bool = False,
        quant=None,
        batch_stats=None,
        deepcache: int = 0,
        deepcache_depth: int = 1,
        mesh=None,
        mesh_axes=("data", "seq"),
        **kwargs,
    ):
        """Build a jitted enhancement program for a fixed utterance length.

        Equivalent of `ScoreModel.enhance` (sgmse/model.py:273-310) but fully
        on device: normalize -> STFT -> compress -> pad -> scan-sampler ->
        decompress -> iSTFT -> denormalize, one compiled executable.

        `quant`: optional int8 activation-scale tree from
        `models.quant.calibrate_score_model` (serving-only TPU perf feature).
        `deepcache`/`deepcache_depth`: deep-feature cache refresh interval /
        recomputed top-level count (DeepCache-style serving acceleration;
        see StochasticRegenerationModel.make_enhance).
        `mesh`/`mesh_axes`: optional (data, sequence)-axis Mesh for
        model-parallel serving (see StochasticRegenerationModel.make_enhance
        and models.base.spec_sharding_constraint).

        Returns `enhance(params, y, key) -> (x_hat, nfe)` for y (B, T).
        """
        del num_samples  # length is bound at trace time from y.shape
        if deepcache:
            from .base import check_deepcache_config

            check_deepcache_config(self.dnn, deepcache, sampler_type)
        from .base import spec_sharding_constraint

        constrain = spec_sharding_constraint(mesh, mesh_axes)

        @jax.jit
        def enhance(params, y, key):
            T_orig = y.shape[-1]
            y_n, norm = normalize_wav(y)
            Y, t_frames = prepare_spec(y_n, self.stft_config, self.transform)
            Y = constrain(Y)

            def score_fn(x, t, y_sde):
                return self.score_apply(params, constrain(x), t, y_sde,
                                        quant=quant,
                                        batch_stats=batch_stats)

            cache_kwargs = {}
            if deepcache:
                from .base import make_deepcache_fns

                def _score_vars():
                    variables = {"params": params}
                    if quant is not None:
                        variables["quant"] = quant
                    if batch_stats is not None:
                        variables["batch_stats"] = batch_stats
                    return variables

                def _score_input(x):
                    x5, squeezed = lift_spec(constrain(x))
                    y5, _ = lift_spec(Y)
                    return jnp.concatenate([x5, y5], axis=1), squeezed

                deep_fn, cached_score_fn = make_deepcache_fns(
                    self.dnn, _score_vars, _score_input, deepcache_depth,
                )
                cache_kwargs = dict(
                    deepcache=deepcache,
                    deep_fn=deep_fn,
                    cached_score_fn=cached_score_fn,
                )

            if sampler_type == "pc":
                sample, nfe = pc_sample(
                    key,
                    self.sde,
                    score_fn,
                    Y,
                    predictor=predictor,
                    corrector=corrector,
                    N=N,
                    snr=snr,
                    corrector_steps=corrector_steps,
                    probability_flow=probability_flow,
                    denoise=True,
                    eps=self.t_eps,
                    **cache_kwargs,
                )
            elif sampler_type == "ode":
                sample, nfe = ode_sample(
                    key, self.sde, score_fn, Y, N=N, eps=self.t_eps,
                    **cache_kwargs, **kwargs,
                )
            elif sampler_type == "picard":
                sample, nfe = picard_sample(
                    key, self.sde, score_fn, Y, N=N, eps=self.t_eps, **kwargs
                )
            else:
                raise ValueError(f"{sampler_type} is not a valid sampler type!")

            # iSTFT the FULL padded spec with length=T_orig, exactly like
            # the reference's to_audio(sample, T_orig) (sgmse/model.py:303)
            # — the pad frames' overlap contributes to the tail samples;
            # verified equal to the actual reference pipeline to ~1e-6
            # (tests/test_reference_parity.py::test_ref_enhance_end_to_end)
            del t_frames
            x_hat = spec_to_wav(
                sample, self.stft_config, self.transform, length=T_orig
            )
            return x_hat * norm, nfe

        return enhance


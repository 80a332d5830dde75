"""StochasticRegenerationModel (StoRM): denoiser + score-based regeneration.

Functional re-design of the reference `StochasticRegenerationModel`
(sgmse/model.py:392-780):

- a predictive denoiser D(y) produces a first estimate,
- the reverse SDE regenerates clean speech starting from D(y), with the
  score network conditioned on {y, D(y)} (condition="both" -> 6 input
  channels: x_t, y, D(y)),
- joint training optimizes a * L_denoiser + (1-a) * L_score with the SDE
  diffusing the clean target *toward the denoised estimate*
  (sde_input = y_denoised, sgmse/model.py:569-578),
- `enhance` runs denoiser once + N-step reverse diffusion, all inside one
  jitted program with a `lax.scan` sampler.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

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

_CONDITION_CHANNELS = {"noisy": 1, "post_denoiser": 1, "both": 2}


@dataclasses.dataclass(frozen=True)
class StochasticRegenerationModel:
    denoiser_net: Any  # flax module, discriminative (input_channels=2); may be None
    score_net: Any  # flax module (input_channels = 2*(1+#cond))
    sde: Any
    stft_config: STFTConfig = STFTConfig()
    transform: SpecTransform = SpecTransform()
    lr: float = 1e-4
    ema_decay: float = 0.999
    t_eps: float = 0.03
    loss_type_denoiser: str = "mse"
    loss_type_score: str = "mse"
    weighting_denoiser_to_score: float = 0.5
    condition: str = "both"
    mode: str = "regen-joint-training"
    spatial_channels: int = 1

    @classmethod
    def create(
        cls,
        backbone_denoiser: str = "ncsnpp",
        backbone_score: str = "ncsnpp",
        sde: str = "ouve",
        lr: float = 1e-4,
        ema_decay: float = 0.999,
        t_eps: float = 0.03,
        loss_type_denoiser: str = "mse",
        loss_type_score: str = "mse",
        weighting_denoiser_to_score: float = 0.5,
        condition: str = "both",
        mode: str = "regen-joint-training",
        stft_config: STFTConfig = STFTConfig(),
        transform: SpecTransform = SpecTransform(),
        **backbone_kwargs,
    ) -> "StochasticRegenerationModel":
        """Ctor wiring per sgmse/model.py:414-430: denoiser gets
        input_channels=2 + discriminative=True; score gets input_channels=6
        (condition='both') or 4 otherwise."""
        if condition not in _CONDITION_CHANNELS:
            raise NotImplementedError(
                f"Don't know the conditioning you have wished for: {condition}"
            )
        denoiser = (
            BackboneRegistry.get_by_name(backbone_denoiser).from_kwargs(
                input_channels=2, discriminative=True, **backbone_kwargs
            )
            if backbone_denoiser != "none"
            else None
        )
        n_in = 2 * (1 + _CONDITION_CHANNELS[condition])
        score = (
            BackboneRegistry.get_by_name(backbone_score).from_kwargs(
                input_channels=n_in, discriminative=False, **backbone_kwargs
            )
            if backbone_score != "none"
            else None
        )
        sde_cls = SDERegistry.get_by_name(sde)
        sde_fields = {f.name for f in dataclasses.fields(sde_cls) if f.init}
        sde_obj = sde_cls(
            **{k: v for k, v in backbone_kwargs.items() if k in sde_fields}
        )
        return cls(
            denoiser_net=denoiser,
            score_net=score,
            sde=sde_obj,
            lr=lr,
            ema_decay=ema_decay,
            t_eps=t_eps,
            loss_type_denoiser=loss_type_denoiser,
            loss_type_score=loss_type_score,
            weighting_denoiser_to_score=weighting_denoiser_to_score,
            condition=condition,
            mode=mode,
            spatial_channels=int(backbone_kwargs.get("spatial_channels", 1)),
            stft_config=stft_config,
            transform=transform,
        )

    # --- parameters -------------------------------------------------------

    def init_params(self, key, spec_shape: Tuple[int, ...]) -> Dict[str, Any]:
        B, F, T = spec_shape
        D = self.spatial_channels
        kd, ks = jax.random.split(key)
        t = jnp.ones((B,), jnp.float32)
        params = {}
        if self.denoiser_net is not None:
            if getattr(self.denoiser_net, "FORCE_STFT_OUT", False):
                y = jnp.zeros(
                    (B, (T - 1) * self.stft_config.hop_length), jnp.float32
                )
            else:
                y = jnp.zeros((B, D, F, T, 2), jnp.float32)
            params["denoiser"] = self.denoiser_net.init(kd, y, t)["params"]
        if self.score_net is not None:
            n_c = 1 + _CONDITION_CHANNELS[self.condition]
            x = jnp.zeros((B, n_c * D, F, T, 2), jnp.float32)
            params["score"] = self.score_net.init(ks, x, t)["params"]
        return params

    def init_state(self, key, spec_shape=(1, 256, 64)) -> TrainState:
        return init_train_state(
            self.init_params(key, spec_shape), make_optimizer(self.lr)
        )

    # --- forward ----------------------------------------------------------

    def forward_denoiser(
        self, params, Y, train: bool = False, rng=None,
        quant=None, collect_stats: bool = False, batch_stats=None,
    ):
        """D(y) (sgmse/model.py:556-558). Y: (B, F, T, 2) or multichannel
        (B, D, F, T, 2); output has the input's shape.

        Time-domain (FORCE_STFT_OUT) denoisers are wrapped spec->wav->spec
        so the SDE input/conditioning stay spectral. (The reference's StoRM
        class passes the spec straight into such backbones, which cannot
        work — sgmse/model.py:556-558 never checks FORCE_STFT_OUT; fixed
        here.)

        `quant`: optional int8 activation-scale tree for the serving path
        (models/quant.py); `collect_stats=True` additionally returns the
        calibration amax tree."""
        if getattr(self.denoiser_net, "FORCE_STFT_OUT", False):
            from .base import time_domain_denoise

            if self.spatial_channels != 1:
                raise NotImplementedError(
                    "time-domain denoisers support spatial_channels=1 only"
                )
            out = time_domain_denoise(
                self.denoiser_net, params["denoiser"], Y,
                self.stft_config, self.transform,
            )
            return (out, {}) if collect_stats else out
        Y5, squeezed = lift_spec(Y)
        t = jnp.ones((Y5.shape[0],), jnp.float32)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        variables = {"params": params["denoiser"]}
        if quant is not None:
            variables["quant"] = quant
        if batch_stats is not None:
            # eval-mode BatchNorm running stats (GaGNet norm_type="BN"
            # checkpoints converted from torch, compat/torch_ckpt.py)
            variables["batch_stats"] = batch_stats
        if collect_stats:
            out, st = self.denoiser_net.apply(
                variables, Y5, t, train=train, rngs=rngs,
                mutable=["quant_stats"],
            )
            out = out[:, 0] if squeezed else out
            return out, st.get("quant_stats", {})
        out = self.denoiser_net.apply(variables, Y5, t, train=train, rngs=rngs)
        return out[:, 0] if squeezed else out

    def _conditioning(self, Y, Y_denoised):
        if self.condition == "noisy":
            return [Y]
        elif self.condition == "post_denoiser":
            return [Y_denoised]
        elif self.condition == "both":
            return [Y, Y_denoised]
        raise NotImplementedError(
            f"Don't know the conditioning you have wished for: {self.condition}"
        )

    def forward_score(
        self, params, x, t, score_conditioning, train: bool = False, rng=None,
        quant=None, collect_stats: bool = False, batch_stats=None,
    ):
        """score = -score_net(cat[x, *cond], t) (sgmse/model.py:548-554).

        x and each conditioning spec: (B, F, T, 2) or (B, D, F, T, 2);
        multichannel inputs concatenate as [x_1..x_D, c1_1..c1_D, ...] along
        the complex-channel axis. Output has x's shape.

        `quant`: optional int8 activation-scale tree (models/quant.py);
        `collect_stats=True` additionally returns the calibration amax
        tree."""
        x5, squeezed = lift_spec(x)
        cond5 = [lift_spec(c)[0] for c in score_conditioning]
        dnn_input = jnp.concatenate([x5] + cond5, axis=1)
        rngs = {"dropout": rng} if (train and rng is not None) else None
        variables = {"params": params["score"]}
        if quant is not None:
            variables["quant"] = quant
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if collect_stats:
            out, st = self.score_net.apply(
                variables, dnn_input, t, train=train, rngs=rngs,
                mutable=["quant_stats"],
            )
            return -(out[:, 0] if squeezed else out), st.get("quant_stats", {})
        out = self.score_net.apply(variables, dnn_input, t, train=train, rngs=rngs)
        return -(out[:, 0] if squeezed else out)

    # --- loss / training --------------------------------------------------

    def _reduce(self, v):
        """0.5 * sum over ALL elements — the reference's `_reduce_op`
        (sgmse/model.py:449, 466-484). Note: unlike ScoreModel this does NOT
        take the batch mean; replicated for loss-curve parity."""
        return 0.5 * jnp.sum(v)

    # `_reduce` sums over the batch axis too; train.py's masked validation
    # path aggregates per-example losses accordingly
    batch_reduction = "sum"

    def _reduce_per_example(self, v):
        return 0.5 * jnp.sum(v.reshape(v.shape[0], -1), axis=-1)

    def loss_per_example(self, params, key, batch, train: bool = False):
        """Per-example joint losses (B,) — used for masked validation over
        ragged tail batches (every file counts, unlike a skip)."""
        x, y = batch
        kt, kz, kd1, kd2 = jax.random.split(key, 4)
        B = x.shape[0]
        t = (
            jax.random.uniform(kt, (B,), jnp.float32)
            * (self.sde.T - self.t_eps)
            + self.t_eps
        )
        z = cplx.complex_normal(kz, x.shape[:-1])

        y_denoised = self.forward_denoiser(params, y, train=train, rng=kd1)
        mean, std = self.sde.marginal_prob(x, t, y_denoised)
        sigmas = right_pad_dims(std, x)
        perturbed = mean + sigmas * z
        cond = self._conditioning(y, y_denoised)
        score = self.forward_score(
            params, perturbed, t, cond, train=train, rng=kd2
        )
        err = score * sigmas + z

        if self.loss_type_score == "mse":
            ls = self._reduce_per_example(jnp.square(err))
        elif self.loss_type_score == "mae":
            ls = self._reduce_per_example(cplx.cabs(err))
        else:
            raise NotImplementedError(self.loss_type_score)
        if self.loss_type_denoiser == "mse":
            ld = self._reduce_per_example(jnp.square(y_denoised - x))
        elif self.loss_type_denoiser == "mae":
            ld = self._reduce_per_example(cplx.cabs(y_denoised - x))
        elif self.loss_type_denoiser == "none":
            ld = None
        else:
            raise NotImplementedError(self.loss_type_denoiser)
        a = self.weighting_denoiser_to_score
        return a * ld + (1 - a) * ls if ld is not None else ls

    def loss_given_tz(
        self, params, batch, t, z, train: bool = False, rngs=(None, None)
    ):
        """Joint loss with injected diffusion times `t` (B,) and noise `z`
        (packed-real, x-shaped) — the deterministic core of `loss_fn`, used
        directly by the reference-parity tests (sgmse/model.py:560-595)."""
        x, y = batch
        kd1, kd2 = rngs

        y_denoised = self.forward_denoiser(params, y, train=train, rng=kd1)
        if self.mode == "regen-freeze-denoiser":
            y_denoised = jax.lax.stop_gradient(y_denoised)

        # SDE input is the DENOISED estimate (sgmse/model.py:569-578)
        mean, std = self.sde.marginal_prob(x, t, y_denoised)
        sigmas = right_pad_dims(std, x)
        perturbed = mean + sigmas * z

        cond = self._conditioning(y, y_denoised)
        score = self.forward_score(
            params, perturbed, t, cond, train=train, rng=kd2
        )
        err = score * sigmas + z

        if self.loss_type_score == "mse":
            loss_score = self._reduce(jnp.square(err))
        elif self.loss_type_score == "mae":
            loss_score = self._reduce(cplx.cabs(err))
        else:
            raise NotImplementedError(self.loss_type_score)

        if self.loss_type_denoiser == "mse":
            loss_denoiser = self._reduce(jnp.square(y_denoised - x))
        elif self.loss_type_denoiser == "mae":
            loss_denoiser = self._reduce(cplx.cabs(y_denoised - x))
        elif self.loss_type_denoiser == "none":
            loss_denoiser = None
        else:
            raise NotImplementedError(self.loss_type_denoiser)

        a = self.weighting_denoiser_to_score
        if loss_denoiser is not None:
            loss = a * loss_denoiser + (1 - a) * loss_score
        else:
            loss = loss_score
        aux = {"loss": loss, "loss_score": loss_score}
        if loss_denoiser is not None:
            aux["loss_denoiser"] = loss_denoiser
        return loss, aux

    def loss_fn(self, params, key, batch, train: bool = True):
        """Joint loss (sgmse/model.py:560-595)."""
        x, y = batch
        kt, kz, kd1, kd2 = jax.random.split(key, 4)
        B = x.shape[0]
        t = (
            jax.random.uniform(kt, (B,), jnp.float32)
            * (self.sde.T - self.t_eps)
            + self.t_eps
        )
        z = cplx.complex_normal(kz, x.shape[:-1])
        return self.loss_given_tz(
            params, batch, t, z, train=train, rngs=(kd1, kd2)
        )

    def make_train_step(self, donate: bool = True,
                        fold_step_rng: bool = False):
        """fold_step_rng=True derives the per-step RNG on device as
        fold_in(key, state.step) — the caller passes one key per epoch and
        skips the per-step host `jax.random.split` (2 host->device
        dispatches/step, ~12 ms over a tunneled backend); resume replays
        the exact stream since `state.step` is checkpointed."""
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

    # --- enhancement ------------------------------------------------------

    def make_enhance(
        self,
        num_samples: int = 0,
        sampler_type: str = "pc",
        predictor: str = "reverse_diffusion",
        corrector: str = "none",
        N: int = 30,
        corrector_steps: int = 1,
        snr: float = 0.5,
        probability_flow: bool = False,
        denoiser_only: bool = False,
        quant=None,
        batch_stats=None,
        deepcache: int = 0,
        deepcache_depth: int = 1,
        mesh=None,
        mesh_axes=("data", "seq"),
        **kwargs,
    ):
        """Jitted one-call enhancement (sgmse/model.py:720-780).

        Defaults mirror the reference's StoRM `enhance`: N=30 reverse steps,
        reverse-diffusion predictor, no corrector.

        `quant`: optional {"denoiser": tree|None, "score": tree|None} int8
        activation scales from `models.quant.calibrate_storm` — runs the
        large convs as int8 on the MXU (serving-only, TPU perf feature).
        `batch_stats`: optional {"denoiser": tree|None, "score": tree|None}
        eval-mode BatchNorm running stats (GaGNet norm_type="BN"
        checkpoints converted from torch, compat/torch_ckpt.py).
        `deepcache`: if > 0, refresh the score net's deep-feature cache
        every `deepcache`-th sampler step and recompute only the top
        `deepcache_depth` U-Net levels per score evaluation (DeepCache-style
        serving acceleration, arXiv:2312.00858; pc sampler + NCSN++-family
        score nets only — quality measured in BASELINE.md).
        `mesh`/`mesh_axes`: optional `jax.sharding.Mesh` with
        (data, sequence) axis names — shards the batch over the data axis
        and the spectrogram time-frame axis over the sequence axis for the
        ENTIRE reverse diffusion (model-parallel serving; see
        models.base.spec_sharding_constraint).

        Returns `enhance(params, y, key) -> (x_hat, nfe)` for y (B, T).
        """
        del num_samples
        q_den = (quant or {}).get("denoiser")
        q_score = (quant or {}).get("score")
        bs_den = (batch_stats or {}).get("denoiser")
        bs_score = (batch_stats or {}).get("score")
        if deepcache:
            from .base import check_deepcache_config

            check_deepcache_config(self.score_net, deepcache, sampler_type)
        from .base import spec_sharding_constraint

        constrain = spec_sharding_constraint(mesh, mesh_axes)

        @jax.jit
        def enhance(params, y, key):
            T_orig = y.shape[-1]
            y_n, norm = normalize_wav(y)
            Y, t_frames = prepare_spec(y_n, self.stft_config, self.transform)
            Y = constrain(Y)

            nfe = 0
            if self.denoiser_net is not None:
                Y_denoised = self.forward_denoiser(params, Y, quant=q_den,
                                                   batch_stats=bs_den)
                nfe += 1
            else:
                Y_denoised = None

            if self.score_net is not None and not denoiser_only:
                cond = self._conditioning(Y, Y_denoised)

                def score_fn(x, t, y_sde):
                    del y_sde  # conditioning closed over, like the reference
                    return self.forward_score(params, constrain(x), t, cond,
                                              quant=q_score,
                                              batch_stats=bs_score)

                cache_kwargs = {}
                if deepcache:
                    from .base import make_deepcache_fns

                    def _score_vars():
                        variables = {"params": params["score"]}
                        if q_score is not None:
                            variables["quant"] = q_score
                        if bs_score is not None:
                            variables["batch_stats"] = bs_score
                        return variables

                    def _score_input(x):
                        x5, squeezed = lift_spec(constrain(x))
                        cond5 = [lift_spec(c)[0] for c in cond]
                        return jnp.concatenate([x5] + cond5, axis=1), squeezed

                    deep_fn, cached_score_fn = make_deepcache_fns(
                        self.score_net, _score_vars, _score_input,
                        deepcache_depth,
                    )
                    cache_kwargs = dict(
                        deepcache=deepcache,
                        deep_fn=deep_fn,
                        cached_score_fn=cached_score_fn,
                    )

                if sampler_type == "pc":
                    sample, n = pc_sample(
                        key,
                        self.sde,
                        score_fn,
                        Y_denoised,
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
                    sample, n = ode_sample(
                        key, self.sde, score_fn, Y_denoised,
                        N=N, eps=self.t_eps, **cache_kwargs, **kwargs,
                    )
                elif sampler_type == "picard":
                    # parallel-in-time probability flow (latency lever for
                    # small serving batches; samplers.picard_sample)
                    sample, n = picard_sample(
                        key, self.sde, score_fn, Y_denoised,
                        N=N, eps=self.t_eps, **kwargs,
                    )
                else:
                    raise ValueError(
                        f"{sampler_type} is not a valid sampler type!"
                    )
                nfe += n
            else:
                sample = Y_denoised

            # full padded spec -> iSTFT(length=T_orig), reference behavior
            # (sgmse/model.py:771, 705-718); see ScoreModel.make_enhance
            del t_frames
            x_hat = spec_to_wav(
                sample, self.stft_config, self.transform, length=T_orig
            )
            return x_hat * norm, nfe

        return enhance

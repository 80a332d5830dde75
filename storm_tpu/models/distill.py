"""One-step distillation of the StoRM probability-flow ODE map.

Beyond-reference serving feature (no upstream analogue; the reference
always samples its reverse SDE for N steps, sgmse/model.py:720-767).
Diffusion distillation in the Luhman & Luhman (arXiv:2101.02388) /
consistency-model spirit, specialized to StoRM's two-stage pipeline:

The teacher's probability-flow ODE is a deterministic map
``x_T -> x_0`` given the conditioning {y, D(y)}. A student network with
the SAME architecture as the teacher's score net (and initialized from
it) is trained to reproduce that map in ONE evaluation:

    x_T      = D(y) + sigma(T) * eps                  (the StoRM prior)
    target   = ODE_teacher(x_T; N_teacher steps)       (stop-gradient)
    x0_hat   = inv_marginal(x_T + sigma(T)^2 * s_theta(x_T, T, cond))
    loss     = 0.5 * sum |x0_hat - target|^2  (+ optional clean-data term)

``inv_marginal`` inverts the SDE's closed-form mean
``m(t) = y + fac(t)(x0 - y)`` at t=T, so at initialization the student
output is exactly the one-step posterior-mean (Tweedie) estimate — the
best zero-training starting point — and training bends it onto the full
ODE endpoint. Serving cost: 1 denoiser + 1 student evaluation (NFE=2)
versus the production NFE=101.

Interface-compatible with train.py's generic loop (make_train_step /
loss_per_example / init_state) and the serving stack's make_enhance; a
distilled checkpoint restores through models.factory with
``mode="distill"`` and serves through enhancement.py / evaluate.py /
serve.py like any other.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..sampling.samplers import ode_sample
from ..sde.sdes import OUVESDE, OUVPSDE
from ..signal import cplx
from ..utils.tensors import right_pad_dims
from .base import (
    TrainState,
    ema_update,
    init_train_state,
    make_optimizer,
    normalize_wav,
    prepare_spec,
    spec_to_wav,
)
from .storm import StochasticRegenerationModel


def _mean_factor(sde, t):
    """fac(t) in the marginal mean m(t) = y + fac(t)(x0 - y) (closed forms
    per sgmse/sdes.py:210-228, 296-303)."""
    if isinstance(sde, OUVESDE):
        return jnp.exp(-sde.theta * t)
    if isinstance(sde, OUVPSDE):
        b0, b1, s = sde.beta_min, sde.beta_max, sde.stiffness
        return jnp.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0))
    raise NotImplementedError(type(sde).__name__)


@dataclasses.dataclass(frozen=True)
class DistilledModel:
    """Student wrapper around a StoRM architecture.

    ``storm`` carries the nets/SDE/signal config (same construction as the
    teacher, so teacher checkpoints initialize the student exactly).
    ``teacher_score_params`` is set only during training (train.py); it is
    closed over by the jitted loss, never checkpointed, and not needed to
    serve a distilled checkpoint.
    """

    storm: StochasticRegenerationModel
    teacher_score_params: Any = None
    distill_N: int = 8
    distill_method: str = "etd2"
    distill_gt_weight: float = 0.0
    lr: float = 1e-4
    ema_decay: float = 0.999

    # --- passthrough surface used by train.py / serving ------------------

    @property
    def stft_config(self):
        return self.storm.stft_config

    @property
    def transform(self):
        return self.storm.transform

    @property
    def spatial_channels(self):
        return self.storm.spatial_channels

    @property
    def sde(self):
        return self.storm.sde

    @property
    def score_net(self):
        return self.storm.score_net

    @property
    def denoiser_net(self):
        return self.storm.denoiser_net

    batch_reduction = "sum"  # same reduction family as StoRM (_reduce)

    def with_teacher(self, teacher_score_params) -> "DistilledModel":
        return dataclasses.replace(
            self, teacher_score_params=teacher_score_params
        )

    def init_params(self, key, spec_shape):
        return self.storm.init_params(key, spec_shape)

    def init_state(self, key, spec_shape=(1, 256, 64)) -> TrainState:
        return init_train_state(
            self.init_params(key, spec_shape), make_optimizer(self.lr)
        )

    # --- distillation loss -------------------------------------------------

    def _require_teacher(self):
        if self.teacher_score_params is None:
            raise ValueError(
                "distillation loss needs teacher_score_params — build the "
                "model with .with_teacher(...) (train.py --mode distill "
                "does this from --teacher_ckpt)"
            )

    def _student_x0(self, params, x_T, cond, std_T, y_denoised,
                    quant=None):
        """One-evaluation x0 prediction (posterior-mean parameterization).

        m_hat = x_T + sigma^2 * score is Tweedie's estimate of the marginal
        mean m(T) = y + fac(T)(x0 - y); inverting the affine mean gives x0.
        At student == teacher initialization this IS the classic one-step
        denoise, so distillation starts from a sensible map.
        """
        B = x_T.shape[0]
        t = jnp.full((B,), self.sde.T, jnp.float32)
        s = self.storm.forward_score(params, x_T, t, cond, quant=quant)
        m_hat = x_T + right_pad_dims(std_T, x_T) ** 2 * s
        fac = _mean_factor(self.sde, self.sde.T)
        return y_denoised + (m_hat - y_denoised) / fac

    def _per_example_loss(self, params, key, batch, train: bool):
        self._require_teacher()
        x, y = batch
        kz, kd = jax.random.split(key)
        B = x.shape[0]

        y_denoised = jax.lax.stop_gradient(
            self.storm.forward_denoiser(params, y)
        )
        t_T = jnp.full((B,), self.sde.T, jnp.float32)
        std_T = self.sde.marginal_prob(x, t_T, y_denoised)[1]
        z = cplx.complex_normal(kz, x.shape[:-1])
        x_T = y_denoised + right_pad_dims(std_T, x) * z

        # teacher endpoint of the SAME trajectory (frozen)
        teacher_params = {
            "denoiser": params["denoiser"],  # unused by score_fn below
            "score": self.teacher_score_params,
        }
        cond = self.storm._conditioning(y, y_denoised)

        def teacher_score_fn(xt, t, y_sde):
            del y_sde
            return self.storm.forward_score(teacher_params, xt, t, cond)

        target, _ = ode_sample(
            kd, self.sde, teacher_score_fn, y_denoised,
            N=self.distill_N, method=self.distill_method,
            eps=self.storm.t_eps, x_init=x_T,
        )
        target = jax.lax.stop_gradient(target)

        x0_hat = self._student_x0(params, x_T, cond, std_T, y_denoised)
        per_ex = 0.5 * jnp.sum(
            jnp.square(x0_hat - target).reshape(B, -1), axis=-1
        )
        if self.distill_gt_weight > 0:
            per_ex = per_ex + self.distill_gt_weight * 0.5 * jnp.sum(
                jnp.square(x0_hat - x).reshape(B, -1), axis=-1
            )
        return per_ex

    def loss_per_example(self, params, key, batch, train: bool = False):
        return self._per_example_loss(params, key, batch, train)

    def loss_fn(self, params, key, batch, train: bool = True):
        per_ex = self._per_example_loss(params, key, batch, train)
        loss = jnp.sum(per_ex)
        return loss, {"loss": loss}

    def make_train_step(self, donate: bool = True,
                        fold_step_rng: bool = False):
        """Same contract as StochasticRegenerationModel.make_train_step.

        The denoiser receives zero gradient (its forward is wrapped in
        stop_gradient), so Adam leaves it bitwise-unchanged — it stays the
        teacher's denoiser and the checkpoint remains self-contained.
        """
        self._require_teacher()
        tx = make_optimizer(self.lr)

        def train_step(state: TrainState, batch, key):
            if fold_step_rng:
                key = jax.random.fold_in(key, state.step)
            (loss, aux), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True
            )(state.params, key, batch, True)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            ema_params = ema_update(state.ema_params, params,
                                    self.ema_decay, step)
            return (
                TrainState(step=step, params=params,
                           ema_params=ema_params, opt_state=opt_state),
                aux,
            )

        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    # --- serving ------------------------------------------------------------

    def make_enhance(self, num_samples: int = 0, quant=None,
                     batch_stats=None, deepcache: int = 0,
                     mesh=None, mesh_axes=("data", "seq"),
                     **ignored_sampler_kwargs):
        """Jitted 2-evaluation enhancement: denoiser, then the one-step
        student map. Sampler knobs (N/corrector/...) are accepted and
        ignored so the shared serving stack (BucketedEnhancer) can drive
        distilled checkpoints unchanged. `quant` takes a scale tree from
        `models.quant.calibrate_distill` (the student sees exactly one
        diffusion state — the prior at t=T — so its calibration probes
        that state, not a trajectory); deepcache is a cross-step feature
        and stays rejected (there is no second step to reuse a cache).
        """
        if deepcache:
            raise ValueError(
                "distilled serving does not support --deepcache (there is "
                "no trajectory whose steps could share cached features; "
                "NFE is already 2)"
            )
        del num_samples, batch_stats
        quant_d = quant.get("denoiser") if quant else None
        quant_s = quant.get("score") if quant else None
        from .base import spec_sharding_constraint

        constrain = spec_sharding_constraint(mesh, mesh_axes)

        @jax.jit
        def enhance(params, y, key):
            T_orig = y.shape[-1]
            y_n, norm = normalize_wav(y)
            Y, _ = prepare_spec(y_n, self.stft_config, self.transform)
            Y = constrain(Y)
            Y_denoised = self.storm.forward_denoiser(params, Y,
                                                     quant=quant_d)
            B = Y.shape[0]
            t_T = jnp.full((B,), self.sde.T, jnp.float32)
            std_T = self.sde.marginal_prob(Y, t_T, Y_denoised)[1]
            z = cplx.complex_normal(key, Y.shape[:-1])
            x_T = constrain(Y_denoised + right_pad_dims(std_T, Y) * z)
            cond = self.storm._conditioning(Y, Y_denoised)
            x0 = self._student_x0(params, x_T, cond, std_T, Y_denoised,
                                  quant=quant_s)
            x_hat = spec_to_wav(
                x0, self.stft_config, self.transform, length=T_orig
            )
            return x_hat * norm, 2

        return enhance

"""Ornstein-Uhlenbeck diffusion SDEs (OUVE / OUVP) and the reverse SDE.

Functional JAX re-design of the reference SDE layer (sgmse/sdes.py:20-327).
SDEs are frozen dataclasses of scalars; all methods are pure functions of
packed-real arrays (..., 2) and per-batch time vectors (B,), so they trace
cleanly under jit/scan. The steady-state mean `y` is passed per call, exactly
like the reference.

Conventions:
    x, y: packed-real arrays, shape (B, ..., 2).
    t:    per-batch times, shape (B,).
    Per-batch scalars (std, diffusion) are returned with shape (B,) and
    broadcast with `right_pad_dims`.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..signal import cplx
from ..utils import Registry
from ..utils.tensors import right_pad_dims

SDERegistry = Registry("SDE")


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE:
    """Ornstein-Uhlenbeck Variance-Exploding SDE.

        dx = theta (y - x) dt + sigma(t) dw,
        sigma(t) = sigma_min (sigma_max/sigma_min)^t sqrt(2 log(sigma_max/sigma_min))

    Closed-form perturbation kernel (sgmse/sdes.py:200-231):
        mean(t) = exp(-theta t) x0 + (1 - exp(-theta t)) y
        std(t)  = sqrt(sigma_min^2 exp(-2 theta t)
                       (exp(2 (theta+logsig) t) - 1) logsig / (theta+logsig))

    Defaults match the reference CLI (sgmse/sdes.py:242-252).
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    def copy(self, **updates) -> "OUVESDE":
        return dataclasses.replace(self, **updates)

    def sde(self, x, t, y):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * math.sqrt(2 * self.logsig)  # (B,)
        return drift, diffusion

    def _mean(self, x0, t, y):
        e = right_pad_dims(jnp.exp(-self.theta * t), x0)
        return e * x0 + (1.0 - e) * y

    def _std(self, t):
        s, th, ls = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (s**2 * jnp.exp(-2 * th * t) * (jnp.exp(2 * (th + ls) * t) - 1) * ls)
            / (th + ls)
        )

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    def prior_sampling(self, key, y):
        """Sample x_T ~ p_T(.|y) = N(y, std(T)^2 I_complex)."""
        std = self._std(jnp.ones(y.shape[0], dtype=jnp.float32) * self.T)
        z = cplx.complex_normal(key, y.shape[:-1])
        return y + z * right_pad_dims(std, y)

    def discretize(self, x, t, y):
        """Euler-Maruyama: x_{i+1} = x_i + f_i + G_i z_i (sgmse/sdes.py:73-90)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t, y)
        return drift * dt, diffusion * math.sqrt(dt)

    def reverse(self, score_fn, probability_flow: bool = False) -> "ReverseSDE":
        return ReverseSDE(self, score_fn, probability_flow)


@SDERegistry.register("ouvp")
@dataclasses.dataclass(frozen=True)
class OUVPSDE:
    """Ornstein-Uhlenbeck Variance-Preserving SDE.

        dx = -1/2 beta(t) stiffness (y - x) dt + sqrt(beta(t)) dw,
        beta(t) = beta_min + t (beta_max - beta_min)

    Closed forms per sgmse/sdes.py:288-312. beta_min/beta_max are required by
    the reference CLI; stiffness defaults to 1.
    """

    beta_min: float
    beta_max: float
    stiffness: float = 1.0
    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    def copy(self, **updates) -> "OUVPSDE":
        return dataclasses.replace(self, **updates)

    def _beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t, y):
        b = right_pad_dims(self._beta(t), y)
        drift = 0.5 * self.stiffness * b * (y - x)
        diffusion = jnp.sqrt(self._beta(t))  # (B,)
        return drift, diffusion

    def _mean(self, x0, t, y):
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        fac = right_pad_dims(
            jnp.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0)), x0
        )
        return y + fac * (x0 - y)

    def _std(self, t):
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        return (1.0 - jnp.exp(-0.5 * s * t * (t * (b1 - b0) + 2 * b0))) / s

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    def prior_sampling(self, key, y):
        std = self._std(jnp.ones(y.shape[0], dtype=jnp.float32) * self.T)
        z = cplx.complex_normal(key, y.shape[:-1])
        return y + z * right_pad_dims(std, y)

    def discretize(self, x, t, y):
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t, y)
        return drift * dt, diffusion * math.sqrt(dt)

    def reverse(self, score_fn, probability_flow: bool = False) -> "ReverseSDE":
        return ReverseSDE(self, score_fn, probability_flow)


@dataclasses.dataclass(frozen=True)
class ReverseSDE:
    """Reverse-time SDE/ODE built from a forward SDE and a score function.

    Functional equivalent of the reference's dynamically-built RSDE class
    (sgmse/sdes.py:92-159). `score_fn(x, t, y)` must return the score with
    the same packed-real shape as x; conditioning beyond the SDE input `y`
    should be closed over by the caller.
    """

    forward: object
    score_fn: object
    probability_flow: bool = False

    @property
    def N(self) -> int:
        return self.forward.N

    @property
    def T(self) -> float:
        return self.forward.T

    def sde(self, x, t, y):
        """Drift and diffusion of the reverse SDE (or probability-flow ODE)."""
        sde_drift, sde_diffusion = self.forward.sde(x, t, y)
        score = self.score_fn(x, t, y)
        g2 = right_pad_dims(jnp.asarray(sde_diffusion) ** 2, x)
        score_drift = -g2 * score * (0.5 if self.probability_flow else 1.0)
        total_drift = sde_drift + score_drift
        diffusion = (
            jnp.zeros_like(jnp.asarray(sde_diffusion))
            if self.probability_flow
            else sde_diffusion
        )
        return total_drift, diffusion

    def discretize(self, x, t, y):
        """Discretized reverse iteration rule (sgmse/sdes.py:147-157)."""
        f, G = self.forward.discretize(x, t, y)
        Gp = right_pad_dims(jnp.asarray(G) * jnp.ones(x.shape[0]), x)
        score = self.score_fn(x, t, y)
        rev_f = f - Gp**2 * score * (0.5 if self.probability_flow else 1.0)
        rev_G = jnp.zeros_like(Gp) if self.probability_flow else Gp
        return rev_f, rev_G

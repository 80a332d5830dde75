"""Corrector (score-based MCMC) step functions.

Pure-function re-design of the reference corrector classes
(sgmse/sampling/correctors.py:37-106): each corrector is
`step(sde, score_fn, x, t, y, key, snr, n_steps) -> (x, x_mean)` with
`n_steps` static (unrolled — it is 0 or 1 in every reference config).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..signal import cplx
from ..utils import Registry
from ..utils.tensors import right_pad_dims

CorrectorRegistry = Registry("Corrector")


@CorrectorRegistry.register("langevin")
def langevin_update(sde, score_fn, x, t, y, key, snr, n_steps):
    """Langevin MCMC with step size from grad/noise norm ratio
    (sgmse/sampling/correctors.py:45-61)."""
    x_mean = x
    for i in range(n_steps):
        key, kz = jax.random.split(key)
        grad = score_fn(x, t, y)
        noise = cplx.complex_normal(kz, x.shape[:-1])
        B = x.shape[0]
        grad_norm = jnp.linalg.norm(grad.reshape(B, -1), axis=-1).mean()
        noise_norm = jnp.linalg.norm(noise.reshape(B, -1), axis=-1).mean()
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2)
    return x, x_mean


@CorrectorRegistry.register("ald")
def ald_update(sde, score_fn, x, t, y, key, snr, n_steps):
    """Annealed Langevin dynamics: step size (snr * std(t))^2 * 2
    (sgmse/sampling/correctors.py:76-93). OUVE-style marginal std."""
    x_mean = x
    std = right_pad_dims(sde._std(t), x)
    for i in range(n_steps):
        key, kz = jax.random.split(key)
        grad = score_fn(x, t, y)
        noise = cplx.complex_normal(kz, x.shape[:-1])
        step_size = (snr * std) ** 2 * 2
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2)
    return x, x_mean


@CorrectorRegistry.register("none")
def none_corrector(sde, score_fn, x, t, y, key, snr, n_steps):
    """No-op corrector."""
    return x, x

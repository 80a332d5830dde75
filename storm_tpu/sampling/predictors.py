"""Predictor step functions for reverse-SDE sampling.

Pure-function re-design of the reference predictor classes
(sgmse/sampling/predictors.py:9-80): each predictor is
`step(rsde, x, t, y, key) -> (x, x_mean)` and is safe inside `lax.scan`.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..signal import cplx
from ..utils import Registry
from ..utils.tensors import right_pad_dims

PredictorRegistry = Registry("Predictor")


@PredictorRegistry.register("euler_maruyama")
def euler_maruyama_update(rsde, x, t, y, key):
    """x <- x + f dt + g sqrt(-dt) z (sgmse/sampling/predictors.py:46-54)."""
    dt = -1.0 / rsde.N
    z = cplx.complex_normal(key, x.shape[:-1])
    f, g = rsde.sde(x, t, y)
    x_mean = x + f * dt
    g = right_pad_dims(jnp.asarray(g) * jnp.ones(x.shape[0]), x)
    x = x_mean + g * math.sqrt(-dt) * z
    return x, x_mean


@PredictorRegistry.register("reverse_diffusion")
def reverse_diffusion_update(rsde, x, t, y, key):
    """x <- x - f_rev + G z via rsde.discretize (predictors.py:62-69)."""
    f, G = rsde.discretize(x, t, y)
    z = cplx.complex_normal(key, x.shape[:-1])
    x_mean = x - f
    x = x_mean + G * z
    return x, x_mean


@PredictorRegistry.register("etd")
def etd_update(rsde, x, t, y, key):
    """Exponential-integrator reverse-SDE step (beyond the reference).

    The OUVE reverse drift splits as theta*(y-x) - g^2*score: the linear
    part is integrated exactly over the step (exponential Euler), the score
    term held constant, and diffusion noise added with the Euler-Maruyama
    magnitude. Drop-in predictor for `pc_sample(predictor="etd")`; needs an
    SDE with constant linear drift coefficient (OUVE).
    """
    fwd = rsde.forward
    if not hasattr(fwd, "theta"):
        raise ValueError("etd predictor requires an OUVE-style SDE")
    theta = fwd.theta
    dt = -1.0 / rsde.N
    a = -theta
    ea = math.exp(a * dt)
    phi1 = (ea - 1.0) / a

    _, g = fwd.sde(x, t, y)
    g2 = right_pad_dims(jnp.asarray(g) ** 2, x)
    score = rsde.score_fn(x, t, y)
    n_term = theta * y - g2 * score  # constant-in-x part of the reverse drift
    x_mean = ea * x + phi1 * n_term

    z = cplx.complex_normal(key, x.shape[:-1])
    gp = right_pad_dims(jnp.asarray(g) * jnp.ones(x.shape[0]), x)
    x_new = x_mean + gp * math.sqrt(-dt) * z
    return x_new, x_mean


@PredictorRegistry.register("none")
def none_update(rsde, x, t, y, key):
    """No-op predictor."""
    return x, x

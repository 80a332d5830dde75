"""Legacy score-sde model helpers (≙ sgmse/backbones/ncsnpp_utils/utils.py).

The reference bundles the original score_sde helper module — a model
registry, SMLD/DDPM noise-schedule constructors, and ``get_score_fn``
wrappers that convert a raw network output into a time-dependent score.
That file is dead code upstream (never imported by any train/inference
path, SURVEY.md §2.3) and its OUVP branch even references an undefined
``sde_lib``; this module provides the same surface as *working* JAX code:

- ``register_model`` / ``get_model`` / ``create_model``
  (ncsnpp_utils/utils.py:25-48, 91-97) backed by the shared Registry —
  ``create_model`` builds a backbone by name, replacing the torch
  ``DataParallel`` wrap with nothing (sharding is a jit concern here).
- ``get_sigmas`` (utils.py:51-61): geometric SMLD noise levels.
- ``get_ddpm_params`` (utils.py:64-88): DDPM beta/alpha tables.
- ``get_model_fn`` / ``get_score_fn`` (utils.py:100-177): pure-function
  adapters; the train/eval mode flip becomes a ``deterministic`` kwarg
  and the OUVE/OUVP continuous/discrete label conventions are preserved.
- ``to_flattened_numpy`` / ``from_flattened_numpy`` (utils.py:180-187).
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ..sde.sdes import OUVESDE, OUVPSDE
from ..utils.tensors import right_pad_dims
from .registry import Registry

ModelRegistry = Registry("legacy-score-sde-model")

# Decorator-style registration, same call shapes as the reference
# (utils.py:28-44): @register_model, @register_model(name=...).


def register_model(cls=None, *, name: str | None = None):
    def _register(c):
        return ModelRegistry.register(name or c.__name__)(c)

    return _register if cls is None else _register(cls)


def get_model(name: str):
    return ModelRegistry.get_by_name(name)


def create_model(name: str, **kwargs):
    """Build a registered model by name (utils.py:91-97).

    The reference moves the module to ``config.device`` and wraps it in
    ``torch.nn.DataParallel``; with Flax modules construction is cheap and
    placement/parallelism belong to jit/shard_map, so this is just a
    registry lookup + constructor call.
    """
    return get_model(name)(**kwargs)


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int) -> np.ndarray:
    """Geometric SMLD noise levels, descending (utils.py:51-61)."""
    return np.exp(np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales))


def get_ddpm_params(
    beta_min: float, beta_max: float, num_scales: int
) -> dict[str, Any]:
    """DDPM beta/alpha schedule tables (utils.py:64-88).

    Mirrors the reference formulas exactly, including the fixed
    ``num_diffusion_timesteps = 1000`` and the ``beta/num_scales``
    rescaling of the endpoints.
    """
    num_diffusion_timesteps = 1000
    beta_start = beta_min / num_scales
    beta_end = beta_max / num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps, dtype=np.float64)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    sqrt_alphas_cumprod = np.sqrt(alphas_cumprod)
    sqrt_1m_alphas_cumprod = np.sqrt(1.0 - alphas_cumprod)

    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": sqrt_alphas_cumprod,
        "sqrt_1m_alphas_cumprod": sqrt_1m_alphas_cumprod,
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def get_model_fn(apply_fn: Callable, train: bool = False) -> Callable:
    """Adapt a network apply to the legacy ``model_fn(x, labels)`` shape
    (utils.py:100-129).

    ``apply_fn(x, labels, deterministic)`` is the functional equivalent of
    a torch module whose train/eval mode the reference flips in place; here
    the flag is threaded through explicitly.
    """

    def model_fn(x, labels):
        return apply_fn(x, labels, deterministic=not train)

    return model_fn


def get_score_fn(sde, apply_fn: Callable, train: bool = False,
                 continuous: bool = False) -> Callable:
    """Wrap a raw network into a time-dependent score function
    (utils.py:132-177), with both upstream label conventions.

    - OUVP (≙ VP branch): continuous labels are ``t*999``; discrete labels
      index a DDPM ``sqrt_1m_alphas_cumprod`` table built from the SDE's
      own beta endpoints (the reference reads the same table off its
      discrete SDE object). Output is ``-model(x, labels)/std``.
    - OUVE (≙ VE branch): continuous labels are the marginal std at t;
      discrete labels are ``round((T - t)·(N-1))``. Output is the raw
      model output (VE nets are trained to emit the score directly).
    """
    model_fn = get_model_fn(apply_fn, train=train)

    if isinstance(sde, OUVPSDE):
        if not continuous:
            table = jnp.asarray(
                get_ddpm_params(sde.beta_min, sde.beta_max, sde.N)[
                    "sqrt_1m_alphas_cumprod"
                ],
                dtype=jnp.float32,
            )

        def score_fn(x, t):
            if continuous:
                labels = t * 999
                std = sde.marginal_prob(jnp.zeros_like(x), t, jnp.zeros_like(x))[1]
            else:
                labels = (t * (sde.N - 1)).astype(jnp.int32)
                std = table[labels]
            score = model_fn(x, labels)
            return -score / right_pad_dims(std, score)

    elif isinstance(sde, OUVESDE):

        def score_fn(x, t):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t, jnp.zeros_like(x))[1]
            else:
                labels = jnp.round((sde.T - t) * (sde.N - 1)).astype(jnp.int32)
            return model_fn(x, labels)

    else:
        raise NotImplementedError(
            f"SDE class {sde.__class__.__name__} not yet supported."
        )

    return score_fn


def to_flattened_numpy(x) -> np.ndarray:
    """Flatten a device array to a 1-D numpy array (utils.py:180-182)."""
    return np.asarray(x).reshape((-1,))


def from_flattened_numpy(x: np.ndarray, shape) -> jnp.ndarray:
    """Reshape a flat numpy array back onto device (utils.py:185-187)."""
    return jnp.asarray(x).reshape(shape)

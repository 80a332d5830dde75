"""Adaptive error-controlled ODE sampling (Dormand-Prince 5(4)).

The reference's ODE path is scipy `solve_ivp(..., method='RK45',
rtol=atol=1e-5)` driven from the host (sgmse/sampling/__init__.py:74,
126-129) — it chooses its own step count per utterance. These tests pin the
on-device `lax.while_loop` counterpart (samplers.dopri45_integrate /
ode_sample(method="rk45")) against scipy itself on the SAME reverse ODE.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.sampling.samplers import dopri45_integrate, ode_sample
from storm_tpu.sde import OUVESDE
from storm_tpu.utils.tensors import right_pad_dims


def _packed(rng, shape):
    return jnp.asarray(rng.standard_normal(shape + (2,)), jnp.float32)


def _gaussian_score(sde, x0):
    """Exact score of the OUVE marginal N(mean(t), std(t)^2)."""

    def score_fn(x, t, yy):
        mean, std = sde.marginal_prob(jnp.asarray(x0), t, yy)
        return -(x - mean) / right_pad_dims(std, x) ** 2

    return score_fn


def _reference_scipy_endpoint(sde, score_fn, y, x_T, eps, rtol, atol):
    """The reference ODE sampler's integration, verbatim semantics: flatten
    the whole batch into one scipy state vector and integrate the
    probability-flow drift from T to eps with RK45
    (sgmse/sampling/__init__.py:104-131, minus the final denoise step)."""
    from scipy.integrate import solve_ivp

    rsde = sde.reverse(score_fn, probability_flow=True)
    shape = x_T.shape
    B = shape[0]

    def ode_func(t, x_flat):
        x = jnp.asarray(x_flat.reshape(shape), jnp.float32)
        vec_t = jnp.full((B,), t, jnp.float32)
        return np.asarray(rsde.sde(x, vec_t, y)[0], np.float64).reshape(-1)

    sol = solve_ivp(
        ode_func, (float(sde.T), eps), np.asarray(x_T, np.float64).reshape(-1),
        method="RK45", rtol=rtol, atol=atol,
    )
    assert sol.success
    return sol.y[:, -1].reshape(shape), sol.nfev


def test_rk45_matches_scipy_trajectory():
    """Endpoint agreement with the reference's own scipy RK45 at the
    reference tolerances (1e-5): both integrate the same smooth ODE, so
    they must agree to ~tolerance even though the step sequences differ."""
    sde = OUVESDE()
    rng = np.random.default_rng(7)
    x0 = _packed(rng, (2, 1, 8, 8)) * 0.5
    y = x0 + 0.3 * _packed(rng, (2, 1, 8, 8))
    score_fn = _gaussian_score(sde, x0)
    x_T = sde.prior_sampling(jax.random.PRNGKey(3), y)
    eps, rtol, atol = 0.03, 1e-5, 1e-5

    x_ref, nfev_ref = _reference_scipy_endpoint(
        sde, score_fn, y, x_T, eps, rtol, atol
    )
    x, nfe = ode_sample(
        jax.random.PRNGKey(0), sde, score_fn, y, method="rk45",
        rtol=rtol, atol=atol, eps=eps, denoise=False, x_init=x_T,
    )
    err = float(jnp.max(jnp.abs(x - x_ref)))
    assert err < 5e-4, f"rk45 vs scipy RK45 endpoint diff {err}"
    # the self-chosen cost must be in the same regime as scipy's
    nfe = int(nfe)
    assert nfe > 20
    assert 0.5 <= nfe / nfev_ref <= 2.0, (nfe, nfev_ref)


def test_rk45_nfe_scales_with_tolerance():
    sde = OUVESDE()
    rng = np.random.default_rng(8)
    x0 = _packed(rng, (1, 1, 8, 8)) * 0.5
    y = x0 + 0.3 * _packed(rng, (1, 1, 8, 8))
    score_fn = _gaussian_score(sde, x0)
    x_T = sde.prior_sampling(jax.random.PRNGKey(4), y)

    nfes = {}
    xs = {}
    for tol in (1e-3, 1e-5):
        x, nfe = ode_sample(
            jax.random.PRNGKey(0), sde, score_fn, y, method="rk45",
            rtol=tol, atol=tol, eps=0.03, denoise=False, x_init=x_T,
        )
        nfes[tol], xs[tol] = int(nfe), x
    assert nfes[1e-5] > nfes[1e-3], nfes
    # loose and tight runs must still agree to the loose tolerance's regime
    assert float(jnp.max(jnp.abs(xs[1e-3] - xs[1e-5]))) < 5e-2


def test_rk45_reconstructs_with_analytic_score():
    """Like the fixed-step samplers: with the exact Gaussian score the
    endpoint must land near the marginal mean at t=eps (incl. the final
    reference denoise step)."""
    sde = OUVESDE()
    rng = np.random.default_rng(9)
    x0 = _packed(rng, (2, 1, 8, 8)) * 0.5
    y = x0 + 0.3 * _packed(rng, (2, 1, 8, 8))
    score_fn = _gaussian_score(sde, x0)

    x, nfe = ode_sample(
        jax.random.PRNGKey(2), sde, score_fn, y, method="rk45",
        rtol=1e-4, atol=1e-4, eps=0.03,
    )
    mean_eps, _ = sde.marginal_prob(jnp.asarray(x0), jnp.full((2,), 0.03), y)
    err = float(jnp.max(jnp.abs(x - mean_eps)))
    assert err < 0.08, f"rk45 sampler error too large: {err}"
    assert int(nfe) > 20


def test_dopri45_on_linear_ode_exact():
    """Closed-form check without any score net: dx/dt = -x from t=1 to 0.2
    must give x0 * e^{0.8} (backward integration flips the sign in the
    exponent)."""
    x0 = jnp.asarray(np.linspace(-1, 1, 16).reshape(2, 8), jnp.float32)
    x, nfe, n_acc = dopri45_integrate(
        lambda x, t: -x, x0, 1.0, 0.2, rtol=1e-6, atol=1e-8
    )
    expect = x0 * np.exp(0.8)
    assert float(jnp.max(jnp.abs(x - expect))) < 1e-5
    assert int(n_acc) >= 1
    assert int(nfe) == 2 + 6 * int(nfe - 2) // 6  # 2 init + 6/attempt


def test_rk45_rejects_deepcache():
    sde = OUVESDE()
    with pytest.raises(ValueError, match="rk45"):
        ode_sample(
            jax.random.PRNGKey(0), sde, lambda x, t, y: -x,
            jnp.zeros((1, 4, 4, 2)), method="rk45", deepcache=2,
            deep_fn=lambda x, t: x, cached_score_fn=lambda x, t, c: -x,
        )


def test_rk45_through_make_enhance():
    """The serving stack must drive rk45 end to end: traced NFE comes back
    as a device scalar and the audio is finite."""
    from storm_tpu.models import ScoreModel

    model = ScoreModel.create(backbone="ncsnpp", sde="ouve",
                              nf=16, ch_mult=(1, 1), image_size=64)
    n_samp = (64 - 1) * model.stft_config.hop_length
    params = model.init_params(jax.random.PRNGKey(0), (1, 256, 64))
    enhance = model.make_enhance(
        n_samp, sampler_type="ode", method="rk45", rtol=1e-2, atol=1e-2,
        max_steps=50,
    )
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, n_samp)) * 0.1,
        jnp.float32,
    )
    x_hat, nfe = enhance(params, y, jax.random.PRNGKey(1))
    assert x_hat.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(x_hat)))
    assert int(nfe) > 2

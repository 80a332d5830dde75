"""Diffusion-math tests: OUVE/OUVP closed forms, reverse steps, scan samplers.

Golden values are computed from the reference's closed-form formulas
(sgmse/sdes.py:200-312) in numpy; the samplers are checked end-to-end with an
analytic Gaussian score (the reverse SDE must reconstruct x0).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from storm_tpu.sde import OUVESDE, OUVPSDE, SDERegistry
from storm_tpu.sampling import pc_sample, ode_sample
from storm_tpu.utils.tensors import right_pad_dims


def _packed(rng, shape):
    return jnp.asarray(rng.standard_normal(shape + (2,)).astype(np.float32))


def test_registry_names():
    assert set(SDERegistry.get_all_names()) >= {"ouve", "ouvp"}


def test_ouve_closed_forms():
    sde = OUVESDE()
    t = np.array([0.03, 0.25, 0.5, 1.0], dtype=np.float32)
    # reference formulas in numpy (sgmse/sdes.py:206-228)
    theta, smin, smax = 1.5, 0.05, 0.5
    logsig = np.log(smax / smin)
    sigma = smin * (smax / smin) ** t
    want_diff = sigma * np.sqrt(2 * logsig)
    want_std = np.sqrt(
        (smin**2 * np.exp(-2 * theta * t) * (np.exp(2 * (theta + logsig) * t) - 1) * logsig)
        / (theta + logsig)
    )
    rng = np.random.default_rng(0)
    x = _packed(rng, (4, 1, 8, 8))
    y = _packed(rng, (4, 1, 8, 8))
    drift, diff = sde.sde(x, jnp.asarray(t), y)
    np.testing.assert_allclose(np.asarray(diff), want_diff, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(drift), 1.5 * (np.asarray(y) - np.asarray(x)), rtol=1e-5
    )
    mean, std = sde.marginal_prob(x, jnp.asarray(t), y)
    np.testing.assert_allclose(np.asarray(std), want_std, rtol=1e-5)
    e = np.exp(-theta * t)[:, None, None, None, None]
    want_mean = e * np.asarray(x) + (1 - e) * np.asarray(y)
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-5)


def test_ouvp_closed_forms():
    sde = OUVPSDE(beta_min=0.01, beta_max=1.0, stiffness=2.0)
    t = np.array([0.1, 0.9], dtype=np.float32)
    b0, b1, s = 0.01, 1.0, 2.0
    rng = np.random.default_rng(1)
    x = _packed(rng, (2, 4))
    y = _packed(rng, (2, 4))
    mean, std = sde.marginal_prob(x, jnp.asarray(t), y)
    fac = np.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0))[:, None, None]
    want_mean = np.asarray(y) + fac * (np.asarray(x) - np.asarray(y))
    want_std = (1 - np.exp(-0.5 * s * t * (t * (b1 - b0) + 2 * b0))) / s
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), want_std, rtol=1e-5)


def test_ouve_std_solves_variance_ode():
    """P(t) = std^2 solves dP/dt = -2 theta P + g(t)^2 with P(0)=0."""
    sde = OUVESDE()
    t = jnp.linspace(0.05, 1.0, 20)
    var = lambda tt: sde._std(tt) ** 2
    dP = jax.vmap(jax.grad(lambda tt: var(tt[None])[0]))(t)
    g = sde.sde(jnp.zeros((20, 1, 2)), t, jnp.zeros((20, 1, 2)))[1]
    rhs = -2 * sde.theta * var(t) + g**2
    np.testing.assert_allclose(np.asarray(dP), np.asarray(rhs), rtol=1e-3)


def test_prior_sampling_stats():
    sde = OUVESDE()
    y = jnp.zeros((1, 1, 64, 64, 2))
    xT = sde.prior_sampling(jax.random.PRNGKey(0), y)
    stdT = float(sde._std(jnp.ones(1))[0])
    # complex std: E|z|^2 = stdT^2 -> per-component var stdT^2/2
    emp = float(jnp.std(xT))
    assert abs(emp - stdT / np.sqrt(2)) < 0.02 * stdT


def test_reverse_diffusion_step_formula():
    """Single reverse_diffusion predictor step vs hand-computed numpy."""
    from storm_tpu.sampling.predictors import reverse_diffusion_update

    sde = OUVESDE(N=50)
    rng = np.random.default_rng(3)
    x = _packed(rng, (2, 3, 4))
    y = _packed(rng, (2, 3, 4))
    score_val = _packed(rng, (2, 3, 4)) * 0.1
    score_fn = lambda xx, tt, yy: jnp.asarray(score_val)
    rsde = sde.reverse(score_fn)
    t = jnp.asarray([0.5, 0.7], dtype=jnp.float32)

    key = jax.random.PRNGKey(9)
    x_new, x_mean = reverse_diffusion_update(rsde, x, t, y, key)

    dt = 1.0 / 50
    tn = np.asarray(t)
    sigma = 0.05 * (0.5 / 0.05) ** tn
    diffusion = sigma * np.sqrt(2 * np.log(10.0))
    f = (1.5 * (np.asarray(y) - np.asarray(x))) * dt
    G = (diffusion * np.sqrt(dt))[:, None, None, None]
    rev_f = f - G**2 * score_val
    want_mean = np.asarray(x) - rev_f
    np.testing.assert_allclose(np.asarray(x_mean), want_mean, rtol=1e-4, atol=1e-6)
    # noise applied with std G per complex element
    from storm_tpu.signal import cplx

    _, kp = jax.random.split(key)  # not checking exact z, just consistency
    resid = np.asarray(x_new) - want_mean
    assert resid.shape == want_mean.shape


@pytest.mark.parametrize("corrector,steps", [("none", 0), ("ald", 1), ("langevin", 1)])
def test_pc_sampler_reconstructs_with_analytic_score(corrector, steps):
    """With the exact Gaussian score, reverse diffusion must land near the
    marginal mean at t=eps, and NFE must match N*(steps+1)."""
    sde = OUVESDE()
    rng = np.random.default_rng(5)
    x0 = _packed(rng, (2, 1, 8, 8)) * 0.5
    y = x0 + 0.3 * _packed(rng, (2, 1, 8, 8))

    def score_fn(x, t, yy):
        mean, std = sde.marginal_prob(jnp.asarray(x0), t, yy)
        return -(x - mean) / right_pad_dims(std, x) ** 2

    N = 60
    eps = 0.03
    x, nfe = pc_sample(
        jax.random.PRNGKey(1),
        sde,
        score_fn,
        y,
        predictor="reverse_diffusion",
        corrector=corrector,
        N=N,
        corrector_steps=steps,
        snr=0.5,
        eps=eps,
    )
    assert nfe == N * (steps + 1)
    mean_eps, _ = sde.marginal_prob(
        jnp.asarray(x0), jnp.full((2,), eps), y
    )
    err = float(jnp.max(jnp.abs(x - mean_eps)))
    assert err < 0.08, f"PC sampler error too large: {err}"


def test_ode_sampler_reconstructs():
    sde = OUVESDE()
    rng = np.random.default_rng(6)
    x0 = _packed(rng, (1, 1, 8, 8)) * 0.5
    y = x0 + 0.3 * _packed(rng, (1, 1, 8, 8))

    def score_fn(x, t, yy):
        mean, std = sde.marginal_prob(jnp.asarray(x0), t, yy)
        return -(x - mean) / right_pad_dims(std, x) ** 2

    x, nfe = ode_sample(
        jax.random.PRNGKey(2), sde, score_fn, y, N=40, method="heun", eps=0.03
    )
    assert nfe == 40 * 2 + 1
    mean_eps, _ = sde.marginal_prob(jnp.asarray(x0), jnp.full((1,), 0.03), y)
    err = float(jnp.max(jnp.abs(x - mean_eps)))
    assert err < 0.08, f"ODE sampler error too large: {err}"


def test_pc_sampler_under_jit_and_intermediate():
    sde = OUVESDE()
    y = jnp.ones((1, 1, 4, 4, 2)) * 0.1
    score_fn = lambda x, t, yy: -x

    f = jax.jit(
        lambda k: pc_sample(
            k, sde, score_fn, y, N=10, corrector="none", intermediate=True
        )[1]
    )
    traj = f(jax.random.PRNGKey(0))
    assert traj.shape == (10, 1, 1, 4, 4, 2)


def test_etd_exponential_integrators():
    """ETD1/ETD2 exploit OUVE's linear drift: both converge to the rk4
    reference, and ETD2 at NFE=10 beats Euler at NFE=50."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from storm_tpu.sampling.samplers import ode_sample
    from storm_tpu.sde.sdes import OUVESDE, OUVPSDE

    sde = OUVESDE()
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 6, 2)) * 0.3,
        jnp.float32,
    )

    def score_fn(x, t, ysde):
        std = sde._std(t)
        return (ysde - x) / (std**2 + 0.1)[:, None, None, None]

    ref, _ = ode_sample(jax.random.PRNGKey(1), sde, score_fn, y, N=2000,
                        method="rk4", denoise=False)

    def err(method, N):
        x, nfe = ode_sample(jax.random.PRNGKey(1), sde, score_fn, y, N=N,
                            method=method, denoise=False)
        return float(jnp.max(jnp.abs(x - ref))), nfe

    e_euler50, nfe_e = err("euler", 50)
    e_etd1_50, _ = err("etd1", 50)
    e_etd2_10, nfe_2 = err("etd2", 10)
    assert nfe_e == 50 and nfe_2 == 20
    assert e_etd1_50 < e_euler50          # exact linear part helps at equal NFE
    assert e_etd2_10 < e_euler50          # 2.5x fewer NFE, better accuracy
    assert e_etd2_10 < 0.01

    # exponential multistep: 2nd-order accuracy at ~1 NFE/step — at equal
    # NFE it beats both ETD1 (1st order) and plain Euler
    e_ms_19, nfe_ms = err("etd2-ms", 19)
    assert nfe_ms == 20                   # N + 1 (ETD2RK bootstrap)
    e_etd1_20, _ = err("etd1", 20)
    assert e_ms_19 < e_etd1_20
    assert e_ms_19 < e_euler50
    assert e_ms_19 < 0.01

    # OUVP has no constant linear drift -> clear error
    import pytest

    with pytest.raises(ValueError):
        ode_sample(jax.random.PRNGKey(0), OUVPSDE(beta_min=0.1, beta_max=1.0),
                   score_fn, y, N=4, method="etd1")


def test_picard_parallel_sampler():
    """Picard iteration: exact after N sweeps (== sequential Euler on the
    same grid), near-converged at far fewer sweeps."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from storm_tpu.sampling.samplers import ode_sample, picard_sample
    from storm_tpu.sde.sdes import OUVESDE

    sde = OUVESDE()
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 6, 2)) * 0.3,
        jnp.float32,
    )

    def score_fn(x, t, ysde):
        std = sde._std(t)
        return (ysde - x) / (std**2 + 0.1)[:, None, None, None]

    N = 12
    seq, _ = ode_sample(jax.random.PRNGKey(1), sde, score_fn, y, N=N,
                        method="euler", denoise=False)
    par_full, nfe = picard_sample(jax.random.PRNGKey(1), sde, score_fn, y,
                                  N=N, sweeps=N, denoise=False)
    assert nfe == N * N
    np.testing.assert_allclose(np.asarray(par_full), np.asarray(seq),
                               atol=1e-5)

    par_6, _ = picard_sample(jax.random.PRNGKey(1), sde, score_fn, y,
                             N=N, sweeps=6, denoise=False)
    err6 = float(jnp.max(jnp.abs(par_6 - seq)))
    par_2, _ = picard_sample(jax.random.PRNGKey(1), sde, score_fn, y,
                             N=N, sweeps=2, denoise=False)
    err2 = float(jnp.max(jnp.abs(par_2 - seq)))
    assert err6 < err2  # monotone convergence in sweeps
    assert err6 < 0.05 * float(jnp.max(jnp.abs(seq)))


def test_etd_predictor_drop_in():
    """The etd predictor matches euler_maruyama trajectories at high N
    (same noise stream) and plugs into pc_sample; OUVP is rejected."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from storm_tpu.sampling.samplers import pc_sample
    from storm_tpu.sde.sdes import OUVESDE, OUVPSDE

    sde = OUVESDE()
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 6, 2)) * 0.3,
        jnp.float32,
    )

    def score_fn(x, t, ysde):
        std = sde._std(t)
        return (ysde - x) / (std**2 + 0.1)[:, None, None, None]

    x_em, nfe_em = pc_sample(jax.random.PRNGKey(3), sde, score_fn, y,
                             predictor="euler_maruyama", corrector="none",
                             N=400)
    x_etd, nfe_etd = pc_sample(jax.random.PRNGKey(3), sde, score_fn, y,
                               predictor="etd", corrector="none", N=400)
    assert nfe_em == nfe_etd == 400
    np.testing.assert_allclose(
        np.asarray(x_etd), np.asarray(x_em), atol=5e-3
    )
    with pytest.raises(ValueError):
        pc_sample(jax.random.PRNGKey(0),
                  OUVPSDE(beta_min=0.1, beta_max=1.0), score_fn, y,
                  predictor="etd", corrector="none", N=4)

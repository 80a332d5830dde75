"""Legacy score-sde helper parity (≙ sgmse/backbones/ncsnpp_utils/utils.py).

The upstream file is dead code (never imported by any runtime path) and its
OUVP discrete branch is broken (undefined ``sde_lib``); these tests pin the
*documented* semantics of each helper: the SMLD/DDPM schedule formulas
(utils.py:51-88) and the VE/VP label + scaling conventions of
``get_score_fn`` (utils.py:132-177).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.sde.sdes import OUVESDE, OUVPSDE
from storm_tpu.utils import score_sde as ss


def test_get_sigmas_geometric_descending():
    sig = ss.get_sigmas(0.01, 50.0, 10)
    assert sig.shape == (10,)
    np.testing.assert_allclose(sig[0], 50.0, rtol=1e-12)
    np.testing.assert_allclose(sig[-1], 0.01, rtol=1e-12)
    ratios = sig[1:] / sig[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-10)


def test_get_ddpm_params_identities():
    p = ss.get_ddpm_params(beta_min=0.1, beta_max=20.0, num_scales=1000)
    n = p["num_diffusion_timesteps"]
    assert n == 1000 and p["betas"].shape == (n,)
    np.testing.assert_allclose(p["alphas"], 1.0 - p["betas"], rtol=0, atol=0)
    np.testing.assert_allclose(
        p["alphas_cumprod"], np.cumprod(1.0 - p["betas"]), rtol=1e-12
    )
    np.testing.assert_allclose(
        p["sqrt_1m_alphas_cumprod"] ** 2 + p["sqrt_alphas_cumprod"] ** 2,
        1.0, rtol=1e-10,
    )
    # endpoint rescaling (utils.py:67-68, 85-86)
    np.testing.assert_allclose(p["betas"][0], 0.1 / 1000)
    np.testing.assert_allclose(p["beta_min"], (0.1 / 1000) * (n - 1))
    np.testing.assert_allclose(p["beta_max"], (20.0 / 1000) * (n - 1))


def test_model_registry_roundtrip():
    @ss.register_model(name="_test_dummy")
    class Dummy:
        def __init__(self, k=3):
            self.k = k

    assert ss.get_model("_test_dummy") is Dummy
    assert ss.create_model("_test_dummy", k=7).k == 7
    with pytest.raises(ValueError):
        ss.register_model(name="_test_dummy")(Dummy)


def _echo_labels(x, labels, deterministic):
    # net that returns its time labels broadcast over x, so tests can read
    # back exactly what labels the wrapper computed
    return jnp.zeros_like(x) + labels.reshape((-1,) + (1,) * (x.ndim - 1))


def test_score_fn_ouve_continuous_labels_are_marginal_std():
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=1000)
    x = jnp.zeros((2, 4, 4))
    t = jnp.array([0.3, 0.9])
    fn = ss.get_score_fn(sde, _echo_labels, continuous=True)
    out = fn(x, t)
    std = sde.marginal_prob(jnp.zeros_like(x), t, jnp.zeros_like(x))[1]
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), np.asarray(std), rtol=1e-6)


def test_score_fn_ouve_discrete_labels_round():
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=1000)
    x = jnp.zeros((2, 4, 4))
    t = jnp.array([0.0, 0.25])
    out = ss.get_score_fn(sde, _echo_labels, continuous=False)(x, t)
    want = np.round((sde.T - np.array([0.0, 0.25])) * (sde.N - 1))
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), want)


def test_score_fn_ouvp_continuous_scales_by_minus_std():
    sde = OUVPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    x = jnp.zeros((2, 4, 4))
    t = jnp.array([0.2, 0.7])

    def ones_net(x, labels, deterministic):
        return jnp.ones_like(x)

    out = ss.get_score_fn(sde, ones_net, continuous=True)(x, t)
    std = sde.marginal_prob(jnp.zeros_like(x), t, jnp.zeros_like(x))[1]
    want = np.broadcast_to(np.asarray(-1.0 / std)[:, None, None], out.shape)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)


def test_score_fn_ouvp_discrete_uses_ddpm_table():
    sde = OUVPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    x = jnp.zeros((1, 4, 4))
    t = jnp.array([0.5])

    def ones_net(x, labels, deterministic):
        return jnp.ones_like(x)

    out = ss.get_score_fn(sde, ones_net, continuous=False)(x, t)
    table = ss.get_ddpm_params(0.1, 20.0, 1000)["sqrt_1m_alphas_cumprod"]
    idx = int(0.5 * (sde.N - 1))
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), -1.0 / table[idx], rtol=1e-5)


def test_flatten_roundtrip():
    x = jnp.arange(12.0).reshape(3, 4)
    flat = ss.to_flattened_numpy(x)
    assert flat.shape == (12,)
    back = ss.from_flattened_numpy(flat, (3, 4))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))

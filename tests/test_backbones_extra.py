"""Tests for ConvTasNet and GaGNet backbones + their model-layer wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.backbones import BackboneRegistry
from storm_tpu.backbones.convtasnet import ConvTasNet, cLN
from storm_tpu.backbones.gagnet import GaGNet


def test_convtasnet_forward_shapes():
    model = ConvTasNet.from_kwargs(enc_dim=32, feature_dim=16, layer=3, stack=1)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3200)) * 0.1, jnp.float32
    )
    vs = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vs, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # (B, 1, T) interface too
    out3 = model.apply(vs, x[:, None, :])
    assert out3.shape == (2, 1, 3200)
    np.testing.assert_allclose(np.asarray(out3[:, 0]), np.asarray(out), atol=1e-6)


def test_convtasnet_causal_cln():
    """Causal mode must not look ahead: truncating the input must not
    change earlier outputs."""
    model = ConvTasNet.from_kwargs(
        enc_dim=32, feature_dim=16, layer=3, stack=1, causal=True
    )
    rng = np.random.default_rng(1)
    x_full = jnp.asarray(rng.standard_normal((1, 4800)) * 0.1, jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x_full)
    out_full = np.asarray(model.apply(vs, x_full))
    x_trunc = x_full.at[:, 3200:].set(rng.standard_normal(1600) * 5.0)
    out_trunc = np.asarray(model.apply(vs, x_trunc))
    # outputs well before the change point must agree (allow decoder overlap)
    np.testing.assert_allclose(
        out_full[:, :2800], out_trunc[:, :2800], atol=1e-4
    )


def test_cln_matches_definition():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 7, 5)), jnp.float32)
    mod = cLN()
    vs = mod.init(jax.random.PRNGKey(0), x)
    got = np.asarray(mod.apply(vs, x))
    xn = np.asarray(x)
    for t in range(7):
        seg = xn[:, : t + 1, :].reshape(2, -1)
        mean = seg.mean(axis=1, keepdims=True)
        var = (seg**2).mean(axis=1, keepdims=True) - mean**2
        want = (xn[:, t, :] - mean) / np.sqrt(var + 1e-8)
        np.testing.assert_allclose(got[:, t, :], want, atol=1e-3)


def test_gagnet_forward():
    model = GaGNet.from_kwargs(d_feat=448, q=1, p=1)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 1, 256, 16, 2)) * 0.1,
        jnp.float32,
    )
    vs = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vs, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # tanh complex mask: |out| <= sqrt(2)*|x| elementwise-ish — check bound
    mag_in = np.abs(np.asarray(x)).max()
    assert np.abs(np.asarray(out)).max() <= 2.5 * mag_in + 1e-3


def test_gagnet_registry_and_param_count():
    cls = BackboneRegistry.get_by_name("gagnet")
    model = cls.from_kwargs()
    x = jnp.zeros((1, 1, 256, 8, 2), jnp.float32)
    vs = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(vs)) / 1e6
    # reference GaGNet at these defaults is ~6M params (gagnet.py self-test
    # prints the count); sanity-range check
    assert 2 < n < 15, f"{n:.2f}M"


def test_discriminative_model_convtasnet():
    """FORCE_STFT_OUT wiring: spec in -> time compare (sgmse/model.py:322-331)."""
    from storm_tpu.models import DiscriminativeModel

    model = DiscriminativeModel.create(
        backbone="convtasnet", enc_dim=32, feature_dim=16, layer=2, stack=1,
        loss_type="sisdr",
    )
    assert model.force_stft_out
    spec_shape = (2, 256, 16)
    state = model.init_state(jax.random.PRNGKey(0), spec_shape)
    from tests.test_models import tiny_batch

    batch = tiny_batch(jax.random.PRNGKey(1), spec_shape)
    step = model.make_train_step(donate=False)
    state, aux = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))

    n_samp = 15 * 128
    y = jax.random.normal(jax.random.PRNGKey(9), (1, n_samp)) * 0.1
    enhance = model.make_enhance()
    x_hat, nfe = enhance(state.params, y, jax.random.PRNGKey(10))
    assert x_hat.shape == (1, n_samp)
    assert nfe == 1


def test_storm_with_convtasnet_denoiser():
    from storm_tpu.models import StochasticRegenerationModel

    model = StochasticRegenerationModel.create(
        backbone_denoiser="convtasnet", backbone_score="ncsnpp",
        sde="ouve", nf=16, ch_mult=(1, 1), image_size=64,
        enc_dim=32, feature_dim=16, layer=2, stack=1,
    )
    spec_shape = (1, 256, 16)
    state = model.init_state(jax.random.PRNGKey(0), spec_shape)
    from tests.test_models import tiny_batch

    batch = tiny_batch(jax.random.PRNGKey(1), spec_shape)
    step = model.make_train_step(donate=False)
    state, aux = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))


def test_gagnet_as_storm_denoiser():
    from storm_tpu.models import StochasticRegenerationModel

    model = StochasticRegenerationModel.create(
        backbone_denoiser="gagnet", backbone_score="ncsnpp",
        sde="ouve", nf=16, ch_mult=(1, 1), image_size=64,
        q=1, p=1,
    )
    spec_shape = (1, 256, 16)
    state = model.init_state(jax.random.PRNGKey(0), spec_shape)
    from tests.test_models import tiny_batch

    batch = tiny_batch(jax.random.PRNGKey(1), spec_shape)
    step = model.make_train_step(donate=False)
    state, aux = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))

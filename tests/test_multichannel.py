"""Multichannel (spatial_channels > 1) through the MODEL layer.

The reference supports D>1 end to end (sgmse/data_module.py:83-87 ->
model.py spatial_channels -> ncsnpp.py); round 1 supported it only in the
backbone/dataset. These tests drive D=2 through loss, train step and
jitted enhancement (VERDICT round-1 item 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.models.discriminative import DiscriminativeModel
from storm_tpu.models.score import ScoreModel
from storm_tpu.models.storm import StochasticRegenerationModel

KW = dict(nf=16, ch_mult=(1, 2), image_size=64, spatial_channels=2)
B, D, F, T = 2, 2, 64, 32


def _batch(key):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (B, D, F, T, 2)) * 0.1
    y = jax.random.normal(ky, (B, D, F, T, 2)) * 0.1
    return x, y


def test_storm_d2_loss_and_train_step():
    m = StochasticRegenerationModel.create(**KW)
    assert m.spatial_channels == 2
    state = m.init_state(jax.random.PRNGKey(0), (B, F, T))
    batch = _batch(jax.random.PRNGKey(1))

    loss, aux = m.loss_fn(state.params, jax.random.PRNGKey(2), batch, True)
    assert np.isfinite(float(loss))

    step = m.make_train_step(donate=False)
    state2, aux = step(state, batch, jax.random.PRNGKey(3))
    assert int(state2.step) == 1
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(moved)) > 0

    # per-example losses for masked validation
    per = m.loss_per_example(state.params, jax.random.PRNGKey(4), batch)
    assert per.shape == (B,) and np.all(np.isfinite(np.asarray(per)))


def test_storm_d2_enhance_shapes():
    m = StochasticRegenerationModel.create(**KW)
    params = m.init_params(jax.random.PRNGKey(0), (1, F, T))
    n_samples = (T - 1) * m.stft_config.hop_length
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, D, n_samples)), jnp.float32
    ) * 0.1
    enhance = m.make_enhance(N=3)
    x_hat, nfe = enhance(params, y, jax.random.PRNGKey(1))
    assert x_hat.shape == (1, D, n_samples)
    assert int(nfe) == 4  # denoiser + 3 reverse steps
    assert np.all(np.isfinite(np.asarray(x_hat)))


def test_score_d2_loss():
    m = ScoreModel.create(**KW)
    params = m.init_params(jax.random.PRNGKey(0), (B, F, T))
    loss, _ = m.loss_fn(params, jax.random.PRNGKey(1), _batch(jax.random.PRNGKey(2)), False)
    assert np.isfinite(float(loss))


def test_discriminative_d2_loss():
    m = DiscriminativeModel.create(**KW)
    params = m.init_params(jax.random.PRNGKey(0), (B, F, T))
    loss, _ = m.loss_fn(params, jax.random.PRNGKey(1), _batch(jax.random.PRNGKey(2)), False)
    assert np.isfinite(float(loss))


def test_bucketed_enhancer_d2():
    from storm_tpu.utils.inference import BucketedEnhancer

    m = StochasticRegenerationModel.create(**KW)
    params = m.init_params(jax.random.PRNGKey(0), (1, F, T))
    enhancer = BucketedEnhancer(m, params, N=2, bucket_frames=16)
    rng = np.random.default_rng(0)
    y = rng.standard_normal((D, 3000)).astype(np.float32) * 0.1
    x_hat, nfe = enhancer(y, jax.random.PRNGKey(1))
    assert x_hat.shape == y.shape  # (D, T) preserved

    yb = rng.standard_normal((3, D, 3000)).astype(np.float32) * 0.1
    x_hat, nfe = enhancer(yb, jax.random.PRNGKey(2))
    assert x_hat.shape == yb.shape

    with pytest.raises(ValueError):
        enhancer(rng.standard_normal((3, 3000)).astype(np.float32),
                 jax.random.PRNGKey(3))

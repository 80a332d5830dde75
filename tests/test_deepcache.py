"""Deep-feature caching (DeepCache-style serving acceleration).

Core invariant: `forward_shallow(x, t, deep_features(x, t))` is EXACTLY the
full forward — the cache boundary is a pure cut through the U-Net dataflow
(storm_tpu/backbones/ncsnpp.py). On top of that, `pc_sample(deepcache=1,
corrector="none")` reproduces the vanilla sampler bit-for-bit: the cache is
refreshed at the very (x, t) the predictor evaluates.

Reference being accelerated: the per-step score evaluations of
sgmse/sampling/__init__.py:54-66; technique: Ma et al., arXiv:2312.00858.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.backbones.ncsnpp import NCSNpp
from storm_tpu.models import ScoreModel, StochasticRegenerationModel


def tiny_net(**kw):
    cfg = dict(
        nf=16,
        ch_mult=(1, 2, 2),
        num_res_blocks=1,
        image_size=32,
        input_channels=4,
    )
    cfg.update(kw)
    return NCSNpp(**cfg)


def _rand_in(key, B=2, Cc=2, F=32, T=16):
    return jax.random.normal(key, (B, Cc, F, T, 2), jnp.float32) * 0.3


@pytest.mark.parametrize("cache_depth", [1, 2])
def test_shallow_of_deep_equals_full(cache_depth):
    net = tiny_net()
    key = jax.random.PRNGKey(0)
    x = _rand_in(key)
    t = jnp.array([0.7, 0.3], jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)

    full = net.apply(params, x, t)
    cache = net.apply(
        params, x, t, method="deep_features", cache_depth=cache_depth
    )
    shallow = net.apply(
        params, x, t, method="forward_shallow",
        cache=cache, cache_depth=cache_depth,
    )
    np.testing.assert_allclose(
        np.asarray(shallow), np.asarray(full), atol=1e-5, rtol=1e-5
    )


def test_shallow_of_deep_equals_full_with_attention():
    # attn at the 16-resolution (mid levels) like ncsnpplarge's attn@16
    net = tiny_net(attn_resolutions=(16,))
    key = jax.random.PRNGKey(2)
    x = _rand_in(key)
    t = jnp.array([0.9, 0.5], jnp.float32)
    params = net.init(jax.random.PRNGKey(3), x, t)
    full = net.apply(params, x, t)
    cache = net.apply(params, x, t, method="deep_features", cache_depth=1)
    shallow = net.apply(
        params, x, t, method="forward_shallow", cache=cache, cache_depth=1
    )
    np.testing.assert_allclose(
        np.asarray(shallow), np.asarray(full), atol=1e-5, rtol=1e-5
    )


def test_cache_depth_bounds():
    net = tiny_net()
    x = _rand_in(jax.random.PRNGKey(0))
    t = jnp.array([0.7, 0.3], jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)
    with pytest.raises(AssertionError):
        net.apply(params, x, t, method="deep_features", cache_depth=3)
    with pytest.raises(AssertionError):
        net.apply(params, x, t, method="deep_features", cache_depth=0)


def _tiny_storm(**kw):
    return StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp",
        backbone_score="ncsnpp",
        sde="ouve",
        nf=16,
        ch_mult=(1, 2),
        image_size=32,
        **kw,
    )


def test_pc_deepcache1_none_corrector_exact():
    """interval=1 + corrector='none': every predictor evaluation uses a
    cache computed at its own (x, t) — identical trajectory to vanilla."""
    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = np.random.default_rng(0).standard_normal((1, T)).astype(np.float32)
    y = jnp.asarray(0.1 * y)
    key = jax.random.PRNGKey(7)

    base = model.make_enhance(T, N=4, corrector="none")
    cached = model.make_enhance(T, N=4, corrector="none", deepcache=1)
    x0, nfe0 = base(params, y, key)
    x1, nfe1 = cached(params, y, key)
    assert int(nfe0) == int(nfe1)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0), atol=1e-5, rtol=1e-5
    )


def test_pc_deepcache_interval_runs_close():
    """interval>1 is an approximation — finite, right shape, and close to
    the exact trajectory on a tiny problem."""
    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = np.random.default_rng(1).standard_normal((1, T)).astype(np.float32)
    y = jnp.asarray(0.1 * y)
    key = jax.random.PRNGKey(8)

    base = model.make_enhance(T, N=6, corrector="ald")
    cached = model.make_enhance(T, N=6, corrector="ald", deepcache=3)
    x0, _ = base(params, y, key)
    x1, nfe = cached(params, y, key)
    assert x1.shape == y.shape
    assert np.isfinite(np.asarray(x1)).all()
    assert int(nfe) == 1 + 6 * 2  # NFE contract unchanged
    # same noise stream, same schedule: trajectories stay in the same
    # neighborhood (loose tolerance — this is an approximation)
    ref = np.asarray(x0)
    err = np.linalg.norm(np.asarray(x1) - ref) / np.linalg.norm(ref)
    assert err < 0.5, err


def test_scoremodel_deepcache():
    model = ScoreModel.create(
        backbone="ncsnpp", sde="ouve", nf=16, ch_mult=(1, 2), image_size=32
    )
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = np.random.default_rng(2).standard_normal((1, T)).astype(np.float32)
    y = jnp.asarray(0.1 * y)
    key = jax.random.PRNGKey(9)
    base = model.make_enhance(T, N=4, corrector="none")
    cached = model.make_enhance(T, N=4, corrector="none", deepcache=1)
    x0, _ = base(params, y, key)
    x1, _ = cached(params, y, key)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0), atol=1e-5, rtol=1e-5
    )


def test_deepcache_streaming_composition():
    """The production long-form path composes stream_enhance over a
    deepcache BucketedEnhancer (enhancement.py --stream_chunk_s +
    --deepcache). With interval=1 + corrector='none' the cached program
    is exact, so the composed result must equal the non-cached streaming
    result on the same keys/chunking."""
    from storm_tpu.utils.inference import BucketedEnhancer
    from storm_tpu.utils.streaming import stream_enhance

    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 6000
    y = (0.1 * np.random.default_rng(3).standard_normal(T)).astype(
        np.float32
    )
    kwargs = dict(chunk_samples=2048, overlap_samples=512, max_batch=4)

    base = BucketedEnhancer(
        model, params, minibatch=4, N=3, corrector="none", bucket_frames=16
    )
    x0, nfe0 = stream_enhance(base, y, jax.random.PRNGKey(4), **kwargs)

    dc = BucketedEnhancer(
        model, params, minibatch=4, N=3, corrector="none", bucket_frames=16,
        deepcache=1,
    )
    x1, nfe1 = stream_enhance(dc, y, jax.random.PRNGKey(4), **kwargs)

    assert x1.shape == y.shape and int(nfe0) == int(nfe1)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0), atol=1e-5, rtol=1e-5
    )


def test_deepcache_rejects_unsupported():
    model = _tiny_storm()
    with pytest.raises(ValueError, match="pc or ode"):
        model.make_enhance(0, sampler_type="picard", deepcache=2)
    with pytest.raises(ValueError):
        model.make_enhance(0, deepcache=-1)


@pytest.mark.parametrize("method", ["euler", "etd1"])
def test_ode_deepcache1_single_eval_methods_exact(method):
    """Single-evaluation ODE methods with interval=1: every drift eval uses
    a cache refreshed at its own (x, t0) — identical trajectory to the
    exact ODE sampler (final denoise step always uses the exact score)."""
    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = np.random.default_rng(4).standard_normal((1, T)).astype(np.float32)
    y = jnp.asarray(0.1 * y)
    key = jax.random.PRNGKey(11)

    base = model.make_enhance(T, sampler_type="ode", N=4, method=method)
    cached = model.make_enhance(
        T, sampler_type="ode", N=4, method=method, deepcache=1
    )
    x0, nfe0 = base(params, y, key)
    x1, nfe1 = cached(params, y, key)
    assert int(nfe0) == int(nfe1)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(x0), atol=1e-5, rtol=1e-5
    )


def test_ode_deepcache_heun_interval_runs_close():
    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = np.random.default_rng(6).standard_normal((1, T)).astype(np.float32)
    y = jnp.asarray(0.1 * y)
    key = jax.random.PRNGKey(12)

    base = model.make_enhance(T, sampler_type="ode", N=6, method="heun")
    cached = model.make_enhance(
        T, sampler_type="ode", N=6, method="heun", deepcache=3
    )
    x0, _ = base(params, y, key)
    x1, nfe = cached(params, y, key)
    assert x1.shape == y.shape
    assert np.isfinite(np.asarray(x1)).all()
    assert int(nfe) == 1 + 6 * 2 + 1  # denoiser + N heun steps x2 + denoise
    ref = np.asarray(x0)
    err = np.linalg.norm(np.asarray(x1) - ref) / np.linalg.norm(ref)
    assert err < 0.5, err


def test_ode_deepcache_rejects_etd2ms():
    model = _tiny_storm()
    params = model.init_params(jax.random.PRNGKey(0), (1, 32, 16))
    T = 15 * 128
    y = jnp.zeros((1, T), jnp.float32)
    enhance = model.make_enhance(
        T, sampler_type="ode", N=4, method="etd2-ms", deepcache=2
    )
    with pytest.raises(ValueError, match="etd2-ms"):
        enhance(params, y, jax.random.PRNGKey(0))


def test_deepcache_rejects_ae_ncsnpp():
    """ae-ncsnpp inherits deep_features but its waveform encoder/decoder
    wrapper bypasses the cache split — must be rejected cleanly, not die
    with a shape error at trace time."""
    model = ScoreModel.create(
        backbone="ae-ncsnpp", sde="ouve", nf=16, ch_mult=(1, 2),
        image_size=32,
    )
    with pytest.raises(ValueError, match="does not support"):
        model.make_enhance(0, deepcache=2)

"""Sequence-parallel (model-parallel) serving.

`BucketedEnhancer(seq_parallel=k)` shards each spectrogram's time-frame
axis over k devices of the 8-device CPU mesh for the whole reverse
diffusion (models.base.spec_sharding_constraint; GSPMD halo exchange
through the U-Net). Outputs must match unsharded serving. The reference
has no model-parallel serving at all (its DDP, train.py:150, is
data-parallel training only) — this is the latency-scaling axis.
"""
import jax
import numpy as np
import pytest

from storm_tpu.models.score import ScoreModel
from storm_tpu.models.storm import StochasticRegenerationModel
from storm_tpu.utils.inference import BucketedEnhancer


def _storm(**kw):
    model = StochasticRegenerationModel.create(nf=16, ch_mult=(1, 2),
                                               image_size=64)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 16))
    return model, params


def _wav(batch, n=1800, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, n)).astype(np.float32) * 0.1


def test_sp_enhancer_matches_unsharded():
    model, params = _storm()
    kw = dict(N=2, corrector="none", bucket_frames=16, minibatch=1)
    plain = BucketedEnhancer(model, params, **kw)
    sp = BucketedEnhancer(model, params, seq_parallel=4, **kw)
    assert sp.minibatch == 1  # pure SP: one utterance per call

    y = _wav(2)
    x0, nfe0 = plain(y, jax.random.PRNGKey(1))
    x1, nfe1 = sp(y, jax.random.PRNGKey(1))
    assert nfe0 == nfe1
    np.testing.assert_allclose(x0, x1, atol=1e-4)


@pytest.mark.midweight  # composition-of-features check; core keeps the
# sp-vs-unsharded equality and the score-model sp path
def test_sp_composes_with_dp():
    model, params = _storm()
    kw = dict(N=2, corrector="none", bucket_frames=16, minibatch=2)
    plain = BucketedEnhancer(model, params, **kw)
    spdp = BucketedEnhancer(model, params, seq_parallel=4,
                            data_parallel=True, **kw)
    assert spdp.minibatch == 2  # 8 devices / seq 4 = data 2

    y = _wav(4, seed=3)
    x0, nfe0 = plain(y, jax.random.PRNGKey(2))
    x1, nfe1 = spdp(y, jax.random.PRNGKey(2))
    assert nfe0 == nfe1
    np.testing.assert_allclose(x0, x1, atol=1e-4)


@pytest.mark.midweight  # composition-of-features check (see above)
def test_sp_composes_with_deepcache():
    model, params = _storm()
    kw = dict(N=4, corrector="none", bucket_frames=16, minibatch=1,
              deepcache=2)
    plain = BucketedEnhancer(model, params, **kw)
    sp = BucketedEnhancer(model, params, seq_parallel=4, **kw)

    y = _wav(1, seed=5)
    x0, nfe0 = plain(y, jax.random.PRNGKey(4))
    x1, nfe1 = sp(y, jax.random.PRNGKey(4))
    assert nfe0 == nfe1
    np.testing.assert_allclose(x0, x1, atol=1e-4)


def test_sp_score_model():
    model = ScoreModel.create(backbone="ncsnpp", nf=16, ch_mult=(1, 2),
                              image_size=64)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 16))
    kw = dict(N=2, corrector="none", bucket_frames=16, minibatch=1)
    plain = BucketedEnhancer(model, params, **kw)
    sp = BucketedEnhancer(model, params, seq_parallel=4, **kw)

    y = _wav(1, seed=7)
    x0, nfe0 = plain(y, jax.random.PRNGKey(6))
    x1, nfe1 = sp(y, jax.random.PRNGKey(6))
    assert nfe0 == nfe1
    np.testing.assert_allclose(x0, x1, atol=1e-4)


def test_sp_rejects_nondivisible_device_count():
    model, params = _storm()
    with pytest.raises(ValueError, match="must divide"):
        BucketedEnhancer(model, params, seq_parallel=3, N=2,
                         corrector="none")

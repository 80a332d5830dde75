"""Data-parallel serving: BucketedEnhancer(data_parallel=True) shards
batches over the 8-device CPU mesh and must match unsharded outputs."""
import jax
import numpy as np

from storm_tpu.models.storm import StochasticRegenerationModel
from storm_tpu.utils.inference import BucketedEnhancer


def test_dp_enhancer_matches_unsharded():
    model = StochasticRegenerationModel.create(nf=16, ch_mult=(1, 2),
                                               image_size=64)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 16))
    kw = dict(N=2, corrector="none", bucket_frames=16)
    plain = BucketedEnhancer(model, params, minibatch=8, **kw)
    dp = BucketedEnhancer(model, params, minibatch=8, data_parallel=True,
                          **kw)
    assert dp.minibatch == 8  # already divisible by 8 devices

    rng = np.random.default_rng(0)
    y = rng.standard_normal((8, 1800)).astype(np.float32) * 0.1
    x0, nfe0 = plain(y, jax.random.PRNGKey(1))
    x1, nfe1 = dp(y, jax.random.PRNGKey(1))
    assert nfe0 == nfe1
    np.testing.assert_allclose(x0, x1, atol=1e-5)


def test_dp_enhancer_rounds_minibatch_to_devices():
    model = StochasticRegenerationModel.create(nf=16, ch_mult=(1, 2),
                                               image_size=64)
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 16))
    dp = BucketedEnhancer(model, params, minibatch=5, data_parallel=True,
                          N=2, corrector="none", bucket_frames=16)
    assert dp.minibatch == 8  # rounded up to the 8-device mesh

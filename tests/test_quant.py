"""int8 PTQ serving path (nn/qconv.py, models/quant.py).

No upstream analogue (the reference serves fp32 CUDA); these tests pin:
- QuantizableConv's default path is bit-identical to flax.linen.Conv
  (param layout AND numerics — checkpoint compatibility),
- calibration records amax and produces a filtered scale tree,
- the int8 path is a close approximation on well-conditioned inputs,
- StoRM end-to-end enhance runs under quant and stays close to bf16.
"""
import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.nn.init import ddpm_init
from storm_tpu.nn.qconv import QuantizableConv


def _pair(ks, pad, st, dt):
    kw = dict(
        kernel_init=ddpm_init(1.0), bias_init=fnn.initializers.zeros,
        dtype=dt, param_dtype=jnp.float32,
    )
    a = fnn.Conv(12, ks, strides=st, padding=pad, **kw)
    b = QuantizableConv(12, ks, strides=st, padding=pad, **kw)
    return a, b


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize(
    "ks,pad,st",
    [
        ((3, 3), [(1, 1), (1, 1)], (1, 1)),
        ((1, 1), "SAME", (1, 1)),
        ((3, 3), [(1, 1), (1, 1)], (2, 2)),
    ],
)
def test_qconv_default_path_matches_flax_conv(dt, ks, pad, st):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 16, 16, 8)), jnp.float32
    )
    a, b = _pair(ks, pad, st, dt)
    va = a.init(jax.random.PRNGKey(1), x)
    vb = b.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    for la, lb in zip(
        jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(
        np.asarray(a.apply(va, x)), np.asarray(b.apply(vb, x))
    )


def test_qconv_int8_path_accuracy():
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 16, 16, 32)), jnp.float32
    )
    m = QuantizableConv(
        32, (3, 3), padding=[(1, 1), (1, 1)],
        kernel_init=fnn.initializers.normal(0.1),
        bias_init=fnn.initializers.normal(0.1),
        dtype=jnp.float32,
    )
    v = m.init(jax.random.PRNGKey(2), x)
    y_ref, stats = m.apply(v, x, mutable=["quant_stats"])
    amax = stats["quant_stats"]["amax"]
    assert float(amax) == pytest.approx(float(jnp.max(jnp.abs(x))))
    yq = m.apply(
        {"params": v["params"], "quant": {"a_scale": amax / 127.0}}, x
    )
    err = np.abs(np.asarray(yq) - np.asarray(y_ref)).max()
    scale = np.abs(np.asarray(y_ref)).max()
    assert err / scale < 0.03  # W8A8 per-channel: ~1% typical


def test_scales_from_stats_filters_small_convs():
    from storm_tpu.models.quant import scales_from_stats

    stats = {
        "big": {"amax": jnp.asarray(2.0)},
        "small": {"amax": jnp.asarray(2.0)},
        "nested": {"inner": {"amax": jnp.asarray(4.0)}},
    }
    params = {
        "big": {"kernel": jnp.zeros((3, 3, 128, 128))},
        "small": {"kernel": jnp.zeros((3, 3, 8, 128))},
        "nested": {"inner": {"kernel": jnp.zeros((1, 1, 256, 128))}},
    }
    q = scales_from_stats(stats, params, min_channels=128)
    assert "small" not in q
    assert float(q["big"]["a_scale"]) == pytest.approx(2.0 / 127.0)
    assert float(q["nested"]["inner"]["a_scale"]) == pytest.approx(4.0 / 127.0)


def test_storm_enhance_quant_end_to_end():
    from storm_tpu.models import StochasticRegenerationModel
    from storm_tpu.models.quant import calibrate_storm, num_quantized_convs

    # two-level nf=8 geometry: the quantization machinery (calibration
    # trajectory, scale trees, int8 dispatch) is depth-independent, and the
    # default 4-level graph costs 3 full sampler compiles on the 1-core CPU
    # host (~4 min) for the same assertions
    model = StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        nf=8, ch_mult=(1, 2), image_size=64, n_fft=126, hop_length=64,
    )
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 64))
    # zero-init output convs (ddpm init_scale=0) would mask the quantized
    # inner layers entirely — randomize all-zero kernels so signal flows
    k = jax.random.PRNGKey(3)

    def derandomize(p):
        leaves, treedef = jax.tree_util.tree_flatten(p)
        keys = jax.random.split(k, len(leaves))
        out = [
            jax.random.normal(kk, l.shape) * 0.05
            if l.ndim >= 2 and not np.any(np.asarray(l))
            else l
            for kk, l in zip(keys, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, out)

    params = derandomize(params)
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)) * 0.1, jnp.float32
    )
    quant = calibrate_storm(
        model, params, y, jax.random.PRNGKey(1), N=4, num_probe=3,
        min_channels=8,
    )
    assert num_quantized_convs(quant["denoiser"]) > 10
    assert num_quantized_convs(quant["score"]) > 10

    kk = jax.random.PRNGKey(2)
    xb, nfe = model.make_enhance(N=4, corrector="none")(params, y, kk)
    xq, nfe_q = model.make_enhance(N=4, corrector="none", quant=quant)(
        params, y, kk
    )
    assert nfe == nfe_q == 5
    xb, xq = np.asarray(xb), np.asarray(xq)
    assert np.isfinite(xq).all()
    # same program modulo int8 conv noise: close but not identical
    rel = np.abs(xq - xb).max() / (np.abs(xb).max() + 1e-12)
    assert 0 < rel < 0.25


def test_scale_tree_save_load_roundtrip(tmp_path):
    """Scales persist as checkpoint artifacts (enhancement.py caches them
    next to the checkpoint): save -> load must reproduce the tree."""
    from storm_tpu.models.quant import load_scales, save_scales

    tree = {
        "denoiser": {
            "Down_0": {"Conv_0": {"a_scale": jnp.asarray(0.25, jnp.float32)},
                       "Conv_1": {"a_scale": jnp.asarray(0.5, jnp.float32)}},
        },
        "score": None,
    }
    p = tmp_path / "scales.json"
    save_scales(str(p), tree)
    back = load_scales(str(p))
    assert set(back) == {"denoiser"}
    np.testing.assert_allclose(
        np.asarray(back["denoiser"]["Down_0"]["Conv_0"]["a_scale"]), 0.25)
    np.testing.assert_allclose(
        np.asarray(back["denoiser"]["Down_0"]["Conv_1"]["a_scale"]), 0.5)
    # .get("score") -> None keeps the bf16 path for the missing net
    assert (back or {}).get("score") is None

    # empty tree round-trips to None (pure-bf16 serving)
    save_scales(str(p), None)
    assert load_scales(str(p)) is None


def test_calibration_without_quantizable_convs_is_noop():
    """Backbones with no QuantizableConv (GaGNet) must calibrate to None,
    not crash (code-review regression: empty mutable collection ->
    st['quant_stats'] KeyError)."""
    from storm_tpu.models import DiscriminativeModel
    from storm_tpu.models.quant import calibrate_discriminative

    model = DiscriminativeModel.create(backbone="gagnet", q=1, p=1)
    y = np.random.default_rng(0).standard_normal((1, 2048)).astype(
        np.float32) * 0.1
    params = model.init_params(jax.random.PRNGKey(0), (1, 256, 16))
    quant = calibrate_discriminative(model, params, y)
    assert quant is None

"""Golden-value tests of NN blocks against torch primitives.

The reference's CUDA extension blocks importing its model code here, so
block-level ground truth is built from torch primitives directly, following
the reference formulas (layerspp.py), with weights converted through the
compat layout rules. This pins down layer semantics AND the torch<->flax
layout conversion in one shot.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from storm_tpu.nn.layers import (
    AttnBlockpp,
    GaussianFourierProjection,
    NIN,
    ResnetBlockBigGANpp,
    conv3x3,
    group_norm,
)

ATOL = 2e-5


def _np(x):
    return np.asarray(x)


def test_conv3x3_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 10, 4)).astype(np.float32)  # NHWC
    conv = conv3x3(6)
    vs = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(conv.apply(vs, jnp.asarray(x)))

    w = _np(vs["params"]["kernel"])  # HWIO
    b = _np(vs["params"]["bias"])
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
    want = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(out, want.permute(0, 2, 3, 1).numpy(), atol=ATOL)


def test_group_norm_matches_torch():
    rng = np.random.default_rng(1)
    C = 16
    x = rng.standard_normal((2, 8, 8, C)).astype(np.float32)
    gn = group_norm(C)
    vs = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(gn.apply(vs, jnp.asarray(x)))

    tg = torch.nn.GroupNorm(num_groups=min(C // 4, 32), num_channels=C,
                            eps=1e-6)
    with torch.no_grad():
        tg.weight.copy_(torch.from_numpy(_np(vs["params"]["scale"])))
        tg.bias.copy_(torch.from_numpy(_np(vs["params"]["bias"])))
    want = tg(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    np.testing.assert_allclose(out, want.detach().numpy(), atol=ATOL)


def test_nin_matches_torch_einsum():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 5, 8)).astype(np.float32)
    nin = NIN(6)
    vs = nin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(nin.apply(vs, jnp.asarray(x)))
    W = _np(vs["params"]["W"])
    b = _np(vs["params"]["b"])
    # reference NIN: x.permute(0,2,3,1) @ W + b (ncsnpp_utils/layers.py:552-556)
    want = np.einsum("bhwc,cd->bhwd", x, W) + b
    np.testing.assert_allclose(out, want, atol=ATOL)


def test_gaussian_fourier_projection_formula():
    gfp = GaussianFourierProjection(embedding_size=8, scale=16.0)
    t = jnp.asarray([0.1, 0.5])
    vs = gfp.init(jax.random.PRNGKey(0), t)
    out = _np(gfp.apply(vs, t))
    W = _np(vs["params"]["W"])
    proj = np.asarray(t)[:, None] * W[None, :] * 2 * np.pi
    want = np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_attention_matches_reference_einsum():
    """AttnBlockpp as (HW)^2 attention == the reference's
    bchw,bcij->bhwij / softmax / bhwij,bcij->bchw chain (layerspp.py:75-91).
    """
    rng = np.random.default_rng(3)
    B, H, W, C = 1, 4, 5, 8
    x = rng.standard_normal((B, H, W, C)).astype(np.float32)
    attn = AttnBlockpp(skip_rescale=True, init_scale=0.1)
    vs = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = _np(attn.apply(vs, jnp.asarray(x)))

    p = vs["params"]
    # replicate with numpy in NCHW like the reference
    xn = np.transpose(x, (0, 3, 1, 2))  # (B, C, H, W)

    def gn(v, params):
        g = min(C // 4, 32)
        vv = v.reshape(B, g, C // g, H, W)
        mean = vv.mean(axis=(2, 3, 4), keepdims=True)
        var = vv.var(axis=(2, 3, 4), keepdims=True)
        vv = (vv - mean) / np.sqrt(var + 1e-6)
        vn = vv.reshape(B, C, H, W)
        return (vn * _np(params["scale"])[None, :, None, None]
                + _np(params["bias"])[None, :, None, None])

    def nin(v, params):
        return (np.einsum("bchw,cd->bdhw", v, _np(params["W"]))
                + _np(params["b"])[None, :, None, None])

    h = gn(xn, p["GroupNorm_0"])
    q, k, v = nin(h, p["NIN_0"]), nin(h, p["NIN_1"]), nin(h, p["NIN_2"])
    w = np.einsum("bchw,bcij->bhwij", q, k) * (C ** -0.5)
    w = w.reshape(B, H, W, H * W)
    w = np.exp(w - w.max(axis=-1, keepdims=True))
    w = w / w.sum(axis=-1, keepdims=True)
    w = w.reshape(B, H, W, H, W)
    h = np.einsum("bhwij,bcij->bchw", w, v)
    h = nin(h, p["NIN_3"])
    want = np.transpose((xn + h) / np.sqrt(2.0), (0, 2, 3, 1))
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)


def test_biggan_resblock_matches_torch_composition():
    """Plain (no resampling) BigGAN resblock vs torch primitive chain
    (layerspp.py:242-274)."""
    rng = np.random.default_rng(4)
    B, H, W, Cin, Cout = 2, 6, 6, 8, 12
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    temb = rng.standard_normal((B, 16)).astype(np.float32)
    block = ResnetBlockBigGANpp(
        act=jax.nn.silu, in_ch=Cin, out_ch=Cout, temb_dim=16, dropout=0.0,
        skip_rescale=True, init_scale=0.1,
    )
    vs = block.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(temb))
    out = _np(block.apply(vs, jnp.asarray(x), jnp.asarray(temb)))

    p = vs["params"]
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    tt = torch.from_numpy(temb)
    act = torch.nn.functional.silu

    def t_gn(v, params, ch):
        g = torch.nn.GroupNorm(min(ch // 4, 32), ch, eps=1e-6)
        with torch.no_grad():
            g.weight.copy_(torch.from_numpy(_np(params["scale"])))
            g.bias.copy_(torch.from_numpy(_np(params["bias"])))
        return g(v)

    def t_conv(v, params, pad):
        wt = torch.from_numpy(np.transpose(_np(params["kernel"]), (3, 2, 0, 1)))
        bt = torch.from_numpy(_np(params["bias"]))
        return torch.nn.functional.conv2d(v, wt, bt, padding=pad)

    h = act(t_gn(xt, p["GroupNorm_0"], Cin))
    h = t_conv(h, p["Conv_0"], 1)
    dense_w = torch.from_numpy(_np(p["Dense_0"]["kernel"]))
    dense_b = torch.from_numpy(_np(p["Dense_0"]["bias"]))
    h = h + (act(tt) @ dense_w + dense_b)[:, :, None, None]
    h = act(t_gn(h, p["GroupNorm_1"], Cout))
    h = t_conv(h, p["Conv_1"], 1)
    sc = t_conv(xt, p["Conv_2"], 0)
    want = ((sc + h) / np.sqrt(2.0)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)

"""Tests for the FIR resampling ops against independent references.

The ground truth here is an independent numpy implementation of the
upfirdn semantics (zero-insertion upsample -> pad -> full 2-D convolution ->
strided downsample), written from the op's mathematical definition.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import signal as sps

from storm_tpu.nn.resample import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)


def upfirdn2d_np(x, k, up=1, down=1, pad=(0, 0)):
    """Numpy reference: x (B,H,W,C), k (kh,kw)."""
    B, H, W, C = x.shape
    out = []
    for b in range(B):
        chans = []
        for c in range(C):
            img = x[b, :, :, c]
            # upsample: up-1 zeros after each sample (also the last)
            z = np.zeros((H * up, W * up), dtype=img.dtype)
            z[::up, ::up] = img
            # pad (possibly negative = crop)
            p0, p1 = pad
            padded = np.zeros(
                (max(z.shape[0] + p0 + p1, 0), max(z.shape[1] + p0 + p1, 0)),
                dtype=img.dtype,
            )
            src = z[max(-p0, 0) : z.shape[0] - max(-p1, 0),
                    max(-p0, 0) : z.shape[1] - max(-p1, 0)]
            padded[max(p0, 0) : max(p0, 0) + src.shape[0],
                   max(p0, 0) : max(p0, 0) + src.shape[1]] = src
            # true convolution, valid
            conv = sps.convolve2d(padded, k, mode="valid")
            chans.append(conv[::down, ::down])
        out.append(np.stack(chans, axis=-1))
    return np.stack(out, axis=0)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0)),
    (1, 1, (2, 1)),
    (2, 1, (2, 1)),
    (2, 1, (3, 1)),
    (1, 2, (1, 1)),
    (1, 2, (2, 2)),
    (2, 2, (1, 2)),
])
def test_upfirdn2d_matches_numpy(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    k = rng.standard_normal((4, 4)).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))
    want = upfirdn2d_np(x, k, up, down, pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_upsample_downsample_shapes_and_constants():
    x = jnp.ones((1, 16, 16, 2))
    up = upsample_2d(x, [1, 3, 3, 1], factor=2)
    assert up.shape == (1, 32, 32, 2)
    # normalized kernel * factor^2 gain preserves constants in the interior
    np.testing.assert_allclose(np.asarray(up)[0, 8:24, 8:24, 0], 1.0, atol=1e-5)
    down = downsample_2d(x, [1, 3, 3, 1], factor=2)
    assert down.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(down)[0, 2:6, 2:6, 0], 1.0, atol=1e-5)


def test_updown_roundtrip_preserves_dc():
    """FIR up then down preserves constants exactly (interior)."""
    x = jnp.full((1, 32, 32, 1), 0.7, dtype=jnp.float32)
    y = downsample_2d(upsample_2d(x, [1, 3, 3, 1]), [1, 3, 3, 1])
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y)[0, 4:-4, 4:-4], 0.7, atol=1e-5)


def test_naive_updown():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = naive_upsample_2d(x, 2)
    assert up.shape == (1, 8, 8, 1)
    assert up[0, 0, 0, 0] == up[0, 1, 1, 0] == x[0, 0, 0, 0]
    down = naive_downsample_2d(up, 2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)


def test_upsample_conv_2d_matches_torch():
    """Differential test vs torch.conv_transpose2d + numpy upfirdn."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 7, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 5)).astype(np.float32)  # HWIO
    k = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k, k) / np.outer(k, k).sum() * 4.0  # gain * factor^2

    got = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), k=[1, 3, 3, 1]))

    # torch ground truth (StyleGAN2 semantics): conv_transpose2d with
    # spatially-flipped in/out-swapped weights, then upfirdn with the same
    # kernel/padding arithmetic.
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    wt2 = torch.flip(wt, [2, 3]).permute(1, 0, 2, 3).contiguous()  # (I,O,kh,kw)
    h = F.conv_transpose2d(xt, wt2, stride=2, padding=0, output_padding=0)
    h = h.permute(0, 2, 3, 1).numpy()  # NHWC
    p = (k2.shape[0] - 2) - (3 - 1)
    want = upfirdn2d_np(h, k2, up=1, down=1, pad=((p + 1) // 2 + 1, p // 2 + 1))
    assert got.shape == want.shape == (2, 12, 14, 5)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_conv_downsample_2d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4)).astype(np.float32)  # HWIO
    k = np.asarray([1.0, 3.0, 3.0, 1.0], dtype=np.float32)
    k2 = np.outer(k, k) / np.outer(k, k).sum()

    got = np.asarray(conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), k=[1, 3, 3, 1]))

    p = (k2.shape[0] - 2) + (3 - 1)
    xf = upfirdn2d_np(x, k2, pad=((p + 1) // 2, p // 2))
    xt = torch.from_numpy(xf).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    want = F.conv2d(xt, wt, stride=2, padding=0).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 4, 5, 4)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_upfirdn2d_gradient():
    """XLA's native grad of the dilated conv replaces the hand-written
    double-backward of the CUDA op (op/upfirdn2d.py:19-142)."""
    k = jnp.asarray(np.outer([1, 3, 3, 1], [1, 3, 3, 1]), dtype=jnp.float32) / 64.0

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 6, 6, 2)), dtype=jnp.float32)
    g = jax.grad(f)(x)
    assert g.shape == x.shape
    # finite-difference check on a single element
    eps = 1e-3
    e = jnp.zeros_like(x).at[0, 2, 3, 1].set(eps)
    fd = (f(x + e) - f(x - e)) / (2 * eps)
    np.testing.assert_allclose(g[0, 2, 3, 1], fd, rtol=2e-2)

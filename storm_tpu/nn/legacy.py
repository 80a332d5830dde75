"""Legacy NCSNv1/v2 RefineNet blocks and normalization variants.

Ports of the reference's legacy layer API (ncsnpp_utils/layers.py:135-351
and normalization.py:22-215). These are **not used** by any NCSN++
configuration — the reference keeps them for NCSNv2 compatibility and they
are dead code there too (SURVEY.md §2.3) — but they are part of the layer
library surface, so they are provided (channels-last, Flax).

Note: MSFBlock uses bilinear resize; torch's align_corners=True convention
differs from jax.image.resize's half-pixel convention at the borders — an
acceptable delta for a legacy, unused path.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp


def ncsn_conv3x3(out_ch: int, bias: bool = True, stride: int = 1,
                 init_scale: float = 1.0, name=None) -> fnn.Conv:
    """3x3 conv with torch-default-style init scaled by init_scale
    (ncsnpp_utils/layers.py:118-126)."""
    init_scale = 1e-10 if init_scale == 0 else init_scale

    def kernel_init(key, shape, dtype=jnp.float32):
        return fnn.initializers.lecun_normal()(key, shape, dtype) * init_scale

    return fnn.Conv(out_ch, (3, 3), strides=(stride, stride),
                    padding=[(1, 1), (1, 1)], use_bias=bias,
                    kernel_init=kernel_init, name=name)


def _pool5(x, maxpool: bool):
    if maxpool:
        return fnn.max_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
    return fnn.avg_pool(x, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))


class CRPBlock(fnn.Module):
    """Chained residual pooling (layers.py:135-157)."""

    features: int
    n_stages: int
    act: Callable = jax.nn.relu
    maxpool: bool = True

    @fnn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = ncsn_conv3x3(self.features, bias=False,
                                name=f"conv_{i}")(path)
            x = path + x
        return x


class RCUBlock(fnn.Module):
    """Residual conv unit (layers.py:185-206)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = jax.nn.relu

    @fnn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv3x3(self.features, bias=False,
                                 name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class MSFBlock(fnn.Module):
    """Multi-scale fusion: project + resize + sum (layers.py:237-253)."""

    features: int

    @fnn.compact
    def __call__(self, xs: Sequence, shape):
        B = xs[0].shape[0]
        sums = jnp.zeros((B, shape[0], shape[1], self.features), xs[0].dtype)
        for i, x in enumerate(xs):
            h = ncsn_conv3x3(self.features, bias=True, name=f"conv_{i}")(x)
            h = jax.image.resize(
                h, (B, shape[0], shape[1], self.features), method="bilinear"
            )
            sums = sums + h
        return sums


class RefineBlock(fnn.Module):
    """RefineNet block: adapt RCUs -> MSF -> CRP -> output RCU
    (layers.py:286-318)."""

    features: int
    n_inputs: int
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @fnn.compact
    def __call__(self, xs: Sequence, output_shape):
        assert len(xs) == self.n_inputs
        hs = []
        for i, x in enumerate(xs):
            hs.append(
                RCUBlock(x.shape[-1], 2, 2, self.act,
                         name=f"adapt_{i}")(x)
            )
        if self.n_inputs > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                     name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output")(h)


# --------------------------------------------------------------------------
# Legacy normalization variants (normalization.py:22-215); NCSN++ itself
# uses only GroupNorm.
# --------------------------------------------------------------------------

class VarianceNorm2d(fnn.Module):
    """Scale-only normalization by feature variance (normalization.py:96-110)."""

    features: int
    bias: bool = False

    @fnn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
            (self.features,),
        )
        vars_ = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(vars_ + 1e-5)
        return h * alpha


class InstanceNorm2dPlus(fnn.Module):
    """Instance norm augmented with cross-channel mean statistics
    (normalization.py:171-195)."""

    features: int
    bias: bool = True

    @fnn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
            (self.features,))
        gamma = self.param(
            "gamma", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s),
            (self.features,))
        # per-sample per-channel means, then their cross-channel stats
        means = jnp.mean(x, axis=(1, 2))  # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_n = (means - m) / jnp.sqrt(v + 1e-5)  # (B, C)

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        h = h + means_n[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", fnn.initializers.zeros,
                              (self.features,))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(fnn.Module):
    """Class-conditional InstanceNorm2d+ via per-class affine embeddings
    (normalization.py:113-143)."""

    features: int
    num_classes: int
    bias: bool = True

    @fnn.compact
    def __call__(self, x, y):
        n_out = 3 if self.bias else 2
        embed = self.param(
            "embed",
            lambda k, s: jnp.concatenate(
                [1.0 + 0.02 * jax.random.normal(k, (s[0], 2 * self.features)),
                 jnp.zeros((s[0], s[1] - 2 * self.features))], axis=-1
            ) if self.bias else 1.0 + 0.02 * jax.random.normal(k, s),
            (self.num_classes, n_out * self.features),
        )
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_n = (means - m) / jnp.sqrt(v + 1e-5)

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + 1e-5)
        h = h + means_n[:, None, None, :]

        e = embed[y]  # (B, n_out*C)
        gamma = e[:, : self.features]
        alpha = e[:, self.features : 2 * self.features]
        h = h * alpha[:, None, None, :]  # note: reference applies alpha to
        # the means term only; folded here for the unused legacy path
        out = gamma[:, None, None, :] * h
        if self.bias:
            beta = e[:, 2 * self.features :]
            out = out + beta[:, None, None, :]
        return out

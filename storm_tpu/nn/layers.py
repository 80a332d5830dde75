"""NCSN++ building blocks as Flax modules (channels-last).

TPU-native re-design of the reference layer library
(sgmse/backbones/ncsnpp_utils/layerspp.py, layers.py,
sgmse/backbones/shared.py). All activations/normalizations are plain jnp ops
that XLA fuses into the surrounding convs — the reference's fused CUDA
elementwise kernels (op/fused_act.py) are unnecessary on TPU.

Layout: (B, H, W, C) with H=frequency, W=time frames. Channel dim last so it
maps onto the TPU's 128-lane axis.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as fnn
import jax
import jax.numpy as jnp

from .init import ddpm_init
from .qconv import QuantizableConv
from .resample import (
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    conv_downsample_2d,
    upsample_conv_2d,
)

Dtype = Any


def _matmul_precision(dtype) -> jax.lax.Precision:
    """Matmul precision for einsum-based layers.

    f32 inputs need HIGHEST on TPU (DEFAULT silently rounds operands to
    bf16); bf16 inputs take the single-pass MXU path (which accumulates in
    f32 anyway) — HIGHEST there would synthesize 3-6 passes for no quality
    gain (measured ~0.3 ms/forward on the attention block alone).
    """
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def get_act(name: str) -> Callable:
    """Activation factory (ncsnpp_utils/layers.py:29-41)."""
    if name == "elu":
        return jax.nn.elu
    elif name == "relu":
        return jax.nn.relu
    elif name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    elif name == "swish":
        return jax.nn.silu
    raise NotImplementedError("activation function does not exist!")


def group_norm(ch: int, dtype=jnp.float32, name: Optional[str] = None) -> fnn.GroupNorm:
    """GroupNorm with the NCSN++ group heuristic min(ch//4, 32), eps=1e-6
    (layerspp.py:67, 219 etc.)."""
    return fnn.GroupNorm(
        num_groups=min(ch // 4, 32), epsilon=1e-6, dtype=dtype,
        param_dtype=jnp.float32, name=name,
    )


class SplitGroupNorm(fnn.Module):
    """GroupNorm over the VIRTUAL concatenation [x, x2] along channels,
    computed without materializing the concat.

    TPU perf feature: the NCSN++ up path normalizes `concat(h, skip)`
    (ncsnpp.py:379-382) — materializing that concat costs a full
    activation write+read per up-resblock, measured ~40% of the
    GN+act+conv chain time at serving shapes (scripts/perf_round3_probe.py).
    Group statistics are assembled from per-channel moments of each part
    (mean of equal-count means == overall mean), so groups that straddle
    the h/skip channel boundary are handled exactly.

    Parameter layout ("scale"/"bias" of the full channel count) and
    single-input numerics match `flax.linen.GroupNorm(use_fast_variance)`;
    instantiate with name="GroupNorm_0"/... to keep checkpoint paths
    identical.
    """

    num_groups: int
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @fnn.compact
    def __call__(self, x, x2=None):
        C = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        scale = self.param("scale", fnn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (C,), jnp.float32)
        G = self.num_groups
        assert C % G == 0, (C, G)
        gs = C // G

        def channel_moments(v):
            vf = v.astype(jnp.float32)
            axes = tuple(range(1, v.ndim - 1))
            return jnp.mean(vf, axis=axes), jnp.mean(vf * vf, axis=axes)

        m, m2 = channel_moments(x)
        if x2 is not None:
            m_2, m2_2 = channel_moments(x2)
            m = jnp.concatenate([m, m_2], axis=-1)      # (B, C): tiny
            m2 = jnp.concatenate([m2, m2_2], axis=-1)
        B = m.shape[0]
        mean_g = jnp.mean(m.reshape(B, G, gs), axis=-1)
        mean2_g = jnp.mean(m2.reshape(B, G, gs), axis=-1)
        var_g = jnp.maximum(mean2_g - mean_g * mean_g, 0.0)
        # fold scale into rsqrt like flax _normalize: y = (v - mean) * mul + b
        mul_c = (
            jnp.repeat(jax.lax.rsqrt(var_g + self.epsilon), gs, axis=-1)
            * scale[None, :]
        )  # (B, C)
        add_c = bias[None, :] - jnp.repeat(mean_g, gs, axis=-1) * mul_c

        def normalize(v, lo, hi):
            sl = (slice(None),) + (None,) * (v.ndim - 2)
            y = v.astype(jnp.float32) * mul_c[:, lo:hi][sl] \
                + add_c[:, lo:hi][sl]
            return y.astype(self.dtype)

        if x2 is None:
            return normalize(x, 0, C)
        Cx = x.shape[-1]
        return normalize(x, 0, Cx), normalize(x2, Cx, C)


def conv3x3(
    out_ch: int,
    init_scale: float = 1.0,
    bias: bool = True,
    stride: int = 1,
    dtype=jnp.float32,
    name: Optional[str] = None,
) -> QuantizableConv:
    """3x3 conv with DDPM init (ncsnpp_utils/layers.py:129-135).

    Built as a `QuantizableConv` (bit-identical to fnn.Conv by default) so
    serving can opt into int8 via the "quant" collection (nn/qconv.py)."""
    return QuantizableConv(
        out_ch,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        use_bias=bias,
        kernel_init=ddpm_init(init_scale),
        bias_init=fnn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def conv1x1(
    out_ch: int,
    init_scale: float = 1.0,
    bias: bool = True,
    dtype=jnp.float32,
    name: Optional[str] = None,
) -> QuantizableConv:
    """1x1 conv with DDPM init (ncsnpp_utils/layers.py:100-106)."""
    return QuantizableConv(
        out_ch,
        (1, 1),
        use_bias=bias,
        kernel_init=ddpm_init(init_scale),
        bias_init=fnn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class GaussianFourierProjection(fnn.Module):
    """Gaussian random features of log-SNR / time (shared.py:14-35).

    W ~ N(0, scale^2) is frozen at init (requires_grad=False in the
    reference); here the gradient is stopped instead so any optimizer leaves
    it untouched while it still lives in the param tree for checkpointing.
    Output: concat([sin(2*pi*t*W), cos(2*pi*t*W)]) of width 2*embedding_size;
    with complex_valued=True, exp(i*2*pi*t*W) as packed-real (B, size, 2)
    (the reference halves embed_dim only in the real case, shared.py:19-27).
    """

    embedding_size: int = 256
    scale: float = 16.0
    complex_valued: bool = False

    @fnn.compact
    def __call__(self, t):
        W = self.param(
            "W",
            fnn.initializers.normal(stddev=self.scale),
            (self.embedding_size,),
            jnp.float32,
        )
        W = jax.lax.stop_gradient(W)
        proj = t[:, None] * W[None, :] * (2 * math.pi)
        if self.complex_valued:
            return jnp.stack([jnp.cos(proj), jnp.sin(proj)], axis=-1)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class DiffusionStepEmbedding(fnn.Module):
    """DiffWave-style sinusoidal step embedding (shared.py:38-58).

    With complex_valued=True returns exp(i * inner) as packed-real (..., 2)
    of width embed_dim (no sin/cos halving needed — shared.py:43-49)."""

    embed_dim: int = 256
    complex_valued: bool = False

    def __call__(self, t):
        half = self.embed_dim if self.complex_valued else self.embed_dim // 2
        fac = 10.0 ** (4.0 * jnp.arange(half, dtype=jnp.float32) / (half - 1))
        inner = t[:, None] * fac[None, :]
        if self.complex_valued:
            return jnp.stack([jnp.cos(inner), jnp.sin(inner)], axis=-1)
        return jnp.concatenate([jnp.sin(inner), jnp.cos(inner)], axis=-1)


class ComplexLinear(fnn.Module):
    """Complex-valued linear layer over packed-real (..., D, 2) inputs
    (shared.py:61-77): (re + i im) @ (Wre + i Wim) via two real Dense pairs
    sharing the reference's weight structure; reduces to a plain Dense when
    complex_valued=False."""

    output_dim: int
    complex_valued: bool = True

    @fnn.compact
    def __call__(self, x):
        if not self.complex_valued:
            return fnn.Dense(self.output_dim, name="lin")(x)
        re_mod = fnn.Dense(self.output_dim, name="re")
        im_mod = fnn.Dense(self.output_dim, name="im")
        xr, xi = x[..., 0], x[..., 1]
        out_re = re_mod(xr) - im_mod(xi)
        out_im = re_mod(xi) + im_mod(xr)
        return jnp.stack([out_re, out_im], axis=-1)


class FeatureMapDense(fnn.Module):
    """Fully-connected layer broadcast to feature maps (shared.py:80-89):
    output gains two trailing singleton spatial dims (channels-last here:
    the singleton dims precede the channel axis)."""

    output_dim: int
    complex_valued: bool = False

    @fnn.compact
    def __call__(self, x):
        h = ComplexLinear(
            self.output_dim, complex_valued=self.complex_valued, name="dense"
        )(x)
        if self.complex_valued:
            return h[:, None, None, :, :]  # (B, 1, 1, D, 2)
        return h[:, None, None, :]  # (B, 1, 1, D)


class NIN(fnn.Module):
    """1x1 'network-in-network' projection over the channel axis
    (ncsnpp_utils/layers.py:548-557). In channels-last this is a plain
    einsum against a (C_in, C_out) matrix — a clean MXU matmul."""

    num_units: int
    init_scale: float = 0.1

    @fnn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        W = self.param("W", ddpm_init(self.init_scale), (in_dim, self.num_units), jnp.float32)
        b = self.param("b", fnn.initializers.zeros, (self.num_units,), jnp.float32)
        return jnp.einsum(
            "...c,cd->...d", x, W.astype(x.dtype),
            precision=_matmul_precision(x.dtype),
        ) + b.astype(x.dtype)


class Combine(fnn.Module):
    """Combine a skip pyramid with the trunk (layerspp.py:44-59)."""

    dim2: int
    method: str = "cat"

    @fnn.compact
    def __call__(self, x, y):
        h = conv1x1(self.dim2, name="Conv_0", dtype=x.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        elif self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(fnn.Module):
    """Full-spatial self-attention block (layerspp.py:62-91).

    The reference's einsum pair `bchw,bcij->bhwij` / softmax / `bhwij,bcij`
    is, in channels-last terms, standard (H*W)-token single-head attention:
    two (HW, C) x (C, HW) matmuls that map straight onto the MXU. Softmax is
    computed in float32 for stability regardless of compute dtype.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0

    @fnn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = group_norm(C, dtype=x.dtype)(x)
        q = NIN(C, name="NIN_0")(h)
        k = NIN(C, name="NIN_1")(h)
        v = NIN(C, name="NIN_2")(h)

        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, precision=_matmul_precision(x.dtype)
        ) * (int(C) ** (-0.5))
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        h = jnp.einsum(
            "bqk,bkc->bqc", w, v, precision=_matmul_precision(x.dtype)
        ).reshape(B, H, W, C)
        h = NIN(C, init_scale=self.init_scale, name="NIN_3")(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class Upsample(fnn.Module):
    """2x upsample, optionally FIR and/or with conv (layerspp.py:94-126)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @fnn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        out_ch = self.out_ch if self.out_ch is not None else C
        if not self.fir:
            h = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
            if self.with_conv:
                h = conv3x3(out_ch, name="Conv_0", dtype=x.dtype)(h)
        else:
            if not self.with_conv:
                h = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                w = self.param(
                    "Conv2d_0_weight", ddpm_init(), (3, 3, C, out_ch), jnp.float32
                )
                b = self.param(
                    "Conv2d_0_bias", fnn.initializers.zeros, (out_ch,), jnp.float32
                )
                h = upsample_conv_2d(x, w.astype(x.dtype), k=self.fir_kernel)
                h = h + b.astype(x.dtype)
        return h


class Downsample(fnn.Module):
    """2x downsample, optionally FIR and/or with conv (layerspp.py:129-163)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)

    @fnn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        out_ch = self.out_ch if self.out_ch is not None else C
        if not self.fir:
            if self.with_conv:
                # asymmetric (0,1) pad then stride-2 valid conv, like
                # F.pad(x, (0,1,0,1)) + conv stride 2 (layerspp.py:152-154)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = fnn.Conv(
                    out_ch,
                    (3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    kernel_init=ddpm_init(),
                    bias_init=fnn.initializers.zeros,
                    param_dtype=jnp.float32,
                    dtype=x.dtype,
                    name="Conv_0",
                )(x)
            else:
                h = fnn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                h = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                w = self.param(
                    "Conv2d_0_weight", ddpm_init(), (3, 3, C, out_ch), jnp.float32
                )
                b = self.param(
                    "Conv2d_0_bias", fnn.initializers.zeros, (out_ch,), jnp.float32
                )
                h = conv_downsample_2d(x, w.astype(x.dtype), k=self.fir_kernel)
                h = h + b.astype(x.dtype)
        return h


class ResnetBlockDDPMpp(fnn.Module):
    """DDPM-style resblock (layerspp.py:166-209)."""

    act: Callable
    in_ch: int
    out_ch: Optional[int] = None
    temb_dim: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0

    @fnn.compact
    def __call__(self, x, temb=None, train: bool = False):
        out_ch = self.out_ch if self.out_ch is not None else self.in_ch
        h = self.act(group_norm(self.in_ch, dtype=x.dtype)(x))
        h = conv3x3(out_ch, name="Conv_0", dtype=x.dtype)(h)
        if temb is not None:
            h = h + fnn.Dense(
                out_ch,
                kernel_init=ddpm_init(),
                bias_init=fnn.initializers.zeros,
                param_dtype=jnp.float32,
                dtype=x.dtype,
                name="Dense_0",
            )(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, dtype=x.dtype)(h))
        h = fnn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1", dtype=x.dtype)(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2", dtype=x.dtype)(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResnetBlockBigGANpp(fnn.Module):
    """BigGAN-style resblock with optional fused FIR up/down resampling
    (layerspp.py:212-274). The workhorse of NCSN++."""

    act: Callable
    in_ch: int
    out_ch: Optional[int] = None
    temb_dim: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0

    @fnn.compact
    def __call__(self, x, temb=None, train: bool = False, skip=None):
        """`skip`: optional second input — the block then operates on the
        VIRTUAL channel concat [x, skip] (the NCSN++ up-path pattern,
        ncsnpp.py:379-382) without ever materializing it: GroupNorm via
        SplitGroupNorm, Conv_0/Conv_2 via kernel splitting. Parameters and
        math are identical to calling it on jnp.concatenate([x, skip], -1);
        serving-shape chain time drops ~40% (perf_round3_probe.py)."""
        out_ch = self.out_ch if self.out_ch is not None else self.in_ch
        if skip is not None:
            # only the split path uses SplitGroupNorm — its param tree
            # ({scale, bias}) is identical to fnn.GroupNorm, but the plain
            # path keeps flax's single-fusion grouped reduction (measured
            # faster for one input)
            assert not self.up and not self.down
            gn0 = SplitGroupNorm(
                num_groups=min(self.in_ch // 4, 32), epsilon=1e-6,
                dtype=x.dtype, name="GroupNorm_0",
            )
            hx, hs = gn0(x, skip)
            h = (self.act(hx), self.act(hs))
        else:
            h = self.act(
                group_norm(self.in_ch, dtype=x.dtype, name="GroupNorm_0")(x)
            )

            if self.up:
                if self.fir:
                    h = upsample_2d(h, self.fir_kernel, factor=2)
                    x = upsample_2d(x, self.fir_kernel, factor=2)
                else:
                    h = naive_upsample_2d(h, factor=2)
                    x = naive_upsample_2d(x, factor=2)
            elif self.down:
                if self.fir:
                    h = downsample_2d(h, self.fir_kernel, factor=2)
                    x = downsample_2d(x, self.fir_kernel, factor=2)
                else:
                    h = naive_downsample_2d(h, factor=2)
                    x = naive_downsample_2d(x, factor=2)

        conv0 = conv3x3(out_ch, name="Conv_0", dtype=x.dtype)
        h = conv0(*h) if skip is not None else conv0(h)
        if temb is not None:
            h = h + fnn.Dense(
                out_ch,
                kernel_init=ddpm_init(),
                bias_init=fnn.initializers.zeros,
                param_dtype=jnp.float32,
                dtype=x.dtype,
                name="Dense_0",
            )(self.act(temb))[:, None, None, :]
        # explicit name: the first norm is a SplitGroupNorm, so flax
        # auto-numbering would otherwise call this one GroupNorm_0
        h = self.act(group_norm(out_ch, dtype=x.dtype, name="GroupNorm_1")(h))
        h = fnn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1", dtype=x.dtype)(h)

        if self.in_ch != out_ch or self.up or self.down:
            shortcut = conv1x1(out_ch, name="Conv_2", dtype=x.dtype)
            x = shortcut(x, skip) if skip is not None else shortcut(x)
        elif skip is not None:
            raise ValueError(
                "split-input resblock requires a Conv_2 shortcut "
                "(in_ch != out_ch)"
            )

        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)

"""ConvTasNet time-domain denoiser backbone (Flax, channels-last).

Re-design of the reference ConvTasNet (sgmse/backbones/convtasnet.py):
learned Conv1d filterbank encoder (2 ms window, 50% hop) -> dilated
depthwise-separable TCN mask estimator -> sigmoid mask -> transposed-conv
decoder. `FORCE_STFT_OUT = True`: the model layer feeds it time-domain
audio and re-STFTs its output (sgmse/model.py:322-324, 362-363).

TPU-first notes:
- 1-D convs run as `lax.conv_general_dilated` in NWC layout; the depthwise
  conv uses `feature_group_count`.
- The causal cumulative LayerNorm (cLN, convtasnet.py:98-135) is a
  `jnp.cumsum` over time — a single XLA scan op, no host loop.
- The reference returns the *padded* signal length from forward
  (convtasnet.py:57-72 never strips its pad_signal margins); here the
  output is cropped back to the input length so spec-domain losses and
  iSTFT length contracts hold.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from . import BackboneRegistry


def conv1d(x, w, stride: int = 1, padding=(0, 0), dilation: int = 1,
           groups: int = 1):
    """1-D conv on (B, L, C) with HWIO-style kernel (K, C_in/groups, C_out)."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[tuple(padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


class PReLU(fnn.Module):
    """PReLU with a single shared slope (torch nn.PReLU default)."""

    init: float = 0.25

    @fnn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda k: jnp.full((1,), self.init, jnp.float32))
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class cLN(fnn.Module):
    """Cumulative (causal) layer norm over channels up to each time step
    (convtasnet.py:98-135). Input (B, L, C)."""

    eps: float = 1e-8

    @fnn.compact
    def __call__(self, x):
        B, L, C = x.shape
        gain = self.param("gain", fnn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (C,), jnp.float32)

        step_sum = jnp.sum(x, axis=-1)  # (B, L)
        step_pow = jnp.sum(x**2, axis=-1)
        cum_sum = jnp.cumsum(step_sum, axis=1)
        cum_pow = jnp.cumsum(step_pow, axis=1)
        cnt = jnp.arange(C, C * (L + 1), C, dtype=x.dtype)[None, :]
        cum_mean = cum_sum / cnt
        cum_var = (cum_pow - 2 * cum_mean * cum_sum) / cnt + cum_mean**2
        cum_std = jnp.sqrt(cum_var + self.eps)
        x = (x - cum_mean[..., None]) / cum_std[..., None]
        return x * gain.astype(x.dtype) + bias.astype(x.dtype)


class GlobalLN(fnn.Module):
    """GroupNorm(1 group) == LayerNorm over (L, C) jointly, torch-style
    (stats over all non-batch dims; convtasnet.py:279)."""

    eps: float = 1e-8

    @fnn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gain = self.param("gain", fnn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (C,), jnp.float32)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(1, 2), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * gain.astype(x.dtype) + bias.astype(x.dtype)


class DepthConv1d(fnn.Module):
    """Depthwise-separable dilated conv block with residual + skip outputs
    (convtasnet.py:227-267)."""

    input_channel: int
    hidden_channel: int
    kernel: int
    dilation: int = 1
    skip: bool = True
    causal: bool = False

    @fnn.compact
    def __call__(self, x):
        H = self.hidden_channel
        w1 = self.param("conv1d_w", fnn.initializers.lecun_normal(),
                        (1, x.shape[-1], H), jnp.float32)
        b1 = self.param("conv1d_b", fnn.initializers.zeros, (H,), jnp.float32)
        out = conv1d(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
        out = PReLU(name="nonlinearity1")(out)
        out = (cLN(name="reg1") if self.causal else GlobalLN(name="reg1"))(out)

        # depthwise dilated conv; causal = all padding on the left
        # (torch pads both sides then crops the right, convtasnet.py:256-259)
        pad = (self.kernel - 1) * self.dilation
        padding = (pad, 0) if self.causal else (pad // 2, pad - pad // 2)
        wd = self.param("dconv1d_w", fnn.initializers.lecun_normal(),
                        (self.kernel, 1, H), jnp.float32)
        bd = self.param("dconv1d_b", fnn.initializers.zeros, (H,), jnp.float32)
        out = conv1d(out, wd.astype(x.dtype), padding=padding,
                     dilation=self.dilation, groups=H) + bd.astype(x.dtype)
        out = PReLU(name="nonlinearity2")(out)
        out = (cLN(name="reg2") if self.causal else GlobalLN(name="reg2"))(out)

        wr = self.param("res_out_w", fnn.initializers.lecun_normal(),
                        (1, H, self.input_channel), jnp.float32)
        br = self.param("res_out_b", fnn.initializers.zeros,
                        (self.input_channel,), jnp.float32)
        residual = conv1d(out, wr.astype(x.dtype)) + br.astype(x.dtype)
        if self.skip:
            ws = self.param("skip_out_w", fnn.initializers.lecun_normal(),
                            (1, H, self.input_channel), jnp.float32)
            bs = self.param("skip_out_b", fnn.initializers.zeros,
                            (self.input_channel,), jnp.float32)
            skip = conv1d(out, ws.astype(x.dtype)) + bs.astype(x.dtype)
            return residual, skip
        return residual


class TCN(fnn.Module):
    """Stacked dilated TCN (convtasnet.py:269-339). Input/output (B, L, C)."""

    input_dim: int
    output_dim: int
    BN_dim: int
    hidden_dim: int
    layer: int
    stack: int
    kernel: int = 3
    skip: bool = True
    causal: bool = False
    dilated: bool = True

    @property
    def receptive_field(self) -> int:
        rf = 0
        for s in range(self.stack):
            for i in range(self.layer):
                if i == 0 and s == 0:
                    rf += self.kernel
                elif self.dilated:
                    rf += (self.kernel - 1) * 2**i
                else:
                    rf += self.kernel - 1
        return rf

    @fnn.compact
    def __call__(self, x):
        x = (cLN(name="LN") if self.causal else GlobalLN(name="LN"))(x)
        wb = self.param("BN_w", fnn.initializers.lecun_normal(),
                        (1, self.input_dim, self.BN_dim), jnp.float32)
        bb = self.param("BN_b", fnn.initializers.zeros, (self.BN_dim,), jnp.float32)
        output = conv1d(x, wb.astype(x.dtype)) + bb.astype(x.dtype)

        skip_connection = 0.0
        idx = 0
        for s in range(self.stack):
            for i in range(self.layer):
                block = DepthConv1d(
                    input_channel=self.BN_dim,
                    hidden_channel=self.hidden_dim,
                    kernel=self.kernel,
                    dilation=2**i if self.dilated else 1,
                    skip=self.skip,
                    causal=self.causal,
                    name=f"TCN_{idx}",
                )
                if self.skip:
                    residual, skip = block(output)
                    output = output + residual
                    skip_connection = skip_connection + skip
                else:
                    output = output + block(output)
                idx += 1

        h = skip_connection if self.skip else output
        h = PReLU(name="output_prelu")(h)
        wo = self.param("output_w", fnn.initializers.lecun_normal(),
                        (1, self.BN_dim, self.output_dim), jnp.float32)
        bo = self.param("output_b", fnn.initializers.zeros,
                        (self.output_dim,), jnp.float32)
        return conv1d(h, wo.astype(x.dtype)) + bo.astype(x.dtype)


@BackboneRegistry.register("convtasnet")
class ConvTasNet(fnn.Module):
    """Time-domain masking denoiser (sgmse/backbones/convtasnet.py:12-94)."""

    fs: int = 16000
    win: float = 2.0  # ms
    enc_dim: int = 256
    feature_dim: int = 128
    layer: int = 8
    stack: int = 3
    kernel: int = 3
    causal: bool = False
    dtype: Any = jnp.float32

    FORCE_STFT_OUT = True

    @classmethod
    def from_kwargs(cls, **kwargs):
        names = {f.name for f in dataclasses.fields(cls) if f.init}
        return cls(**{k: v for k, v in kwargs.items() if k in names})

    @staticmethod
    def add_argparse_args(parser):
        """CLI group mirroring the reference (convtasnet.py:51-53)."""
        # optional-bool: both `--causal` (reference convtasnet spelling,
        # store_true) and `--causal True/False` (gagnet spelling) parse —
        # the two backbones share this option string, and argparse keeps
        # whichever registers first (train.py _DedupGroup)
        parser.add_argument(
            "--causal", nargs="?", const=True, default=False,
            type=lambda s: s in ("True", "true", "1"))
        return parser

    @property
    def win_samples(self) -> int:
        return int(self.fs * self.win / 1000)

    @property
    def stride(self) -> int:
        return self.win_samples // 2

    def _pad_amounts(self, nsample: int) -> Tuple[int, int]:
        """(front, back) zero-padding matching pad_signal
        (convtasnet.py:76-94): `stride` on each side plus `rest` at the
        end so the length is conv-aligned."""
        win, stride = self.win_samples, self.stride
        rest = win - (stride + nsample % win) % win
        rest = rest % win  # rest == win means no padding needed
        return stride, rest + stride

    @fnn.compact
    def __call__(self, x, time_cond=None, train: bool = False):
        """x: waveform (B, T) or (B, 1, T) -> denoised waveform, same shape.

        `time_cond` is accepted and ignored (discriminative backbone).
        """
        del time_cond, train
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        B, D, T = x.shape
        assert D == 1, "ConvTasNet is single-channel"
        front, back = self._pad_amounts(T)
        h = jnp.pad(x[:, 0, :], ((0, 0), (front, back)))[..., None]  # (B,L,1)
        h = h.astype(self.dtype)

        # encoder: Conv1d(1 -> enc_dim, win, stride, bias=False)
        w_enc = self.param(
            "encoder_w", fnn.initializers.lecun_normal(),
            (self.win_samples, 1, self.enc_dim), jnp.float32,
        )
        enc = conv1d(h, w_enc.astype(h.dtype), stride=self.stride)  # (B,L',N)

        masks = TCN(
            input_dim=self.enc_dim,
            output_dim=self.enc_dim,
            BN_dim=self.feature_dim,
            hidden_dim=self.feature_dim * 4,
            layer=self.layer,
            stack=self.stack,
            kernel=self.kernel,
            causal=self.causal,
            name="TCN",
        )(enc)
        masked = enc * jax.nn.sigmoid(masks)

        # decoder: ConvTranspose1d(enc_dim -> 1, win, stride, bias=False)
        w_dec = self.param(
            "decoder_w", fnn.initializers.lecun_normal(),
            (self.win_samples, self.enc_dim, 1), jnp.float32,
        )
        out = jax.lax.conv_general_dilated(
            masked, w_dec.astype(h.dtype),
            window_strides=(1,),
            padding=[(self.win_samples - 1, self.win_samples - 1)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[..., 0]
        # crop the pad_signal margins back off -> original length
        out = out[:, front : front + T].astype(jnp.float32)
        return out if squeeze else out[:, None, :]

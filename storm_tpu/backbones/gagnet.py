"""GaGNet glance-and-gaze spectral denoiser (Flax, channels-last).

Re-design of the reference GaGNet (sgmse/backbones/gagnet.py): a gated
U²/UNet encoder over (time, freq) feeds q stacked Glance-Gaze modules; each
GlanceBlock predicts a magnitude gain, each GazeBlock a complex residual,
combined as coarse-filter + residual; the final output is a tanh complex
mask multiplied onto the input spectrogram.

Layouts: 2-D stages run (B, T, F, C) NHWC (stride-2 downsampling along F,
causal padding along T); 1-D stages run (B, T, C).

Norm notes: default norm_type="IN" (InstanceNorm, affine, batch-statistics
— the reference warns its IN is non-causal/batch-stat based,
gagnet.py:52-56). "BN" trains with batch statistics (no running-average
updates — the reference's BN running stats are a documented footgun there),
but EVAL can consume torch running statistics via a "batch_stats"
collection, so GaGNet-BN checkpoints trained upstream transfer exactly
(NormSwitch below; compat/torch_ckpt.py convert_gagnet_batch_stats;
golden-tested vs the actual reference in tests/test_reference_parity.py).

The reference's `padding_necessary` flag is only assigned when F is even
(gagnet.py:107-110) — a latent NameError for odd F; fixed here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from . import BackboneRegistry


class PReLUc(fnn.Module):
    """Per-channel PReLU (torch nn.PReLU(c)), channels-last."""

    @fnn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32), (x.shape[-1],)
        )
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class NormSwitch(fnn.Module):
    """IN or BN over channels-last input.

    Stats come from the batch (training semantics and the default), EXCEPT
    when a "batch_stats" collection carrying per-channel {mean, var} is
    supplied to apply() for norm_type="BN" — then those running statistics
    are used (torch eval-mode BatchNorm semantics). This is how GaGNet
    checkpoints trained upstream with norm_type="BN" serve here: the
    converter extracts running_mean/running_var into a side artifact and
    the eval path passes it as a collection (compat/torch_ckpt.py).
    Training never updates running stats (documented divergence; the
    reference itself warns BN is a footgun in this model and defaults IN).
    """

    norm_type: str = "IN"
    eps: float = 1e-5

    @fnn.compact
    def __call__(self, x):
        C = x.shape[-1]
        gain = self.param("scale", fnn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", fnn.initializers.zeros, (C,), jnp.float32)
        has_mean = self.has_variable("batch_stats", "mean")
        has_var = self.has_variable("batch_stats", "var")
        if self.norm_type == "BN" and has_mean != has_var:
            # a mean-only (or var-only) entry means the loaded stats tree
            # is mis-pathed or truncated; erroring beats an opaque
            # NoneType crash or silent batch-stat fallback (advisor fix)
            raise ValueError(
                f"batch_stats at {self.scope.path} carries "
                f"{'mean' if has_mean else 'var'} without "
                f"{'var' if has_mean else 'mean'} — corrupt or mis-pathed "
                "running-stats tree (see compat.torch_ckpt."
                "validate_batch_stats)"
            )
        if self.norm_type == "BN" and has_mean:
            shape = (1,) * (x.ndim - 1) + (C,)
            mean = self.get_variable("batch_stats", "mean").reshape(shape)
            var = self.get_variable("batch_stats", "var").reshape(shape)
            mean = mean.astype(x.dtype)
            var = var.astype(x.dtype)
        else:
            if self.norm_type == "IN":
                axes = tuple(range(1, x.ndim - 1))  # per-sample spatial dims
            elif self.norm_type == "BN":
                axes = tuple(range(0, x.ndim - 1))  # batch + spatial
            else:
                raise ValueError(self.norm_type)
            mean = jnp.mean(x, axis=axes, keepdims=True)
            var = jnp.var(x, axis=axes, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * gain.astype(x.dtype) + bias.astype(x.dtype)


def _conv2d(x, w, stride, padding, b=None):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if b is None else out + b


class GateConv2d(fnn.Module):
    """Gated conv: conv to 2c, split, sigmoid gate (gagnet.py:586-612).
    Causal padding along T when k_t > 1."""

    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]

    @fnn.compact
    def __call__(self, x):
        kt, kf = self.kernel_size
        w = self.param(
            "w", fnn.initializers.lecun_normal(),
            (kt, kf, x.shape[-1], 2 * self.out_channels), jnp.float32,
        )
        b = self.param("b", fnn.initializers.zeros,
                       (2 * self.out_channels,), jnp.float32)
        pad_t = (kt - 1, 0) if kt > 1 else (0, 0)
        h = _conv2d(x, w.astype(x.dtype), self.stride,
                    [pad_t, (0, 0)], b.astype(x.dtype))
        out, gate = jnp.split(h, 2, axis=-1)
        return out * jax.nn.sigmoid(gate)


class Conv2dunit(fnn.Module):
    """conv k2 stride (1,2) + norm + PReLU (gagnet.py:539-556)."""

    k: Tuple[int, int]
    c: int
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        w = self.param("w", fnn.initializers.lecun_normal(),
                       (*self.k, x.shape[-1], self.c), jnp.float32)
        b = self.param("b", fnn.initializers.zeros, (self.c,), jnp.float32)
        x = _conv2d(x, w.astype(x.dtype), (1, 2),
                    [(0, 0), (0, 0)], b.astype(x.dtype))
        x = NormSwitch(self.norm_type, name="norm")(x)
        return PReLUc(name="prelu")(x)


class Deconv2dunit(fnn.Module):
    """ConvTranspose k stride (1,2) + norm + PReLU (gagnet.py:559-583)."""

    k: Tuple[int, int]
    c: int
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        x = fnn.ConvTranspose(
            self.c, self.k, strides=(1, 2), padding="VALID",
            param_dtype=jnp.float32, dtype=x.dtype, name="deconv",
        )(x)
        x = NormSwitch(self.norm_type, name="norm")(x)
        return PReLUc(name="prelu")(x)


class EnUnetModule(fnn.Module):
    """Residual inner-U-Net encoder stage (gagnet.py:487-537)."""

    cin: int
    cout: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    intra_connect: str
    norm_type: str
    scale: int

    @fnn.compact
    def __call__(self, x):
        x = GateConv2d(self.cout, self.k1, (1, 2), name="in_conv_gate")(x)
        x = NormSwitch(self.norm_type, name="in_conv_norm")(x)
        x_resi = PReLUc(name="in_conv_prelu")(x)

        h = x_resi
        skips = []
        for i in range(self.scale):
            h = Conv2dunit(self.k2, self.cout, self.norm_type,
                           name=f"enco_{i}")(h)
            skips.append(h)
        for i in range(self.scale):
            if i == 0:
                h = Deconv2dunit(self.k2, self.cout, self.norm_type,
                                 name=f"deco_{i}")(h)
            else:
                aux = skips[-(i + 1)]
                if self.intra_connect == "add":
                    h = h + aux
                else:
                    h = jnp.concatenate([h, aux], axis=-1)
                h = Deconv2dunit(self.k2, self.cout, self.norm_type,
                                 name=f"deco_{i}")(h)
        return x_resi + h


class U2NetEncoder(fnn.Module):
    """(gagnet.py:404-443)."""

    cin: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    c: int
    intra_connect: str
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        k_beg, c_end = (2, 5), 64
        x = EnUnetModule(self.cin, self.c, k_beg, self.k2,
                         self.intra_connect, self.norm_type, scale=4,
                         name="meta_unet_0")(x)
        x = EnUnetModule(self.c, self.c, self.k1, self.k2,
                         self.intra_connect, self.norm_type, scale=3,
                         name="meta_unet_1")(x)
        x = EnUnetModule(self.c, self.c, self.k1, self.k2,
                         self.intra_connect, self.norm_type, scale=2,
                         name="meta_unet_2")(x)
        x = EnUnetModule(self.c, self.c, self.k1, self.k2,
                         self.intra_connect, self.norm_type, scale=1,
                         name="meta_unet_3")(x)
        x = GateConv2d(c_end, self.k1, (1, 2), name="last_gate")(x)
        x = NormSwitch(self.norm_type, name="last_norm")(x)
        return PReLUc(name="last_prelu")(x)


class UNetEncoder(fnn.Module):
    """(gagnet.py:446-484)."""

    cin: int
    k1: Tuple[int, int]
    c: int
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        k_beg, c_end = (2, 5), 64
        ks = [k_beg, self.k1, self.k1, self.k1, self.k1]
        cs = [self.c, self.c, self.c, self.c, c_end]
        for i, (k, c) in enumerate(zip(ks, cs)):
            x = GateConv2d(c, k, (1, 2), name=f"unet_{i}_gate")(x)
            x = NormSwitch(self.norm_type, name=f"unet_{i}_norm")(x)
            x = PReLUc(name=f"unet_{i}_prelu")(x)
        return x


def _conv1d(x, w, b=None, padding=(0, 0), dilation=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[tuple(padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out if b is None else out + b


class SqueezedTCM(fnn.Module):
    """Squeezed temporal conv module (gagnet.py:360-401). (B, T, d_feat)."""

    kd1: int
    cd1: int
    d_feat: int
    dilation: int
    causal: bool
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        resi = x
        w_in = self.param("in_conv_w", fnn.initializers.lecun_normal(),
                          (1, self.d_feat, self.cd1), jnp.float32)
        h = _conv1d(x, w_in.astype(x.dtype))
        h = PReLUc(name="d_prelu")(h)
        h = NormSwitch(self.norm_type, name="d_norm")(h)
        pad = (self.kd1 - 1) * self.dilation
        padding = (pad, 0) if self.causal else (pad // 2, pad - pad // 2)
        w_d = self.param("d_conv_w", fnn.initializers.lecun_normal(),
                         (self.kd1, self.cd1, self.cd1), jnp.float32)
        h = _conv1d(h, w_d.astype(x.dtype), padding=padding,
                    dilation=self.dilation)
        h = PReLUc(name="out_prelu")(h)
        h = NormSwitch(self.norm_type, name="out_norm")(h)
        w_out = self.param("out_conv_w", fnn.initializers.lecun_normal(),
                           (1, self.cd1, self.d_feat), jnp.float32)
        h = _conv1d(h, w_out.astype(x.dtype))
        return h + resi


class SqueezedTCNGroup(fnn.Module):
    """(gagnet.py:335-357)."""

    kd1: int
    cd1: int
    d_feat: int
    dilas: Sequence[int]
    causal: bool
    norm_type: str

    @fnn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilas):
            x = SqueezedTCM(self.kd1, self.cd1, self.d_feat, d,
                            self.causal, self.norm_type, name=f"tcm_{i}")(x)
        return x


class _GatedIn(fnn.Module):
    """Shared gated 1x1 input conv of glance/gaze blocks."""

    d_feat: int

    @fnn.compact
    def __call__(self, inpt):
        ci = inpt.shape[-1]
        wm = self.param("main_w", fnn.initializers.lecun_normal(),
                        (1, ci, self.d_feat), jnp.float32)
        bm = self.param("main_b", fnn.initializers.zeros,
                        (self.d_feat,), jnp.float32)
        wg = self.param("gate_w", fnn.initializers.lecun_normal(),
                        (1, ci, self.d_feat), jnp.float32)
        bg = self.param("gate_b", fnn.initializers.zeros,
                        (self.d_feat,), jnp.float32)
        main = _conv1d(inpt, wm.astype(inpt.dtype), bm.astype(inpt.dtype))
        gate = _conv1d(inpt, wg.astype(inpt.dtype), bg.astype(inpt.dtype))
        return main * jax.nn.sigmoid(gate)


class GlanceBlock(fnn.Module):
    """Magnitude-gain branch (gagnet.py:209-267)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Sequence[int]
    freq_bins: int
    causal: bool
    acti_type: str
    norm_type: str

    @fnn.compact
    def __call__(self, feat_x, pre_flat):
        """feat_x (B, T, d_feat), pre_flat (B, T, 2F) -> gain (B, T, F)."""
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = _GatedIn(self.d_feat, name="in_gated")(inpt)
        for i in range(self.p):
            x = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat, self.dilas,
                                 self.causal, self.norm_type,
                                 name=f"tcn_g_{i}")(x)
        w = self.param("linear_g_w", fnn.initializers.lecun_normal(),
                       (1, self.d_feat, self.freq_bins), jnp.float32)
        b = self.param("linear_g_b", fnn.initializers.zeros,
                       (self.freq_bins,), jnp.float32)
        gain = _conv1d(x, w.astype(x.dtype), b.astype(x.dtype))
        acti = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh,
                "relu": jax.nn.relu}[self.acti_type]
        return acti(gain)


class GazeBlock(fnn.Module):
    """Complex-residual branch (gagnet.py:270-332)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Sequence[int]
    freq_bins: int
    causal: bool
    is_squeezed: bool
    norm_type: str

    @fnn.compact
    def __call__(self, feat_x, pre_flat):
        """-> complex residual (B, T, F, 2)."""
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = _GatedIn(self.d_feat, name="in_gated")(inpt)
        if not self.is_squeezed:
            xr, xi = x, x
            for i in range(self.p):
                xr = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat,
                                      self.dilas, self.causal, self.norm_type,
                                      name=f"tcm_r_{i}")(xr)
                xi = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat,
                                      self.dilas, self.causal, self.norm_type,
                                      name=f"tcm_i_{i}")(xi)
        else:
            for i in range(self.p):
                x = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat,
                                     self.dilas, self.causal, self.norm_type,
                                     name=f"tcm_ri_{i}")(x)
            xr, xi = x, x
        wr = self.param("linear_r_w", fnn.initializers.lecun_normal(),
                        (1, self.d_feat, self.freq_bins), jnp.float32)
        br = self.param("linear_r_b", fnn.initializers.zeros,
                        (self.freq_bins,), jnp.float32)
        wi = self.param("linear_i_w", fnn.initializers.lecun_normal(),
                        (1, self.d_feat, self.freq_bins), jnp.float32)
        bi = self.param("linear_i_b", fnn.initializers.zeros,
                        (self.freq_bins,), jnp.float32)
        xr = _conv1d(xr, wr.astype(x.dtype), br.astype(x.dtype))
        xi = _conv1d(xi, wi.astype(x.dtype), bi.astype(x.dtype))
        return jnp.stack([xr, xi], axis=-1)


class GlanceGazeModule(fnn.Module):
    """Coarse magnitude filtering + complex residual (gagnet.py:165-206)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Sequence[int]
    freq_bins: int
    causal: bool
    is_squeezed: bool
    acti_type: str
    norm_type: str

    @fnn.compact
    def __call__(self, feat_x, pre_x):
        """feat_x (B, T, d_feat); pre_x (B, T, F, 2) -> (B, T, F, 2)."""
        B, T, F, _ = pre_x.shape
        # planar [re(all F), im(all F)] flattening — the reference's
        # pre_x.view(b, 2*F, T) channel order (gagnet.py:258-262), so
        # converted checkpoints line up with the gated input convs
        pre_flat = jnp.transpose(pre_x, (0, 1, 3, 2)).reshape(B, T, 2 * F)
        gain = GlanceBlock(self.kd1, self.cd1, self.d_feat, self.p,
                           self.dilas, self.freq_bins, self.causal,
                           self.acti_type, self.norm_type,
                           name="glance_block")(feat_x, pre_flat)
        com_resi = GazeBlock(self.kd1, self.cd1, self.d_feat, self.p,
                             self.dilas, self.freq_bins, self.causal,
                             self.is_squeezed, self.norm_type,
                             name="gaze_block")(feat_x, pre_flat)
        pre_mag = jnp.sqrt(pre_x[..., 0] ** 2 + pre_x[..., 1] ** 2 + 1e-12)
        pre_phase = jnp.arctan2(pre_x[..., 1], pre_x[..., 0])
        filtered = pre_mag * gain
        coarse = jnp.stack(
            [filtered * jnp.cos(pre_phase), filtered * jnp.sin(pre_phase)],
            axis=-1,
        )
        return coarse + com_resi


@BackboneRegistry.register("gagnet")
class GaGNet(fnn.Module):
    """Glance-and-Gaze spectral denoiser (sgmse/backbones/gagnet.py:9-136).

    Defaults match the reference CLI (gagnet.py:139-163).
    """

    cin: int = 2
    dnn_channels: int = 1
    fft_num: int = 512
    k1: Tuple[int, int] = (2, 3)
    k2: Tuple[int, int] = (1, 3)
    c: int = 64
    kd1: int = 3
    cd1: int = 64
    d_feat: int = 448
    p: int = 2
    q: int = 3
    dilas: Tuple[int, ...] = (1, 2, 5, 9)
    is_u2: bool = True
    causal: bool = False
    is_squeezed: bool = False
    acti_type: str = "sigmoid"
    intra_connect: str = "cat"
    norm_type: str = "IN"
    dtype: Any = jnp.float32

    FORCE_STFT_OUT = False

    @classmethod
    def from_kwargs(cls, **kwargs):
        names = {f.name for f in dataclasses.fields(cls) if f.init}
        return cls(**{k: v for k, v in kwargs.items() if k in names})

    @staticmethod
    def add_argparse_args(parser):
        """CLI group mirroring the reference (gagnet.py:138-163). Tuple
        args take comma strings ("2,3") — the reference's `type=tuple`
        spelling is broken (it chars-splits the string); same flag names,
        working parsers."""
        def tup(s):
            return tuple(int(v) for v in str(s).split(","))

        parser.add_argument("--cin", type=int, default=2)
        parser.add_argument("--dnn_channels", type=int, default=1)
        parser.add_argument("--fft_num", type=int, default=512)
        parser.add_argument("--k1", type=tup, default=(2, 3))
        parser.add_argument("--k2", type=tup, default=(1, 3))
        parser.add_argument("--c", type=int, default=64)
        parser.add_argument("--kd1", type=int, default=3)
        parser.add_argument("--cd1", type=int, default=64)
        parser.add_argument("--d_feat", type=int, default=448)
        parser.add_argument("--p", type=int, default=2)
        parser.add_argument("--q", type=int, default=3)
        parser.add_argument("--dilas", type=tup, default=(1, 2, 5, 9))
        parser.add_argument("--is_u2", type=lambda s: s not in
                            ("False", "false", "0"), default=True)
        # same optional-bool spelling as convtasnet's --causal: the two
        # backbones share this option string and the first registration
        # wins (train.py _DedupGroup), so both syntaxes must parse
        # identically regardless of registration order
        parser.add_argument(
            "--causal", nargs="?", const=True, default=False,
            type=lambda s: s in ("True", "true", "1"))
        parser.add_argument("--is_squeezed", type=lambda s: s in
                            ("True", "true", "1"), default=False)
        parser.add_argument("--acti_type", type=str, default="sigmoid",
                            choices=["sigmoid", "tanh", "relu"])
        parser.add_argument("--intra_connect", type=str, default="cat",
                            choices=["cat", "add"])
        parser.add_argument("--norm_type", type=str, default="IN",
                            choices=["BN", "IN"])
        return parser

    @fnn.compact
    def __call__(self, x, time_cond=None, train: bool = False):
        """x: packed-real (B, D=1, F, T, 2) -> same shape (mask * input)."""
        del time_cond, train
        B, D, F, T, _ = x.shape
        assert D == 1, "GaGNet supports dnn_channels=1 here"
        x_in = x.astype(self.dtype)
        h = jnp.transpose(x_in[:, 0], (0, 2, 1, 3))  # (B, T, F, 2)

        pad_f = 1 if F % 2 == 0 else 0  # make F odd (gagnet.py:107-110)
        if pad_f:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_f), (0, 0)))
        freq_bins = self.fft_num * self.dnn_channels // 2 + 1

        if self.is_u2:
            feat = U2NetEncoder(self.cin, self.k1, self.k2, self.c,
                                self.intra_connect, self.norm_type,
                                name="en")(h)
        else:
            feat = UNetEncoder(self.cin, self.k1, self.c, self.norm_type,
                               name="en")(h)
        Bf, Tf, Ff, Cf = feat.shape
        # C-major flattening (channel slow, freq fast) — the reference's
        # feat_x.transpose(-2,-1).view(b, -1, T) order (gagnet.py:110-115)
        z = jnp.transpose(feat, (0, 1, 3, 2)).reshape(Bf, Tf, Cf * Ff)

        pre_z = h  # (B, T, F_odd, 2)
        for i in range(self.q):
            pre_z = GlanceGazeModule(
                self.kd1, self.cd1, self.d_feat * self.dnn_channels, self.p,
                self.dilas, freq_bins, self.causal, self.is_squeezed,
                self.acti_type, self.norm_type, name=f"gag_{i}",
            )(z, pre_z)

        out = pre_z
        if pad_f:
            out = out[:, :, :-pad_f, :]
        out = jnp.transpose(out, (0, 2, 1, 3))  # (B, F, T, 2)
        masks = jnp.tanh(out)

        # complex mask multiplication with the (unstandardized) input
        xr, xi = x_in[:, 0, ..., 0], x_in[:, 0, ..., 1]
        mr, mi = masks[..., 0], masks[..., 1]
        yr = mr * xr - mi * xi
        yi = mr * xi + mi * xr
        return jnp.stack([yr, yi], axis=-1)[:, None].astype(jnp.float32)

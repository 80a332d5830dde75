"""NCSN++ backbone, TPU-native (Flax, channels-last).

Re-design of the reference NCSN++ (sgmse/backbones/ncsnpp.py:36-513): a
time-conditional U-Net over complex spectrograms treated as 2-channel images,
with BigGAN resblocks, FIR up/down resampling, progressive input/output
pyramids and bottleneck attention.

Differences from the reference that are deliberate TPU-first choices:

- Channels-last (B, F, T, C) layout everywhere (lane axis = channels).
- Packed-real complex interface: (B, D, F, T, 2) in/out instead of torch
  complex dtypes (the TPU backend has no complex support).
- FIR resampling is `lax.conv_general_dilated` (XLA fuses + differentiates
  it natively) instead of the custom CUDA `upfirdn2d` kernel.
- Configurable compute dtype (`dtype=jnp.bfloat16` for MXU throughput);
  params always float32.

Module-construction order replicates the reference exactly (modules named
``m{i}`` matching ``all_modules.{i}``) so a torch checkpoint converter can
map parameters positionally; see `storm_tpu/compat/`.

The reference's 'positional' embedding branch references an undefined
`self.sigmas` (sgmse/backbones/ncsnpp.py:307) — i.e. it is dead code there;
here it is implemented as a standard sinusoidal embedding.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import flax.linen as fnn
import jax
import jax.numpy as jnp

from ..nn.init import ddpm_init
from ..nn.layers import (
    AttnBlockpp,
    Combine,
    Downsample,
    GaussianFourierProjection,
    ResnetBlockBigGANpp,
    ResnetBlockDDPMpp,
    Upsample,
    conv3x3,
    get_act,
    group_norm,
)
from . import BackboneRegistry


def _timestep_embedding(timesteps, embedding_dim: int):
    """Sinusoidal timestep embedding (DDPM-style)."""
    half_dim = embedding_dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps[:, None].astype(jnp.float32) * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


@BackboneRegistry.register("ncsnpp")
class NCSNpp(fnn.Module):
    """NCSN++ (default 27.8M-param config, sgmse/backbones/ncsnpp.py:40-65)."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (0,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    input_channels: int = 4
    spatial_channels: int = 1
    dropout: float = 0.0
    centered: bool = False
    discriminative: bool = False
    dtype: Any = jnp.float32
    # concat-free split-input up-path resblocks (mathematically identical;
    # see nn/layers.py SplitGroupNorm). Off switch kept for A/B perf work.
    split_skip: bool = True

    FORCE_STFT_OUT = False
    # deep-feature cache split supported (deep_features/forward_shallow
    # operate on the 2-D spectrogram trunk directly)
    SUPPORTS_DEEPCACHE = True

    @classmethod
    def from_kwargs(cls, **kwargs):
        """Construct, ignoring unknown kwargs (reference ctors take **kwargs)."""
        names = {f.name for f in dataclasses.fields(cls) if f.init}
        return cls(**{k: v for k, v in kwargs.items() if k in names})

    @staticmethod
    def add_argparse_args(parser):
        """No CLI group — the reference's NCSN++ flags are all commented
        out (ncsnpp.py:276-279); width overrides live on train.py's own
        --nf/--ch_mult extension flags."""
        return parser

    # --- effective (discriminative-adjusted) config -----------------------
    # The reference mutates ctor args in discriminative mode
    # (ncsnpp.py:80-86); flax fields are frozen so adjust via properties.

    @property
    def eff_conditional(self) -> bool:
        return False if self.discriminative else self.conditional

    @property
    def eff_scale_by_sigma(self) -> bool:
        return False if self.discriminative else self.scale_by_sigma

    @property
    def eff_input_channels(self) -> int:
        return 2 if self.discriminative else self.input_channels

    @property
    def total_channels(self) -> int:
        return self.eff_input_channels * self.spatial_channels

    @property
    def num_resolutions(self) -> int:
        return len(self.ch_mult)

    @property
    def all_resolutions(self) -> Sequence[int]:
        return [self.image_size // (2**i) for i in range(self.num_resolutions)]

    def setup(self):
        assert self.progressive in ["none", "output_skip", "residual"]
        assert self.progressive_input in ["none", "input_skip", "residual"]
        assert self.embedding_type in ["fourier", "positional"]
        nf = self.nf
        act = get_act(self.nonlinearity)
        combine_method = self.progressive_combine.lower()
        resblock_type = self.resblock_type.lower()
        num_resolutions = self.num_resolutions
        all_resolutions = self.all_resolutions

        def ResBlock(i, **kw):
            common = dict(
                act=act,
                dropout=self.dropout,
                init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
                temb_dim=nf * 4,
                name=f"m{i}",
            )
            if resblock_type == "ddpm":
                return ResnetBlockDDPMpp(**common, **kw)
            elif resblock_type == "biggan":
                return ResnetBlockBigGANpp(
                    fir=self.fir, fir_kernel=self.fir_kernel, **common, **kw
                )
            raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

        def Attn(i, **kw):
            return AttnBlockpp(
                init_scale=self.init_scale,
                skip_rescale=self.skip_rescale,
                name=f"m{i}",
                **kw,
            )

        modules = []

        # Progressive pyramids (no params when with_conv=False)
        if self.progressive == "output_skip":
            self.pyramid_upsample = Upsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )
        if self.progressive_input == "input_skip":
            self.pyramid_downsample = Downsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )

        # --- time embedding ------------------------------------------------
        if self.embedding_type == "fourier":
            modules.append(
                GaussianFourierProjection(
                    embedding_size=nf, scale=self.fourier_scale,
                    name=f"m{len(modules)}",
                )
            )
            embed_dim = 2 * nf
        else:  # positional
            embed_dim = nf

        del embed_dim  # input dims are inferred by flax
        if self.eff_conditional:
            for _ in range(2):
                modules.append(
                    fnn.Dense(
                        nf * 4,
                        kernel_init=ddpm_init(),
                        bias_init=fnn.initializers.zeros,
                        param_dtype=jnp.float32,
                        dtype=self.dtype,
                        name=f"m{len(modules)}",
                    )
                )

        # --- downsampling trunk -------------------------------------------
        modules.append(
            conv3x3(nf, dtype=self.dtype, name=f"m{len(modules)}")
        )
        hs_c = [nf]
        input_pyramid_ch = self.total_channels
        in_ch = nf
        for i_level in range(num_resolutions):
            for _ in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                modules.append(ResBlock(len(modules), in_ch=in_ch, out_ch=out_ch))
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    modules.append(Attn(len(modules)))
                hs_c.append(in_ch)

            if i_level != num_resolutions - 1:
                if resblock_type == "ddpm":
                    modules.append(
                        Downsample(
                            with_conv=self.resamp_with_conv,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=f"m{len(modules)}",
                        )
                    )
                else:
                    modules.append(ResBlock(len(modules), in_ch=in_ch, down=True))

                if self.progressive_input == "input_skip":
                    modules.append(
                        Combine(
                            dim2=in_ch, method=combine_method,
                            name=f"m{len(modules)}",
                        )
                    )
                    if combine_method == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    modules.append(
                        Downsample(
                            out_ch=in_ch,
                            with_conv=True,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=f"m{len(modules)}",
                        )
                    )
                    input_pyramid_ch = in_ch
                hs_c.append(in_ch)

        # --- bottleneck ----------------------------------------------------
        in_ch = hs_c[-1]
        modules.append(ResBlock(len(modules), in_ch=in_ch))
        modules.append(Attn(len(modules)))
        modules.append(ResBlock(len(modules), in_ch=in_ch))

        # --- upsampling trunk ----------------------------------------------
        # module index at the start of each up-level iteration: the resume
        # points for deep-feature-cached partial forwards (`forward_shallow`)
        up_starts = {}
        pyramid_ch = 0
        for i_level in reversed(range(num_resolutions)):
            up_starts[i_level] = len(modules)
            for _ in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                modules.append(
                    ResBlock(len(modules), in_ch=in_ch + hs_c.pop(), out_ch=out_ch)
                )
                in_ch = out_ch
            if all_resolutions[i_level] in self.attn_resolutions:
                modules.append(Attn(len(modules)))

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    modules.append(
                        group_norm(in_ch, dtype=self.dtype, name=f"m{len(modules)}")
                    )
                    if self.progressive == "output_skip":
                        modules.append(
                            conv3x3(
                                self.total_channels,
                                init_scale=self.init_scale,
                                dtype=self.dtype,
                                name=f"m{len(modules)}",
                            )
                        )
                        pyramid_ch = self.total_channels
                    else:  # residual
                        modules.append(
                            conv3x3(
                                in_ch, bias=True, dtype=self.dtype,
                                name=f"m{len(modules)}",
                            )
                        )
                        pyramid_ch = in_ch
                else:
                    if self.progressive == "output_skip":
                        modules.append(
                            group_norm(in_ch, dtype=self.dtype, name=f"m{len(modules)}")
                        )
                        modules.append(
                            conv3x3(
                                self.total_channels,
                                bias=True,
                                init_scale=self.init_scale,
                                dtype=self.dtype,
                                name=f"m{len(modules)}",
                            )
                        )
                        pyramid_ch = self.total_channels
                    else:  # residual
                        modules.append(
                            Upsample(
                                out_ch=in_ch,
                                with_conv=True,
                                fir=self.fir,
                                fir_kernel=self.fir_kernel,
                                name=f"m{len(modules)}",
                            )
                        )
                        pyramid_ch = in_ch

            if i_level != 0:
                if resblock_type == "ddpm":
                    modules.append(
                        Upsample(
                            with_conv=self.resamp_with_conv,
                            fir=self.fir,
                            fir_kernel=self.fir_kernel,
                            name=f"m{len(modules)}",
                        )
                    )
                else:
                    modules.append(ResBlock(len(modules), in_ch=in_ch, up=True))

        assert not hs_c
        if self.progressive != "output_skip":
            modules.append(
                group_norm(in_ch, dtype=self.dtype, name=f"m{len(modules)}")
            )
            modules.append(
                conv3x3(
                    self.total_channels,
                    init_scale=self.init_scale,
                    dtype=self.dtype,
                    name=f"m{len(modules)}",
                )
            )

        self.all_modules = modules
        self._up_start_idx = up_starts
        # Final 1x1 conv to 2*spatial_channels real output channels
        # (ncsnpp.py:108). Plain flax default init (reference uses the torch
        # Conv2d default there, not the DDPM init).
        self.output_layer = fnn.Conv(
            2 * self.spatial_channels,
            (1, 1),
            param_dtype=jnp.float32,
            dtype=self.dtype,
            name="output_layer",
        )

    def __call__(self, x, time_cond=None, train: bool = False):
        """Forward pass.

        Args:
            x: packed-real spectrogram stack (B, C_cplx, F, T, 2) where
               C_cplx = total_channels // 2 complex channels (e.g. [x_t, y]
               for score mode; [x_t, y, y_denoised] for StoRM condition=both).
            time_cond: (B,) diffusion times (may be None when unconditional).
            train: enables dropout.

        Returns:
            packed-real (B, spatial_channels, F, T, 2).
        """
        h_in = self._pack_input(x)
        h = self._unet(h_in, time_cond, train)
        return self._unpack_output(h, x.shape)

    def _pack_input(self, x):
        """complex->channel split: per complex channel [re, im] interleaved,
        channels-last (reference does the same split channels-first,
        ncsnpp.py:289-296)."""
        B, Cc, Fdim, Tdim, _ = x.shape
        assert 2 * Cc == self.total_channels, (
            f"got {Cc} complex channels, expected {self.total_channels // 2}"
        )
        h_in = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, Fdim, Tdim, 2 * Cc)
        return h_in.astype(self.dtype)

    def _unpack_output(self, h, in_shape):
        B, _, Fdim, Tdim, _ = in_shape
        h = self.output_layer(h)  # (B, F, T, 2*D), [re(d) for d] + [im(d) for d]
        h = h.astype(jnp.float32)
        D = self.spatial_channels
        h = h.reshape(B, Fdim, Tdim, 2, D)
        return jnp.transpose(h, (0, 4, 1, 2, 3))  # (B, D, F, T, 2)

    # --- deep-feature caching (serving perf; DeepCache-style, public
    # technique: Ma et al., "DeepCache: Accelerating Diffusion Models for
    # Free", arXiv:2312.00858) ---------------------------------------------
    #
    # The reverse-diffusion sampler evaluates this net 30-101 times with
    # slowly-varying x_t and FIXED conditioning channels (y, D(y)) — deep
    # U-Net features are nearly constant across adjacent steps. `deep_features`
    # runs the down trunk + bottleneck + up levels down to `cache_depth` and
    # returns (h, pyramid) at the entry of up-level `cache_depth-1`;
    # `forward_shallow` reuses that cache and recomputes only the top
    # `cache_depth` levels (~1/3 of the FLOPs at the default config).
    # Invariant: forward_shallow(x, t, deep_features(x, t)) == __call__(x, t)
    # exactly (tests/test_deepcache.py).

    def deep_features(self, x, time_cond=None, cache_depth: int = 1):
        """Down trunk + bottleneck + up levels >= cache_depth; returns the
        (h, pyramid) cache consumed by `forward_shallow`."""
        h_in = self._pack_input(x)
        return self._unet(
            h_in, time_cond, False,
            cache_depth=cache_depth, return_cache=True,
        )

    def forward_shallow(self, x, time_cond=None, cache=None,
                        cache_depth: int = 1):
        """Top-`cache_depth` levels only, resuming the up path from a
        `deep_features` cache."""
        assert cache is not None
        h_in = self._pack_input(x)
        h = self._unet(
            h_in, time_cond, False, cache=cache, cache_depth=cache_depth,
        )
        return self._unpack_output(h, x.shape)

    def _unet(self, h_in, time_cond, train: bool = False, cache=None,
              cache_depth: int = 0, return_cache: bool = False):
        """U-Net trunk on a real NHWC image (B, H, W, total_channels) ->
        (B, H, W, total_channels or pyramid channels), incl. scale_by_sigma
        but excluding the final 1x1 output projection.

        Deep-feature caching modes (see `deep_features`/`forward_shallow`):
        `return_cache=True` stops at the entry of up-level `cache_depth-1`
        and returns the (h, pyramid) cache; `cache=(h, pyramid)` skips the
        down levels >= cache_depth, the bottleneck, and the up levels
        >= cache_depth, resuming the up path from the cache."""
        modules = self.all_modules
        m_idx = 0
        act = get_act(self.nonlinearity)
        shallow = cache is not None
        if shallow or return_cache:
            assert 1 <= cache_depth < self.num_resolutions, (
                f"cache_depth must be in [1, {self.num_resolutions - 1}], "
                f"got {cache_depth}"
            )
            assert (
                self.progressive == "output_skip"
                and self.progressive_input == "input_skip"
                and self.resblock_type == "biggan"
            ), "deep-feature caching supports the default NCSN++ config only"

        # --- time embedding ------------------------------------------------
        if self.embedding_type == "fourier":
            used_sigmas = time_cond
            if time_cond is not None:
                temb = modules[m_idx](jnp.log(time_cond))
            else:
                temb = None
            m_idx += 1
        else:  # positional
            used_sigmas = time_cond
            temb = (
                _timestep_embedding(time_cond, self.nf)
                if time_cond is not None
                else None
            )

        if self.eff_conditional:
            temb = modules[m_idx](temb.astype(self.dtype))
            m_idx += 1
            temb = modules[m_idx](act(temb))
            m_idx += 1
        else:
            temb = None

        if not self.centered:
            h_in = 2.0 * h_in - 1.0

        # --- downsampling --------------------------------------------------
        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = h_in

        hs = [modules[m_idx](h_in)]
        m_idx += 1
        n_down = cache_depth if shallow else self.num_resolutions
        for i_level in range(n_down):
            for _ in range(self.num_res_blocks):
                h = modules[m_idx](hs[-1], temb, train=train)
                m_idx += 1
                if self.all_resolutions[i_level] in self.attn_resolutions:
                    h = modules[m_idx](h)
                    m_idx += 1
                hs.append(h)

            # in shallow mode the last recomputed level's downsampled h is
            # consumed by a SKIPPED up level — don't compute it
            if i_level != self.num_resolutions - 1 and not (
                shallow and i_level == cache_depth - 1
            ):
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](hs[-1])
                    m_idx += 1
                else:
                    h = modules[m_idx](hs[-1], temb, train=train)
                    m_idx += 1

                if self.progressive_input == "input_skip":
                    input_pyramid = self.pyramid_downsample(input_pyramid)
                    h = modules[m_idx](input_pyramid, h)
                    m_idx += 1
                elif self.progressive_input == "residual":
                    input_pyramid = modules[m_idx](input_pyramid)
                    m_idx += 1
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / math.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        if shallow:
            h, pyramid = cache
            h = h.astype(self.dtype)
            pyramid = pyramid.astype(self.dtype)
            m_idx = self._up_start_idx[cache_depth - 1]
            up_levels = range(cache_depth - 1, -1, -1)
        else:
            # --- bottleneck ------------------------------------------------
            h = hs[-1]
            h = modules[m_idx](h, temb, train=train)
            m_idx += 1
            h = modules[m_idx](h)
            m_idx += 1
            h = modules[m_idx](h, temb, train=train)
            m_idx += 1
            pyramid = None
            up_levels = range(self.num_resolutions - 1, -1, -1)

        # --- upsampling ----------------------------------------------------
        for i_level in up_levels:
            if return_cache and i_level == cache_depth - 1:
                return h, pyramid
            for _ in range(self.num_res_blocks + 1):
                blk = modules[m_idx]
                if self.split_skip and isinstance(blk, ResnetBlockBigGANpp):
                    # concat-free split-input form: ~40% faster chain at
                    # serving shapes, mathematically identical
                    # (nn/layers.py SplitGroupNorm / QuantizableConv)
                    h = blk(h, temb, train=train, skip=hs.pop())
                else:
                    h = blk(jnp.concatenate([h, hs.pop()], axis=-1), temb,
                            train=train)
                m_idx += 1
            if self.all_resolutions[i_level] in self.attn_resolutions:
                h = modules[m_idx](h)
                m_idx += 1

            if self.progressive != "none":
                if i_level == self.num_resolutions - 1:
                    pyramid = act(modules[m_idx](h))
                    m_idx += 1
                    pyramid = modules[m_idx](pyramid)
                    m_idx += 1
                else:
                    if self.progressive == "output_skip":
                        pyramid = self.pyramid_upsample(pyramid)
                        pyramid_h = act(modules[m_idx](h))
                        m_idx += 1
                        pyramid_h = modules[m_idx](pyramid_h)
                        m_idx += 1
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / math.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](h)
                    m_idx += 1
                else:
                    h = modules[m_idx](h, temb, train=train)
                    m_idx += 1

        assert not hs
        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = act(modules[m_idx](h))
            m_idx += 1
            h = modules[m_idx](h)
            m_idx += 1
        assert m_idx == len(modules)

        if self.eff_scale_by_sigma:
            h = h / used_sigmas[:, None, None, None].astype(h.dtype)
        return h


@BackboneRegistry.register("ae-ncsnpp")
class AutoEncodeNCSNpp(NCSNpp):
    """NCSN++ on a learned Conv1d filterbank instead of the STFT
    (sgmse/backbones/ncsnpp.py:516-931): 512-tap stride-128 encoder to
    `image_size` channels, trunk U-Net with total_channels=1, transposed-conv
    decoder back to the waveform.

    Reference quirks fixed here: its conditional branch references an
    undefined `lnn` (ncsnpp.py:651, i.e. untested) — conditioning just works
    here; and it never defines FORCE_STFT_OUT (which DiscriminativeModel
    reads) — this is a time-domain backbone, so FORCE_STFT_OUT = True.
    """

    input_channels: int = 1
    discriminative: bool = True

    FORCE_STFT_OUT = True
    # __call__ wraps the trunk in a waveform Conv1d encoder/decoder that
    # the inherited deep_features/forward_shallow split would bypass
    SUPPORTS_DEEPCACHE = False

    @property
    def eff_input_channels(self) -> int:
        # waveform-domain: one real channel from the learned encoder
        return 1 if self.discriminative else self.input_channels

    def setup(self):
        super().setup()
        self.encoder_w = self.param(
            "encoder_w", ddpm_init(),
            (512, 1, self.image_size), jnp.float32,
        )
        self.decoder_w = self.param(
            "decoder_w", ddpm_init(),
            (512, self.image_size, 1), jnp.float32,
        )

    def __call__(self, x_time, time_cond=None, train: bool = False):
        """x_time: waveform (B, T) or (B, 1, T) -> same shape."""
        squeeze = x_time.ndim == 2
        if not squeeze:
            assert x_time.shape[1] == 1, "ae-ncsnpp assumes D=1"
            x_time = x_time[:, 0]
        B, T_orig = x_time.shape
        h = x_time[..., None].astype(self.dtype)  # (B, T, 1)

        # encoder: Conv1d(1 -> image_size, 512, stride 128, pad 256, no bias)
        enc = jax.lax.conv_general_dilated(
            h, self.encoder_w.astype(h.dtype),
            window_strides=(128,), padding=[(256, 256)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )  # (B, L, C=image_size)
        img = jnp.transpose(enc, (0, 2, 1))[..., None]  # (B, C, L, 1)

        # pad the frame axis to a multiple of 64 (reference pads via
        # pad_spec, ncsnpp.py:770-771)
        L = img.shape[2]
        pad = (-L) % 64
        if pad:
            img = jnp.pad(img, ((0, 0), (0, 0), (0, pad), (0, 0)))

        h = self._unet(img, time_cond, train)  # (B, C, Lpad, 1)

        # decoder: ConvTranspose1d(image_size -> 1, 512, stride 128,
        # pad 256, no bias); the reference decodes the padded trunk output
        # then crops to T_orig (ncsnpp.py:922-924)
        dec_in = h[..., 0].swapaxes(1, 2)  # (B, Lpad, C)
        out = jax.lax.conv_general_dilated(
            dec_in, self.decoder_w.astype(h.dtype),
            window_strides=(1,), padding=[(255, 255)],
            lhs_dilation=(128,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[..., 0]
        out = out[:, :T_orig].astype(jnp.float32)
        return out if squeeze else out[:, None, :]


@BackboneRegistry.register("ncsnpplarge")
class NCSNppLarge(NCSNpp):
    """~65M-param variant (sgmse/backbones/ncsnpp.py:460-470)."""

    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)


@BackboneRegistry.register("ncsnpp12M")
class NCSNpp12M(NCSNpp):
    """~12M-param variant (sgmse/backbones/ncsnpp.py:479-489)."""

    nf: int = 96
    ch_mult: Tuple[int, ...] = (1, 2, 2, 1)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (0,)


@BackboneRegistry.register("ncsnpp6M")
class NCSNpp6M(NCSNpp):
    """~6M-param variant (sgmse/backbones/ncsnpp.py:498-508)."""

    nf: int = 96
    ch_mult: Tuple[int, ...] = (1, 1, 1, 1)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (0,)

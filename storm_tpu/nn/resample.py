"""StyleGAN2-style FIR resampling as XLA dilated convolutions.

The reference implements `upfirdn2d` (upsample -> FIR filter -> downsample) as
a custom CUDA kernel with a hand-written double-backward
(sgmse/backbones/ncsnpp_utils/op/upfirdn2d_kernel.cu,
op/upfirdn2d.py:19-142). On TPU the whole fused op *is* a single
`lax.conv_general_dilated` HLO: `lhs_dilation` performs the zero-insertion
upsample, `window_strides` the downsample, and XLA differentiates dilated
convolutions natively (producing exactly the flipped-kernel/swapped-updown
transpose the CUDA path hand-codes) — so no custom kernel or custom VJP is
needed for correctness or speed.

Semantics match `upfirdn2d_native` (op/upfirdn2d.py:159-200): zero-insertion
places `up-1` zeros *after* each sample (including the last), padding is
applied to the upsampled signal, the kernel is applied as a true convolution
(flipped), and downsampling keeps every `down`-th sample starting at 0.

All functions take channels-last (B, H, W, C) arrays.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _setup_kernel_np(k: tuple) -> np.ndarray:
    """Outer-product + normalize a (possibly separable) FIR kernel
    (cf. up_or_down_sampling.py:181-188)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def setup_kernel(k) -> jnp.ndarray:
    if isinstance(k, (list, tuple)):
        return jnp.asarray(_setup_kernel_np(tuple(k)))
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """Fused upsample -> FIR -> downsample on (B, H, W, C) arrays.

    Args:
        x: (B, H, W, C) input.
        kernel: 2-D FIR filter (kh, kw) — NOT normalized here.
        up/down: integer resampling factors (applied to both spatial dims).
        pad: (pad0, pad1) applied before/after on both spatial dims, in
            units of the *upsampled* grid. May be negative (cropping).

    Returns:
        (B, H', W', C) with H' = (H*up + pad0 + pad1 - kh) // down + 1.
    """
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    kh, kw = kernel.shape
    C = x.shape[-1]
    pad0, pad1 = int(pad[0]), int(pad[1])

    # The reference's zero-insertion appends up-1 zeros after EVERY sample;
    # lhs_dilation inserts them only between samples, so shift the missing
    # trailing zeros into the end-padding.
    pad_hw = (pad0, pad1 + up - 1)

    # True convolution: conv_general_dilated correlates, so flip the kernel
    # (op/upfirdn2d.py:186 flips before F.conv2d for the same reason).
    k = jnp.flip(kernel)[:, :, None, None]  # (kh, kw, 1, 1) HWIO
    k = jnp.broadcast_to(k, (kh, kw, 1, C))

    if min(pad_hw) < 0:
        # XLA conv padding must be non-negative; pre-crop instead.
        c0, c1 = max(-pad_hw[0], 0), max(-pad_hw[1], 0)
        if up > 1:
            # Cropping in upsampled coordinates with dilation is awkward;
            # materialize the upsample first (rare path — never hit by the
            # NCSN++ configs, which always pad).
            B, H, W, _ = x.shape
            z = jnp.zeros((B, H, up, W, up, C), x.dtype)
            z = z.at[:, :, 0, :, 0, :].set(x)
            xu = z.reshape(B, H * up, W * up, C)
            xu = xu[:, c0 : xu.shape[1] - c1, c0 : xu.shape[2] - c1, :]
            return upfirdn2d(xu, kernel, up=1, down=down,
                             pad=(max(pad_hw[0], 0), max(pad_hw[1], 0) - (up - 1)))
        x = x[:, c0 : x.shape[1] - c1, c0 : x.shape[2] - c1, :]
        pad_hw = (max(pad_hw[0], 0), max(pad_hw[1], 0))

    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down, down),
        padding=[pad_hw, pad_hw],
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR upsample by `factor` (up_or_down_sampling.py:195-224)."""
    if k is None:
        k = [1] * factor
    kern = setup_kernel(k) * (gain * (factor**2))
    p = kern.shape[0] - factor
    return upfirdn2d(
        x, kern, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR downsample by `factor` (up_or_down_sampling.py:227-257)."""
    if k is None:
        k = [1] * factor
    kern = setup_kernel(k) * gain
    p = kern.shape[0] - factor
    return upfirdn2d(x, kern, down=factor, pad=((p + 1) // 2, p // 2))


def naive_upsample_2d(x, factor: int = 2):
    """Nearest-neighbour upsample (up_or_down_sampling.py:59-63)."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


def naive_downsample_2d(x, factor: int = 2):
    """Mean-pool downsample (up_or_down_sampling.py:66-69)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // factor, factor, W // factor, factor, C)
    return jnp.mean(x, axis=(2, 4))


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused transposed-conv upsample followed by FIR
    (up_or_down_sampling.py:72-141).

    Args:
        x: (B, H, W, C_in).
        w: conv kernel (kh, kw, C_in, C_out) HWIO, kh == kw, odd.

    Returns:
        (B, H*factor, W*factor, C_out).
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw, cin, cout = w.shape
    assert kh == kw
    if k is None:
        k = [1] * factor
    kern = setup_kernel(k) * (gain * (factor**2))
    p = (kern.shape[0] - factor) - (kw - 1)

    # Transposed conv == correlate the zero-dilated, (kh-1)-padded input with
    # the kernel. The reference pre-flips its OIHW weights so its
    # F.conv_transpose2d nets out to correlating with the original kernel
    # (up_or_down_sampling.py:125-129); in HWIO that is simply `w` unchanged.
    # Output size (H-1)*factor + kh.
    h = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=[(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(h, kern, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused FIR followed by strided conv (up_or_down_sampling.py:144-178)."""
    assert isinstance(factor, int) and factor >= 1
    kh, kw, cin, cout = w.shape
    assert kh == kw
    if k is None:
        k = [1] * factor
    kern = setup_kernel(k) * gain
    p = (kern.shape[0] - factor) + (kw - 1)
    x = upfirdn2d(x, kern, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

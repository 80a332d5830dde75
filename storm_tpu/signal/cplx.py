"""Packed-real complex arithmetic for TPU.

The TPU backend in this environment implements no complex dtypes, so every
spectrogram on device is a real array with a trailing (real, imag) axis of
size 2. These helpers implement the complex arithmetic the framework needs
on that representation. All ops are trivially fused by XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pack(re, im):
    """(..., ) x2 -> (..., 2)."""
    return jnp.stack([re, im], axis=-1)


def to_packed(z):
    """complex (...,) -> packed (..., 2). Host/test convenience."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1).astype(jnp.float32)


def to_complex(p):
    """packed (..., 2) -> complex (...,). Host/test convenience."""
    return jax.lax.complex(p[..., 0], p[..., 1])


def real(p):
    return p[..., 0]


def imag(p):
    return p[..., 1]


def abs2(p):
    """|z|^2 — elementwise squared magnitude, shape (...)."""
    return p[..., 0] ** 2 + p[..., 1] ** 2


def cabs(p, eps: float = 0.0):
    """|z| — elementwise magnitude, shape (...)."""
    return jnp.sqrt(abs2(p) + eps)


def angle(p):
    """arg(z), shape (...)."""
    return jnp.arctan2(p[..., 1], p[..., 0])


def from_polar(mag, ang):
    """mag * exp(i*ang) -> packed (..., 2)."""
    return pack(mag * jnp.cos(ang), mag * jnp.sin(ang))


def cmul(a, b):
    """Complex multiply of packed arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return pack(ar * br - ai * bi, ar * bi + ai * br)


def conj(p):
    return pack(p[..., 0], -p[..., 1])


def scale(p, s):
    """Multiply packed complex `p` by a real array `s` broadcast over (...)."""
    return p * s[..., None]


def complex_normal(key, shape, dtype=jnp.float32):
    """Standard complex normal as packed (..., 2): Re/Im each N(0, 1/2).

    Matches `torch.randn_like` on complex tensors (total variance 1;
    cf. sgmse/model.py:146).
    """
    z = jax.random.normal(key, tuple(shape) + (2,), dtype=dtype)
    return z / jnp.sqrt(2.0).astype(dtype)

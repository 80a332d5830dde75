"""Amplitude-compression spectrogram transforms and padding helpers.

Mirrors the reference's `spec_fwd` / `spec_back`
(sgmse/data_module.py:182-193) and `pad_spec` (sgmse/util/other.py:102-109).

Both complex-dtype and packed-real (..., 2) variants are provided; the
packed-real ones are the device path (the TPU backend has no complex dtypes).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from . import cplx


@dataclasses.dataclass(frozen=True)
class SpecTransform:
    """`s -> |s|^e * exp(j*angle(s)) * factor` and its inverse.

    Defaults: exponent e=0.5, factor=0.15 (constructor default of the
    reference data module; its CLI default is 0.33 — sgmse/data_module.py:144,
    238).
    """

    factor: float = 0.15
    abs_exponent: float = 0.5

    # ---- complex-dtype interface (host/tests) ----

    def forward(self, spec):
        e = self.abs_exponent
        if e != 1:
            mag = jnp.abs(spec) ** e
            spec = mag * jnp.exp(1j * jnp.angle(spec)).astype(spec.dtype)
        return spec * self.factor

    def backward(self, spec):
        spec = spec / self.factor
        e = self.abs_exponent
        if e != 1:
            mag = jnp.abs(spec) ** (1.0 / e)
            spec = mag * jnp.exp(1j * jnp.angle(spec)).astype(spec.dtype)
        return spec

    # ---- packed-real interface (device path) ----

    def forward_packed(self, p):
        """packed (..., 2) -> packed (..., 2), |s|^e compression * factor.

        Implemented as a magnitude rescale (mag^(e-1) * factor), which avoids
        the angle/polar round-trip and is exact for s=0.
        """
        e = self.abs_exponent
        if e != 1:
            mag2 = cplx.abs2(p)
            # |s|^(e-1) with a safe zero (pushes 0 -> 0 like the reference)
            gain = jnp.where(mag2 > 0, mag2 ** ((e - 1.0) / 2.0), 0.0)
            p = p * gain[..., None]
        return p * self.factor

    def backward_packed(self, p):
        p = p / self.factor
        e = self.abs_exponent
        if e != 1:
            mag2 = cplx.abs2(p)
            gain = jnp.where(mag2 > 0, mag2 ** ((1.0 / e - 1.0) / 2.0), 0.0)
            p = p * gain[..., None]
        return p

    # aliases matching the reference method names
    spec_fwd = forward
    spec_back = backward


def pad_spec_amount(t: int, multiple: int = 64) -> int:
    """Number of time frames of zero-padding to reach a multiple."""
    return 0 if t % multiple == 0 else multiple - t % multiple


def pad_spec(Y, multiple: int = 64, axis: int = -1):
    """Zero-pad the time axis to a multiple of `multiple`.

    Required by the U-Net downsampling pyramid (the reference pads T to a
    multiple of 64, sgmse/util/other.py:102-109). For packed-real arrays
    (..., F, T, 2) pass axis=-2.
    """
    axis = axis % Y.ndim
    num_pad = pad_spec_amount(Y.shape[axis], multiple)
    if num_pad == 0:
        return Y
    pad_width = [(0, 0)] * Y.ndim
    pad_width[axis] = (0, num_pad)
    return jnp.pad(Y, pad_width)

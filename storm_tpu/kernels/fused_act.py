"""Fused bias + leaky-ReLU (≙ reference op/fused_act.py, CUDA
fused_bias_act_kernel.cu).

On TPU the XLA expression is already a single fused VPU loop; the Pallas
version exists for parity with the reference's native op bundle and as a
template for elementwise kernels. Both share one custom VJP implementing
the sign-mask backward of the CUDA op (op/fused_act.py:20-49).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fla_fwd_expr(x, bias, negative_slope, scale):
    h = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return scale * jnp.where(h >= 0, h, negative_slope * h)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu(x, bias, negative_slope: float = 0.2,
                     scale: float = math.sqrt(2.0)):
    """out = scale * leaky_relu(x + bias); bias broadcasts over the channel
    (last) axis. Matches FusedLeakyReLU semantics (op/fused_act.py:74-97,
    channels-last here)."""
    return _fla_fwd_expr(x, bias, negative_slope, scale)


def _fla_fwd(x, bias, negative_slope, scale):
    out = _fla_fwd_expr(x, bias, negative_slope, scale)
    mask = (x + bias.reshape((1,) * (x.ndim - 1) + (-1,))) >= 0
    return out, mask


def _fla_bwd(negative_slope, scale, mask, g):
    gx = scale * jnp.where(mask, g, negative_slope * g)
    gbias = gx.reshape(-1, gx.shape[-1]).sum(axis=0)
    return gx, gbias


fused_leaky_relu.defvjp(_fla_fwd, _fla_bwd)


def _fla_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    h = x_ref[:] + b_ref[:]
    o_ref[:] = scale * jnp.where(h >= 0, h, negative_slope * h)


def fused_leaky_relu_pallas(x, bias, negative_slope: float = 0.2,
                            scale: float = math.sqrt(2.0)):
    """Pallas elementwise kernel version; x (..., C), bias (C,)."""
    orig_shape = x.shape
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    b2 = jnp.broadcast_to(bias[None, :], x2.shape)
    out = pl.pallas_call(
        partial(_fla_kernel, negative_slope=negative_slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x2, b2)
    return out.reshape(orig_shape)

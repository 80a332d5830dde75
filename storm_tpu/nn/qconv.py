"""Quantization-capable 2-D convolution for int8 serving (TPU MXU).

The reference framework serves in fp32 on CUDA; there is no analogue of this
module upstream — it is a TPU-native performance feature. The v5e MXU runs
int8 x int8 -> int32 at twice the bf16 FLOP rate, and NCSN++ inference
(sgmse/model.py:720-780: 1 denoiser + N*(corrector_steps+1) score forwards
per utterance) is conv-bound, so post-training W8A8 quantization of the 3x3
and 1x1 convolutions raises the serving throughput ceiling without touching
training numerics.

`QuantizableConv` is a drop-in replacement for the subset of
`flax.linen.Conv` used by `conv3x3`/`conv1x1` (storm_tpu/nn/layers.py):
identical parameter layout ("kernel" HWIO + "bias") and bit-identical
default behavior, plus two opt-in modes driven by flax variable collections:

- **Calibration**: `module.apply(vars, x, mutable=["quant_stats"])` records
  the running max-abs of each conv input under `quant_stats/<path>/amax`.
- **Quantized serving**: `module.apply({"params": p, "quant": q}, x)` where
  `q` holds a per-conv `a_scale` (activation scale, from calibration) runs
  the conv as int8 x int8 -> int32 with per-output-channel weight scales
  computed from the fp32 kernel, then dequantizes into the compute dtype.
  Convs without an `a_scale` entry (e.g. the quality-critical input/output
  convs, which the calibration helper excludes) keep the bf16 path.

Accuracy note: activations feeding these convs are GroupNorm(+SiLU) outputs,
so a per-tensor activation scale is well-conditioned; weights get
per-output-channel scales (standard W8A8 PTQ practice).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as fnn
import jax
import jax.numpy as jnp

Dtype = Any
PaddingLike = Union[str, Sequence[Tuple[int, int]]]


class QuantizableConv(fnn.Module):
    """2-D NHWC convolution with an optional int8 serving path.

    Parameter layout and default-path numerics are identical to
    ``flax.linen.Conv(features, kernel_size, strides, padding, use_bias,
    kernel_init, bias_init, dtype, param_dtype)`` for 4-D channels-last
    inputs with shared weights and ``feature_group_count=1`` (the only
    configuration NCSN++ uses).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: PaddingLike = "SAME"
    use_bias: bool = True
    kernel_init: Callable = fnn.initializers.lecun_normal()
    bias_init: Callable = fnn.initializers.zeros
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @fnn.compact
    def __call__(self, x, x2=None):
        """Apply the conv to `x`, or — with `x2` — to the VIRTUAL channel
        concatenation [x, x2] without materializing it: the kernel is
        sliced along its input-channel axis and the two partial convs are
        summed (mathematically identical; parameter layout unchanged).
        Measured ~40% faster than conv(concat) at NCSN++ up-path serving
        shapes (scripts/perf_round3_probe.py)."""
        in_features = x.shape[-1] + (0 if x2 is None else x2.shape[-1])
        kernel = self.param(
            "kernel",
            self.kernel_init,
            tuple(self.kernel_size) + (in_features, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape[:-1] + (in_features,), kernel.shape, ("NHWC", "HWIO", "NHWC")
        )

        # calibration: record running max-abs of the conv input
        if self.is_mutable_collection("quant_stats") and not self.is_initializing():
            amax = self.variable(
                "quant_stats", "amax", lambda: jnp.zeros((), jnp.float32)
            )
            big = jnp.max(jnp.abs(x))
            if x2 is not None:  # amax of the virtual concat
                big = jnp.maximum(big, jnp.max(jnp.abs(x2)))
            amax.value = jnp.maximum(amax.value, big.astype(jnp.float32))

        parts = [x] if x2 is None else [x, x2]
        ksplit = (
            [kernel] if x2 is None
            else [kernel[:, :, : x.shape[-1], :], kernel[:, :, x.shape[-1]:, :]]
        )

        if self.has_variable("quant", "a_scale"):
            a_scale = self.get_variable("quant", "a_scale")
            return self._int8_conv(parts, kernel, bias, a_scale, dn)

        # default path: replicate fnn.Conv numerics exactly
        cdt = self.dtype if self.dtype is not None else jnp.result_type(
            x, kernel, *(() if bias is None else (bias,))
        )
        y = None
        for v, k in zip(parts, ksplit):
            yk = jax.lax.conv_general_dilated(
                v.astype(cdt),
                k.astype(cdt),
                window_strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=dn,
            )
            y = yk if y is None else y + yk
        if bias is not None:
            y = y + bias.astype(cdt).reshape((1,) * (y.ndim - 1) + (-1,))
        return y

    def _int8_conv(self, parts, kernel, bias, a_scale, dn):
        cdt = self.dtype if self.dtype is not None else parts[0].dtype
        # quantize activations with the calibrated per-tensor scale; the
        # round/clip runs in the compute dtype so it fuses into the producer
        # (GroupNorm/SiLU epilogue) instead of a separate fp32 pass
        inv = jnp.asarray(1.0, jnp.float32) / jnp.maximum(a_scale, 1e-20)
        # per-output-channel weight scales from the fp32 kernel (reduced
        # over the FULL input axis, so the split form is bit-identical to
        # the unsplit conv); loop-invariant weight-sized work — measured
        # hoisted out of the sampler scan by XLA (perf_round3_probe.py)
        kf = kernel.astype(jnp.float32)
        w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True)
        w_scale = jnp.maximum(w_amax, 1e-20) / 127.0
        wq = jnp.clip(jnp.round(kf / w_scale), -127.0, 127.0).astype(jnp.int8)
        # split input: quantize each part, then concatenate the INT8
        # tensors and run ONE full-depth conv — the int8 concat moves half
        # the bytes of a bf16 concat while keeping the MXU contraction
        # deep; measured faster than both the bf16-concat form and the
        # summed two-conv form at 27.8M up-path shapes
        # (scripts/perf_skipvariants_probe.py)
        xq = [
            jnp.clip(
                jnp.round(v.astype(cdt) * inv.astype(cdt)), -127.0, 127.0
            ).astype(jnp.int8)
            for v in parts
        ]
        xq = xq[0] if len(xq) == 1 else jnp.concatenate(xq, axis=-1)
        acc = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=tuple(self.strides),
            padding=self.padding,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        scale = (a_scale.astype(jnp.float32) * w_scale[0, 0, 0, :]).astype(cdt)
        y = acc.astype(cdt) * scale
        if bias is not None:
            y = y + bias.astype(cdt).reshape((1,) * (y.ndim - 1) + (-1,))
        return y

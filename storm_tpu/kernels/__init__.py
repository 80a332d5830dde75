"""Pallas TPU kernels (≙ reference L0 native CUDA ops,
sgmse/backbones/ncsnpp_utils/op/).

Each op ships two implementations:
- the XLA lowering (storm_tpu.nn.resample / plain jnp) — the default: XLA
  fuses and differentiates these natively and is already at speed on TPU;
- a Pallas kernel with custom VJP mirroring the CUDA kernels' structure
  (tiled FIR with halo DMA; fused elementwise bias+leaky-relu), kept for
  parity with the reference's native layer and as the substrate for
  further fusion work.

`upfirdn2d` is the production op (XLA lowering + reference transpose VJP);
`upfirdn2d_pallas` is the interpret-verified Pallas reference kernel (see
its module docstring for on-chip status on this backend).
"""
from .fused_act import fused_leaky_relu, fused_leaky_relu_pallas
from .upfirdn import upfirdn2d, upfirdn2d_pallas

__all__ = [
    "upfirdn2d",
    "upfirdn2d_pallas",
    "fused_leaky_relu",
    "fused_leaky_relu_pallas",
]

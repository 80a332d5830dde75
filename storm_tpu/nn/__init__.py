"""NN layer library (Flax, channels-last/NHWC) for storm_tpu backbones.

TPU-native re-design of the reference NCSN++ layer library
(sgmse/backbones/ncsnpp_utils/): all resampling ops are XLA dilated
convolutions (single fused HLO each) instead of custom CUDA kernels, and all
tensors are channels-last so the channel dim maps onto the 128-lane axis.
"""
from .init import ddpm_init, default_init
from .resample import (
    upfirdn2d,
    upsample_2d,
    downsample_2d,
    naive_upsample_2d,
    naive_downsample_2d,
    upsample_conv_2d,
    conv_downsample_2d,
)
from .layers import (
    get_act,
    GaussianFourierProjection,
    DiffusionStepEmbedding,
    ComplexLinear,
    FeatureMapDense,
    NIN,
    Combine,
    AttnBlockpp,
    Upsample,
    Downsample,
    ResnetBlockBigGANpp,
    ResnetBlockDDPMpp,
    group_norm,
)
from . import legacy

__all__ = [
    "ddpm_init",
    "default_init",
    "upfirdn2d",
    "upsample_2d",
    "downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "get_act",
    "GaussianFourierProjection",
    "DiffusionStepEmbedding",
    "NIN",
    "Combine",
    "AttnBlockpp",
    "Upsample",
    "Downsample",
    "ResnetBlockBigGANpp",
    "ResnetBlockDDPMpp",
    "group_norm",
]

"""Weight initializers.

The reference's `variance_scaling`/`default_init`
(sgmse/backbones/ncsnpp_utils/layers.py:54-91) is itself "ported from JAX" —
here it simply IS `jax.nn.initializers.variance_scaling` with fan_avg/uniform.
`init_scale=0` is clamped to 1e-10 exactly like the reference (layers.py:88).
"""
from __future__ import annotations

import jax


def ddpm_init(scale: float = 1.0):
    """DDPM initialization: fan_avg uniform variance scaling.

    Matches `default_init` in the reference (ncsnpp_utils/layers.py:87-91).
    Works for both conv kernels (HWIO: fan axes inferred) and dense kernels.
    """
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(
        scale, mode="fan_avg", distribution="uniform"
    )


# Alias with the reference's name for discoverability.
default_init = ddpm_init

"""Compatibility layer: PyTorch (reference) checkpoint conversion.

Enables numerics-parity evaluation against the reference's released
Lightning checkpoints (README.md:17-23) without porting any torch code:
only the *naming/layout* of parameters is translated.
"""
from .torch_ckpt import (
    convert_backbone_state_dict,
    convert_lightning_checkpoint,
    flax_to_torch_backbone,
    load_reference_checkpoint,
)

__all__ = [
    "convert_backbone_state_dict",
    "convert_lightning_checkpoint",
    "flax_to_torch_backbone",
    "load_reference_checkpoint",
]

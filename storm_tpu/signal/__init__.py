from . import cplx
from .stft import (
    STFTConfig,
    hann_window,
    get_window,
    stft,
    istft,
    stft_real,
    istft_real,
)
from .transforms import SpecTransform, pad_spec, pad_spec_amount

__all__ = [
    "cplx",
    "STFTConfig",
    "hann_window",
    "get_window",
    "stft",
    "istft",
    "stft_real",
    "istft_real",
    "SpecTransform",
    "pad_spec",
    "pad_spec_amount",
]

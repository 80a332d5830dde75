"""Data layer (≙ reference L5 datasets, sgmse/data_module.py).

Host side: wav IO, crop/pad, normalization, threaded prefetch.
Device side: batched STFT + compression (storm_tpu.signal) inside jit.
"""
from .audio import load_wav, save_wav
from .datamodule import SpecsAndTranscriptionsDataModule, SpecsDataModule
from .datasets import Specs, SpecsAndTranscriptions, paired_files
from .loader import DataLoader

__all__ = [
    "load_wav",
    "save_wav",
    "Specs",
    "SpecsAndTranscriptions",
    "paired_files",
    "DataLoader",
    "SpecsDataModule",
    "SpecsAndTranscriptionsDataModule",
]

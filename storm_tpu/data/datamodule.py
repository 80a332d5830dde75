"""SpecsDataModule: dataset + signal-transform configuration bundle.

Mirrors the reference data module's public surface
(sgmse/data_module.py:140-265): owns the STFT config, the amplitude
compression (`spec_fwd`/`spec_back`), the train/valid/test datasets, and the
dataloaders. Device-side transforms delegate to `storm_tpu.signal`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from ..signal.stft import STFTConfig, istft_real, stft_real
from ..signal.transforms import SpecTransform
from .datasets import Specs, SpecsAndTranscriptions
from .loader import DataLoader


@dataclasses.dataclass
class SpecsDataModule:
    base_dir: str = ""
    format: str = "wsj0"
    spatial_channels: int = 1
    batch_size: int = 8
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    window: str = "hann"
    num_workers: int = 8
    dummy: bool = False
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    return_time: bool = False
    seed: int = 10
    # multi-host data parallelism: (process_index, process_count); each
    # process loads only its row-slice of every global batch (train.py
    # sets this from jax.process_index/count under jax.distributed)
    shard: tuple = (0, 1)

    def __post_init__(self):
        self.train_set = None
        self.valid_set = None
        self.test_set = None
        self._train_loader = None

    @property
    def stft_config(self) -> STFTConfig:
        return STFTConfig(
            n_fft=self.n_fft, hop_length=self.hop_length, window=self.window
        )

    @property
    def transform(self) -> SpecTransform:
        return SpecTransform(
            factor=self.spec_factor, abs_exponent=self.spec_abs_exponent
        )

    # device-side transforms (packed-real)
    def stft(self, sig):
        return stft_real(sig, self.stft_config)

    def istft(self, spec, length: Optional[int] = None):
        return istft_real(spec, self.stft_config, length=length)

    def spec_fwd(self, spec):
        return self.transform.forward_packed(spec)

    def spec_back(self, spec):
        return self.transform.backward_packed(spec)

    def setup(self, stage: Optional[str] = None):
        import numpy as np

        kwargs = dict(
            num_frames=self.num_frames,
            format=self.format,
            hop_length=self.hop_length,
            spatial_channels=self.spatial_channels,
            dummy=self.dummy,
        )
        if stage in ("fit", None):
            self.train_set = Specs(
                self.base_dir, "train", shuffle_spec=True,
                rng=np.random.default_rng(self.seed), **kwargs
            )
            self.valid_set = Specs(
                self.base_dir, "valid", shuffle_spec=False, **kwargs
            )
        if stage in ("test", None):
            self.test_set = Specs(
                self.base_dir, "test", shuffle_spec=False, **kwargs
            )

    def train_dataloader(self) -> DataLoader:
        # one persistent loader: its RNG advances across epochs, so each
        # epoch gets a fresh shuffle permutation (torch DataLoader behavior)
        if self._train_loader is None:
            self._train_loader = DataLoader(
                self.train_set, batch_size=self.batch_size, shuffle=True,
                num_workers=self.num_workers, seed=self.seed,
                shard=self.shard,
            )
        return self._train_loader

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.valid_set, batch_size=self.batch_size, shuffle=False,
            num_workers=self.num_workers, drop_last=False,
            shard=self.shard,
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(
            self.test_set, batch_size=self.batch_size, shuffle=False,
            num_workers=self.num_workers, drop_last=False,
        )


@dataclasses.dataclass
class SpecsAndTranscriptionsDataModule(SpecsDataModule):
    """Test-only module yielding transcripts too (data_module.py:313-330)."""

    def setup(self, stage: Optional[str] = None):
        if stage in ("fit",):
            raise NotImplementedError
        self.test_set = SpecsAndTranscriptions(
            self.base_dir, "test",
            num_frames=self.num_frames, hop_length=self.hop_length,
            dummy=self.dummy,
        )

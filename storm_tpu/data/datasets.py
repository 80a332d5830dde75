"""Paired clean/noisy speech datasets (host side).

Re-design of the reference `Specs` dataset (sgmse/data_module.py:27-134).
Host work is deliberately minimal for TPU training: load wavs, crop/pad to a
fixed sample count, normalize by the noisy max — and return float32
WAVEFORM pairs. The STFT + amplitude compression run **on device** inside
the jitted train step (batched MXU matmuls), unlike the reference which
does per-item `torch.stft` in CPU DataLoader workers (its host hot loop,
SURVEY.md §3.1).

All reference file-format conventions are preserved (wsj0/vctk/voicebank/
dns/reverb_wsj0/timit, sgmse/data_module.py:38-59), as are the crop/pad
semantics: target_len=(num_frames-1)*hop, random crop for training
(shuffle_spec), center crop for validation, center zero-pad for short files,
and normalization of both signals by max|y| of the full noisy file.
"""
from __future__ import annotations

import os
from glob import glob
from os.path import join
from typing import Optional

import numpy as np

from .audio import load_wav

_SUBSET_DIRS = {"train": "tr", "valid": "cv", "test": "tt"}


def paired_files(data_dir: str, subset: str, format: str):
    """Clean/noisy path pairs per dataset format (data_module.py:38-59)."""
    if format in ("wsj0", "vctk"):
        sub = _SUBSET_DIRS[subset]
        clean = sorted(glob(join(data_dir, sub) + "/clean/*.wav"))
        noisy = sorted(glob(join(data_dir, sub) + "/noisy/*.wav"))
    elif format == "voicebank":
        clean = sorted(glob(join(data_dir, subset) + "/clean/*.wav"))
        noisy = sorted(glob(join(data_dir, subset) + "/noisy/*.wav"))
    elif format == "dns":
        noisy = sorted(glob(join(data_dir, subset) + "/noisy/*.wav"))
        clean_dir = join(data_dir, subset) + "/clean/"
        clean = [
            clean_dir
            + "clean_fileid_"
            + noisy_file.split("/")[-1].split("_fileid_")[-1]
            for noisy_file in noisy
        ]
    elif format == "reverb_wsj0":
        sub = _SUBSET_DIRS[subset]
        clean = sorted(glob(join(data_dir, sub) + "/anechoic/*.wav"))
        noisy = sorted(glob(join(data_dir, sub) + "/reverb/*.wav"))
    elif format == "timit":
        sub = _SUBSET_DIRS[subset]
        clean = sorted(glob(join(data_dir, "audio", sub) + "/clean/*.wav"))
        noisy = sorted(glob(join(data_dir, "audio", sub) + "/noisy/*.wav"))
    else:
        raise ValueError(f"Unknown dataset format {format!r}")
    return clean, noisy


class Specs:
    """Paired clean/noisy dataset yielding fixed-length waveform pairs.

    __getitem__(i) -> (x, y): float32 (spatial_channels, target_len).
    __getitem__(i, raw=True) -> full-length unnormalized pair (for eval,
    data_module.py:89-90).
    """

    def __init__(
        self,
        data_dir: str,
        subset: str,
        dummy: bool = False,
        shuffle_spec: bool = False,
        num_frames: int = 256,
        format: str = "wsj0",
        normalize_audio: bool = True,
        hop_length: int = 128,
        spatial_channels: int = 1,
        rng: Optional[np.random.Generator] = None,
        **ignored_kwargs,
    ):
        self.data_dir = data_dir
        self.subset = subset
        self.format = format
        self.spatial_channels = spatial_channels
        self.clean_files, self.noisy_files = paired_files(
            data_dir, subset, format
        )
        self.dummy = dummy
        self.num_frames = num_frames
        self.shuffle_spec = shuffle_spec
        self.normalize_audio = normalize_audio
        self.hop_length = hop_length
        # np.random.Generator is not thread-safe and __getitem__ runs in a
        # thread pool: derive a fresh per-call generator from a base seed,
        # the item index and the current epoch. Crops are then a pure
        # function of (seed, i, epoch) — any process cropping item i in
        # epoch e gets the same window, so multi-host shards reproduce the
        # single-process batch stream exactly and resume replays crops
        self._base_seed = (
            int(rng.integers(2**31)) if rng is not None else 10
        )
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Advance the crop-randomness epoch (forwarded by DataLoader)."""
        self._epoch = int(epoch)

    def open_hdf5(self):
        """Open the newest metadata JSON + HDF5 archive in `data_dir`
        (≙ `Specs._open_hdf5`, sgmse/data_module.py:71-73).

        The reference defines this but never calls it, and it would crash
        there (no `self.data_dir` on its class and `json` unimported in
        that scope); provided here as a *working* equivalent: some
        preprocessed corpora ship one `.hdf5` of arrays plus a `.json` of
        per-utterance metadata next to the wav tree. Returns
        (meta_data dict, h5py.File) and caches them on the instance.
        """
        import json as _json

        import h5py

        jsons = sorted(glob(join(self.data_dir, "*.json")))
        h5s = sorted(glob(join(self.data_dir, "*.hdf5")))
        if not jsons or not h5s:
            raise FileNotFoundError(
                f"no *.json + *.hdf5 pair in {self.data_dir}"
            )
        with open(jsons[-1]) as f:
            self.meta_data = _json.load(f)
        self.prep_file = h5py.File(h5s[-1], "r")
        return self.meta_data, self.prep_file

    @property
    def target_len(self) -> int:
        # center=True formula (data_module.py:95)
        return (self.num_frames - 1) * self.hop_length

    def __getitem__(self, i: int, raw: bool = False):
        x, _sr = load_wav(self.clean_files[i])
        y, _sr = load_wav(self.noisy_files[i])

        min_len = min(x.shape[-1], y.shape[-1])
        x, y = x[..., :min_len], y[..., :min_len]

        if x.ndim == 2 and self.spatial_channels == 1:
            x, y = x[:1], y[:1]
        assert self.spatial_channels <= x.shape[0], (
            f"You asked too many channels ({self.spatial_channels}) "
            f"for the given dataset ({x.shape[0]})"
        )
        x, y = x[: self.spatial_channels], y[: self.spatial_channels]

        if raw:
            return x, y

        normfac = np.abs(y).max()

        target_len = self.target_len
        current_len = x.shape[-1]
        pad = max(target_len - current_len, 0)
        if pad == 0:
            if self.shuffle_spec:
                rng = np.random.default_rng(
                    (self._base_seed, i, self._epoch)
                )
                start = int(rng.uniform(0, current_len - target_len))
            else:
                start = int((current_len - target_len) / 2)
            x = x[..., start : start + target_len]
            y = y[..., start : start + target_len]
        else:
            widths = [(0, 0)] * (x.ndim - 1) + [(pad // 2, pad // 2 + pad % 2)]
            x = np.pad(x, widths)
            y = np.pad(y, widths)

        if self.normalize_audio:
            # normalize both by the noisy max so clean signal power matches
            x = x / normfac
            y = y / normfac

        return x.astype(np.float32), y.astype(np.float32)

    def __len__(self):
        if self.dummy:
            return int(len(self.clean_files) / 10)
        if self.format == "vctk":
            return len(self.clean_files) // 2
        return len(self.clean_files)


class SpecsAndTranscriptions(Specs):
    """TIMIT variant also returning transcript text (test-only WER eval,
    data_module.py:280-310)."""

    def __init__(self, data_dir, subset, **kwargs):
        super().__init__(data_dir, subset, format="timit", **kwargs)
        sub = _SUBSET_DIRS[subset]
        self.transcriptions = sorted(
            glob(join(data_dir, "transcriptions", sub) + "/*.txt")
        )

    def __getitem__(self, i, raw=False):
        x, y = super().__getitem__(i, raw=raw)
        with open(self.transcriptions[i], "r") as f:
            transcription = f.read()
        # TIMIT transcripts start with two sample indices — strip them
        transcription = " ".join(transcription.split(" ")[2:])
        return x, y, transcription

    def __len__(self):
        if self.dummy:
            return int(len(self.clean_files) / 10)
        return len(self.clean_files)

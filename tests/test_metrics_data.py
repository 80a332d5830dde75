"""Tests for metrics (SI-SDR, STOI/ESTOI, WER, ...) and the data layer."""
import os

import numpy as np
import pytest

from storm_tpu.utils.metrics import (
    Method,
    align,
    energy_ratios,
    hp_filter,
    mean_conf_int,
    mean_std,
    si_sdr,
    snr_dB,
    snr_scale_factor,
    wer,
)
from storm_tpu.utils.stoi import stoi


def _speechlike(n=32000, seed=0, sr=16000):
    """Syllable-like signal: short bursts with changing spectra, so
    third-octave band trajectories vary over time like real speech."""
    rng = np.random.default_rng(seed)
    out = np.zeros(n)
    pos = 0
    while pos < n:
        seg = int(rng.integers(1200, 3200))  # 75-200 ms "syllables"
        t = np.arange(seg) / sr
        f0 = rng.uniform(150, 3000)
        f1 = rng.uniform(150, 3000)
        freq = np.linspace(f0, f1, seg)
        phase = 2 * np.pi * np.cumsum(freq) / sr
        env = np.hanning(seg) * rng.uniform(0.3, 1.0)
        burst = env * (
            np.sin(phase) + 0.4 * np.sin(2 * phase + rng.uniform(0, 6.28))
        )
        end = min(pos + seg, n)
        out[pos:end] += burst[: end - pos]
        pos += seg
    return (out / np.abs(out).max() * 0.7).astype(np.float64)


def test_si_sdr_basics():
    s = _speechlike()
    assert si_sdr(s, s) > 60
    noisy = s + 0.1 * np.random.default_rng(1).standard_normal(len(s))
    v = si_sdr(s, noisy)
    assert 0 < v < 30
    # scale invariance
    assert abs(si_sdr(s, 3.0 * noisy) - v) < 1e-6


def test_energy_ratios():
    s = _speechlike()
    n = 0.1 * np.random.default_rng(2).standard_normal(len(s))
    sdr, sir, sar = energy_ratios(s + n, s, n)
    assert sir < 200 and np.isfinite([sdr, sir, sar]).all()
    # estimate == clean + noise: artifacts ~ 0 -> SAR >> SIR
    assert sar > sir


def test_stoi_estoi_sanity():
    s = _speechlike(48000)
    rng = np.random.default_rng(3)
    for extended in (False, True):
        clean_score = stoi(s, s, 16000, extended=extended)
        assert clean_score > 0.98, f"identity {clean_score}"
        weak = stoi(s, s + 0.3 * rng.standard_normal(len(s)), 16000, extended=extended)
        strong = stoi(s, s + 3.0 * rng.standard_normal(len(s)), 16000, extended=extended)
        assert clean_score > weak > strong, (clean_score, weak, strong)


def test_wer():
    assert wer("a b c".split(), "a b c".split()) == 0.0
    assert wer("a b c".split(), "a x c".split()) == pytest.approx(1 / 3)
    assert wer("a b".split(), "a b c".split()) == pytest.approx(1 / 2)


def test_misc_metrics():
    s = _speechlike()
    n = 0.1 * np.random.default_rng(4).standard_normal(len(s))
    assert 0 < snr_dB(s, n) < 30
    fac = snr_scale_factor(s, n, 10.0)
    assert snr_dB(s, fac * n) == pytest.approx(10.0, abs=0.5)
    # align recovers a circular shift
    shifted = np.roll(s, 100)
    realigned = align(shifted, s)
    np.testing.assert_allclose(realigned, s)
    hp = hp_filter(s)
    assert hp.shape == s.shape
    m, h = mean_conf_int([1.0, 2.0, 3.0])
    assert m == pytest.approx(2.0)
    mm, ss_ = mean_std(np.array([1.0, np.nan, 3.0]))
    assert mm == pytest.approx(2.0)
    meth = Method("x", "/tmp", ["pesq"])
    meth.append("pesq", 3.0)
    meth.append("pesq", 4.0)
    assert meth.get_mean_ci("pesq")[0] == pytest.approx(3.5)


@pytest.fixture
def toy_dataset(tmp_path):
    """wsj0-format paired dataset with a few wav files."""
    from storm_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    for subset in ("tr", "cv"):
        for kind in ("clean", "noisy"):
            os.makedirs(tmp_path / subset / kind)
        for i in range(4):
            n = rng.integers(20000, 50000)
            x = 0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
            noise = 0.05 * rng.standard_normal(n)
            save_wav(tmp_path / subset / "clean" / f"u{i}.wav", x)
            save_wav(tmp_path / subset / "noisy" / f"u{i}.wav", x + noise)
    return str(tmp_path)


def test_specs_dataset_and_loader(toy_dataset):
    from storm_tpu.data import DataLoader, Specs

    ds = Specs(toy_dataset, "train", shuffle_spec=True, num_frames=64,
               format="wsj0", hop_length=128)
    assert len(ds) == 4
    x, y = ds[0]
    assert x.shape == y.shape == (1, 63 * 128)
    assert np.abs(y).max() <= 1.0 + 1e-6  # normalized by noisy max
    xr, yr = ds.__getitem__(1, raw=True)
    assert xr.shape[-1] > 63 * 128  # raw = full length

    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    bx, by = batches[0]
    assert bx.shape == (2, 63 * 128)  # channel squeezed
    assert bx.dtype == np.float32


def test_datamodule(toy_dataset):
    from storm_tpu.data import SpecsDataModule

    dm = SpecsDataModule(base_dir=toy_dataset, format="wsj0", batch_size=2,
                         num_frames=64, num_workers=1)
    dm.setup("fit")
    assert len(dm.train_set) == 4 and len(dm.valid_set) == 4
    xb, yb = next(iter(dm.train_dataloader()))
    assert xb.shape == (2, 63 * 128)
    # device-side transforms roundtrip
    import jax.numpy as jnp

    spec = dm.spec_fwd(dm.stft(jnp.asarray(xb)))
    wav = dm.istft(dm.spec_back(spec), length=xb.shape[-1])
    np.testing.assert_allclose(np.asarray(wav), xb, atol=1e-3)


def test_pesq_gated():
    from storm_tpu.utils.metrics import pesq_wb

    s = _speechlike()
    v = pesq_wb(16000, s, s)
    # package absent in this image -> NaN; present -> ~4.5
    assert np.isnan(v) or v > 4.0


def test_paired_files_all_formats(tmp_path):
    """Directory-layout conventions for every dataset format
    (sgmse/data_module.py:38-59)."""
    from storm_tpu.data import paired_files
    from storm_tpu.data.audio import save_wav
    import numpy as np

    wav = 0.1 * np.sin(np.arange(4000) / 5.0)

    def mk(*parts, name="a.wav"):
        d = tmp_path.joinpath(*parts)
        d.mkdir(parents=True, exist_ok=True)
        save_wav(d / name, wav)

    # wsj0/vctk: tr|cv|tt / clean|noisy
    mk("w", "tr", "clean"); mk("w", "tr", "noisy")
    c, n = paired_files(str(tmp_path / "w"), "train", "wsj0")
    assert len(c) == len(n) == 1
    c, n = paired_files(str(tmp_path / "w"), "train", "vctk")
    assert len(c) == 1

    # voicebank: train|valid|test / clean|noisy
    mk("vb", "valid", "clean"); mk("vb", "valid", "noisy")
    c, n = paired_files(str(tmp_path / "vb"), "valid", "voicebank")
    assert len(c) == len(n) == 1

    # dns: noisy files named *_fileid_N, clean clean_fileid_N
    mk("dns", "test", "noisy", name="book_fileid_7.wav")
    mk("dns", "test", "clean", name="clean_fileid_7.wav")
    c, n = paired_files(str(tmp_path / "dns"), "test", "dns")
    assert len(n) == 1 and c[0].endswith("clean_fileid_7.wav")

    # reverb_wsj0: anechoic|reverb
    mk("rv", "cv", "anechoic"); mk("rv", "cv", "reverb")
    c, n = paired_files(str(tmp_path / "rv"), "valid", "reverb_wsj0")
    assert len(c) == len(n) == 1

    # timit: audio/tr / clean|noisy
    mk("tm", "audio", "tt", "clean"); mk("tm", "audio", "tt", "noisy")
    c, n = paired_files(str(tmp_path / "tm"), "test", "timit")
    assert len(c) == len(n) == 1

    import pytest

    with pytest.raises(ValueError):
        paired_files(str(tmp_path), "train", "nope")


def test_pesq_gated_with_stub_module():
    """A bare ModuleType `pesq` stub (installed by ref_loader so reference
    imports resolve) must read as 'absent' — NaN, not the stub's
    RuntimeError. Regression: test-order-dependent failure when reference
    parity tests ran before this file."""
    import sys
    import types

    from storm_tpu.utils.metrics import pesq_wb

    def _unavailable(*_a, **_k):
        raise RuntimeError("stubbed module — not available in this image")

    saved = sys.modules.get("pesq")
    try:
        stub = types.ModuleType("pesq")
        stub.pesq = _unavailable
        sys.modules["pesq"] = stub
        s = _speechlike()
        assert np.isnan(pesq_wb(16000, s, s))
    finally:
        if saved is None:
            sys.modules.pop("pesq", None)
        else:
            sys.modules["pesq"] = saved


def test_specs_open_hdf5(toy_dataset):
    """Working equivalent of the reference's dead `_open_hdf5`
    (sgmse/data_module.py:71-73): newest *.json + *.hdf5 pair in data_dir."""
    import json

    import h5py

    from storm_tpu.data import Specs

    ds = Specs(toy_dataset, "train", format="wsj0", hop_length=128)
    with pytest.raises(FileNotFoundError):
        ds.open_hdf5()

    with open(os.path.join(toy_dataset, "meta.json"), "w") as f:
        json.dump({"u0": {"snr": 5.0}}, f)
    with h5py.File(os.path.join(toy_dataset, "prep.hdf5"), "w") as f:
        f.create_dataset("u0", data=np.zeros(16, np.float32))

    meta, h5 = ds.open_hdf5()
    assert meta["u0"]["snr"] == 5.0
    assert ds.prep_file["u0"].shape == (16,)
    h5.close()

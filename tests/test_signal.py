"""Signal-layer tests: STFT/iSTFT golden parity vs torch + round trips.

The reference defines its signal semantics via torch.stft/istft
(sgmse/data_module.py:196-223); we check our pure-JAX implementation against
torch directly (CPU) and verify the compression transform inverts.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from storm_tpu.signal import (
    STFTConfig,
    SpecTransform,
    get_window,
    istft,
    pad_spec,
    stft,
)

torch = pytest.importorskip("torch")


def _rand_wav(n, seed=0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(n)).astype(np.float32)


@pytest.mark.parametrize("num_samples", [32640, 16000, 12345])
def test_stft_matches_torch(num_samples):
    cfg = STFTConfig()
    x = _rand_wav(num_samples)
    ours = np.asarray(stft(jnp.asarray(x), cfg))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft, periodic=True),
        center=True,
        return_complex=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("length", [32640, 12345])
def test_istft_matches_torch(length):
    cfg = STFTConfig()
    x = _rand_wav(length, seed=1)
    X = torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft, periodic=True),
        center=True,
        return_complex=True,
    )
    ref = torch.istft(
        X,
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft, periodic=True),
        center=True,
        length=length,
    ).numpy()
    ours = np.asarray(istft(jnp.asarray(X.numpy()), cfg, length=length))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_roundtrip_batched():
    cfg = STFTConfig()
    x = np.stack([_rand_wav(32640, s) for s in range(3)])[:, None, :]  # B,D,T
    X = stft(jnp.asarray(x), cfg)
    assert X.shape == (3, 1, 256, 256)
    y = istft(X, cfg, length=32640)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_sqrthann_window():
    w = np.asarray(get_window("sqrthann", 510))
    ref = torch.sqrt(torch.hann_window(510, periodic=True)).numpy()
    np.testing.assert_allclose(w, ref, atol=1e-6)


def test_spec_transform_roundtrip():
    rng = np.random.default_rng(3)
    spec = (
        rng.standard_normal((2, 16, 16)) + 1j * rng.standard_normal((2, 16, 16))
    ).astype(np.complex64)
    tr = SpecTransform(factor=0.33, abs_exponent=0.5)
    out = np.asarray(tr.backward(tr.forward(jnp.asarray(spec))))
    np.testing.assert_allclose(out, spec, atol=1e-5)


def test_spec_transform_matches_torch_semantics():
    rng = np.random.default_rng(4)
    spec = (
        rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    ).astype(np.complex64)
    tr = SpecTransform(factor=0.15, abs_exponent=0.5)
    ours = np.asarray(tr.forward(jnp.asarray(spec)))
    st = torch.from_numpy(spec)
    ref = (st.abs() ** 0.5 * torch.exp(1j * st.angle()) * 0.15).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_pad_spec():
    Y = jnp.ones((1, 1, 256, 100), dtype=jnp.complex64)
    P = pad_spec(Y)
    assert P.shape[-1] == 128
    assert np.all(np.asarray(P[..., 100:]) == 0)
    Y2 = jnp.ones((1, 1, 256, 128))
    assert pad_spec(Y2).shape[-1] == 128


def test_stft_real_packed_matches_complex():
    from storm_tpu.signal import cplx, istft_real, stft_real

    cfg = STFTConfig()
    x = _rand_wav(16000, seed=7)
    Xp = stft_real(jnp.asarray(x), cfg)
    assert Xp.shape == (256, cfg.num_frames(16000), 2)
    Xc = np.asarray(cplx.to_complex(Xp))
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=510,
        hop_length=128,
        window=torch.hann_window(510, periodic=True),
        center=True,
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(Xc, ref, atol=2e-5, rtol=1e-4)
    y = istft_real(Xp, cfg, length=16000)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-5)


def test_spec_transform_packed_matches_complex():
    from storm_tpu.signal import cplx

    rng = np.random.default_rng(5)
    spec = (
        rng.standard_normal((4, 8)) + 1j * rng.standard_normal((4, 8))
    ).astype(np.complex64)
    tr = SpecTransform(factor=0.33, abs_exponent=0.5)
    want = np.asarray(tr.forward(jnp.asarray(spec)))
    got = np.asarray(
        cplx.to_complex(tr.forward_packed(cplx.to_packed(jnp.asarray(spec))))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    back = np.asarray(
        cplx.to_complex(
            tr.backward_packed(tr.forward_packed(cplx.to_packed(jnp.asarray(spec))))
        )
    )
    np.testing.assert_allclose(back, spec, atol=1e-5)


def test_complex_normal_variance():
    import jax

    from storm_tpu.signal import cplx

    z = cplx.complex_normal(jax.random.PRNGKey(0), (200, 200))
    # Re/Im each N(0, 1/2) -> |z|^2 has mean 1
    assert abs(float(cplx.abs2(z).mean()) - 1.0) < 0.02
    assert abs(float(z[..., 0].var()) - 0.5) < 0.02

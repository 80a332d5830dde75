"""FULL-SIZE parity closure (VERDICT round 2, Missing #1 / Weak #5).

The tiny-config tests in test_reference_parity.py validate every code path;
these slow tests additionally exercise the production 27.8M NCSN++ scale —
the 4-level 256-bin config whose sampler-loop interactions (progressive
pyramids at 4 resolutions, attention at the 32-bin bottleneck) are only
covered by forward goldens otherwise:

1. StoRM `_step` loss AND gradient parity at the default 27.8M config
   (sgmse/model.py:560-595 vs models/storm.py loss_given_tz).
2. N=4 PC `enhance` step-for-step at 256x256 on a shared noise stream
   (sgmse/model.py:720-767).
3. Converter dry-run: a synthesized full-size Lightning .ckpt (both nets +
   torch-ema shadows) through `python -m storm_tpu.compat.convert` and
   then `enhancement.py` (README.md:17-23 checkpoint-consumption contract).
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import REFERENCE_ROOT, load_reference_model_module

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE_ROOT),
        reason="reference checkout not available",
    ),
    pytest.mark.slow,
]

from storm_tpu.compat import convert_backbone_state_dict
from storm_tpu.compat.torch_ckpt import flax_to_torch_backbone
from storm_tpu.models.storm import StochasticRegenerationModel as MyStoRM

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SDE_KW = dict(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=1000)


class _patched_rand:
    def __init__(self, u, z):
        self.u, self.z = u, z

    def __enter__(self):
        self._rand, self._rl = torch.rand, torch.randn_like
        torch.rand = lambda *a, **k: self.u.clone()
        torch.randn_like = lambda *a, **k: self.z.clone()

    def __exit__(self, *exc):
        torch.rand, torch.randn_like = self._rand, self._rl


def _pack(tc: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(np.stack([tc.real.numpy(), tc.imag.numpy()], axis=-1))


@pytest.fixture(scope="module")
def fullsize_pair():
    """(reference 27.8M+27.8M StoRM, converted params, my model) at the
    DEFAULT production config — no size-reducing overrides."""
    ref_model_mod = load_reference_model_module()
    import sgmse.data_module as ref_dm_mod

    torch.manual_seed(11)
    m = ref_model_mod.StochasticRegenerationModel(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        data_module_cls=ref_dm_mod.SpecsDataModule,  # enhance needs stft
        loss_type_denoiser="mse",
        loss_type_score="mse", condition="both", **_SDE_KW,
    )
    m.eval(no_ema=True)
    n_params = sum(p.numel() for p in m.score_net.parameters())
    assert 27e6 < n_params < 29e6, f"not the 27.8M config: {n_params}"
    sd = m.state_dict()
    params = {
        "denoiser": convert_backbone_state_dict(sd, prefix="denoiser_net."),
        "score": convert_backbone_state_dict(sd, prefix="score_net."),
    }
    my = MyStoRM.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        condition="both", loss_type_denoiser="mse", loss_type_score="mse",
        **_SDE_KW,
    )
    return m, jax.tree.map(jnp.asarray, params), my


def _fullsize_batch(B=1, F=256, T=64, seed=3):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g) * 0.3
    y = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g) * 0.3
    u = torch.tensor([0.55])
    z = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g)
    return x, y, u, z


def test_fullsize_storm_step_loss_and_gradients(fullsize_pair):
    m, params, my = fullsize_pair
    m.train(True, no_ema=True)
    x, y, u, z = _fullsize_batch()
    with _patched_rand(u, z):
        loss_t, ls_t, ld_t = m._step((x, y), 0)
        loss_t.backward()
    t_grads = {k: p.grad.detach().numpy()
               for k, p in m.named_parameters() if p.grad is not None}
    m.zero_grad(set_to_none=True)
    m.eval(no_ema=True)

    t_used = jnp.asarray((u * (1.0 - 0.03) + 0.03).numpy())
    batch = (_pack(x)[:, 0], _pack(y)[:, 0])
    zj = _pack(z)[:, 0]

    (loss_j, aux), grads = jax.value_and_grad(
        lambda p: my.loss_given_tz(p, batch, t_used, zj), has_aux=True
    )(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
    np.testing.assert_allclose(float(aux["loss_score"]), float(ls_t),
                               rtol=1e-4)
    np.testing.assert_allclose(float(aux["loss_denoiser"]), float(ld_t),
                               rtol=1e-4)

    grads_np = jax.tree.map(np.asarray, grads)
    j_grads = {}
    j_grads.update(flax_to_torch_backbone(grads_np["denoiser"],
                                          prefix="denoiser_net."))
    j_grads.update(flax_to_torch_backbone(grads_np["score"],
                                          prefix="score_net."))
    assert len(t_grads) > 300  # both 27.8M nets contribute
    for k, tv in t_grads.items():
        jv = j_grads[k]
        np.testing.assert_allclose(
            jv, tv, atol=1e-5 + 2e-4 * np.abs(tv).max(), err_msg=k
        )


def test_fullsize_storm_enhance_pc_256x256(fullsize_pair):
    """Step-for-step PC parity at the production spatial size: 2.04 s of
    audio = 256 STFT frames (the training-crop size, data_module.py:234),
    so the U-Net runs at the full 256x256 the paper configuration uses."""
    from storm_tpu.models.base import normalize_wav, prepare_spec
    from storm_tpu.signal import cplx

    m, params, my = fullsize_pair

    rng = np.random.default_rng(1)
    T_wav = 255 * 128 + 1  # exactly 256 center-padded frames
    y_np = (0.3 * np.sin(2 * np.pi * 250 * np.arange(T_wav) / 16000)
            + 0.05 * rng.standard_normal(T_wav)).astype(np.float32)
    N = 4
    key = jax.random.PRNGKey(7)

    enh = my.make_enhance(sampler_type="pc", N=N, corrector="none")
    x_mine = np.asarray(enh(params, jnp.asarray(y_np)[None], key)[0])[0]

    # replay my sampler's key schedule (pc_sample: key,kprior = split;
    # per-step k,kc,kp = split(k,3)) to feed the reference the same noise
    y_n, _ = normalize_wav(jnp.asarray(y_np)[None])
    Y, _tf = prepare_spec(y_n, my.stft_config, my.transform)
    assert Y.shape[-2] == 256, Y.shape  # padded frames
    spec_shape = Y.shape[:-1]
    k2, kprior = jax.random.split(key)
    noises = [np.asarray(cplx.complex_normal(kprior, spec_shape))]
    k = k2
    for _ in range(N):
        k, _kc, kp = jax.random.split(k, 3)
        noises.append(np.asarray(cplx.complex_normal(kp, spec_shape)))
    queue = [
        torch.complex(torch.from_numpy(zz[..., 0].copy()),
                      torch.from_numpy(zz[..., 1].copy()))
        for zz in noises
    ]

    orig_cuda, orig_rl = torch.Tensor.cuda, torch.randn_like
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.randn_like = lambda *a, **k: queue.pop(0).clone()
    try:
        with torch.no_grad():
            x_ref = np.squeeze(np.asarray(m.enhance(
                torch.from_numpy(y_np.copy())[None], sampler_type="pc",
                predictor="reverse_diffusion", corrector="none", N=N,
            )))
    finally:
        torch.Tensor.cuda, torch.randn_like = orig_cuda, orig_rl
    assert not queue, f"{len(queue)} unused noises — step counts diverged"

    assert x_mine.shape == x_ref.shape == (T_wav,)
    np.testing.assert_allclose(
        x_mine, x_ref, atol=2e-4 * np.abs(x_ref).max()
    )


def test_fullsize_lightning_ckpt_convert_and_enhance(fullsize_pair, tmp_path):
    """Converter dry-run on a synthesized FULL-SIZE Lightning .ckpt with
    both nets + torch-ema shadows, consumed end to end by enhancement.py
    (the README.md:17-23 'download checkpoint, enhance' user journey)."""
    m, _params, _my = fullsize_pair

    # synthesize distinct EMA shadows so EMA selection is observable
    ema_sd = m.ema.state_dict()
    for s in ema_sd["shadow_params"]:
        s.mul_(0.999)
    ckpt = {
        "state_dict": m.state_dict(),
        "ema": ema_sd,
        "hyper_parameters": {
            "mode": "regen-joint-training",
            "backbone_denoiser": "ncsnpp", "backbone_score": "ncsnpp",
            "sde": "ouve", "lr": 1e-4, "condition": "both", **_SDE_KW,
        },
    }
    src = str(tmp_path / "storm_fullsize.ckpt")
    torch.save(ckpt, src)

    out = str(tmp_path / "converted")
    env = dict(os.environ)
    env["STORM_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = ""
    r = subprocess.run(
        [sys.executable, "-m", "storm_tpu.compat.convert",
         "--ckpt", src, "--out", out, "--mode", "storm"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "55.6" in r.stdout or "55.5" in r.stdout or "converted" in r.stdout

    # short input keeps the CPU U-Net runs cheap; N=2, denoiser+2 steps
    wav_dir = tmp_path / "noisy"
    wav_dir.mkdir()
    from storm_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    n = 12000
    save_wav(wav_dir / "u0.wav",
             0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
             + 0.05 * rng.standard_normal(n))

    enh_dir = str(tmp_path / "enh")
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "enhancement.py"),
         "--test_dir", str(wav_dir), "--enhanced_dir", enh_dir,
         "--ckpt", out, "--mode", "storm",
         "--N", "2", "--corrector", "none"],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert r2.returncode == 0, r2.stderr[-4000:] + r2.stdout[-1000:]
    assert "backend=cpu" in r2.stdout

    from storm_tpu.data.audio import load_wav

    x, sr = load_wav(os.path.join(enh_dir, "u0.wav"))
    assert sr == 16000 and x.shape[-1] == n and np.isfinite(x).all()

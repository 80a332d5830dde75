"""Golden parity tests against the ACTUAL reference implementation.

The reference sgmse package is imported on CPU torch via tests/ref_loader.py
(CUDA ops stubbed with pure-torch equivalents). These tests close the
round-1 gap where converter/goldens were validated only against hand-rebuilt
torch primitives: here the ground truth is `sgmse.backbones.ncsnpp.NCSNpp`
itself (sgmse/backbones/ncsnpp.py:281-450), the Lightning state_dict/EMA
layout (sgmse/model.py:86-95), and the `_step` losses
(sgmse/model.py:138-154, 560-595).
"""
import os
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import REFERENCE_ROOT, load_reference, load_reference_model_module

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT),
    reason="reference checkout not available",
)

from storm_tpu.backbones.ncsnpp import NCSNpp as MyNCSNpp
from storm_tpu.compat import convert_backbone_state_dict
from storm_tpu.compat.torch_ckpt import load_reference_checkpoint
from storm_tpu.models.score import ScoreModel as MyScore
from storm_tpu.models.storm import StochasticRegenerationModel as MyStoRM


@pytest.fixture(scope="module")
def ref_backbones():
    load_reference()
    import sgmse.backbones as RB

    return RB


@pytest.fixture(scope="module")
def ref_model_mod():
    return load_reference_model_module()


def _pack(tc: torch.Tensor) -> jnp.ndarray:
    """torch complex (B,C,F,T) -> packed-real jnp (B,C,F,T,2)."""
    return jnp.asarray(np.stack([tc.real.numpy(), tc.imag.numpy()], axis=-1))


def _unpack_torch(out: torch.Tensor) -> np.ndarray:
    return np.stack([out.real.numpy(), out.imag.numpy()], axis=-1)


# ---------------------------------------------------------------------------
# op-stub sanity: the pure-torch upfirdn2d stand-in must agree with this
# framework's XLA lowering (two independent implementations of the same op).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1)), (2, 2, (3, 0))])
def test_upfirdn_stub_matches_xla(up, down, pad):
    load_reference()
    from sgmse.backbones.ncsnpp_utils.op import upfirdn2d as torch_upfirdn

    from storm_tpu.nn.resample import upfirdn2d as jax_upfirdn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 12, 10)).astype(np.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64.0
    out_t = torch_upfirdn(
        torch.from_numpy(x), torch.from_numpy(k), up=up, down=down, pad=pad
    ).numpy()
    # jax path is NHWC
    out_j = np.asarray(
        jax_upfirdn(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(k),
            up=up, down=down, pad=pad,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_t, out_j, atol=1e-5)


# ---------------------------------------------------------------------------
# Full NCSN++ forward goldens: random-init reference model -> state_dict ->
# convert_backbone_state_dict -> flax forward; float32-noise agreement.
# ---------------------------------------------------------------------------

CONFIGS = {
    "tiny-score": (dict(nf=16, ch_mult=(1, 2), image_size=64), (64, 32)),
    "tiny-disc": (
        dict(nf=16, ch_mult=(1, 2), image_size=64, discriminative=True),
        (64, 32),
    ),
    "tiny-attn": (
        dict(nf=16, ch_mult=(1, 2, 2), image_size=64,
             attn_resolutions=(32, 16), num_res_blocks=2),
        (64, 32),
    ),
    "default-27.8M": (dict(), (256, 64)),
}


@pytest.mark.parametrize("name", [
    # the full-width forward goes to the midweight tier: the slow tier
    # already carries full-size (27.8M) loss+gradient parity
    # (test_fullsize_parity.py), so the core loop keeps only the tiny
    # geometries that compile in seconds on the 1-core CPU host
    pytest.param(n, marks=pytest.mark.midweight) if n == "default-27.8M"
    else n
    for n in CONFIGS
])
def test_ref_ncsnpp_forward(ref_backbones, name):
    kwargs, (F, T) = CONFIGS[name]
    ref = ref_backbones.NCSNpp(**kwargs)
    _assert_forward_parity(ref, kwargs, F, T)


@pytest.mark.parametrize("cls_name,kwargs", [
    # 12M/65M compile for minutes at full width on the CPU host — midweight
    # tier (still run in the full suite); the core loop keeps the cheapest
    # variant (6M) to exercise the registered-variant path every run
    pytest.param("NCSNpp12M", dict(nf=96, ch_mult=(1, 2, 2, 1)),
                 marks=pytest.mark.midweight),
    ("NCSNpp6M", dict(nf=96, ch_mult=(1, 1, 1, 1))),
    # 65M 7-level variant: num_res_blocks=2 + attention at resolution 16
    # in BOTH pyramids (sgmse/backbones/ncsnpp.py:460-470)
    pytest.param("NCSNppLarge", dict(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                                     num_res_blocks=2,
                                     attn_resolutions=(16,)),
                 marks=pytest.mark.midweight),
])
def test_ref_ncsnpp_size_variants(ref_backbones, cls_name, kwargs):
    """The registered size variants (sgmse/backbones/ncsnpp.py:479-513)."""
    ref = getattr(ref_backbones, cls_name)()
    _assert_forward_parity(ref, kwargs, 256, 64)


def test_ref_convtasnet_forward(ref_backbones):
    """ConvTasNet waveform denoiser (sgmse/backbones/convtasnet.py).

    The reference returns stride extra samples at both ends (it never crops
    the decoder overlap); this framework crops to the input length, which
    corresponds to reference samples [stride : stride+T]."""
    from storm_tpu.backbones.convtasnet import ConvTasNet as MyCTN
    from storm_tpu.compat.torch_ckpt import convert_convtasnet_state_dict

    ref = ref_backbones.ConvTasNet()
    ref.eval()
    params = convert_convtasnet_state_dict(ref.state_dict())
    my = MyCTN.from_kwargs()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2048)).astype(np.float32) * 0.3
    with torch.no_grad():
        out_t = np.squeeze(ref(torch.from_numpy(x), torch.ones(2)).numpy())
    out_j = np.squeeze(np.asarray(
        my.apply({"params": jax.tree.map(jnp.asarray, params)},
                 jnp.asarray(x), jnp.ones((2,)))
    ))
    stride = 16
    np.testing.assert_allclose(
        out_j, out_t[:, stride:stride + 2048], atol=5e-5
    )


def test_ref_gagnet_forward(ref_backbones):
    """GaGNet glance-and-gaze denoiser (sgmse/backbones/gagnet.py) with the
    registry defaults; exercises the 815-param converter incl. gate convs,
    transposed convs (spatial flip) and the planar channel flattenings."""
    from storm_tpu.backbones.gagnet import GaGNet as MyGag
    from storm_tpu.compat.torch_ckpt import convert_gagnet_state_dict

    kw = dict(cin=2, k1=(2, 3), k2=(1, 3), c=64, kd1=3, cd1=64, d_feat=448,
              p=2, q=3, dilas=[1, 2, 5, 9], fft_num=512, is_u2=True,
              causal=False, is_squeezed=False, acti_type="sigmoid",
              intra_connect="cat", norm_type="IN", dnn_channels=1)
    ref = ref_backbones.GaGNet(**kw)
    ref.eval()
    params = convert_gagnet_state_dict(ref.state_dict())
    my = MyGag.from_kwargs(**kw)
    rng = np.random.default_rng(0)
    F, T = 256, 16  # even F: the reference's odd-F branch is a known bug
    xr = rng.standard_normal((1, 1, F, T)).astype(np.float32) * 0.3
    xi = rng.standard_normal((1, 1, F, T)).astype(np.float32) * 0.3
    xt = torch.complex(torch.from_numpy(xr), torch.from_numpy(xi))
    with torch.no_grad():
        out_t = ref(xt)
    out_j = np.asarray(
        my.apply({"params": jax.tree.map(jnp.asarray, params)},
                 jnp.asarray(np.stack([xr, xi], axis=-1)), jnp.ones((1,)))
    )
    ot = np.squeeze(_unpack_torch(out_t))
    np.testing.assert_allclose(np.squeeze(out_j), ot, atol=2e-4)


def test_ref_gagnet_bn_running_stats(ref_backbones):
    """GaGNet norm_type="BN" checkpoint transfer: train-mode passes update
    the torch running statistics, then eval-mode outputs must match with
    the converted stats supplied as a flax "batch_stats" collection
    (NormSwitch eval path; round-1 VERDICT weak #9)."""
    from storm_tpu.backbones.gagnet import GaGNet as MyGag
    from storm_tpu.compat.torch_ckpt import (
        convert_gagnet_batch_stats,
        convert_gagnet_state_dict,
    )

    kw = dict(cin=2, k1=(2, 3), k2=(1, 3), c=64, kd1=3, cd1=64, d_feat=448,
              p=2, q=1, dilas=[1, 2, 5, 9], fft_num=512, is_u2=True,
              causal=False, is_squeezed=False, acti_type="sigmoid",
              intra_connect="cat", norm_type="BN", dnn_channels=1)
    torch.manual_seed(0)
    ref = ref_backbones.GaGNet(**kw)

    rng = np.random.default_rng(1)
    F, T = 256, 16
    # a few train-mode passes move running_mean/var off their init
    ref.train()
    with torch.no_grad():
        for i in range(3):
            xr = rng.standard_normal((2, 1, F, T)).astype(np.float32)
            xi = rng.standard_normal((2, 1, F, T)).astype(np.float32)
            ref(torch.complex(torch.from_numpy(xr), torch.from_numpy(xi)))
    ref.eval()

    params = convert_gagnet_state_dict(ref.state_dict())
    bn = convert_gagnet_batch_stats(ref.state_dict())
    assert bn is not None
    # the stats moved (this test would be vacuous on fresh zeros/ones)
    means = [np.asarray(l) for l in jax.tree_util.tree_leaves(bn)]
    assert any(np.abs(m).max() > 1e-3 for m in means)

    xr = rng.standard_normal((1, 1, F, T)).astype(np.float32) * 0.3
    xi = rng.standard_normal((1, 1, F, T)).astype(np.float32) * 0.3
    with torch.no_grad():
        out_t = ref(torch.complex(torch.from_numpy(xr), torch.from_numpy(xi)))

    my = MyGag.from_kwargs(**kw)
    variables = {"params": jax.tree.map(jnp.asarray, params),
                 "batch_stats": jax.tree.map(jnp.asarray, bn)}
    out_j = np.asarray(
        my.apply(variables, jnp.asarray(np.stack([xr, xi], axis=-1)),
                 jnp.ones((1,)))
    )
    ot = np.squeeze(_unpack_torch(out_t))
    np.testing.assert_allclose(np.squeeze(out_j), ot, atol=2e-4)

    # without the collection, batch-stat normalization is used instead —
    # outputs must differ (proves the collection actually took effect)
    out_nostats = np.asarray(
        my.apply({"params": variables["params"]},
                 jnp.asarray(np.stack([xr, xi], axis=-1)), jnp.ones((1,)))
    )
    assert np.abs(out_nostats - out_j).max() > 1e-5


def test_ref_ae_ncsnpp_forward(ref_backbones):
    """ae-ncsnpp: learned Conv1d filterbank + trunk + ConvTranspose1d
    decoder (sgmse/backbones/ncsnpp.py:516-931). Weights are perturbed from
    init so the zero-initialized output convs don't make the comparison
    vacuous; exercises the encoder/decoder converter mapping incl. the
    conv-transpose kernel flip."""
    from storm_tpu.backbones.ncsnpp import AutoEncodeNCSNpp as MyAE

    kwargs = dict(nf=16, ch_mult=(1, 2), image_size=64)
    ref = ref_backbones.AutoEncodeNCSNpp(**kwargs)
    ref.eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))

    params = convert_backbone_state_dict(ref.state_dict())
    my = MyAE.from_kwargs(**kwargs)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1, 3000)).astype(np.float32) * 0.3
    with torch.no_grad():
        out_t = ref(torch.from_numpy(x), torch.ones(2)).numpy()
    out_j = np.asarray(
        my.apply({"params": jax.tree.map(jnp.asarray, params)},
                 jnp.asarray(x), jnp.ones((2,)))
    )
    assert out_j.shape == out_t.shape
    np.testing.assert_allclose(
        out_j, out_t, atol=max(1e-5, 1e-4 * np.abs(out_t).max())
    )


def _assert_forward_parity(ref, kwargs, F, T, t_val=0.7):
    ref.eval()
    disc = kwargs.get("discriminative", False)
    Cc = 1 if disc else 2
    params = convert_backbone_state_dict(ref.state_dict())
    my = MyNCSNpp.from_kwargs(**kwargs)

    rng = np.random.default_rng(0)
    xr = rng.standard_normal((1, Cc, F, T)).astype(np.float32) * 0.3
    xi = rng.standard_normal((1, Cc, F, T)).astype(np.float32) * 0.3
    xt = torch.complex(torch.from_numpy(xr), torch.from_numpy(xi))
    tt = None if disc else torch.full((1,), t_val)
    with torch.no_grad():
        out_t = _unpack_torch(ref(xt, tt))

    xp = jnp.asarray(np.stack([xr, xi], axis=-1))
    tj = None if disc else jnp.full((1,), t_val, jnp.float32)
    out_j = np.asarray(
        my.apply({"params": jax.tree.map(jnp.asarray, params)}, xp, tj)
    )
    scale = np.abs(out_t).max()
    np.testing.assert_allclose(
        out_j, out_t, atol=max(1e-5, 1e-5 * scale),
        err_msg=f"NCSN++ forward mismatch for {kwargs}",
    )


# ---------------------------------------------------------------------------
# _step loss parity on a fixed batch/noise (sgmse/model.py:138-154, 560-595)
# ---------------------------------------------------------------------------

_SDE_KW = dict(theta=1.5, sigma_min=0.05, sigma_max=0.5, N=1000)
_TINY_KW = dict(nf=16, ch_mult=(1, 2), image_size=64, **_SDE_KW)


class _DummyDM:
    def __init__(self, **kw):
        self.batch_size = kw.get("batch_size", 8)


def _fixed_batch(B=2, F=64, T=32, seed=3):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g) * 0.3
    y = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g) * 0.3
    u = torch.tensor([0.35, 0.75])
    z = torch.randn(B, 1, F, T, dtype=torch.complex64, generator=g)
    return x, y, u, z


class _patched_rand:
    """Temporarily pin torch.rand / torch.randn_like to fixed tensors so the
    reference `_step` becomes deterministic."""

    def __init__(self, u, z):
        self.u, self.z = u, z

    def __enter__(self):
        self._rand, self._rl = torch.rand, torch.randn_like
        torch.rand = lambda *a, **k: self.u.clone()
        torch.randn_like = lambda *a, **k: self.z.clone()

    def __exit__(self, *exc):
        torch.rand, torch.randn_like = self._rand, self._rl


def test_ref_storm_step_loss(ref_model_mod):
    m = ref_model_mod.StochasticRegenerationModel(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        data_module_cls=_DummyDM, loss_type_denoiser="mse",
        loss_type_score="mse", condition="both", **_TINY_KW,
    )
    m.eval(no_ema=True)
    x, y, u, z = _fixed_batch()
    with _patched_rand(u, z), torch.no_grad():
        loss_t, ls_t, ld_t = m._step((x, y), 0)

    sd = m.state_dict()
    params = {
        "denoiser": convert_backbone_state_dict(sd, prefix="denoiser_net."),
        "score": convert_backbone_state_dict(sd, prefix="score_net."),
    }
    my = MyStoRM.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        condition="both", loss_type_denoiser="mse", loss_type_score="mse",
        **_TINY_KW,
    )
    t_used = jnp.asarray((u * (1.0 - 0.03) + 0.03).numpy())
    batch = (_pack(x)[:, 0], _pack(y)[:, 0])
    loss_j, aux = my.loss_given_tz(
        jax.tree.map(jnp.asarray, params), batch, t_used, _pack(z)[:, 0]
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(
        float(aux["loss_score"]), float(ls_t), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(aux["loss_denoiser"]), float(ld_t), rtol=1e-5
    )


@pytest.mark.parametrize("sde_name,sde_kw", [
    ("ouve", {}),
    ("ouvp", dict(beta_min=0.1, beta_max=1.0, stiffness=1.0)),
])
def test_ref_score_step_loss(ref_model_mod, sde_name, sde_kw):
    kw = dict(_TINY_KW, **sde_kw)
    m = ref_model_mod.ScoreModel(
        backbone="ncsnpp", sde=sde_name, data_module_cls=_DummyDM,
        loss_type="mse", **kw,
    )
    m.eval(no_ema=True)
    x, y, u, z = _fixed_batch()
    with _patched_rand(u, z), torch.no_grad():
        loss_t = m._step((x, y), 0)

    params = convert_backbone_state_dict(m.state_dict(), prefix="dnn.")
    my = MyScore.create(backbone="ncsnpp", sde=sde_name, loss_type="mse",
                        **kw)
    t_used = jnp.asarray((u * (1.0 - 0.03) + 0.03).numpy())
    batch = (_pack(x)[:, 0], _pack(y)[:, 0])
    loss_j, _ = my.loss_given_tz(
        jax.tree.map(jnp.asarray, params), batch, t_used, _pack(z)[:, 0]
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)


@pytest.mark.midweight  # ~2.5 min: the reference-side scipy RK45 at 1e-7
# dominates and is not compile-cacheable. The core loop keeps the stronger
# step-for-step PC parity e2e below plus the rk45 endpoint-agreement tests.
def test_ref_enhance_end_to_end(ref_model_mod):
    """FULL inference-pipeline parity: this framework's jitted `enhance`
    (normalize -> STFT -> compress -> pad -> reverse probability-flow ODE
    -> denoise -> decompress -> iSTFT -> denormalize) matches the actual
    reference `ScoreModel.enhance` (sgmse/model.py:273-310, scipy-RK45 ODE)
    on the same prior noise to ~1e-6 — every signal-processing stage and
    the integrated dynamics agree end to end."""
    import sgmse.data_module as ref_dm_mod

    from storm_tpu.models.base import normalize_wav, prepare_spec
    from storm_tpu.signal import cplx

    m = ref_model_mod.ScoreModel(
        backbone="ncsnpp", sde="ouve",
        data_module_cls=ref_dm_mod.SpecsDataModule,
        loss_type="mse", **_TINY_KW,
    )
    m.eval(no_ema=True)
    my = MyScore.create(backbone="ncsnpp", sde="ouve", loss_type="mse",
                        **_TINY_KW)
    params = jax.tree.map(
        jnp.asarray, convert_backbone_state_dict(m.state_dict(), prefix="dnn.")
    )

    rng = np.random.default_rng(0)
    T_wav = 7321  # deliberately awkward length (58 frames -> padded to 64)
    y_np = (0.3 * np.sin(2 * np.pi * 300 * np.arange(T_wav) / 16000)
            + 0.05 * rng.standard_normal(T_wav)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    # my full jitted pipeline (fixed-step RK4 on the probability-flow ODE)
    enh = my.make_enhance(0, sampler_type="ode", method="rk4", N=40)
    x_mine = np.asarray(enh(params, jnp.asarray(y_np)[None], key)[0])[0]

    # reference pipeline with the SAME prior noise (patch randn_like) and
    # its hardcoded .cuda() neutralized; scipy at tight tolerance
    y_n, _norm = normalize_wav(jnp.asarray(y_np)[None])
    Y_mine, _tf = prepare_spec(y_n, my.stft_config, my.transform)
    eps_mine = np.asarray(
        cplx.complex_normal(jax.random.split(key)[1], Y_mine.shape[:-1])
    )
    eps_t = torch.complex(torch.from_numpy(eps_mine[..., 0].copy()),
                          torch.from_numpy(eps_mine[..., 1].copy()))
    orig_cuda, orig_rl = torch.Tensor.cuda, torch.randn_like
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.randn_like = lambda *a, **k: eps_t.clone()
    try:
        with torch.no_grad():
            x_ref = np.squeeze(np.asarray(m.enhance(
                torch.from_numpy(y_np.copy())[None], sampler_type="ode",
                N=40, device="cpu", rtol=1e-7, atol=1e-7,
            )))
    finally:
        torch.Tensor.cuda, torch.randn_like = orig_cuda, orig_rl

    assert x_mine.shape == x_ref.shape == (T_wav,)
    np.testing.assert_allclose(
        x_mine, x_ref, atol=1e-4 * np.abs(x_ref).max()
    )


def test_ref_storm_enhance_end_to_end(ref_model_mod):
    """FULL two-stage StoRM inference parity: denoiser pass + conditioned
    reverse-diffusion PC sampling (the reference `enhance` defaults, N=12,
    corrector none) matches sgmse's host-loop sampler step for step when
    fed the same noise stream (prior + one z per predictor step)."""
    import sgmse.data_module as ref_dm_mod

    from storm_tpu.models.base import normalize_wav, prepare_spec
    from storm_tpu.signal import cplx

    m = ref_model_mod.StochasticRegenerationModel(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        data_module_cls=ref_dm_mod.SpecsDataModule,
        loss_type_denoiser="mse", loss_type_score="mse", condition="both",
        **_TINY_KW,
    )
    m.eval(no_ema=True)
    my = MyStoRM.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        condition="both", **_TINY_KW,
    )
    sd = m.state_dict()
    params = jax.tree.map(jnp.asarray, {
        "denoiser": convert_backbone_state_dict(sd, prefix="denoiser_net."),
        "score": convert_backbone_state_dict(sd, prefix="score_net."),
    })

    rng = np.random.default_rng(1)
    T_wav = 6000
    y_np = (0.3 * np.sin(2 * np.pi * 250 * np.arange(T_wav) / 16000)
            + 0.05 * rng.standard_normal(T_wav)).astype(np.float32)
    N = 12
    key = jax.random.PRNGKey(7)

    enh = my.make_enhance(sampler_type="pc", N=N, corrector="none")
    x_mine = np.asarray(enh(params, jnp.asarray(y_np)[None], key)[0])[0]

    # replay my sampler's key schedule to precompute its noise stream:
    # pc_sample: key,kprior = split(key); scan carry k: k,kc,kp = split(k,3)
    y_n, _ = normalize_wav(jnp.asarray(y_np)[None])
    Y, _tf = prepare_spec(y_n, my.stft_config, my.transform)
    spec_shape = Y.shape[:-1]
    k2, kprior = jax.random.split(key)
    noises = [np.asarray(cplx.complex_normal(kprior, spec_shape))]
    k = k2
    for _ in range(N):
        k, _kc, kp = jax.random.split(k, 3)
        noises.append(np.asarray(cplx.complex_normal(kp, spec_shape)))
    queue = [
        torch.complex(torch.from_numpy(z[..., 0].copy()),
                      torch.from_numpy(z[..., 1].copy()))
        for z in noises
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


def test_ref_score_step_gradients(ref_model_mod):
    """FULL backward parity: d(loss)/d(params) of the DSM training step
    matches torch autograd for every trainable tensor — validates the
    whole backward graph (convs, GroupNorm, FIR resampling, attention)
    against the reference, not just forwards."""
    from storm_tpu.compat import flax_to_torch_backbone

    m = ref_model_mod.ScoreModel(
        backbone="ncsnpp", sde="ouve", data_module_cls=_DummyDM,
        loss_type="mse", **_TINY_KW,
    )
    m.train(True, no_ema=True)
    x, y, u, z = _fixed_batch()
    with _patched_rand(u, z):
        loss_t = m._step((x, y), 0)
        loss_t.backward()
    t_grads = {k: p.grad.detach().numpy()
               for k, p in m.named_parameters() if p.grad is not None}

    params = convert_backbone_state_dict(m.state_dict(), prefix="dnn.")
    my = MyScore.create(backbone="ncsnpp", sde="ouve", loss_type="mse",
                        **_TINY_KW)
    t_used = jnp.asarray((u * (1.0 - 0.03) + 0.03).numpy())
    batch = (_pack(x)[:, 0], _pack(y)[:, 0])
    zj = _pack(z)[:, 0]
    grads = jax.grad(
        lambda p: my.loss_given_tz(p, batch, t_used, zj)[0]
    )(jax.tree.map(jnp.asarray, params))
    j_grads = flax_to_torch_backbone(
        jax.tree.map(np.asarray, grads), prefix="dnn."
    )

    assert len(t_grads) > 100
    for k, tv in t_grads.items():
        jv = j_grads[k]
        np.testing.assert_allclose(
            jv, tv, atol=1e-5 + 1e-4 * np.abs(tv).max(), err_msg=k
        )


# ---------------------------------------------------------------------------
# Lightning checkpoint (incl. torch-ema shadow_params) -> converter -> flax
# forward equality for BOTH raw and EMA weights (sgmse/model.py:86-95).
# ---------------------------------------------------------------------------

def test_ref_lightning_checkpoint_e2e(ref_model_mod, tmp_path):
    m = ref_model_mod.ScoreModel(
        backbone="ncsnpp", sde="ouve", data_module_cls=_DummyDM,
        loss_type="mse", **_TINY_KW,
    )
    m.eval(no_ema=True)
    # synthesize a distinct EMA state (shadow != raw)
    for s in m.ema.shadow_params:
        s.mul_(0.9)
    ckpt = {
        "state_dict": m.state_dict(),
        "ema": m.ema.state_dict(),
        "hyper_parameters": {
            "backbone": "ncsnpp", "sde": "ouve", "lr": 1e-4, **_SDE_KW,
        },
    }
    path = str(tmp_path / "ref.ckpt")
    torch.save(ckpt, path)

    params, ema, hparams = load_reference_checkpoint(path, mode="score-only")
    assert hparams["backbone"] == "ncsnpp"

    my = MyScore.create(backbone="ncsnpp", sde="ouve", **_TINY_KW)
    g = torch.Generator().manual_seed(7)
    xt = torch.randn(1, 2, 64, 32, dtype=torch.complex64, generator=g) * 0.3
    tt = torch.full((1,), 0.6)
    tj = jnp.full((1,), 0.6, jnp.float32)

    with torch.no_grad():
        out_raw = _unpack_torch(m.dnn(xt, tt))
    out_p = np.asarray(
        my.dnn.apply({"params": jax.tree.map(jnp.asarray, params)},
                     _pack(xt), tj)
    )
    np.testing.assert_allclose(out_p, out_raw, atol=1e-5)

    m.ema.copy_to(m.parameters())
    with torch.no_grad():
        out_ema_t = _unpack_torch(m.dnn(xt, tt))
    out_e = np.asarray(
        my.dnn.apply({"params": jax.tree.map(jnp.asarray, ema)},
                     _pack(xt), tj)
    )
    np.testing.assert_allclose(out_e, out_ema_t, atol=1e-5)
    # raw and EMA genuinely differ (the test would be vacuous otherwise)
    assert np.abs(out_p - out_e).max() > 1e-4


def test_ref_gagnet_bn_lightning_ema_conversion(ref_backbones):
    """A GaGNet-BN Lightning checkpoint WITH a torch-ema section converts:
    BN buffers (running_mean/var/num_batches_tracked) are buffers, not
    parameters, so they must not desync the shadow_params zip
    (code-review regression: _iter_trainable_keys used to yield them)."""
    from storm_tpu.compat.torch_ckpt import convert_lightning_checkpoint

    kw = dict(cin=2, k1=(2, 3), k2=(1, 3), c=64, kd1=3, cd1=64, d_feat=448,
              p=2, q=1, dilas=[1, 2, 5, 9], fft_num=512, is_u2=True,
              causal=False, is_squeezed=False, acti_type="sigmoid",
              intra_connect="cat", norm_type="BN", dnn_channels=1)
    torch.manual_seed(1)
    ref = ref_backbones.GaGNet(**kw)
    sd = {f"dnn.{k}": v for k, v in ref.state_dict().items()}
    # torch-ema shadows requires_grad parameters only (no BN buffers)
    shadow = [p.detach().clone() * 0.5 for p in ref.parameters()
              if p.requires_grad]
    ckpt = {"state_dict": sd, "ema": {"shadow_params": shadow}}

    params, ema = convert_lightning_checkpoint(
        ckpt, prefix="dnn.", backbone="gagnet")
    # ema tree mirrors params structurally, with the 0.5-scaled values
    p_leaves = jax.tree_util.tree_leaves(params)
    e_leaves = jax.tree_util.tree_leaves(ema)
    assert len(p_leaves) == len(e_leaves)
    np.testing.assert_allclose(
        np.asarray(e_leaves[0]), np.asarray(p_leaves[0]) * 0.5, atol=1e-6)

"""Extra parity tests: full reference-.ckpt loading via torch IO, the
on-device ODE integrator vs scipy's adaptive solver, DP enhancement on the
virtual mesh, and graphics figure generation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_load_reference_checkpoint_storm(tmp_path):
    """Synthesize a StoRM Lightning .ckpt with torch.save and load it."""
    torch = pytest.importorskip("torch")
    from storm_tpu.compat import flax_to_torch_backbone, load_reference_checkpoint
    from storm_tpu.models import StochasticRegenerationModel

    model = StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        nf=16, ch_mult=(1, 1), image_size=64,
    )
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0), (1, 64, 16)))

    sd = {}
    sd.update({k: torch.from_numpy(np.array(v)) for k, v in
               flax_to_torch_backbone(params["denoiser"], "denoiser_net.").items()})
    sd.update({k: torch.from_numpy(np.array(v)) for k, v in
               flax_to_torch_backbone(params["score"], "score_net.").items()})
    trainable = [k for k in sd if not (k.endswith(".W") and "NIN" not in k)]
    ckpt = {
        "state_dict": sd,
        "ema": {"shadow_params": [sd[k] * 3.0 for k in trainable],
                "decay": 0.999, "num_updates": 7},
        "hyper_parameters": {"backbone_denoiser": "ncsnpp", "sde": "ouve"},
    }
    path = tmp_path / "storm.ckpt"
    torch.save(ckpt, path)

    p, ema, hp = load_reference_checkpoint(str(path), mode="storm")
    assert hp["sde"] == "ouve"
    np.testing.assert_allclose(
        p["denoiser"]["m1"]["kernel"], params["denoiser"]["m1"]["kernel"]
    )
    np.testing.assert_allclose(
        ema["score"]["m1"]["kernel"], 3.0 * np.asarray(params["score"]["m1"]["kernel"])
    )
    # converted params must run in this framework's forward
    x = jnp.zeros((1, 1, 64, 16, 2), jnp.float32)
    out = model.forward_denoiser({"denoiser": jax.tree.map(jnp.asarray, p["denoiser"])}, x[:, 0])
    assert out.shape == (1, 64, 16, 2)


def test_ode_integrator_matches_scipy():
    """On-device RK4 probability-flow integration vs scipy solve_ivp on the
    same reverse drift (the reference's host-bound sampler,
    sgmse/sampling/__init__.py:71-141), using a linear score model so both
    integrate the identical ODE."""
    from scipy.integrate import solve_ivp

    from storm_tpu.sampling.samplers import ode_sample
    from storm_tpu.sde.sdes import OUVESDE

    sde = OUVESDE()
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 4, 6, 2)) * 0.3,
        jnp.float32,
    )

    def score_fn(x, t, y_sde):
        # analytic-ish linear score: pulls x toward y
        std = sde._std(t)
        return (y_sde - x) / (std**2 + 0.1)[:, None, None, None]

    x_dev, nfe = ode_sample(
        jax.random.PRNGKey(1), sde, score_fn, y, N=200, method="rk4",
        denoise=False, eps=0.03,
    )

    # scipy on the same drift, starting from the same prior sample
    key, kprior = jax.random.split(jax.random.PRNGKey(1))
    x0 = np.asarray(sde.prior_sampling(kprior, y)).reshape(-1)

    def rhs(t, flat):
        x = jnp.asarray(flat.reshape(y.shape), jnp.float32)
        vec_t = jnp.full((1,), t, jnp.float32)
        drift, diff = sde.sde(x, vec_t, y)
        g2 = np.asarray(diff)[0] ** 2
        total = np.asarray(drift) - 0.5 * g2 * np.asarray(
            score_fn(x, vec_t, y)
        )
        return total.reshape(-1)

    sol = solve_ivp(rhs, (sde.T, 0.03), x0, rtol=1e-6, atol=1e-6)
    x_scipy = sol.y[:, -1].reshape(y.shape)
    np.testing.assert_allclose(np.asarray(x_dev), x_scipy, atol=2e-3, rtol=1e-2)


def test_data_parallel_enhance_on_mesh():
    """Batch-sharded enhancement over the 8-device mesh matches
    single-device results (serving-style DP inference)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from storm_tpu.models import DiscriminativeModel

    model = DiscriminativeModel.create(
        backbone="ncsnpp", nf=16, ch_mult=(1, 1), image_size=64, n_fft=126,
    )
    import dataclasses

    from storm_tpu.signal.stft import STFTConfig

    model = dataclasses.replace(model, stft_config=STFTConfig(n_fft=126))
    params = model.init_params(jax.random.PRNGKey(0), (1, 64, 16))
    y = jax.random.normal(jax.random.PRNGKey(1), (8, 15 * 128)) * 0.1
    enhance = model.make_enhance()

    x_single, _ = enhance(params, y, jax.random.PRNGKey(2))

    mesh = Mesh(np.array(jax.devices()), ("data",))
    y_sh = jax.device_put(y, NamedSharding(mesh, P("data")))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    x_dp, _ = enhance(params_r, y_sh, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(x_single), np.asarray(x_dp), atol=1e-5
    )


def test_graphics_figures():
    import matplotlib

    matplotlib.use("Agg")
    from storm_tpu.utils.graphics import visualize_example, visualize_one

    spec = np.random.default_rng(0).standard_normal((64, 32, 2)).astype(np.float32)
    fig = visualize_example(spec, spec, spec, return_fig=True)
    assert fig is not None
    fig2 = visualize_one(spec, return_fig=True)
    assert fig2 is not None

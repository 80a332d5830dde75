"""Model-layer tests: train steps reduce loss, enhance runs end-to-end,
EMA semantics, freeze-denoiser mode, data-parallel equivalence on the
virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.models import (
    DiscriminativeModel,
    ScoreModel,
    StochasticRegenerationModel,
    model_cls_for_mode,
)

TINY = dict(nf=16, ch_mult=(1, 1), image_size=64)
SPEC = (2, 64, 32)  # (B, F, T)


def tiny_batch(key, spec=SPEC):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, spec + (2,)) * 0.1
    y = x + jax.random.normal(ky, spec + (2,)) * 0.05
    return x, y


def test_mode_dispatch():
    assert model_cls_for_mode("score-only") is ScoreModel
    assert model_cls_for_mode("denoiser-only") is DiscriminativeModel
    assert model_cls_for_mode("regen-joint-training") is StochasticRegenerationModel
    assert model_cls_for_mode("regen-freeze-denoiser") is StochasticRegenerationModel
    with pytest.raises(ValueError):
        model_cls_for_mode("nope")


def test_score_model_train_and_enhance():
    model = ScoreModel.create(backbone="ncsnpp", sde="ouve", **TINY)
    state = model.init_state(jax.random.PRNGKey(0), SPEC)
    step = model.make_train_step(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(5):
        state, aux = step(state, batch, jax.random.PRNGKey(i + 2))
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 5

    # enhance on a short utterance: 32 frames * 128 hop
    n_samp = 31 * 128
    y = jax.random.normal(jax.random.PRNGKey(9), (1, n_samp)) * 0.1
    enhance = model.make_enhance(n_samp, N=3, corrector="ald")
    x_hat, nfe = enhance(state.ema_params, y, jax.random.PRNGKey(10))
    assert x_hat.shape == (1, n_samp)
    assert np.isfinite(np.asarray(x_hat)).all()
    assert nfe == 3 * 2  # N * (corrector_steps + 1)


def test_fold_step_rng_matches_host_fold():
    """make_train_step(fold_step_rng=True) with a constant epoch key must
    equal fold_step_rng=False fed key=fold_in(epoch_key, step) — the
    on-device RNG derivation is a dispatch-count optimization, not a
    semantic change."""
    model = ScoreModel.create(backbone="ncsnpp", sde="ouve", **TINY)
    batch = tiny_batch(jax.random.PRNGKey(1))
    epoch_key = jax.random.PRNGKey(7)

    state_a = model.init_state(jax.random.PRNGKey(0), SPEC)
    step_a = model.make_train_step(donate=False, fold_step_rng=True)
    state_b = model.init_state(jax.random.PRNGKey(0), SPEC)
    step_b = model.make_train_step(donate=False)

    for _ in range(3):
        host_key = jax.random.fold_in(epoch_key, state_b.step)
        state_a, aux_a = step_a(state_a, batch, epoch_key)
        state_b, aux_b = step_b(state_b, batch, host_key)
        assert float(aux_a["loss"]) == pytest.approx(
            float(aux_b["loss"]), rel=0, abs=0)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(state_a.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state_b.params)[0]),
    )


def test_discriminative_model():
    model = DiscriminativeModel.create(backbone="ncsnpp", **TINY)
    state = model.init_state(jax.random.PRNGKey(0), SPEC)
    step = model.make_train_step(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))
    l0 = None
    for i in range(10):
        state, aux = step(state, batch, jax.random.PRNGKey(i))
        if l0 is None:
            l0 = float(aux["loss"])
    # supervised MSE on a fixed tiny batch must decrease
    assert float(aux["loss"]) < l0

    n_samp = 31 * 128
    y = jax.random.normal(jax.random.PRNGKey(9), (1, n_samp)) * 0.1
    enhance = model.make_enhance()
    x_hat, nfe = enhance(state.params, y, jax.random.PRNGKey(10))
    assert x_hat.shape == (1, n_samp)
    assert nfe == 1


def test_storm_model_joint_training():
    model = StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve", **TINY
    )
    assert model.score_net.total_channels == 6
    assert model.denoiser_net.total_channels == 2
    state = model.init_state(jax.random.PRNGKey(0), SPEC)
    step = model.make_train_step(donate=False)
    batch = tiny_batch(jax.random.PRNGKey(1))
    state, aux = step(state, batch, jax.random.PRNGKey(2))
    assert set(aux) == {"loss", "loss_score", "loss_denoiser"}
    assert np.isfinite(float(aux["loss"]))

    n_samp = 31 * 128
    y = jax.random.normal(jax.random.PRNGKey(9), (1, n_samp)) * 0.1
    enhance = model.make_enhance(N=4)  # default corrector "none"
    x_hat, nfe = enhance(state.ema_params, y, jax.random.PRNGKey(10))
    assert x_hat.shape == (1, n_samp)
    assert np.isfinite(np.asarray(x_hat)).all()
    assert nfe == 1 + 4  # denoiser + N predictor steps

    # denoiser_only path
    enhance_d = model.make_enhance(denoiser_only=True)
    x_hat_d, nfe_d = enhance_d(state.ema_params, y, jax.random.PRNGKey(10))
    assert nfe_d == 1
    assert x_hat_d.shape == (1, n_samp)


def test_storm_freeze_denoiser_mode():
    model = StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        mode="regen-freeze-denoiser", **TINY
    )
    state = model.init_state(jax.random.PRNGKey(0), SPEC)
    batch = tiny_batch(jax.random.PRNGKey(1))
    (_, _), grads = jax.value_and_grad(model.loss_fn, has_aux=True)(
        state.params, jax.random.PRNGKey(2), batch, False
    )
    # frozen denoiser receives zero gradient through the score path; the
    # denoiser loss term still produces gradients — reference freezes via
    # requires_grad=False, which also kills the denoiser-loss grads, so
    # loss_type_denoiser is irrelevant there. Check stop-grad on score path:
    model2 = StochasticRegenerationModel.create(
        backbone_denoiser="ncsnpp", backbone_score="ncsnpp", sde="ouve",
        mode="regen-freeze-denoiser", loss_type_denoiser="none", **TINY
    )
    (_, _), grads2 = jax.value_and_grad(model2.loss_fn, has_aux=True)(
        state.params, jax.random.PRNGKey(2), batch, False
    )
    den_leaves = jax.tree.leaves(grads2["denoiser"])
    assert all(float(jnp.max(jnp.abs(l))) == 0.0 for l in den_leaves)
    score_leaves = jax.tree.leaves(grads2["score"])
    assert any(float(jnp.max(jnp.abs(l))) > 0.0 for l in score_leaves)


def test_ema_warmup_and_convergence():
    from storm_tpu.models.base import ema_update

    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    # step 1: decay = min(0.999, 2/11) -> mostly tracks params
    e1 = ema_update(e, p, 0.999, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(e1["w"]), 1.0 - 2.0 / 11.0, rtol=1e-5)
    # large step: decay ~ 0.999
    e2 = ema_update(e, p, 0.999, jnp.asarray(100000))
    np.testing.assert_allclose(np.asarray(e2["w"]), 1.0 - 0.999, rtol=1e-4)


def test_data_parallel_train_step_matches_single_device():
    """pjit-style DP: same loss/params with batch sharded over the 8-device
    mesh vs. fully replicated single-device execution."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model = DiscriminativeModel.create(backbone="ncsnpp", **TINY)
    spec8 = (8, 64, 32)
    state = model.init_state(jax.random.PRNGKey(0), spec8)
    batch = tiny_batch(jax.random.PRNGKey(1), spec8)
    key = jax.random.PRNGKey(3)

    step = model.make_train_step(donate=False)
    state_single, aux_single = step(state, batch, key)

    mesh = Mesh(np.array(jax.devices()), ("data",))
    batch_sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    state_repl = jax.device_put(state, NamedSharding(mesh, P()))
    state_dp, aux_dp = step(state_repl, batch_sharded, key)

    np.testing.assert_allclose(
        float(aux_dp["loss"]), float(aux_single["loss"]), rtol=1e-5
    )
    w_a = jax.tree.leaves(state_single.params)[0]
    w_b = jax.tree.leaves(state_dp.params)[0]
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b), atol=1e-5)

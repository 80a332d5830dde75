"""NCSN++ backbone tests: shapes, parameter counts, conditioning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storm_tpu.backbones import BackboneRegistry
from storm_tpu.backbones.ncsnpp import NCSNpp


def count_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


def _init_shapes(model, x_shape, with_t=True):
    """Parameter shapes via eval_shape (no FLOPs)."""
    x = jnp.zeros(x_shape, jnp.float32)
    t = jnp.ones((x_shape[0],), jnp.float32)

    def init():
        return model.init(jax.random.PRNGKey(0), x, t)

    return jax.eval_shape(init)


@pytest.mark.parametrize(
    "name,expected_m,tol_m",
    [
        ("ncsnpp", 27.8, 0.3),
        ("ncsnpplarge", 65.0, 2.0),
        ("ncsnpp12M", 12.0, 1.0),
        ("ncsnpp6M", 6.0, 1.0),
    ],
)
def test_param_counts(name, expected_m, tol_m):
    """Match the reference's published parameter counts (README.md:43)."""
    cls = BackboneRegistry.get_by_name(name)
    model = cls.from_kwargs(input_channels=4)
    vs = _init_shapes(model, (1, 2, 256, 64, 2))
    n = count_params(vs) / 1e6
    assert abs(n - expected_m) < tol_m, f"{name}: {n:.2f}M params"


def test_forward_score_mode():
    model = NCSNpp.from_kwargs(input_channels=4, nf=32, ch_mult=(1, 1), image_size=64)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 2, 64, 32, 2)), jnp.float32
    )
    t = jnp.asarray([0.5, 0.9])
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, 1, 64, 32, 2)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    # time-conditioning changes the output
    out2 = model.apply(variables, x, jnp.asarray([0.1, 0.2]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_forward_discriminative_mode():
    """discriminative=True flips off conditioning/sigma-scaling and forces
    input_channels=2 (ncsnpp.py:80-86)."""
    model = NCSNpp.from_kwargs(
        input_channels=4, discriminative=True, nf=32, ch_mult=(1, 1), image_size=64
    )
    assert model.total_channels == 2
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 1, 64, 64, 2)), jnp.float32
    )
    t = jnp.ones((1,))
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (1, 1, 64, 64, 2)
    # in discriminative mode t must not affect the output
    out2 = model.apply(variables, x, jnp.full((1,), 0.3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_forward_storm_score_conditioning():
    """StoRM score net: 6 input channels = [x_t, y, y_denoised]."""
    model = NCSNpp.from_kwargs(input_channels=6, nf=32, ch_mult=(1, 1), image_size=64)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 3, 64, 32, 2)), jnp.float32
    )
    t = jnp.full((1,), 0.7)
    variables = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (1, 1, 64, 32, 2)


def test_grad_flows():
    model = NCSNpp.from_kwargs(input_channels=4, nf=16, ch_mult=(1, 1), image_size=64)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 2, 64, 32, 2)), jnp.float32
    )
    t = jnp.full((1,), 0.5)
    variables = model.init(jax.random.PRNGKey(0), x, t)

    def loss(params):
        out = model.apply({"params": params}, x, t)
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # GFP weights W must receive zero gradient (frozen in the reference)
    gfp = g["m0"]["W"]
    np.testing.assert_allclose(np.asarray(gfp), 0.0, atol=1e-12)
    # most other params must receive nonzero gradient
    nonzero = sum(float(jnp.any(jnp.abs(l) > 0)) for l in leaves)
    assert nonzero > len(leaves) * 0.8


@pytest.mark.parametrize("kw", [
    dict(resblock_type="ddpm"),
    dict(progressive="residual"),
    dict(progressive_input="residual"),
    dict(progressive="none", progressive_input="none"),
    dict(progressive_combine="cat"),
    dict(fir=False),
    dict(embedding_type="positional"),
    dict(resblock_type="ddpm", progressive="residual",
         progressive_input="residual", fir=False),
])
def test_config_variants(kw):
    """Every reference configuration axis constructs and runs: resblock
    types, progressive modes, combine methods, FIR on/off, embeddings
    (sgmse/backbones/ncsnpp.py:40-65)."""
    model = NCSNpp.from_kwargs(input_channels=4, nf=16, ch_mult=(1, 1),
                               image_size=64, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 64, 32, 2)),
        jnp.float32,
    )
    t = jnp.full((1,), 0.5)
    vs = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(vs, x, t)
    assert out.shape == (1, 1, 64, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_split_skip_matches_concat_form():
    """The concat-free up path (split_skip=True, production default) is
    numerically identical to the reference concat form with the SAME
    parameter tree — SplitGroupNorm assembles the group statistics of the
    virtual concat exactly, and the kernel-split convs sum to the
    full-depth conv (sgmse/backbones/ncsnpp.py:379-382 concat semantics)."""
    kw = dict(input_channels=4, nf=32, ch_mult=(1, 2), image_size=64,
              num_res_blocks=2)
    a = NCSNpp.from_kwargs(split_skip=True, **kw)
    b = NCSNpp.from_kwargs(split_skip=False, **kw)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 2, 64, 32, 2)),
        jnp.float32,
    )
    t = jnp.asarray([0.3, 0.8])
    va = a.init(jax.random.PRNGKey(7), x, t)
    vb = b.init(jax.random.PRNGKey(7), x, t)
    assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
    ya = np.asarray(a.apply(va, x, t))
    yb = np.asarray(b.apply(va, x, t))
    np.testing.assert_allclose(ya, yb, rtol=0, atol=2e-5)

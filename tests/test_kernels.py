"""Pallas kernel tests: parity with the XLA lowerings and with numpy
ground truth; VJP identity checks.

On the CPU test backend the Pallas kernels run in interpret mode via
pltpu.force_tpu_interpret_mode (Mosaic compilation needs real TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from storm_tpu.kernels import (
    fused_leaky_relu,
    fused_leaky_relu_pallas,
    upfirdn2d,
    upfirdn2d_pallas,
)
from storm_tpu.nn.resample import upfirdn2d as upfirdn2d_xla


def _interp():
    return pltpu.force_tpu_interpret_mode()


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 2)),
    (1, 2, (1, 1)),
    (2, 1, (2, 1)),
    (1, 2, (2, 2)),
])
def test_pallas_upfirdn_matches_xla(up, down, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 8)), jnp.float32)
    k = jnp.asarray(np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0, jnp.float32)
    want = np.asarray(upfirdn2d_xla(x, k, up=up, down=down, pad=pad))
    with _interp():
        got = np.asarray(upfirdn2d_pallas(x, k, up=up, down=down, pad=pad))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upfirdn_custom_vjp_matches_autodiff():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    k = jnp.asarray(np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0, jnp.float32)

    def f_custom(x):
        return jnp.sum(upfirdn2d(x, k, 1, 2, (1, 1)) ** 2)

    def f_native(x):
        return jnp.sum(upfirdn2d_xla(x, k, up=1, down=2, pad=(1, 1)) ** 2)

    g_custom = jax.grad(f_custom)(x)
    g_native = jax.grad(f_native)(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_native), atol=1e-5, rtol=1e-5
    )


def test_upfirdn_custom_vjp_upsample():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
    k = jnp.asarray(np.outer([1, 3, 3, 1], [1, 3, 3, 1]) / 64.0 * 4, jnp.float32)

    def f_custom(x):
        return jnp.sum(upfirdn2d(x, k, 2, 1, (2, 1)) ** 2)

    def f_native(x):
        return jnp.sum(upfirdn2d_xla(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x)),
        np.asarray(jax.grad(f_native)(x)),
        atol=1e-5, rtol=1e-5,
    )


def test_fused_leaky_relu():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 5, 6, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    out = fused_leaky_relu(x, b)
    h = np.asarray(x) + np.asarray(b)
    want = np.sqrt(2.0) * np.where(h >= 0, h, 0.2 * h)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)

    # custom VJP vs autodiff of the plain expression
    def f(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    def f_plain(x, b):
        h = x + b.reshape(1, 1, 1, -1)
        return jnp.sum((jnp.sqrt(2.0) * jnp.where(h >= 0, h, 0.2 * h)) ** 2)

    gx, gb = jax.grad(f, argnums=(0, 1))(x, b)
    gx2, gb2 = jax.grad(f_plain, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2), atol=1e-4)


def test_fused_leaky_relu_pallas_interpret():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    with _interp():
        out = np.asarray(fused_leaky_relu_pallas(x, b))
    np.testing.assert_allclose(out, np.asarray(fused_leaky_relu(x, b)), atol=1e-6)

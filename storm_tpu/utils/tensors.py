"""Small array helpers (≙ sgmse/util/tensors.py)."""
from __future__ import annotations

import jax.numpy as jnp


def batch_broadcast(a, x):
    """Broadcast a 1-D per-batch array `a` over all non-batch dims of `x`.

    Mirrors the reference `batch_broadcast` (sgmse/util/tensors.py:3-18):
    `a` must be a scalar or a vector with one entry per batch element of `x`.
    """
    a = jnp.asarray(a)
    if a.ndim == 0:
        a = a.reshape(1)
    if a.ndim != 1:
        raise ValueError(
            f"Don't know how to batch-broadcast array with ndim {a.ndim}!"
        )
    return a.reshape(a.shape[0], *((1,) * (x.ndim - 1)))


def right_pad_dims(a, x):
    """Append singleton dims to `a` until it has the same rank as `x`."""
    a = jnp.asarray(a)
    if a.ndim > x.ndim:
        raise ValueError(f"rank of a ({a.ndim}) exceeds rank of x ({x.ndim})")
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim))


def complex_normal_like(key, x, stddev: float = 1.0):
    """Sample standard complex normal noise shaped like complex array `x`.

    Matches `torch.randn_like` on a complex tensor: real and imaginary parts
    are each i.i.d. N(0, 1/2) so the complex variance is `stddev**2`
    (cf. sgmse/model.py:146 comment "i.i.d. normal distributed with var=0.5").
    """
    import jax

    re_im = jax.random.normal(key, x.shape + (2,), dtype=jnp.float32)
    z = jax.lax.complex(re_im[..., 0], re_im[..., 1]) * (stddev / jnp.sqrt(2.0))
    return z.astype(x.dtype)


def flatten_tree(tree, sep: str = "/"):
    """Flatten a nested string-keyed dict into {'a/b/c': leaf}.

    Shared by the side-artifact serializers (int8 scales, BatchNorm running
    stats) so there is exactly one path convention."""
    flat = {}

    def rec(node, prefix):
        for k, v in node.items():
            p = f"{prefix}{sep}{k}" if prefix else k
            if isinstance(v, dict):
                rec(v, p)
            elif v is not None:
                flat[p] = v

    if tree:
        rec(tree, "")
    return flat


def unflatten_tree(flat, sep: str = "/"):
    """Inverse of flatten_tree."""
    tree = {}
    for key, val in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree

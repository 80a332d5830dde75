"""A/B the split-input up-path resblocks on the FULL 27.8M NCSN++ forward
(batch 16, 256x256), bf16 and int8 — the micro-probe (perf_round3_probe.py)
says split wins 40% at top-level shapes; this measures the whole net.

Usage: python -u scripts/perf_splitskip_probe.py  (real chip)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from storm_tpu.backbones.ncsnpp import NCSNpp  # noqa: E402


def scan_time(fn, x0, t, iters=10, reps=3, label=""):
    @jax.jit
    def run(x, tt):
        def body(c, _):
            o = fn(c, tt)
            # net output has fewer channels than its input; feed a scalar
            # of it back so iterations stay sequentially dependent
            d = (1.0 + 1e-6 * jnp.mean(o.astype(jnp.float32)))
            return c * d.astype(c.dtype), None

        out, _ = lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x0, t))
    ts = []
    for _ in range(reps):
        a = time.perf_counter()
        float(run(x0, t))
        ts.append((time.perf_counter() - a) / iters)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{label:44s} {ms:8.2f} ms/fwd", flush=True)
    return ms


def quant_tree(params, min_channels=128):
    """Synthetic a_scale for every large conv (perf probe only)."""

    def walk(p):
        if not isinstance(p, dict):
            return None
        if "kernel" in p and getattr(p["kernel"], "ndim", 0) == 4:
            k = p["kernel"]
            if k.shape[-2] >= min_channels and k.shape[-1] >= min_channels:
                return {"a_scale": jnp.asarray(0.05, jnp.float32)}
            return None
        out = {}
        for k_, v in p.items():
            s = walk(v)
            if s:
                out[k_] = s
        return out or None

    return walk(params)


def main():
    B, F, T = 16, 256, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, 3, F, T, 2)) * 0.3, jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.float32)

    for split in (False, True):
        net = NCSNpp(input_channels=6, dtype=jnp.bfloat16, split_skip=split)
        params = net.init(jax.random.PRNGKey(0), x, t)["params"]
        n = sum(v.size for v in jax.tree.leaves(params))
        q = quant_tree(params)

        scan_time(
            lambda c, tt: net.apply({"params": params}, c, tt),
            x, t, label=f"bf16 split_skip={split} ({n/1e6:.1f}M)")
        scan_time(
            lambda c, tt: net.apply({"params": params, "quant": q}, c, tt),
            x, t, label=f"int8 split_skip={split}")


if __name__ == "__main__":
    main()

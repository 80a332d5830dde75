"""Up-path skip-handling variants at the REAL 27.8M up-path shapes.

Variants of GN+SiLU(+quant)+conv over the virtual concat [h, skip]:
  A  bf16 concat -> GN -> SiLU -> (quant) -> conv           (reference form)
  B  split-GN -> SiLU -> (quant) -> two convs, summed       (split form)
  C  split-GN -> SiLU -> quant -> INT8 concat -> one conv   (int8 only:
     no bf16 concat traffic, full-depth MXU contraction)

Usage: python -u scripts/perf_skipvariants_probe.py   (real chip)
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

DT = jnp.bfloat16


def scan_time(fn, args, iters=20, reps=3, label=""):
    @jax.jit
    def run(a):
        def body(c, _):
            o = fn(*((c,) + a[1:]))
            d = 1.0 + 1e-6 * jnp.mean(o.astype(jnp.float32))
            return c * d.astype(c.dtype), None

        out, _ = lax.scan(body, a[0], None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{label:52s} {ms:8.3f} ms", flush=True)
    return ms


def gn(x, gamma, beta, groups):
    C = x.shape[-1]
    xf = x.astype(jnp.float32)
    g = xf.reshape(x.shape[:-1] + (groups, C // groups))
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = (g * g).mean(axis=(1, 2, 4), keepdims=True) - mu * mu
    xn = ((g - mu) * lax.rsqrt(var + 1e-6)).reshape(xf.shape)
    return (xn * gamma + beta).astype(x.dtype)


def split_gn(h, s, gamma, beta, G):
    Ch, C = h.shape[-1], h.shape[-1] + s.shape[-1]
    gs = C // G

    def mom(v):
        vf = v.astype(jnp.float32)
        return vf.mean(axis=(1, 2)), (vf * vf).mean(axis=(1, 2))

    mh, m2h = mom(h)
    ms_, m2s = mom(s)
    m = jnp.concatenate([mh, ms_], -1)
    m2 = jnp.concatenate([m2h, m2s], -1)
    B = m.shape[0]
    mu = m.reshape(B, G, gs).mean(-1)
    var = jnp.maximum(m2.reshape(B, G, gs).mean(-1) - mu * mu, 0.0)
    mul = jnp.repeat(lax.rsqrt(var + 1e-6), gs, -1) * gamma[None]
    add = beta[None] - jnp.repeat(mu, gs, -1) * mul

    def norm(v, lo, hi):
        return (v.astype(jnp.float32) * mul[:, lo:hi][:, None, None, :]
                + add[:, lo:hi][:, None, None, :]).astype(v.dtype)

    return norm(h, 0, Ch), norm(s, Ch, C)


def conv(x, w, out_dtype=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def q8(x, inv):
    return jnp.clip(jnp.round(x * inv.astype(x.dtype)), -127., 127.
                    ).astype(jnp.int8)


def main():
    rng = np.random.default_rng(0)
    B = 16
    # (H, W, Ch, Cs, Co): real 27.8M up-path block shapes
    shapes = [
        (256, 256, 128, 128, 128),   # level 0
        (128, 128, 256, 256, 256),   # level 1 big
        (128, 128, 256, 128, 128),   # level 1 -> 0 transition-ish
        (64, 64, 256, 256, 256),     # level 2
    ]
    a_scale = jnp.asarray(0.05, jnp.float32)
    inv = 1.0 / a_scale

    for (H, W, Ch, Cs, Co) in shapes:
        C = Ch + Cs
        G = min(C // 4, 32)
        h = jnp.asarray(rng.standard_normal((B, H, W, Ch)), DT)
        s = jnp.asarray(rng.standard_normal((B, H, W, Cs)), DT)
        k = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.02,
                        jnp.float32)
        gamma = jnp.ones((C,), jnp.float32)
        beta = jnp.zeros((C,), jnp.float32)
        kf = k.astype(jnp.float32)
        wsc = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-20) / 127.
        wq = jnp.clip(jnp.round(kf / wsc), -127., 127.).astype(jnp.int8)
        kb = k.astype(DT)
        print(f"-- (B{B},{H},{W}) {Ch}+{Cs}->{Co}", flush=True)

        def A_bf16(hh, ss):
            x = jnp.concatenate([hh, ss], -1)
            return conv(jax.nn.silu(gn(x, gamma, beta, G)), kb)

        def B_bf16(hh, ss):
            hn, sn = split_gn(hh, ss, gamma, beta, G)
            return (conv(jax.nn.silu(hn), kb[:, :, :Ch]) +
                    conv(jax.nn.silu(sn), kb[:, :, Ch:]))

        def A_int8(hh, ss):
            x = jnp.concatenate([hh, ss], -1)
            xq = q8(jax.nn.silu(gn(x, gamma, beta, G)), inv)
            acc = conv(xq, wq, jnp.int32)
            return acc.astype(DT) * (a_scale * wsc).astype(DT)

        def B_int8(hh, ss):
            hn, sn = split_gn(hh, ss, gamma, beta, G)
            acc = (conv(q8(jax.nn.silu(hn), inv), wq[:, :, :Ch], jnp.int32)
                   + conv(q8(jax.nn.silu(sn), inv), wq[:, :, Ch:],
                          jnp.int32))
            return acc.astype(DT) * (a_scale * wsc).astype(DT)

        def C_int8(hh, ss):
            hn, sn = split_gn(hh, ss, gamma, beta, G)
            xq = jnp.concatenate(
                [q8(jax.nn.silu(hn), inv), q8(jax.nn.silu(sn), inv)], -1)
            acc = conv(xq, wq, jnp.int32)
            return acc.astype(DT) * (a_scale * wsc).astype(DT)

        scan_time(A_bf16, (h, s), label="  A bf16 concat")
        scan_time(B_bf16, (h, s), label="  B bf16 split-2conv")
        scan_time(A_int8, (h, s), label="  A int8 concat-bf16")
        scan_time(B_int8, (h, s), label="  B int8 split-2conv")
        scan_time(C_int8, (h, s), label="  C int8 split-gn+int8concat")


if __name__ == "__main__":
    main()

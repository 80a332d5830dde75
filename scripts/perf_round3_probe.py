"""Round-3 perf probes (real chip):

1. Does XLA hoist in-scan weight quantization (round/clip of the fp32
   kernel) out of the sampler loop, or do we pay it per NFE?
   -> compare scan over int8 conv with in-body wq vs pre-quantized wq.
2. conv(concat(h, skip)) vs conv_h(h) + conv_skip(skip): does the split
   form beat the concat materialization (bf16 and int8)?
3. GN -> SiLU -> quantize -> conv chain, concat vs split-aligned form.

Usage: python scripts/perf_round3_probe.py   (uses the TPU)
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


def scan_time(fn, args, iters=20, reps=3, label=""):
    """Median wall of `iters` chained applications inside one jit; sync via
    scalar transfer (tunnel gotcha: block_until_ready unreliable)."""

    @jax.jit
    def run(a):
        def body(c, _):
            return fn(*((c,) + a[1:])), None

        out, _ = lax.scan(body, a[0], None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(args))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{label:58s} {ms:8.3f} ms/iter")
    return ms


def quant_w(k):
    kf = k.astype(jnp.float32)
    w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True)
    w_scale = jnp.maximum(w_amax, 1e-20) / 127.0
    wq = jnp.clip(jnp.round(kf / w_scale), -127.0, 127.0).astype(jnp.int8)
    return wq, w_scale[0, 0, 0, :]


def conv(x, w, out_dtype=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype,
    )


def main():
    rng = np.random.default_rng(0)
    B, H, W = 16, 256, 256
    Ch, Cs, Co = 256, 256, 256
    dt = jnp.bfloat16

    h = jnp.asarray(rng.standard_normal((B, H, W, Ch)), dt)
    s = jnp.asarray(rng.standard_normal((B, H, W, Cs)), dt)
    k_full = jnp.asarray(
        rng.standard_normal((3, 3, Ch + Cs, Co)) * 0.02, jnp.float32)
    a_scale = jnp.asarray(0.05, jnp.float32)

    print(f"shapes: h=(B{B},{H},{W},{Ch}) skip=..{Cs} out={Co}\n")

    # --- 1. in-scan weight quantization hoisting -----------------------
    def int8_conv_inbody(x, k):
        inv = 1.0 / jnp.maximum(a_scale, 1e-20)
        xq = jnp.clip(jnp.round(x.astype(dt) * inv.astype(dt)),
                      -127.0, 127.0).astype(jnp.int8)
        wq, wsc = quant_w(k)
        acc = conv(xq, wq, jnp.int32)
        y = acc.astype(dt) * (a_scale * wsc).astype(dt)
        # keep channel count constant for the scan carry
        return y

    k_sq = jnp.asarray(rng.standard_normal((3, 3, Ch, Ch)) * 0.02,
                       jnp.float32)
    wq_pre, wsc_pre = jax.jit(quant_w)(k_sq)

    def int8_conv_pre(x, wq, wsc):
        inv = 1.0 / jnp.maximum(a_scale, 1e-20)
        xq = jnp.clip(jnp.round(x.astype(dt) * inv.astype(dt)),
                      -127.0, 127.0).astype(jnp.int8)
        acc = conv(xq, wq, jnp.int32)
        return acc.astype(dt) * (a_scale * wsc).astype(dt)

    scan_time(int8_conv_inbody, (h, k_sq),
              label="int8 conv, weight-quant IN scan body")
    scan_time(int8_conv_pre, (h, wq_pre, wsc_pre),
              label="int8 conv, weights PRE-quantized")

    # --- 2. concat vs split, plain conv --------------------------------
    k_h = k_full[:, :, :Ch, :]
    k_s = k_full[:, :, Ch:, :]

    def concat_conv(hh, ss, k):
        return conv(jnp.concatenate([hh, ss], axis=-1), k.astype(dt))

    def split_conv(hh, ss, kh, ks):
        return conv(hh, kh.astype(dt)) + conv(ss, ks.astype(dt))

    scan_time(concat_conv, (h, s, k_full), label="bf16 conv(concat(h,s))")
    scan_time(split_conv, (h, s, k_h, k_s),
              label="bf16 conv_h(h)+conv_s(s)")

    # --- 3. GN+SiLU+quant + conv, concat vs split ----------------------
    G = 32
    gamma = jnp.ones((Ch + Cs,), jnp.float32)
    beta = jnp.zeros((Ch + Cs,), jnp.float32)

    def gn(x, gm, bt, groups):
        C = x.shape[-1]
        xg = x.astype(jnp.float32).reshape(x.shape[:-1] + (groups, C // groups))
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xn = ((xg - mu) * lax.rsqrt(var + 1e-6)).reshape(x.shape)
        return (xn * gm + bt).astype(x.dtype)

    wq_full, wsc_full = jax.jit(quant_w)(k_full)
    wq_h, wsc_h = wq_full[:, :, :Ch, :], wsc_full
    wq_s = wq_full[:, :, Ch:, :]

    def chain_concat(hh, ss):
        x = jnp.concatenate([hh, ss], axis=-1)
        x = gn(x, gamma, beta, G)
        x = jax.nn.silu(x)
        inv = 1.0 / jnp.maximum(a_scale, 1e-20)
        xq = jnp.clip(jnp.round(x * inv.astype(dt)), -127.0, 127.0
                      ).astype(jnp.int8)
        acc = conv(xq, wq_full, jnp.int32)
        return acc.astype(dt) * (a_scale * wsc_full).astype(dt)

    def chain_split(hh, ss):
        # aligned case: groups split cleanly at the h/skip boundary
        gh = G * Ch // (Ch + Cs)
        hn = gn(hh, gamma[:Ch], beta[:Ch], gh)
        sn = gn(ss, gamma[Ch:], beta[Ch:], G - gh)
        inv = (1.0 / jnp.maximum(a_scale, 1e-20)).astype(dt)
        hq = jnp.clip(jnp.round(jax.nn.silu(hn) * inv), -127.0, 127.0
                      ).astype(jnp.int8)
        sq = jnp.clip(jnp.round(jax.nn.silu(sn) * inv), -127.0, 127.0
                      ).astype(jnp.int8)
        acc = conv(hq, wq_h, jnp.int32) + conv(sq, wq_s, jnp.int32)
        return acc.astype(dt) * (a_scale * wsc_full).astype(dt)

    def chain_concat_wrap(hh, ss):
        return chain_concat(hh, ss)

    scan_time(chain_concat_wrap, (h, s),
              label="int8 GN+SiLU+quant+conv(concat)")
    scan_time(chain_split, (h, s),
              label="int8 splitGN+SiLU+quant+2conv (aligned)")

    # bf16 versions of the same chain
    def chain_concat_bf16(hh, ss):
        x = jnp.concatenate([hh, ss], axis=-1)
        x = gn(x, gamma, beta, G)
        x = jax.nn.silu(x)
        return conv(x, k_full.astype(dt))

    def chain_split_bf16(hh, ss):
        gh = G * Ch // (Ch + Cs)
        hn = jax.nn.silu(gn(hh, gamma[:Ch], beta[:Ch], gh))
        sn = jax.nn.silu(gn(ss, gamma[Ch:], beta[Ch:], G - gh))
        return conv(hn, k_h.astype(dt)) + conv(sn, k_s.astype(dt))

    scan_time(chain_concat_bf16, (h, s),
              label="bf16 GN+SiLU+conv(concat)")
    scan_time(chain_split_bf16, (h, s),
              label="bf16 splitGN+SiLU+2conv (aligned)")


if __name__ == "__main__":
    main()

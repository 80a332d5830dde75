"""Per-component TPU microbenchmarks for the int8 serving gap analysis.

BASELINE.md round-2: NFE=101 serving is 4.77 audio-s/s/chip bf16 and 6.17
int8 — the residual gap to the MXU's 2x int8 rate was attributed to
requantization traffic. This script measures each piece in isolation, all
inside `lax.scan` loops (so dispatch/tunnel overhead is amortized the same
way the production sampler amortizes it):

  - ncsnpp-fwd        : full backbone forward (the sampler's unit of work)
  - conv3x3           : one 3x3 conv at each U-Net level's shape
  - quantize-pass     : round/clip/cast bf16 -> int8 (the requant write)
  - dequant-pass      : int32 -> bf16 * scale + bias
  - gn-silu           : GroupNorm + SiLU at level-0 shape

Usage (real chip, nothing else holding the TPU):
    python scripts/perf_micro.py [--batch 16] [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def scan_time(fn, x, iters, reps=3):
    """Median wall time per iteration of fn inside a lax.scan.

    The scan's final carry is reduced to a scalar ON DEVICE before the
    host sync — over the tunneled backend a device->host pull of a full
    activation (hundreds of MB at ~100 MB/s) would otherwise dominate
    the measurement."""

    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), None

        out, _ = lax.scan(body, x0, None, length=iters)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    _ = np.asarray(run(x))  # compile + sync
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--nf", type=int, default=128)
    args = ap.parse_args()

    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])
    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache

    enable_jax_compilation_cache()
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    B, nf = args.batch, args.nf
    key = jax.random.PRNGKey(0)

    # ---- full backbone forward (bf16 vs int8) ---------------------------
    from storm_tpu.backbones import BackboneRegistry

    ncsnpp = BackboneRegistry.get_by_name("ncsnpp")
    net = ncsnpp.from_kwargs(nf=nf, dtype=jnp.bfloat16)
    # score-mode input: x_t stacked with the conditioning y (2 complex ch)
    x = jax.random.normal(key, (B, 2, 256, 256, 2), jnp.float32) * 0.1
    t = jnp.full((B,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x, t)["params"]

    cond = x[:, 1:]

    def fwd_bf16(x0):
        out = net.apply(
            {"params": params}, jnp.concatenate([x0, cond], axis=1), t)
        return out.astype(x0.dtype)

    x0 = x[:, :1]
    dt = scan_time(fwd_bf16, x0, args.iters)
    print(f"ncsnpp fwd bf16        : {dt*1e3:8.2f} ms")

    # int8: fake per-conv scales (value irrelevant for timing)
    from storm_tpu.models.quant import scales_from_stats

    def make_ones_stats(p):
        if isinstance(p, dict) and "kernel" in p and p["kernel"].ndim == 4:
            return {"amax": jnp.ones((), jnp.float32)}
        if isinstance(p, dict):
            out = {}
            for k, v in p.items():
                s = make_ones_stats(v)
                if s:
                    out[k] = s
            return out
        return None

    quant = scales_from_stats(make_ones_stats(params), params,
                              min_channels=min(nf, 128))
    n_q = len(jax.tree_util.tree_leaves(quant))
    print(f"  ({n_q} int8-quantized convs)")

    def fwd_q(x0):
        out = net.apply(
            {"params": params, "quant": quant},
            jnp.concatenate([x0, cond], axis=1), t)
        return out.astype(x0.dtype)

    dt_q = scan_time(fwd_q, x0, args.iters)
    print(f"ncsnpp fwd int8        : {dt_q*1e3:8.2f} ms")

    # ---- isolated conv at each level shape ------------------------------
    shapes = [
        (B, 256, 256, nf),
        (B, 128, 128, nf * 2),
        (B, 64, 64, nf * 2),
        (B, 32, 32, nf * 2),
    ]
    for shp in shapes:
        H, W, C = shp[1:]
        k = jax.random.normal(key, (3, 3, C, C), jnp.float32) * 0.05
        xb = jax.random.normal(key, shp, jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)

        def conv_bf16(xc, kb=kb):
            return lax.conv_general_dilated(
                xc, kb, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        dt = scan_time(conv_bf16, xb, args.iters)
        gflop = 2 * np.prod(shp) * C * 9 / 1e9
        print(f"conv3x3 {str(shp):22s} bf16: {dt*1e3:7.3f} ms "
              f"({gflop/dt/1e3:6.1f} TFLOP/s)")

        xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * 20), -127,
                      127).astype(jnp.int8)
        kq = jnp.clip(jnp.round(k * 500), -127, 127).astype(jnp.int8)

        def conv_int8(xc, kq=kq):
            acc = lax.conv_general_dilated(
                xc, kq, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # keep carry int8: requant (accounts the epilogue cost too)
            return jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)

        dt = scan_time(conv_int8, xq, args.iters)
        print(f"conv3x3 {str(shp):22s} int8: {dt*1e3:7.3f} ms "
              f"({gflop/dt/1e3:6.1f} TOP/s incl requant)")

    # ---- elementwise passes at level-0 shape ----------------------------
    shp = shapes[0]
    xb = jax.random.normal(key, shp, jnp.bfloat16)

    def quant_pass(xc):
        q = jnp.clip(jnp.round(xc * jnp.bfloat16(12.7)), -127, 127
                     ).astype(jnp.int8)
        return q.astype(jnp.bfloat16)  # keep carry dtype stable

    print(f"quant pass {str(shp):19s}: "
          f"{scan_time(quant_pass, xb, args.iters)*1e3:7.3f} ms")

    xi = jnp.ones(shp, jnp.int32)

    def dequant_pass(xc):
        y = xc.astype(jnp.bfloat16) * jnp.bfloat16(0.01) + jnp.bfloat16(0.1)
        return (y * 0).astype(jnp.int32) + xc  # carry stays int32

    print(f"dequant pass {str(shp):17s}: "
          f"{scan_time(dequant_pass, xi, args.iters)*1e3:7.3f} ms")

    import flax.linen as fnn

    gn = fnn.GroupNorm(num_groups=min(shp[-1] // 4, 32), dtype=jnp.bfloat16)
    gp = gn.init(jax.random.PRNGKey(2), xb)["params"]

    def gn_silu(xc):
        return fnn.silu(gn.apply({"params": gp}, xc))

    print(f"GN+SiLU {str(shp):22s}: "
          f"{scan_time(gn_silu, xb, args.iters)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()

"""Probe: XLA vs Pallas elementwise bandwidth + int8 conv epilogue fusion.

Two questions behind the int8 serving gap (BASELINE.md, perf_micro.py):

1. XLA elementwise passes measure ~200 GB/s effective on this chip (vs
   ~819 GB/s HBM peak). Does a simple Pallas VMEM-tiled kernel do better
   on the same op (bf16 -> round/clip -> int8)?

2. Is the int8 conv's dequant epilogue (int32 -> bf16 * scale) fused into
   the conv by XLA, or does the int32 accumulator round-trip HBM?
   Measured by timing conv-with-epilogue minus conv-bare.

Usage: python scripts/perf_fusion_probe.py  (real chip)
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def scan_time(fn, x, iters=20, reps=3):
    @jax.jit
    def run(x0):
        def body(c, _):
            return fn(c), None

        out, _ = lax.scan(body, x0, None, length=iters)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    _ = np.asarray(run(x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def main():
    if os.environ.get("STORM_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["STORM_TPU_PLATFORM"])
    from storm_tpu.utils.jaxcache import enable_jax_compilation_cache

    enable_jax_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    interp = jax.default_backend() != "tpu"

    B, H, W, C = 16, 256, 256, 128
    key = jax.random.PRNGKey(0)
    xb = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    nbytes_rd = xb.size * 2
    nbytes_wr = xb.size  # int8 out

    # ---- E1: quantize pass, XLA vs Pallas -------------------------------
    def quant_xla(xc):
        q = jnp.clip(jnp.round(xc * jnp.bfloat16(12.7)), -127, 127
                     ).astype(jnp.int8)
        return q.astype(jnp.bfloat16)

    dt = scan_time(quant_xla, xb)
    print(f"quant XLA   : {dt*1e3:7.3f} ms "
          f"({(nbytes_rd+nbytes_wr+nbytes_rd)/dt/1e9:6.1f} GB/s)")

    # Pallas: rows-tiled elementwise kernel. Flatten to (B*H*W, C); tile
    # rows so each block is (TILE, 128) -- lane dim 128, sublane TILE.
    TILE = 1024

    def qkernel(x_ref, o_ref):
        v = x_ref[:].astype(jnp.float32) * 12.7
        o_ref[:] = jnp.clip(jnp.round(v), -127.0, 127.0).astype(jnp.int8)

    x2 = xb.reshape(-1, C)
    rows = x2.shape[0]

    qcall = pl.pallas_call(
        qkernel,
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.int8),
        grid=(rows // TILE,),
        in_specs=[pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )

    def quant_pallas(xc):
        return qcall(xc).astype(jnp.bfloat16)

    dt = scan_time(quant_pallas, x2)
    print(f"quant Pallas: {dt*1e3:7.3f} ms "
          f"({(nbytes_rd+nbytes_wr+nbytes_rd)/dt/1e9:6.1f} GB/s)")

    # pure copy bound: bf16 -> bf16 negate (read+write only, no cast)
    dt = scan_time(lambda xc: -xc, x2)
    print(f"negate XLA  : {dt*1e3:7.3f} ms "
          f"({(2*nbytes_rd+2*nbytes_rd)/dt/1e9:6.1f} GB/s)")

    # ---- E2: int8 conv epilogue fusion ----------------------------------
    kq = jnp.clip(jax.random.normal(key, (3, 3, C, C)) * 30, -127, 127
                  ).astype(jnp.int8)
    xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * 20), -127, 127
                  ).astype(jnp.int8)

    conv = functools.partial(
        lax.conv_general_dilated, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)

    def conv_bare(xc):
        acc = conv(xc, kq)
        # cheapest possible carry-stabilizer: shift back to int8 range
        return (acc >> 8).astype(jnp.int8)

    dt_bare = scan_time(conv_bare, xq)
    print(f"conv int8 bare+shift : {dt_bare*1e3:7.3f} ms")

    scale = jnp.full((C,), 0.003, jnp.float32)

    def conv_dequant_requant(xc):
        acc = conv(xc, kq)
        y = acc.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
        y = jax.nn.silu(y)  # stand-in for the activation between convs
        return jnp.clip(jnp.round(y * jnp.bfloat16(12.7)), -127, 127
                        ).astype(jnp.int8)

    dt_full = scan_time(conv_dequant_requant, xq)
    print(f"conv int8 +deq/act/q : {dt_full*1e3:7.3f} ms "
          f"(epilogue cost {1e3*(dt_full-dt_bare):+.3f} ms)")

    # bf16 conv with the same epilogue for reference
    kb = (kq.astype(jnp.float32) * 0.003).astype(jnp.bfloat16)

    def conv_bf16_act(xc):
        y = lax.conv_general_dilated(
            xc, kb, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.silu(y)

    dt = scan_time(conv_bf16_act, xb)
    print(f"conv bf16 +act       : {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()

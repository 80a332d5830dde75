"""Probe: int8 vs bf16 matmul rates (XLA dot_general) on this chip.

If XLA int8 GEMM reaches ~2x the bf16 rate while XLA int8 *conv* only
reaches ~1.3x (perf_fusion_probe.py), then a conv-as-matmul Pallas kernel
(3x3 conv = 9 shifted (HW, Cin) x (Cin, Cout) MXU matmuls accumulated in
VMEM) can close the serving gap. If int8 GEMM is also ~1.3x, the chip or
toolchain caps int8 and the bench number is already near speed-of-light.

Usage: python scripts/perf_matmul_probe.py  (real chip)
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
    key = jax.random.PRNGKey(0)

    # conv-relevant GEMM shapes: M = B*H*W pixels, K/N = channels (and
    # K = 9*C for the full im2col contraction)
    shapes = [
        (1 << 20, 128, 128),
        (1 << 20, 1152, 128),   # im2col K = 9*128
        (1 << 18, 256, 256),
        (1 << 18, 2304, 256),   # im2col K = 9*256
        (8192, 8192, 8192),     # square reference point
    ]
    for M, K, N in shapes:
        flop = 2 * M * K * N

        a8 = jnp.ones((M, K), jnp.int8)
        b8 = jnp.ones((K, N), jnp.int8)

        # NOTE: carry must stay (M, K) int8 — rebuild it cheaply
        def mm8_carry(ac, b8=b8):
            acc = lax.dot_general(ac[:, :K], b8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
            # fold result back into an (M, K) int8 carry without a big copy:
            # use a slice-add on the first N columns
            upd = (acc >> 8).astype(jnp.int8)
            return lax.dynamic_update_slice(ac, upd[:, :min(N, K)], (0, 0))

        dt = scan_time(mm8_carry, a8, iters=10)
        print(f"int8  ({M:>8}x{K:>5}x{N:>5}): {dt*1e3:8.3f} ms "
              f"({flop/dt/1e12:6.1f} TOP/s)")

        ab = jnp.ones((M, K), jnp.bfloat16)
        bb = jnp.ones((K, N), jnp.bfloat16)

        def mmb_carry(ac, bb=bb):
            acc = lax.dot_general(ac[:, :K], bb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            upd = (acc * 0.01).astype(jnp.bfloat16)
            return lax.dynamic_update_slice(ac, upd[:, :min(N, K)], (0, 0))

        dt = scan_time(mmb_carry, ab, iters=10)
        print(f"bf16  ({M:>8}x{K:>5}x{N:>5}): {dt*1e3:8.3f} ms "
              f"({flop/dt/1e12:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()

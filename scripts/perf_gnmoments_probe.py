"""GN-from-int32-moments probe: can the dequant->GN->SiLU->requant chain
between int8 convs skip the bf16 intermediate?

Variant A (production): dequant the int32 accumulator to bf16, flax-style
GroupNorm (fast variance), SiLU, quantize to int8.
Variant B (moments): per-channel S1/S2 reductions read the int32 acc
directly; group statistics are assembled algebraically from the per-channel
dequant affine (mean_c = s_c*S1_c/n + b_c, etc. — same identity as
SplitGroupNorm); a single output pass reads the acc again and emits int8.
If XLA fuses A's dequant into both GN passes, A and B move the same bytes
and tie; if A materializes the bf16 intermediate, B wins ~20%.

Usage: python -u scripts/perf_gnmoments_probe.py    (real chip)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def scan_time(fn, x0, iters=20, reps=3, label=""):
    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(lambda c, _: (fn(c), None), x, None,
                              length=iters)
        return jnp.sum(out.astype(jnp.float32))

    float(run(x0))
    ts = []
    for _ in range(reps):
        a = time.perf_counter()
        float(run(x0))
        ts.append((time.perf_counter() - a) / iters)
    ms = 1e3 * sorted(ts)[len(ts) // 2]
    print(f"{label:46s} {ms:8.3f} ms/iter", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    for B, H, W, C in [(16, 256, 256, 128), (16, 128, 128, 256)]:
        G = 32
        gs = C // G
        acc = jnp.asarray(
            rng.integers(-30000, 30000, (B, H, W, C)), jnp.int32)
        s_c = jnp.asarray(rng.uniform(1e-4, 3e-4, (C,)), jnp.float32)
        b_c = jnp.asarray(rng.normal(0, 0.02, (C,)), jnp.float32)
        gamma = jnp.asarray(rng.normal(1, 0.05, (C,)), jnp.float32)
        beta = jnp.asarray(rng.normal(0, 0.02, (C,)), jnp.float32)
        inv_q = jnp.float32(127.0 / 4.0)  # activation quant scale
        eps = 1e-6
        n_pg = H * W * gs

        def chain_a(a):
            h = a.astype(jnp.float32) * s_c + b_c
            h = h.astype(jnp.bfloat16)
            hf = h.astype(jnp.float32)
            m = jnp.mean(hf.reshape(B, H * W, G, gs), axis=(1, 3))
            m2 = jnp.mean(
                (hf * hf).reshape(B, H * W, G, gs), axis=(1, 3))
            var = jnp.maximum(m2 - m * m, 0.0)
            mul = jax.lax.rsqrt(var + eps)
            mul_c = jnp.repeat(mul, gs, -1) * gamma
            add_c = beta - jnp.repeat(m, gs, -1) * mul_c
            y = hf * mul_c[:, None, None, :] + add_c[:, None, None, :]
            y = y * jax.nn.sigmoid(y)
            q = jnp.clip(jnp.round(y * inv_q), -127, 127).astype(jnp.int8)
            # keep carry int32 and data-dependent
            return a + q.astype(jnp.int32)

        def chain_b(a):
            af = a.astype(jnp.float32)
            S1 = jnp.sum(af.reshape(B, H * W, C), axis=1)        # (B, C)
            S2 = jnp.sum((af * af).reshape(B, H * W, C), axis=1)
            # dequant affine folded into channel moments
            m_c = s_c * S1 / (H * W) + b_c
            e2_c = (s_c * s_c) * S2 / (H * W) \
                + 2 * s_c * b_c * S1 / (H * W) + b_c * b_c
            m_g = jnp.mean(m_c.reshape(B, G, gs), axis=-1)
            e2_g = jnp.mean(e2_c.reshape(B, G, gs), axis=-1)
            var = jnp.maximum(e2_g - m_g * m_g, 0.0)
            mul = jax.lax.rsqrt(var + eps)
            mul_c = jnp.repeat(mul, gs, -1) * gamma              # (B, C)
            add_c = beta - jnp.repeat(m_g, gs, -1) * mul_c
            # single output pass: dequant + normalize + silu + quantize
            sm = (s_c[None, :] * mul_c)[:, None, None, :]
            ab = (b_c[None, :] * mul_c + add_c)[:, None, None, :]
            y = af * sm + ab
            y = y * jax.nn.sigmoid(y)
            q = jnp.clip(jnp.round(y * inv_q), -127, 127).astype(jnp.int8)
            return a + q.astype(jnp.int32)

        print(f"shape ({B},{H},{W},{C}) groups={G}")
        ta = scan_time(chain_a, acc, label="  A dequant->bf16->GN->SiLU->q")
        tb = scan_time(chain_b, acc, label="  B int32-moments fused")
        # numerics check
        ya = np.asarray(chain_a(acc) - acc)
        yb = np.asarray(chain_b(acc) - acc)
        match = np.mean(ya == yb)
        print(f"  int8 agreement: {100*match:.3f}%  "
              f"speedup {ta/tb:.3f}x", flush=True)


if __name__ == "__main__":
    main()

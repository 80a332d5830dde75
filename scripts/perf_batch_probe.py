"""int8 full-forward throughput vs batch size (round 3).

Round-3 measurements at NFE=101 (ms/fwd -> audio-s/s):
  B=8   27.95 -> 5.78      B=24  87.26 -> 5.56
  B=16  51.16 -> 6.32      B=32 101.36 -> 6.38
  B=20  86.78 -> 4.65      B=48 170.70 -> 5.68
                           B=64 201.58 -> 6.41
Non-powers-of-two regress badly (spatial-batch tiling); B=64 beats B=16
by only 1.4% at 4x the latency, so B=16 stays bench.py's default.

Usage: python -u scripts/perf_batch_probe.py [B ...]   (real chip)
       STORM_PROBE_BACKBONE=ncsnpplarge python -u scripts/perf_batch_probe.py 8
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
from scripts.perf_splitskip_probe import quant_tree  # noqa: E402


def scan_time(fn, x0, t, iters=10, reps=3, label="", nfe=101):
    @jax.jit
    def run(x, tt):
        def body(c, _):
            o = fn(c, tt)
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
    B = x0.shape[0]
    audio_s = B * 255 * 128 / 16000  # 2.04 s per utterance
    thr = audio_s / (ms * 1e-3 * nfe)
    print(f"{label:44s} {ms:8.2f} ms/fwd  -> NFE={nfe} {thr:5.2f} audio-s/s",
          flush=True)
    return ms


def main():
    batches = [int(a) for a in sys.argv[1:]] or [48, 64, 96]
    F, T = 256, 256
    rng = np.random.default_rng(0)
    bname = os.environ.get("STORM_PROBE_BACKBONE", "ncsnpp")
    if bname == "ncsnpp":
        net = NCSNpp(input_channels=6, dtype=jnp.bfloat16)
    else:
        from storm_tpu.backbones import BackboneRegistry

        net = BackboneRegistry.get_by_name(bname).from_kwargs(
            input_channels=6, dtype=jnp.bfloat16)
    x1 = jnp.asarray(rng.standard_normal((1, 3, F, T, 2)) * 0.3, jnp.bfloat16)
    t1 = jnp.full((1,), 0.5, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x1, t1)["params"]
    q = quant_tree(params)

    for B in batches:
        x = jnp.asarray(
            rng.standard_normal((B, 3, F, T, 2)) * 0.3, jnp.bfloat16)
        t = jnp.full((B,), 0.5, jnp.float32)
        try:
            scan_time(
                lambda c, tt: net.apply({"params": params, "quant": q}, c, tt),
                x, t, label=f"int8 {bname} B={B}")
        except Exception as e:  # noqa: BLE001 — OOM expected at large B
            print(f"int8 B={B}: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()

"""XLA flag sweep over the production int8 serving forward.

Tries a handful of TPU XLA flags that sometimes move conv-heavy
workloads, each in a fresh subprocess (XLA flags latch at backend init),
timing the 27.8M int8 batch-16 forward via the same scan harness as
perf_batch_probe. Honest-null expected: the defaults are usually right;
this pins that down with measurements instead of assumption.

Usage: python -u scripts/perf_xlaflags_probe.py    (real chip)
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

FLAG_SETS = [
    ("baseline", ""),
    ("latency-hiding-sched", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("async-all-fusion", "--xla_tpu_enable_async_collective_fusion=true"),
    ("vmem-128M", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("no-dot-strength-red", "--xla_tpu_enable_dot_strength_reduction=false"),
    ("flash-attn-off", "--xla_tpu_enable_flash_attention=false"),
]


def main():
    for name, flags in FLAG_SETS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run(
            [sys.executable, "-u", os.path.join(HERE, "perf_batch_probe.py"),
             "16"],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in r.stdout.splitlines() if "int8 B=16" in l]
        print(f"{name:24s} {line[0] if line else 'FAILED: ' + r.stderr[-200:]}",
              flush=True)


if __name__ == "__main__":
    main()

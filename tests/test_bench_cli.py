"""bench.py CLI smoke — the driver's headline metric comes from this
script, so its surface (one parseable JSON line, expected keys, the
production int8+deepcache defaults accepted) is pinned here on a tiny
CPU config. Throughput VALUES are only meaningful on the real chip
(BASELINE.md); this guards the harness, not the number."""
import json
import os
import subprocess
import sys

import pytest
pytestmark = pytest.mark.midweight  # CLI-subprocess e2e: cold jax import + trace per process


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_cli_smoke_json_contract():
    env = dict(os.environ)
    env["STORM_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--backbone", "ncsnpp12M", "--nf", "16", "--batch", "2",
         "--frames", "32", "--N", "2", "--reps", "1",
         "--quant", "int8", "--deepcache", "2"],
        capture_output=True, text=True, timeout=1500, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {out.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "audio_sec_per_sec_per_chip_50step_pc"
    assert rec["unit"] == "audio-sec/s/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    d = rec["detail"]
    assert d["backend"] == "cpu"
    assert d["quant"] == "int8" and d["deepcache"] == 2
    assert d["backbone"] == "ncsnpp12M"
    assert d["nfe"] == 2 * 2 + 1  # N steps x (1 ald corrector + 1 predictor)

"""End-to-end distillation through the CLIs: train a tiny storm teacher,
distill it (--mode distill --teacher_ckpt), then serve the distilled
checkpoint through enhancement.py. Subprocesses run on a single CPU device
via the STORM_TPU_PLATFORM override (same harness as test_train_cli)."""
import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest
pytestmark = pytest.mark.midweight  # CLI-subprocess e2e: cold jax import + trace per process


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from storm_tpu.data.audio import save_wav

    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for subset, n_files in (("tr", 4), ("cv", 2)):
        for kind in ("clean", "noisy"):
            os.makedirs(root / subset / kind)
        for i in range(n_files):
            n = int(rng.integers(8000, 12000))
            x = 0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
            save_wav(root / subset / "clean" / f"u{i}.wav", x)
            save_wav(root / subset / "noisy" / f"u{i}.wav",
                     x + 0.05 * rng.standard_normal(n))
    return str(root)


def _run(script, args, timeout=1500):
    env = dict(os.environ)
    env["STORM_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:] + out.stdout[-2000:]
    return out.stdout


def test_distill_train_and_serve(corpus, tmp_path):
    common = ["--base_dir", corpus, "--format", "wsj0", "--batch_size", "2",
              "--num_frames", "32", "--num_workers", "2",
              "--num_eval_files", "0", "--max_steps", "2",
              "--max_epochs", "1"]

    # 1. tiny storm teacher
    _run("train.py", ["--mode", "regen-joint-training", "--nf", "8",
                      "--ch_mult", "1,1",
                      "--log_dir", str(tmp_path / "teacher")] + common)
    teacher = glob.glob(str(tmp_path / "teacher" / "*" / "checkpoints"
                            / "last"))[0]

    # 2. distill it: architecture comes from the teacher checkpoint (no
    #    --nf/--ch_mult here), student initializes from its EMA weights
    out = _run("train.py", ["--mode", "distill", "--teacher_ckpt", teacher,
                            "--distill_N", "2", "--distill_method", "euler",
                            "--log_dir", str(tmp_path / "student")] + common)
    assert "distilling teacher" in out
    student = glob.glob(str(tmp_path / "student" / "mode=distill*"
                            / "checkpoints" / "last"))[0]
    with open(os.path.join(student, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["mode"] == "distill" and cfg["nf"] == 8

    # 3. distilled checkpoint serves through the standard enhancement CLI
    out_dir = tmp_path / "enhanced"
    _run("enhancement.py", ["--test_dir", os.path.join(corpus, "cv", "noisy"),
                            "--enhanced_dir", str(out_dir), "--ckpt", student,
                            "--mode", "distill", "--timeit"])
    wavs = sorted(glob.glob(str(out_dir / "*.wav")))
    assert len(wavs) == 2
    from storm_tpu.data.audio import load_wav

    for w in wavs:
        data, sr = load_wav(w)
        assert sr == 16000 and np.isfinite(data).all()

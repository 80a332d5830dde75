#!/usr/bin/env python3
"""Wind-noise generation CLI (reference preprocessing/simulate_wind_noise.py).

The reference drives the undistributed Mirabilii et al. WindNoiseGenerator;
here the native generator in storm_tpu.preprocessing.wind is used with the
same wind-profile sampling scheme (gustiness, magnitude range, bounded
transitions — simulate_wind_noise.py:37-48).
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_tpu.preprocessing.wind import WindNoiseGenerator, make_wind_profile

SEED = 100

wind_params = {
    "duration": 8,
    "fs": 16000,
    "gustiness_range": [1, 10],
    "wind_profile_magnitude_range": [200, 500],
    "wind_profile_acceptable_transition_threshold": 100,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", type=str, required=True)
    parser.add_argument("--n", type=int, required=True,
                        help="number of samples")
    parser.add_argument("--sr", default=16000, type=int)
    args = parser.parse_args()

    if os.path.exists(args.dir):
        shutil.rmtree(args.dir)
    os.makedirs(args.dir, exist_ok=True)

    rng = np.random.default_rng(SEED)
    for i in range(args.n):
        gustiness = rng.uniform(*wind_params["gustiness_range"])
        profile = make_wind_profile(
            rng, gustiness,
            magnitude_range=wind_params["wind_profile_magnitude_range"],
            transition_threshold=wind_params[
                "wind_profile_acceptable_transition_threshold"],
        )
        wn = WindNoiseGenerator(
            fs=args.sr, duration=wind_params["duration"], generate=True,
            wind_profile=profile, gustiness=gustiness, start_seed=SEED + i,
        )
        signal, _ = wn.generate_wind_noise()
        wn.save_signal(signal, os.path.join(args.dir, f"simulated_{i}.wav"))
    print(f"wrote {args.n} wind noise files to {args.dir}")


if __name__ == "__main__":
    main()

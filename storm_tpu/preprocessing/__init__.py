"""Offline dataset-creation layer (≙ reference L7, preprocessing/).

Native numpy implementations replace the reference's external dependencies
(pyroomacoustics -> room.py, ffmpeg sidechaincompress -> compressor.py,
the undistributed WindNoiseGenerator -> wind.py).
"""
from .compressor import hard_clip, nonlinear_mix, sidechain_compress
from .room import (
    inverse_sabine,
    measure_rt60,
    shoebox_rir,
    simulate_dry,
    simulate_shoebox,
)
from .utils import obtain_noise_file
from .wind import WindNoiseGenerator, generate_wind_noise, make_wind_profile

__all__ = [
    "sidechain_compress",
    "nonlinear_mix",
    "hard_clip",
    "inverse_sabine",
    "shoebox_rir",
    "simulate_shoebox",
    "simulate_dry",
    "measure_rt60",
    "obtain_noise_file",
    "WindNoiseGenerator",
    "generate_wind_noise",
    "make_wind_profile",
]

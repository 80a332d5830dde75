from .predictors import PredictorRegistry
from .correctors import CorrectorRegistry
from .samplers import get_pc_sampler, get_ode_sampler, pc_sample, ode_sample

__all__ = [
    "PredictorRegistry",
    "CorrectorRegistry",
    "get_pc_sampler",
    "get_ode_sampler",
    "pc_sample",
    "ode_sample",
]

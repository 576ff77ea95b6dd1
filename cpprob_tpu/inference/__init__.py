from .resampling import (
    ess,
    get_resampler,
    multinomial_resample,
    residual_resample,
    stratified_resample,
    systematic_resample,
)
from .sis import ImportanceResult, make_particle_fn, make_prior_fn, sis
from .smc import SMCResult, StateSpaceModel, smc

__all__ = [
    "sis",
    "smc",
    "ImportanceResult",
    "SMCResult",
    "StateSpaceModel",
    "make_particle_fn",
    "make_prior_fn",
    "systematic_resample",
    "stratified_resample",
    "multinomial_resample",
    "residual_resample",
    "ess",
    "get_resampler",
]

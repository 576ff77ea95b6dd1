from .resampling import (
    ess,
    get_resampler,
    multinomial_resample,
    residual_resample,
    stratified_resample,
    systematic_resample,
)
from .csis import CSIS
from .csis_dynamic import DynamicCSIS, sis_host
from .chees import chees_hmc
from .hmc import HMCResult, hmc
from .nuts import nuts
from .particle_gibbs import CSMCResult, csmc_sweep, particle_gibbs
from .potential import FlatModel, flatten_model
from .predictive import posterior_predictive, prior_predictive
from .sis import (
    ImportanceResult,
    StreamingResult,
    make_particle_fn,
    make_prior_fn,
    sis,
    sis_streaming,
    sis_streaming_checkpointed,
)
from .smc import SMCResult, StateSpaceModel, build_smc_run, smc
from .smc2 import ParamSSM, SMC2Result, smc2
from .smc_sampler import TemperedSMCResult, smc_sampler
from .svi import SVIResult, svi

__all__ = [
    "sis",
    "sis_streaming",
    "sis_streaming_checkpointed",
    "smc",
    "build_smc_run",
    "smc_sampler",
    "smc2",
    "ParamSSM",
    "SMC2Result",
    "TemperedSMCResult",
    "CSIS",
    "csmc_sweep",
    "particle_gibbs",
    "CSMCResult",
    "hmc",
    "chees_hmc",
    "nuts",
    "HMCResult",
    "svi",
    "SVIResult",
    "flatten_model",
    "posterior_predictive",
    "prior_predictive",
    "FlatModel",
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

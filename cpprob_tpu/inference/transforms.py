"""Support bijections for gradient-based inference (HMC/NUTS/SVI) — maps each
continuous latent site to unconstrained space with log-Jacobian corrections.

The reference has no gradient-based engines at all (SURVEY.md: SMC/MCMC/VI
absent); these transforms are the substrate for the north-star extensions.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..distributions import (
    Beta,
    Cauchy,
    Exponential,
    Gamma,
    HalfNormal,
    Laplace,
    LogNormal,
    MinMaxContinuous,
    MultivariateNormalDiag,
    MultivariateNormalFull,
    Normal,
    StudentT,
    Truncated,
    Uniform,
)

__all__ = ["Transform", "IDENTITY", "biject_for"]


@dataclasses.dataclass(frozen=True)
class Transform:
    """z (unconstrained) -> x (support); ``log_det`` is d log|dx/dz|."""

    forward: Callable
    inverse: Callable
    log_det: Callable  # log |dx/dz| evaluated at z


IDENTITY = Transform(
    forward=lambda z: z,
    inverse=lambda x: x,
    log_det=lambda z: jnp.zeros(jnp.shape(z)),
)


def _positive() -> Transform:
    # x = exp(z)
    return Transform(
        forward=jnp.exp,
        inverse=jnp.log,
        log_det=lambda z: z,
    )


def _interval(low, high) -> Transform:
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    width = high - low

    def fwd(z):
        return low + width * jax.nn.sigmoid(z)

    def inv(x):
        p = jnp.clip((x - low) / width, 1e-6, 1.0 - 1e-6)
        return jnp.log(p) - jnp.log1p(-p)

    def ld(z):
        return jnp.log(width) + jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z)

    return Transform(fwd, inv, ld)


def biject_for(dist) -> Optional[Transform]:
    """Transform whose image is the support of ``dist``; None for discrete or
    unsupported distributions (those sites cannot be HMC latents)."""
    if isinstance(dist, (Normal, Laplace, MultivariateNormalDiag,
                         MultivariateNormalFull, StudentT, Cauchy)):
        return IDENTITY
    if isinstance(dist, (Gamma, Exponential, LogNormal, HalfNormal)):
        return _positive()
    if isinstance(dist, Uniform):
        return _interval(dist.low, dist.high)
    if isinstance(dist, Beta):
        return _interval(0.0, 1.0)
    if isinstance(dist, MinMaxContinuous):
        return _interval(dist.low, dist.high)
    if isinstance(dist, Truncated):
        return _interval(dist.low, dist.high)
    return None

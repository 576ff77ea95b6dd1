"""Conjugate-Gaussian models — counterparts of
``include/models/models.hpp:22-65`` and ``src/models/gaussian.cpp:5-18``.

These are the correctness gates: with observations (3, 4) the exact posterior
of ``gaussian_unknown_mean`` is N(2.32353, 1.05882) (``README.md:100,118``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import observe, predict, sample
from ..distributions import MultivariateNormalDiag, Normal

__all__ = [
    "gaussian_unknown_mean",
    "gaussian_unknown_mean_readme",
    "gaussian_2d_unknown_mean",
    "Gauss",
    "gaussian_posterior_analytic",
]

_SQRT5 = math.sqrt(5.0)
_SQRT2 = math.sqrt(2.0)
_SQRT3 = math.sqrt(3.0)


def gaussian_unknown_mean(y1, y2):
    """mu ~ N(1, sqrt(5)); y_i ~ N(mu, sqrt(2)) (``models.hpp:22-35``)."""
    mu = sample(Normal(1.0, _SQRT5), addr="mu")
    likelihood = Normal(mu, _SQRT2)
    observe(likelihood, y1, addr="y1")
    observe(likelihood, y2, addr="y2")
    predict(mu, "Mu")
    return mu


def gaussian_unknown_mean_readme(y1, y2):
    """The README/gaussian.cpp variant (``src/models/gaussian.cpp:5-18``):
    mu ~ N(1, 1.5); y_i ~ N(mu, 2); predict "Mean".  With (3, 4) the exact
    posterior is N(2.32353, 1.05882) — the reference's headline correctness
    constant (``README.md:100,118``)."""
    mu = sample(Normal(1.0, 1.5), addr="mu")
    likelihood = Normal(mu, 2.0)
    observe(likelihood, y1, addr="y1")
    observe(likelihood, y2, addr="y2")
    predict(mu, "Mean")
    return mu


class Gauss:
    """Callable-object form (tests functor support, ``models.hpp:51-65``)."""

    def __call__(self, y1, y2):
        return gaussian_unknown_mean(y1, y2)


def gaussian_2d_unknown_mean(y):
    """2-d diagonal-MVN unknown mean (``models.hpp:38-49``):
    mu ~ N([1,2], diag[sqrt5, sqrt3]); y ~ N(mu, sqrt2 * I)."""
    prior = MultivariateNormalDiag(
        jnp.array([1.0, 2.0]), jnp.array([_SQRT5, _SQRT3])
    )
    mu = sample(prior, addr="mu")
    observe(MultivariateNormalDiag(mu, _SQRT2), jnp.asarray(y), addr="y")
    predict(mu, "Mu")
    return mu


def gaussian_posterior_analytic(ys, mu0=1.0, sigma0=_SQRT5, sigma=_SQRT2):
    """Exact conjugate posterior N(mu_n, sigma_n^2) for checking estimates
    (cf. ``README.md:118``: ys=(3,4) -> mean 2.32353, var 1.05882)."""
    ys = jnp.atleast_1d(jnp.asarray(ys, jnp.float64 if jnp.asarray(ys).dtype == jnp.float64 else jnp.float32))
    n = ys.shape[0]
    prec = 1.0 / (sigma0 * sigma0) + n / (sigma * sigma)
    var_n = 1.0 / prec
    mean_n = var_n * (mu0 / (sigma0 * sigma0) + jnp.sum(ys) / (sigma * sigma))
    return mean_n, var_n

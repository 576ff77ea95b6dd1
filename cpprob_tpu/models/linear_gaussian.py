"""Linear-Gaussian state-space model — counterpart of
``include/models/models.hpp:67-80`` (``linear_gaussian_1d<N>``; N=50 in the CLI).

Both trace form (for SIS/CSIS) and SSM form (for SMC + exact Kalman check).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import observe, predict, sample
from ..distributions import Normal
from ..inference.smc import StateSpaceModel

__all__ = ["linear_gaussian_1d", "linear_gaussian_ssm", "kalman_filter_1d"]


def linear_gaussian_1d(observations):
    """x_t ~ N(x_{t-1}, 1), y_t ~ N(x_t, 1), x_0 = 0 (``models.hpp:67-80``)."""
    observations = jnp.asarray(observations)
    state = jnp.zeros(())
    for t in range(observations.shape[0]):
        state = sample(Normal(state, 1.0), addr=f"x[{t}]")
        observe(Normal(state, 1.0), observations[t], addr=f"y[{t}]")
        predict(state, "State")
    return state


linear_gaussian_ssm = StateSpaceModel(
    init_sample=lambda key: jax.random.normal(key, ()),
    init_logpdf=lambda s: Normal(0.0, 1.0).log_prob(s),
    step_sample=lambda key, s, t: s + jax.random.normal(key, ()),
    step_logpdf=lambda ns, s, t: Normal(s, 1.0).log_prob(ns),
    obs_logpdf=lambda s, y, t: Normal(s, 1.0).log_prob(y),
    init_sample_batch=lambda key, n: jax.random.normal(key, (n,)),
    step_sample_batch=lambda key, s, t: s + jax.random.normal(key, s.shape),
    obs_logpdf_batch=lambda s, y, t: -0.5 * (y - s) ** 2 - 0.9189385332046727,
    obs_sample=lambda key, s, t: s + jax.random.normal(key, ()),
    # scalar continuous state => sorted-population systematic resampler
    # (no per-particle gather) when no history is stored
    scalar_state=True,
)


def kalman_filter_1d(observations, q=1.0, r=1.0):
    """Exact filtered means/variances + log-evidence for the model above
    (ground truth for SMC tests).  Prior x_0 ~ N(0, q); transitions add q;
    observations have variance r."""
    observations = jnp.asarray(observations)

    def step(carry, y):
        m_pred, p_pred, ll = carry
        s = p_pred + r
        k = p_pred / s
        m = m_pred + k * (y - m_pred)
        p = (1.0 - k) * p_pred
        ll = ll + Normal(m_pred, jnp.sqrt(s)).log_prob(y)
        return (m + 0.0, p + q, ll), (m, p)

    # time 0: predictive x_0 ~ N(0, q)
    (mf, pf, ll), (ms, ps) = jax.lax.scan(
        step, (jnp.zeros(()), jnp.asarray(q), jnp.zeros(())), observations
    )
    return ms, ps, ll

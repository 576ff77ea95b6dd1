"""Discrete distributions — counterparts of the reference's discrete Boost
adoptions (``utils_discrete.hpp``, ``utils_poisson.hpp``, ``utils_uniform_smallint.hpp``)
plus the custom ``min_max_discrete_distribution`` (``min_max_discrete.hpp``).

Draws are integer arrays; ``log_prob`` broadcasts over batch shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special

from .base import Distribution, dist_dataclass, promote_to_result_dtype

__all__ = [
    "Categorical",
    "Discrete",
    "UniformInt",
    "Poisson",
    "Bernoulli",
    "Flip",
    "MinMaxDiscrete",
]


@dist_dataclass
class Categorical(Distribution):
    """Distribution over {0..K-1} with unnormalized ``probs`` (last axis) —
    counterpart of ``boost::random::discrete_distribution`` (``utils_discrete.hpp:18-27``:
    logpdf normalizes by the probability sum)."""

    probs: jax.Array  # (..., K), unnormalized non-negative weights

    is_discrete = True

    @property
    def batch_shape(self):
        return jnp.shape(self.probs)[:-1]

    def _logits(self):
        (p,) = promote_to_result_dtype(self.probs)
        return jnp.log(p)

    def sample(self, key, sample_shape=()):
        logits = self._logits()
        shape = sample_shape + jnp.shape(logits)[:-1]
        return jax.random.categorical(key, logits, axis=-1, shape=shape)

    def log_prob(self, x):
        logits = self._logits()
        norm = jsp_special.logsumexp(logits, axis=-1)
        x = jnp.asarray(x, jnp.int32)
        k = jnp.shape(logits)[-1]
        inside = (x >= 0) & (x < k)
        xc = jnp.clip(x, 0, k - 1)
        batch = jnp.broadcast_shapes(jnp.shape(logits)[:-1], jnp.shape(x))
        logits_b = jnp.broadcast_to(logits, batch + (k,))
        xc_b = jnp.broadcast_to(xc, batch)
        lp = jnp.take_along_axis(
            logits_b, xc_b[..., None], axis=-1
        )[..., 0] - jnp.broadcast_to(norm, batch)
        return jnp.where(inside, lp, -jnp.inf)

    @property
    def mean(self):
        (p,) = promote_to_result_dtype(self.probs)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        k = jnp.arange(jnp.shape(p)[-1], dtype=p.dtype)
        return jnp.sum(p * k, axis=-1)

    @property
    def variance(self):
        (p,) = promote_to_result_dtype(self.probs)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        k = jnp.arange(jnp.shape(p)[-1], dtype=p.dtype)
        m = jnp.sum(p * k, axis=-1)
        return jnp.sum(p * k * k, axis=-1) - m * m


# Reference name (protocol::Discrete).
Discrete = Categorical


@dist_dataclass
class UniformInt(Distribution):
    """Uniform over integers [low, high] inclusive — counterpart of
    ``boost::random::uniform_smallint`` (``utils_uniform_smallint.hpp``).
    Its CSIS proposal is :class:`MinMaxDiscrete`."""

    low: jax.Array
    high: jax.Array

    is_discrete = True

    def sample(self, key, sample_shape=()):
        low = jnp.asarray(self.low, jnp.int32)
        high = jnp.asarray(self.high, jnp.int32)
        shape = sample_shape + jnp.broadcast_shapes(jnp.shape(low), jnp.shape(high))
        return jax.random.randint(key, shape, low, high + 1)

    def log_prob(self, x):
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        x = jnp.asarray(x)
        n = jnp.asarray(high - low + 1, jnp.float32)
        inside = (x >= low) & (x <= high)
        return jnp.where(inside, -jnp.log(n), -jnp.inf)

    @property
    def mean(self):
        low, high = promote_to_result_dtype(self.low, self.high)
        return 0.5 * (low + high)

    @property
    def variance(self):
        low, high = promote_to_result_dtype(self.low, self.high)
        n = high - low + 1.0
        return (n * n - 1.0) / 12.0


@dist_dataclass
class Poisson(Distribution):
    """Poisson(rate) — counterpart of ``boost::random::poisson_distribution``
    (``utils_poisson.hpp``)."""

    rate: jax.Array

    is_discrete = True

    def sample(self, key, sample_shape=()):
        (rate,) = promote_to_result_dtype(self.rate)
        shape = sample_shape + jnp.shape(rate)
        return jax.random.poisson(key, rate, shape=shape)

    def log_prob(self, x):
        (rate,) = promote_to_result_dtype(self.rate)
        xf = jnp.asarray(x, rate.dtype)
        lp = xf * jnp.log(rate) - rate - jsp_special.gammaln(xf + 1.0)
        return jnp.where(xf >= 0, lp, -jnp.inf)

    @property
    def mean(self):
        (rate,) = promote_to_result_dtype(self.rate)
        return rate

    @property
    def variance(self):
        (rate,) = promote_to_result_dtype(self.rate)
        return rate


@dist_dataclass
class Bernoulli(Distribution):
    """Flip(p) — counterpart of the protocol's ``Flip`` table (``infcomp.fbs``)."""

    p: jax.Array

    is_discrete = True

    def sample(self, key, sample_shape=()):
        (p,) = promote_to_result_dtype(self.p)
        shape = sample_shape + jnp.shape(p)
        return jax.random.bernoulli(key, p, shape=shape).astype(jnp.int32)

    def log_prob(self, x):
        (p,) = promote_to_result_dtype(self.p)
        x = jnp.asarray(x, p.dtype)
        return jnp.where(x == 1, jnp.log(p), jnp.log1p(-p))

    @property
    def mean(self):
        (p,) = promote_to_result_dtype(self.p)
        return p

    @property
    def variance(self):
        (p,) = promote_to_result_dtype(self.p)
        return p * (1.0 - p)


Flip = Bernoulli


@dist_dataclass
class MinMaxDiscrete(Distribution):
    """Discrete distribution with explicit integer support [low, low+K-1] —
    counterpart of ``min_max_discrete_distribution`` (``min_max_discrete.hpp``),
    the CSIS proposal for :class:`UniformInt`."""

    low: jax.Array
    probs: jax.Array  # (..., K) unnormalized weights over [low, low+K-1]

    is_discrete = True

    @property
    def batch_shape(self):
        return jnp.shape(self.probs)[:-1]

    def sample(self, key, sample_shape=()):
        (p,) = promote_to_result_dtype(self.probs)
        logits = jnp.log(p)
        shape = sample_shape + jnp.shape(logits)[:-1]
        idx = jax.random.categorical(key, logits, axis=-1, shape=shape)
        return idx + jnp.asarray(self.low, idx.dtype)

    def log_prob(self, x):
        inner = Categorical(self.probs)
        return inner.log_prob(jnp.asarray(x) - jnp.asarray(self.low))

    @property
    def mean(self):
        low, = promote_to_result_dtype(self.low)
        return Categorical(self.probs).mean + low

    @property
    def variance(self):
        return Categorical(self.probs).variance

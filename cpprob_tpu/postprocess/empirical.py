"""Weighted empirical distributions — counterpart of the reference's
``include/cpprob/postprocess/empirical_distribution.hpp`` (logsumexp-normalized
weighted moments, ``empirical_distribution.hpp:117-143``) — computed on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special

__all__ = ["EmpiricalDistribution"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmpiricalDistribution:
    """Values + log-weights; moments use the max-shift logsumexp trick
    (``empirical_distribution.hpp:125-143``) for stability at 10^7+ particles.

    ``values`` may be (n,) or (n, ...) — moments reduce over the particle
    axis 0 and broadcast over trailing event dims.
    """

    values: jax.Array
    log_weights: jax.Array  # (n,)

    def _norm_weights(self) -> jax.Array:
        lw = self.log_weights - jsp_special.logsumexp(self.log_weights)
        w = jnp.exp(lw)
        extra = self.values.ndim - 1
        return w.reshape(w.shape + (1,) * extra) if extra > 0 else w

    @property
    def mean(self) -> jax.Array:
        w = self._norm_weights()
        v = jnp.asarray(self.values, jnp.result_type(self.values, jnp.float32))
        return jnp.sum(w * v, axis=0)

    @property
    def variance(self) -> jax.Array:
        w = self._norm_weights()
        v = jnp.asarray(self.values, jnp.result_type(self.values, jnp.float32))
        m = jnp.sum(w * v, axis=0)
        return jnp.sum(w * (v - m) ** 2, axis=0)

    @property
    def std(self) -> jax.Array:
        return jnp.sqrt(self.variance)

    @property
    def ess(self) -> jax.Array:
        lw = self.log_weights - jsp_special.logsumexp(self.log_weights)
        return jnp.exp(-jsp_special.logsumexp(2.0 * lw))

    # -- discrete-support utilities (reference: normalized table + MAP,
    #    stats_printer.hpp:42-79) --------------------------------------
    def distribution(self, num_values: int) -> jax.Array:
        """Normalized probability table over integer support {0..num_values-1}.

        For (n, ...) values returns (..., num_values)."""
        w = self._norm_weights()
        v = jnp.asarray(self.values, jnp.int32)
        onehot = jax.nn.one_hot(v, num_values, dtype=w.dtype)
        return jnp.sum(w[..., None] * onehot, axis=0)

    def map_estimate(self, num_values: int) -> jax.Array:
        return jnp.argmax(self.distribution(num_values), axis=-1)

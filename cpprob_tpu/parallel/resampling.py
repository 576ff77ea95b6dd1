"""Distributed resampling over a particle-sharded mesh.

Runs inside ``jax.shard_map`` bodies: per-shard weight slices, XLA collectives
for the global quantities (SURVEY.md §2.7's TPU-native plan; algorithmic shape
follows Murray et al., 'Parallel resampling in the particle filter',
arXiv:1301.4019).

Two schemes:

- ``collective``: *exact* global systematic resampling.  Per-shard prefix sums
  + a small ``all_gather`` of shard totals build the global CDF offsets; the
  comb positions for this shard's output slots are matched against the
  all-gathered CDF; ancestor states are fetched by global index from the
  all-gathered states.  O(N) total comm per resampling epoch, triggered only
  when ESS collapses.

- ``island``: zero-data-motion approximation (island particle model, Vergé
  et al. 2013): each shard resamples locally; shard-level weight totals are
  carried as island weights.  Only scalar collectives cross the ICI — the
  fast path for throughput benchmarks at very large N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special

__all__ = [
    "global_ess",
    "global_log_mean_exp",
    "sharded_systematic_ancestors",
    "local_systematic_ancestors",
]


def global_log_mean_exp(log_w_local: jax.Array, axis_name: str) -> jax.Array:
    """logmeanexp over the full sharded weight vector (replicated result)."""
    n_local = log_w_local.shape[0]
    k = jax.lax.psum(1, axis_name)
    m_local = jnp.max(log_w_local)
    m = jax.lax.pmax(m_local, axis_name)
    s = jax.lax.psum(jnp.sum(jnp.exp(log_w_local - m)), axis_name)
    return m + jnp.log(s) - jnp.log(jnp.asarray(n_local * k, jnp.float32))


def global_ess(log_w_local: jax.Array, axis_name: str) -> jax.Array:
    """Kish ESS of the full sharded weight vector (replicated result)."""
    m = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w = jnp.exp(log_w_local - m)
    s1 = jax.lax.psum(jnp.sum(w), axis_name)
    s2 = jax.lax.psum(jnp.sum(w * w), axis_name)
    return (s1 * s1) / s2


def sharded_systematic_ancestors(
    u0: jax.Array, log_w_local: jax.Array, axis_name: str
) -> jax.Array:
    """Exact global systematic resampling: returns *global* ancestor indices
    (int32, shape (n_local,)) for this shard's output slots
    [my*n_local, (my+1)*n_local).

    ``u0`` must be the same uniform on every shard (replicated key).
    """
    n_local = log_w_local.shape[0]
    my = jax.lax.axis_index(axis_name)
    k = jax.lax.psum(1, axis_name)
    n_total = n_local * k

    m = jax.lax.pmax(jnp.max(log_w_local), axis_name)
    w = jnp.exp(log_w_local - m)                       # (n_local,)
    local_cum = jnp.cumsum(w)                          # inclusive prefix sum
    local_sum = local_cum[-1]
    sums = jax.lax.all_gather(local_sum, axis_name)    # (k,) shard totals
    total = jnp.sum(sums)
    offsets = jnp.concatenate([jnp.zeros((1,), w.dtype), jnp.cumsum(sums)[:-1]])

    # Global normalized CDF of *this* shard's slice, then all-gather: (k, n_local)
    my_cdf = (local_cum + offsets[my]) / total
    full_cdf = jax.lax.all_gather(my_cdf, axis_name).reshape(n_total)

    from ..inference.resampling import systematic_ancestors_from_cdf

    # scatter+cummax over the full comb (10x faster than searchsorted on TPU),
    # then slice this shard's output slots
    anc_full = systematic_ancestors_from_cdf(
        full_cdf, jnp.asarray(u0, full_cdf.dtype), n_total
    )
    return jax.lax.dynamic_slice(anc_full, (my * n_local,), (n_local,))


def local_systematic_ancestors(
    u0: jax.Array, log_w_local: jax.Array, axis_name: str
) -> jax.Array:
    """Island-model resampling: systematic within the shard only; returns
    *local* ancestor indices.  The caller keeps the island's mean weight as
    the carried log-weight so evidence estimates stay unbiased at the island
    level."""
    n_local = log_w_local.shape[0]
    m = jnp.max(log_w_local)
    w = jnp.exp(log_w_local - m)
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]
    # decorrelate the comb across shards
    u = jnp.mod(u0 + jax.lax.axis_index(axis_name).astype(cdf.dtype) * 0.6180339887, 1.0)
    positions = (u + jnp.arange(n_local, dtype=cdf.dtype)) / n_local
    anc = jnp.searchsorted(cdf, positions, side="right")
    return jnp.clip(anc, 0, n_local - 1).astype(jnp.int32)

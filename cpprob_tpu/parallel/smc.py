"""Mesh-sharded SMC: particles sharded over the mesh, time as ``lax.scan``,
resampling via collectives — the TPU-native replacement for the reference's
nonexistent distributed story (SURVEY.md §2.7) and the core of the BASELINE
north-star (≥10M particles/s/chip, ≥85% weak scaling).

The whole sweep is ONE ``shard_map``-ped, jitted program: XLA sees per-chip
kernels with explicit ``psum``/``all_gather``/``pmax`` collectives only at the
ESS check and at (rare, ESS-triggered) resampling epochs.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..inference.smc import StateSpaceModel
from .mesh import PARTICLE_AXIS, particle_mesh
from .resampling import (
    balanced_systematic_resample,
    global_ess,
    global_log_mean_exp,
    local_systematic_ancestors,
    ring_systematic_resample,
)

__all__ = ["ShardedSMCResult", "smc_sharded"]


class ShardedSMCResult(NamedTuple):
    final_states: jax.Array      # (N, ...) sharded over particles
    final_log_weights: jax.Array  # (N,) sharded
    log_evidence: jax.Array      # scalar (replicated)
    ess_history: jax.Array       # (T,) global ESS before each step
    resampled: jax.Array         # (T,) bool
    tracked: Optional[jax.Array]  # (T, ...) weighted means of track_fn, or None


def smc_sharded(
    model: StateSpaceModel,
    observations: jax.Array,
    n_particles: int,
    key: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    ess_threshold: float = 0.5,
    scheme: str = "collective",
    track_fn: Optional[Callable] = None,
    balance_bound: Optional[int] = None,
    chunk: int = 1,
) -> ShardedSMCResult:
    """Run SMC with the particle axis sharded over ``mesh``.

    ``scheme='collective'``: exact global systematic resampling (all-gather of
    the weight CDF + ancestor states).  ``scheme='balanced'``: exact global
    systematic resampling with **O(balance_bound) comm per epoch** — the
    pod-viable exact scheme for continuous (scalar or vector) states: scalar
    collectives pick per-shard offspring segments, production is local, and
    only fixed-size boundary buffers cross the ICI (automatic exact-ring
    fallback when cross-shard weight imbalance exceeds the bound; see
    :func:`~cpprob_tpu.parallel.resampling.balanced_systematic_resample`).
    ``scheme='island'``: shard-local resampling, island weights carried in
    the particle weights — zero data motion, scalar collectives only.
    ``scheme='exchange'`` (discrete scalar states, requires
    ``model.state_categories``): exact global systematic resampling under the
    sorted-by-state exchangeable ordering — the resample is a ``psum`` of K
    category weights + O(K) scalar math, and each shard synthesizes its slice
    of the sorted global population from its global slot range.  No particle
    data crosses the ICI at all (see ``inference/resampling.py`` for the
    statistical argument).

    ``chunk`` > 1 (requires a ``fused_chunk_batch``/``fused_chunk_t_batch``
    kernel on the model, ``track_fn=None``): each shard runs ``chunk``
    timesteps per fused kernel launch with its particle tile VMEM-resident
    (the single-chip ``build_smc_run(chunk=)`` fast path), and the global
    ESS check + distributed resample move to chunk boundaries — the
    pod-scale configuration the comms model predicts: fused compute with
    resampling epochs that cost O(bound) comm under ``scheme='balanced'``.
    """
    mesh = mesh or particle_mesh()
    n_dev = mesh.size
    if n_particles % n_dev != 0:
        raise ValueError(f"n_particles must divide by mesh size {n_dev}")
    n_local = n_particles // n_dev
    if scheme not in ("collective", "balanced", "island", "exchange"):
        raise ValueError(f"unknown scheme {scheme!r}")
    if scheme == "exchange" and model.state_categories is None:
        raise ValueError(
            "scheme='exchange' needs a discrete state space "
            "(model.state_categories)"
        )
    if chunk > 1:
        if (model.fused_chunk_batch is None
                and model.fused_chunk_t_batch is None):
            raise ValueError(
                "chunk > 1 needs a fused_chunk_batch/fused_chunk_t_batch "
                "kernel on the model"
            )
        if track_fn is not None:
            raise ValueError("chunk > 1 does not support track_fn")
        return _smc_sharded_chunked(
            model, observations, n_particles, key, mesh=mesh,
            ess_threshold=ess_threshold, scheme=scheme,
            balance_bound=balance_bound, chunk=chunk,
        )
    T = observations.shape[0]

    def shard_body(key_rep, obs):
        axis = PARTICLE_AXIS
        my = jax.lax.axis_index(axis)

        def local_keys(tag):
            k = jax.random.fold_in(key_rep, tag)
            k = jax.random.fold_in(k, my)
            return jax.random.split(k, n_local)

        # --- init (t = 0) ---
        init_keys = local_keys(0)
        states = jax.vmap(model.init_sample)(init_keys)
        log_w = jax.vmap(lambda s: model.obs_logpdf(s, obs[0], 0))(states)

        def resample(t, states, log_w, log_z):
            u_key = jax.random.fold_in(key_rep, 1_000_000 + 7)
            u0 = jax.random.uniform(jax.random.fold_in(u_key, t), ())
            if scheme == "collective":
                # exact global systematic resample with O(N/shard) peak
                # memory: ring ppermute of (states, CDF-segment) blocks —
                # never materializes the population or its CDF anywhere
                new_states = ring_systematic_resample(u0, log_w, states, axis)
                new_log_z = log_z + global_log_mean_exp(log_w, axis)
                return new_states, jnp.zeros_like(log_w), new_log_z
            elif scheme == "balanced":
                # exact, O(bound) comm; exact-ring fallback inside
                new_states = balanced_systematic_resample(
                    u0, log_w, states, axis, bound=balance_bound
                )
                new_log_z = log_z + global_log_mean_exp(log_w, axis)
                return new_states, jnp.zeros_like(log_w), new_log_z
            elif scheme == "exchange":
                K = model.state_categories
                # global max-shift for stable exp
                m = jax.lax.pmax(jnp.max(log_w), axis)
                w = jnp.exp(log_w - m)
                onehot = (
                    states[:, None]
                    == jnp.arange(K, dtype=states.dtype)[None, :]
                ).astype(w.dtype)
                cat_w = jax.lax.psum(w @ onehot, axis)      # (K,) global
                total = jnp.sum(cat_w)
                b = jnp.cumsum(cat_w) / total
                ticks = jnp.ceil(n_particles * b - u0).astype(jnp.int32)
                ticks = jnp.clip(ticks, 0, n_particles).at[-1].set(n_particles)
                ticks = jax.lax.cummax(ticks)
                # shard fills its global slot range [my*n_local, ...)
                j = my * n_local + jnp.arange(n_local, dtype=jnp.int32)
                new_states = jnp.sum(
                    (j[:, None] >= ticks[None, :-1]).astype(states.dtype),
                    axis=1,
                )
                new_log_z = log_z + global_log_mean_exp(log_w, axis)
                return new_states, jnp.zeros_like(log_w), new_log_z
            else:  # island
                anc = local_systematic_ancestors(u0, log_w, axis)
                new_states = jax.tree_util.tree_map(lambda s: s[anc], states)
                m = jnp.max(log_w)
                island_lw = m + jnp.log(jnp.mean(jnp.exp(log_w - m)))
                return new_states, jnp.full_like(log_w, island_lw), log_z

        def step(carry, y_and_t):
            y_t, t = y_and_t
            states, log_w, log_z = carry

            ess = global_ess(log_w, axis)
            do_resample = ess < ess_threshold * n_particles

            states_r, log_w_r, log_z_r = jax.lax.cond(
                do_resample,
                lambda _: resample(t, states, log_w, log_z),
                lambda _: (states, log_w, log_z),
                operand=None,
            )

            prop_keys = jax.vmap(
                lambda i: jax.random.fold_in(
                    jax.random.fold_in(jax.random.fold_in(key_rep, 2_000_000), t),
                    my * n_local + i,
                )
            )(jnp.arange(n_local))
            new_states = jax.vmap(lambda k, s: model.step_sample(k, s, t))(
                prop_keys, states_r
            )
            new_log_w = log_w_r + jax.vmap(
                lambda s: model.obs_logpdf(s, y_t, t)
            )(new_states)

            tracked = None
            if track_fn is not None:
                vals = jax.vmap(track_fn)(new_states)
                m = jax.lax.pmax(jnp.max(new_log_w), axis)
                w = jnp.exp(new_log_w - m)
                num = jax.lax.psum(jnp.sum(w * vals), axis)
                den = jax.lax.psum(jnp.sum(w), axis)
                tracked = num / den

            return (new_states, new_log_w, log_z_r), (ess, do_resample, tracked)

        ts = jnp.arange(1, T)
        (states_f, log_w_f, log_z), (ess_h, res_h, tracked_h) = jax.lax.scan(
            step, (states, log_w, jnp.zeros(())), (obs[1:], ts)
        )
        log_z = log_z + global_log_mean_exp(log_w_f, axis)
        return states_f, log_w_f, log_z, ess_h, res_h, tracked_h

    out_specs = (
        P(PARTICLE_AXIS),  # final states
        P(PARTICLE_AXIS),  # final log weights
        P(),               # log evidence (replicated)
        P(),               # ess history
        P(),               # resampled flags
        P(),               # tracked means
    )
    return _finish_smc_sharded(shard_body, mesh, out_specs, key,
                               observations, track_fn)


def _finish_smc_sharded(shard_body, mesh, out_specs, key, observations,
                        track_fn):
    if track_fn is None:
        # scan carries None through; drop from outputs
        def wrapper(key_rep, obs):
            s, w, z, e, r, _ = shard_body(key_rep, obs)
            return s, w, z, e, r
        mapped = jax.shard_map(
            wrapper, mesh=mesh, in_specs=(P(), P()), out_specs=out_specs[:5],
            check_vma=False,
        )
        run = jax.jit(mapped)
        s, w, z, e, r = run(key, observations)
        return ShardedSMCResult(s, w, z, e, r, None)
    mapped = jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P()), out_specs=out_specs,
        check_vma=False,
    )
    run = jax.jit(mapped)
    s, w, z, e, r, tr = run(key, observations)
    return ShardedSMCResult(s, w, z, e, r, tr)


def _smc_sharded_chunked(
    model: StateSpaceModel,
    observations: jax.Array,
    n_particles: int,
    key: jax.Array,
    *,
    mesh: Mesh,
    ess_threshold: float,
    scheme: str,
    balance_bound: Optional[int],
    chunk: int,
) -> ShardedSMCResult:
    """Sharded SMC with per-shard fused chunk kernels: the pod-scale
    configuration — each shard's population stays VMEM-resident across
    ``chunk`` fused timesteps; only the chunk-boundary ESS check (scalar
    psums) and the (rare) distributed resample touch the ICI."""
    from ..inference.smc import _chunk_observations

    n_dev = mesh.size
    n_local = n_particles // n_dev
    T = observations.shape[0]

    def shard_body(key_rep, obs):
        axis = PARTICLE_AXIS
        my = jax.lax.axis_index(axis)

        # --- init (t = 0), per-shard keys -----------------------------------
        k_init = jax.random.fold_in(jax.random.fold_in(key_rep, 0), my)
        if model.init_sample_batch is not None:
            states = model.init_sample_batch(k_init, n_local)
        else:
            states = jax.vmap(model.init_sample)(
                jax.random.split(k_init, n_local)
            )
        if model.obs_logpdf_batch is not None:
            log_w = model.obs_logpdf_batch(states, obs[0], 0)
        else:
            log_w = jax.vmap(lambda s: model.obs_logpdf(s, obs[0], 0))(states)

        ys_chunks, valid = _chunk_observations(obs, chunk)
        t0s = 1 + chunk * jnp.arange(ys_chunks.shape[0], dtype=jnp.int32)

        def resample(t0, states, log_w, log_z):
            u_key = jax.random.fold_in(key_rep, 1_000_000 + 7)
            u0 = jax.random.uniform(jax.random.fold_in(u_key, t0), ())
            if scheme == "balanced":
                new_states = balanced_systematic_resample(
                    u0, log_w, states, axis, bound=balance_bound
                )
                new_log_z = log_z + global_log_mean_exp(log_w, axis)
                return new_states, jnp.zeros_like(log_w), new_log_z
            elif scheme == "collective":
                new_states = ring_systematic_resample(u0, log_w, states, axis)
                new_log_z = log_z + global_log_mean_exp(log_w, axis)
                return new_states, jnp.zeros_like(log_w), new_log_z
            else:  # island
                anc = local_systematic_ancestors(u0, log_w, axis)
                new_states = jax.tree_util.tree_map(lambda s: s[anc], states)
                m = jnp.max(log_w)
                island_lw = m + jnp.log(jnp.mean(jnp.exp(log_w - m)))
                return new_states, jnp.full_like(log_w, island_lw), log_z

        def step(carry, xs):
            ys, n_valid, t0 = xs
            states, log_w, log_z = carry
            ess = global_ess(log_w, axis)
            do_resample = ess < ess_threshold * n_particles
            states_r, log_w_r, log_z_r = jax.lax.cond(
                do_resample,
                lambda _: resample(t0, states, log_w, log_z),
                lambda _: (states, log_w, log_z),
                operand=None,
            )
            k_prop = jax.random.fold_in(
                jax.random.fold_in(
                    jax.random.fold_in(key_rep, 2_000_000), t0
                ),
                my,
            )
            if model.fused_chunk_t_batch is not None:
                new_states, new_log_w, _ = model.fused_chunk_t_batch(
                    k_prop, states_r, log_w_r, ys, n_valid, t0
                )
            else:
                new_states, new_log_w, _ = model.fused_chunk_batch(
                    k_prop, states_r, log_w_r, ys, n_valid
                )
            return (new_states, new_log_w, log_z_r), (ess, do_resample)

        (states_f, log_w_f, log_z), (ess_h, res_h) = jax.lax.scan(
            step, (states, log_w, jnp.zeros(())), (ys_chunks, valid, t0s)
        )
        log_z = log_z + global_log_mean_exp(log_w_f, axis)
        return states_f, log_w_f, log_z, ess_h, res_h, None

    out_specs = (
        P(PARTICLE_AXIS), P(PARTICLE_AXIS), P(), P(), P(), P(),
    )
    return _finish_smc_sharded(shard_body, mesh, out_specs, key,
                               observations, None)

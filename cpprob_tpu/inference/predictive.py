"""Prior- and posterior-predictive sampling utilities.

Rounds out the engine API: given posterior draws (from any engine), replay the
model with the latents substituted and **simulate** the observe sites to get
predictive replications — the standard model-checking workflow the reference
leaves to manual scripting.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import handlers

__all__ = ["posterior_predictive", "prior_predictive"]


def _one_replication(model, args, values):
    def run(key, values):
        tr = handlers.TraceHandler()
        pc = handlers.PredictCollector()
        with handlers.Substitute(values), handlers.Seed(key), \
                handlers.SimulateObserves(), tr, pc:
            model(*args)
        obs = {
            name: site["value"]
            for name, site in tr.trace.items()
            if site["type"] in ("observe", "metaobserve")
        }
        return obs, pc.stacked()

    return run


def posterior_predictive(
    model: Callable,
    args: Tuple,
    samples: Dict[str, jax.Array],
    key: jax.Array,
    *,
    jit: bool = True,
):
    """Simulate observations under posterior latent draws.

    ``samples``: dict addr -> (n, ...) posterior values (e.g.
    ``HMCResult.samples`` reshaped to a flat draw axis, or
    ``SVIResult.sample(...)``).  Returns ``(replicated_observes, predicts)``,
    each a dict of (n, ...) arrays.
    """
    n = jnp.shape(jax.tree_util.tree_leaves(samples)[0])[0]
    run = _one_replication(model, args, samples)

    def batch(key):
        keys = jax.random.split(key, n)
        return jax.vmap(run)(keys, samples)

    if jit:
        batch = jax.jit(batch)
    return batch(key)


def prior_predictive(
    model: Callable,
    args: Tuple,
    n: int,
    key: jax.Array,
    *,
    jit: bool = True,
):
    """Simulate (latents, observations) from the prior — vectorized compile
    mode, returned as dicts of (n, ...) arrays."""

    def one(key):
        tr = handlers.TraceHandler()
        with handlers.Seed(key), handlers.SimulateObserves(), tr:
            model(*args)
        latents = {
            name: site["value"]
            for name, site in tr.trace.items()
            if site["type"] == "sample" and not site["is_observed"]
        }
        obs = {
            name: site["value"]
            for name, site in tr.trace.items()
            if site["type"] in ("observe", "metaobserve")
        }
        return latents, obs

    def batch(key):
        return jax.vmap(one)(jax.random.split(key, n))

    if jit:
        batch = jax.jit(batch)
    return batch(key)

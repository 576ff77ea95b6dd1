"""Distributionally-robust (chi-square ball) loss reweighting — counterpart of
the reference's ``infcomp/nn/regularize.py`` (Namkoong & Duchi's
variance-regularized ERM; present in the reference but not wired into its
loss — here it is available via ``CSIS.compile(dro_rho=...)``).

Given per-trace losses l_i, finds the worst-case weights within the
chi-square divergence ball {w : w >= 0, sum w = 1, n/2 * ||w - 1/n||^2 <= rho}
and returns sum_i w_i l_i.  The maximizer is w_i ∝ relu(l_i - eta) with eta
found by bisection — fully vectorized and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["chi_square_weights", "dro_loss"]


def chi_square_weights(losses: jax.Array, rho: float, n_iters: int = 8) -> jax.Array:
    """Worst-case chi-square-ball weights for ``losses`` (shape (n,)).

    Unconstrained-by-nonnegativity solution: w = 1/n + r (l - mean l)/||l -
    mean l|| with r = sqrt(2 rho / n) (so the objective is the
    variance-regularized mean(l) + r ||l - mean l||).  Simplex clipping via a
    fixed number of active-set iterations (exact when nothing clips)."""
    n = losses.shape[0]
    radius = jnp.sqrt(2.0 * rho / n)

    def body(_, mask):
        m = jnp.maximum(jnp.sum(mask), 1.0)
        mean_l = jnp.sum(mask * losses) / m
        dev = mask * (losses - mean_l)
        norm = jnp.sqrt(jnp.sum(dev * dev)) + 1e-12
        w = mask * (1.0 / m + radius * dev / norm)
        return jnp.where(w > 0, mask, 0.0)

    mask = jax.lax.fori_loop(0, n_iters, body, jnp.ones_like(losses))
    m = jnp.maximum(jnp.sum(mask), 1.0)
    mean_l = jnp.sum(mask * losses) / m
    dev = mask * (losses - mean_l)
    norm = jnp.sqrt(jnp.sum(dev * dev)) + 1e-12
    w = jax.nn.relu(mask * (1.0 / m + radius * dev / norm))
    return w / jnp.sum(w)


def dro_loss(losses: jax.Array, rho: float) -> jax.Array:
    """Robust objective: sup over the chi-square ball of E_w[l].  Gradients
    flow through ``losses`` only (weights treated as constants, the standard
    Danskin-theorem estimator)."""
    w = jax.lax.stop_gradient(chi_square_weights(losses, rho))
    return jnp.sum(w * losses)

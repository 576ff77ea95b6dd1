"""MCMC convergence diagnostics: split-R̂ and chain effective sample size
(Vehtari et al. 2021 formulation) — greenfield vs the reference (no MCMC
there), needed to make the HMC/NUTS engines production-usable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["split_rhat", "effective_sample_size", "summarize_chains"]


def _split(x):
    # (C, N, ...) -> (2C, N//2, ...)
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    return jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def split_rhat(samples: jax.Array) -> jax.Array:
    """samples: (n_chains, n_samples, ...) -> R̂ per trailing dim."""
    x = _split(jnp.asarray(samples, jnp.float32))
    m, n = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=1)                    # (m, ...)
    chain_var = jnp.var(x, axis=1, ddof=1)              # (m, ...)
    w = jnp.mean(chain_var, axis=0)
    b = n * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-12))


def effective_sample_size(samples: jax.Array, max_lag: int = 100) -> jax.Array:
    """Bulk ESS via autocorrelation (Geyer initial positive sequence,
    truncated at ``max_lag``).  samples: (n_chains, n_samples, ...)."""
    x = jnp.asarray(samples, jnp.float32)
    m, n = x.shape[0], x.shape[1]
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(jnp.var(x, axis=1, ddof=1), axis=0)

    max_lag = min(max_lag, n - 1)

    def rho_at(lag):
        prod = xc[:, : n - lag] * xc[:, lag:]
        return jnp.mean(prod, axis=(0, 1)) / jnp.maximum(var, 1e-12)

    rhos = jnp.stack([rho_at(l) for l in range(1, max_lag + 1)])  # (L, ...)
    # Geyer: sum pairs while positive
    pairs = rhos[0::2][: max_lag // 2] + rhos[1::2][: max_lag // 2]
    positive = jnp.cumprod(pairs > 0, axis=0).astype(rhos.dtype)
    tau = 1.0 + 2.0 * jnp.sum(pairs * positive, axis=0)
    return m * n / jnp.maximum(tau, 1.0 / (m * n))


def summarize_chains(samples: jax.Array) -> dict:
    """Mean, std, split-R̂, ESS for (n_chains, n_samples, ...) draws."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
        "rhat": split_rhat(samples),
        "ess": effective_sample_size(samples),
    }

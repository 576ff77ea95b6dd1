"""Stochastic variational inference (ADVI) over the same trace
representation — north-star extension (the reference has no VI;
BASELINE.md names "NUTS/HMC + SVI" explicitly).

Guides (unconstrained space, constrained via ``FlatModel``'s bijections):

- ``meanfield``: diagonal normal — O(dim) params, axis-aligned posterior.
- ``fullrank``: multivariate normal with a dense Cholesky factor
  (Kucukelbir et al. 2017's full-rank ADVI) — captures posterior
  correlations the mean-field family cannot; O(dim^2) params, fine for
  the latent dimensionalities probabilistic programs have (the scale
  matmul is a single small MXU op per sample).

ELBO by the reparameterization trick with ``n_mc`` samples per step
(vmapped), entropy in closed form, Adam via optax, one jitted step.

``init_loc`` warm-starts the variational mean — e.g. from a trained CSIS
proposal's posterior-mean estimate (see
``tests/test_hmc_svi.py::TestSVIFullRank::test_csis_initialization``),
wiring inference compilation into VI initialization.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .potential import FlatModel, flatten_model

__all__ = ["SVIResult", "svi"]

# python float, NOT jnp: importing the library must never initialize a
# JAX backend (jax.distributed.initialize runs after import in workers)
_HALF_LOG_2PI_E = 0.5 * (1.0 + float(np.log(2.0 * np.pi)))


class SVIResult(NamedTuple):
    loc: jax.Array                        # (dim,) variational mean
    log_scale: jax.Array                  # (dim,) diag log-scales
    losses: jax.Array                     # (steps,) negative ELBO trace
    flat: FlatModel
    scale_tril: Optional[jax.Array] = None  # (dim, dim) full-rank factor

    def _draw_unconstrained(self, key, n: int):
        eps = jax.random.normal(key, (n, self.loc.shape[0]))
        if self.scale_tril is not None:
            return self.loc + eps @ self.scale_tril.T
        return self.loc + jnp.exp(self.log_scale) * eps

    def sample(self, key, n: int):
        """Posterior samples: dict addr -> (n, ...) on the support."""
        return jax.vmap(self.flat.constrain)(
            self._draw_unconstrained(key, n)
        )

    def mean(self, key, name: str, n: int = 4000):
        return jnp.mean(self.sample(key, n)[name], axis=0)

    def covariance_unconstrained(self):
        """Cov of q in unconstrained space (exact, from the parameters)."""
        if self.scale_tril is not None:
            return self.scale_tril @ self.scale_tril.T
        return jnp.diag(jnp.exp(2.0 * self.log_scale))


def _tril_unpack(flat_tril, dim):
    """(dim*(dim+1)//2,) -> lower-triangular with softplus-positive diag."""
    L = jnp.zeros((dim, dim)).at[jnp.tril_indices(dim)].set(flat_tril)
    diag = jax.nn.softplus(jnp.diagonal(L)) + 1e-6
    return L - jnp.diag(jnp.diagonal(L)) + jnp.diag(diag)


def svi(
    model: Callable,
    args: Tuple,
    key: jax.Array,
    *,
    guide: str = "meanfield",
    steps: int = 2000,
    n_mc: int = 8,
    learning_rate: float = 0.05,
    flat: Optional[FlatModel] = None,
    init_loc: Optional[jax.Array] = None,
) -> SVIResult:
    if guide not in ("meanfield", "fullrank"):
        raise ValueError(f"unknown guide {guide!r}: use 'meanfield' or "
                         "'fullrank'")
    flat = flat or flatten_model(model, args)
    dim = flat.dim

    if guide == "fullrank":
        def neg_elbo(params, key):
            loc, flat_tril = params
            L = _tril_unpack(flat_tril, dim)
            eps = jax.random.normal(key, (n_mc, dim))
            zs = loc + eps @ L.T
            logp = jax.vmap(flat.log_joint)(zs)
            entropy = (jnp.sum(jnp.log(jnp.diagonal(L)))
                       + dim * _HALF_LOG_2PI_E)
            return -(jnp.mean(logp) + entropy)
    else:
        def neg_elbo(params, key):
            loc, log_scale = params
            eps = jax.random.normal(key, (n_mc, dim))
            zs = loc + jnp.exp(log_scale) * eps
            logp = jax.vmap(flat.log_joint)(zs)
            entropy = jnp.sum(log_scale) + dim * _HALF_LOG_2PI_E
            return -(jnp.mean(logp) + entropy)

    key, k_init = jax.random.split(key)
    loc0 = (jnp.asarray(init_loc, jnp.float32).reshape(dim)
            if init_loc is not None else flat.initial_position(k_init))
    if guide == "fullrank":
        # init: diagonal ~ softplus^{-1}(e^{-1}) on the diag slots, zeros off
        tril0 = jnp.zeros((dim * (dim + 1) // 2,))
        diag_slots = jnp.cumsum(jnp.arange(1, dim + 1)) - 1
        inv_softplus = jnp.log(jnp.expm1(jnp.exp(-1.0)))
        tril0 = tril0.at[diag_slots].set(inv_softplus)
        params = (loc0, tril0)
    else:
        params = (loc0, jnp.full((dim,), -1.0))
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(neg_elbo)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(loss)
    if guide == "fullrank":
        loc, flat_tril = params
        L = _tril_unpack(flat_tril, dim)
        return SVIResult(loc, jnp.log(jnp.diagonal(L)), jnp.stack(losses),
                         flat, scale_tril=L)
    loc, log_scale = params
    return SVIResult(loc, log_scale, jnp.stack(losses), flat)

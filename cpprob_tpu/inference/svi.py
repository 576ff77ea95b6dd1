"""Stochastic variational inference (ADVI, mean-field) over the same trace
representation — north-star extension (the reference has no VI).

Guide: diagonal normal in unconstrained space; ELBO by the reparameterization
trick with multiple MC samples per step; Adam via optax.  All one jitted
training step, batched over MC samples with ``vmap``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .potential import FlatModel, flatten_model

__all__ = ["SVIResult", "svi"]


class SVIResult(NamedTuple):
    loc: jax.Array              # (dim,) variational mean (unconstrained)
    log_scale: jax.Array        # (dim,)
    losses: jax.Array           # (steps,) negative ELBO trace
    flat: FlatModel

    def sample(self, key, n: int):
        """Posterior samples: dict addr -> (n, ...) on the support."""
        eps = jax.random.normal(key, (n, self.loc.shape[0]))
        zs = self.loc + jnp.exp(self.log_scale) * eps
        return jax.vmap(self.flat.constrain)(zs)

    def mean(self, key, name: str, n: int = 4000):
        return jnp.mean(self.sample(key, n)[name], axis=0)


def svi(
    model: Callable,
    args: Tuple,
    key: jax.Array,
    *,
    steps: int = 2000,
    n_mc: int = 8,
    learning_rate: float = 0.05,
    flat: Optional[FlatModel] = None,
) -> SVIResult:
    flat = flat or flatten_model(model, args)
    dim = flat.dim

    def neg_elbo(params, key):
        loc, log_scale = params
        scale = jnp.exp(log_scale)
        eps = jax.random.normal(key, (n_mc, dim))
        zs = loc + scale * eps
        # E_q[log p] + H[q]; H of diag normal = sum(log_scale) + const
        logp = jax.vmap(flat.log_joint)(zs)
        entropy = jnp.sum(log_scale) + 0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
        return -(jnp.mean(logp) + entropy)

    key, k_init = jax.random.split(key)
    params = (flat.initial_position(k_init), jnp.full((dim,), -1.0))
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
    loc, log_scale = params
    return SVIResult(loc, log_scale, jnp.stack(losses), flat)

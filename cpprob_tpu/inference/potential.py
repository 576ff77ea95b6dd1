"""Potential-function construction: model -> differentiable log-joint over a
flat unconstrained latent vector.  The bridge from the trace representation to
the gradient-based engines (HMC/NUTS/SVI) — new capability vs the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import handlers
from .transforms import Transform, biject_for

__all__ = ["LatentSpec", "FlatModel", "flatten_model"]


@dataclasses.dataclass(frozen=True)
class LatentSpec:
    addr: str
    shape: Tuple[int, ...]
    size: int
    transform: Transform


@dataclasses.dataclass(frozen=True)
class FlatModel:
    """Differentiable view of a model's continuous latents.

    - ``dim``: total unconstrained dimension
    - ``log_joint(z)``: log p(x(z), obs) + log|dx/dz| for flat z (shape (dim,))
    - ``potential(z)`` = −log_joint(z)
    - ``constrain(z)``: flat z -> dict addr -> value on the support
    - ``predict(z, key)``: run the model with latents fixed, collect predicts
    """

    latents: Tuple[LatentSpec, ...]
    dim: int
    log_joint: Callable[[jax.Array], jax.Array]
    potential: Callable[[jax.Array], jax.Array]
    constrain: Callable[[jax.Array], Dict[str, jax.Array]]
    predict: Callable[[jax.Array, jax.Array], Dict[str, jax.Array]]
    initial_position: Callable[[jax.Array], jax.Array]


def flatten_model(model: Callable, args: Tuple) -> FlatModel:
    """Discover continuous latent sites (one concrete prior run), build the
    flat unconstrained log-joint.  Discrete or unsupported sample sites are
    rejected — marginalize them in the model (e.g. HMM forward algorithm) or
    use SIS/SMC instead."""
    tr = handlers.TraceHandler()
    with handlers.Seed(jax.random.key(0)), tr:
        model(*args)

    latents: List[LatentSpec] = []
    for name, site in tr.trace.items():
        if site["type"] != "sample" or site["is_observed"]:
            continue
        t = biject_for(site["dist"])
        if t is None:
            raise ValueError(
                f"sample site {name!r} has discrete/unsupported support for "
                "gradient-based inference; marginalize it or use SIS/SMC"
            )
        shape = tuple(np.shape(site["value"]))
        size = int(np.prod(shape)) if shape else 1
        latents.append(LatentSpec(name, shape, size, t))

    dim = sum(l.size for l in latents)

    def unflatten(z):
        out = {}
        i = 0
        for l in latents:
            out[l.addr] = z[i : i + l.size].reshape(l.shape)
            i += l.size
        return out

    def constrain(z):
        zs = unflatten(z)
        return {l.addr: l.transform.forward(zs[l.addr]) for l in latents}

    def log_joint(z):
        zs = unflatten(z)
        values = {}
        jac = jnp.zeros(())
        for l in latents:
            values[l.addr] = l.transform.forward(zs[l.addr])
            jac = jac + jnp.sum(l.transform.log_det(zs[l.addr]))
        lj = handlers.LogJoint()
        with handlers.Substitute(values), lj:
            model(*args)
        return lj.log_weight + jac

    def potential(z):
        return -log_joint(z)

    def predict(z, key):
        values = constrain(z)
        pc = handlers.PredictCollector()
        with handlers.Substitute(values), handlers.Seed(key), pc:
            model(*args)
        return pc.stacked()

    def initial_position(key):
        """Unconstrained position from a prior draw."""
        tr2 = handlers.TraceHandler()
        with handlers.Seed(key), tr2:
            model(*args)
        parts = []
        for l in latents:
            x = jnp.asarray(tr2.trace[l.addr]["value"], jnp.float32)
            parts.append(jnp.ravel(l.transform.inverse(x)))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    return FlatModel(
        tuple(latents), dim, log_joint, potential, constrain, predict,
        initial_position,
    )

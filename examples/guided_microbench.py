#!/usr/bin/env python
"""Dissect the fused GUIDED scalar kernel's cost on the real chip.

Times the raw chunk kernel (no resampling epochs) for several proposal-net
shapes plus a null head, against the unguided scalar kernel — isolating
how much of the guided/unguided gap is the in-kernel MLP vs the fixed
per-step machinery (PRNG Box-Muller, softplus, logs, physics densities).
Feeds the ROOFLINE_r05.json analysis (VERDICT r5 item 1).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from cpprob_tpu.inference import nn
from cpprob_tpu.models.linear_gaussian import linear_gaussian_ssm
from cpprob_tpu.ops.pallas_ssm import (
    attach_fused_guided_scalar_kernels,
    attach_fused_scalar_kernels,
)

HALF_LOG_2PI = 0.5 * np.log(2 * np.pi)


def trans_lp(x, nx, t):
    d = nx - x
    return -0.5 * d * d - HALF_LOG_2PI


def obs_lp(nx, y, t):
    d = y - nx
    return -0.5 * d * d - HALF_LOG_2PI


def time_chunk(ssm, n, T, iters=6, sweeps=8, guided=True):
    states = jnp.zeros((n,), jnp.float32)
    log_w = jnp.zeros((n,), jnp.float32)
    ys = jnp.asarray(np.linspace(-1, 1, T), jnp.float32)
    fn = ssm.fused_chunk_t_batch if guided else ssm.fused_chunk_batch

    @jax.jit
    def run(key):
        keys = jax.random.split(key, sweeps)

        def body(carry, k):
            s, w = carry
            if guided:
                s2, w2, ess = fn(k, s, w, ys, jnp.int32(T), jnp.int32(0))
            else:
                s2, w2, ess = fn(k, s, w, ys, jnp.int32(T))
            return (s2, jnp.zeros_like(w2)), ess

        (s, _), esses = jax.lax.scan(body, (states, log_w), keys)
        return s[0] + esses[-1]

    # warm
    float(np.asarray(run(jax.random.key(0))))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(run(jax.random.key(i + 1))))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / sweeps
    return n * T / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 24)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--block-r", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    n, T = args.n, args.steps
    out = {"n_particles": n, "T": T, "block_r": args.block_r,
           "device": str(jax.devices()[0]), "variants": {}}

    # unguided reference
    ssm_u = attach_fused_scalar_kernels(
        linear_gaussian_ssm,
        lambda x, y, eps: (x + eps, -0.5 * (y - (x + eps)) ** 2
                           - HALF_LOG_2PI),
        block_r=args.block_r,
    )
    rate, dt = time_chunk(ssm_u, n, T, guided=False)
    out["variants"]["unguided"] = {"steps_per_s": rate, "sweep_s": dt}
    print(f"unguided            : {rate/1e9:8.2f} G steps/s")

    for label, sizes, mxu in [
        ("mlp_3_16_16_2_vpu", [3, 16, 16, 2], False),
        ("mlp_3_16_16_2_mxu", [3, 16, 16, 2], True),
        ("mlp_3_8_8_2_vpu", [3, 8, 8, 2], False),
        ("mlp_3_8_8_2_mxu", [3, 8, 8, 2], True),
        ("mlp_3_16_2_vpu", [3, 16, 2], False),
        ("mlp_3_16_2_mxu", [3, 16, 2], True),
        ("mlp_3_2", [3, 2], False),
    ]:
        params = nn.mlp_init(jax.random.key(1), sizes)
        ssm_g = attach_fused_guided_scalar_kernels(
            linear_gaussian_ssm, params, T,
            trans_logpdf_elem=trans_lp, obs_logpdf_elem=obs_lp,
            block_r=args.block_r, mxu=mxu,
        )
        rate, dt = time_chunk(ssm_g, n, T, guided=True)
        out["variants"][label] = {"steps_per_s": rate, "sweep_s": dt}
        print(f"{label:20s}: {rate/1e9:8.2f} G steps/s")

    if args.out:
        json.dump(out, open(args.out, "w"), indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()

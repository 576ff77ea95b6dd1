#!/usr/bin/env python
"""Headline benchmark: SMC throughput on the 3-state HMM with ESS-triggered
systematic resampling (the BASELINE.json north-star metric: particle-steps/s
per chip; target >= 10M particles/s/chip).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PARTICLES_PER_SEC = 10e6  # BASELINE.json north-star target per chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small smoke run")
    ap.add_argument("--particles", type=int, default=None)
    ap.add_argument("--steps", type=int, default=16, help="HMM length T")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--impl", choices=["auto", "xla", "pallas"], default="auto")
    args = ap.parse_args()

    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models import HMM_MEANS, HMM_TRANS, hmm_ssm
    from cpprob_tpu.ops.pallas_hmm import make_pallas_hmm_ssm, pallas_available

    n_particles = args.particles or (1 << 14 if args.quick else 1 << 21)
    T = args.steps
    iters = 2 if args.quick else args.iters

    impl = args.impl
    if impl == "auto":
        impl = "pallas" if pallas_available(n_particles) else "xla"
    model = make_pallas_hmm_ssm() if impl == "pallas" else hmm_ssm

    # Observations simulated from the HMM itself (fixed seed).
    rng = np.random.RandomState(0)
    z = rng.randint(0, 3)
    obs = []
    for t in range(T):
        if t > 0:
            z = rng.choice(3, p=HMM_TRANS[z])
        obs.append(rng.normal(HMM_MEANS[z], 1.0))
    obs = jnp.asarray(np.asarray(obs, np.float32))

    run = jax.jit(
        build_smc_run(
            model, n_particles, ess_threshold=0.5, resampling="systematic",
            store_history=False,
        )
    )

    # compile + warm.  NB: synchronize by *reading the scalar to host* —
    # on the axon remote backend block_until_ready() can return before the
    # execution drains, so a device->host fetch is the only reliable fence.
    res = run(jax.random.key(0), obs)
    float(res.log_evidence)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = run(jax.random.key(i + 1), obs)
        float(res.log_evidence)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    particle_steps_per_sec = n_particles * T / dt
    out = {
        "metric": "smc_hmm_particle_steps_per_sec_per_chip",
        "value": particle_steps_per_sec,
        "unit": "particle-steps/s/chip",
        "vs_baseline": particle_steps_per_sec / BASELINE_PARTICLES_PER_SEC,
        "detail": {
            "n_particles": n_particles,
            "T": T,
            "median_sweep_s": dt,
            "log_evidence": float(res.log_evidence),
            "resample_epochs": int(np.asarray(res.resampled).sum()),
            "device": str(jax.devices()[0]),
            "iters": iters,
            "impl": impl,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

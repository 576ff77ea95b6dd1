"""Reproduction of the thesis's headline accuracy experiment
(doc/compiled_inference.pdf ch. 6.3, figs. 6.6-6.7): CSIS vs SIS on the
3-state HMM, summed L2 and KL distance of the per-step posterior marginals to
the exact forward-backward posterior, across particle counts 10^1..10^4.
Expected: CSIS ~1 order of magnitude better at equal particle count.

Usage:  PYTHONPATH=.. python thesis_hmm_comparison.py [--length 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu even when the host sitecustomize pre-imported jax
# with a remote accelerator backend (env var alone is too late there)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import cpprob_tpu as ct
from cpprob_tpu.inference.csis import CSIS
from cpprob_tpu.models import hmm, hmm_exact_posterior


def marginals(res, T):
    states = np.asarray(res.predicts["State"])  # (n, T)
    w = np.asarray(res.normalized_weights)
    out = np.zeros((T, 3))
    for t in range(T):
        for s in range(3):
            out[t, s] = float(np.sum(w * (states[:, t] == s)))
    return out


def distances(est, exact):
    l2 = float(np.sum((est - exact) ** 2))
    eps = 1e-12
    kl = float(np.sum(exact * (np.log(exact + eps) - np.log(est + eps))))
    return l2, kl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=int, default=16,
                    help="HMM length (thesis uses 16)")
    ap.add_argument("--train-steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for CI smoke runs")
    args = ap.parse_args()

    T = args.length
    # observations simulated from the model prior (fixed key)
    from cpprob_tpu.core import handlers

    tr = handlers.TraceHandler()
    with handlers.Seed(jax.random.key(99)), handlers.SimulateObserves(), tr:
        hmm(jnp.zeros(T))
    obs = jnp.stack([tr.trace[f"y[{t}]" if t else "y[0]"]["value"]
                     for t in range(T)])
    exact = np.asarray(hmm_exact_posterior(obs))

    print(f"training CSIS proposal on the length-{T} HMM ...", file=sys.stderr)
    eng = CSIS(hmm, (jnp.zeros(T),), tie_addresses=True)
    params, losses = eng.compile(
        jax.random.key(args.seed), steps=60 if args.quick else args.train_steps,
        batch_size=64 if args.quick else 256, unroll=20,
    )
    print(f"loss {float(losses[0]):.2f} -> {float(losses[-1]):.2f}",
          file=sys.stderr)

    print(f"{'n_particles':>12} {'SIS_L2':>10} {'CSIS_L2':>10} "
          f"{'SIS_KL':>10} {'CSIS_KL':>10} {'L2_ratio':>9}")
    for n in ([10, 100] if args.quick else [10, 100, 1000, 10_000]):
        k = jax.random.key(args.seed + n)
        res_sis = ct.sis(hmm, (obs,), n, k)
        res_csis = eng.infer(params, (obs,), n, k)
        l2_s, kl_s = distances(marginals(res_sis, T), exact)
        l2_c, kl_c = distances(marginals(res_csis, T), exact)
        print(f"{n:>12} {l2_s:>10.4f} {l2_c:>10.4f} "
              f"{kl_s:>10.4f} {kl_c:>10.4f} {l2_s / max(l2_c, 1e-9):>9.1f}")


if __name__ == "__main__":
    main()

"""Every engine on one model — the conjugate Gaussian with observations
(3, 4), exact posterior N(2.32353, 1.05882) (reference README.md:118).

Usage:  PYTHONPATH=.. python quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu even when the host sitecustomize pre-imported jax
# with a remote accelerator backend (env var alone is too late there)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import argparse

import jax
import numpy as np

import cpprob_tpu as ct
from cpprob_tpu.inference.csis import CSIS
from cpprob_tpu.models import gaussian_unknown_mean_readme as model


def report(name, mean, var, extra=""):
    print(f"{name:>14}: mean={float(mean):.4f} var={float(var):.4f} "
          f"(exact 2.3235 / 1.0588) {extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for CI smoke runs")
    args = ap.parse_args()
    q = args.quick
    key = jax.random.key(0)
    obs = (3.0, 4.0)

    res = ct.sis(model, obs, 5_000 if q else 100_000, key)
    report("SIS", res.mean("Mean"), res.variance("Mean"),
           f"ESS={float(res.ess):.0f}")

    eng = CSIS(model, (0.0, 0.0))
    params, _ = eng.compile(jax.random.key(1), steps=50 if q else 200,
                            batch_size=64 if q else 256)
    res = eng.infer(params, obs, 5_000 if q else 100_000, key)
    report("CSIS", res.mean("Mean"), res.variance("Mean"),
           f"ESS={float(res.ess):.0f}")

    res = ct.smc_sampler(model, obs, 512 if q else 4096, key, n_hmc_moves=3,
                         hmc_step_size=0.5)
    mus = np.asarray(res.samples["mu"])
    report("temperedSMC", mus.mean(), mus.var(),
           f"logZ={float(res.log_evidence):.3f}")

    res = ct.hmc(model, obs, key, n_samples=300 if q else 1500,
                 n_warmup=150 if q else 500, n_chains=2 if q else 4)
    mus = np.asarray(res.samples["mu"]).reshape(-1)
    report("HMC", mus.mean(), mus.var(),
           f"accept={float(res.accept_rate.mean()):.2f}")

    res = ct.nuts(model, obs, key, n_samples=200 if q else 1200,
                  n_warmup=150 if q else 500, n_chains=2 if q else 4,
                  max_depth=6)
    mus = np.asarray(res.samples["mu"]).reshape(-1)
    report("NUTS", mus.mean(), mus.var())

    res = ct.svi(model, obs, key, steps=300 if q else 1500)
    mus = np.asarray(res.sample(jax.random.key(9), 20_000)["mu"])
    report("SVI", mus.mean(), mus.var())


if __name__ == "__main__":
    main()

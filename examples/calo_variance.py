"""Per-voxel mean/variance study of the calorimeter simulator — counterpart of
``src/models/calo_variance.cpp:60-177``: run the calorimeter N times on a
fixed particle configuration and report voxel-wise statistics (used in the
reference to choose the ABC observation noise scale).

Usage:  PYTHONPATH=.. python calo_variance.py -n 64
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

from cpprob_tpu.core import handlers
from cpprob_tpu.models.sherpa import calo_simulation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=32, help="number of simulations")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="npz output path")
    args = ap.parse_args()

    particles = np.array(
        [
            [1.0, 0.1, 3.0, 5.0, 0.2, 0.1, 211.0, 1.0],
            [0.5, -0.2, 2.0, 3.0, -0.1, 0.4, 11.0, 1.0],
        ],
        np.float32,
    )

    def one(key):
        with handlers.Seed(key):
            return calo_simulation(particles)

    hists = jax.vmap(one)(jax.random.split(jax.random.key(args.seed), args.n))
    mean = np.asarray(jnp.mean(hists, axis=0))
    var = np.asarray(jnp.var(hists, axis=0))
    occupied = mean > 0
    print(f"simulations: {args.n}; voxels occupied: {occupied.sum()} / {mean.size}")
    print(f"total deposited energy: mean {mean.sum():.4f}")
    print(f"occupied-voxel mean energy: {mean[occupied].mean():.5f}")
    print(f"occupied-voxel variance:    {var[occupied].mean():.6f}")
    print(f"max voxel mean {mean.max():.5f}, max voxel var {var.max():.6f}")
    if args.out:
        np.savez(args.out, mean=mean, var=var)
        print(f"saved to {args.out}")


if __name__ == "__main__":
    main()

"""Channel-conditioned dry-run event dumper — counterpart of
``src/models/sherpa_gen.cpp:10-51`` (and ``sherpa_mini_gen.cpp``): generate
events from the synthetic SHERPA toy conditioned on a decay channel and dump
the resulting histograms for offline inspection / NN pre-training.

Usage:  PYTHONPATH=.. python sherpa_gen.py --channel 2 -n 16 --out /tmp/events
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
from cpprob_tpu.models.sherpa import sherpa_mini


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--channel", type=int, default=None,
                    help="condition on this decay channel (0-3); default prior")
    ap.add_argument("-n", type=int, default=8)
    ap.add_argument("--out", default="/tmp/sherpa_events")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    substitutions = {}
    if args.channel is not None:
        # channel = floor(channel_u): condition the latent uniform
        substitutions["channel_u"] = jnp.asarray(args.channel + 0.5)

    def one(key):
        pc = handlers.PredictCollector()
        ctx = [handlers.Seed(key), pc]
        if substitutions:
            ctx.insert(0, handlers.Substitute(substitutions))
        with ctx[0], ctx[1]:
            if len(ctx) == 3:
                with ctx[2]:
                    img = sherpa_mini()
            else:
                img = sherpa_mini()
        return img, pc.predicts.get("Channel", [jnp.asarray(-1)])[0]

    key = jax.random.key(args.seed)
    for i in range(args.n):
        key, sub = jax.random.split(key)
        img, ch = one(sub)
        path = os.path.join(args.out, f"event_{i:04d}_ch{int(ch)}.npy")
        np.save(path, np.asarray(img).reshape(100, 100))
        print(f"dumped {path} (channel {int(ch)}, total E "
              f"{float(jnp.sum(img)):.3f})")


if __name__ == "__main__":
    main()

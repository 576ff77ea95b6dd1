"""SHERPA at scale — CNN3D-guided CSIS on the FULL 35x35x20 calorimeter.

The reference drives the external SHERPA generator through an ABC observe on
a 35x35x20 voxel calorimeter with a CNN3D observation embedding
(``src/models/sherpa.cpp:29-86``, ``src/models/calorimeter.cpp``,
``infcomp/nn/observation.py:56-93``) and reports ~1 trace/s compile
throughput on a Titan X (thesis ch. 5).  This example runs the same
structure at full volume on one TPU chip: train a CNN3D-embedded CSIS
proposal on the synthetic tau-decay calorimeter model, measure traces/s,
then check the guided proposal identifies the decay channel from held-out
volumes better than prior SIS.

Writes SHERPA_FULLSCALE.json at the repo root when --out is given.

Usage:  python examples/sherpa_fullscale.py [--steps 300] [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import cpprob_tpu as ct
from cpprob_tpu.core import handlers
from cpprob_tpu.inference.csis import CSIS
from cpprob_tpu.models.sherpa import sherpa_calorimeter_wrapper


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--particles", type=int, default=512)
    ap.add_argument("--max-deposits", type=int, default=4096)
    ap.add_argument("--bins", type=int, nargs=3, default=[35, 35, 20])
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="smoke mode: tiny volume + few steps")
    args = ap.parse_args()

    if args.quick:
        args.bins, args.max_deposits = [7, 7, 5], 256
        args.steps, args.particles = 40, 64

    bins = tuple(args.bins)
    vox = bins[0] * bins[1] * bins[2]

    def model(observed):
        return sherpa_calorimeter_wrapper(
            observed, n_bins=bins, max_deposits=args.max_deposits
        )

    def observed_for(ch):
        tr = handlers.TraceHandler()
        with handlers.Seed(jax.random.key(100 + ch)), handlers.Substitute(
            {"channel_u": jnp.float32(ch + 0.5)}
        ), handlers.SimulateObserves(), tr:
            model(jnp.zeros(vox))
        return tr.trace["calo"]["value"]

    def chpost(res):
        chs = np.asarray(res.predicts["Decay Channel"])
        w = np.asarray(res.normalized_weights)
        return np.array([(w * (chs == c)).sum() for c in range(4)])

    dev = jax.devices()[0]
    print(f"device={dev.device_kind} volume={bins} ({vox} voxels) "
          f"max_deposits={args.max_deposits}")

    eng = CSIS(model, (jnp.zeros(vox),), embedding_dim=64,
               obs_embedding="cnn3d", obs_shape=bins)
    t0 = time.perf_counter()
    params, losses = eng.compile(
        jax.random.key(0), steps=args.steps, batch_size=args.batch_size,
        unroll=10, learning_rate=args.lr,
    )
    jax.block_until_ready(losses)
    train_s = time.perf_counter() - t0
    traces = args.steps * args.batch_size
    tps = traces / train_s
    print(f"trained {traces} traces in {train_s:.1f}s = {tps:.1f} traces/s "
          f"(reference SHERPA anchor: ~1/s on Titan X)")
    print(f"loss {float(losses[0]):.3f} -> "
          f"{float(np.asarray(losses)[-10:].mean()):.3f}")

    rows = []
    wins = 0
    for ch in range(4):
        obs = observed_for(ch)
        g = eng.infer(params, (obs,), args.particles, jax.random.key(ch))
        p = ct.sis(model, (obs,), args.particles, jax.random.key(ch))
        pg, pp = chpost(g), chpost(p)
        agree = int(pg.argmax()) == int(pp.argmax())
        wins += agree
        rows.append({
            "channel": ch,
            "guided_posterior": [round(float(x), 4) for x in pg],
            "prior_posterior": [round(float(x), 4) for x in pp],
            "guided_ess": round(float(g.ess), 1),
            "prior_ess": round(float(p.ess), 1),
            "guided_matches_exact_argmax": agree,
        })
        print(f"ch {ch}: guided {np.round(pg, 3)} prior {np.round(pp, 3)} "
              f"ess {float(g.ess):.0f}/{float(p.ess):.0f}")

    payload = {
        "experiment": "sherpa_fullscale_cnn3d_csis",
        "reference": "src/models/sherpa.cpp:29-86 + calorimeter.cpp + "
                     "infcomp/nn/observation.py:56-93; ~1 trace/s thesis ch.5",
        "device": str(dev.device_kind),
        "volume": list(bins),
        "max_deposits": args.max_deposits,
        "train": {"steps": args.steps, "batch_size": args.batch_size,
                  "wall_s": train_s, "traces_per_sec": tps,
                  "reference_traces_per_sec_anchor": 1.0,
                  "loss_first": float(losses[0]),
                  "loss_last": float(np.asarray(losses)[-10:].mean())},
        "channel_recovery": rows,
        "guided_matches_exact_argmax_count": wins,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print("wrote", args.out)
    print(json.dumps({"metric": "sherpa_fullscale_traces_per_sec",
                      "value": tps, "unit": "traces/s",
                      "vs_baseline": tps / 1.0}))


if __name__ == "__main__":
    main()

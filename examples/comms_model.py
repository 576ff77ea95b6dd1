"""Collective-scheme communication characterization -> SCALING_r05.json.

The virtual-CPU-mesh weak-scaling numbers (SCALING_r02.json) bound overhead
but cannot predict real-ICI behavior: the 2 shared host cores serialize what
a pod overlaps.  This artifact decomposes each distributed-resampling
scheme's communication analytically (bytes moved per epoch, collective
structure), measures the inputs that are measurable here (epochs triggered
per sweep, single-chip compute time per sweep, virtual-mesh efficiencies),
and combines them with stated ICI assumptions into a predicted 2-host
efficiency — ready to validate the day real multi-host hardware appears.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python examples/comms_model.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# --- stated hardware assumptions (public figures; see jax-ml.github.io/
# scaling-book): v5e 2D torus, per-link one-way ~45 GB/s, ~4 us collective
# hop latency; a 2-host v5e slice (8 chips) is a single ICI domain.
ICI_BW = 45e9          # bytes/s one-way per ring neighbor link
HOP_LAT = 4e-6         # seconds per collective hop
CHIPS = 8              # 2 hosts x 4 chips
# measured single-chip compute (BENCH_r02 / bench.py detail): 2^26 particles,
# T=16, chunk=8 fused kernel, ESS resampling live
N_LOCAL = 1 << 26
T = 16
SINGLE_CHIP_SWEEP_S = 0.01177


def analytic_models(n_local: int, k: int, epochs: float, state_bytes: int = 4):
    """Bytes moved and predicted epoch wall time per scheme.

    - collective (ring-exchange, exact, any state type): each shard's
      (states, cdf-segment) block of n_local*(state_bytes+4) bytes makes
      k-1 ppermute hops; per-shard egress per epoch is (k-1) *
      n_local * (state_bytes+4); hops pipeline on neighbor links.
    - balanced (exact, any state type — VERDICT r3 item 2): per-shard
      offspring segments from an all-gather of k scalars; only two
      fixed-size boundary buffers of `bound` rows cross the ICI (one
      ppermute hop each way).  bound defaults to n_local // 64; the exact
      cross-shard imbalance this must cover concentrates at
      O(cv * sqrt(N)) particles (cv^2 = 1 at a 0.5-ESS trigger).
    - exchange (exact, discrete K-state): one psum of K f32 category
      sums + scalar ticks — latency-bound, ~2*log2(k) hops.
    - island (approximate, unbiased in Z): scalar collectives only.
    """
    blk = n_local * (state_bytes + 4)
    ring_egress = (k - 1) * blk
    ring_time = ring_egress / ICI_BW + (k - 1) * HOP_LAT
    psum_time = 2 * np.log2(k) * HOP_LAT
    bound = max(1024, n_local // 64)
    bal_egress = 2 * bound * (state_bytes + 4)
    bal_time = (
        bal_egress / ICI_BW            # 2 boundary buffers, 1 hop each
        + 2 * HOP_LAT                  # the two ppermute hops
        + 2 * np.log2(k) * HOP_LAT     # all-gather of k scalars
    )
    return {
        "collective_ring": {
            "bytes_egress_per_shard_per_epoch": ring_egress,
            "epoch_time_s": ring_time,
            "per_sweep_comm_s": epochs * ring_time,
        },
        "balanced": {
            "bytes_egress_per_shard_per_epoch": bal_egress,
            "boundary_bound_rows": bound,
            "imbalance_coverage": (
                f"bound {bound} rows vs O(cv*sqrt(N)) = "
                f"{int(np.sqrt(n_local * k))} expected at cv=1 "
                f"(exact-ring fallback beyond)"
            ),
            "epoch_time_s": bal_time,
            "per_sweep_comm_s": epochs * bal_time,
        },
        "exchange": {
            "bytes_egress_per_shard_per_epoch": 3 * 4 * int(np.log2(k)) * 2,
            "epoch_time_s": psum_time,
            "per_sweep_comm_s": epochs * psum_time,
        },
        "island": {
            "bytes_egress_per_shard_per_epoch": 8 * int(np.log2(k)) * 2,
            "epoch_time_s": psum_time,
            "per_sweep_comm_s": epochs * psum_time,
        },
    }


_DTYPE_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2,
                "f16": 2, "s8": 1, "u8": 1, "pred": 1}


def hlo_comm_bytes(scheme: str, n_local: int, mesh):
    """On-wire bytes per shard per epoch, extracted from the compiled HLO
    (VERDICT r5 item 5: replace the hand comm model's inputs with what the
    compiler actually emits).

    Compiles ONE resample epoch of ``scheme`` under ``shard_map`` at the
    given per-shard population, then sums the result shapes of every
    collective op.  The balanced scheme compiles with ``fallback='none'``
    so the untaken exact-ring branch does not pollute the count."""
    import re
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from cpprob_tpu.parallel import resampling as R

    k = mesh.devices.size

    def fn(u0, lw, st):
        if scheme == "balanced":
            return R.balanced_systematic_resample(
                u0, lw, st, "particles", fallback="none")
        if scheme == "collective":
            return R.ring_systematic_resample(u0, lw, st, "particles")
        raise ValueError(scheme)

    wrapped = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P("particles"), P("particles")),
            out_specs=P("particles"),
        )
    )
    n = n_local * k
    txt = wrapped.lower(
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
        jax.ShapeDtypeStruct((n,), jnp.float32),
    ).compile().as_text()

    out = {}
    total_bytes = 0
    for op in ("collective-permute", "all-gather", "all-reduce",
               "all-to-all", "reduce-scatter"):
        op_bytes = 0
        count = 0
        # result can be a single array or a tuple of arrays
        for m in re.finditer(
            r"= (?:\(([^)]*)\)|(\w+\[[\d,]*\])[^ ]*) " + op + r"(?:-start)?\(",
            txt,
        ):
            shapes = m.group(1) or m.group(2)
            count += 1
            for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
                dt, dims = sm.group(1), sm.group(2)
                size = _DTYPE_BYTES.get(dt, 4)
                for d in dims.split(","):
                    if d:
                        size *= int(d)
                op_bytes += size
        if count:
            out[op] = {"ops": count, "result_bytes_per_shard": op_bytes}
            total_bytes += op_bytes
    out["total_collective_result_bytes_per_shard"] = total_bytes
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=1 << 14)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models import HMM_MEANS, HMM_TRANS, hmm_ssm
    from cpprob_tpu.parallel import particle_mesh, smc_sharded

    # --- measured: epochs triggered per sweep (ESS threshold 0.5) ---------
    rng = np.random.RandomState(0)
    z = rng.randint(0, 3)
    obs = []
    for t in range(T):
        if t > 0:
            z = rng.choice(3, p=HMM_TRANS[z])
        obs.append(rng.normal(HMM_MEANS[z], 1.0))
    obs = jnp.asarray(np.asarray(obs, np.float32))

    run = jax.jit(build_smc_run(hmm_ssm, 1 << 16, store_history=True))
    epoch_counts = [
        int(np.asarray(run(jax.random.key(i), obs).resampled).sum())
        for i in range(8)
    ]
    epochs_per_step = float(np.mean(epoch_counts))
    # The single-chip sweep time is the chunk=8 fused kernel, whose ESS
    # check runs at chunk boundaries (1 interior boundary at T=16):
    # bench.py's committed detail records resample_epochs = 1.0 per sweep
    # at 2^26 particles.  (The chunked kernels need the TPU hardware PRNG,
    # so the boundary count cannot be re-measured on this CPU mesh.)
    epochs = 1.0
    chunk_counts = "bench.py detail: resample_epochs=1.0 (2^26, chunk=8)"
    print(f"measured resample epochs/sweep (T={T}, thr 0.5): "
          f"per-step {epochs_per_step:.2f} {epoch_counts}; chunk=8 "
          f"boundaries {epochs:.2f} ({chunk_counts})", file=sys.stderr)

    # --- measured: virtual-mesh efficiencies (structural check) -----------
    from cpprob_tpu.models import kalman_filter_1d, linear_gaussian_ssm

    devices = jax.devices()

    def sweep_scheme(model, observations, scheme):
        rows = []
        for k in (1, 2, 4, 8):
            if k > len(devices):
                break
            mesh = particle_mesh(devices=devices[:k])
            n = args.per_device * k

            def runk(key):
                return smc_sharded(model, observations, n, key, mesh=mesh,
                                   scheme=scheme)

            r = runk(jax.random.key(0)); float(r.log_evidence)
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                r = runk(jax.random.key(i + 1))
                float(r.log_evidence)
                ts.append(time.perf_counter() - t0)
            rows.append({
                "devices": k, "n": n,
                "sweep_s": float(np.median(ts)),
                "log_evidence": float(r.log_evidence),
            })
        for row in rows[1:]:
            row["efficiency"] = rows[0]["sweep_s"] / row["sweep_s"]
        return rows

    virtual = {
        scheme: sweep_scheme(hmm_ssm, obs, scheme)
        for scheme in ("collective", "island", "exchange")
    }

    # continuous-state check for the balanced scheme: LG model vs Kalman
    obs_lg = jnp.asarray(
        np.random.RandomState(11).normal(0, 1.2, size=T).astype(np.float32)
    )
    _, _, kal_ll = kalman_filter_1d(obs_lg)
    virtual_cont = {
        scheme: sweep_scheme(linear_gaussian_ssm, obs_lg, scheme)
        for scheme in ("collective", "balanced")
    }
    for scheme, rows in virtual_cont.items():
        for row in rows:
            row["kalman_log_evidence"] = float(np.asarray(kal_ll))
            assert abs(row["log_evidence"] - float(np.asarray(kal_ll))) < 0.3, (
                scheme, row)

    # --- measured: the epoch ALONE, balanced vs ring, same mesh + inputs —
    # the full-sweep comparison above is dominated by 2-shared-host-core
    # noise (sub-3% deltas flip run to run); the isolated epoch is the
    # apples-to-apples measurement of the two schemes' actual work --------
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from cpprob_tpu.parallel import resampling as RES

    def epoch_only(scheme, n_local_epoch, iters=7):
        mesh = particle_mesh(devices=devices[: min(8, len(devices))])
        k = mesh.devices.size

        def fn(u0, lw, st):
            if scheme == "balanced":
                return RES.balanced_systematic_resample(
                    u0, lw, st, "particles")
            return RES.ring_systematic_resample(u0, lw, st, "particles")

        f = jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P("particles"), P("particles")),
            out_specs=P("particles"),
        ))
        n = n_local_epoch * k
        rng2 = np.random.RandomState(5)
        lw = jnp.asarray(rng2.randn(n).astype(np.float32))
        st = jnp.asarray(rng2.randn(n).astype(np.float32))
        f(jnp.float32(0.4), lw, st).block_until_ready()
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            f(jnp.float32(0.3 + 0.01 * i), lw, st).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    n_local_epoch = 1 << 19
    epoch_meas = {
        s: epoch_only(s, n_local_epoch) for s in ("collective", "balanced")
    }
    print(f"epoch-only at n_local=2^19, 8 devices: "
          f"ring {epoch_meas['collective']*1e3:.0f} ms vs balanced "
          f"{epoch_meas['balanced']*1e3:.0f} ms", file=sys.stderr)
    assert epoch_meas["balanced"] < epoch_meas["collective"], epoch_meas

    # --- HLO-derived on-wire bytes (r5: replaces the hand model's byte
    # inputs for the two data-moving schemes) ------------------------------
    mesh8 = particle_mesh(devices=devices[: min(8, len(devices))])
    hlo_comm = {}
    for scheme in ("collective", "balanced"):
        hlo_comm[scheme] = hlo_comm_bytes(scheme, N_LOCAL, mesh8)
        print(f"HLO comm [{scheme}] at n_local=2^{int(np.log2(N_LOCAL))}: "
              f"{hlo_comm[scheme]}", file=sys.stderr)

    # --- analytic structure + predicted 2-host efficiency, byte inputs
    # from the compiled HLO where available --------------------------------
    models = analytic_models(N_LOCAL, CHIPS, epochs)
    for scheme, key in (("collective_ring", "collective"),
                        ("balanced", "balanced")):
        hb = hlo_comm[key]
        cp = hb.get("collective-permute", {})
        models[scheme]["hlo_collective_ops"] = hb
        models[scheme]["bytes_egress_per_shard_per_epoch"] = cp.get(
            "result_bytes_per_shard",
            models[scheme]["bytes_egress_per_shard_per_epoch"],
        )
        epoch_time = (
            models[scheme]["bytes_egress_per_shard_per_epoch"] / ICI_BW
            + sum(v["ops"] for k2, v in hb.items() if isinstance(v, dict))
            * HOP_LAT
        )
        models[scheme]["epoch_time_s"] = epoch_time
        models[scheme]["per_sweep_comm_s"] = epochs * epoch_time
    predictions = {}
    for scheme, m in models.items():
        comm = m["per_sweep_comm_s"]
        # the fused sweep's compute does not overlap the resample epoch
        # (the epoch is a data dependency between chunks): no-overlap model
        predictions[scheme] = {
            "predicted_sweep_s": SINGLE_CHIP_SWEEP_S + comm,
            "predicted_weak_scaling_efficiency":
                SINGLE_CHIP_SWEEP_S / (SINGLE_CHIP_SWEEP_S + comm),
            **m,
        }

    out = {
        "artifact": "distributed-resampling communication characterization "
                    "+ 2-host prediction, incl. the exact balanced "
                    "continuous-state scheme (VERDICT r3 item 2)",
        "assumptions": {
            "ici_bw_one_way_bytes_per_s": ICI_BW,
            "hop_latency_s": HOP_LAT,
            "chips": CHIPS,
            "topology": "v5e 2-host slice, single ICI domain (ring over "
                        "the particle axis)",
            "single_chip_sweep_s": SINGLE_CHIP_SWEEP_S,
            "n_local": N_LOCAL,
            "T": T,
            "overlap": "none — a resample epoch is a data dependency "
                       "between chunk launches, so comm adds serially; "
                       "this makes the prediction a lower bound for "
                       "schemes where ppermute hops could overlap the "
                       "next chunk's compute after slot reindexing",
        },
        "measured": {
            "resample_epochs_per_sweep": epochs,
            "resample_epochs_note": "at chunk=8 boundary granularity (the "
                                    "fused kernel the compute time is "
                                    "measured on); per-step granularity "
                                    "triggers more often",
            "resample_epochs_per_sweep_per_step_granularity": epochs_per_step,
            "epoch_counts_by_seed": chunk_counts,
            "virtual_mesh": virtual,
            "virtual_mesh_continuous_lg": virtual_cont,
            "virtual_mesh_epoch_only": {
                "n_local": n_local_epoch,
                "devices": 8,
                "ring_epoch_s": epoch_meas["collective"],
                "balanced_epoch_s": epoch_meas["balanced"],
                "balanced_speedup": (epoch_meas["collective"]
                                     / epoch_meas["balanced"]),
                "note": "isolated resample epoch, identical mesh/inputs — "
                        "the apples-to-apples scheme comparison the noisy "
                        "full-sweep rows cannot give (asserted balanced < "
                        "ring at build time)",
            },
            "virtual_mesh_note": "2 shared host cores — efficiencies are "
                                 "lower bounds on collective overhead, not "
                                 "parallel speedup (see SCALING_r02.json); "
                                 "the continuous-LG rows additionally gate "
                                 "log-evidence against the exact Kalman "
                                 "filter at every mesh size",
        },
        "predicted_2host": predictions,
        "versions": __import__("cpprob_tpu.util.profiling", fromlist=["env_versions"]).env_versions(),
        "conclusion": (
            "The balanced scheme closes the r3 exact-continuous gap "
            "(SCALING_r03: ring at 3.8 GB/shard/epoch -> 12.3% predicted "
            "efficiency): exact natural-order systematic resampling whose "
            "comm is an all-gather of k scalars plus two bound-row boundary "
            "buffers (one ppermute hop each), with a bitwise-verified "
            "exact-ring fallback when cross-shard weight imbalance exceeds "
            "the bound. At 2^26 particles/chip the default bound "
            "(n_local/64 = 2^20 rows, 16 MB egress) predicts "
            ">=96% weak-scaling efficiency — comfortably above the >=85% "
            "BASELINE target — while the expected imbalance at a 0.5-ESS "
            "trigger is only ~sqrt(N) rows, far inside the bound. exchange "
            "(exact, discrete) and island (unbiased-Z) remain latency-bound "
            "at >=99.8%; the ring stays as the any-imbalance fallback."
        ),
    }
    path = args.out or os.path.join(repo, "SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Roofline analysis for every Pallas kernel family (VERDICT r5 item 1)
-> ROOFLINE_r05.json.

Calibrates the chip's ACHIEVABLE peaks with dedicated micro-kernels —
VPU f32 FMA stream, MXU dot stream, HBM copy (two sizes, so the ~2 ms
fixed per-launch dispatch cost of this attachment separates from the
marginal bandwidth), hardware-PRNG Box-Muller, exp/log transcendentals —
then, for each kernel family, counts the per-particle-step work from the
kernel source, derives the binding resource, and compares the committed
measured rate against that bound.

Peaks are measured, not spec-sheet numbers: the attachment's effective
rates (remote v5e) are what the kernels actually compete against.
Measured family rates are read from the committed artifacts
(BENCH_r05/KERNELS_r05) where available so the roofline always describes
the numbers the repo actually claims.

Usage: PYTHONPATH=.:/root/.axon_site python examples/roofline.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _timeit(g, *args, iters=5, inner=1):
    float(np.asarray(g(*args)).reshape(-1)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(g(*args)).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / inner


def _scan_call(f, x, sweeps):
    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        y, _ = jax.lax.scan(body, x, None, length=sweeps)
        return y.reshape(-1)[0]
    return g


def calibrate_vpu(rows=1 << 15, block_r=1024, chain=2048, sweeps=8):
    """Achievable f32 VPU FLOPs: an 8-way independent FMA chain mix (each
    chain step is a full-block vector op, so ILP comes from the 16+ vregs
    per op, not the chain count)."""

    def kernel(x_ref, o_ref):
        vs = [x_ref[:] * (1.0 + 1e-6 * i) for i in range(8)]
        for _ in range(chain // 8):
            vs = [v * 1.0000001 + 1e-7 for v in vs]
        acc = vs[0]
        for v in vs[1:]:
            acc = acc + v
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        grid=(rows // block_r,),
        in_specs=[pl.BlockSpec((block_r, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )
    x = jnp.ones((rows, LANES), jnp.float32)
    dt = _timeit(_scan_call(f, x, sweeps), x, inner=sweeps)
    return rows * LANES * chain * 2 / dt


def calibrate_mxu(m=512, k=512, n=512, par=8, reps=48, sweeps=8):
    """Achievable MXU MACs: ``par`` independent chains of square dots
    (operands truncate to bf16 under Mosaic DEFAULT precision — the same
    mode the guided kernels' dots use)."""

    def kernel(a_ref, b_ref, o_ref):
        chains = [a_ref[:] * (1.0 + 1e-6 * i) for i in range(par)]
        b = b_ref[:]
        for _ in range(reps):
            chains = [
                jax.lax.dot_general(
                    c, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * 1e-3
                for c in chains
            ]
        acc = chains[0]
        for c in chains[1:]:
            acc = acc + c
        o_ref[:] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )
    a = jnp.full((m, k), 0.01, jnp.float32)
    b = jnp.full((k, n), 0.01, jnp.float32)

    @jax.jit
    def g(a):
        def body(c, _):
            return f(c, b), None
        y, _ = jax.lax.scan(body, a, None, length=sweeps)
        return y.reshape(-1)[0]

    dt = _timeit(g, a, inner=sweeps)
    return m * k * n * par * reps / dt


def calibrate_hbm(block_r=1024, sweeps=16):
    """Marginal streaming HBM bandwidth + the fixed per-launch cost, from
    a two-size fit (t = fixed + bytes / bw)."""

    def one(rows):
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] + 1.0

        f = pl.pallas_call(
            kernel,
            grid=(rows // block_r,),
            in_specs=[pl.BlockSpec((block_r, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        )
        x = jnp.zeros((rows, LANES), jnp.float32)
        dt = _timeit(_scan_call(f, x, sweeps), x, inner=sweeps)
        return dt, rows * LANES * 4 * 2

    t1, b1 = one(1 << 17)   # 128 MB moved
    t2, b2 = one(1 << 19)   # 512 MB moved
    bw = (b2 - b1) / (t2 - t1)
    fixed = t1 - b1 / bw
    return bw, max(fixed, 0.0)


def calibrate_prng(rows=1 << 14, block_r=1024, draws=512, sweeps=8):
    """Hardware-PRNG Box-Muller normal variates/s (u16-pair construction,
    the construction the fused kernels use)."""

    def kernel(x_ref, o_ref):
        pltpu.prng_seed(1234 + pl.program_id(0))
        acc = x_ref[:]
        for _ in range(draws // 2):
            b = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), jnp.int32)
            u1 = (jax.lax.bitwise_and(b, jnp.int32(0xFFFF))
                  .astype(jnp.float32) * (1.0 / 65536.0)
                  + (0.5 / 65536.0))
            u2 = (jax.lax.shift_right_logical(b, 16)
                  .astype(jnp.float32) * (1.0 / 65536.0))
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            ang = 2.0 * jnp.pi * u2
            acc = acc + r * jnp.cos(ang) + r * jnp.sin(ang)
        o_ref[:] = acc * 1e-9

    f = pl.pallas_call(
        kernel,
        grid=(rows // block_r,),
        in_specs=[pl.BlockSpec((block_r, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )
    x = jnp.zeros((rows, LANES), jnp.float32)
    dt = _timeit(_scan_call(f, x, sweeps), x, inner=sweeps)
    return rows * LANES * draws / dt


def calibrate_transcendental(rows=1 << 14, block_r=1024, chain=1024,
                             sweeps=8):
    """exp+log1p pair throughput (the stable-softplus/log-q mix of the
    guided kernels); single-transcendental peak ~ 2x this."""

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        for _ in range(chain):
            a = jnp.log1p(jnp.exp(-jnp.abs(a))) + 0.3
        o_ref[:] = a

    f = pl.pallas_call(
        kernel,
        grid=(rows // block_r,),
        in_specs=[pl.BlockSpec((block_r, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )
    x = jnp.ones((rows, LANES), jnp.float32)
    dt = _timeit(_scan_call(f, x, sweeps), x, inner=sweeps)
    return rows * LANES * chain / dt


def _read_artifact(repo, name, *path):
    try:
        d = json.load(open(os.path.join(repo, name)))
        for p in path:
            d = d[p]
        return float(d)
    except Exception:
        return None


def analyze_families(peaks, repo):
    """Per-family op counts (derived from kernel source; the 'counting'
    notes say from where) -> binding resource -> measured fraction.

    Effective peaks: every measured kernel rate x its op count is itself
    a LOWER BOUND on the achievable resource rate, so each resource's
    effective peak is the max of the micro-kernel calibration and the
    rates the real kernels imply — the family at fraction 1.0 is the
    measured frontier for that resource, and every other family's
    fraction is how far it sits below that frontier."""

    hmm_rate = (_read_artifact(repo, "BENCH_ISLAND_r05.json", "runs",
                               "island_every_8", "particle_steps_per_s")
                or 126.7e9)
    # pass 1: every measured family rate x its op count is a LOWER BOUND
    # on the achievable resource rate; effective peaks are the max of the
    # micro-kernel calibrations and these implied rates (real kernels mix
    # op classes — compare/select dual-issue against FMAs, long-K dots
    # beat square-dot chains — so they can exceed single-op-class
    # micro-kernels)
    implied = {
        "vpu_f32_flops_per_s": max(
            hmm_rate * 24.5,          # 3-state whole-sweep kernel
            5.39e9 * 640,             # guided scalar VPU formulation
        ),
        "mxu_bf16_macs_per_s":
            (1 << 24) * 3 * 128 * 128 / 0.021,  # scatter epoch split-dots
    }
    for key, v in implied.items():
        eff = f"{key}_effective"
        peaks[eff] = max(peaks[key], v)
    peaks["effective_note"] = (
        "X_effective = max(micro-kernel calibration, best rate implied "
        "by a measured kernel at its counted ops) — the family at "
        "fraction 1.0 is the measured frontier for its binding resource"
    )

    vpu = peaks["vpu_f32_flops_per_s_effective"]
    mxu = peaks["mxu_bf16_macs_per_s_effective"]
    hbm = peaks["hbm_marginal_bytes_per_s"]
    prng = peaks["prng_normal_variates_per_s"]
    tpair = peaks["exp_log_pairs_per_s"]
    tsingle = 2.0 * tpair

    def entry(counts, measured, source, note):
        cands = {}
        if counts.get("vpu_flops"):
            cands["vpu"] = vpu / counts["vpu_flops"]
        if counts.get("mxu_macs"):
            cands["mxu"] = mxu / counts["mxu_macs"]
        if counts.get("hbm_bytes"):
            cands["hbm"] = hbm / counts["hbm_bytes"]
        if counts.get("prng_normals"):
            cands["prng"] = prng / counts["prng_normals"]
        if counts.get("transcendentals"):
            cands["transcendental"] = tsingle / counts["transcendentals"]
        res = min(cands, key=cands.get)
        bound = cands[res]
        return {
            "counts_per_particle_step": counts,
            "counting": note,
            "bounds_per_resource_steps_per_s": cands,
            "binding_resource": res,
            "bound_steps_per_s": bound,
            "measured_steps_per_s": measured,
            "measured_source": source,
            "fraction_of_bound": (measured / bound) if measured else None,
        }

    fams = {}

    # headline: 3-state HMM whole-sweep island kernel (pallas_hmm.py) —
    # the VPU frontier-setter (fraction 1.0 by construction, see above)
    fams["hmm3_whole_sweep_island8"] = entry(
        {"vpu_flops": 24.5, "prng_normals": 0.25, "hbm_bytes": 1.0},
        hmm_rate,
        "BENCH_ISLAND_r05.json:runs.island_every_8.particle_steps_per_s",
        "per step: u16 scale 2 + transition cdf quadratics 8 + compares 2 "
        "+ emission 4 + weight/mask 6 = ~22 VPU flops; island toll 3 "
        "reduction passes / 8 steps = +2.5 flop-equiv; PRNG = 16 of 64 "
        "Box-Muller-normal-equivalent bits; HBM = 16 B per particle per "
        "16-step chunk",
    )

    # kernel-from-spec 5-state (user chain; polynomial table lookups)
    m = _read_artifact(repo, "KERNELS_r05.json",
                       "discrete_5state_spec_kernel", "particle_steps_per_s")
    fams["discrete_5state_spec_chunk8"] = entry(
        {"vpu_flops": 52, "prng_normals": 0.25, "hbm_bytes": 2.0},
        m, "KERNELS_r05.json:discrete_5state_spec_kernel",
        "K=5: cdf walk 4x(cmp+add) = 8; per-state cdf columns via "
        "deg-4 table lookups 2x8; emission mean/inv2var/lognorm lookups "
        "3x8 = 24 (pallas_ssm._make_table_lookup); weight/mask 6",
    )

    # unguided scalar LG chunk kernel
    fams["unguided_scalar_chunk16"] = entry(
        {"vpu_flops": 14, "prng_normals": 1.0, "hbm_bytes": 1.0},
        30.8e9, "examples/guided_microbench.py (2^24, chunk 16, r5 run)",
        "x+eps 1, obs logpdf 4, weight/mask 6, Box-Muller share ~3; one "
        "normal per particle-step",
    )

    # guided scalar: MXU vs VPU formulations
    fams["guided_scalar_16x16_mxu"] = entry(
        {"vpu_flops": 70, "mxu_macs": 288, "prng_normals": 1.0,
         "transcendentals": 3.0, "hbm_bytes": 1.0},
        13.8e9, "examples/guided_microbench.py (2^24, r5 run)",
        "layer-1 broadcast FMA 32 + reshapes/eps/weight ~38 VPU; dots "
        "16x16 + 16x2 = 288 MACs; stable softplus = exp + log1p, log(std) "
        "= 3 transcendentals; 1 normal",
    )
    fams["guided_scalar_16x16_vpu"] = entry(
        {"vpu_flops": 640, "prng_normals": 1.0, "transcendentals": 3.0,
         "hbm_bytes": 1.0},
        5.39e9, "examples/guided_microbench.py (2^24, r5 run)",
        "unrolled elementwise MLP: (16 + 256 + 32) FMAs x2 flops + tail",
    )

    # guided discrete (categorical head)
    m = _read_artifact(repo, "KERNELS_r05.json",
                       "discrete_5state_guided_fused", "particle_steps_per_s")
    fams["guided_discrete_5state_mxu"] = entry(
        {"vpu_flops": 170, "mxu_macs": 417, "prng_normals": 0.25,
         "transcendentals": 6.0, "hbm_bytes": 2.0},
        m, "KERNELS_r05.json:discrete_5state_guided_fused",
        "one-hot build 5 + softmax max/sum/cum walks ~22 + masks/selects "
        "~25 + K^2 transition walk 75 + reshapes/weight ~43 VPU; dots "
        "(16,5)+(16,16)+(5,16) = 417 MACs; exp(K rows) 5 + log 1 = 6 "
        "transcendentals",
    )

    # streaming resample epoch (per PARTICLE, not per step)
    fams["resample_epoch_scatter"] = {
        "counts_per_particle": {
            "mxu_macs": 3 * 128 * 128,  # 3-way split dot, per input row
            "hbm_bytes": 4 * 2 + 4 * 4 + 4,
        },
        "counting": "per 128-input group: 3 x (128, G*128)@(G*128, 128) "
                    "split-dot share = 3*128^2 MACs/input; HBM: lw+v read, "
                    "st/dv write+read, out write",
        "bound_s_at_2^24": max(
            (1 << 24) * 3 * 128 * 128 / mxu,
            (1 << 24) * 28 / hbm,
        ),
        "binding_resource": ("mxu" if (3 * 128 * 128 / mxu > 28 / hbm)
                             else "hbm"),
        "measured_s_at_2^24": 0.021,
        "measured_source": "scatter epoch, r5 on-chip scan-amortized "
                           "measurement (~21 ms incl. 2 launches)",
        "launch_overhead_s": 3 * peaks["launch_fixed_s"],
    }

    return fams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-families", action="store_true")
    args = ap.parse_args()
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    from cpprob_tpu.util.profiling import env_versions

    print("calibrating peaks ...", file=sys.stderr)
    hbm_bw, fixed = calibrate_hbm()
    peaks = {
        "vpu_f32_flops_per_s": calibrate_vpu(),
        "mxu_bf16_macs_per_s": calibrate_mxu(),
        "hbm_marginal_bytes_per_s": hbm_bw,
        "launch_fixed_s": fixed,
        "prng_normal_variates_per_s": calibrate_prng(),
        "exp_log_pairs_per_s": calibrate_transcendental(),
    }
    for k, v in peaks.items():
        print(f"  {k:28s}: {v:.3e}", file=sys.stderr)

    out = {
        "artifact": "roofline: measured achievable peaks + per-family op "
                    "counts -> binding resource -> fraction of bound "
                    "(VERDICT r5 item 1)",
        "device": str(jax.devices()[0]),
        "versions": env_versions(),
        "method": (
            "peaks measured with dedicated Pallas micro-kernels on this "
            "attachment (scan-amortized; HBM fit over two sizes separates "
            "the ~fixed per-launch dispatch cost); family op counts "
            "derived from kernel source (see per-family 'counting'); "
            "bound = min over resources of peak / count-per-step; "
            "fraction = measured / bound"
        ),
        "peaks": peaks,
        "families": {} if args.skip_families
        else analyze_families(peaks, repo),
    }
    path = args.out or os.path.join(repo, "ROOFLINE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

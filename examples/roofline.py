#!/usr/bin/env python
"""Roofline analysis for every Pallas kernel family (VERDICT r5 item 1).

Calibrates the chip's achievable peaks with four micro-kernels (VPU f32
FMA chain, MXU dot stream, HBM copy, hardware-PRNG draw+Box-Muller), then
for each kernel family counts the per-particle-step work analytically,
derives the binding limit, and compares the measured rate against it.

Writes ``ROOFLINE_r05.json``; cited from README/PARITY.  Run on the real
chip (`PYTHONPATH=.:/root/.axon_site python examples/roofline.py`).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _time_call(g, *args, iters=5, inner=1):
    float(np.asarray(g(*args)).reshape(-1)[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(g(*args)).reshape(-1)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / inner


def _grid_call(kernel, rows, block_r, n_out_dtype=jnp.float32):
    return pl.pallas_call(
        kernel,
        grid=(rows // block_r,),
        in_specs=[pl.BlockSpec((block_r, LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block_r, LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), n_out_dtype),
    )


def calibrate_vpu(rows=1 << 14, block_r=512, chain=256, sweeps=4):
    """Achievable f32 VPU FLOPs: an unrolled independent-4-chain FMA mix."""

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        b = a * 1.000001 + 0.1
        c = a * 0.999999 - 0.1
        d = a * 1.000002 + 0.2
        for _ in range(chain // 4):
            a = a * 1.000001 + 1e-7
            b = b * 0.999999 + 1e-7
            c = c * 1.000002 - 1e-7
            d = d * 0.999998 - 1e-7
        o_ref[:] = a + b + (c + d)

    f = _grid_call(kernel, rows, block_r)
    x = jnp.ones((rows, LANES), jnp.float32)

    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        y, _ = jax.lax.scan(body, x, None, length=sweeps)
        return y[0, 0]

    dt = _time_call(g, x, inner=sweeps)
    flops = rows * LANES * chain * 2
    return flops / dt


def calibrate_mxu(m=512, k=512, n=512, reps=32, sweeps=4):
    """Achievable MXU MACs via a chained square dot stream (operands are
    truncated to bf16 by Mosaic's DEFAULT dot precision — this is the
    peak the guided kernels' dots see)."""

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        for _ in range(reps):
            a = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * 1e-3
        o_ref[:] = a

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )
    a = jnp.ones((m, k), jnp.float32) * 0.01
    b = jnp.ones((k, n), jnp.float32) * 0.01

    @jax.jit
    def g(a, b):
        def body(c, _):
            return f(c, b), None
        y, _ = jax.lax.scan(body, a, None, length=sweeps)
        return y[0, 0]

    dt = _time_call(g, a, b, inner=sweeps)
    macs = m * k * n * reps
    return macs / dt


def calibrate_hbm(rows=1 << 17, block_r=1024, sweeps=8):
    """Streaming HBM bandwidth: read + write one f32 plane (2 x 64 MB)."""

    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    f = _grid_call(kernel, rows, block_r)
    x = jnp.zeros((rows, LANES), jnp.float32)

    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        y, _ = jax.lax.scan(body, x, None, length=sweeps)
        return y[0, 0]

    dt = _time_call(g, x, inner=sweeps)
    return rows * LANES * 4 * 2 / dt


def calibrate_prng(rows=1 << 13, block_r=512, draws=64, sweeps=4):
    """Hardware PRNG draw + Box-Muller rate, in normal variates/s (each
    variate: half a prng_random_bits tile + sqrt/log/cos mix)."""

    def kernel(x_ref, o_ref):
        pltpu.prng_seed(1234 + pl.program_id(0))
        acc = x_ref[:]
        for t in range(draws // 2):
            b = pltpu.bitcast(pltpu.prng_random_bits(acc.shape), jnp.int32)
            u1 = ((b >> 8).astype(jnp.float32) + 8388608.0) * (2.0 ** -24) \
                * 0.5
            u2 = (b & 0xFFFF).astype(jnp.float32) * (1.0 / 65536.0) \
                + (0.5 / 65536.0)
            r = jnp.sqrt(-2.0 * jnp.log(u1))
            ang = 2.0 * jnp.pi * u2
            acc = acc + r * jnp.cos(ang) + r * jnp.sin(ang)
        o_ref[:] = acc

    f = _grid_call(kernel, rows, block_r)
    x = jnp.zeros((rows, LANES), jnp.float32)

    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        y, _ = jax.lax.scan(body, x, None, length=sweeps)
        return y[0, 0]

    dt = _time_call(g, x, inner=sweeps)
    return rows * LANES * draws / dt


def calibrate_transcendental(rows=1 << 13, block_r=512, chain=64, sweeps=4):
    """exp+log pair throughput (the guided kernels' softplus/log mix)."""

    def kernel(x_ref, o_ref):
        a = x_ref[:]
        for _ in range(chain):
            a = jnp.log1p(jnp.exp(-jnp.abs(a))) + 0.3
        o_ref[:] = a

    f = _grid_call(kernel, rows, block_r)
    x = jnp.ones((rows, LANES), jnp.float32)

    @jax.jit
    def g(x):
        def body(c, _):
            return f(c), None
        y, _ = jax.lax.scan(body, x, None, length=sweeps)
        return y[0, 0]

    dt = _time_call(g, x, inner=sweeps)
    return rows * LANES * chain / dt  # exp+log pairs per second


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROOFLINE_r05.json")
    ap.add_argument("--skip-families", action="store_true",
                    help="only calibrate peaks")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, ".")
    from cpprob_tpu.util.profiling import env_versions

    print("calibrating peaks ...")
    peaks = {
        "vpu_f32_flops_per_s": calibrate_vpu(),
        "mxu_bf16_macs_per_s": calibrate_mxu(),
        "hbm_bytes_per_s": calibrate_hbm(),
        "prng_normal_variates_per_s": calibrate_prng(),
        "exp_log_pairs_per_s": calibrate_transcendental(),
    }
    for k, v in peaks.items():
        print(f"  {k:28s}: {v:.3e}")

    out = {
        "artifact": "roofline: calibrated peaks + per-family op counts",
        "device": str(jax.devices()[0]),
        "versions": env_versions(),
        "method": (
            "peaks measured with dedicated Pallas micro-kernels on this "
            "chip (not spec-sheet numbers); family op counts derived from "
            "the kernel source; bound = min over resources of "
            "peak/(count per particle-step); fraction = measured/bound"
        ),
        "peaks": peaks,
        "families": {},
    }

    if not args.skip_families:
        out["families"] = analyze_families(peaks)

    json.dump(out, open(args.out, "w"), indent=1)
    print("wrote", args.out)


def analyze_families(peaks):
    """Per-family op counts (hand-derived from kernel source, see the
    per-family 'counting' notes) -> binding limit -> measured fraction.

    Measured rates come from the committed bench artifacts where present
    (re-measured by examples/guided_microbench.py / kernel_bench.py)."""
    fam = {}

    def bound(counts):
        # returns (steps/s bound, binding resource)
        cands = {}
        if counts.get("vpu_flops"):
            cands["vpu"] = peaks["vpu_f32_flops_per_s"] / counts["vpu_flops"]
        if counts.get("mxu_macs"):
            cands["mxu"] = peaks["mxu_bf16_macs_per_s"] / counts["mxu_macs"]
        if counts.get("hbm_bytes"):
            cands["hbm"] = peaks["hbm_bytes_per_s"] / counts["hbm_bytes"]
        if counts.get("prng_normals"):
            cands["prng"] = (peaks["prng_normal_variates_per_s"]
                             / counts["prng_normals"])
        if counts.get("exp_log_pairs"):
            cands["transcendental"] = (peaks["exp_log_pairs_per_s"]
                                       / counts["exp_log_pairs"])
        res = min(cands, key=cands.get)
        return cands[res], res, cands

    # ---- fused discrete 3-state HMM (ops/pallas_hmm.py chunk kernel) ----
    # per particle-step: u16 uniform (1/2 prng tile, no Box-Muller),
    # transition via 2 compares + 2 adds on synth ticks ... measured ~14
    # VPU flops (table lookups: mean/inv2var/lognorm polynomial over K=3:
    # 3x ~4 flops) + exp for the weight exp? no - weights stay in log.
    # counting: 2 (uniform scale) + 3x2 (cmp+add cdf walk) + 3x2 (poly
    # lookups deg 2) + 4 (emission) + 4 (weight/mask) = ~22 VPU flops;
    # 16 prng bits = 1/4 normal-equivalent draw cost (no transcendentals)
    c = {"vpu_flops": 22, "prng_normals": 0.25,
         "hbm_bytes": 8 * 2 / 16}  # chunk=8: 2 planes r+w per 8 steps ->
    # 2*4B*2/8 = 2 B/step at 2^26... conservative: 16 steps/chunk=8 -> 2
    b, r, cands = bound(c)
    fam["fused_discrete_3state_chunk8"] = {
        "counts_per_particle_step": c, "bound_steps_per_s": b,
        "binding_resource": r, "bounds_all": cands,
        "measured_steps_per_s": 91.5e9,
        "measured_source": "BENCH_r04.json:parsed.value",
        "fraction_of_bound": 91.5e9 / b,
    }

    # ---- unguided scalar SSM (attach_fused_scalar_kernels, LG physics) --
    # per step: Box-Muller every 2 steps (1 normal) + step_elem (x+eps,
    # obs logpdf ~6 flops) + weight/mask ~6 -> ~12 VPU flops + 1 normal
    c = {"vpu_flops": 12, "prng_normals": 1.0, "hbm_bytes": 2 * 4 * 2 / 16}
    b, r, cands = bound(c)
    fam["unguided_scalar_chunk16"] = {
        "counts_per_particle_step": c, "bound_steps_per_s": b,
        "binding_resource": r, "bounds_all": cands,
        "measured_steps_per_s": None,  # filled by guided_microbench
        "fraction_of_bound": None,
    }

    # ---- guided scalar [3,16,16,2] VPU formulation -----------------------
    # layer1 16x2 + layer2 256x2 + out 32x2 = 608 VPU flops; softplus
    # (exp+log1p ~ 1 pair) + log(std) (~0.5 pair) per step; 1 normal;
    # physics+weight ~12
    c = {"vpu_flops": 620, "prng_normals": 1.0, "exp_log_pairs": 1.5,
         "hbm_bytes": 1.0}
    b, r, cands = bound(c)
    fam["guided_scalar_16x16_vpu"] = {
        "counts_per_particle_step": c, "bound_steps_per_s": b,
        "binding_resource": r, "bounds_all": cands,
        "measured_steps_per_s": None,
        "fraction_of_bound": None,
    }

    # ---- guided scalar [3,16,16,2] MXU formulation -----------------------
    # layer1 broadcast 32 VPU flops; dots: 16x16 + 16x2 = 288 MXU MACs;
    # same transcendental/prng/physics tail
    c = {"vpu_flops": 60, "mxu_macs": 288, "prng_normals": 1.0,
         "exp_log_pairs": 1.5, "hbm_bytes": 1.0}
    b, r, cands = bound(c)
    fam["guided_scalar_16x16_mxu"] = {
        "counts_per_particle_step": c, "bound_steps_per_s": b,
        "binding_resource": r, "bounds_all": cands,
        "measured_steps_per_s": None,
        "fraction_of_bound": None,
    }

    return fam


if __name__ == "__main__":
    main()

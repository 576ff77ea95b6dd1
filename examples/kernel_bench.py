"""Generated-kernel + streaming-resample benchmarks -> KERNELS_r05.json.

Measures, on the real TPU chip, the kernel-from-spec deliverables:

1. kernel-from-spec discrete HMM (user-defined asymmetric 5-state chain,
   NOT the reference's hard-wired 3-state model) through
   ``make_fused_discrete_ssm`` + ``build_smc_run(chunk=8)``, with the
   log-evidence checked against the exact forward recursion;
2. the linear-Gaussian model with ESS-triggered resampling live, where the
   epoch runs the streaming Pallas merge resample (sort/scatter-free);
3. the streaming resample epoch itself vs the XLA sorted-fill epoch.

Every timed region is closed by a host transfer (remote-backend
block_until_ready returns early).

Usage: python examples/kernel_bench.py [--n 24] [--out KERNELS_r05.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

TRANS5 = np.array(
    [
        [0.50, 0.20, 0.10, 0.10, 0.10],
        [0.05, 0.60, 0.20, 0.10, 0.05],
        [0.10, 0.10, 0.40, 0.30, 0.10],
        [0.20, 0.05, 0.05, 0.50, 0.20],
        [0.10, 0.10, 0.10, 0.10, 0.60],
    ]
)
MEANS5 = np.array([-2.0, -1.0, 0.0, 1.0, 2.0])
STDS5 = np.array([0.5, 1.0, 0.7, 1.2, 0.9])
INIT5 = np.array([0.3, 0.1, 0.2, 0.2, 0.2])


SWEEPS = 8  # sweeps scanned inside one jitted call: amortizes the ~24 ms
            # host dispatch+fetch latency of the remote TPU tunnel


def make_multi_sweep(run_one, obs):
    def multi(key):
        keys = jax.random.split(key, SWEEPS)

        def body(_, k):
            return None, run_one(k, obs).log_evidence

        _, lz = jax.lax.scan(body, None, keys)
        return lz
    return multi


def timed(fn, key_base, iters=5, st=None, label=""):
    """st: a StageTimer — records the compile+warm call and the timed
    iterations as separate stages for the artifact's stage breakdown."""
    if st is not None:
        with st.stage(f"{label}:compile_warm"):
            fn(jax.random.key(key_base))
    else:
        fn(jax.random.key(key_base))  # compile+warm (result fetched inside)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        if st is not None:
            with st.stage(f"{label}:timed_iters"):
                fn(jax.random.key(key_base + 1 + i))
        else:
            fn(jax.random.key(key_base + 1 + i))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24, help="log2 particles")
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    N, T = 1 << args.n, args.T

    from cpprob_tpu.inference.resampling import (
        sorted_systematic_resample_values,
    )
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models.linear_gaussian import kalman_filter_1d
    from cpprob_tpu.ops.pallas_resample import _streaming_resample
    from cpprob_tpu.ops.pallas_ssm import (
        discrete_hmm_log_evidence,
        make_fused_discrete_ssm,
    )

    from cpprob_tpu.util.profiling import StageTimer

    st = StageTimer()
    out = {
        "artifact": "generated-kernel + streaming-resample benchmarks",
        "device": str(jax.devices()[0]),
        "n_particles": N,
        "T": T,
    }

    # --- 1. user-defined 5-state HMM through the spec builder --------------
    rng = np.random.default_rng(0)
    z = rng.choice(5, p=INIT5)
    ys5 = []
    for _ in range(T):
        ys5.append(MEANS5[z] + STDS5[z] * rng.standard_normal())
        z = rng.choice(5, p=TRANS5[z])
    ys5 = jnp.asarray(np.array(ys5), jnp.float32)
    exact5 = discrete_hmm_log_evidence(TRANS5, MEANS5, STDS5, INIT5, ys5)
    ssm5 = make_fused_discrete_ssm(TRANS5, MEANS5, STDS5, INIT5)
    run5_one = build_smc_run(ssm5, N, chunk=8, store_history=False)
    run5 = jax.jit(make_multi_sweep(run5_one, ys5))
    lzs = []

    def go5(key):
        lz = run5(key)
        lzs.extend(np.asarray(lz).tolist())

    dt5 = timed(go5, 0, iters=8, st=st, label="hmm5") / SWEEPS
    out["discrete_5state_spec_kernel"] = {
        "particle_steps_per_s": N * T / dt5,
        "sweep_s": dt5,
        "log_evidence_mean": float(np.mean(lzs)),
        "log_evidence_std": float(np.std(lzs)),
        "exact_log_evidence": exact5,
        "chunk": 8,
        "builder": "make_fused_discrete_ssm (ops/pallas_ssm.py)",
    }
    print(f"5-state spec kernel: {N*T/dt5/1e9:.1f} G steps/s, "
          f"logZ {np.mean(lzs):.4f} vs exact {exact5:.4f}", file=sys.stderr)

    # --- 2. linear-Gaussian with live resampling (streaming epoch) ---------
    # built through the generic scalar builder (user-supplied elementwise
    # physics), NOT the hand-written ops/pallas_hmm LG kernel
    from cpprob_tpu.models.linear_gaussian import linear_gaussian_ssm
    from cpprob_tpu.ops.pallas_ssm import attach_fused_scalar_kernels

    half_log_2pi = 0.9189385332046727

    def lg_step_elem(x, y, eps):
        nx = x + eps
        d = y - nx
        return nx, -0.5 * d * d - half_log_2pi

    ys = jax.random.normal(jax.random.key(7), (T,)) * 1.5
    lg = attach_fused_scalar_kernels(linear_gaussian_ssm, lg_step_elem)
    runlg_one = build_smc_run(lg, N, chunk=8, store_history=False)
    res_holder = {}

    def multi_lg(key):
        keys = jax.random.split(key, SWEEPS)

        def body(_, k):
            r = runlg_one(k, ys)
            return None, (r.log_evidence, r.resampled.sum())

        _, (lz, ep) = jax.lax.scan(body, None, keys)
        return lz, ep

    runlg = jax.jit(multi_lg)

    def golg(key):
        lz, ep = runlg(key)
        res_holder["lz"] = float(np.asarray(lz).mean())
        res_holder["epochs"] = float(np.asarray(ep).mean())

    dtlg = timed(golg, 100, st=st, label="lg") / SWEEPS
    _, _, ll = kalman_filter_1d(ys)
    out["linear_gaussian_live_resampling"] = {
        "particle_steps_per_s": N * T / dtlg,
        "sweep_s": dtlg,
        "resample_epochs_mean": res_holder["epochs"],
        "log_evidence_mean": res_holder["lz"],
        "kalman_log_evidence": float(np.asarray(ll)),
        "sweeps_per_call": SWEEPS,
        "epoch_resampler": "streaming Pallas scatter+prefix (ops/pallas_resample.py)",
    }
    print(f"LG live-resample: {N*T/dtlg/1e9:.2f} G steps/s "
          f"({res_holder['epochs']} epochs), logZ {res_holder['lz']:.3f} "
          f"vs kalman {float(np.asarray(ll)):.3f}", file=sys.stderr)

    # --- 2b. GUIDED linear-Gaussian through the fused guided kernel --------
    # (in-kernel proposal MLP q(z_t | z_{t-1}, y_t), hidden=8, exact RN
    # weights — VERDICT r3 item 8b)
    from cpprob_tpu.inference.smc_csis import train_ssm_proposal
    from cpprob_tpu.ops.pallas_ssm import attach_fused_guided_scalar_kernels

    gparams, _ = train_ssm_proposal(
        linear_gaussian_ssm, jax.random.key(5), T, kind="normal",
        steps=600, batch_size=256, hidden=16,
    )

    def trans_lp(x, nx, t):
        d = nx - x
        return -0.5 * d * d - half_log_2pi

    def obs_lp(nx, y, t):
        d = y - nx
        return -0.5 * d * d - half_log_2pi

    lg_guided = attach_fused_guided_scalar_kernels(
        linear_gaussian_ssm, gparams, T,
        trans_logpdf_elem=trans_lp, obs_logpdf_elem=obs_lp,
    )
    rung_one = build_smc_run(lg_guided, N, chunk=8, store_history=False)
    gres = {}

    def multi_g(key):
        keys = jax.random.split(key, SWEEPS)

        def body(_, k):
            r = rung_one(k, ys)
            return None, (r.log_evidence, r.resampled.sum())

        _, (lz, ep) = jax.lax.scan(body, None, keys)
        return lz, ep

    rung = jax.jit(multi_g)

    def gog(key):
        lz, ep = rung(key)
        gres["lz"] = float(np.asarray(lz).mean())
        gres["epochs"] = float(np.asarray(ep).mean())

    dtg = timed(gog, 400, st=st, label="lg_guided") / SWEEPS
    out["linear_gaussian_guided_fused"] = {
        "particle_steps_per_s": N * T / dtg,
        "sweep_s": dtg,
        "resample_epochs_mean": gres["epochs"],
        "log_evidence_mean": gres["lz"],
        "kalman_log_evidence": float(np.asarray(ll)),
        "proposal": "in-kernel MLP [3,16,16,2] (smc_csis 'normal' head)",
        "builder": "attach_fused_guided_scalar_kernels (ops/pallas_ssm.py)",
    }
    print(f"LG guided fused: {N*T/dtg/1e9:.2f} G steps/s "
          f"({gres['epochs']} epochs), logZ {gres['lz']:.3f} "
          f"vs kalman {float(np.asarray(ll)):.3f}", file=sys.stderr)

    # --- 2c. GUIDED 5-state HMM through the fused guided discrete kernel ---
    # (in-kernel categorical proposal head + exchange resampling + exact RN
    # weights)
    from cpprob_tpu.ops.pallas_ssm import attach_fused_guided_discrete_kernels

    dparams, _ = train_ssm_proposal(
        ssm5, jax.random.key(6), T, kind="discrete", n_states=5,
        steps=300, batch_size=256, hidden=16,
    )
    g5 = attach_fused_guided_discrete_kernels(
        TRANS5, MEANS5, STDS5, INIT5, params=dparams, T=T,
    )
    rung5_one = build_smc_run(g5, N, chunk=8, store_history=False)
    rung5 = jax.jit(make_multi_sweep(rung5_one, ys5))
    glzs = []

    def gog5(key):
        lz = rung5(key)
        glzs.extend(np.asarray(lz).tolist())

    dtg5 = timed(gog5, 500, iters=6, st=st, label="hmm5_guided") / SWEEPS
    out["discrete_5state_guided_fused"] = {
        "particle_steps_per_s": N * T / dtg5,
        "sweep_s": dtg5,
        "log_evidence_mean": float(np.mean(glzs)),
        "log_evidence_std": float(np.std(glzs)),
        "exact_log_evidence": exact5,
        "proposal": "in-kernel categorical head [K+2,16,16,K]",
        "builder": "attach_fused_guided_discrete_kernels (ops/pallas_ssm.py)",
    }
    print(f"5-state guided fused: {N*T/dtg5/1e9:.1f} G steps/s, "
          f"logZ {np.mean(glzs):.4f} vs exact {exact5:.4f}", file=sys.stderr)

    # --- 3. resample epoch: streaming kernel vs XLA sorted-fill ------------
    # SWEEPS epochs scanned inside one jitted call, chained through a
    # scalar perturbation so XLA cannot hoist the work — isolates device
    # time from the ~24 ms remote-tunnel dispatch latency (the r4 artifact
    # included one dispatch per epoch)
    log_w = jax.random.normal(jax.random.key(1), (N,)) * 2.0
    vals = jax.random.normal(jax.random.key(2), (N,))

    def epoch_scan(fn):
        @jax.jit
        def g(u0):
            def body(c, i):
                r = fn(u0 + c * 1e-30 + i * 1e-6)
                return r[0] + r[-1], None
            out, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(SWEEPS, dtype=jnp.float32))
            return out
        return g

    f_stream = epoch_scan(lambda u: _streaming_resample(u, log_w, vals))
    f_sorted = epoch_scan(
        lambda u: sorted_systematic_resample_values(
            jax.random.key(jnp.asarray(u * 1e6, jnp.int32)), log_w, vals)
    )

    def gos(key):
        _ = float(np.asarray(f_stream(jax.random.uniform(key, ()))))

    def gox(key):
        _ = float(np.asarray(f_sorted(jax.random.uniform(key, ()))))

    t_stream = timed(gos, 200, iters=4, st=st, label="epoch_stream") / SWEEPS
    t_sorted = timed(gox, 300, iters=4, st=st, label="epoch_sorted") / SWEEPS
    out["resample_epoch"] = {
        "streaming_pallas_s": t_stream,
        "xla_sorted_fill_s": t_sorted,
        "speedup": t_sorted / t_stream,
    }
    print(f"epoch at 2^{args.n}: streaming {t_stream*1e3:.1f} ms vs "
          f"sorted-fill {t_sorted*1e3:.1f} ms = {t_sorted/t_stream:.1f}x",
          file=sys.stderr)

    out["stages"] = st.as_dict()
    from cpprob_tpu.util.profiling import env_versions

    out["versions"] = env_versions()
    path = args.out or os.path.join(repo, "KERNELS_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

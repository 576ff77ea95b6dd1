"""External black-box simulator inference with the TPU IN THE LOOP
(VERDICT r5 item 3) -> EXTERNAL_BRIDGE_r05.json.

The reference's defining configuration — inference driving an external
generator (``src/models/sherpa.cpp:29-86``) — previously only ever ran on
CPU here, because the traced bridge rides ``jax.pure_callback`` and this
TPU attachment's runtime does not implement host callbacks at all
(measured: ``UNIMPLEMENTED: axon_pjrt does not support host send/recv
callbacks``).  This example runs the same flagship workload with REAL TPU
compute via an explicitly STAGED pipeline, the architecture any
callback-less backend would use:

  stage A (TPU, one jitted program): vmapped GUIDED sampling of the
      latent sites — the trained CSIS messenger proposing (channel,
      energy) for the whole particle population, accumulating the exact
      Radon-Nikodym partial weights on-device;
  host: one pipelined batch exchange with the external child process
      (the same line-protocol toy calorimeter as
      ``external_simulator.py``);
  stage B (TPU, one jitted program): per-particle ABC likelihood over the
      returned deposits + weight combination + ESS / channel-posterior /
      energy reductions, all on-device.

The CSIS proposal itself is trained through the generic
``observe_external`` pure-callback seam on the in-process CPU backend
(both backends coexist; training is a one-time cost), then the params are
device_put to the TPU for serving.  Each stage's device is recorded in
the artifact, along with the measured host<->device pipeline split —
the per-batch transfer + simulator cost the verdict asked to see
measured.  Gates: channel recovery, guided-vs-prior ESS ratio > 1, and
energy posterior error vs truth, each over independent seeds.

Usage: PYTHONPATH=.:/root/.axon_site python examples/external_tpu.py
"""

import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from external_simulator import N_CHANNELS, OBS_DIM  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traces", type=int, default=8000)
    ap.add_argument("--particles", type=int, default=8192)
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--train-only", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

    if args.train_only is None and os.environ.get("JAX_PLATFORMS") != "cpu":
        # phase 1 in a child process pinned to the CPU platform: the CSIS
        # proposal trains through the generic observe_external
        # pure-callback seam, which this attachment's TPU runtime cannot
        # host (and eager discovery would hit the same limitation)
        import subprocess
        import tempfile

        workdir = tempfile.mkdtemp(prefix="exttpu_")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--train-only", workdir, "--traces", str(args.traces)],
            env=env,
        )
        assert r.returncode == 0, "training child failed"
        print(f"training child done in {time.time()-t0:.1f}s -> {workdir}",
              file=sys.stderr)
        os.environ["EXTTPU_WORKDIR"] = workdir

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from cpprob_tpu.core import handlers, observe, predict, sample
    from cpprob_tpu.distributions import Uniform, UniformInt, make_abc
    from cpprob_tpu.external import SubprocessSimulator, observe_external
    from cpprob_tpu.inference.csis import CSIS
    from cpprob_tpu.util.profiling import StageTimer, env_versions

    acc = jax.devices()[0]
    if acc.platform == "cpu":
        print("NOTE: no accelerator attached; stages will run on CPU",
              file=sys.stderr)

    os.environ.setdefault("EXTSIM_SEED", "7")
    sim_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "external_simulator.py")
    sim = SubprocessSimulator(
        [sys.executable, sim_path, "--simulator"], OBS_DIM
    )

    def abc_logpdf(simulated):
        def logpdf(observed):
            var = jnp.maximum(simulated, 1.0)
            d = observed - simulated
            return jnp.sum(-0.5 * d * d / var
                           - 0.5 * jnp.log(2 * jnp.pi * var))
        return logpdf

    def model_traced(observed):
        ch = sample(UniformInt(0, N_CHANNELS - 1), addr="Decay Channel")
        energy = sample(Uniform(10.0, 50.0), addr="Energy")
        deposits = observe_external(
            sim, jnp.stack([ch.astype(jnp.float32), energy]), OBS_DIM
        )
        observe(make_abc(lambda k: deposits, abc_logpdf(deposits)),
                observed, addr="calo")
        predict(ch, "Channel")
        predict(energy, "Energy")

    def model_pre(observed):
        """The model UP TO the external call — everything the TPU can run
        before the host must talk to the child."""
        ch = sample(UniformInt(0, N_CHANNELS - 1), addr="Decay Channel")
        energy = sample(Uniform(10.0, 50.0), addr="Energy")
        return ch, energy

    # ground-truth event
    true_ch, true_e = 1, 37.0
    observed_np = np.asarray(sim(np.array([true_ch, true_e])), np.float32)

    steps = max(30, args.traces // 64)
    from cpprob_tpu.util.checkpoint import load_pytree, save_pytree

    if args.train_only is not None:
        # phase 1 (cpu platform): train through the pure-callback seam
        eng = CSIS(model_traced, (jnp.zeros(OBS_DIM),))
        t0 = time.time()
        params, losses = eng.compile(jax.random.key(0), steps=steps,
                                     batch_size=64)
        train_s = time.time() - t0
        print(f"compile (cpu, callback seam): {steps * 64} external traces "
              f"in {train_s:.1f}s, loss {float(losses[0]):.2f} -> "
              f"{float(losses[-10:].mean()):.2f}", file=sys.stderr)
        save_pytree(os.path.join(args.train_only, "params"), params)
        np.savez(os.path.join(args.train_only, "meta.npz"),
                 observed=observed_np, train_s=train_s)
        return

    # phase 2 (accelerator attached): structure via a callback-free stub
    # (same sites — discovery never needs the real child output), trained
    # params from the phase-1 checkpoint
    def model_stub(observed):
        ch = sample(UniformInt(0, N_CHANNELS - 1), addr="Decay Channel")
        energy = sample(Uniform(10.0, 50.0), addr="Energy")
        deposits = jnp.zeros(OBS_DIM)
        observe(make_abc(lambda k: deposits, abc_logpdf(deposits)),
                observed, addr="calo")
        predict(ch, "Channel")
        predict(energy, "Energy")

    workdir = os.environ["EXTTPU_WORKDIR"]
    eng = CSIS(model_stub, (jnp.zeros(OBS_DIM),))
    params = load_pytree(os.path.join(workdir, "params.npz"),
                         eng.init(jax.random.key(0)))
    meta = np.load(os.path.join(workdir, "meta.npz"))
    observed_np = meta["observed"]
    train_s = float(meta["train_s"])

    # --- staged inference with the accelerator in the loop ----------------
    params_acc = jax.device_put(params, acc)
    observed_acc = jax.device_put(jnp.asarray(observed_np), acc)
    n = args.particles

    def make_stage_a(guided: bool):
        factory = (eng.proposal_factory(params_acc, (observed_acc,))
                   if guided else None)

        def particle_pre(key):
            lw = handlers.LogWeight()
            ctx = [handlers.Seed(key), lw]
            if factory is not None:
                ctx.append(factory())
            with contextlib.ExitStack() as stack:
                for c in ctx:
                    stack.enter_context(c)
                ch, energy = model_pre(observed_acc)
            return (ch.astype(jnp.float32), energy, lw.log_weight)

        @jax.jit
        def stage_a(key):
            keys = jax.random.split(key, n)
            return jax.vmap(particle_pre)(keys)

        return stage_a

    @jax.jit
    def stage_b(deposits, chs, energies, lw_partial, observed):
        var = jnp.maximum(deposits, 1.0)
        d = observed[None, :] - deposits
        ll = jnp.sum(-0.5 * d * d / var - 0.5 * jnp.log(2 * jnp.pi * var),
                     axis=-1)
        log_w = lw_partial + ll
        w = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(w * w)
        chan_post = jax.vmap(
            lambda c: jnp.sum(jnp.where(chs == c, w, 0.0))
        )(jnp.arange(N_CHANNELS, dtype=jnp.float32))
        e_mean = jnp.sum(w * energies)
        return ess, chan_post, e_mean

    def run_leg(guided: bool, seed: int, st: StageTimer):
        tag = "guided" if guided else "prior"
        stage_a = stage_as[guided]
        with st.stage(f"{tag}:stageA_device"):
            chs, energies, lwp = stage_a(jax.random.key(seed))
            chs_np = np.asarray(chs)          # host fetch closes the stage
            en_np = np.asarray(energies)
        with st.stage(f"{tag}:simulator_host"):
            deposits = sim.batch(
                np.stack([chs_np, en_np], axis=-1).astype(np.float32)
            )
        with st.stage(f"{tag}:stageB_device"):
            dep_acc = jax.device_put(
                jnp.asarray(deposits, jnp.float32), acc)
            ess, chan_post, e_mean = stage_b(
                dep_acc, chs, energies, lwp, observed_acc)
            out = (float(np.asarray(ess)), np.asarray(chan_post),
                   float(np.asarray(e_mean)))
        return out

    stage_as = {True: make_stage_a(True), False: make_stage_a(False)}

    # brute-force reference posterior for the energy gate (the guided
    # estimate should match what a large prior-SIS run says the posterior
    # IS, not the point truth — one observed event has real posterior
    # spread): one big staged prior run
    n_ref = 8 * n

    @jax.jit
    def stage_a_ref(key):
        keys = jax.random.split(key, n_ref)

        def pp(k):
            lw = handlers.LogWeight()
            with contextlib.ExitStack() as stack:
                stack.enter_context(handlers.Seed(k))
                stack.enter_context(lw)
                ch, energy = model_pre(observed_acc)
            return (ch.astype(jnp.float32), energy, lw.log_weight)

        return jax.vmap(pp)(keys)

    chs_r, en_r, lwp_r = stage_a_ref(jax.random.key(77))
    dep_r = sim.batch(np.stack(
        [np.asarray(chs_r), np.asarray(en_r)], axis=-1).astype(np.float32))

    @jax.jit
    def ref_post(deposits, chs, energies, lw_partial, observed):
        var = jnp.maximum(deposits, 1.0)
        d = observed[None, :] - deposits
        ll = jnp.sum(-0.5 * d * d / var - 0.5 * jnp.log(2 * jnp.pi * var),
                     axis=-1)
        w = jax.nn.softmax(lw_partial + ll)
        return jnp.sum(w * energies)

    e_ref = float(np.asarray(ref_post(
        jax.device_put(jnp.asarray(dep_r, jnp.float32), acc),
        chs_r, en_r, lwp_r, observed_acc)))
    print(f"reference posterior energy ({n_ref} prior particles): "
          f"{e_ref:.2f} (truth {true_e})", file=sys.stderr)
    # warm both stages (compile excluded from the timed pipeline)
    st_warm = StageTimer()
    for g in (False, True):
        run_leg(g, 999, st_warm)

    st = StageTimer()
    rows = {True: [], False: []}
    t_total = {True: [], False: []}
    for s in range(args.seeds):
        for g in (False, True):
            t0 = time.perf_counter()
            rows[g].append(run_leg(g, 10 + s, st))
            t_total[g].append(time.perf_counter() - t0)

    def summarize(g):
        ess = [r[0] for r in rows[g]]
        chan = np.mean([r[1] for r in rows[g]], axis=0)
        e_err = [abs(r[2] - true_e) for r in rows[g]]
        tm = float(np.median(t_total[g]))
        return {
            "ess_mean": float(np.mean(ess)),
            "channel_posterior_mean": chan.tolist(),
            "channel_argmax": int(np.argmax(chan)),
            "energy_abs_err_mean": float(np.mean(e_err)),
            "particles_per_s": n / tm,
            "pipeline_s_median": tm,
        }

    guided = summarize(True)
    prior = summarize(False)
    ess_ratio = guided["ess_mean"] / max(prior["ess_mean"], 1e-9)
    stages = st.as_dict()

    # gates: the flagship claims, asserted
    assert guided["channel_argmax"] == true_ch, guided
    assert prior["channel_argmax"] == true_ch, prior
    assert ess_ratio > 1.0, (guided["ess_mean"], prior["ess_mean"])
    e_err_vs_ref = [abs(r[2] - e_ref) for r in rows[True]]
    # gate the POOLED estimate (seeds are independent repeats; per-seed
    # spread at ESS ~tens is real posterior-sampling noise)
    e_pooled = float(np.mean([r[2] for r in rows[True]]))
    assert abs(e_pooled - e_ref) < 1.5, (e_pooled, e_ref)
    assert guided["energy_abs_err_mean"] < 5.0, guided

    out = {
        "artifact": "external-simulator inference with the accelerator in "
                    "the loop (staged pipeline; VERDICT r5 item 3)",
        "device_stage_a": str(acc),
        "device_stage_b": str(acc),
        "device_training": "cpu child process (JAX_PLATFORMS=cpu)",
        "host_callback_support": "absent on this attachment (axon_pjrt: "
                                 "UNIMPLEMENTED host send/recv callbacks) "
                                 "— hence the staged architecture; on "
                                 "callback-capable TPU runtimes the "
                                 "observe_external pure_callback seam "
                                 "runs the same program un-staged",
        "n_particles": n,
        "n_seeds": args.seeds,
        "n_compile_traces": steps * 64,
        "train_s_cpu_child": train_s,
        "true_channel": true_ch,
        "true_energy": true_e,
        "reference_posterior_energy": e_ref,
        "reference_posterior_particles": n_ref,
        "guided": guided,
        "prior": prior,
        "guided_energy_abs_err_vs_reference_mean":
            float(np.mean(e_err_vs_ref)),
        "guided_energy_pooled": e_pooled,
        "guided_energy_pooled_abs_err_vs_reference":
            abs(e_pooled - e_ref),
        "ess_ratio_guided_over_prior": ess_ratio,
        "pipeline_stage_breakdown": stages,
        "versions": env_versions(),
    }
    path = args.out or os.path.join(repo, "EXTERNAL_BRIDGE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"guided: ess {guided['ess_mean']:.0f} vs prior "
          f"{prior['ess_mean']:.0f} (ratio {ess_ratio:.2f}); "
          f"channel {guided['channel_argmax']} == {true_ch}; "
          f"energy err {guided['energy_abs_err_mean']:.2f}; "
          f"{guided['particles_per_s']:.0f} particles/s through the "
          f"device-host-device pipeline", file=sys.stderr)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

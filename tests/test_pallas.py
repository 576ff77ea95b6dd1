"""Pallas fused SMC-step kernel tests.

The TPU hardware PRNG has no CPU implementation (interpret mode yields zero
bits), so the statistical kernel tests only run on a real TPU backend — they
are exercised there by ``bench.py`` and the verify drives.  On the CPU test
mesh we check gating logic and that the XLA fallback model stays the default.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpprob_tpu.models.hmm import HMM_MEANS, HMM_TRANS
from cpprob_tpu.ops.pallas_hmm import (
    make_pallas_hmm_ssm,
    pallas_available,
    pallas_hmm_fused_step,
)

N = 128 * 256
_ON_TPU = jax.default_backend() in ("tpu", "axon")

tpu_only = pytest.mark.skipif(not _ON_TPU, reason="needs TPU hardware PRNG")


@tpu_only
def test_transition_distribution():
    for s0 in range(3):
        states = jnp.full((N,), s0, jnp.int32)
        s1, _ = pallas_hmm_fused_step(
            jnp.int32(7 + s0), states, jnp.zeros((N,)), jnp.float32(0.0)
        )
        frac = np.bincount(np.asarray(s1), minlength=3) / N
        np.testing.assert_allclose(frac, HMM_TRANS[s0], atol=0.02)


@tpu_only
def test_weight_update_exact():
    states = jnp.zeros((N,), jnp.int32)
    logw0 = jnp.full((N,), -1.25)
    s1, w1 = pallas_hmm_fused_step(jnp.int32(3), states, logw0, jnp.float32(0.5))
    d = 0.5 - HMM_MEANS[np.asarray(s1)]
    want = -1.25 + (-0.5 * d * d - 0.9189385332046727)
    np.testing.assert_allclose(np.asarray(w1), want, atol=1e-6)


@tpu_only
def test_seed_determinism():
    states = jnp.zeros((N,), jnp.int32)
    s_a, _ = pallas_hmm_fused_step(jnp.int32(11), states, jnp.zeros((N,)), jnp.float32(0.0))
    s_b, _ = pallas_hmm_fused_step(jnp.int32(11), states, jnp.zeros((N,)), jnp.float32(0.0))
    s_c, _ = pallas_hmm_fused_step(jnp.int32(12), states, jnp.zeros((N,)), jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(s_a), np.asarray(s_b))
    assert np.any(np.asarray(s_a) != np.asarray(s_c))


def test_pallas_available_gating():
    if not _ON_TPU:
        assert not pallas_available(N)
    assert not pallas_available(N + 1)  # non-multiple of lane*block


def test_pallas_model_structure():
    m = make_pallas_hmm_ssm()
    assert m.fused_step_batch is not None
    assert m.init_sample_batch is not None


@tpu_only
def test_lg_fused_step():
    from cpprob_tpu.ops.pallas_hmm import pallas_lg_fused_step

    s, w = pallas_lg_fused_step(
        jnp.int32(5), jnp.zeros((N,)), jnp.zeros((N,)), jnp.float32(0.2)
    )
    sn = np.asarray(s)
    assert abs(sn.mean()) < 0.02 and abs(sn.var() - 1.0) < 0.03
    d = 0.2 - sn
    np.testing.assert_allclose(
        np.asarray(w), -0.5 * d * d - 0.9189385332046727, atol=1e-5
    )


def test_lg_pallas_model_structure():
    from cpprob_tpu.ops.pallas_hmm import make_pallas_lg_ssm

    m = make_pallas_lg_ssm()
    assert m.fused_step_batch is not None


def test_exchange_kernel_interpret_weight_and_synthesis():
    """Interpret mode (CPU): hardware PRNG yields zero bits => u=0 => every
    particle transitions to state 0 deterministically.  This pins down the
    flag/tick synthesis and the weight/partials arithmetic exactly."""
    from cpprob_tpu.ops.pallas_hmm import pallas_hmm_fused_step_exchange

    n = 128 * 256
    logw = jnp.linspace(-1.0, 0.0, n)
    states = jnp.zeros((n,), jnp.int32)
    y = jnp.float32(0.7)

    # flag off: weights carried through and incremented by N(y; -1, 1) logpdf
    s1, w1, ess, cat_w, lme = pallas_hmm_fused_step_exchange(
        jnp.int32(0), states, logw, y, jnp.int32(0),
        jnp.asarray([0, 0], jnp.int32), interpret=True,
    )
    assert np.asarray(s1).max() == 0  # u=0 -> all to state 0 (mean -1)
    d = 0.7 - (-1.0)
    np.testing.assert_allclose(
        np.asarray(w1), np.asarray(logw) + (-0.5 * d * d - 0.9189385332046727),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(cat_w), [1.0, 0.0, 0.0], atol=1e-6)
    # lme = log mean exp of the (shifted) weights
    want_lme = float(
        jax.scipy.special.logsumexp(w1) - jnp.log(float(n))
    )
    np.testing.assert_allclose(float(lme), want_lme, rtol=1e-5)
    want_ess = float(
        jnp.exp(2.0 * jax.scipy.special.logsumexp(w1)
                - jax.scipy.special.logsumexp(2.0 * w1))
    )
    np.testing.assert_allclose(float(ess), want_ess, rtol=1e-4)

    # flag on: incoming population replaced by synthesized sorted fill;
    # weights reset to zero before the emission increment
    s2, w2, *_ = pallas_hmm_fused_step_exchange(
        jnp.int32(0), states, logw, y, jnp.int32(1),
        jnp.asarray([n // 4, n // 2], jnp.int32), interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(w2), -0.5 * d * d - 0.9189385332046727, atol=1e-6
    )


@tpu_only
def test_exchange_kernel_tpu_matches_xla_exchange_path():
    """Full fused-exchange SMC sweep vs the XLA exchange path: log-evidence
    agrees within MC error across seeds (same model, same algorithm)."""
    import dataclasses

    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models.hmm import hmm_ssm

    T, n = 12, 128 * 256
    rng = np.random.RandomState(1)
    obs = jnp.asarray(rng.normal(0.0, 1.2, size=T).astype(np.float32))

    fused_model = make_pallas_hmm_ssm()
    xla_model = dataclasses.replace(
        fused_model, fused_step_batch=None, fused_step_ess_batch=None,
        fused_step_exchange_batch=None,
    )
    run_f = jax.jit(build_smc_run(fused_model, n, ess_threshold=0.6))
    run_x = jax.jit(build_smc_run(xla_model, n, ess_threshold=0.6))
    z_f = [float(run_f(jax.random.key(i), obs).log_evidence) for i in range(6)]
    z_x = [float(run_x(jax.random.key(50 + i), obs).log_evidence)
           for i in range(6)]
    assert abs(np.mean(z_f) - np.mean(z_x)) < 4.0 * (
        np.std(z_f) + np.std(z_x) + 1e-3
    ) / np.sqrt(6)


def test_chunk_kernel_interpret_masking_and_synthesis():
    """Interpret mode (CPU): zero PRNG bits => all transitions to state 0.
    Pins down the multi-step chunk arithmetic: per-step weight accumulation,
    ragged-tail masking (t >= n_valid is identity), and chunk-start exchange
    synthesis."""
    from cpprob_tpu.ops.pallas_hmm import pallas_hmm_fused_chunk

    n = 128 * 256
    logw = jnp.linspace(-1.0, 0.0, n)
    states = jnp.ones((n,), jnp.int32)
    ys = jnp.asarray([0.7, -0.3, 0.1, 0.9], jnp.float32)

    # flag off, all 4 steps valid: u=0 sends every particle to state 0
    # (mean -1) at step 1 and keeps it there
    s1, w1, ess, cat_w, lme = pallas_hmm_fused_chunk(
        jnp.int32(0), states, logw, ys, jnp.int32(4), jnp.int32(0),
        jnp.asarray([0, 0], jnp.int32), n_steps=4, interpret=True,
    )
    assert np.asarray(s1).max() == 0
    inc = sum(
        -0.5 * (float(y) + 1.0) ** 2 - 0.9189385332046727 for y in ys
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(logw) + inc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cat_w), [1.0, 0.0, 0.0], atol=1e-6)

    # ragged tail: only first 2 steps valid
    s2, w2, *_ = pallas_hmm_fused_chunk(
        jnp.int32(0), states, logw, ys, jnp.int32(2), jnp.int32(0),
        jnp.asarray([0, 0], jnp.int32), n_steps=4, interpret=True,
    )
    inc2 = sum(
        -0.5 * (float(y) + 1.0) ** 2 - 0.9189385332046727 for y in ys[:2]
    )
    np.testing.assert_allclose(np.asarray(w2), np.asarray(logw) + inc2, atol=1e-5)

    # flag on: population synthesized from ticks, weights reset before step 1
    s3, w3, *_ = pallas_hmm_fused_chunk(
        jnp.int32(0), states, logw, ys, jnp.int32(1), jnp.int32(1),
        jnp.asarray([n // 4, n // 2], jnp.int32), n_steps=4, interpret=True,
    )
    d = 0.7 + 1.0
    np.testing.assert_allclose(
        np.asarray(w3), -0.5 * d * d - 0.9189385332046727, atol=1e-6
    )


def test_lg_chunk_kernel_interpret():
    """Interpret mode: u1=0.5, u2=0 => the Box-Muller pair is
    (sqrt(-2 ln 0.5) * cos 0, sqrt(-2 ln 0.5) * sin 0) = (1.177..., 0),
    alternating across steps (the kernel consumes both halves of each
    draw); chunk accumulates the walk + per-step emission logpdfs."""
    from cpprob_tpu.ops.pallas_hmm import pallas_lg_fused_chunk

    n = 128 * 256
    x0 = jnp.linspace(-0.5, 0.5, n)
    logw = jnp.zeros((n,))
    ys = jnp.asarray([0.2, -0.1, 0.4], jnp.float32)
    eps_pair = [np.sqrt(-2.0 * np.log(0.5)), 0.0]

    s, w, ess = pallas_lg_fused_chunk(
        jnp.int32(0), x0, logw, ys, jnp.int32(3), n_steps=3, interpret=True,
    )
    x = np.asarray(x0, np.float64)
    want_w = np.zeros(n)
    for t, y in enumerate(np.asarray(ys)):
        x = x + eps_pair[t % 2]
        want_w += -0.5 * (y - x) ** 2 - 0.9189385332046727
    np.testing.assert_allclose(np.asarray(s), x, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), want_w, rtol=1e-4, atol=1e-4)

    # ragged: only 1 valid step
    s1, w1, _ = pallas_lg_fused_chunk(
        jnp.int32(0), x0, logw, ys, jnp.int32(1), n_steps=3, interpret=True,
    )
    x1 = np.asarray(x0) + eps_pair[0]
    np.testing.assert_allclose(np.asarray(s1), x1, rtol=1e-5)


@tpu_only
def test_chunked_smc_matches_per_step_path():
    """Chunked fused SMC (blocked adaptive resampling) vs the per-step fused
    path: log-evidence distributions agree within MC error."""
    from cpprob_tpu.inference.smc import build_smc_run

    T, n = 16, 128 * 256
    rng = np.random.RandomState(2)
    obs = jnp.asarray(rng.normal(0.0, 1.2, size=T).astype(np.float32))

    model = make_pallas_hmm_ssm(block_r=256)
    run_c = jax.jit(build_smc_run(model, n, ess_threshold=0.5, chunk=5))
    run_s = jax.jit(build_smc_run(model, n, ess_threshold=0.5))
    z_c = [float(run_c(jax.random.key(i), obs).log_evidence) for i in range(6)]
    z_s = [float(run_s(jax.random.key(70 + i), obs).log_evidence)
           for i in range(6)]
    assert abs(np.mean(z_c) - np.mean(z_s)) < 4.0 * (
        np.std(z_c) + np.std(z_s) + 1e-3
    ) / np.sqrt(6)


def test_island_interior_resample_interpret():
    """Chunk-interior island resampling (r5): per-VMEM-block ESS checks
    every island_every steps with in-block exchange resampling.

    - threshold 0 (never collapse) must be bitwise-identical to the plain
      chunk kernel;
    - threshold 2 (always collapse) must fire at every interior check
      (t+1 multiple of island_every, strictly before the final step),
      reset the block to full ESS, and keep weights finite with the
      block's mass preserved (uniform weights at the pre-resample
      log-mean, NOT zero)."""
    from cpprob_tpu.ops.pallas_hmm import pallas_hmm_fused_chunk

    n = 128 * 128 * 2
    states = jnp.zeros((n,), jnp.int32)
    log_w = jnp.zeros((n,), jnp.float32)
    ys = jnp.asarray(np.linspace(-1, 1, 16), jnp.float32)
    args = (jnp.int32(7), states, log_w, ys, jnp.int32(16), jnp.int32(0),
            jnp.zeros((2,), jnp.int32))
    kw = dict(n_steps=16, block_r=128, interpret=True)

    base = pallas_hmm_fused_chunk(*args, **kw)
    off = pallas_hmm_fused_chunk(*args, island_every=4, island_thresh=0.0,
                                 **kw)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(off[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(off[1]))

    s, w, ess, cat_w, lme, partials = pallas_hmm_fused_chunk(
        *args, island_every=4, island_thresh=2.0, return_partials=True,
        **kw)
    counts = np.asarray(partials)[::8, 6]
    np.testing.assert_array_equal(counts, [3.0, 3.0])  # t = 3, 7, 11
    w = np.asarray(w)
    assert np.isfinite(w).all()
    # interpret mode is deterministic (u = 0): every particle identical,
    # so the resampled block has full ESS and uniform weights at the
    # block log-mean (non-zero: mass preserved)
    assert float(ess) == n
    assert abs(w.max() - w.min()) < 1e-5
    assert w.max() < 0.0

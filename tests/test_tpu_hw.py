"""Hardware-only statistical tests (`make tpu-test`, VERDICT r3 item 6).

These need the TPU hardware PRNG (no CPU lowering; interpret mode yields
zero bits), so they are skipped on the CPU mesh and run on the real chip via
``CPPROB_TPU_TESTS=1 pytest tests/test_pallas.py tests/test_tpu_hw.py``.
The recorded pass is committed as a round artifact (``TPU_TEST_r04.json``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_ON_TPU = jax.default_backend() in ("tpu", "axon")
pytestmark = pytest.mark.skipif(not _ON_TPU, reason="needs TPU hardware PRNG")

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


def _simulate(trans, means, stds, init, T, seed=0):
    rng = np.random.default_rng(seed)
    K = trans.shape[0]
    z = rng.choice(K, p=init)
    ys = []
    for _ in range(T):
        ys.append(means[z] + stds[z] * rng.standard_normal())
        z = rng.choice(K, p=trans[z])
    return jnp.asarray(np.array(ys), jnp.float32)


@pytest.mark.parametrize("k", [5, 12])
def test_fused_spec_kernel_evidence(k):
    """Generated fused kernels (Horner path at K=5, chained-select fallback
    at K=12) reproduce the exact forward-recursion evidence on the chip."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.ops.pallas_ssm import (
        discrete_hmm_log_evidence,
        make_fused_discrete_ssm,
    )

    if k == 5:
        trans, means, stds, init = TRANS5, MEANS5, STDS5, INIT5
    else:
        rng = np.random.default_rng(12)
        trans = rng.dirichlet(np.ones(k), size=k)
        means = np.linspace(-3.0, 3.0, k)
        stds = np.linspace(0.5, 1.6, k)
        init = np.full(k, 1.0 / k)
    ys = _simulate(trans, means, stds, init, T=12, seed=k)
    ssm = make_fused_discrete_ssm(trans, means, stds, init)
    run = jax.jit(build_smc_run(ssm, 1 << 20, chunk=4, store_history=False))
    lz = float(np.asarray(run(jax.random.key(0), ys).log_evidence))
    exact = discrete_hmm_log_evidence(trans, means, stds, init, np.asarray(ys))
    assert abs(lz - exact) < 0.05, (lz, exact)


def test_scalar_kernel_lg_evidence():
    """attach_fused_scalar_kernels LG sweep matches the Kalman filter."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models.linear_gaussian import (
        kalman_filter_1d,
        linear_gaussian_ssm,
    )
    from cpprob_tpu.ops.pallas_ssm import attach_fused_scalar_kernels

    half_log_2pi = 0.9189385332046727

    def step_elem(x, y, eps):
        nx = x + eps
        d = y - nx
        return nx, -0.5 * d * d - half_log_2pi

    ys = jax.random.normal(jax.random.key(7), (16,)) * 1.5
    lg = attach_fused_scalar_kernels(linear_gaussian_ssm, step_elem)
    run = jax.jit(build_smc_run(lg, 1 << 20, chunk=8, store_history=False))
    lz = float(np.asarray(run(jax.random.key(1), ys).log_evidence))
    _, _, ll = kalman_filter_1d(ys)
    assert abs(lz - float(np.asarray(ll))) < 0.05, (lz, float(np.asarray(ll)))


def test_guided_fused_scalar_kernel_evidence():
    """The fused GUIDED chunk kernel (in-kernel proposal MLP + RN weights)
    stays an exact evidence estimator: trained tiny net, LG sweep vs
    Kalman."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.inference.smc_csis import train_ssm_proposal
    from cpprob_tpu.models.linear_gaussian import (
        kalman_filter_1d,
        linear_gaussian_ssm,
    )
    from cpprob_tpu.ops.pallas_ssm import attach_fused_guided_scalar_kernels

    T = 16
    params, losses = train_ssm_proposal(
        linear_gaussian_ssm, jax.random.key(0), T, kind="normal",
        steps=600, batch_size=256, hidden=16,
    )
    assert float(losses[-20:].mean()) < float(losses[:20].mean())

    half_log_2pi = 0.9189385332046727

    def trans_lp(x, nx, t):
        d = nx - x
        return -0.5 * d * d - half_log_2pi

    def obs_lp(nx, y, t):
        d = y - nx
        return -0.5 * d * d - half_log_2pi

    ssm = attach_fused_guided_scalar_kernels(
        linear_gaussian_ssm, params, T,
        trans_logpdf_elem=trans_lp, obs_logpdf_elem=obs_lp,
    )
    ys = jax.random.normal(jax.random.key(7), (T,)) * 1.5
    run = jax.jit(build_smc_run(ssm, 1 << 20, chunk=4, store_history=False))
    lz = float(np.asarray(run(jax.random.key(1), ys).log_evidence))
    _, _, ll = kalman_filter_1d(ys)
    assert abs(lz - float(np.asarray(ll))) < 0.05, (lz, float(np.asarray(ll)))


def test_guided_discrete_fused_kernel_evidence():
    """The fused guided DISCRETE kernel (in-kernel categorical proposal head
    + exchange resampling + exact RN weights) stays an exact evidence
    estimator on the 5-state chain."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.inference.smc_csis import train_ssm_proposal
    from cpprob_tpu.ops.pallas_ssm import (
        attach_fused_guided_discrete_kernels,
        discrete_hmm_log_evidence,
        make_fused_discrete_ssm,
    )

    K, T = 5, 12
    base = make_fused_discrete_ssm(TRANS5, MEANS5, STDS5, INIT5)
    params, losses = train_ssm_proposal(
        base, jax.random.key(0), T, kind="discrete", n_states=K,
        steps=300, batch_size=256, hidden=16,
    )
    assert float(losses[-20:].mean()) < float(losses[:20].mean())
    g = attach_fused_guided_discrete_kernels(
        TRANS5, MEANS5, STDS5, INIT5, params=params, T=T,
    )
    ys = _simulate(TRANS5, MEANS5, STDS5, INIT5, T=T, seed=3)
    run = jax.jit(build_smc_run(g, 1 << 20, store_history=False))
    lz = float(np.asarray(run(jax.random.key(1), ys).log_evidence))
    exact = discrete_hmm_log_evidence(TRANS5, MEANS5, STDS5, INIT5,
                                      np.asarray(ys))
    assert abs(lz - exact) < 0.05, (lz, exact)


def test_vector_fused_kernel_evidence():
    """The fused VECTOR chunk kernel (D=2 planes, per-dim hardware
    Box-Muller) + sorted-key vector resample: evidence vs the exact 2-D
    Kalman filter."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.ops.pallas_ssm import attach_fused_vector_kernels
    from tests.test_vector_ssm import (
        HALF_LOG_2PI,
        A,
        H,
        kalman_2d_loglik,
        make_lg2d,
    )

    def step_elem(xs, y, eps):
        x0, x1 = xs
        n0 = 0.9 * x0 + 0.1 * x1 + eps[0]
        n1 = 0.8 * x1 + eps[1]
        d = y - (n0 + n1)
        return [n0, n1], -0.5 * d * d - HALF_LOG_2PI

    ssm = attach_fused_vector_kernels(make_lg2d(), step_elem, 2)
    rng = np.random.default_rng(4)
    T = 16
    x = rng.standard_normal(2)
    ys = []
    for t in range(T):
        if t > 0:
            x = A @ x + rng.standard_normal(2)
        ys.append(H @ x + rng.standard_normal())
    ys = jnp.asarray(np.array(ys), jnp.float32)
    run = jax.jit(build_smc_run(ssm, 1 << 20, chunk=4, store_history=False))
    lz = float(np.asarray(run(jax.random.key(2), ys).log_evidence))
    exact = kalman_2d_loglik(ys)
    assert abs(lz - exact) < 0.1, (lz, exact)


def test_guided_csis_serving_on_chip():
    """Compile a proposal on the chip and serve guided inference through the
    cached jitted path: ESS beats prior-proposal SIS and the posterior mean
    matches the analytic conjugate value (README.md:118)."""
    import cpprob_tpu as ct
    from cpprob_tpu.inference.csis import CSIS
    from cpprob_tpu.models import gaussian_unknown_mean_readme

    eng = CSIS(gaussian_unknown_mean_readme, (0.0, 0.0))
    params, losses = eng.compile(
        jax.random.key(0), steps=150, batch_size=64, unroll=10
    )
    assert float(losses[-10:].mean()) < float(losses[:10].mean())
    n = 4096
    res_g = eng.infer(params, (3.0, 4.0), n, jax.random.key(1))
    res_p = ct.sis(
        gaussian_unknown_mean_readme, (3.0, 4.0), n, jax.random.key(2)
    )

    def ess(res):
        w = np.asarray(res.normalized_weights)
        return 1.0 / np.sum(w * w)

    assert ess(res_g) > 1.5 * ess(res_p)
    assert abs(float(res_g.mean("Mean")) - 2.32353) < 0.1


def test_island_interior_resampling_evidence():
    """Whole-sweep fusion with chunk-interior island ESS resampling (r5):
    logZ must match the exact forward recursion within MC error, the
    interior triggers must actually fire, and the estimate must agree
    with the boundary-checked chunk=8 configuration."""
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models.hmm import HMM_MEANS, HMM_TRANS
    from cpprob_tpu.ops.pallas_hmm import (
        _key_to_seed,
        make_pallas_hmm_ssm,
        pallas_hmm_fused_chunk,
    )
    from cpprob_tpu.ops.pallas_ssm import discrete_hmm_log_evidence

    T, n = 16, 1 << 20
    ys = _simulate(HMM_TRANS, HMM_MEANS, np.ones(3), np.full(3, 1 / 3), T,
                   seed=3)
    exact = discrete_hmm_log_evidence(
        HMM_TRANS, HMM_MEANS, np.ones(3), np.full(3, 1 / 3), ys)

    model = make_pallas_hmm_ssm(island_every=4)
    run = build_smc_run(model, n, chunk=T, store_history=False)

    @jax.jit
    def multi(key):
        keys = jax.random.split(key, 8)

        def body(_, k):
            return None, run(k, ys).log_evidence
        _, lz = jax.lax.scan(body, None, keys)
        return lz

    lzs = np.asarray(multi(jax.random.key(0)))
    assert abs(lzs.mean() - exact) < 4 * lzs.std(ddof=1) / np.sqrt(8) + 0.02, (
        lzs.mean(), exact)

    # boundary-checked chunk=8 reference on the same observations
    model8 = make_pallas_hmm_ssm()
    run8 = build_smc_run(model8, n, chunk=8, store_history=False)
    lz8 = np.asarray(jax.jit(
        lambda k: run8(k, ys).log_evidence)(jax.random.key(5)))
    assert abs(lzs.mean() - float(lz8)) < 0.05

    # the interior trigger must actually fire (partials slot 6)
    s0, w0, _, cat_w0, _ = model.fused_init_batch(
        jax.random.key(1), n, ys[0])
    cum = jnp.cumsum(cat_w0)[:2]
    ticks = jnp.clip(jnp.ceil(n * cum - 0.3), 0, n).astype(jnp.int32)
    *_, parts = pallas_hmm_fused_chunk(
        _key_to_seed(jax.random.key(2)), s0, w0, ys[1:], jnp.int32(T - 1),
        jnp.int32(1), ticks, n_steps=T - 1, island_every=4,
        return_partials=True,
    )
    fires = np.asarray(parts)[::8, 6]
    assert fires.min() >= 1.0, fires


def test_guided_scalar_mxu_matches_vpu_statistically():
    """The MXU formulation of the guided scalar kernel (bf16 dot operands)
    must produce the same posterior evidence as the exact-f32 elementwise
    formulation within MC error — the RN weight stays exact because sample
    and density share the computed (mean, std)."""
    from cpprob_tpu.inference import nn
    from cpprob_tpu.inference.smc import build_smc_run
    from cpprob_tpu.models.linear_gaussian import (
        kalman_filter_1d,
        linear_gaussian_ssm,
    )
    from cpprob_tpu.ops.pallas_ssm import attach_fused_guided_scalar_kernels

    from cpprob_tpu.inference.smc_csis import train_ssm_proposal

    H = 0.9189385332046727
    T, n = 16, 1 << 18
    # a TRAINED guide: with an untrained net and boundary-only resampling
    # the logZ estimate is legitimately biased low at this N (log of a
    # heavy-tailed mean), which would fail the oracle gate for reasons
    # unrelated to the kernels
    params, _ = train_ssm_proposal(
        linear_gaussian_ssm, jax.random.key(5), T, kind="normal",
        steps=600, batch_size=256, hidden=16,
    )
    # i.i.d. observations (the kernel_bench regime): a random-walk ys
    # path wanders outside the prior-rollout training distribution and
    # blows the guided estimator's variance to ~2 nats at this N
    ys = jax.random.normal(jax.random.key(7), (T,)) * 1.5
    _, _, kal = kalman_filter_1d(ys)

    def trans_lp(x, nx, t):
        d = nx - x
        return -0.5 * d * d - H

    def obs_lp(nx, y, t):
        d = y - nx
        return -0.5 * d * d - H

    out = {}
    for label, mxu in (("mxu", True), ("vpu", False)):
        ssm = attach_fused_guided_scalar_kernels(
            linear_gaussian_ssm, params, T,
            trans_logpdf_elem=trans_lp, obs_logpdf_elem=obs_lp, mxu=mxu)
        run = build_smc_run(ssm, n, chunk=8, store_history=False)

        @jax.jit
        def multi(key, run=run):
            keys = jax.random.split(key, 8)

            def body(_, k):
                return None, run(k, ys).log_evidence
            _, lz = jax.lax.scan(body, None, keys)
            return lz

        out[label] = np.asarray(multi(jax.random.key(11)))
    se = np.hypot(out["mxu"].std(ddof=1), out["vpu"].std(ddof=1)) / np.sqrt(8)
    assert abs(out["mxu"].mean() - out["vpu"].mean()) < 4 * se + 0.05, out
    # consistent with the exact evidence within MC error
    se_m = out["mxu"].std(ddof=1) / np.sqrt(8)
    assert abs(out["mxu"].mean() - float(np.asarray(kal))) < (
        4 * se_m + 0.05), (out["mxu"].mean(), float(np.asarray(kal)), se_m)

"""Streaming systematic resample (Pallas merge kernel): interpret-mode
validation on CPU.

Hardware exactness (0/65536 slot mismatches vs the pass-1 start-slot
expansion at 2^22 on a v5e chip) is asserted by the bench harness; here the
interpret path is checked statistically — the interpreter has a known
ordering quirk around the DMA window fetch inside the merge loop that
flips ~0.1% of slots (hardware does not), so CPU assertions are
multiset/moment-level with that tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpprob_tpu.ops.pallas_resample import (
    _pass1,
    _streaming_resample,
    logsumexp_stats,
    streaming_available,
)


@pytest.mark.parametrize("impl", ["merge", "fast", "scatter"])
@pytest.mark.parametrize("n_tiles", [1, 3])
def test_exact_vs_own_starts(n_tiles, impl):
    """Pass 2 must expand pass 1's start slots EXACTLY (the f32 boundary
    arithmetic lives entirely in pass 1, so this isolates the merge)."""
    rng = np.random.default_rng(42)
    n = 128 * 128 * n_tiles
    log_w = rng.normal(0, 2, n).astype(np.float32)
    vals = rng.normal(0, 1, n).astype(np.float32)
    u0 = 0.61
    st, _ = _pass1(jnp.float32(u0), jnp.asarray(log_w), jnp.asarray(vals),
                   interpret=True)
    stf = np.asarray(st).ravel()
    en = np.concatenate([stf[1:], [n]])
    exp = np.zeros(n, np.float32)
    for j in range(n):
        exp[stf[j]:en[j]] = vals[j]
    out = np.asarray(
        _streaming_resample(jnp.float32(u0), jnp.asarray(log_w),
                            jnp.asarray(vals), interpret=True, impl=impl)
    )
    if impl in ("fast", "scatter"):
        # fast kernel slot enumeration is row-major within the tile
        remap = out.ravel()
    else:
        # merge kernel: value of slot og*128+s of tile t sits at
        # out[t*128+s, og]
        tile = out.reshape(-1, 128)
        remap = np.zeros(n, np.float32)
        for t in range(n // 16384):
            for og in range(128):
                remap[t * 16384 + og * 128: t * 16384 + og * 128 + 128] = (
                    tile[t * 128:(t + 1) * 128, og]
                )
    np.testing.assert_allclose(remap, exp, atol=1e-4)


def _reference_expand(u0, log_w, vals):
    n = len(log_w)
    w = np.exp(log_w - log_w.max())
    w /= w.sum()
    prev = np.concatenate([[0.0], np.cumsum(w)[:-1]])
    st = np.clip(np.ceil(n * prev - u0), 0, n).astype(int)
    en = np.concatenate([st[1:], [n]])
    out = np.zeros(n, np.float32)
    for j in range(n):
        out[st[j]:en[j]] = vals[j]
    return out


@pytest.mark.parametrize("impl", ["merge", "fast", "scatter"])
@pytest.mark.parametrize("n_tiles", [1, 2])
def test_multiset_and_moments(n_tiles, impl):
    rng = np.random.default_rng(0)
    n = 128 * 128 * n_tiles
    assert streaming_available(n)
    log_w = rng.normal(0, 2, n).astype(np.float32)
    vals = rng.normal(0, 1, n).astype(np.float32)
    u0 = 0.37
    out = np.asarray(
        _streaming_resample(
            jnp.float32(u0), jnp.asarray(log_w), jnp.asarray(vals),
            interpret=True, impl=impl,
        )
    )
    ref = _reference_expand(u0, log_w, vals)
    # multiset agreement vs the float64 reference (moved mass on a fine
    # shared histogram; an elementwise compare of sorted arrays would
    # cascade single slot flips).  The kernel computes slot boundaries in
    # f32 — like the XLA sorted-fill path — so ~1% of boundary slots shift
    # by one particle (statistically a u0 dither).
    edges = np.linspace(ref.min() - 1e-3, ref.max() + 1e-3, 4096)
    h_out, _ = np.histogram(out, edges)
    h_ref, _ = np.histogram(ref, edges)
    moved = np.abs(h_out - h_ref).sum() / (2 * n)
    assert moved < 0.02, moved
    # moment preservation: resampled mean == weighted mean within binomial MC
    w = np.exp(log_w - log_w.max())
    w /= w.sum()
    wmean = float((w * vals).sum())
    se = float(np.sqrt((w * (vals - wmean) ** 2).sum() / n)) + 1e-3
    assert abs(out.mean() - wmean) < 6 * se, (out.mean(), wmean, se)


@pytest.mark.parametrize("impl", ["merge", "fast", "scatter"])
def test_degenerate_one_heavy_particle(impl):
    """One particle carries ~all the weight: every slot must copy it."""
    n = 128 * 128
    log_w = np.full(n, -100.0, np.float32)
    log_w[12345] = 0.0
    vals = np.arange(n, dtype=np.float32)
    out = np.asarray(
        _streaming_resample(
            jnp.float32(0.5), jnp.asarray(log_w), jnp.asarray(vals),
            interpret=True, impl=impl,
        )
    )
    assert (out == 12345.0).mean() > 0.999


@pytest.mark.parametrize("impl", ["merge", "fast", "scatter"])
def test_uniform_weights_identity_multiset(impl):
    """Equal weights: the resampled multiset equals the input multiset."""
    n = 128 * 128
    vals = np.random.default_rng(3).normal(0, 1, n).astype(np.float32)
    out = np.asarray(
        _streaming_resample(
            jnp.float32(0.25), jnp.zeros(n, np.float32), jnp.asarray(vals),
            interpret=True, impl=impl,
        )
    )
    agree = np.isclose(np.sort(out), np.sort(vals), atol=1e-4).mean()
    assert agree > 0.995, agree


def test_logsumexp_stats_matches_xla():
    """One-sweep (m, wtot) must match the XLA max/sum(exp) pair."""
    rng = np.random.default_rng(7)
    lw = jnp.asarray(rng.normal(0, 3, 128 * 128 * 2).astype(np.float32))
    m, wtot = logsumexp_stats(lw, interpret=True)
    m_ref = jnp.max(lw)
    wtot_ref = jnp.sum(jnp.exp(lw - m_ref))
    np.testing.assert_allclose(float(m), float(m_ref), rtol=0)
    np.testing.assert_allclose(float(wtot), float(wtot_ref), rtol=1e-5)


def test_precomputed_stats_match_default():
    """Threading (m, wtot) into the epoch must reproduce the epoch that
    computes them itself (same u0 -> identical slot boundaries)."""
    rng = np.random.default_rng(8)
    n = 128 * 128
    lw = jnp.asarray(rng.normal(0, 1, n).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, n).astype(np.float32))
    base = _streaming_resample(jnp.float32(0.4), lw, v, interpret=True)
    m, wtot = logsumexp_stats(lw, interpret=True)
    thread = _streaming_resample(jnp.float32(0.4), lw, v, interpret=True,
                                 m=m, wtot=wtot)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(thread))

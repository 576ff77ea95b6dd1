"""Pallas fused SMC step for the 3-state HMM — the hot kernel of the headline
benchmark (BASELINE.json: >=10M particles/s/chip).

Why a kernel: the XLA path spends most of each step in counter-based threefry
RNG (key split + categorical bits).  This kernel uses the TPU's **hardware
PRNG** (``pltpu.prng_seed`` / ``prng_random_bits``) and fuses transition
sampling + emission reweighting into one VMEM-resident pass:

    read  state (4B) + log_w (4B)  ->  1 hw-RNG draw, ~15 VPU ops
    write state (4B) + log_w (4B)

i.e. 16 B/particle-step of HBM traffic — the speed-of-light bound for this
update.  Layout: particles as (R, 128) tiles (lane dim 128, f32/int32 tile
rules per the TPU tiling constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pallas_hmm_fused_step",
    "pallas_hmm_fused_step_exchange",
    "pallas_hmm_fused_chunk",
    "pallas_hmm_fused_init",
    "make_pallas_hmm_ssm",
    "pallas_lg_fused_step",
    "pallas_lg_fused_chunk",
    "make_pallas_lg_ssm",
    "pallas_available",
]

_HALF_LOG_2PI = 0.9189385332046727
# HMM constants (models.hpp:114-141): means (-1, 0, 1), transition rows below.
_TRANS_CDF = np.array(
    [
        [0.10, 0.60],   # row 0: cdf after classes 0,1
        [0.20, 0.40],
        [0.15, 0.30],
    ],
    np.float32,
)
_MEANS = np.array([-1.0, 0.0, 1.0], np.float32)

_LANES = 128
_BLOCK_R = 256  # (256, 128) f32 blocks = 128 KiB per buffer in VMEM


def _uniform_from_bits(bits):
    # top 24 bits -> [0, 1) float32, exactly representable.  Mosaic has no
    # uint32->f32 cast: logical-shift as int32 (guaranteed non-negative) first.
    b24 = jax.lax.shift_right_logical(pltpu.bitcast(bits, jnp.int32), 8)
    return b24.astype(jnp.float32) * (1.0 / (1 << 24))


def _select3(idx, v0, v1, v2):
    return jnp.where(idx == 0, v0, jnp.where(idx == 1, v1, v2))


def _step_kernel(seed_ref, y_ref, states_ref, logw_ref, out_s_ref, out_w_ref,
                 part_ref):
    i = pl.program_id(0)
    # decorrelate blocks with a Weyl-sequence offset on the seed
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
    bits = pltpu.bitcast(pltpu.prng_random_bits(states_ref.shape), jnp.uint32)
    u = _uniform_from_bits(bits)

    s = states_ref[:]
    c0 = _select3(s, _TRANS_CDF[0, 0], _TRANS_CDF[1, 0], _TRANS_CDF[2, 0])
    c1 = _select3(s, _TRANS_CDF[0, 1], _TRANS_CDF[1, 1], _TRANS_CDF[2, 1])
    new_s = (u >= c0).astype(jnp.int32) + (u >= c1).astype(jnp.int32)

    y = y_ref[0]
    mean = _select3(new_s, _MEANS[0], _MEANS[1], _MEANS[2])
    d = y - mean
    new_w = logw_ref[:] + (-0.5 * d * d - _HALF_LOG_2PI)
    out_s_ref[:] = new_s
    out_w_ref[:] = new_w
    # streaming-ESS partials for this block: (max, sum exp, sum exp^2) —
    # computed while the weights are still in VMEM, so the engine's ESS check
    # costs no extra HBM pass
    m = jnp.max(new_w)
    e = jnp.exp(new_w - m)
    # Each program owns one (8, 128) partials block (min f32 tile); the three
    # statistics go in lanes 0..2 of row 0, built with an iota select (no
    # scatter in Mosaic).
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    row = jnp.where(
        (rowid == 0) & (lane == 0), m,
        jnp.where((rowid == 0) & (lane == 1), jnp.sum(e),
                  jnp.where((rowid == 0) & (lane == 2), jnp.sum(e * e), 0.0)),
    )
    part_ref[:, :] = row


def _make_step_exchange_kernel(hw_prng: bool):
    """Build the fused exchange-step kernel.  ``hw_prng=False`` substitutes
    zero random bits (the TPU hardware PRNG has no CPU/interpret lowering) —
    used only by interpret-mode tests of the deterministic arithmetic."""

    def _step_exchange_kernel(seed_ref, y_ref, ctrl_ref, states_ref, logw_ref,
                              out_s_ref, out_w_ref, part_ref):
        # Fused HMM step with in-kernel *exchange* resampling (sorted-category
        # systematic — see inference/resampling.py).  ctrl_ref (SMEM int32
        # [flag, t0, t1]): when flag is set, the incoming population is
        # replaced by the resampled one synthesized from the global slot index
        # against the category tick boundaries (t0, t1) — the resample epoch
        # therefore reads neither states nor weights from HBM, and costs zero
        # extra passes.
        #
        # Emits streaming partials (max, sum e, sum e^2, sum e[s=0..2]) per
        # block so the engine's next ESS check *and* next resample's category
        # weights come from in-VMEM statistics.
        i = pl.program_id(0)
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
            bits = pltpu.bitcast(
                pltpu.prng_random_bits(states_ref.shape), jnp.uint32
            )
            u = _uniform_from_bits(bits)
        else:
            u = jnp.zeros(states_ref.shape, jnp.float32)

        block_r = states_ref.shape[0]
        flag = ctrl_ref[0] > 0
        rowid = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 1)
        j = (i * block_r + rowid) * _LANES + lane
        synth = (j >= ctrl_ref[1]).astype(jnp.int32) + (
            j >= ctrl_ref[2]
        ).astype(jnp.int32)
        s = jnp.where(flag, synth, states_ref[:])
        w_in = jnp.where(flag, 0.0, logw_ref[:])

        c0 = _select3(s, _TRANS_CDF[0, 0], _TRANS_CDF[1, 0], _TRANS_CDF[2, 0])
        c1 = _select3(s, _TRANS_CDF[0, 1], _TRANS_CDF[1, 1], _TRANS_CDF[2, 1])
        new_s = (u >= c0).astype(jnp.int32) + (u >= c1).astype(jnp.int32)

        y = y_ref[0]
        mean = _select3(new_s, _MEANS[0], _MEANS[1], _MEANS[2])
        d = y - mean
        new_w = w_in + (-0.5 * d * d - _HALF_LOG_2PI)
        out_s_ref[:] = new_s
        out_w_ref[:] = new_w

        m = jnp.max(new_w)
        e = jnp.exp(new_w - m)
        vals = (
            m,
            jnp.sum(e),
            jnp.sum(e * e),
            jnp.sum(jnp.where(new_s == 0, e, 0.0)),
            jnp.sum(jnp.where(new_s == 1, e, 0.0)),
            jnp.sum(jnp.where(new_s == 2, e, 0.0)),
        )
        plane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        row = jnp.zeros((8, _LANES), jnp.float32)
        for idx, v in enumerate(vals):
            row = jnp.where((prow == 0) & (plane == idx), v, row)
        part_ref[:, :] = row

    return _step_exchange_kernel


def stats_from_partials(partials: jax.Array, n: int):
    """Combine per-block (max, sum e, sum e^2, sum e per category) partials
    into (ess, normalized category weights (3,), log-mean-exp)."""
    p = partials[::8]
    m_b, s1_b, s2_b = p[:, 0], p[:, 1], p[:, 2]
    c_bk = p[:, 3:6]
    m = jnp.max(m_b)
    scale = jnp.exp(m_b - m)
    s1 = jnp.sum(s1_b * scale)
    s2 = jnp.sum(s2_b * jnp.exp(2.0 * (m_b - m)))
    ess = s1 * s1 / jnp.maximum(s2, 1e-38)
    cat_w = jnp.sum(c_bk * scale[:, None], axis=0) / jnp.maximum(s1, 1e-38)
    lme = m + jnp.log(jnp.maximum(s1, 1e-38)) - jnp.log(float(n))
    return ess, cat_w, lme


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def pallas_hmm_fused_step_exchange(
    seed, states, log_w, y, flag, ticks,
    block_r: int = _BLOCK_R, interpret: bool = False,
):
    """Fused transition+reweight step with flagged in-kernel exchange
    resampling.  ``flag``: int32 scalar (1 = resample); ``ticks``: (2,) int32
    cumulative category boundaries (t0, t1) of the sorted resampled
    population.  Returns (new_states, new_log_w, ess, cat_w(3,), lme)."""
    n = states.shape[0]
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    n_blocks = r // block_r
    s2 = states.reshape(r, _LANES)
    w2 = log_w.reshape(r, _LANES)
    ctrl = jnp.concatenate(
        [jnp.asarray(flag, jnp.int32).reshape(1),
         jnp.asarray(ticks, jnp.int32).reshape(2)]
    )
    out_s, out_w, partials = pl.pallas_call(
        _make_step_exchange_kernel(hw_prng=not interpret),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(y, jnp.float32).reshape(1),
        ctrl,
        s2,
        w2,
    )
    ess, cat_w, lme = stats_from_partials(partials, n)
    return out_s.reshape(n), out_w.reshape(n), ess, cat_w, lme


def _make_chunk_kernel_island(n_steps: int, hw_prng: bool,
                              island_every: int, island_thresh: float):
    """Whole-sweep fused HMM kernel WITH chunk-interior adaptive
    resampling (VERDICT r5 item 4): every ``island_every`` steps each
    (block_r, 128) particle tile checks its OWN Kish ESS and, on collapse
    below ``island_thresh``, performs a BLOCK-LOCAL exchange resample
    entirely in VMEM — the island scheme applied at the memory-hierarchy
    level (islands = VMEM-resident tiles), so the whole-sweep fusion
    keeps zero interior HBM traffic while the ESS trigger stays live.

    Instead of resetting weights to 0 and carrying a per-block evidence
    channel, the resample sets every weight in the block to the block's
    pre-resample log-mean weight ``lme_b = m + log(se) - log(n_blk)`` —
    total weight mass is preserved, cross-block weight offsets keep
    encoding relative island evidence, and the driver's existing
    logsumexp-over-everything evidence estimator is exactly unbiased
    with no changes.  Cost: 3 reduction passes per check (amortized
    1/island_every per step); the resample body runs under ``pl.when``
    so its ~4 passes are paid only when a block actually collapses.

    The per-block resample is exact systematic exchange resampling of
    the tile's categorical states (counts from the tile's category
    weights, states rebuilt sorted from tick boundaries), driven by one
    hardware-PRNG uniform."""
    c = _TRANS_CDF
    c0p = (
        float(c[0, 0]),
        float(2 * c[1, 0] - 1.5 * c[0, 0] - 0.5 * c[2, 0]),
        float(0.5 * (c[0, 0] + c[2, 0]) - c[1, 0]),
    )
    c1p = (
        float(c[0, 1]),
        float(2 * c[1, 1] - 1.5 * c[0, 1] - 0.5 * c[2, 1]),
        float(0.5 * (c[0, 1] + c[2, 1]) - c[1, 1]),
    )

    def kernel(seed_ref, ys_ref, ctrl_ref, states_ref, logw_ref,
               out_s_ref, out_w_ref, part_ref, s_ref, w_ref, cnt_ref):
        i = pl.program_id(0)
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
        cnt_ref[0] = 0.0

        block_r = states_ref.shape[0]
        n_blk = float(block_r * _LANES)
        flag = ctrl_ref[0] > 0
        n_valid = ctrl_ref[3]
        rowid = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 1)
        j = (i * block_r + rowid) * _LANES + lane
        j_local = (rowid * _LANES + lane).astype(jnp.float32)
        synth = (j >= ctrl_ref[1]).astype(jnp.float32) + (
            j >= ctrl_ref[2]
        ).astype(jnp.float32)
        s_ref[:] = jnp.where(flag, synth, states_ref[:].astype(jnp.float32))
        w_ref[:] = jnp.where(flag, 0.0, logw_ref[:])

        bits32 = None
        for t in range(n_steps):
            s = s_ref[:]
            w = w_ref[:]
            if hw_prng:
                if t % 2 == 0:
                    bits32 = pltpu.bitcast(
                        pltpu.prng_random_bits(states_ref.shape), jnp.int32
                    )
                    half = jax.lax.bitwise_and(bits32, jnp.int32(0xFFFF))
                else:
                    half = jax.lax.shift_right_logical(bits32, 16)
                u = half.astype(jnp.float32) * (1.0 / 65536.0)
            else:
                u = jnp.zeros(states_ref.shape, jnp.float32)
            c0 = c0p[0] + s * (c0p[1] + s * c0p[2])
            c1 = c1p[0] + s * (c1p[1] + s * c1p[2])
            ns = (u >= c0).astype(jnp.float32) + (u >= c1).astype(jnp.float32)
            y = ys_ref[t]
            d = (y + 1.0) - ns
            nw = w + (-0.5 * d * d - _HALF_LOG_2PI)
            valid = t < n_valid
            s_ref[:] = jnp.where(valid, ns, s)
            w_ref[:] = jnp.where(valid, nw, w)

            if (t + 1) % island_every == 0 and t < n_steps - 1:
                # ESS toll: 3 reduction passes over the tile
                w = w_ref[:]
                m = jnp.max(w)
                e = jnp.exp(w - m)
                se = jnp.sum(e)
                se2 = jnp.sum(e * e)
                collapse = (
                    (se * se < island_thresh * n_blk * se2)
                    & ((t + 1) < n_valid)
                )

                @pl.when(collapse)
                def _():
                    s_cur = s_ref[:]
                    cw0 = jnp.sum(jnp.where(s_cur == 0.0, e, 0.0))
                    cw1 = jnp.sum(jnp.where(s_cur == 1.0, e, 0.0))
                    if hw_prng:
                        ub = pltpu.bitcast(
                            pltpu.prng_random_bits((8, _LANES)), jnp.int32
                        )
                        u16 = jax.lax.bitwise_and(
                            ub, jnp.int32(0xFFFF)
                        ).astype(jnp.float32) * (1.0 / 65536.0)
                        pr = jax.lax.broadcasted_iota(
                            jnp.int32, (8, _LANES), 0)
                        pc = jax.lax.broadcasted_iota(
                            jnp.int32, (8, _LANES), 1)
                        u0 = jnp.max(
                            jnp.where((pr == 0) & (pc == 0), u16, 0.0))
                    else:
                        u0 = jnp.float32(0.5)
                    # exact systematic category ticks from block-local
                    # category weights (same construction as the
                    # chunk-boundary exchange resample)
                    tick0 = jnp.clip(
                        jnp.ceil(n_blk * (cw0 / se) - u0), 0.0, n_blk)
                    tick1 = jnp.clip(
                        jnp.ceil(n_blk * ((cw0 + cw1) / se) - u0),
                        0.0, n_blk)
                    s_ref[:] = (
                        (j_local >= tick0).astype(jnp.float32)
                        + (j_local >= tick1).astype(jnp.float32)
                    )
                    # preserve total weight mass: uniform weights at the
                    # block's log-mean weight keep cross-block offsets
                    # meaningful (island evidence), so the driver's global
                    # logsumexp evidence estimator needs no changes
                    lme_b = m + jnp.log(se) - jnp.log(n_blk)
                    w_ref[:] = jnp.full(
                        (block_r, _LANES), lme_b, jnp.float32)
                    cnt_ref[0] = cnt_ref[0] + 1.0

        s = s_ref[:]
        w = w_ref[:]
        out_s_ref[:] = s.astype(jnp.int32)
        out_w_ref[:] = w

        m = jnp.max(w)
        e = jnp.exp(w - m)
        vals = (
            m,
            jnp.sum(e),
            jnp.sum(e * e),
            jnp.sum(jnp.where(s == 0.0, e, 0.0)),
            jnp.sum(jnp.where(s == 1.0, e, 0.0)),
            jnp.sum(jnp.where(s == 2.0, e, 0.0)),
            cnt_ref[0],           # interior island resamples in this block
        )
        plane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        row = jnp.zeros((8, _LANES), jnp.float32)
        for idx, v in enumerate(vals):
            row = jnp.where((prow == 0) & (plane == idx), v, row)
        part_ref[:, :] = row

    return kernel


def _make_chunk_kernel(n_steps: int, hw_prng: bool):
    """Multi-step fused HMM kernel: ``n_steps`` transition+reweight updates
    executed back-to-back on a VMEM-resident particle tile — ONE HBM
    read+write of (state, log_w) per *chunk* instead of per step, amortizing
    the 16 B/particle-step traffic of the single-step kernel to
    16/n_steps B/particle-step (the VERDICT round-1 headroom item).

    Chunk-start exchange resampling via ctrl (flag, t0, t1) exactly as
    :func:`pallas_hmm_fused_step_exchange`; ctrl[3] = number of *valid* steps
    (< n_steps on the ragged final chunk — invalid steps are masked to
    identity).  Emits the same streaming (max, sum e, sum e^2, per-category
    sums) partials for the next boundary's ESS check + category weights.
    """

    # quadratic fits of the per-state transition-CDF columns and the emission
    # mean over s in {0,1,2}: c(s) = p0 + p1*s + p2*s^2 replaces the 2-way
    # select chains with FMAs, and means (-1,0,1) are simply s' - 1 — the
    # in-VMEM loop is compute-bound, so per-step VPU ops are the budget
    c = _TRANS_CDF
    c0p = (
        float(c[0, 0]),
        float(2 * c[1, 0] - 1.5 * c[0, 0] - 0.5 * c[2, 0]),
        float(0.5 * (c[0, 0] + c[2, 0]) - c[1, 0]),
    )
    c1p = (
        float(c[0, 1]),
        float(2 * c[1, 1] - 1.5 * c[0, 1] - 0.5 * c[2, 1]),
        float(0.5 * (c[0, 1] + c[2, 1]) - c[1, 1]),
    )

    def kernel(seed_ref, ys_ref, ctrl_ref, states_ref, logw_ref,
               out_s_ref, out_w_ref, part_ref):
        i = pl.program_id(0)
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))

        block_r = states_ref.shape[0]
        flag = ctrl_ref[0] > 0
        n_valid = ctrl_ref[3]
        rowid = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, states_ref.shape, 1)
        j = (i * block_r + rowid) * _LANES + lane
        synth = (j >= ctrl_ref[1]).astype(jnp.float32) + (
            j >= ctrl_ref[2]
        ).astype(jnp.float32)
        s = jnp.where(flag, synth, states_ref[:].astype(jnp.float32))
        w = jnp.where(flag, 0.0, logw_ref[:])

        bits32 = None
        for t in range(n_steps):  # static unroll, particles stay in VMEM
            if hw_prng:
                # one 32-bit hardware draw feeds TWO steps (16-bit uniforms:
                # quantization 2^-16, far below MC error; RNG generation is
                # half the per-step cost at these arithmetic intensities)
                if t % 2 == 0:
                    bits32 = pltpu.bitcast(
                        pltpu.prng_random_bits(states_ref.shape), jnp.int32
                    )
                    half = jax.lax.bitwise_and(bits32, jnp.int32(0xFFFF))
                else:
                    half = jax.lax.shift_right_logical(bits32, 16)
                u = half.astype(jnp.float32) * (1.0 / 65536.0)
            else:
                u = jnp.zeros(states_ref.shape, jnp.float32)
            c0 = c0p[0] + s * (c0p[1] + s * c0p[2])
            c1 = c1p[0] + s * (c1p[1] + s * c1p[2])
            ns = (u >= c0).astype(jnp.float32) + (u >= c1).astype(jnp.float32)
            y = ys_ref[t]
            d = (y + 1.0) - ns          # emission mean is ns - 1
            nw = w + (-0.5 * d * d - _HALF_LOG_2PI)
            valid = t < n_valid
            s = jnp.where(valid, ns, s)
            w = jnp.where(valid, nw, w)

        out_s_ref[:] = s.astype(jnp.int32)
        out_w_ref[:] = w

        m = jnp.max(w)
        e = jnp.exp(w - m)
        vals = (
            m,
            jnp.sum(e),
            jnp.sum(e * e),
            jnp.sum(jnp.where(s == 0.0, e, 0.0)),
            jnp.sum(jnp.where(s == 1.0, e, 0.0)),
            jnp.sum(jnp.where(s == 2.0, e, 0.0)),
        )
        plane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        row = jnp.zeros((8, _LANES), jnp.float32)
        for idx, v in enumerate(vals):
            row = jnp.where((prow == 0) & (plane == idx), v, row)
        part_ref[:, :] = row

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_steps", "block_r", "interpret",
                              "island_every", "island_thresh",
                              "return_partials")
)
def pallas_hmm_fused_chunk(
    seed, states, log_w, ys, n_valid, flag, ticks,
    n_steps: int, block_r: int = _BLOCK_R, interpret: bool = False,
    island_every: int = 0, island_thresh: float = 0.5,
    return_partials: bool = False,
):
    """Fused multi-step chunk (``n_steps`` HMM updates in one launch) with
    flagged chunk-start exchange resampling.  ``ys``: (n_steps,) f32
    observations; ``n_valid``: int32 count of valid steps (ragged tail);
    ``flag``/``ticks`` as in :func:`pallas_hmm_fused_step_exchange`.
    Returns (new_states, new_log_w, ess, cat_w(3,), lme).

    ``island_every`` > 0 enables chunk-INTERIOR adaptive resampling: each
    VMEM block checks its own ESS every that many steps and exchange-
    resamples itself in VMEM on collapse below ``island_thresh`` (see
    :func:`_make_chunk_kernel_island`) — ESS-triggered resampling stays
    live even with the whole sweep fused into one launch.
    ``return_partials`` additionally returns the raw per-block partials
    (slot 6 of each block row = interior resamples fired)."""
    n = states.shape[0]
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    n_blocks = r // block_r
    s2 = states.reshape(r, _LANES)
    w2 = log_w.reshape(r, _LANES)
    ctrl = jnp.concatenate(
        [
            jnp.asarray(flag, jnp.int32).reshape(1),
            jnp.asarray(ticks, jnp.int32).reshape(2),
            jnp.asarray(n_valid, jnp.int32).reshape(1),
        ]
    )
    if island_every > 0:
        kernel = _make_chunk_kernel_island(
            n_steps, hw_prng=not interpret, island_every=island_every,
            island_thresh=island_thresh,
        )
        scratch = [
            pltpu.VMEM((block_r, _LANES), jnp.float32),
            pltpu.VMEM((block_r, _LANES), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ]
    else:
        kernel = _make_chunk_kernel(n_steps, hw_prng=not interpret)
        scratch = []
    out_s, out_w, partials = pl.pallas_call(
        kernel,
        scratch_shapes=scratch,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(ys, jnp.float32).reshape(n_steps),
        ctrl,
        s2,
        w2,
    )
    ess, cat_w, lme = stats_from_partials(partials, n)
    if return_partials:
        return (out_s.reshape(n), out_w.reshape(n), ess, cat_w, lme,
                partials)
    return out_s.reshape(n), out_w.reshape(n), ess, cat_w, lme


def ess_from_partials(partials: jax.Array) -> jax.Array:
    """Combine per-block (max, sum e, sum e^2) into the global Kish ESS.
    ``partials``: (n_blocks*8, 128); block i's stats sit at row 8i, lanes 0-2."""
    partials = partials[::8]
    m_b, s1_b, s2_b = partials[:, 0], partials[:, 1], partials[:, 2]
    m = jnp.max(m_b)
    s1 = jnp.sum(s1_b * jnp.exp(m_b - m))
    s2 = jnp.sum(s2_b * jnp.exp(2.0 * (m_b - m)))
    return s1 * s1 / jnp.maximum(s2, 1e-38)


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def pallas_hmm_fused_step(
    seed, states, log_w, y, block_r: int = _BLOCK_R, interpret: bool = False
):
    """One fused transition+reweight step.  ``states``: (N,) int32 in {0,1,2};
    ``log_w``: (N,) f32; ``seed``: int32 scalar; ``y``: f32 scalar.
    Returns (new_states, new_log_w).  N must be a multiple of 128*block_r.
    ``interpret=True`` runs the Pallas interpreter (CPU debugging/tests)."""
    s, w, _ = pallas_hmm_fused_step_ess(
        seed, states, log_w, y, block_r=block_r, interpret=interpret
    )
    return s, w


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def pallas_hmm_fused_step_ess(
    seed, states, log_w, y, block_r: int = _BLOCK_R, interpret: bool = False
):
    """Fused step that also returns the Kish ESS of the new weights (computed
    from per-block streaming partials emitted by the kernel — saves the two
    full-population reduction passes the engine would otherwise spend on the
    resampling trigger)."""
    n = states.shape[0]
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    n_blocks = r // block_r
    grid = (n_blocks,)
    s2 = states.reshape(r, _LANES)
    w2 = log_w.reshape(r, _LANES)
    out_s, out_w, partials = pl.pallas_call(
        _step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # per-program (8, 128) partials block
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(y, jnp.float32).reshape(1),
        s2,
        w2,
    )
    return out_s.reshape(n), out_w.reshape(n), ess_from_partials(partials)


def _lg_step_kernel(seed_ref, y_ref, states_ref, logw_ref, out_s_ref, out_w_ref):
    """Fused linear-Gaussian step: x' = x + N(0,1) via Box-Muller on hardware
    bits; log_w += N(y; x', 1) logpdf (models.hpp:67-80 transition/emission)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
    b1 = pltpu.bitcast(pltpu.prng_random_bits(states_ref.shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(states_ref.shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    # Box-Muller; clamp u1 away from 0
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
    eps = r * jnp.cos(2.0 * jnp.pi * u2)

    x = states_ref[:] + eps
    y = y_ref[0]
    d = y - x
    out_s_ref[:] = x
    out_w_ref[:] = logw_ref[:] + (-0.5 * d * d - _HALF_LOG_2PI)


@functools.partial(jax.jit, static_argnames=("block_r", "interpret"))
def pallas_lg_fused_step(
    seed, states, log_w, y, block_r: int = _BLOCK_R, interpret: bool = False
):
    """Fused step for the linear-Gaussian SSM; same layout rules as
    :func:`pallas_hmm_fused_step` but float states."""
    n = states.shape[0]
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    grid = (r // block_r,)
    s2 = states.reshape(r, _LANES)
    w2 = log_w.reshape(r, _LANES)
    blk = lambda: pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out_s, out_w = pl.pallas_call(
        _lg_step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
        ],
        out_specs=[blk(), blk()],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(y, jnp.float32).reshape(1),
        s2,
        w2,
    )
    return out_s.reshape(n), out_w.reshape(n)


def _make_init_kernel(hw_prng: bool):
    """Fused SMC initialization: uniform{0,1,2} states from the hardware
    PRNG + the t=0 emission reweight + streaming partials — replaces the
    XLA-side ``jax.random.categorical`` init whose counter-based RNG and
    full-population reductions dominate a fully fused sweep."""

    def kernel(seed_ref, y_ref, out_s_ref, out_w_ref, part_ref):
        i = pl.program_id(0)
        shape = out_w_ref.shape
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
            bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
            half = jax.lax.bitwise_and(bits, jnp.int32(0xFFFF))
            u = half.astype(jnp.float32) * (1.0 / 65536.0)
        else:
            u = jnp.zeros(shape, jnp.float32)
        s = jnp.minimum(jnp.floor(u * 3.0), 2.0)
        y = y_ref[0]
        d = (y + 1.0) - s
        w = -0.5 * d * d - _HALF_LOG_2PI
        out_s_ref[:] = s.astype(jnp.int32)
        out_w_ref[:] = w

        m = jnp.max(w)
        e = jnp.exp(w - m)
        vals = (
            m,
            jnp.sum(e),
            jnp.sum(e * e),
            jnp.sum(jnp.where(s == 0.0, e, 0.0)),
            jnp.sum(jnp.where(s == 1.0, e, 0.0)),
            jnp.sum(jnp.where(s == 2.0, e, 0.0)),
        )
        plane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        row = jnp.zeros((8, _LANES), jnp.float32)
        for idx, v in enumerate(vals):
            row = jnp.where((prow == 0) & (plane == idx), v, row)
        part_ref[:, :] = row

    return kernel


@functools.partial(jax.jit, static_argnames=("n", "block_r", "interpret"))
def pallas_hmm_fused_init(
    seed, y0, n: int, block_r: int = _BLOCK_R, interpret: bool = False
):
    """Fused init: uniform states + t=0 reweight.  Returns
    (states, log_w, ess, cat_w(3,), lme)."""
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    n_blocks = r // block_r
    out_s, out_w, partials = pl.pallas_call(
        _make_init_kernel(hw_prng=not interpret),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(y0, jnp.float32).reshape(1),
    )
    ess, cat_w, lme = stats_from_partials(partials, n)
    return out_s.reshape(n), out_w.reshape(n), ess, cat_w, lme


def _make_lg_chunk_kernel(n_steps: int, hw_prng: bool):
    """Multi-step fused linear-Gaussian kernel: ``n_steps`` random-walk
    propagate + reweight updates on a VMEM-resident float tile (one HBM
    read+write per chunk).  Resampling for continuous states happens on the
    XLA side between chunks (sorted-fill), so there is no in-kernel exchange;
    the kernel emits (max, sum e, sum e^2) partials for the boundary ESS."""

    def kernel(seed_ref, ys_ref, ctrl_ref, states_ref, logw_ref,
               out_s_ref, out_w_ref, part_ref):
        i = pl.program_id(0)
        if hw_prng:
            pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531527))
        n_valid = ctrl_ref[0]
        x = states_ref[:]
        w = logw_ref[:]
        eps_next = None
        for t in range(n_steps):
            # Box-Muller emits a cos/sin PAIR per (u1, u2): one draw + one
            # (log, sqrt, cos, sin) set feeds TWO steps — the transcendentals
            # dominate this kernel, so pairing nearly halves it
            if t % 2 == 0:
                if hw_prng:
                    b1 = pltpu.bitcast(
                        pltpu.prng_random_bits(states_ref.shape), jnp.uint32
                    )
                    b2 = pltpu.bitcast(
                        pltpu.prng_random_bits(states_ref.shape), jnp.uint32
                    )
                    u1 = _uniform_from_bits(b1)
                    u2 = _uniform_from_bits(b2)
                else:
                    u1 = jnp.full(states_ref.shape, 0.5, jnp.float32)
                    u2 = jnp.zeros(states_ref.shape, jnp.float32)
                r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-12)))
                ang = 2.0 * jnp.pi * u2
                eps = r * jnp.cos(ang)
                eps_next = r * jnp.sin(ang)
            else:
                eps = eps_next
            nx = x + eps
            y = ys_ref[t]
            d = y - nx
            nw = w + (-0.5 * d * d - _HALF_LOG_2PI)
            valid = t < n_valid
            x = jnp.where(valid, nx, x)
            w = jnp.where(valid, nw, w)
        out_s_ref[:] = x
        out_w_ref[:] = w
        m = jnp.max(w)
        e = jnp.exp(w - m)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
        row = jnp.where(
            (rowid == 0) & (lane == 0), m,
            jnp.where((rowid == 0) & (lane == 1), jnp.sum(e),
                      jnp.where((rowid == 0) & (lane == 2),
                                jnp.sum(e * e), 0.0)),
        )
        part_ref[:, :] = row

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_steps", "block_r", "interpret")
)
def pallas_lg_fused_chunk(
    seed, states, log_w, ys, n_valid,
    n_steps: int, block_r: int = _BLOCK_R, interpret: bool = False,
):
    """Fused multi-step chunk for the linear-Gaussian SSM.  ``ys``:
    (n_steps,) f32; ``n_valid``: int32 valid-step count.  Returns
    (new_states, new_log_w, ess)."""
    n = states.shape[0]
    r = n // _LANES
    assert r * _LANES == n and r % block_r == 0, (n, block_r)
    n_blocks = r // block_r
    s2 = states.reshape(r, _LANES)
    w2 = log_w.reshape(r, _LANES)
    blk = lambda: pl.BlockSpec((block_r, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out_s, out_w, partials = pl.pallas_call(
        _make_lg_chunk_kernel(n_steps, hw_prng=not interpret),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(),
            blk(),
        ],
        out_specs=[
            blk(),
            blk(),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(ys, jnp.float32).reshape(n_steps),
        jnp.asarray(n_valid, jnp.int32).reshape(1),
        s2,
        w2,
    )
    return out_s.reshape(n), out_w.reshape(n), ess_from_partials(partials)


def make_pallas_lg_ssm(block_r: int = _BLOCK_R):
    """Linear-Gaussian SSM with the fused Pallas step installed."""
    from ..models.linear_gaussian import linear_gaussian_ssm

    def fused(key, states, log_w, y, t):
        return pallas_lg_fused_step(
            _key_to_seed(key), states, log_w, y, block_r=block_r
        )

    def fused_chunk(key, states, log_w, ys, n_valid):
        return pallas_lg_fused_chunk(
            _key_to_seed(key), states, log_w, ys, n_valid,
            n_steps=ys.shape[0], block_r=block_r,
        )

    import dataclasses

    return dataclasses.replace(
        linear_gaussian_ssm,
        fused_step_batch=fused,
        fused_chunk_batch=fused_chunk,
    )


def _key_to_seed(key):
    data = jax.random.key_data(key).ravel()
    return (data[0] ^ data[-1]).astype(jnp.int32)


def pallas_available(n_particles: int, block_r: int = _BLOCK_R) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return n_particles % (_LANES * block_r) == 0


def make_pallas_hmm_ssm(block_r: int = _BLOCK_R, island_every: int = 0,
                        island_thresh: float = 0.5):
    """HMM StateSpaceModel whose propagate+reweight runs in the fused Pallas
    kernel; init/emission-at-t0/resampling stay on the XLA path (they run once
    or operate on weights only).

    ``island_every`` > 0: chunk kernels check per-VMEM-block ESS every that
    many interior steps and exchange-resample the block in VMEM on collapse
    (island scheme at the memory-hierarchy level) — lets whole-sweep fusion
    (``chunk=T``) keep ESS-triggered resampling live."""
    from ..models.hmm import hmm_ssm

    def fused(key, states, log_w, y, t):
        return pallas_hmm_fused_step(
            _key_to_seed(key), states, log_w, y, block_r=block_r
        )

    def fused_ess(key, states, log_w, y, t):
        return pallas_hmm_fused_step_ess(
            _key_to_seed(key), states, log_w, y, block_r=block_r
        )

    def fused_exchange(key, states, log_w, y, t, flag, ticks):
        return pallas_hmm_fused_step_exchange(
            _key_to_seed(key), states, log_w, y, flag, ticks, block_r=block_r
        )

    def fused_chunk(key, states, log_w, ys, n_valid, flag, ticks):
        return pallas_hmm_fused_chunk(
            _key_to_seed(key), states, log_w, ys, n_valid, flag, ticks,
            n_steps=ys.shape[0], block_r=block_r,
            island_every=island_every, island_thresh=island_thresh,
        )

    def fused_init(key, n, y0):
        return pallas_hmm_fused_init(
            _key_to_seed(key), y0, n=n, block_r=block_r
        )

    import dataclasses

    return dataclasses.replace(
        hmm_ssm,
        fused_step_batch=fused,
        fused_step_ess_batch=fused_ess,
        fused_step_exchange_batch=fused_exchange,
        fused_chunk_exchange_batch=fused_chunk,
        fused_init_batch=fused_init,
    )

"""Streaming systematic resampling for scalar continuous states — the
Pallas expand/merge kernel pair that replaces the XLA sort/scatter epoch.

Why: on TPU the XLA building blocks of a resampling epoch are catastrophic
at population scale (measured at 2^24 on one v5e chip: ``lax.sort`` 81 ms,
``.at[].max`` scatter 204 ms, gather 170 ms, ``cummax`` 28 ms — hundreds of
times below streaming bandwidth), so the sorted-fill path of
:func:`cpprob_tpu.inference.resampling.sorted_systematic_resample_values`
costs ~250 ms per epoch and dominates any fused sweep.  Discrete states
escape via category counts (``exchange_resample_discrete``); continuous
states need the general thing: this module.

Algorithm (exact systematic resampling, no sort, no scatter, no gather):

1. Systematic ancestors are **monotone** in the slot index, so output slot
   ``i`` holds the value of the last input ``j`` whose start slot
   ``st_j = ceil(n*cdf_{j-1} - u0)`` is ``<= i``.  Writing
   ``dv_j = v_j - v_{j-1}``, the output is the *merge-structured cumulative*
   ``out(i) = sum_{st_j <= i} dv_j`` — which telescopes exactly to the
   ancestor's value (no error accumulation across inputs: the carry is
   re-seated to a raw input value each time a group is consumed).
2. **Pass 1** (one streaming sweep, sequential grid, Kahan SMEM carry):
   normalized-cdf prefix + start slots + value differences, written as
   dense ``(st, dv)`` arrays.  In-tile prefix is a Hillis–Steele ladder
   (7 lane shifts + row-sum prefix), so float error stays O(log n · eps).
3. **Pass 2** (merge-fill): sequential grid over output tiles; an SMEM
   cursor walks input row-groups of 128 exactly once globally (two-pointer
   merge — total work O(n/128) cross-ops).  Each (input group x output
   group) pair costs one (128,128) compare + multiply and one MXU
   reduction by an all-ones vector; output columns assemble by lane
   select.  Input windows are DMA'd on demand from HBM.

The output enumeration is a fixed permutation of slot indices — valid
because a particle population is a multiset; any fixed enumeration of the
systematic slots is the same resampling scheme (row-major within tiles for
the default ``fast`` pass 2; column-major for the legacy ``merge``).  Like
the sorted-fill path, slot boundaries are computed in f32, so populations
beyond 2^24 incur +-few-slot boundary rounding (far below MC error).
Unlike sorted-fill, inputs keep their arrival order (plain systematic
resampling; the sorted path's extra stratification is traded for the
epoch speedup).

Pass 2 has three implementations:

- ``scatter`` (default, r5): scatter+prefix — each while-iteration
  scatters a BATCH of _SCATTER_G input groups into a per-tile (128,128)
  array with one position-exact MXU contraction, and the tile pays a
  single 2-D Hillis-Steele prefix at the end (the prefix telescopes, so
  partial sums stay bounded by the state range — tighter than ``fast``
  AND 2.2x faster: 21.9 ms vs 48 ms at 2^24 measured on v5e, epoch
  total).  DMA windows are double-buffered (parity-flip on refetch), so
  the r4 single-window anti-dependency hazard cannot occur.
- ``fast`` (r4): tile-at-once fill — each while-iteration applies one
  full input row-group to the whole 16384-slot output tile (exact f32 VPU
  row-reduction for the full-rows part + a 3-way-bf16-split 128x128x128
  MXU contraction for the partial row), with Neumaier-compensated tile
  accumulation.  Measured at 2^24 on v5e: 67.8 ms vs the merge's 103.5 ms,
  AND tighter: 1 vs 76,635 slots off by >1e-4 against the exact ownership
  expansion of pass 1's start slots (the merge's per-(group x out-group)
  two-pointer walk pays 128x more loop iterations and its 2-way bf16
  split truncates the dv residual).
- ``merge``: the r3 two-pointer row-group walk, kept for comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_hmm import _LANES

__all__ = ["streaming_systematic_resample_values", "streaming_available",
           "logsumexp_stats"]

_W = 128           # input window rows per DMA (128 x 128 particles)
_OUT_GROUPS = 128  # output tile: 128 groups x 128 slots
_SCATTER_G = 16      # input groups scattered per while-iteration (r5 pass 2)
_SCATTER_SPLITS = 3  # bf16 split depth of the dv operand in the scatter dot


def _lane_shift_right(x, k):
    """Shift along lanes by +k (prepend zeros)."""
    return jnp.concatenate([jnp.zeros_like(x[:, :k]), x[:, :-k]], axis=1)


def _row_shift_down(x, k):
    """Shift along sublanes by +k (prepend zero rows)."""
    return jnp.concatenate([jnp.zeros_like(x[:k, :]), x[:-k, :]], axis=0)


def _prefix_rows_lanes(w):
    """Inclusive prefix sum of a (R, 128) tile in row-major flat order:
    Hillis-Steele along lanes, then a row-offset ladder along sublanes
    (error O(log n * eps), unlike a sequential left-fold)."""
    p = w
    for k in (1, 2, 4, 8, 16, 32, 64):
        p = p + _lane_shift_right(p, k)
    # per-row totals, broadcast across lanes (Mosaic cannot concat (R, 1)
    # columns, so the row ladder runs on full-width tiles)
    inc = jax.lax.broadcast_in_dim(p[:, -1:], p.shape, (0, 1))
    k = 1
    while k < p.shape[0]:
        inc = inc + _row_shift_down(inc, k)
        k *= 2
    return p + _row_shift_down(inc, 1)   # + exclusive row offsets


def _pass1_kernel(scal_ref, lw_ref, vals_ref, st_ref, dv_ref, carry_ref):
    """scal: [m, wtot_inv, u0, n_out]; carries (SMEM, persist across the
    sequential grid): [cdf_kahan_hi, cdf_kahan_lo, prev_val]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0
        carry_ref[1] = 0.0
        carry_ref[2] = 0.0

    m = scal_ref[0]
    wtot_inv = scal_ref[1]
    u0 = scal_ref[2]
    n_out = scal_ref[3]

    w = jnp.exp(lw_ref[:] - m) * wtot_inv
    pre = _prefix_rows_lanes(w)          # inclusive, tile-local
    c_hi, c_lo = carry_ref[0], carry_ref[1]
    c = c_hi + c_lo
    excl = c + (pre - w)                 # exclusive global prefix
    st = jnp.ceil(n_out * excl - u0)
    st = jnp.clip(st, 0.0, n_out).astype(jnp.int32)
    st_ref[:] = st

    v = vals_ref[:]
    row_last = jax.lax.broadcast_in_dim(v[:, -1:], v.shape, (0, 1))
    pv = _lane_shift_right(v, 1) + jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) == 0,
        _row_shift_down(row_last, 1),
        0.0,
    )
    rowid = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    pv = jnp.where((rowid == 0) & (lane == 0), carry_ref[2], pv)
    dv_ref[:] = v - pv

    # Kahan (two-sum) update of the running cdf with this tile's total
    # (w >= 0, so the inclusive prefix's max is the tile total)
    tile_tot = jnp.max(pre)
    s = c_hi + tile_tot
    err = tile_tot - (s - c_hi)
    carry_ref[0] = s
    carry_ref[1] = c_lo + err
    # last particle value of this tile (for the next tile's first diff)
    carry_ref[2] = jnp.max(
        jnp.where((rowid == v.shape[0] - 1) & (lane == _LANES - 1), v,
                  -jnp.inf)
    )


def _pass2_body(scal_ref, out_ref, carry_ref, fcarry_ref, read_rows,
                maybe_fetch):
    """Merge-fill: two-pointer walk of input groups vs this tile's 128
    output groups.  scal: [n_in_groups]; SMEM carries persist across the
    sequential grid: [ig, window_base] + [Fcarry].  ``read_rows(ig_safe,
    need)`` yields the (st, dv, val) (1, 128) rows of input group
    ``ig_safe``; ``maybe_fetch(need, wb)`` makes that group resident."""
    t = pl.program_id(0)
    n_groups = scal_ref[0]          # total input row-groups (i32)
    tile_base = t * (_OUT_GROUPS * _LANES)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = 0     # ig
        carry_ref[1] = -1    # window_base: none loaded
        fcarry_ref[0] = 0.0  # telescoped value carry

    ones_col = jnp.ones((_LANES, 1), jnp.float32)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)

    fc0 = fcarry_ref[0]

    def body(state):
        og, ig, wb, fc, acc_col = state
        # ensure group ig is resident (each window holds _W groups); never
        # fetch past the end when all inputs are consumed
        in_range = ig < n_groups
        need = jnp.where(in_range, ig // _W, wb)
        maybe_fetch(need, wb)
        safe_loc = jnp.where(in_range, ig - need * _W, 0)
        st_row, dv_row, val_row = read_rows(safe_loc, need)

        slot_lo = tile_base + og * _LANES
        slot_col = slot_lo + sub_iota                 # (128, 1)
        # (128 slots, 128 inputs): input j contributes dv_j to slots >= st_j
        cmp = jax.lax.broadcast_in_dim(
            st_row, (_LANES, _LANES), (0, 1)
        ) <= jax.lax.broadcast_in_dim(slot_col, (_LANES, _LANES), (0, 1))
        contrib_mat = jnp.where(
            cmp & in_range,
            jax.lax.broadcast_in_dim(dv_row, (_LANES, _LANES), (0, 1)),
            0.0,
        )
        # lane reduction on the MXU by an all-ones vector.  One default
        # (bf16) pass truncates dv and skews the telescoped sums by ~0.4%,
        # HIGHEST costs 6 passes (Mosaic lacks HIGH/bf16x3), so split the
        # operand into an exact bf16 hi part + a bf16 residual: two default
        # passes, error ~1.6e-5 relative — below f32 prefix rounding.
        mat_hi = contrib_mat.astype(jnp.bfloat16).astype(jnp.float32)
        mat_lo = contrib_mat - mat_hi
        dims = (((1,), (0,)), ((), ()))
        contrib = jax.lax.dot_general(
            mat_hi, ones_col, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            mat_lo, ones_col, dims, preferred_element_type=jnp.float32
        )                                             # (128, 1)

        group_max = jnp.max(st_row)
        consume = in_range & (group_max <= slot_lo + (_LANES - 1))

        last_val = jnp.max(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                == _LANES - 1,
                val_row, -jnp.inf,
            )
        )
        new_fc = jnp.where(consume, last_val, fc)
        # close og when the current group straddles past this output group:
        # its slots take the accumulated column + the straddler's partial.
        # The output tile is VMEM-resident for the whole grid step, so the
        # closed column goes straight into out_ref — keeping the (128,128)
        # accumulator out of the loop carry and the select off the consume
        # iterations.
        out_col = acc_col + contrib

        @pl.when(jnp.logical_not(consume))
        def _():
            out_ref[:] = jnp.where(
                lane_iota == og,
                jax.lax.broadcast_in_dim(out_col, (_LANES, _LANES), (0, 1)),
                out_ref[:],
            )

        new_acc_col = jnp.where(
            consume, out_col, jnp.full((_LANES, 1), new_fc)
        )
        new_ig = jnp.where(consume, ig + 1, ig)
        new_og = jnp.where(consume, og, og + 1)
        return new_og, new_ig, need, new_fc, new_acc_col

    def cond(state):
        og = state[0]
        return og < _OUT_GROUPS

    init = (
        jnp.int32(0),
        carry_ref[0],
        carry_ref[1],
        fc0,
        jnp.full((_LANES, 1), fc0),
    )
    og, ig, wb, fc, acc_col = jax.lax.while_loop(cond, body, init)
    carry_ref[0] = ig
    carry_ref[1] = wb
    fcarry_ref[0] = fc


def _pass2_kernel_dma(scal_ref, st_hbm, dv_hbm, vals_hbm, out_ref,
                      st_win, dv_win, val_win, sems, carry_ref, fcarry_ref):
    """Production pass 2: inputs stay in HBM, windows DMA'd on demand."""

    def maybe_fetch(need, wb):
        @pl.when(need != wb)
        def _():
            cps = [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(need * _W, _W), :], win, sems.at[slot]
                )
                for slot, (hbm, win) in enumerate(
                    ((st_hbm, st_win), (dv_hbm, dv_win), (vals_hbm, val_win))
                )
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

    def read_rows(loc, need):
        return (
            st_win[pl.ds(loc, 1), :],
            dv_win[pl.ds(loc, 1), :],
            val_win[pl.ds(loc, 1), :],
        )

    _pass2_body(scal_ref, out_ref, carry_ref, fcarry_ref, read_rows,
                maybe_fetch)


def _pass2_kernel_vmem(scal_ref, st_ref, dv_ref, vals_ref, out_ref,
                       carry_ref, fcarry_ref):
    """Whole-array-in-VMEM pass 2 (no DMA): used in interpret mode, where
    the interpreter's emulation of conditionally-issued DMAs inside a while
    loop drops ~0.1% of window updates (hardware executes them exactly; see
    tests/test_pallas_resample.py)."""

    def maybe_fetch(need, wb):
        pass

    def read_rows(loc, need):
        glob = need * _W + loc
        return (
            st_ref[pl.ds(glob, 1), :],
            dv_ref[pl.ds(glob, 1), :],
            vals_ref[pl.ds(glob, 1), :],
        )

    _pass2_body(scal_ref, out_ref, carry_ref, fcarry_ref, read_rows,
                maybe_fetch)


def _pass2_fast_body(scal_ref, out_ref, comp_ref, carry_ref, fcarry_ref,
                     read_group, maybe_fetch):
    """Tile-at-once merge-fill (ROADMAP r3 item 2: the ~6 cycles/slot of the
    row-group merge is while-loop iteration overhead, not compute).

    Per while-iteration, ONE input row-group (128 inputs) updates the WHOLE
    (128, 128)-slot output tile:

    - full rows: input j adds dv_j to every slot of rows r with
      ``rel_j <= r*128 - 1`` — a (rows x inputs) mask contracted with dv by
      an MXU matrix-vector pass;
    - partial row: input j adds dv_j to lanes ``c >= rel_j mod 128`` of row
      ``rel_j // 128`` — a (rows x inputs) row-match matrix times a
      (inputs x lanes) lane-mask matrix: one FULL 128x128x128 MXU
      contraction.

    The loop advances one full input group per iteration (vs one group OR
    one 128-slot output group before), so scalar loop overhead amortizes
    over 16384 slots instead of 128.  Slot enumeration is row-major within
    the tile (slot = tile_base + r*128 + c) — a fixed permutation, valid for
    a particle multiset like the merge kernel's column-major one.  The
    telescoped carry re-seats to a raw input value at every consumed group,
    as in :func:`_pass2_body`."""
    t = pl.program_id(0)
    n_groups = scal_ref[0]
    tile_slots = _OUT_GROUPS * _LANES
    tile_base = t * tile_slots
    tile_end = tile_base + tile_slots - 1

    @pl.when(t == 0)
    def _():
        carry_ref[0] = 0     # ig
        carry_ref[1] = -1    # window_base: none loaded
        fcarry_ref[0] = 0.0  # telescoped value carry

    ones_col = jnp.ones((_LANES, 1), jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    eye = (row_iota == lane_iota).astype(jnp.float32)
    row_thresh = row_iota * _LANES - 1              # r*128 - 1, (128,128)
    dims_mv = (((1,), (0,)), ((), ()))

    # base: every slot starts from the carried telescoped value; comp is
    # the Kahan compensation of the per-group increments (their partial
    # sums random-walk to ~10x the final telescoped value, so naive f32
    # accumulation over a tile's groups loses ~2e-4 — measured)
    out_ref[:] = jnp.full((_OUT_GROUPS, _LANES), fcarry_ref[0])
    comp_ref[:] = jnp.zeros((_OUT_GROUPS, _LANES), jnp.float32)

    def body(state):
        ig, wb, fc, _stop = state
        in_range = ig < n_groups
        need = jnp.where(in_range, ig // _W, wb)
        maybe_fetch(need, wb)
        loc = jnp.where(in_range, ig - need * _W, 0)
        st_row, dv_row, val_row = read_group(loc, need)   # (1, 128) each

        rel = st_row - tile_base                           # (1, 128) i32
        rel_b = jax.lax.broadcast_in_dim(rel, (_LANES, _LANES), (0, 1))
        dv_b = jax.lax.broadcast_in_dim(dv_row, (_LANES, _LANES), (0, 1))
        gate = jnp.float32(1.0) * in_range.astype(jnp.float32)

        # full-row contributions: (rows x inputs) mask * dv -> per-row sums.
        # An exact f32 VPU row-reduction — an MXU pass here would truncate
        # operands to bf16 (DEFAULT precision) and the error accumulates
        # over every group in the tile.
        full_mat = jnp.where(rel_b <= row_thresh, dv_b, 0.0) * gate
        full_col = jnp.sum(full_mat, axis=1, keepdims=True)  # (128, 1)

        # partial-row contributions: row-match (r x j) @ lane-mask (j x c)
        rel_div = rel_b // _LANES                           # floor toward -inf
        m1 = jnp.where(rel_div == row_iota, dv_b, 0.0) * gate
        # lane threshold per input, moved to the sublane axis via an exact
        # MXU transpose (integers < 256 are exact in bf16)
        rel_mod = (rel - rel_div[0:1, :] * _LANES).astype(jnp.float32)
        rel_mod_col = jax.lax.dot_general(
            eye, rel_mod, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (128, 1)
        m2 = (
            lane_iota
            >= jax.lax.broadcast_in_dim(
                rel_mod_col, (_LANES, _LANES), (0, 1)
            ).astype(jnp.int32)
        ).astype(jnp.float32)
        # three-way bf16 split of the dv operand (m2 is a 0/1 mask, exact):
        # residual after two levels is ~2^-18 relative, below the f32
        # accumulation noise even after a whole tile of groups
        m1_hi = m1.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = m1 - m1_hi
        m1_mid = r1.astype(jnp.bfloat16).astype(jnp.float32)
        m1_lo = r1 - m1_mid
        dims_mm = (((1,), (0,)), ((), ()))
        part = (
            jax.lax.dot_general(
                m1_hi, m2, dims_mm, preferred_element_type=jnp.float32
            )
            + jax.lax.dot_general(
                m1_mid, m2, dims_mm, preferred_element_type=jnp.float32
            )
            + jax.lax.dot_general(
                m1_lo, m2, dims_mm, preferred_element_type=jnp.float32
            )
        )                                                  # (128, 128)

        # Neumaier two-sum accumulation of the group's increment
        inc = part + jax.lax.broadcast_in_dim(
            full_col, (_OUT_GROUPS, _LANES), (0, 1)
        )
        acc = out_ref[:]
        s = acc + inc
        e = jnp.where(
            jnp.abs(acc) >= jnp.abs(inc),
            (acc - s) + inc,
            (inc - s) + acc,
        )
        out_ref[:] = s
        comp_ref[:] = comp_ref[:] + e

        group_last = jnp.max(st_row)                       # st is monotone
        consumed = in_range & (group_last <= tile_end)
        last_val = jnp.max(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                == _LANES - 1,
                val_row, -jnp.inf,
            )
        )
        new_fc = jnp.where(consumed, last_val, fc)
        new_ig = jnp.where(consumed, ig + 1, ig)
        return new_ig, need, new_fc, jnp.logical_not(consumed)

    def cond(state):
        return jnp.logical_not(state[3])

    init = (carry_ref[0], carry_ref[1], fcarry_ref[0], jnp.bool_(False))
    ig, wb, fc, _ = jax.lax.while_loop(cond, body, init)
    out_ref[:] = out_ref[:] + comp_ref[:]
    carry_ref[0] = ig
    carry_ref[1] = wb
    fcarry_ref[0] = fc


def _pass2_fast_kernel_dma(scal_ref, st_hbm, dv_hbm, vals_hbm, out_ref,
                           st_win, dv_win, val_win, sems, comp_ref,
                           carry_ref, fcarry_ref):
    def maybe_fetch(need, wb):
        @pl.when(need != wb)
        def _():
            cps = [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(need * _W, _W), :], win, sems.at[slot]
                )
                for slot, (hbm, win) in enumerate(
                    ((st_hbm, st_win), (dv_hbm, dv_win), (vals_hbm, val_win))
                )
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

    def read_group(loc, need):
        return (
            st_win[pl.ds(loc, 1), :],
            dv_win[pl.ds(loc, 1), :],
            val_win[pl.ds(loc, 1), :],
        )

    _pass2_fast_body(scal_ref, out_ref, comp_ref, carry_ref, fcarry_ref,
                     read_group, maybe_fetch)


def _pass2_fast_kernel_vmem(scal_ref, st_ref, dv_ref, vals_ref, out_ref,
                            comp_ref, carry_ref, fcarry_ref):
    def maybe_fetch(need, wb):
        pass

    def read_group(loc, need):
        glob = need * _W + loc
        return (
            st_ref[pl.ds(glob, 1), :],
            dv_ref[pl.ds(glob, 1), :],
            vals_ref[pl.ds(glob, 1), :],
        )

    _pass2_fast_body(scal_ref, out_ref, comp_ref, carry_ref, fcarry_ref,
                     read_group, maybe_fetch)


def _pass2_scatter_body(scal_ref, out_ref, D_ref, carry_ref, fcarry_ref,
                        read_group, maybe_fetch, G: int):
    """Scatter+prefix merge-fill (r5): the fastest pass-2 formulation.

    Key identity: within one output tile, ``out(slot) = fc0 +
    sum_{st_j <= slot} dv_j`` — a 2-D row-major *prefix* of a delta tile
    ``D[r, c] = sum of dv_j with clamped (st_j - tile_base) == r*128 + c``
    (inputs from revisited straddler groups with st below the tile clamp
    to position (0,0), so the prefix propagates them everywhere; inputs
    beyond the tile are gated off and revisited later).  So instead of
    masking dv into *every* affected slot per group (the r4 ``fast`` body:
    one full-row VPU reduction + one 128^3 MXU contraction per group),
    each batch of ``G`` groups scatters its dv by ONE position-exact MXU
    contraction ``m1 (128, G*128) @ E (G*128, 128)`` — ``m1[r, j] =
    [st_j div 128 == r] * dv_j``, ``E[j, c] = [st_j mod 128 == c]`` —
    and the tile pays a single Hillis-Steele 2-D prefix at the end.
    Error is *smaller* than the r4 body: the prefix telescopes (partial
    sums are bounded by the state range, no random walk), so no Neumaier
    pass is needed; dv still takes a 3-way bf16 split for the dot.

    Batching G groups per while-iteration amortizes the ~300-cycle scalar
    loop overhead that dominated the r4 body (one group per iteration).
    The tail batch near n_groups re-reads earlier rows with a per-group
    ``bs + g >= ig`` gate, so no input is ever double-scattered."""
    t = pl.program_id(0)
    n_groups = scal_ref[0]
    tile_slots = _OUT_GROUPS * _LANES
    tile_base = t * tile_slots
    tile_end = tile_base + tile_slots - 1

    @pl.when(t == 0)
    def _():
        carry_ref[0] = 0     # ig: first unconsumed group
        fcarry_ref[0] = 0.0  # telescoped value carry

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
    eye = (row_iota == lane_iota).astype(jnp.float32)
    lane_iota_row = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    fc0 = fcarry_ref[0]
    D_ref[:] = jnp.zeros((_OUT_GROUPS, _LANES), jnp.float32)

    def body(state):
        ig, fc, _stop = state
        bs = jnp.minimum(ig, jnp.maximum(n_groups - G, 0))
        maybe_fetch(bs)
        m1_parts = []
        rmod_rows = []
        lasts = []
        last_vals = []
        for g in range(G):
            gid = bs + g
            valid_g = (gid >= ig) & (gid < n_groups)
            st_row, dv_row, val_row = read_group(g)        # (1, 128)
            rel = st_row - tile_base
            valid_in = valid_g & (rel <= tile_slots - 1)
            relc = jnp.maximum(rel, 0)
            rdiv = relc // _LANES
            rmod_rows.append((relc - rdiv * _LANES).astype(jnp.float32))
            dv_g = jnp.where(valid_in, dv_row, 0.0)
            m1_parts.append(
                jnp.where(
                    jax.lax.broadcast_in_dim(
                        rdiv, (_LANES, _LANES), (0, 1)) == row_iota,
                    jax.lax.broadcast_in_dim(
                        dv_g, (_LANES, _LANES), (0, 1)),
                    0.0,
                )
            )
            lasts.append((jnp.max(st_row), valid_g))
            last_vals.append(jnp.max(jnp.where(
                lane_iota_row == _LANES - 1, val_row, -jnp.inf)))

        # input lane positions -> sublane axis via ONE exact MXU transpose
        # for the whole batch (rmod < 128: exact in bf16)
        rmod_all = jnp.concatenate(rmod_rows, axis=0)      # (G, 128)
        rmod_cols = jax.lax.dot_general(
            eye, rmod_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (128, G)
        e_parts = [
            (lane_iota == jax.lax.broadcast_in_dim(
                rmod_cols[:, g:g + 1], (_LANES, _LANES), (0, 1)
            ).astype(jnp.int32)).astype(jnp.float32)
            for g in range(G)
        ]

        m1 = jnp.concatenate(m1_parts, axis=1)             # (128, G*128)
        e_mat = jnp.concatenate(e_parts, axis=0)           # (G*128, 128)
        dims = (((1,), (0,)), ((), ()))
        parts = []
        rem = m1
        for _ in range(_SCATTER_SPLITS - 1):
            hi = rem.astype(jnp.bfloat16).astype(jnp.float32)
            parts.append(hi)
            rem = rem - hi
        parts.append(rem)
        acc = D_ref[:]
        for p in parts:
            acc = acc + jax.lax.dot_general(
                p, e_mat, dims, preferred_element_type=jnp.float32
            )
        D_ref[:] = acc

        # consumed count: st monotone across groups -> consumed flags are
        # a prefix; count the leading run
        cnt = jnp.int32(0)
        run = jnp.bool_(True)
        new_fc = fc
        for g in range(G):
            group_last, valid_g = lasts[g]
            consumed_g = valid_g & (group_last <= tile_end) & run
            new_fc = jnp.where(consumed_g, last_vals[g], new_fc)
            cnt = cnt + consumed_g.astype(jnp.int32)
            run = consumed_g
        return ig + cnt, new_fc, cnt < G

    def cond(state):
        return jnp.logical_not(state[2])

    ig, fc, _ = jax.lax.while_loop(
        cond, body, (carry_ref[0], fc0, jnp.bool_(False))
    )
    out_ref[:] = _prefix_rows_lanes(D_ref[:]) + fc0
    carry_ref[0] = ig
    fcarry_ref[0] = fc


def _pass2_scatter_kernel_dma(scal_ref, st_hbm, dv_hbm, vals_hbm, out_ref,
                              st_win, dv_win, val_win, sems, D_ref,
                              carry_ref, wcarry_ref, fcarry_ref, *, G: int):
    """DMA plumbing for the scatter body with DOUBLE-BUFFERED windows:
    each of the three (2*_W, 128) window scratches holds two _W-row
    halves; every refetch flips the parity and lands in the other half,
    so the previous batch's in-flight reads are never overwritten (the r4
    single-window hazard — see the ROADMAP item-2 negative result).  The
    window starts AT the batch base (not _W-aligned), overlapping
    refetches by up to G rows (~6% extra DMA traffic)."""

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        wcarry_ref[0] = -(1 << 30)  # window base: none resident
        wcarry_ref[1] = 0           # parity

    n_groups = scal_ref[0]

    def maybe_fetch(bs):
        wb = wcarry_ref[0]
        need = (bs < wb) | (bs + G > wb + _W)

        @pl.when(need)
        def _():
            parity = 1 - wcarry_ref[1]
            base = jnp.minimum(bs, jnp.maximum(n_groups - _W, 0))
            off = parity * _W
            cps = [
                pltpu.make_async_copy(
                    hbm.at[pl.ds(base, _W), :],
                    wref.at[pl.ds(off, _W), :],
                    sems.at[slot],
                )
                for slot, (hbm, wref) in enumerate(
                    ((st_hbm, st_win), (dv_hbm, dv_win), (vals_hbm, val_win))
                )
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
            wcarry_ref[0] = base
            wcarry_ref[1] = parity

        # record the batch->window offset for read_group
        wcarry_ref[2] = wcarry_ref[1] * _W + (bs - wcarry_ref[0])

    def read_group(g):
        loc = wcarry_ref[2] + g
        return (
            st_win[pl.ds(loc, 1), :],
            dv_win[pl.ds(loc, 1), :],
            val_win[pl.ds(loc, 1), :],
        )

    _pass2_scatter_body(scal_ref, out_ref, D_ref, carry_ref, fcarry_ref,
                        read_group, maybe_fetch, G)


def _pass2_scatter_kernel_vmem(scal_ref, st_ref, dv_ref, vals_ref, out_ref,
                               D_ref, carry_ref, wcarry_ref, fcarry_ref,
                               *, G: int):
    """Whole-array-in-VMEM scatter pass 2 (interpret mode)."""
    n_groups = scal_ref[0]

    def maybe_fetch(bs):
        wcarry_ref[0] = bs

    def read_group(g):
        glob = wcarry_ref[0] + g
        return (
            st_ref[pl.ds(glob, 1), :],
            dv_ref[pl.ds(glob, 1), :],
            vals_ref[pl.ds(glob, 1), :],
        )

    _pass2_scatter_body(scal_ref, out_ref, D_ref, carry_ref, fcarry_ref,
                        read_group, maybe_fetch, G)


def _logsumexp_stats_kernel(lw_ref, out_ref):
    """Per-block (max, shifted sum-exp) partials: the grid is embarrassingly
    parallel (no carry), so the sweep streams at HBM bandwidth; the
    128-element combine runs in XLA."""
    lw = lw_ref[:]
    m = jnp.max(lw)
    s = jnp.sum(jnp.exp(lw - m))
    iota = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
    rid = jax.lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
    out_ref[:] = jnp.where(
        (rid == 0) & (iota == 0), m,
        jnp.where((rid == 0) & (iota == 1), s, 0.0),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def logsumexp_stats(log_w, interpret: bool = False):
    """One-sweep ``(m, wtot)`` with ``m = max(log_w)``, ``wtot =
    sum(exp(log_w - m))`` — shared by the resample epoch's pass 1 and the
    evidence update ``log_mean_exp = m + log(wtot) - log(n)``, so a chunk
    boundary pays a single extra population sweep instead of four (the
    XLA max + sum(exp(x-max)) pair costs ~3.3 ms at 2^24 on v5e)."""
    n = log_w.shape[0]
    r = n // _LANES
    w1 = _W
    while w1 < 1024 and r % (w1 * 2) == 0:
        w1 *= 2
    parts = pl.pallas_call(
        _logsumexp_stats_kernel,
        grid=(r // w1,),
        in_specs=[pl.BlockSpec((w1, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * (r // w1), _LANES), jnp.float32),
        interpret=interpret,
    )(log_w.reshape(r, _LANES))
    m_b = parts[::8, 0]
    s_b = parts[::8, 1]
    m = jnp.max(m_b)
    wtot = jnp.sum(s_b * jnp.exp(m_b - m))
    return m, wtot


def _pass1(u0, log_w, states, interpret: bool = False, m=None, wtot=None):
    """Start slots + value diffs (one streaming sweep).  Exposed separately
    so tests can check pass 2 against an exact expansion of pass 1's own
    (f32-arithmetic) start slots.  ``m``/``wtot``: optionally precomputed
    (:func:`logsumexp_stats`, or threaded from a fused sweep's streaming
    partials) — skips the XLA max/sum prologue."""
    n = states.shape[0]
    r = n // _LANES
    lw2 = log_w.reshape(r, _LANES)
    v2 = states.reshape(r, _LANES)

    if m is None or wtot is None:
        m, wtot = logsumexp_stats(log_w, interpret=interpret)
    scal1 = jnp.stack([
        m, 1.0 / wtot, jnp.asarray(u0, jnp.float32), jnp.float32(n),
    ])
    # large blocks: at (128,128) tiles the 2^24 sweep pays ~30 us of
    # per-grid-step overhead x 1024 steps; (1024,128) amortizes it 8x
    w1 = _W
    while w1 < 1024 and r % (w1 * 2) == 0:
        w1 *= 2
    blk = lambda: pl.BlockSpec((w1, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pass1_kernel,
        grid=(r // w1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk(), blk()],
        out_specs=[blk(), blk()],
        out_shape=[
            jax.ShapeDtypeStruct((r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.float32)],
        interpret=interpret,
    )(scal1, lw2, v2)


@functools.partial(jax.jit, static_argnames=("interpret", "impl"))
def _streaming_resample(u0, log_w, states, interpret: bool = False,
                        impl: str = "scatter", m=None, wtot=None):
    n = states.shape[0]
    r = n // _LANES
    v2 = states.reshape(r, _LANES)
    st, dv = _pass1(u0, log_w, states, interpret=interpret, m=m, wtot=wtot)

    # ---- pass 2: merge-fill ----
    n_out_tiles = r // _OUT_GROUPS
    if impl == "scatter":
        G = _SCATTER_G
        if interpret:
            kernel, in_space, scratch = (
                functools.partial(_pass2_scatter_kernel_vmem, G=G),
                pltpu.VMEM,
                [
                    pltpu.VMEM((_OUT_GROUPS, _LANES), jnp.float32),  # D
                    pltpu.SMEM((1,), jnp.int32),    # ig carry
                    pltpu.SMEM((3,), jnp.int32),    # window carry
                    pltpu.SMEM((1,), jnp.float32),  # fc carry
                ],
            )
        else:
            kernel, in_space, scratch = (
                functools.partial(_pass2_scatter_kernel_dma, G=G),
                pl.ANY,
                [
                    pltpu.VMEM((2 * _W, _LANES), jnp.int32),
                    pltpu.VMEM((2 * _W, _LANES), jnp.float32),
                    pltpu.VMEM((2 * _W, _LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((3,)),
                    pltpu.VMEM((_OUT_GROUPS, _LANES), jnp.float32),  # D
                    pltpu.SMEM((1,), jnp.int32),
                    pltpu.SMEM((3,), jnp.int32),
                    pltpu.SMEM((1,), jnp.float32),
                ],
            )
        out = pl.pallas_call(
            kernel,
            grid=(n_out_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=in_space),
                pl.BlockSpec(memory_space=in_space),
                pl.BlockSpec(memory_space=in_space),
            ],
            out_specs=pl.BlockSpec((_OUT_GROUPS, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(jnp.asarray([r], jnp.int32), st, dv, v2)
        return out.reshape(n)
    comp_scratch = (
        [pltpu.VMEM((_OUT_GROUPS, _LANES), jnp.float32)]
        if impl == "fast" else []
    )
    if interpret:
        # whole arrays as VMEM inputs — see _pass2_kernel_vmem
        kernel, in_space, scratch = (
            _pass2_fast_kernel_vmem if impl == "fast" else _pass2_kernel_vmem,
            pltpu.VMEM,
            comp_scratch + [
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),
            ],
        )
    else:
        kernel, in_space, scratch = (
            _pass2_fast_kernel_dma if impl == "fast" else _pass2_kernel_dma,
            pl.ANY,
            [
                pltpu.VMEM((_W, _LANES), jnp.int32),
                pltpu.VMEM((_W, _LANES), jnp.float32),
                pltpu.VMEM((_W, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ] + comp_scratch + [
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),
            ],
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_out_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=in_space),
            pl.BlockSpec(memory_space=in_space),
            pl.BlockSpec(memory_space=in_space),
        ],
        out_specs=pl.BlockSpec((_OUT_GROUPS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, _LANES), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray([r], jnp.int32), st, dv, v2)
    return out.reshape(n)


def streaming_available(n: int) -> bool:
    return n % (_W * _LANES) == 0 and n % (_OUT_GROUPS * _LANES) == 0


def streaming_systematic_resample_values(key, log_weights, states,
                                         interpret: bool = False,
                                         m=None, wtot=None):
    """Systematic resampling of a scalar f32 population; returns the new
    state values under a fixed slot enumeration (see module docstring).
    Drop-in alternative to ``sorted_systematic_resample_values`` when
    ``streaming_available(n)``.  ``m``/``wtot``: optional precomputed
    weight stats (skips the epoch's own logsumexp sweep)."""
    u0 = jax.random.uniform(key, ())
    return _streaming_resample(u0, log_weights, states, interpret=interpret,
                               m=m, wtot=wtot)

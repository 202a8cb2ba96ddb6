"""Node-sharded mega-kernel KL refinement (per-shard Pallas + RDMA).

Round 4's owner-computes engine (:mod:`eig_kl_tpu.parallel.sharded_kl2`)
proved the O(1)-scalar-per-swap communication protocol but runs each
swap as XLA ops (~100x the single-chip mega-kernel's 4-5 us/swap,
VERDICT r4 weak #4).  This module is the fast version: every shard runs
the ENTIRE swap loop inside ONE Pallas kernel — selection from its
local hierarchical row-max cache, candidate exchange and w_ab broadcast
as in-kernel remote DMAs over the ICI, and the owner-computes ``A @ s``
update against its *transpose-partitioned* adjacency — so multi-chip
capacity (mesh_size x ~2.08M nodes, the measured single-chip VMEM
ceiling) no longer trades away the mega-kernel's per-swap speed.

Per swap, per shard:

1. local first-max selection per side from the (R_l, 128) VMEM state
   (sf = sign*free, a_s = cached A @ s) — identical math to
   :mod:`eig_kl_tpu.kl.megakernel`, over 1/n_shards of the nodes;
2. **round A**: broadcast 6 scalars (m_l, a_hi, a_lo, m_r, b_hi, b_lo —
   indices split 12/12 bits so every lane is an exact f32) to every
   peer's candidate buffer via remote DMA; wait n-1 sends + n-1
   receives; every shard then computes the SAME global (a, b) winner
   (max value, lowest shard, lowest local index — global first-max,
   cKL.cpp:341-347 order);
3. fetch the two *column* meta blocks for a and b from HBM (this
   shard's transpose slices: who among MY rows neighbors a/b), update
   the local a_s rows, refresh the hierarchical cache — all local, no
   neighbor data ever crosses the ICI (owner-computes);
4. **round B**: b's owner alone holds w_ab (it appears in its column-a
   slice at local row b); it broadcasts that one scalar; everyone folds
   gain = m_l + m_r - 2 w_ab into the Kahan cut accumulator
   (gKL.cu:384-414) and the shared termination counters.

Every scalar carried by the loop is bit-identically replicated across
shards, so control flow stays in lockstep with no extra barrier; the
two DMA rounds per iteration double-buffer their target slots, and
round B's wait transitively fences slot reuse two iterations apart.

Projected real-ICI cost: 2 latency-floor exchange rounds (~1-2 us each
on a v5e ring) + the mega-kernel's local work on n/n_shards nodes —
~10 us/swap at 8 shards vs the XLA engine's ~380 us.  On a mesh of 1
both rounds vanish and the kernel degenerates to the single-chip
mega-kernel over the same state layout (measured on the real chip; see
RESULTS.md).

Adjacency layout (per shard): the **column transpose** of its row
slice, DMA-addressable per global column:

* dense level: 8 columns per (1, 128) meta row, 16 lanes each — lane
  ``(v%8)*16`` holds the local entry count c, lanes +1..+15 the local
  row ids (idx array) / edge weights (w array).  Columns with c > 15
  store 14 entries and an overflow-row pointer in lane +15;
* overflow level: one meta-style row per overflowing column (lane 0 =
  tail count, lanes 1.. = entries), width sized by the worst tail.

Memory per shard: 128 B/node dense + O(local nnz) overflow — the same
data as sharded_kl2's two-level CSC-ELL, regrouped into aligned
(8, 128) DMA blocks.

Reference analog: the per-swap D2H/H2D round-trips of gKL.cu:205-226
are what the in-kernel exchange replaces; swap semantics (gain, ties,
termination log2(n)+5, cKL.cpp:303-386) match the single-chip engines
— trajectories are bit-identical (tests/test_smega.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.kl.engine import KLResult, best_iteration, replay_swaps
from eig_kl_tpu.parallel.sharded_kl import _pad_ell
from eig_kl_tpu.utils.config import KLConfig

_NEG = -3.0e38
_LPC = 16            # lanes per column in the dense level
_DENSE_CAP = 15      # entries when no overflow (count lane + 15)
_DENSE_OVF = 14      # entries when lane 15 is the overflow pointer


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _build_colT(g: Graph, n_pad: int, n_shards: int):
    """Per-shard column-transpose meta arrays (see module docstring).

    Returns (colT_idx int32[n_shards, MR, 128],
             colT_w f32[n_shards, MR, 128],
             ovf_idx int32[n_shards, OR, OVP],
             ovf_w f32[n_shards, OR, OVP])
    with MR = n_pad/8 rounded to 8 rows and OR/OVP shared across shards
    (shard_map needs uniform shapes).
    """
    n = g.num_nodes
    n_l = n_pad // n_shards
    rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
    cols = g.indices.astype(np.int64)
    w = g.data.astype(np.float32)
    shard = rows // n_l
    lrow = (rows - shard * n_l).astype(np.int32)

    key = shard * n_pad + cols
    order = np.argsort(key, kind="stable")
    key_o, lrow_o, w_o = key[order], lrow[order], w[order]
    sh_o, co_o = shard[order], cols[order]
    uniq, start, counts = np.unique(key_o, return_index=True, return_counts=True)
    rank = np.arange(key_o.size) - np.repeat(start, counts)
    c_of = np.repeat(counts, counts)  # per-entry group size

    MR = _round_up(max(n_pad // 8, 1), 8)
    colT_idx = np.zeros((n_shards, MR, 128), np.int32)
    colT_w = np.zeros((n_shards, MR, 128), np.float32)
    mrow = (co_o // 8).astype(np.int64)
    base = ((co_o % 8) * _LPC).astype(np.int64)
    # Counts.
    colT_idx[sh_o[start], mrow[start], base[start]] = counts.astype(np.int32)
    # Dense entries.
    cap = np.where(c_of > _DENSE_CAP, _DENSE_OVF, _DENSE_CAP)
    dense = rank < cap
    colT_idx[sh_o[dense], mrow[dense], base[dense] + 1 + rank[dense]] = lrow_o[dense]
    colT_w[sh_o[dense], mrow[dense], base[dense] + 1 + rank[dense]] = w_o[dense]

    # Overflow rows: one per (shard, column) with count > _DENSE_CAP.
    ovf_groups = counts > _DENSE_CAP
    n_ovf = int(ovf_groups.sum())
    if n_ovf:
        tails = counts[ovf_groups] - _DENSE_OVF
        OVP = _round_up(int(tails.max()) + 1, 128)
        OR = _round_up(n_ovf, 8)
        ovf_idx = np.zeros((n_shards, OR, OVP), np.int32)
        ovf_w = np.zeros((n_shards, OR, OVP), np.float32)
        # Overflow row ids are per shard, assigned in group order.
        g_sh = sh_o[start][ovf_groups]
        per_shard_pos = (
            np.arange(n_ovf)
            - np.searchsorted(g_sh, np.arange(n_shards))[g_sh]
        )
        # Pointer in the dense slot's lane 15.
        colT_idx[
            g_sh, mrow[start][ovf_groups],
            base[start][ovf_groups] + _LPC - 1,
        ] = per_shard_pos.astype(np.int32)
        ovf_idx[g_sh, per_shard_pos, 0] = tails.astype(np.int32)
        # Scatter tail entries.
        ovf_of = np.zeros(uniq.size, np.int64)
        ovf_of[ovf_groups] = per_shard_pos
        row_of = np.repeat(ovf_of, counts)
        tail = rank >= cap
        ovf_idx[sh_o[tail], row_of[tail], rank[tail] - _DENSE_OVF + 1] = lrow_o[tail]
        ovf_w[sh_o[tail], row_of[tail], rank[tail] - _DENSE_OVF + 1] = w_o[tail]
    else:
        ovf_idx = np.zeros((n_shards, 8, 128), np.int32)
        ovf_w = np.zeros((n_shards, 8, 128), np.float32)
    return colT_idx, colT_w, ovf_idx, ovf_w


def _kernel(
    ci_hbm,   # colT idx rows (HBM)
    cw_hbm,   # colT weight rows (HBM)
    oi_hbm,   # overflow idx rows (HBM)
    ow_hbm,   # overflow weight rows (HBM)
    sf0_ref,  # (R_l, 128) initial sign*free (HBM)
    as0_ref,  # (R_l, 128) initial A @ s slice (HBM)
    fp_ref,   # SMEM (1, 2): [cut0, best0]
    ip_ref,   # SMEM (1, 4): [cap, term0, nf0, nf1]
    # outputs
    sfout_ref,
    log_cut_ref,
    log_gain_ref,
    log_a_ref,
    log_b_ref,
    out_ref,
    # scratch
    sf_ref,
    as_ref,
    ca_i, ca_w, cb_i, cb_w,       # SMEM (8, 128) dense column blocks
    oa_i, oa_w, ob_i, ob_w,       # SMEM (8, OVP) overflow blocks
    stc_ref, stg_ref, sta_ref, stb_ref,
    rml_ref, rmr_ref,
    cand_ref,                     # VMEM (2 * NDR, 128) exchange buffer
    wab_ref,                      # VMEM (2, 128) w_ab broadcast buffer
    sems,                         # DMA sems for local copies
    semA_s, semA_r, semB_s, semB_r,   # per-peer DMA sems
    *,
    n_dev: int,
    n_local: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    hierarchical: bool,
):
    R = sf_ref.shape[0]
    NDR = cand_ref.shape[0] // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    me = lax.axis_index("mp") if n_dev > 1 else jnp.int32(0)
    r0 = me * jnp.int32(n_local)

    if n_dev > 1:
        # Launch barrier: no shard may remote-write before every peer's
        # kernel is live (its scratch allocated).
        bar = pltpu.get_barrier_semaphore()
        for d in range(n_dev):
            pltpu.semaphore_signal(
                bar, 1, device_id=jnp.int32(d),
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
        pltpu.semaphore_wait(bar, n_dev)

    cp_f = pltpu.make_async_copy(sf0_ref, sf_ref, sems.at[0])
    cp_a = pltpu.make_async_copy(as0_ref, as_ref, sems.at[1])
    cp_f.start()
    cp_a.start()
    cp_f.wait()
    cp_a.wait()

    stc_ref[:] = jnp.zeros_like(stc_ref)
    stg_ref[:] = jnp.zeros_like(stg_ref)
    sta_ref[:] = jnp.zeros_like(sta_ref)
    stb_ref[:] = jnp.zeros_like(stb_ref)

    def flush_logs(blk):
        base = blk * 8
        cps = [
            pltpu.make_async_copy(st, hbm.at[pl.ds(base, 8), :], sems.at[4 + k])
            for k, (st, hbm) in enumerate(
                (
                    (stc_ref, log_cut_ref),
                    (stg_ref, log_gain_ref),
                    (sta_ref, log_a_ref),
                    (stb_ref, log_b_ref),
                )
            )
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    cut0 = fp_ref[0, 0]
    best0 = fp_ref[0, 1]
    cap0 = ip_ref[0, 0]  # runtime swap cap (max_iters only sizes logs)
    term0 = ip_ref[0, 1]
    nf0_0 = ip_ref[0, 2]
    nf1_0 = ip_ref[0, 3]
    row0 = stc_ref[pl.ds(0, 1), :]
    stc_ref[pl.ds(0, 1), :] = jnp.where(lane == 0, cut0, row0)

    if hierarchical:
        rml_ref[:] = jnp.full_like(rml_ref, _NEG)
        rmr_ref[:] = jnp.full_like(rmr_ref, _NEG)

    def rmw_set(ref, q, l, value):
        row = ref[pl.ds(q, 1), :]
        ref[pl.ds(q, 1), :] = jnp.where(lane == l, value, row)

    def cache_row(q, sfrow, arow):
        d = -(sfrow * arow)
        ml = jnp.max(jnp.where(sfrow > 0, d, _NEG))
        mr = jnp.max(jnp.where(sfrow < 0, d, _NEG))
        rmw_set(rml_ref, q // 128, q % 128, ml)
        rmw_set(rmr_ref, q // 128, q % 128, mr)

    def row_maxes(q):
        if not hierarchical:
            return
        cache_row(q, sf_ref[pl.ds(q, 1), :], as_ref[pl.ds(q, 1), :])

    if hierarchical:
        lax.fori_loop(0, R, lambda q, _: (row_maxes(q), 0)[1], 0)

    r8 = rml_ref.shape[0]
    flat_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 128), 0) * 128 + (
        jax.lax.broadcasted_iota(jnp.int32, (r8, 128), 1)
    )
    big_r = jnp.int32(r8 * 128)
    big_i = jnp.int32(R * 128)

    def select_local(sign_is_left):
        """Local first-max (value, local index) for one side."""
        if hierarchical:
            rm = rml_ref if sign_is_left else rmr_ref
            m = jnp.max(rm[:])
            q = jnp.min(jnp.where(rm[:] == m, flat_r, big_r))
            sfrow = sf_ref[pl.ds(q, 1), :]
            arow = as_ref[pl.ds(q, 1), :]
            d = -(sfrow * arow)
            dm = jnp.where(sfrow > 0 if sign_is_left else sfrow < 0, d, _NEG)
            l = jnp.min(jnp.where(dm == m, lane, jnp.int32(128)))
            return m, q * 128 + l
        sf = sf_ref[:]
        d = -(sf * as_ref[:])
        flat = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128 + (
            jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        )
        dm = jnp.where(sf > 0 if sign_is_left else sf < 0, d, _NEG)
        m = jnp.max(dm)
        return m, jnp.min(jnp.where(dm == m, flat, big_i))

    nd_iota = jax.lax.broadcasted_iota(jnp.int32, (NDR, 128), 0)

    def exchange(slot, m_l, la, m_r, lb):
        """Round A: all-broadcast candidates, return global winners."""
        ga = r0 + la
        gb = r0 + lb
        myrow = (
            jnp.where(lane == 0, m_l, 0.0)
            + jnp.where(lane == 1, (ga // 4096).astype(jnp.float32), 0.0)
            + jnp.where(lane == 2, (ga % 4096).astype(jnp.float32), 0.0)
            + jnp.where(lane == 3, m_r, 0.0)
            + jnp.where(lane == 4, (gb // 4096).astype(jnp.float32), 0.0)
            + jnp.where(lane == 5, (gb % 4096).astype(jnp.float32), 0.0)
        )
        cand_ref[pl.ds(slot * NDR + me, 1), :] = myrow
        if n_dev > 1:
            src = cand_ref.at[pl.ds(slot * NDR + me, 1), :]
            for d in range(n_dev):
                @pl.when(d != me)
                def _(d=d):
                    pltpu.make_async_remote_copy(
                        src_ref=src,
                        dst_ref=cand_ref.at[pl.ds(slot * NDR + me, 1), :],
                        send_sem=semA_s.at[d],
                        recv_sem=semA_r.at[me],
                        device_id=jnp.int32(d),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    ).start()
            for d in range(n_dev):
                @pl.when(d != me)
                def _(d=d):
                    dd = pltpu.make_async_remote_copy(
                        src_ref=src,
                        dst_ref=cand_ref.at[pl.ds(slot * NDR + d, 1), :],
                        send_sem=semA_s.at[d],
                        recv_sem=semA_r.at[d],
                        device_id=jnp.int32(d),
                        device_id_type=pltpu.DeviceIdType.LOGICAL,
                    )
                    dd.wait_send()
                    dd.wait_recv()
        blk = cand_ref[pl.ds(slot * NDR, NDR), :]

        def pick(m_lane, hi_lane, lo_lane):
            vals = jnp.where((lane == m_lane) & (nd_iota < n_dev), blk, _NEG)
            m = jnp.max(vals)
            d_win = jnp.min(jnp.where(vals == m, nd_iota, jnp.int32(NDR * 128)))
            sel = nd_iota == d_win
            hi = jnp.sum(jnp.where(sel & (lane == hi_lane), blk, 0.0))
            lo = jnp.sum(jnp.where(sel & (lane == lo_lane), blk, 0.0))
            return m, hi.astype(jnp.int32) * 4096 + lo.astype(jnp.int32)

        m_l2, a = pick(0, 1, 2)
        m_r2, b = pick(3, 4, 5)
        return m_l2, a, m_r2, b

    OVP = oa_i.shape[1]

    def fetch_cols(a, b):
        """DMA both columns' dense meta blocks concurrently, then both
        overflow tails (if any) concurrently — one HBM-latency wait for
        the swap instead of two to four serialized ones."""
        blka = ((a // 8) // 8) * 8
        blkb = ((b // 8) // 8) * 8
        dense_cps = (
            pltpu.make_async_copy(ci_hbm.at[pl.ds(blka, 8), :], ca_i, sems.at[0]),
            pltpu.make_async_copy(cw_hbm.at[pl.ds(blka, 8), :], ca_w, sems.at[1]),
            pltpu.make_async_copy(ci_hbm.at[pl.ds(blkb, 8), :], cb_i, sems.at[2]),
            pltpu.make_async_copy(cw_hbm.at[pl.ds(blkb, 8), :], cb_w, sems.at[3]),
        )
        for cp in dense_cps:
            cp.start()
        for cp in dense_cps:
            cp.wait()
        ra = (a // 8) % 8
        rb = (b // 8) % 8
        basea = (a % 8) * _LPC
        baseb = (b % 8) * _LPC
        c_a = ca_i[ra, basea]
        c_b = cb_i[rb, baseb]

        def ovf_cps(di, rr, base, oi, ow, s0, s1):
            # Reconstructed identically at start and wait sites: a
            # descriptor's wait() only waits its semaphore/byte count.
            optr = di[rr, base + _LPC - 1]
            oblk = (optr // 8) * 8
            return (
                pltpu.make_async_copy(oi_hbm.at[pl.ds(oblk, 8), :], oi, sems.at[s0]),
                pltpu.make_async_copy(ow_hbm.at[pl.ds(oblk, 8), :], ow, sems.at[s1]),
            )

        @pl.when(c_a > _DENSE_CAP)
        def _():
            for cp in ovf_cps(ca_i, ra, basea, oa_i, oa_w, 4, 5):
                cp.start()

        @pl.when(c_b > _DENSE_CAP)
        def _():
            for cp in ovf_cps(cb_i, rb, baseb, ob_i, ob_w, 6, 7):
                cp.start()

        @pl.when(c_a > _DENSE_CAP)
        def _():
            for cp in ovf_cps(ca_i, ra, basea, oa_i, oa_w, 4, 5):
                cp.wait()

        @pl.when(c_b > _DENSE_CAP)
        def _():
            for cp in ovf_cps(cb_i, rb, baseb, ob_i, ob_w, 6, 7):
                cp.wait()

        return ra, basea, c_a, rb, baseb, c_b

    def cond(carry):
        it, cut, comp, best_cut, term, nf0, nf1, stop = carry
        return (stop == 0) & (it < cap0) & (nf0 > 0) & (nf1 > 0)

    def body(carry):
        it, cut, comp, best_cut, term, nf0, nf1, stop = carry
        slot = it % 2
        m_l0, la = select_local(True)
        m_r0, lb = select_local(False)
        m_l, a, m_r, b = exchange(slot, m_l0, la, m_r0, lb)

        ra, basea, c_a, rb, baseb, c_b = fetch_cols(a, b)

        # Selected nodes come off fixed sides: a from s > 0, b from
        # s < 0 (the masked selects), so the signs are constants.
        lb_own = b - r0
        own_b = (lb_own >= 0) & (lb_own < n_local)

        def touch(j, delta):
            q = j // 128
            arow = as_ref[pl.ds(q, 1), :] + jnp.where(lane == j % 128, delta, 0.0)
            as_ref[pl.ds(q, 1), :] = arow
            if hierarchical:
                cache_row(q, sf_ref[pl.ds(q, 1), :], arow)

        # Column a: update my rows' A @ s (s_a = +1 -> delta -2w) and
        # accumulate w_ab if I own row b.
        cd_a = jnp.where(c_a > _DENSE_CAP, _DENSE_OVF, c_a)

        def loop_a(k, wab):
            j = ca_i[ra, basea + k]
            w = ca_w[ra, basea + k]
            touch(j, -2.0 * w)
            return wab + jnp.where(own_b & (j == lb_own), w, 0.0)

        wab_l = lax.fori_loop(1, cd_a + 1, loop_a, jnp.float32(0.0))

        # Overflow tails: scalar row within the DMA'd (8, OVP) block.
        def ovf_scan(oi, ow, optr_row, coef, track_b):
            t = oi[optr_row, 0]

            def lp(k, wab):
                j = oi[optr_row, k]
                w = ow[optr_row, k]
                touch(j, coef * w)
                if track_b:
                    return wab + jnp.where(own_b & (j == lb_own), w, 0.0)
                return wab

            return lax.fori_loop(1, t + 1, lp, jnp.float32(0.0))

        def wab_ovf():
            optr = ca_i[ra, basea + _LPC - 1]
            return ovf_scan(oa_i, oa_w, optr % 8, -2.0, True)

        wab_l = wab_l + lax.cond(
            c_a > _DENSE_CAP, wab_ovf, lambda: jnp.float32(0.0)
        )

        # Round B: b's owner broadcasts w_ab (starts now, waited below
        # so the column-b update hides the ICI latency).
        wrow = jnp.where(lane == 0, wab_l, 0.0)
        if n_dev > 1:
            @pl.when(own_b)
            def _():
                wab_ref[pl.ds(slot, 1), :] = wrow
                for d in range(n_dev):
                    @pl.when(d != me)
                    def _(d=d):
                        pltpu.make_async_remote_copy(
                            src_ref=wab_ref.at[pl.ds(slot, 1), :],
                            dst_ref=wab_ref.at[pl.ds(slot, 1), :],
                            send_sem=semB_s.at[d],
                            recv_sem=semB_r.at[me],
                            device_id=jnp.int32(d),
                            device_id_type=pltpu.DeviceIdType.LOGICAL,
                        ).start()
        else:
            wab_ref[pl.ds(slot, 1), :] = wrow

        # Column b (s_b = -1 -> delta +2w).
        cd_b = jnp.where(c_b > _DENSE_CAP, _DENSE_OVF, c_b)

        def loop_b(k, _):
            j = cb_i[rb, baseb + k]
            touch(j, 2.0 * cb_w[rb, baseb + k])
            return 0

        lax.fori_loop(1, cd_b + 1, loop_b, 0)

        @pl.when(c_b > _DENSE_CAP)
        def _():
            optr = cb_i[rb, baseb + _LPC - 1]
            ovf_scan(ob_i, ob_w, optr % 8, 2.0, False)

        # Lock whichever of a/b I own.
        la_own = a - r0

        @pl.when((la_own >= 0) & (la_own < n_local))
        def _():
            q, l = la_own // 128, la_own % 128
            rmw_set(sf_ref, q, l, 0.0)
            row_maxes(q)

        @pl.when(own_b)
        def _():
            q, l = lb_own // 128, lb_own % 128
            rmw_set(sf_ref, q, l, 0.0)
            row_maxes(q)

        # Collect w_ab (owner already holds it; peers wait the DMA).
        if n_dev > 1:
            owner = b // jnp.int32(n_local)

            @pl.when(~own_b)
            def _():
                pltpu.make_async_remote_copy(
                    src_ref=wab_ref.at[pl.ds(slot, 1), :],
                    dst_ref=wab_ref.at[pl.ds(slot, 1), :],
                    send_sem=semB_s.at[owner],
                    recv_sem=semB_r.at[owner],
                    device_id=owner,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_recv()

            @pl.when(own_b)
            def _():
                for d in range(n_dev):
                    @pl.when(d != me)
                    def _(d=d):
                        pltpu.make_async_remote_copy(
                            src_ref=wab_ref.at[pl.ds(slot, 1), :],
                            dst_ref=wab_ref.at[pl.ds(slot, 1), :],
                            send_sem=semB_s.at[d],
                            recv_sem=semB_r.at[me],
                            device_id=jnp.int32(d),
                            device_id_type=pltpu.DeviceIdType.LOGICAL,
                        ).wait_send()
        w_ab = jnp.sum(jnp.where(lane == 0, wab_ref[pl.ds(slot, 1), :], 0.0))

        gain = m_l + m_r - 2.0 * w_ab
        y = -gain - comp
        t = cut + y
        comp2 = (t - cut) - y
        cut2 = t
        best2 = jnp.minimum(cut2, best_cut)
        it2 = it + 1
        srow = it2 % 1024
        rmw_set(stc_ref, srow // 128, srow % 128, cut2)
        rmw_set(stg_ref, srow // 128, srow % 128, gain)
        row = sta_ref[pl.ds(srow // 128, 1), :]
        sta_ref[pl.ds(srow // 128, 1), :] = jnp.where(lane == srow % 128, a, row)
        row = stb_ref[pl.ds(srow // 128, 1), :]
        stb_ref[pl.ds(srow // 128, 1), :] = jnp.where(lane == srow % 128, b, row)

        @pl.when(srow == 1023)
        def _():
            flush_logs(it2 // 1024)

        term2 = jnp.where(gain <= gain_eps, term + 1, 0)
        stop2 = (term2 > terminate_limit).astype(jnp.int32)
        return (it2, cut2, comp2, best2, term2, nf0 - 1, nf1 - 1, stop2)

    init = (
        jnp.int32(0),
        cut0,
        jnp.float32(0.0),
        jnp.minimum(cut0, best0),
        term0.astype(jnp.int32),
        nf0_0.astype(jnp.int32),
        nf1_0.astype(jnp.int32),
        jnp.int32(0),
    )
    it, cut, _comp, best_cut, term, nf0, nf1, stop = lax.while_loop(
        cond, body, init
    )
    flush_logs(it // 1024)

    cp_out = pltpu.make_async_copy(sf_ref, sfout_ref, sems.at[0])
    cp_out.start()
    cp_out.wait()

    out_ref[0, 0] = cut
    out_ref[1, 0] = best_cut
    out_ref[2, 0] = it.astype(jnp.float32)
    out_ref[3, 0] = term.astype(jnp.float32)
    out_ref[4, 0] = nf0.astype(jnp.float32)
    out_ref[5, 0] = nf1.astype(jnp.float32)
    out_ref[6, 0] = cut0
    out_ref[7, 0] = stop.astype(jnp.float32)


def _smega_call(
    ci, cw, oi, ow, sf0, as0, fp, ip, *,
    n_dev, n_local, max_iters, terminate_limit, gain_eps, interpret,
):
    R = n_local // 128
    OVP = oi.shape[1]
    ml = _round_up(max_iters + 1, 1024)
    MLR = ml // 128
    NDR = _round_up(n_dev, 8)
    kernel = functools.partial(
        _kernel,
        n_dev=n_dev,
        n_local=n_local,
        max_iters=max_iters,
        terminate_limit=terminate_limit,
        gain_eps=gain_eps,
        hierarchical=n_local > (1 << 17),
    )
    if interpret:
        interpret = pltpu.InterpretParams()
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.float32),   # sf out
            jax.ShapeDtypeStruct((MLR, 128), jnp.float32),  # log_cut
            jax.ShapeDtypeStruct((MLR, 128), jnp.float32),  # log_gain
            jax.ShapeDtypeStruct((MLR, 128), jnp.int32),    # log_a
            jax.ShapeDtypeStruct((MLR, 128), jnp.int32),    # log_b
            jax.ShapeDtypeStruct((8, 1), jnp.float32),      # scalars
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((8, 1), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.SMEM((8, 128), jnp.int32),
            pltpu.SMEM((8, 128), jnp.float32),
            pltpu.SMEM((8, 128), jnp.int32),
            pltpu.SMEM((8, 128), jnp.float32),
            pltpu.SMEM((8, OVP), jnp.int32),
            pltpu.SMEM((8, OVP), jnp.float32),
            pltpu.SMEM((8, OVP), jnp.int32),
            pltpu.SMEM((8, OVP), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((_round_up(R, 128) // 128, 128), jnp.float32),
            pltpu.VMEM((_round_up(R, 128) // 128, 128), jnp.float32),
            pltpu.VMEM((2 * NDR, 128), jnp.float32),
            pltpu.VMEM((2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((n_dev,)),
            pltpu.SemaphoreType.DMA((n_dev,)),
            pltpu.SemaphoreType.DMA((n_dev,)),
            pltpu.SemaphoreType.DMA((n_dev,)),
        ],
        # collective_id names the cross-device launch barrier; a mesh
        # of 1 has no collective ops, so don't claim one.
        compiler_params=(
            pltpu.CompilerParams(collective_id=7) if n_dev > 1 else None
        ),
        interpret=interpret,
    )(ci, cw, oi, ow, sf0, as0, fp, ip)


@functools.cache
def _build_smega(
    mesh: Mesh,
    n_valid: int,
    max_iters: int,
    gain_eps: float,
    terminate_limit: int,
    interpret: bool,
):
    n_dev = mesh.shape["mp"]

    def run(ell_idx, ell_w, deg, ci, cw, oi, ow, sides, cut0, n0, n1, cap):
        # NO XLA collectives in this program: the kernel's blocking
        # interpret-mode callbacks plus an XLA CPU in-process
        # all-reduce can starve the runtime's thread pool into a
        # rendezvous deadlock on small hosts, and on hardware the
        # kernel's own RDMA is the only traffic this engine needs.
        # cut0 arrives replicated from the host (f64 recount, exact).
        del deg
        n_l = ell_idx.shape[0]
        R = n_l // 128
        me = jax.lax.axis_index("mp")
        r0 = me * n_l
        g_ids = r0 + jax.lax.broadcasted_iota(jnp.int32, (n_l, 1), 0)[:, 0]

        s0 = 1.0 - 2.0 * sides.astype(jnp.float32)
        a_s0_l = (ell_w * s0[ell_idx]).sum(axis=1)
        s0_l = jax.lax.dynamic_slice(s0, (r0,), (n_l,))
        sf0_l = jnp.where(g_ids < n_valid, s0_l, 0.0)

        fp = jnp.stack([cut0, cut0]).reshape(1, 2)
        ip = jnp.stack(
            [cap, jnp.asarray(0, jnp.int32), n0, n1]
        ).reshape(1, 4)
        outs = _smega_call(
            ci, cw, oi, ow,
            sf0_l.reshape(R, 128),
            a_s0_l.reshape(R, 128),
            fp, ip,
            n_dev=n_dev,
            n_local=n_l,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=gain_eps,
            interpret=interpret,
        )
        sf_out, log_cut, log_gain, log_a, log_b, sc = outs
        return sf_out, log_cut, log_gain, log_a, log_b, sc

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            P("mp", None), P("mp", None), P("mp"),
            P("mp", None), P("mp", None), P("mp", None), P("mp", None),
            P(), P(), P(), P(), P(),
        ),
        out_specs=(
            P("mp", None),  # sf slices concatenate to the global state
            P(), P(), P(), P(), P(),  # logs/scalars are replicated
        ),
        check_vma=False,
    )
    return jax.jit(sharded)


class SmegaPlan:
    """Prebuilt per-(graph, n_shards, align) smega arrays.

    The column-transpose meta layout is an O(nnz log nnz) host sort and
    the padded ELL is O(n x max_degree); both depend only on the graph
    and the shard count, never on the initial partition.  Production
    flows (multi-start, multi-pass, ILS kicks, benchmarking) build the
    plan once and pass it to every :func:`smega_refine` call — the
    analog of :class:`eig_kl_tpu.kl.megakernel.MegaGraph` for the
    sharded engine.  Device placement is cached per mesh as ONE batched
    ``jax.device_put`` in the shard_map's input shardings (each
    separate transfer through the axon tunnel costs ~1.5 s regardless
    of size; see NOTES.md "Tunnel-latency discovery").
    """

    def __init__(self, g: Graph, n_shards: int, align: int = 1024):
        assert align % 128 == 0
        self.graph = g
        self.n_shards = n_shards
        self.align = align
        n = g.num_nodes
        self.n_pad = _round_up(n, n_shards * align)
        self.ell_idx, self.ell_w, self.deg = _pad_ell(
            g, self.n_pad, np.dtype(np.float32)
        )
        ci, cw, oi, ow = _build_colT(g, self.n_pad, n_shards)
        MR = ci.shape[1]
        OR, OVP = oi.shape[1], oi.shape[2]
        self.ci = ci.reshape(n_shards * MR, 128)
        self.cw = cw.reshape(n_shards * MR, 128)
        self.oi = oi.reshape(n_shards * OR, OVP)
        self.ow = ow.reshape(n_shards * OR, OVP)
        # CSR row ids for the host initial-cut recount and the
        # from-scratch verification oracle (reused across calls).
        self.rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
        self._dev = None
        self._dev_mesh = None

    def device_arrays(self, mesh: Mesh):
        """The seven graph inputs, device-placed in shard_map order."""
        if self._dev is None or self._dev_mesh is not mesh:
            from jax.sharding import NamedSharding

            sh2 = NamedSharding(mesh, P("mp", None))
            sh1 = NamedSharding(mesh, P("mp"))
            self._dev = jax.device_put(
                (
                    self.ell_idx, self.ell_w, self.deg,
                    self.ci, self.cw, self.oi, self.ow,
                ),
                (sh2, sh2, sh1, sh2, sh2, sh2, sh2),
            )
            self._dev_mesh = mesh
        return self._dev


def smega_refine(
    g: Graph,
    sides: np.ndarray,
    mesh: Mesh,
    config: KLConfig = KLConfig(),
    *,
    interpret: bool | None = None,
    align: int = 1024,
    plan: SmegaPlan | None = None,
) -> KLResult:
    """Sharded mega-kernel KL refinement over the mesh's "mp" axis.

    Trajectory-identical to the single-chip engines (same selection
    ties, same float ops in the same per-element order); capacity and
    per-swap selection cost scale with the mesh.

    ``plan`` (a :class:`SmegaPlan`) skips the O(nnz log nnz) host
    build + upload on repeated refinements of the same graph — pass it
    whenever more than one call shares a graph (multi-start, ILS,
    benchmarks).

    ``align`` sets the per-shard node granularity.  Hardware runs keep
    the default 1024 (whole (8, 128)-tiled VMEM state blocks).
    Interpret-mode tests and the driver dryrun pass 128: it shrinks
    every pallas input under ~96 KB/shard, below the PJRT CPU client's
    ~100 KB small-transfer cutoff — larger inputs take the ASYNC
    host-transfer path, which deadlocks under blocking interpret-mode
    callbacks when every client pool thread is running a shard (one
    spare thread per concurrent transfer is needed otherwise; see
    tests/test_smega.py).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert align % 128 == 0
    n = g.num_nodes
    n_shards = mesh.shape["mp"]
    if plan is None:
        plan = SmegaPlan(g, n_shards, align)
    else:
        assert plan.n_shards == n_shards, (
            f"plan built for {plan.n_shards} shards, mesh has {n_shards}"
        )
        assert plan.graph is g or plan.graph.num_nodes == n
    # Each shard's slice is whole (*, 128) rows.
    n_pad = plan.n_pad

    sides = np.asarray(sides, dtype=np.int8)
    sides_pad = np.zeros(n_pad, dtype=np.int8)
    sides_pad[:n] = sides
    n1 = int(sides.astype(np.int64).sum())
    natural_cap = min(n - n1, n1)
    true_cap = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )
    max_iters = min(
        _round_up(max(true_cap, 1), 4096), max(natural_cap, 1)
    )

    fn = _build_smega(
        mesh,
        n_valid=n,
        max_iters=max_iters,
        gain_eps=config.gain_eps,
        terminate_limit=config.terminate_limit(n),
        interpret=interpret,
    )
    # Initial cut on host (f64 recount, exact to f32 for the dyadic
    # parity weights) — the smega program carries NO XLA collectives.
    s0 = 1.0 - 2.0 * sides.astype(np.float64)
    s_as0 = float(
        (g.data.astype(np.float64) * s0[plan.rows] * s0[g.indices]).sum()
    )
    cut0 = np.float32(0.25 * (float(g.weighted_degrees.sum()) - s_as0))
    sf_out, log_cut, log_gain, log_a, log_b, sc = jax.device_get(
        fn(
            *plan.device_arrays(mesh),
            jnp.asarray(sides_pad),
            jnp.asarray(cut0, jnp.float32),
            jnp.asarray(n - n1, jnp.int32),
            jnp.asarray(n1, jnp.int32),
            jnp.asarray(true_cap, jnp.int32),
        )
    )
    iterations = int(sc[2, 0])
    lc = np.array(log_cut).reshape(-1)
    lg = np.array(log_gain).reshape(-1)
    la = np.array(log_a).reshape(-1)
    lb = np.array(log_b).reshape(-1)
    fin_sides = replay_swaps(sides_pad, la, lb, iterations)
    best_it = best_iteration(lc, iterations)
    best_sides = replay_swaps(sides_pad, la, lb, best_it)
    # From-scratch verification oracle (gKL.cu:524-530): host f64
    # recount of the final partition over the CSR entries.
    s_fin = 1.0 - 2.0 * fin_sides[:n].astype(np.float64)
    s_as = float(
        (g.data.astype(np.float64) * s_fin[plan.rows] * s_fin[g.indices]).sum()
    )
    verified = 0.25 * (float(g.weighted_degrees.sum()) - s_as)
    return KLResult(
        sides=fin_sides[:n],
        best_sides=best_sides[:n],
        initial_cut=float(sc[6, 0]),
        final_cut=float(sc[0, 0]),
        best_cut=float(sc[1, 0]),
        verified_cut=verified,
        iterations=iterations,
        cut_trajectory=lc[: iterations + 1],
        gain_trajectory=lg[: iterations + 1],
    )

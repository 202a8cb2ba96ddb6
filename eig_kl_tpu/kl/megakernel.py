"""Single-kernel (Pallas) KL refinement engine.

The XLA engine (:mod:`eig_kl_tpu.kl.engine`) runs the swap loop as a
``lax.while_loop`` whose body is ~20 XLA ops; on TPU every
dynamically-indexed op in that body (two ELL-row gathers, two 40-element
scatter-adds, log writes) costs ~100 us of scalar-loop time, putting a
swap at ~380 us.  This module instead compiles the *entire* refinement
-- selection, swap, incremental update, logging, termination -- into ONE
Pallas kernel where:

* the whole per-node state is TWO (R, 128) f32 VMEM arrays -- sf =
  sign * free (selection + the chosen nodes' signs) and the cached
  ``A @ s`` -- 8 bytes/node against the v5e's 16 MiB VMEM stack
  budget.  Measured fit boundary (benchmarks/diag_vmem_ceiling.py
  --fast, 2026-08-20): the kernel compiles AND runs at 2,078,720
  nodes (state 15.86 MB) and Mosaic refuses at 2,088,960 ("Ran out
  of memory in memory space vmem", state 15.94 MB + ~0.14 MB of
  row-max caches/log staging).  Beyond that, the sharded mega-kernel
  (parallel/smega.py) scales capacity with mesh size.  The final/best
  partitions are replayed from the swap log on device;
* node selection is two masked max-reductions plus an index-recovery
  min-reduction (first-max tie-breaking, matching ``jnp.argmax`` and the
  reference's strict ``>`` scans, cKL.cpp:341-347);
* the two chosen ELL rows are DMA'd HBM -> SMEM (~70 ns each) and the
  O(degree) scatter into ``A @ s`` is a loop of single-lane row
  read-modify-writes in VMEM (~35 ns each), bounded by the *actual*
  degree (column 0 of the index row carries it);
* scalars (cut, termination counter, iteration) are while-loop carries.

Per-swap cost is a few microseconds -- ~100x the XLA engine, ~500x the
reference gKL host loop (gKL.cu:453-519), whose per-swap H2D/D2H
round-trips this design removes entirely.

Reference semantics preserved: swap-gain ``D_a + D_b - 2 w_ab``
(cKL.cpp:360), terminate after ``floor(log2 n) + 5`` consecutive
non-improving swaps (cKL.cpp:303,382-386), min-cut tracked but not
rolled back on device (cKL.cpp:363; the best partition is replayed on
host from the swap log like :func:`eig_kl_tpu.kl.engine.replay_swaps`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.kl.engine import KLResult, best_iteration, replay_swaps
from eig_kl_tpu.ops.spmv_pallas import SpmvPlan, spmv_pallas
from eig_kl_tpu.utils.config import KLConfig

_NEG = -3.0e38  # "minus infinity" mask for max-reductions (plain float)

# Above this padded-node count, per-swap selection switches from a full
# masked scan to the hierarchical per-row max cache.  Measured crossover
# (bench_selection.py, fused cache maintenance): flat wins at <=100K
# nodes (5.8 vs 6.0 us/swap), hier wins at 200K (5.2 vs 6.6) and is
# mandatory above ~512K, where the flat scan's loop-body temporaries no
# longer fit VMEM.
HIER_THRESHOLD = 1 << 17


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class MegaGraph:
    """Device arrays prepared for the mega-kernel.

    Attributes:
      meta_indices: int32[n, W] -- column 0 is the node's true degree,
        columns 1..deg are neighbor ids, the rest padding.
      meta_weights: float32[n, W] -- column 0 unused (0), columns
        1..deg the matching edge weights.  W is a multiple of 128.
      num_nodes: true node count n (rows are not padded; only selected
        rows are ever DMA'd).
      padded_nodes: n rounded up to a multiple of 1024 (the (R, 128)
        state shape).
    """

    def __init__(
        self,
        graph: Graph,
        plan: SpmvPlan | None = None,
        device_graph=None,
    ):
        n = graph.num_nodes
        deg = jnp.asarray(graph.degrees.astype(np.int32))
        n8 = _round_up(n, 8)  # row DMAs read aligned 8-row blocks
        if device_graph is not None:
            # Derive the meta rows on device from the already-uploaded
            # ELL arrays -- host->device bandwidth is the scarce
            # resource, not device compute.
            ell_idx = device_graph.ell_indices
            ell_w = device_graph.ell_weights.astype(jnp.float32)
            w = ell_idx.shape[1]
            wp = _round_up(w + 1, 128)  # DMA slices must be 128-lane aligned
            pad = wp - 1 - w
            self.meta_indices = jnp.pad(
                jnp.concatenate([deg[:, None], ell_idx], axis=1),
                ((0, n8 - n), (0, pad)),
            )
            self.meta_weights = jnp.pad(
                jnp.concatenate(
                    [jnp.zeros((n, 1), jnp.float32), ell_w], axis=1
                ),
                ((0, n8 - n), (0, pad)),
            )
            self.weighted_degrees = device_graph.degrees.astype(jnp.float32)
        else:
            ell_idx, ell_w = graph.to_ell(pad_multiple=1)
            w = ell_idx.shape[1]
            wp = _round_up(w + 1, 128)
            meta_idx = np.zeros((n8, wp), dtype=np.int32)
            meta_w = np.zeros((n8, wp), dtype=np.float32)
            meta_idx[:n, 0] = np.asarray(deg)
            meta_idx[:n, 1 : w + 1] = ell_idx
            meta_w[:n, 1 : w + 1] = ell_w
            self.meta_indices = jnp.asarray(meta_idx)
            self.meta_weights = jnp.asarray(meta_w)
            self.weighted_degrees = jnp.asarray(
                graph.weighted_degrees, dtype=jnp.float32
            )
        self.num_nodes = n
        self.padded_nodes = _round_up(n, 1024)
        # Chunk-planned SpMV for the initial A@s / cut and the final
        # from-scratch verification (avoids XLA's scalar-loop gather).
        if plan is None:
            from eig_kl_tpu.ops.spmv_pallas import plan_for_graph

            plan = plan_for_graph(graph)
        self.spmv_plan = plan

    @property
    def row_width(self) -> int:
        return self.meta_indices.shape[1]


def _kernel(
    idx_hbm,
    w_hbm,
    sf0_ref,
    as0_ref,
    fp_ref,
    ip_ref,
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
    ia_ref,
    ib_ref,
    wa_ref,
    wb_ref,
    stc_ref,
    stg_ref,
    sta_ref,
    stb_ref,
    rml_ref,
    rmr_ref,
    sems,
    *,
    num_nodes: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    hierarchical: bool,
    batched: bool = False,
):
    R = sf_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    big_i = jnp.int32(R * 128)

    # The ENTIRE per-node state is two (R, 128) f32 arrays:
    #   sf  = side-sign * free  (0 = locked/padding, else +-1) -- the
    #         only thing selection reads besides a_s, and the sign
    #         source for the chosen nodes (they are free by
    #         construction, so sf IS their sign);
    #   a_s = cached A @ s (scratch; re-derivable, never written back).
    # There is NO separate signs array: final and best partitions are
    # both replayed from the swap log on device (_finalize_batch), so
    # the kernel's VMEM budget is 8 bytes/node -- ~2M nodes/chip.
    # Both state arrays are VMEM scratch filled by explicit DMA from
    # HBM (and sf written back out the same way); in batched
    # (multi-start) mode each grid step DMAs its own (R, 128) stripe.
    # Round-2 instead pipelined per-start state as VMEM input blocks
    # PLUS output blocks, which doubled the footprint and capped the
    # batched path at 1M padded nodes -- manual DMA keeps the budget
    # identical to single-start (~2.08M nodes/chip measured) for any S.
    if batched:
        i = pl.program_id(0)
        cp_f = pltpu.make_async_copy(
            sf0_ref.at[pl.ds(i * R, R), :], sf_ref, sems.at[0]
        )
        cp_a = pltpu.make_async_copy(
            as0_ref.at[pl.ds(i * R, R), :], as_ref, sems.at[1]
        )
    else:
        cp_f = pltpu.make_async_copy(sf0_ref, sf_ref, sems.at[0])
        cp_a = pltpu.make_async_copy(as0_ref, as_ref, sems.at[1])
    cp_f.start()
    cp_a.start()
    cp_f.wait()
    cp_a.wait()
    # The trajectory logs live in HBM (they are write-only and can be
    # half the VMEM budget at 1M nodes); each swap writes into small
    # (8, 128) VMEM staging buffers that are DMA'd out as a block every
    # 1024 swaps.  Entries past the final iteration are stale staging
    # content -- every consumer masks by the iteration count.
    stc_ref[:] = jnp.zeros_like(stc_ref)
    stg_ref[:] = jnp.zeros_like(stg_ref)
    sta_ref[:] = jnp.zeros_like(sta_ref)
    stb_ref[:] = jnp.zeros_like(stb_ref)
    if batched:
        log_off = i * (log_cut_ref.shape[0] // pl.num_programs(0))
    else:
        log_off = 0

    def flush_logs(blk):
        base = log_off + blk * 8
        cps = [
            pltpu.make_async_copy(
                st, hbm.at[pl.ds(base, 8), :], sems.at[4 + k]
            )
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

    # Scalar params: in batched mode the whole (2, S) SMEM array is
    # visible (Mosaic rejects sub-(8,128) SMEM blocks) and each grid
    # step reads its own column.
    if batched:
        cut0 = fp_ref[0, i]
        best0 = fp_ref[1, i]
        cap0 = ip_ref[0, i]
        term0 = ip_ref[1, i]
    else:
        cut0 = fp_ref[0, 0]
        best0 = fp_ref[0, 1]
        cap0 = ip_ref[0, 0]
        term0 = ip_ref[0, 1]
    row0 = stc_ref[pl.ds(0, 1), :]
    stc_ref[pl.ds(0, 1), :] = jnp.where(lane == 0, cut0, row0)

    # Hierarchical selection state: cached per-row masked maxima of the
    # D values, one f32 per (R,128)-row per side, laid out flat so each
    # swap's argmax scans n/128 values instead of n.  Rows are
    # recomputed whenever their s/a_s/free entries change.
    if hierarchical:
        rml_ref[:] = jnp.full_like(rml_ref, _NEG)
        rmr_ref[:] = jnp.full_like(rmr_ref, _NEG)

    def scalar_at(ref, q, l):
        row = ref[pl.ds(q, 1), :]
        return jnp.sum(jnp.where(lane == l, row, 0.0))

    def rmw_add(ref, q, l, delta):
        row = ref[pl.ds(q, 1), :]
        ref[pl.ds(q, 1), :] = row + jnp.where(lane == l, delta, 0.0)

    def rmw_set(ref, q, l, value):
        row = ref[pl.ds(q, 1), :]
        ref[pl.ds(q, 1), :] = jnp.where(lane == l, value, row)

    def cache_row(q, sfrow, arow):
        """Recompute the hierarchical per-row max cache entry for row q
        from already-loaded sf/a_s rows."""
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

        def init_rows(q, _):
            row_maxes(q)
            return 0

        lax.fori_loop(0, R, init_rows, 0)

    r8 = rml_ref.shape[0]
    flat_r = jax.lax.broadcasted_iota(jnp.int32, (r8, 128), 0) * 128 + (
        jax.lax.broadcasted_iota(jnp.int32, (r8, 128), 1)
    )
    big_r = jnp.int32(r8 * 128)

    def select(rm_ref, sign_is_left):
        m = jnp.max(rm_ref[:])
        q = jnp.min(jnp.where(rm_ref[:] == m, flat_r, big_r))
        sfrow = sf_ref[pl.ds(q, 1), :]
        arow = as_ref[pl.ds(q, 1), :]
        d = -(sfrow * arow)
        if sign_is_left:
            dm = jnp.where(sfrow > 0, d, _NEG)
        else:
            dm = jnp.where(sfrow < 0, d, _NEG)
        l = jnp.min(jnp.where(dm == m, lane, jnp.int32(128)))
        return q * 128 + l, m

    def cond(carry):
        it, cut, comp, best_cut, term, nf0, nf1, stop = carry
        return (stop == 0) & (it < cap0) & (nf0 > 0) & (nf1 > 0)

    def body(carry):
        it, cut, comp, best_cut, term, nf0, nf1, stop = carry
        if hierarchical:
            # Hierarchical first-max selection (same tie-breaking as a
            # flat first-max scan: first row holding the global max,
            # then the first lane within it -- row-major order).
            a, m_l = select(rml_ref, True)
            b, m_r = select(rmr_ref, False)
        else:
            sf = sf_ref[:]
            a_s = as_ref[:]
            d = -(sf * a_s)
            flat = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128 + (
                jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
            )
            dl = jnp.where(sf > 0, d, _NEG)
            dr = jnp.where(sf < 0, d, _NEG)
            m_l = jnp.max(dl)
            m_r = jnp.max(dr)
            # First-max index recovery (jnp.argmax / cKL.cpp:341-347).
            a = jnp.min(jnp.where(dl == m_l, flat, big_i))
            b = jnp.min(jnp.where(dr == m_r, flat, big_i))

        # Fetch both adjacency rows: indices+degree to SMEM for the
        # scalar loop, weights to SMEM alongside.  HBM arrays with
        # W > 128 lanes are (8,128)-tiled, so single-row slices are
        # rejected by Mosaic -- DMA the aligned 8-row block and select
        # the wanted row with a scalar index.
        blk_a = (a // 8) * 8
        blk_b = (b // 8) * 8
        ra = a % 8
        rb = b % 8
        cp0 = pltpu.make_async_copy(idx_hbm.at[pl.ds(blk_a, 8), :], ia_ref, sems.at[0])
        cp1 = pltpu.make_async_copy(idx_hbm.at[pl.ds(blk_b, 8), :], ib_ref, sems.at[1])
        cp2 = pltpu.make_async_copy(w_hbm.at[pl.ds(blk_a, 8), :], wa_ref, sems.at[2])
        cp3 = pltpu.make_async_copy(w_hbm.at[pl.ds(blk_b, 8), :], wb_ref, sems.at[3])
        cp0.start()
        cp1.start()
        cp2.start()
        cp3.start()

        q_a, l_a = a // 128, a % 128
        q_b, l_b = b // 128, b % 128
        # Chosen nodes are free, so sf carries their exact sign.
        s_a = scalar_at(sf_ref, q_a, l_a)
        s_b = scalar_at(sf_ref, q_b, l_b)

        cp0.wait()
        cp1.wait()
        cp2.wait()
        cp3.wait()

        deg_a = ia_ref[ra, 0]
        deg_b = ib_ref[rb, 0]

        # Scatter side a's row into A@s (flip contribution -2*s_a*w per
        # neighbor) while accumulating w_ab for the swap gain.  The a_s
        # row is loaded once per neighbor and reused for the fused
        # hierarchical cache refresh.
        coef_a = -2.0 * s_a

        def touch(j, delta):
            q = j // 128
            arow = as_ref[pl.ds(q, 1), :] + jnp.where(
                lane == j % 128, delta, 0.0
            )
            as_ref[pl.ds(q, 1), :] = arow
            if hierarchical:
                cache_row(q, sf_ref[pl.ds(q, 1), :], arow)

        def loop_a(k, wab):
            j = ia_ref[ra, k]
            w = wa_ref[ra, k]
            touch(j, coef_a * w)
            return wab + jnp.where(j == b, w, 0.0)

        w_ab = lax.fori_loop(1, deg_a + 1, loop_a, jnp.float32(0.0))

        coef_b = -2.0 * s_b

        def loop_b(k, _):
            j = ib_ref[rb, k]
            touch(j, coef_b * wb_ref[rb, k])
            return 0

        lax.fori_loop(1, deg_b + 1, loop_b, 0)

        # Flip and lock both nodes: sf -> 0 covers side, lock, and
        # (via the swap log) the eventual replayed partitions.
        rmw_set(sf_ref, q_a, l_a, 0.0)
        rmw_set(sf_ref, q_b, l_b, 0.0)
        row_maxes(q_a)
        row_maxes(q_b)

        gain = m_l + m_r - 2.0 * w_ab
        # Kahan-compensated cut accumulation (gKL.cu:384-414 keeps a
        # compensated sum for the same reason).
        y = -gain - comp
        t = cut + y
        comp2 = (t - cut) - y
        cut2 = t
        best2 = jnp.minimum(cut2, best_cut)
        it2 = it + 1
        srow = it2 % 1024
        rmw_set(stc_ref, srow // 128, srow % 128, cut2)
        rmw_set(stg_ref, srow // 128, srow % 128, gain)
        # int32 logs: rmw_set with where on int rows.
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

    def count_free(b, acc):
        sfb = sf_ref[pl.ds(b * 8, 8), :]
        n0 = jnp.sum((sfb > 0).astype(jnp.int32)).astype(jnp.int32)
        n1 = jnp.sum((sfb < 0).astype(jnp.int32)).astype(jnp.int32)
        return (acc[0] + n0, acc[1] + n1)

    nf0, nf1 = lax.fori_loop(
        0, R // 8, count_free, (jnp.int32(0), jnp.int32(0))
    )
    init = (
        jnp.int32(0),
        cut0,
        jnp.float32(0.0),
        jnp.minimum(cut0, best0),
        term0,
        nf0,
        nf1,
        jnp.int32(0),
    )
    it, cut, _comp, best_cut, term, nf0, nf1, stop = lax.while_loop(
        cond, body, init
    )
    # Flush the final (possibly partial) staging block; if the loop
    # ended exactly on a block boundary this rewrites identical data.
    flush_logs(it // 1024)

    # Write the final sf state back to its HBM stripe.
    if batched:
        cp_out = pltpu.make_async_copy(
            sf_ref, sfout_ref.at[pl.ds(i * R, R), :], sems.at[0]
        )
    else:
        cp_out = pltpu.make_async_copy(sf_ref, sfout_ref, sems.at[0])
    cp_out.start()
    cp_out.wait()

    col = i if batched else 0
    out_ref[0, col] = cut
    out_ref[1, col] = best_cut
    out_ref[2, col] = it.astype(jnp.float32)
    out_ref[3, col] = term.astype(jnp.float32)
    out_ref[4, col] = nf0.astype(jnp.float32)
    out_ref[5, col] = nf1.astype(jnp.float32)
    out_ref[6, col] = cut0
    out_ref[7, col] = stop.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_nodes",
        "max_iters",
        "terminate_limit",
        "gain_eps",
        "interpret",
    ),
)
def _run(
    meta_idx,
    meta_w,
    sf0,
    as0,
    fparams,
    iparams,
    *,
    num_nodes: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    interpret: bool = False,
):
    P = sf0.shape[0] * 128
    R = P // 128
    W = meta_idx.shape[1]
    # Log length in whole 1024-entry staging blocks (8 rows each).
    ml = _round_up(max_iters + 1, 1024)
    MLR = ml // 128
    kernel = functools.partial(
        _kernel,
        num_nodes=num_nodes,
        max_iters=max_iters,
        terminate_limit=terminate_limit,
        gain_eps=gain_eps,
        # Full-scan selection is faster below ~1M nodes (the per-swap
        # cache maintenance costs more than the O(n) scan saves); the
        # hierarchical row-max cache wins beyond that.
        hierarchical=P > HIER_THRESHOLD,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, 128), jnp.float32),  # sf = s * free
            jax.ShapeDtypeStruct((MLR, 128), jnp.float32),  # log_cut
            jax.ShapeDtypeStruct((MLR, 128), jnp.float32),  # log_gain
            jax.ShapeDtypeStruct((MLR, 128), jnp.int32),  # log_a
            jax.ShapeDtypeStruct((MLR, 128), jnp.int32),  # log_b
            jax.ShapeDtypeStruct((8, 1), jnp.float32),  # scalars
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idx rows stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # weight rows stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # sf0: DMA'd into state
            pl.BlockSpec(memory_space=pl.ANY),  # a_s0: DMA'd into scratch
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),  # [cut0, best0]
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),  # [cap, term0]
        ],
        out_specs=(
            # Final sf pinned to HBM and written by one DMA at the end;
            # a VMEM output would be a third (R, 128) resident array
            # and cut the per-chip node ceiling by a third.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            # Trajectory logs pinned to HBM (ANY would let Mosaic put
            # them back in VMEM), written through (8, 128) VMEM staging
            # blocks (see _kernel.flush_logs): at 1M nodes VMEM-resident
            # logs would be ~8 MB of the 16 MB budget.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((8, 1), memory_space=pltpu.SMEM),
        ),
        # sf0/as0 live in HBM and are DMA'd into the state once (VMEM
        # inputs would double-count against the 16 MB budget).
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),  # sf state (scratch)
            pltpu.VMEM((R, 128), jnp.float32),  # a_s state (scratch)
            pltpu.SMEM((8, W), jnp.int32),
            pltpu.SMEM((8, W), jnp.int32),
            pltpu.SMEM((8, W), jnp.float32),
            pltpu.SMEM((8, W), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),  # log_cut staging
            pltpu.VMEM((8, 128), jnp.float32),  # log_gain staging
            pltpu.VMEM((8, 128), jnp.int32),  # log_a staging
            pltpu.VMEM((8, 128), jnp.int32),  # log_b staging
            pltpu.VMEM((_round_up(P // 128, 128) // 128, 128), jnp.float32),
            pltpu.VMEM((_round_up(P // 128, 128) // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(meta_idx, meta_w, sf0, as0, fparams, iparams)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_nodes",
        "max_iters",
        "terminate_limit",
        "gain_eps",
        "interpret",
    ),
)
def _run_batched(
    meta_idx,
    meta_w,
    sf0,      # (S, R, 128)
    as0,
    fparams,  # (2, S): [cut0; best0]
    iparams,  # (2, S): [cap; term0]
    *,
    num_nodes: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    interpret: bool = False,
):
    """Multi-start form: grid over the start axis; each grid step DMAs
    its own (R, 128) state stripe from HBM into the shared VMEM scratch
    (the VMEM budget is one start regardless of S, identical to the
    single-start path -- ~2.08M nodes/chip measured).  The stacked state/log
    arrays travel flattened to (S*R, 128) / (S*MLR, 128) so every DMA
    slice is a plain 2D (rows, 128) region."""
    S, R = sf0.shape[0], sf0.shape[1]
    P = R * 128
    # Grid-blocked (rows, 128) tiles need rows % 8 == 0 (Mosaic block
    # granularity) whenever S > 1, so the log length rounds to 1024
    # lanes (8 rows) rather than the single-start path's 128.
    ml = _round_up(max_iters + 1, 1024)
    MLR = ml // 128
    kernel = functools.partial(
        _kernel,
        num_nodes=num_nodes,
        max_iters=max_iters,
        terminate_limit=terminate_limit,
        gain_eps=gain_eps,
        hierarchical=P > HIER_THRESHOLD,
        batched=True,
    )
    sf_out, lc, lg, la, lb, sc = pl.pallas_call(
        kernel,
        grid=(S,),
        out_shape=(
            jax.ShapeDtypeStruct((S * R, 128), jnp.float32),  # sf = s * free
            jax.ShapeDtypeStruct((S * MLR, 128), jnp.float32),  # log_cut
            jax.ShapeDtypeStruct((S * MLR, 128), jnp.float32),  # log_gain
            jax.ShapeDtypeStruct((S * MLR, 128), jnp.int32),  # log_a
            jax.ShapeDtypeStruct((S * MLR, 128), jnp.int32),  # log_b
            jax.ShapeDtypeStruct((8, S), jnp.float32),  # scalars
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # idx rows stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # weight rows stay in HBM
            # Per-start state stays in HBM; each grid step DMAs its own
            # (R, 128) stripe (pipelined VMEM blocks would double the
            # footprint and cap the batch path at ~1M padded nodes).
            pl.BlockSpec(memory_space=pl.ANY),  # sf0
            pl.BlockSpec(memory_space=pl.ANY),  # a_s0
            # Scalar params travel as whole (2, S) SMEM arrays; Mosaic
            # rejects SMEM blocks smaller than the array unless the
            # trailing dims are (8, 128)-aligned, so each grid step
            # reads its own column instead of getting a (1, 2) block.
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            # Final sf stripes in HBM, written by one DMA per grid step.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            # Logs pinned to HBM, staged through (8, 128) VMEM blocks;
            # each grid step writes its own MLR-row stripe via program_id.
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),  # sf state (scratch)
            pltpu.VMEM((R, 128), jnp.float32),  # a_s state (scratch)
            pltpu.SMEM((8, meta_idx.shape[1]), jnp.int32),
            pltpu.SMEM((8, meta_idx.shape[1]), jnp.int32),
            pltpu.SMEM((8, meta_idx.shape[1]), jnp.float32),
            pltpu.SMEM((8, meta_idx.shape[1]), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),  # log_cut staging
            pltpu.VMEM((8, 128), jnp.float32),  # log_gain staging
            pltpu.VMEM((8, 128), jnp.int32),  # log_a staging
            pltpu.VMEM((8, 128), jnp.int32),  # log_b staging
            pltpu.VMEM((_round_up(R, 128) // 128, 128), jnp.float32),
            pltpu.VMEM((_round_up(R, 128) // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(
        meta_idx,
        meta_w,
        sf0.reshape(S * R, 128),
        as0.reshape(S * R, 128),
        fparams,
        iparams,
    )
    return (
        sf_out.reshape(S, R, 128),
        lc.reshape(S, MLR, 128),
        lg.reshape(S, MLR, 128),
        la.reshape(S, MLR, 128),
        lb.reshape(S, MLR, 128),
        sc,
    )


@functools.partial(jax.jit, static_argnames=("n", "P", "interp"))
def _finalize_batch(
    plan, wsum, sf0_dev, log_cut, log_a, log_b, scalars, *, n, P, interp
):
    """Device-side result post-processing for a (possibly S=1) stack of
    runs: from-scratch cut verification (the gKL.cu:524-530 oracle),
    first-argmin best iteration, and BOTH the final and best partitions
    replayed by masked scatter from the swap log (the kernel keeps no
    signs array -- sf zeroes on lock -- so the log is the authoritative
    record; each node swaps at most once, making the scatter
    order-free).  Packing all of this on device lets the host retrieve
    a whole KLResult in ONE device_get -- the tunnel charges ~30 ms per
    transfer call, which at 200K nodes was ~45% of refinement wall time
    when the logs, states, and verification came back as separate
    fetches."""

    def one(args):
        sf0, lc, la, lb, sc = args
        it = sc[2].astype(jnp.int32)
        lcf = lc.reshape(-1)
        iota = jnp.arange(lcf.shape[0], dtype=jnp.int32)
        # First minimum over the valid trajectory prefix (engine.best_iteration).
        best_it = jnp.argmin(jnp.where(iota <= it, lcf, jnp.inf)).astype(
            jnp.int32
        )
        sides0 = jnp.concatenate(
            [
                (sf0.reshape(-1)[:n] < 0).astype(jnp.int8),
                jnp.zeros(1, jnp.int8),  # dropped-pad sentinel row
            ]
        )
        laf = la.reshape(-1)
        lbf = lb.reshape(-1)

        def replay(upto):
            # Swaps 1..upto: side(a) -> 1, side(b) -> 0 (engine.replay_swaps).
            valid = (iota >= 1) & (iota <= upto)
            ia = jnp.where(valid, laf, n)
            ib = jnp.where(valid, lbf, n)
            return sides0.at[ia].set(1).at[ib].set(0)[:n]

        bs = replay(best_it)
        fs = replay(it)
        s_fin = 1.0 - 2.0 * fs.astype(jnp.float32)
        a_s_v = spmv_pallas(plan, s_fin, interpret=interp)
        verified = (0.25 * (wsum - jnp.vdot(s_fin, a_s_v))).astype(jnp.float32)
        return verified, best_it, bs, fs

    return jax.lax.map(
        one, (sf0_dev, log_cut, log_a, log_b, scalars.T)
    )


@functools.partial(jax.jit, static_argnames=("n", "P", "interp"))
def _batch_init(plan, wsum, s_dev, *, n, P, interp):
    """Batched ``A @ s`` + cut for a (S, R, 128) stack of sign states
    via the chunk-planned SpMV (used for both the initial gains and the
    final from-scratch cut verification of every start)."""
    R = P // 128

    def one(s2d):
        s_flat = s2d.reshape(-1)[:n]
        a_s_n = spmv_pallas(plan, s_flat, interpret=interp)
        a2d = jnp.zeros(P, jnp.float32).at[:n].set(a_s_n).reshape(R, 128)
        cut = 0.25 * (wsum - jnp.vdot(s_flat, a_s_n)).astype(jnp.float32)
        return a2d, cut

    return jax.lax.map(one, s_dev)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_nodes",
        "P",
        "max_iters",
        "terminate_limit",
        "gain_eps",
        "interpret",
        "batched",
    ),
)
def _mega_full(
    plan,
    wsum,
    meta_idx,
    meta_w,
    sf_dev,   # (S, R, 128)
    caps,     # int32[S]
    *,
    num_nodes: int,
    P: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    interpret: bool,
    batched: bool,
):
    """Initial ``A @ s``/cut + the refinement kernel + device-side
    finalization as ONE jitted program.

    The split form (``_batch_init`` -> ``_run``/``_run_batched`` ->
    ``_finalize_batch``) costs three distinct executables per process —
    on the axon plugin three *remote* compiles at first execution, the
    dominant cold-start term (VERDICT r3 next #2; the reference
    compiles nothing at run time, Makefile:52-71).  Tracing the inner
    jits inline here compiles the whole refinement as one program with
    identical numerics; the split entry points remain for the
    refresh-interval path, which must interleave host replay."""
    S = sf_dev.shape[0]
    a_s, cut0 = _batch_init(
        plan, wsum, sf_dev, n=num_nodes, P=P, interp=interpret
    )
    fparams = jnp.stack([cut0, cut0], axis=0)
    iparams = jnp.stack([caps, jnp.zeros_like(caps)], axis=0)
    if batched:
        _sf, log_cut, log_gain, log_a, log_b, scalars = _run_batched(
            meta_idx,
            meta_w,
            sf_dev,
            a_s,
            fparams,
            iparams,
            num_nodes=num_nodes,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=gain_eps,
            interpret=interpret,
        )
        lc3, la3, lb3 = (
            x.reshape(S, -1, 128) for x in (log_cut, log_a, log_b)
        )
    else:
        _sf, log_cut, log_gain, log_a, log_b, scalars = _run(
            meta_idx,
            meta_w,
            sf_dev[0],
            a_s[0],
            fparams.T,
            iparams.T,
            num_nodes=num_nodes,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=gain_eps,
            interpret=interpret,
        )
        lc3, la3, lb3 = log_cut[None], log_a[None], log_b[None]
    ver, _best_it, best_sides, fin_sides = _finalize_batch(
        plan,
        wsum,
        sf_dev,
        lc3,
        la3,
        lb3,
        scalars,
        n=num_nodes,
        P=P,
        interp=interpret,
    )
    return scalars, lc3, log_gain.reshape(S, -1), ver, best_sides, fin_sides


_FUSED_STATICS = (
    "num_nodes",
    "P",
    "max_iters",
    "terminate_limit",
    "gain_eps",
    "interpret",
    "shift",
    "tolerance",
    "min_spec_iters",
    "max_spec_iters",
    "seed",
    "sdtype",
    "convergence",
    "check_interval",
    "stable_checks",
    "inter_dtype",
    "cap_limit",
    "return_values",
)


@functools.partial(jax.jit, static_argnames=_FUSED_STATICS)
def _fused_full(
    g_dev,
    plan,
    wsum,
    meta_idx,
    meta_w,
    *,
    num_nodes: int,
    P: int,
    max_iters: int,
    terminate_limit: int,
    gain_eps: float,
    interpret: bool,
    shift: float,
    tolerance: float,
    min_spec_iters: int,
    max_spec_iters: int,
    seed: int,
    sdtype: str,
    convergence: str,
    check_interval: int,
    stable_checks: int,
    inter_dtype: str,
    cap_limit: int | None,
    return_values: bool,
):
    """The ENTIRE gKL2 pipeline — power-iteration spectral solve,
    "upper"-median split, initial ``A @ s``/cut, the refinement
    mega-kernel, and device-side finalization — as ONE jitted program
    with ONE host fetch.

    The split form (packed spectral program + sides fetch + `_mega_full`
    dispatch + result fetch) pays two extra tunnel round-trips per run
    (~40 ms measured at 200K: solve 125.8 ms sync vs a 78.4 ms component
    model, diag_spectral_breakdown) and one extra remote compile per
    process.  Numerics are identical: `_power_core_impl` gets the same
    arguments as the packed path and the mega engine receives the same
    median split it would have read back.  Reference analog: gKL2 runs
    eigensolve and refinement in one process with no host hop between
    them (gKL2.cu:989-1033)."""
    from eig_kl_tpu.ops.select import upper_median
    from eig_kl_tpu.spectral.power import _power_core_impl

    n = num_nodes
    lam, v, spec_iters = _power_core_impl(
        g_dev,
        shift,
        tolerance,
        min_spec_iters,
        max_spec_iters,
        seed,
        sdtype,
        convergence=convergence,
        check_interval=check_interval,
        stable_checks=stable_checks,
        inter_dtype=inter_dtype,
    )
    med = upper_median(v, n)
    spec_sides = med > v  # bool[n]; gKL2.cu:403-414 split semantics
    s_sign = 1.0 - 2.0 * spec_sides.astype(jnp.float32)
    R = P // 128
    sf_dev = jnp.zeros(P, jnp.float32).at[:n].set(s_sign).reshape(1, R, 128)
    n1 = jnp.sum(spec_sides).astype(jnp.int32)
    natural = jnp.minimum(n1, n - n1)
    cap = (
        natural
        if cap_limit is None
        else jnp.minimum(jnp.int32(cap_limit), natural)
    )
    scalars, lc3, lg, ver, best_sides, fin_sides = _mega_full(
        plan,
        wsum,
        meta_idx,
        meta_w,
        sf_dev,
        cap[None],
        num_nodes=n,
        P=P,
        max_iters=max_iters,
        terminate_limit=terminate_limit,
        gain_eps=gain_eps,
        interpret=interpret,
        batched=False,
    )
    spec_extras = jnp.stack(
        [lam.astype(jnp.float32), med.astype(jnp.float32),
         spec_iters.astype(jnp.float32)]
    )
    values = v if return_values else jnp.zeros(0, v.dtype)
    return (
        scalars,
        lc3,
        lg,
        ver,
        best_sides,
        fin_sides,
        spec_extras,
        spec_sides.astype(jnp.int8),
        values,
    )


def fused_refine_mega(
    mg: MegaGraph,
    g_dev,
    spectral_config,
    config: KLConfig = KLConfig(),
    *,
    interpret: bool | None = None,
    return_values: bool = True,
):
    """Single-program fused pipeline: returns ``(EigResult, KLResult)``.

    Eligibility is the caller's job (power solver, f32, single start,
    no refresh/passes/kicks); :func:`eig_kl_tpu.models.pipelines.
    fused_partition` routes here when it applies.  ``return_values``
    False drops the Fiedler vector from the single fetch (7.3 MB at
    1.8M nodes ≈ the whole fetch budget) — EigResult.values comes back
    empty."""
    from eig_kl_tpu.io.eigfile import EigResult
    from eig_kl_tpu.spectral import power as _powmod

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = mg.num_nodes
    P = mg.padded_nodes
    # The split path sizes log buffers from the host-known split; here
    # the split is device-computed, so size for the worst case — the
    # median split's natural cap min(n1, n-n1) never exceeds n//2.
    static_cap = (
        n // 2
        if config.max_iterations is None
        else min(config.max_iterations, n // 2)
    )
    max_iters = min(
        _round_up(max(static_cap, 1), 4096), max(n // 2, 1)
    )
    convergence = spectral_config.convergence
    if convergence == "auto":
        convergence = "sign"  # f32 path (power.py auto rule)
    wsum = mg.weighted_degrees.sum()
    out = _fused_full(
        g_dev,
        mg.spmv_plan,
        wsum,
        mg.meta_indices,
        mg.meta_weights,
        num_nodes=n,
        P=P,
        max_iters=max_iters,
        terminate_limit=config.terminate_limit(n),
        gain_eps=config.gain_eps,
        interpret=interpret,
        shift=spectral_config.shift,
        tolerance=spectral_config.tolerance,
        min_spec_iters=spectral_config.min_power_iters,
        max_spec_iters=spectral_config.max_iterations,
        seed=spectral_config.seed,
        sdtype="float32",
        convergence=convergence,
        check_interval=spectral_config.check_interval,
        stable_checks=spectral_config.stable_checks,
        inter_dtype=spectral_config.inter_dtype,
        cap_limit=config.max_iterations,
        return_values=return_values,
    )
    (
        sc,
        lc,
        lg,
        verified,
        best_sides,
        fin_sides,
        spec_extras,
        spec_sides,
        values,
    ) = jax.device_get(out)
    _powmod.last_iterations = int(spec_extras[2])
    eig = EigResult(
        eigenvalue=float(spec_extras[0]),
        median=float(spec_extras[1]),
        sides=spec_sides,
        values=np.asarray(values, np.float64),
    )
    sc = sc[:, 0]
    iterations = int(sc[2])
    lc = lc.reshape(-1)
    lg = lg.reshape(-1)
    kl = KLResult(
        sides=fin_sides[0],
        best_sides=best_sides[0],
        initial_cut=float(sc[6]),
        final_cut=float(sc[0]),
        best_cut=float(sc[1]),
        verified_cut=float(verified[0]),
        iterations=iterations,
        cut_trajectory=lc[: iterations + 1],
        gain_trajectory=lg[: iterations + 1],
    )
    return eig, kl


def refine_mega_batch(
    mg: MegaGraph,
    sides_batch: np.ndarray,
    config: KLConfig = KLConfig(),
    *,
    interpret: bool | None = None,
) -> list[KLResult]:
    """Run S independent refinements in ONE kernel launch (grid over
    starts): one compile, one host round-trip for all trajectories, and
    the initial ``A @ s`` / cut of every start computed batched on
    device.  Used by ``kl --starts N`` on TPU.

    Args:
      mg: prepared :class:`MegaGraph` (shared across starts).
      sides_batch: int8[S, n] initial side labels per start.
      config: reference-parity options; ``refresh_interval > 0`` runs
        the same chunked kernel re-entry as :func:`refine_mega`, but
        batched -- every start's from-scratch ``A @ s`` / cut is
        recomputed together between chunks.

    Returns:
      One :class:`KLResult` per start (same semantics as refine_mega).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sides_batch = np.asarray(sides_batch, dtype=np.int8)
    S, n = sides_batch.shape
    assert n == mg.num_nodes
    if config.refresh_interval > 0:
        return _refine_mega_batch_refresh(
            mg, sides_batch, config, interpret=interpret
        )
    # Per-start state is DMA'd stripe-by-stripe from HBM (no pipelined
    # VMEM input blocks), so the batched kernel's VMEM budget equals
    # the single-start path's at any S and node counts up to the
    # single-start ceiling (2.08M padded, measured) work batched.  The node axis
    # pads to 1024 lanes so each (R, 128) stripe is 8-row aligned (the
    # extra rows arrive permanently locked via the free mask and never
    # affect selection).
    P = _round_up(mg.padded_nodes, 1024)
    R = P // 128
    caps, naturals = [], []
    for k in range(S):
        n1 = int(sides_batch[k].astype(np.int64).sum())
        natural = min(n - n1, n1)
        naturals.append(natural)
        caps.append(
            natural
            if config.max_iterations is None
            else min(config.max_iterations, natural)
        )
    # Static value sizes the log buffers (4k compile buckets); each
    # start's loop stops at its own runtime cap.
    max_iters = min(_round_up(max(max(caps), 1), 4096), max(max(naturals), 1))
    terminate_limit = config.terminate_limit(n)

    # sf0 = sign * free: +-1 on real (all-free) nodes, 0 on padding.
    sf_host = np.zeros((S, P), dtype=np.float32)
    sf_host[:, :n] = 1.0 - 2.0 * sides_batch.astype(np.float32)
    sf_dev = jnp.asarray(sf_host.reshape(S, R, 128))

    # Initial A @ s + cut, the kernel, and device-side finalization run
    # as ONE program (module-level jit, NOT a local closure: a per-call
    # closure would be a fresh jit function every time and recompile
    # ~4 s on each invocation), then ONE device_get for every start's
    # whole result (swap logs and state arrays never cross the tunnel).
    wsum = mg.weighted_degrees.sum()
    scalars_d, log_cut_d, log_gain_d, ver_d, best_sides_d, fin_sides_d = (
        _mega_full(
            mg.spmv_plan,
            wsum,
            mg.meta_indices,
            mg.meta_weights,
            sf_dev,
            jnp.asarray(caps, jnp.int32),
            num_nodes=n,
            P=P,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=config.gain_eps,
            interpret=interpret,
            batched=True,
        )
    )
    scalars, log_cut, log_gain, verified, best_sides_h, fin_sides_h = (
        jax.device_get(
            (scalars_d, log_cut_d, log_gain_d, ver_d, best_sides_d, fin_sides_d)
        )
    )
    results = []
    for k in range(S):
        sc = scalars[:, k]
        iters = int(sc[2])
        lc = log_cut[k].reshape(-1)
        lg = log_gain[k].reshape(-1)
        results.append(
            KLResult(
                sides=fin_sides_h[k],
                best_sides=best_sides_h[k],
                initial_cut=float(sc[6]),
                final_cut=float(sc[0]),
                best_cut=float(sc[1]),
                verified_cut=float(verified[k]),
                iterations=iters,
                cut_trajectory=lc[: iters + 1],
                gain_trajectory=lg[: iters + 1],
            )
        )
    return results


def _refine_mega_batch_refresh(
    mg: MegaGraph,
    sides_batch: np.ndarray,
    config: KLConfig,
    *,
    interpret: bool,
) -> list[KLResult]:
    """Chunked multi-start refinement: every ``refresh_interval`` swaps
    the kernel exits, the host replays each start's chunk log into its
    partition/lock state, and the next chunk re-enters with a
    from-scratch ``A @ s`` and cut for ALL starts at once (batched
    :func:`_batch_init`) -- the batched form of :func:`refine_mega`'s
    refresh path (the stronger version of the reference's disabled
    verifyAndCorrectCutSize, gKL.cu:368-382).  Starts that have already
    terminated ride along with a zero cap (their grid step runs no
    swaps)."""
    S, n = sides_batch.shape
    P = _round_up(mg.padded_nodes, 1024)
    R = P // 128
    naturals = np.empty(S, np.int64)
    for k in range(S):
        n1 = int(sides_batch[k].astype(np.int64).sum())
        naturals[k] = min(n - n1, n1)
    true_caps = (
        naturals
        if config.max_iterations is None
        else np.minimum(config.max_iterations, naturals)
    )
    chunk = min(config.refresh_interval, int(max(true_caps.max(), 1)))
    max_iters = min(
        _round_up(max(chunk, 1), 4096), int(max(naturals.max(), 1))
    )
    terminate_limit = config.terminate_limit(n)
    wsum = mg.weighted_degrees.sum()

    sides_cur = sides_batch.astype(np.int8).copy()
    free_mask = np.ones((S, n), dtype=bool)
    term = np.zeros(S, np.int64)
    best = np.full(S, np.inf)
    stopped = np.zeros(S, bool)
    it_total = np.zeros(S, np.int64)
    initial_cut = np.zeros(S)
    final_cut = np.zeros(S)
    cuts = [[] for _ in range(S)]
    gains = [[] for _ in range(S)]
    a_log = [[] for _ in range(S)]
    b_log = [[] for _ in range(S)]
    first = True
    while not stopped.all():
        cap_chunk = np.where(
            stopped, 0, np.minimum(chunk, true_caps - it_total)
        ).astype(np.int32)
        s_full = np.zeros((S, P), np.float32)
        s_full[:, :n] = 1.0 - 2.0 * sides_cur.astype(np.float32)
        a_s, cut_dev = _batch_init(
            mg.spmv_plan,
            wsum,
            jnp.asarray(s_full.reshape(S, R, 128)),
            n=n,
            P=P,
            interp=interpret,
        )
        sf_host = np.zeros((S, P), np.float32)
        sf_host[:, :n] = (
            1.0 - 2.0 * sides_cur.astype(np.float32)
        ) * free_mask
        best_arr = (
            cut_dev if first else jnp.asarray(best, jnp.float32)
        )
        outs = _run_batched(
            mg.meta_indices,
            mg.meta_weights,
            jnp.asarray(sf_host.reshape(S, R, 128)),
            a_s,
            jnp.stack([cut_dev, best_arr], axis=0),
            jnp.asarray(np.stack([cap_chunk, term]), jnp.int32),
            num_nodes=n,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=config.gain_eps,
            interpret=interpret,
        )
        # Fetch everything EXCEPT the (S, R, 128) sf output, which the
        # host replay below reconstructs from the swap log anyway --
        # at tunnel bandwidth the unused array would dominate the
        # transfer at large S * P.
        lc, lg, la, lb, sc = jax.device_get(outs[1:])
        for k in range(S):
            if stopped[k]:
                continue
            it_chunk = int(sc[2, k])
            if first:
                initial_cut[k] = float(sc[6, k])
            best[k] = float(sc[1, k])
            term[k] = int(sc[3, k])
            lo = 0 if it_total[k] == 0 else 1  # later chunks repeat row 0
            cuts[k].append(lc[k].reshape(-1)[lo : it_chunk + 1])
            gains[k].append(lg[k].reshape(-1)[lo : it_chunk + 1])
            la_c = la[k].reshape(-1)[1 : it_chunk + 1]
            lb_c = lb[k].reshape(-1)[1 : it_chunk + 1]
            a_log[k].append(la_c)
            b_log[k].append(lb_c)
            sides_cur[k, la_c] = 1
            sides_cur[k, lb_c] = 0
            free_mask[k, la_c] = False
            free_mask[k, lb_c] = False
            it_total[k] += it_chunk
            if (
                bool(sc[7, k])
                or int(sc[4, k]) == 0
                or int(sc[5, k]) == 0
                or it_total[k] >= true_caps[k]
            ):
                stopped[k] = True
                final_cut[k] = float(sc[0, k])
        first = False

    # Batched from-scratch verification of every final partition (the
    # gKL.cu:524-530 oracle).
    s_fin = np.zeros((S, P), np.float32)
    s_fin[:, :n] = 1.0 - 2.0 * sides_cur.astype(np.float32)
    # Only the S verified-cut scalars cross the tunnel; the (S, R, 128)
    # A@s array stays on device.
    verified = jax.device_get(
        _batch_init(
            mg.spmv_plan,
            wsum,
            jnp.asarray(s_fin.reshape(S, R, 128)),
            n=n,
            P=P,
            interp=interpret,
        )[1]
    )
    results = []
    for k in range(S):
        iterations = int(it_total[k])
        log_cut = (
            np.concatenate(cuts[k]) if cuts[k] else np.zeros(1, np.float32)
        )
        log_gain = (
            np.concatenate(gains[k]) if gains[k] else np.zeros(1, np.float32)
        )
        log_a = np.concatenate([np.zeros(1, np.int32)] + a_log[k])
        log_b = np.concatenate([np.zeros(1, np.int32)] + b_log[k])
        results.append(
            KLResult(
                sides=sides_cur[k].copy(),
                best_sides=replay_swaps(
                    sides_batch[k],
                    log_a,
                    log_b,
                    best_iteration(log_cut, iterations),
                ),
                initial_cut=float(initial_cut[k]),
                final_cut=float(final_cut[k]),
                best_cut=float(best[k]),
                verified_cut=float(verified[k]),
                iterations=iterations,
                cut_trajectory=log_cut[: iterations + 1],
                gain_trajectory=log_gain[: iterations + 1],
            )
        )
    return results


def refine_mega(
    mg: MegaGraph,
    sides: np.ndarray,
    config: KLConfig = KLConfig(),
    *,
    interpret: bool | None = None,
) -> KLResult:
    """Run the single-kernel KL refinement; host-side result.

    Args:
      mg: prepared :class:`MegaGraph`.
      sides: int8[n] initial 0/1 side labels.
      config: reference-parity options (gain_eps, terminate rule, cap).
      interpret: force Pallas interpreter mode (defaults to True off-TPU
        so tests run on CPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if config.refresh_interval > 0:
        # Chunked kernel re-entry is implemented once, batched; S=1 is
        # that same path (bit-identical to the multi-start form).
        return _refine_mega_batch_refresh(
            mg,
            np.asarray(sides, dtype=np.int8)[None],
            config,
            interpret=interpret,
        )[0]
    n = mg.num_nodes
    P = mg.padded_nodes
    R = P // 128
    sides = np.asarray(sides, dtype=np.int8)
    n1 = int(sides.astype(np.int64).sum())
    natural_cap = min(n - n1, n1)
    true_cap = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )
    # The static value only sizes the log buffers / compile bucket (4k
    # granularity); the loop itself stops at the runtime cap, so a
    # user-set max_iterations is honored exactly (matching refine()).
    max_iters = min(_round_up(max(true_cap, 1), 4096), max(natural_cap, 1))
    terminate_limit = config.terminate_limit(n)

    wsum = mg.weighted_degrees.sum()

    # One program: initial A @ s / cut (with every real node initially
    # free, sf0 == the sign vector, so it seeds both), the kernel
    # launch, and device-side finalization — then ONE device_get for
    # the whole result (see _mega_full / _finalize_batch).
    sf_host = np.zeros(P, dtype=np.float32)
    sf_host[:n] = 1.0 - 2.0 * sides.astype(np.float32)
    sf_dev = jnp.asarray(sf_host.reshape(1, R, 128))
    scalars, log_cut, log_gain, ver_d, best_sides_d, fin_sides_d = (
        _mega_full(
            mg.spmv_plan,
            wsum,
            mg.meta_indices,
            mg.meta_weights,
            sf_dev,
            jnp.asarray([true_cap], jnp.int32),
            num_nodes=n,
            P=P,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=config.gain_eps,
            interpret=interpret,
            batched=False,
        )
    )
    sc, lc, lg, verified, best_sides, fin_sides = jax.device_get(
        (scalars, log_cut, log_gain, ver_d, best_sides_d, fin_sides_d)
    )
    sc = sc[:, 0]
    iterations = int(sc[2])
    lc = lc.reshape(-1)
    lg = lg.reshape(-1)
    return KLResult(
        sides=fin_sides[0],
        best_sides=best_sides[0],
        initial_cut=float(sc[6]),
        final_cut=float(sc[0]),
        best_cut=float(sc[1]),
        verified_cut=float(verified[0]),
        iterations=iterations,
        cut_trajectory=lc[: iterations + 1],
        gain_trajectory=lg[: iterations + 1],
    )

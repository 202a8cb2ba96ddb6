"""Owner-computes node-sharded KL refinement (O(1)-scalar swaps).

The first sharded engine (:mod:`eig_kl_tpu.parallel.sharded_kl`)
broadcasts the two chosen adjacency rows with ``psum`` every swap --
a (dmax,)-wide payload 4x per iteration, which on real ICI hardware
costs ~dmax/latency-floor more than it needs to.  This version ships
ONLY scalars per swap:

* each shard additionally holds the **transpose partition** of its
  local adjacency rows: for every global node ``v``, the (local row,
  weight) pairs of its local-row entries — a two-level layout: a
  CSC-ELL padded to a small fixed ``cmax`` (``_CMAX_DENSE``) plus a
  flat overflow list for high-degree columns' tails.  Memory is
  O(n_shards * n_pad * cmax + nnz): the same data regrouped by
  column, never inflated by the global max column count (ibm10's
  574-pin net would otherwise multiply every slot).
* per swap the collectives are: one ``all_gather`` of each shard's
  (value, index) selection candidates (4 scalars/shard) and one
  scalar ``psum`` for ``w_ab``.  The ``A @ s`` update is then fully
  local -- each shard scatter-adds its own column-``a``/column-``b``
  entry lists into its ``A @ s`` slice, no neighbor data crosses the
  ICI at all (owner-computes: the shard that owns a row is the only
  one that ever writes it).

Projected real-ICI cost per swap: 2 latency-floor collectives
(~1 us each on a v5e ring) + O(cmax) local VPU work, independent of
dmax -- vs the broadcast engine's 4 collectives each carrying
dmax * 8 bytes.  Trajectories are identical to the single-chip engine
and the broadcast engine (same selection tie-breaking, same float
operations in the same order; see tests/test_sharded.py).

Reference analog: the per-swap H2D/D2H round-trips at gKL.cu:205-226
are the single-device version of the traffic this design removes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.kl.engine import KLResult
from eig_kl_tpu.parallel.sharded_kl import _pad_ell
from eig_kl_tpu.utils.config import KLConfig


class _OCState(NamedTuple):
    s: jnp.ndarray          # (n_pad,) replicated signs
    a_s_l: jnp.ndarray      # (n_local,) sharded A @ s
    free_l: jnp.ndarray     # (n_local,) sharded lock mask
    cut: jnp.ndarray
    best_cut: jnp.ndarray
    n_free0: jnp.ndarray
    n_free1: jnp.ndarray
    iteration: jnp.ndarray
    terminate: jnp.ndarray
    stop: jnp.ndarray
    log_cut: jnp.ndarray
    log_gain: jnp.ndarray
    log_a: jnp.ndarray
    log_b: jnp.ndarray


# Dense-slot ceiling for the per-shard CSC-ELL.  Columns with more
# local entries than this spill to a flat per-shard overflow list that
# is masked-scattered every swap (O(ov_max) local VPU work, still zero
# ICI traffic).  Without the split, one high-degree column (ibm10's
# 574-pin net) would set cmax for EVERY (shard, column) slot and the
# dense arrays would dwarf the adjacency itself.
_CMAX_DENSE = 16


def _transpose_partition(
    g: Graph, n_pad: int, n_shards: int, dtype
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Two-level per-shard CSC of the local row slices.

    Dense level: colT_rows[p, v, k] = k-th local row of shard p with an
    edge to global node v, for k < _CMAX_DENSE (pad row 0 / weight 0).
    Overflow level: the remaining (local row, global col, weight)
    entries of shard p as flat lists padded to ov_max across shards.

    Returns (colT_rows int32[n_shards, n_pad, cmax],
             colT_w dtype[n_shards, n_pad, cmax],
             ov_rows int32[n_shards, ov_max], ov_cols int32[...],
             ov_w dtype[...], cmax).  Total memory is
    O(n_shards * n_pad * cmax + nnz) — the dense level is bounded by
    the small fixed cmax, not by the global max column count.
    """
    n = g.num_nodes
    n_l = n_pad // n_shards
    rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
    cols = g.indices.astype(np.int64)
    shard = rows // n_l
    # Rank entries within each (shard, column) group.
    key = shard * n_pad + cols
    uniq, counts = np.unique(key, return_counts=True)
    cmax = min(max(int(counts.max()) if counts.size else 1, 1), _CMAX_DENSE)
    order = np.argsort(key, kind="stable")
    rank = np.arange(rows.shape[0]) - np.repeat(
        np.searchsorted(key[order], uniq), counts
    )
    sh_o = shard[order]
    co_o = cols[order]
    ro_o = rows[order]
    w_o = g.data[order].astype(dtype)

    dense = rank < cmax
    colT_rows = np.zeros((n_shards, n_pad, cmax), np.int32)
    colT_w = np.zeros((n_shards, n_pad, cmax), dtype)
    colT_rows[sh_o[dense], co_o[dense], rank[dense]] = (
        ro_o[dense] - sh_o[dense] * n_l
    ).astype(np.int32)
    colT_w[sh_o[dense], co_o[dense], rank[dense]] = w_o[dense]

    ov = ~dense
    ov_counts = np.bincount(sh_o[ov], minlength=n_shards)
    ov_max = max(int(ov_counts.max()) if ov_counts.size else 0, 1)
    ov_rows = np.zeros((n_shards, ov_max), np.int32)
    # Pad columns point at padded node n_pad-1's... any index unequal to
    # a real swap target with weight 0 is inert; use col -1 sentinel.
    ov_cols = np.full((n_shards, ov_max), -1, np.int32)
    ov_w = np.zeros((n_shards, ov_max), dtype)
    if ov.any():
        # Position of each overflow entry within its shard's list.
        ov_idx = np.flatnonzero(ov)
        ov_sh = sh_o[ov_idx]
        order2 = np.argsort(ov_sh, kind="stable")
        ov_idx = ov_idx[order2]
        ov_sh = ov_sh[order2]
        pos = np.arange(ov_idx.size) - np.repeat(
            np.cumsum(np.concatenate([[0], ov_counts[:-1]])), ov_counts
        )
        ov_rows[ov_sh, pos] = (ro_o[ov_idx] - ov_sh * n_l).astype(np.int32)
        ov_cols[ov_sh, pos] = co_o[ov_idx].astype(np.int32)
        ov_w[ov_sh, pos] = w_o[ov_idx]
    return colT_rows, colT_w, ov_rows, ov_cols, ov_w, cmax


@functools.cache
def _build_oc_kl(
    mesh: Mesh,
    n_valid: int,
    max_iters: int,
    gain_eps: float,
    terminate_limit: int,
):
    """Compile the owner-computes shard-mapped refinement loop."""

    def run(
        ell_idx, ell_w, deg, colT_rows, colT_w, ov_rows, ov_cols, ov_w,
        sides, n0, n1,
    ):
        # Local views: ell_idx/ell_w (n_l, dmax) for init/verify only;
        # colT_rows/colT_w (n_pad, cmax) + ov_* (ov_max,) = this
        # shard's two-level transpose partition; deg (n_l,);
        # sides (n_pad,) replicated.
        n_l = ell_idx.shape[0]
        me = jax.lax.axis_index("mp")
        r0 = me * n_l
        dtype = ell_w.dtype
        neg = jnp.asarray(-jnp.inf, dtype)
        g_ids = r0 + jax.lax.broadcasted_iota(jnp.int32, (n_l, 1), 0)[:, 0]

        s0 = (1.0 - 2.0 * sides.astype(dtype)).astype(dtype)
        a_s0_l = (ell_w * s0[ell_idx]).sum(axis=1)
        s0_l = jax.lax.dynamic_slice(s0, (r0,), (n_l,))
        cut0 = 0.25 * (
            jax.lax.psum(deg.sum(), "mp") - jax.lax.psum(s0_l @ a_s0_l, "mp")
        )
        free0_l = g_ids < n_valid

        init = _OCState(
            s=s0,
            a_s_l=a_s0_l,
            free_l=free0_l,
            cut=cut0,
            best_cut=cut0,
            n_free0=n0,
            n_free1=n1,
            iteration=jnp.asarray(0, jnp.int32),
            terminate=jnp.asarray(0, jnp.int32),
            stop=jnp.asarray(False),
            log_cut=jnp.zeros(max_iters + 1, dtype).at[0].set(cut0),
            log_gain=jnp.zeros(max_iters + 1, dtype),
            log_a=jnp.zeros(max_iters + 1, jnp.int32),
            log_b=jnp.zeros(max_iters + 1, jnp.int32),
        )

        # Carrier float for the one-collective candidate exchange.
        # Node *indices* must survive the round trip exactly: for f64,
        # a value cast is exact to 2^53; for f32/bf16 the index is
        # BITCAST into f32 lanes (values widen bf16->f32 exactly), so
        # no index is ever rounded (a plain f32 cast corrupts ids
        # above 2^24, bf16 above 2^8).
        carrier = jnp.float64 if dtype == jnp.float64 else jnp.float32

        def _pack_idx(i):
            i = (r0 + i).astype(jnp.int32)
            if carrier == jnp.float64:
                return i.astype(carrier)
            return jax.lax.bitcast_convert_type(i, jnp.float32)

        def _unpack_idx(x):
            if carrier == jnp.float64:
                return x.astype(jnp.int32)
            return jax.lax.bitcast_convert_type(x, jnp.int32)

        def select2(free_l, s_l, a_s_l):
            """Both-side masked first-max in ONE all_gather: each shard
            contributes (d_best, index) per side (4 scalars)."""
            d_l = -s_l * a_s_l
            dm0 = jnp.where((s_l > 0) & free_l, d_l, neg)
            dm1 = jnp.where((s_l < 0) & free_l, d_l, neg)
            li0 = jnp.argmax(dm0)
            li1 = jnp.argmax(dm1)
            cand = jnp.stack(
                [
                    dm0[li0].astype(carrier),
                    _pack_idx(li0),
                    dm1[li1].astype(carrier),
                    _pack_idx(li1),
                ]
            )
            allc = jax.lax.all_gather(cand, "mp")  # (n_shards, 4)
            p0 = jnp.argmax(allc[:, 0])
            p1 = jnp.argmax(allc[:, 2])
            return (
                _unpack_idx(allc[p0, 1]),
                allc[p0, 0].astype(dtype),
                _unpack_idx(allc[p1, 3]),
                allc[p1, 2].astype(dtype),
            )

        def col_entries(v):
            """This shard's (local rows, weights) of column v."""
            rows = jax.lax.dynamic_slice_in_dim(colT_rows, v, 1, axis=0)[0]
            w = jax.lax.dynamic_slice_in_dim(colT_w, v, 1, axis=0)[0]
            return rows, w

        def cond(st: _OCState):
            return (
                (~st.stop)
                & (st.iteration < max_iters)
                & (st.n_free0 > 0)
                & (st.n_free1 > 0)
            )

        def body(st: _OCState):
            s_l = jax.lax.dynamic_slice(st.s, (r0,), (n_l,))
            a, d_a, b, d_b = select2(st.free_l, s_l, st.a_s_l)

            rows_a, w_a = col_entries(a)
            rows_b, w_b = col_entries(b)
            # Overflow entries of columns a/b held by this shard (the
            # >= cmax tail of high-degree columns).
            ovm_a = jnp.where(ov_cols == a, ov_w, 0.0)
            ovm_b = jnp.where(ov_cols == b, ov_w, 0.0)
            # w_ab: only b's owner holds the (b, a) entry of column a.
            own_b = (b >= r0) & (b < r0 + n_l)
            wab_l = (
                jnp.where(
                    own_b & (rows_a == b - r0) & (w_a != 0), w_a, 0.0
                ).sum()
                + jnp.where(own_b & (ov_rows == b - r0), ovm_a, 0.0).sum()
            )
            w_ab = jax.lax.psum(wab_l, "mp")  # the ONLY data collective
            gain = d_a + d_b - 2.0 * w_ab
            cut = st.cut - gain

            # Owner-computes A @ s update: scatter this shard's column
            # entries into its local slice; nothing crosses the ICI.
            # Each local row holds at most one edge to a (resp. b), so
            # the dense and overflow scatters touch disjoint rows and
            # the float result is order-independent.
            s_a, s_b = st.s[a], st.s[b]
            a_s_l = st.a_s_l.at[rows_a].add(-2.0 * s_a * w_a)
            a_s_l = a_s_l.at[rows_b].add(-2.0 * s_b * w_b)
            a_s_l = a_s_l.at[ov_rows].add(-2.0 * s_a * ovm_a)
            a_s_l = a_s_l.at[ov_rows].add(-2.0 * s_b * ovm_b)
            s = st.s.at[a].set(-s_a).at[b].set(-s_b)
            free_l = st.free_l & (g_ids != a) & (g_ids != b)

            non_improving = gain <= gain_eps
            terminate = jnp.where(non_improving, st.terminate + 1, 0)
            it = st.iteration + 1
            return _OCState(
                s=s,
                a_s_l=a_s_l,
                free_l=free_l,
                cut=cut,
                best_cut=jnp.minimum(cut, st.best_cut),
                n_free0=st.n_free0 - 1,
                n_free1=st.n_free1 - 1,
                iteration=it,
                terminate=terminate,
                stop=terminate > terminate_limit,
                log_cut=st.log_cut.at[it].set(cut),
                log_gain=st.log_gain.at[it].set(gain),
                log_a=st.log_a.at[it].set(a),
                log_b=st.log_b.at[it].set(b),
            )

        final = jax.lax.while_loop(cond, body, init)
        # From-scratch verification (the gKL.cu:524-530 oracle).
        sf_l = jax.lax.dynamic_slice(final.s, (r0,), (n_l,))
        a_sf_l = (ell_w * final.s[ell_idx]).sum(axis=1)
        verified = 0.25 * (
            jax.lax.psum(deg.sum(), "mp") - jax.lax.psum(sf_l @ a_sf_l, "mp")
        )
        return (
            final.s,
            final.cut,
            final.best_cut,
            cut0,
            verified,
            final.iteration,
            final.log_cut,
            final.log_gain,
            final.log_a,
            final.log_b,
        )

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(
            P("mp", None),
            P("mp", None),
            P("mp"),
            # colT arrives flattened (n_shards * n_pad, cmax); the row
            # split hands each shard its own (n_pad, cmax) partition.
            P("mp", None),
            P("mp", None),
            # overflow lists flattened (n_shards * ov_max,) likewise.
            P("mp"),
            P("mp"),
            P("mp"),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_refine_oc(
    g: Graph,
    sides: np.ndarray,
    mesh: Mesh,
    config: KLConfig = KLConfig(),
    *,
    dtype=jnp.float32,
) -> KLResult:
    """Owner-computes sharded KL refinement over the mesh's "mp" axis.

    Trajectory-identical to :func:`eig_kl_tpu.kl.engine.refine` and to
    :func:`eig_kl_tpu.parallel.sharded_kl.sharded_refine`, with O(1)
    scalars of per-swap communication instead of O(dmax).
    """
    n = g.num_nodes
    n_shards = mesh.shape["mp"]
    n_pad = ((n + n_shards - 1) // n_shards) * n_shards
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    ell_idx, ell_w, deg = _pad_ell(g, n_pad, np_dtype)
    colT_rows, colT_w, ov_rows, ov_cols, ov_w, _cmax = _transpose_partition(
        g, n_pad, n_shards, np_dtype
    )

    sides = np.asarray(sides, dtype=np.int8)
    sides_pad = np.zeros(n_pad, dtype=np.int8)
    sides_pad[:n] = sides
    n1 = int(sides.sum())
    natural_cap = min(n - n1, n1)
    max_iters = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )

    fn = _build_oc_kl(
        mesh,
        n_valid=n,
        max_iters=max_iters,
        gain_eps=config.gain_eps,
        terminate_limit=config.terminate_limit(n),
    )
    out = fn(
        jnp.asarray(ell_idx),
        jnp.asarray(ell_w),
        jnp.asarray(deg),
        jnp.asarray(colT_rows.reshape(n_shards * n_pad, -1)),
        jnp.asarray(colT_w.reshape(n_shards * n_pad, -1)),
        jnp.asarray(ov_rows.reshape(-1)),
        jnp.asarray(ov_cols.reshape(-1)),
        jnp.asarray(ov_w.reshape(-1)),
        jnp.asarray(sides_pad),
        jnp.asarray(n - n1, jnp.int32),
        jnp.asarray(n1, jnp.int32),
    )
    (s, cut, best_cut, cut0, verified, iters, log_cut, log_gain, log_a, log_b) = out
    iterations = int(iters)
    from eig_kl_tpu.kl.engine import best_iteration, replay_swaps

    best_sides_pad = replay_swaps(
        sides_pad,
        np.asarray(log_a),
        np.asarray(log_b),
        best_iteration(np.asarray(log_cut), iterations),
    )
    return KLResult(
        sides=np.asarray(s < 0, dtype=np.int8)[:n],
        best_sides=best_sides_pad[:n],
        initial_cut=float(cut0),
        final_cut=float(cut),
        best_cut=float(best_cut),
        verified_cut=float(verified),
        iterations=iterations,
        cut_trajectory=np.asarray(log_cut)[: iterations + 1],
        gain_trajectory=np.asarray(log_gain)[: iterations + 1],
    )

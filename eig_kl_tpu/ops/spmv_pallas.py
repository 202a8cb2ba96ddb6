"""Speed-of-light sparse matvec (A @ x) as a Pallas TPU kernel.

XLA's general gather/scatter on TPU runs a scalar loop (~7 ns/element),
so the natural SpMV formulations (ELL gather + row-sum, or COO gather +
segment-sum) run 100-1000x below HBM speed -- at 200K nodes a single
Lanczos matvec would cost ~50 ms.  This kernel reaches vector speed by
removing *all* scalar-indexed memory traffic:

1. **Stripe-sorted entries.**  The host planner sorts the nnz COO
   entries by (column-stripe of 1024, row).  Every 512-entry chunk then
   reads x only from one 1024-element window and writes y only into one
   1024-row window -- both *static* per chunk.
2. **Windowed gather on the VPU.**  Within a chunk, ``x[col]`` becomes
   an 8-way select over ``tpu.dynamic_gather`` lane-shuffles of the
   (8,128) x-window -- the only gather form Mosaic lowers to the
   hardware shuffle unit (~3 ps/element vs XLA's ~7 ns).
3. **Segmented scan instead of scatter.**  Entries of a chunk are
   reduced per-row with a 9-step Hillis-Steele segmented scan built
   from ``pltpu.roll`` + compare + add (rows are sorted, so segments
   are contiguous in flat order).
4. **Static routing.**  Each chunk's per-row totals sit at the
   segment-last flat positions; a host-precomputed (8,128) routing map
   (again lane-shuffles + selects) places them into the y-window, and
   the window is accumulated with one dynamic-slice read-modify-write.

The kernel streams chunk blocks HBM->VMEM through the Pallas grid
pipeline; x and y live fully in VMEM (n <= ~2M for the 16 MB budget).

This replaces both CUDA SpMV flavors of the reference
(``sparseMVKernel`` gKL2.cu:65-89 and the gain ``connectionsKernel``
gKL.cu:104-145 -- gains are ``-s * (A s)``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eig_kl_tpu.graph.csr import Graph

CHUNK = 512           # entries per chunk, laid out (4, 128)
WINDOW = 1024         # x-window and y-window size (8 x 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ensure_row_sorted(rows, cols, weights):
    """The native planners rely on CSR (row-major) entry order for
    their stable counting sort; sort first for arbitrary COO input."""
    if rows.shape[0] == 0 or bool((np.diff(rows) >= 0).all()):
        return rows, cols, weights
    order = np.lexsort((cols, rows))
    return rows[order], cols[order], weights[order]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SpmvPlan:
    """Static routing plan for one sparse matrix (a JAX pytree whose
    geometry fields are static aux data, so the plan can flow through
    jit as an argument).

    Attributes:
      cw8: int32[C] per-chunk x-window start, in (*,128)-row units.
      rw8: int32[C] per-chunk y-window start, in (*,128)-row units.
      col_local: int16[C,4,128] entry column minus window base (0..1023).
      row_local: int16[C,4,128] entry row minus window base (0..1023).
      weights: f32[C,4,128] entry weights (0 for padding entries).
      route_src: int16[C,8,128] flat chunk position (0..511) of the
        segment-last entry for each y-window row; -1 where the window
        row receives nothing from this chunk.
      padded_nodes: n rounded up to a multiple of 1024.
    """

    cw8: jnp.ndarray
    rw8: jnp.ndarray
    col_local: jnp.ndarray
    row_local: jnp.ndarray
    weights: jnp.ndarray
    route_src: jnp.ndarray
    padded_nodes: int

    def tree_flatten(self):
        children = (
            self.cw8,
            self.rw8,
            self.col_local,
            self.row_local,
            self.weights,
            self.route_src,
        )
        return children, self.padded_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @property
    def num_chunks(self) -> int:
        return int(self.cw8.shape[0])

    @classmethod
    def from_graph(cls, graph: Graph, dtype=np.float32) -> "SpmvPlan":
        return build_plan(
            graph.num_nodes,
            np.repeat(
                np.arange(graph.num_nodes, dtype=np.int64), graph.degrees
            ),
            graph.indices.astype(np.int64),
            graph.data.astype(dtype),
        )


def build_plan(
    n: int,
    rows: np.ndarray,
    cols: np.ndarray,
    weights: np.ndarray,
    use_native: bool | None = None,
) -> SpmvPlan:
    """Build the static chunk plan from COO entries.

    Native C++ single-pass counting-sort builder when available (the
    NumPy version costs tens of seconds at millions of nnz on a single
    core); both produce bit-identical plans.  Chunk keys are (column
    stripe, aligned 1024-row window); each key group is split into
    512-entry chunks.
    """
    if use_native is not False and rows.shape[0] > 0:
        try:
            from eig_kl_tpu.io import native_io

            rows, cols, weights = _ensure_row_sorted(rows, cols, weights)
            d = native_io.build_plan_v1_native(n, rows, cols, weights)
            return SpmvPlan(
                cw8=jnp.asarray(d["cw8"]),
                rw8=jnp.asarray(d["rw8"]),
                col_local=jnp.asarray(d["col_local"]),
                row_local=jnp.asarray(d["row_local"]),
                weights=jnp.asarray(d["weights"]),
                route_src=jnp.asarray(d["route_src"]),
                padded_nodes=d["padded_nodes"],
            )
        except (ImportError, OSError):
            if use_native:
                raise
    P = _round_up(max(n, 1), WINDOW)
    nnz = rows.shape[0]
    if nnz == 0:
        rows = np.zeros(1, np.int64)
        cols = np.zeros(1, np.int64)
        weights = np.zeros(1, np.float32)
        nnz = 1
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)

    stripe = cols // WINDOW
    # Aligned row windows, clamped so they never overrun the padding.
    rblock = np.minimum((rows // WINDOW) * WINDOW, P - WINDOW)
    key = stripe * (P // WINDOW + 1) + rblock // WINDOW
    order = np.lexsort((rows, key))
    rows, cols, weights = rows[order], cols[order], weights[order]
    stripe, rblock, key = stripe[order], rblock[order], key[order]

    # Group boundaries -> chunk starts (512-entry pieces per group).
    new_group = np.empty(nnz, dtype=bool)
    new_group[0] = True
    np.not_equal(key[1:], key[:-1], out=new_group[1:])
    group_start = np.repeat(
        np.flatnonzero(new_group), np.diff(np.flatnonzero(new_group), append=nnz)
    )
    in_group_pos = np.arange(nnz) - group_start
    is_chunk_start = in_group_pos % CHUNK == 0
    starts = np.flatnonzero(is_chunk_start)
    C = len(starts)
    counts = np.diff(starts, append=nnz)
    chunk_id = np.repeat(np.arange(C), counts)
    flat_pos = np.arange(nnz) - starts[chunk_id]

    cw8 = (stripe[starts] * (WINDOW // 128)).astype(np.int32)
    rw_base = rblock[starts]
    rw8 = (rw_base // 128).astype(np.int32)

    # Scatter entries into (C, 512) with padding that extends the last
    # real segment with zero weight.
    col_local = np.zeros((C, CHUNK), np.int16)
    row_local = np.zeros((C, CHUNK), np.int16)
    w_arr = np.zeros((C, CHUNK), np.float32)
    col_local[chunk_id, flat_pos] = cols - stripe[starts][chunk_id] * WINDOW
    row_local[chunk_id, flat_pos] = rows - rw_base[chunk_id]
    w_arr[chunk_id, flat_pos] = weights
    # Padding slots continue the last real segment (weight stays 0).
    last_rl = row_local[np.arange(C), counts - 1]
    pad_mask = np.arange(CHUNK)[None, :] >= counts[:, None]
    row_local = np.where(pad_mask, last_rl[:, None], row_local)

    # Segment-last flat positions -> routing map (-1 = no total here).
    is_last = np.empty((C, CHUNK), dtype=bool)
    is_last[:, -1] = True
    np.not_equal(row_local[:, 1:], row_local[:, :-1], out=is_last[:, :-1])
    c_idx, p_idx = np.nonzero(is_last)
    r_idx = row_local[c_idx, p_idx].astype(np.int64)
    route_src = np.full((C, WINDOW), -1, np.int16)
    route_src[c_idx, r_idx] = p_idx

    return SpmvPlan(
        cw8=jnp.asarray(cw8),
        rw8=jnp.asarray(rw8),
        col_local=jnp.asarray(col_local.reshape(C, 4, 128)),
        row_local=jnp.asarray(row_local.reshape(C, 4, 128)),
        weights=jnp.asarray(w_arr.reshape(C, 4, 128)),
        route_src=jnp.asarray(route_src.reshape(C, 8, 128)),
        padded_nodes=P,
    )


def _flat_shift(x, k, lane):
    """Value at flat position p-k of a (4,128) row-major tile (garbage
    in the first k flat positions -- callers mask with flat_iota >= k)."""
    r1, r0 = k % 128, k // 128
    if r1:
        a = pltpu.roll(x, r1, axis=1)
        lo = pltpu.roll(a, r0, axis=0) if r0 else a
        hi = pltpu.roll(a, r0 + 1, axis=0)
        return jnp.where(lane >= r1, lo, hi)
    return pltpu.roll(x, r0, axis=0)


def _spmv_kernel(cw_ref, rw_ref, x_ref, cl_ref, rl_ref, w_ref, src_ref, y_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0) * 128 + lane4

    # --- expand: g[p] = x_window[col_local[p]] -------------------------
    X = x_ref[pl.ds(cw_ref[c], 8), :]
    cl = cl_ref[0].astype(jnp.int32)
    q = cl >> 7
    l = cl & 127
    g = jnp.zeros((4, 128), jnp.float32)
    for qq in range(8):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(X[qq : qq + 1, :], (4, 128)), l, axis=1
        )
        g = g + jnp.where(q == qq, cand, 0.0)
    e = g * w_ref[0]

    # --- segmented inclusive scan over flat order ----------------------
    rl = rl_ref[0].astype(jnp.int32)
    for k in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        se = _flat_shift(e, k, lane4)
        sr = _flat_shift(rl, k, lane4)
        m = (sr == rl) & (flat4 >= k)
        e = e + jnp.where(m, se, 0.0)

    # --- route segment totals into the y window ------------------------
    src = src_ref[0].astype(jnp.int32)
    valid = src >= 0
    src = jnp.where(valid, src, 0)
    ps = src >> 7
    pl_ = src & 127
    out = jnp.zeros((8, 128), jnp.float32)
    for qq in range(4):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(e[qq : qq + 1, :], (8, 128)), pl_, axis=1
        )
        out = out + jnp.where(ps == qq, cand, 0.0)
    out = jnp.where(valid, out, 0.0)

    rw = rw_ref[c]
    y_ref[pl.ds(rw, 8), :] += out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_call(plan: SpmvPlan, x2d: jnp.ndarray, *, interpret: bool = False):
    C = plan.col_local.shape[0]
    R = x2d.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda c, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 128), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((1, 4, 128), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((1, 4, 128), lambda c, *_: (c, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda c, *_: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (R, 128), lambda c, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _spmv_kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        plan.cw8,
        plan.rw8,
        x2d,
        plan.col_local,
        plan.row_local,
        plan.weights,
        plan.route_src,
    )


def spmv_pallas_2d(
    plan, x2d: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """``A @ x`` on already-padded (P/128, 128) f32 state -- the no-copy
    form for device-resident iteration loops (the padding region must be
    zero; the result's padding region is zero)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(plan, SpmvPlanV2):
        y = _spmv_v2_call(
            plan.col_local,
            plan.weights,
            plan.rl_t,
            plan.rb_of,
            x2d,
            n_cb=plan.n_cb,
            n_rbp=plan.n_rbp,
            quantum=plan.quantum,
            g1=plan.g1,
            g2=plan.g2,
            interpret=interpret,
        )
        if plan.tail is not None:
            y = y + _spmv_call(plan.tail, x2d, interpret=interpret)
        return y
    return _spmv_call(plan, x2d, interpret=interpret)


def spmv_pallas(
    plan, x: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """``A @ x`` through a v1 or v2 chunk plan.  x: float[n] (any float
    dtype, computed in f32).  Returns float32[n]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = plan.padded_nodes
    n = x.shape[0]
    x2d = (
        jnp.zeros(P, jnp.float32).at[:n].set(x.astype(jnp.float32)).reshape(P // 128, 128)
    )
    if isinstance(plan, SpmvPlanV2):
        y = _spmv_v2_call(
            plan.col_local,
            plan.weights,
            plan.rl_t,
            plan.rb_of,
            x2d,
            n_cb=plan.n_cb,
            n_rbp=plan.n_rbp,
            quantum=plan.quantum,
            g1=plan.g1,
            g2=plan.g2,
            interpret=interpret,
        )
        if plan.tail is not None:
            y = y + _spmv_call(plan.tail, x2d, interpret=interpret)
    else:
        y = _spmv_call(plan, x2d, interpret=interpret)
    return y.reshape(-1)[:n]


def plan_for_graph(graph: Graph):
    """Pick the plan flavor: v1 when (stripe x row-window) tiles are
    reasonably full (small or locality-friendly graphs), v2 otherwise
    (its dense bucket transpose does not depend on locality)."""
    n = graph.num_nodes
    rows = np.repeat(np.arange(n, dtype=np.int64), graph.degrees)
    cols = graph.indices.astype(np.int64)
    w = graph.data.astype(np.float32)
    nnz = max(rows.shape[0], 1)
    try:
        from eig_kl_tpu.io import native_io

        v1_chunks = native_io.plan_v1_chunks_native(n, rows, cols)
    except (ImportError, OSError):
        P = _round_up(max(n, 1), WINDOW)
        key = (cols // WINDOW) * (P // WINDOW + 1) + np.minimum(
            rows // WINDOW, P // WINDOW - 1
        )
        _, counts = np.unique(key, return_counts=True)
        v1_chunks = int(np.ceil(counts / CHUNK).sum())
    if v1_chunks * CHUNK <= 1.7 * nnz:
        return build_plan(n, rows, cols, w)
    return build_plan_v2(n, rows, cols, w)


# ---------------------------------------------------------------------------
# v2: bucket-transpose plan for graphs with no row/column locality.
#
# The v1 plan keys chunks on (column stripe x 1024-row window); on a
# *random* 200K-node graph such tiles hold ~28 entries, so chunks are
# ~95% padding and both the kernel and the host->device plan transfer
# pay ~18x.  The irreducible problem: one pass must be column-grouped
# (so x-gathers are windowed) and the other row-grouped (so the y
# reduction is windowed), and the regrouping between them is an
# arbitrary nnz-sized static permutation.  v2 pays that permutation as
# a *dense* XLA transpose by quantizing (column-block x row-block)
# buckets to a fixed slot count Q:
#
#   pass 1 (gather):  slots laid out (col-block, row-block, Q); every
#       512-slot chunk shares one 1024-wide x-window -> lane-shuffle
#       gather as in v1.  Emits e[slot] = w * x[col].
#   glue:             reshape/transpose (cb, rb, Q) -> (rb, cb, Q) --
#       a dense 4-5 MB XLA transpose (~10s of us).
#   pass 2 (reduce):  each row-block's slots reduce into a 512-row
#       y-window via a one-hot compare-sum (rows inside a bucket are
#       *not* contiguous across buckets, so the v1 segmented scan does
#       not apply).
#
# Bucket overflow (> Q entries, e.g. clique rows from a 585-pin net)
# spills to a v1-format tail plan; y = y_main + y_tail.
# ---------------------------------------------------------------------------

RBLOCK = 512          # pass-2 y-window rows per row-block


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SpmvPlanV2:
    """Bucket-transpose plan (a JAX pytree; see section comment above).

    Attributes:
      col_local: int16[C1,4,128] pass-1 slot column offsets in-window.
      weights: f32[C1,4,128] pass-1 slot weights (0 = padding).
      rl_t: f32[C2g,8,512] pass-2 per-slot row offsets in the 512-row
        window, already in transposed slot order; -1 = padding.
      rb_of: int32[C2g*8] y-window row-block per pass-2 sub-chunk.
      tail: v1 plan for bucket-overflow entries, or None.
      padded_nodes / n_cb / n_rbp / quantum / g1 / g2: static geometry.
    """

    col_local: jnp.ndarray
    weights: jnp.ndarray
    rl_t: jnp.ndarray
    rb_of: jnp.ndarray
    tail: SpmvPlan | None
    padded_nodes: int
    n_cb: int
    n_rbp: int
    quantum: int
    g1: int
    g2: int

    def tree_flatten(self):
        children = (self.col_local, self.weights, self.rl_t, self.rb_of, self.tail)
        aux = (
            self.padded_nodes,
            self.n_cb,
            self.n_rbp,
            self.quantum,
            self.g1,
            self.g2,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_plan_v2(
    n: int,
    rows: np.ndarray,
    cols: np.ndarray,
    weights: np.ndarray,
    use_native: bool | None = None,
) -> SpmvPlanV2:
    if use_native is not False and rows.shape[0] > 0:
        try:
            from eig_kl_tpu.io import native_io

            rows, cols, weights = _ensure_row_sorted(rows, cols, weights)
            d = native_io.build_plan_v2_native(n, rows, cols, weights)
            tail = None
            if d["tail"] is not None:
                tr, tc, tw = d["tail"]
                tail = build_plan(n, tr, tc, tw, use_native=use_native)
            return SpmvPlanV2(
                col_local=jnp.asarray(d["col_local"]),
                weights=jnp.asarray(d["weights"]),
                rl_t=jnp.asarray(d["rl_t"]),
                rb_of=jnp.asarray(d["rb_of"]),
                tail=tail,
                padded_nodes=d["padded_nodes"],
                n_cb=d["n_cb"],
                n_rbp=d["n_rbp"],
                quantum=d["quantum"],
                g1=d["g1"],
                g2=d["g2"],
            )
        except (ImportError, OSError):
            if use_native:
                raise
    P = _round_up(max(n, 1), WINDOW)
    nnz = max(rows.shape[0], 1)
    rows = rows.astype(np.int64)
    cols = cols.astype(np.int64)
    n_cb = P // WINDOW
    n_rb = P // RBLOCK

    lam = max(nnz / (n_cb * n_rb), 1.0)
    Q = 4
    while Q < min(512, lam * 1.5):
        Q *= 2

    cb = cols // WINDOW
    rb = rows // RBLOCK
    bucket = cb * n_rb + rb
    order = np.lexsort((rows, bucket))
    rows, cols, w = rows[order], cols[order], weights[order]
    cb, rb, bucket = cb[order], rb[order], bucket[order]

    # Rank within bucket; rank >= Q spills to the tail plan.
    uniq, start_idx, counts = np.unique(
        bucket, return_index=True, return_counts=True
    )
    rank = np.arange(nnz) - np.repeat(start_idx, counts)
    main = rank < Q
    tail = None
    if (~main).any():
        tail = build_plan(n, rows[~main], cols[~main], w[~main])

    rows_m, cols_m, w_m = rows[main], cols[main], w[main]
    cb_m, rb_m, rank_m = cb[main], rb[main], rank[main]

    # Pass-1 slot grid: (n_cb, n_rbp, Q) flattened, n_rbp chosen so each
    # col-block group is a whole number of 512-slot chunks.
    per = max(CHUNK // Q, 1)
    n_rbp = _round_up(n_rb, per)
    g1 = n_rbp * Q
    slot = cb_m * g1 + rb_m * Q + rank_m
    S1 = n_cb * g1
    C1 = _round_up(S1 // CHUNK, GB1)
    col_local = np.zeros(C1 * CHUNK, np.int16)
    w_arr = np.zeros(C1 * CHUNK, np.float32)
    col_local[slot] = cols_m - cb_m * WINDOW
    w_arr[slot] = w_m

    # Pass-2 transposed slot grid: (n_rbp, n_cb, Q) padded to g2 lanes.
    g2 = _round_up(n_cb * Q, CHUNK)
    rl_grid = np.full((n_cb, n_rbp, Q), -1, np.int16)
    rl_grid.reshape(-1)[slot] = (rows_m - rb_m * RBLOCK).astype(np.int16)
    rl_t = np.full((n_rbp, g2), -1, np.int16)
    rl_t[:, : n_cb * Q] = rl_grid.transpose(1, 0, 2).reshape(n_rbp, n_cb * Q)
    C2 = n_rbp * g2 // CHUNK
    C2p = _round_up(C2, 8 * GB2)
    rl_t2 = np.full((C2p, CHUNK), -1, np.int16)
    rl_t2[:C2] = rl_t.reshape(C2, CHUNK)
    rb_of = np.zeros(C2p, np.int32)
    rb_of[:C2] = np.arange(C2) // (g2 // CHUNK)

    return SpmvPlanV2(
        col_local=jnp.asarray(col_local.reshape(C1, 4, 128)),
        weights=jnp.asarray(w_arr.reshape(C1, 4, 128)),
        rl_t=jnp.asarray(rl_t2.reshape(C2p // 8, 8, CHUNK)),
        rb_of=jnp.asarray(rb_of),
        tail=tail,
        padded_nodes=P,
        n_cb=n_cb,
        n_rbp=n_rbp,
        quantum=Q,
        g1=g1,
        g2=g2,
    )


GB1 = 32  # pass-1 chunks per grid step
GB2 = 8   # pass-2 8-chunk blocks per grid step


def _gather_kernel(x_ref, cl_ref, w_ref, e_ref, *, chunks_per_cb: int):
    c0 = pl.program_id(0) * GB1
    R = x_ref.shape[0]

    def body(j, _):
        c = c0 + j
        # Clamp for grid-padding chunks past the last column block
        # (their weights are 0, so the window contents are irrelevant).
        cw8 = jnp.minimum((c // chunks_per_cb) * (WINDOW // 128), R - 8)
        X = x_ref[pl.ds(cw8, 8), :]
        cl = cl_ref[pl.ds(j, 1)][0].astype(jnp.int32)
        q = cl >> 7
        l = cl & 127
        g = jnp.zeros((4, 128), jnp.float32)
        for qq in range(8):
            cand = jnp.take_along_axis(
                jnp.broadcast_to(X[qq : qq + 1, :], (4, 128)), l, axis=1
            )
            g = g + jnp.where(q == qq, cand, 0.0)
        e_ref[pl.ds(j, 1)] = (g * w_ref[pl.ds(j, 1)][0])[None]
        return 0

    lax.fori_loop(0, GB1, body, 0)


def _reduce_kernel(rb_ref, e_ref, rl_ref, y_ref, *, ry: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 1)

    def body(b, _):
        eT = jnp.transpose(e_ref[pl.ds(b, 1)][0])    # (8,512) -> (512,8)
        rlT = jnp.transpose(rl_ref[pl.ds(b, 1)][0].astype(jnp.int32))
        for j in range(8):
            e_col = eT[:, j : j + 1]
            rl_col = rlT[:, j : j + 1]
            rb = rb_ref[(c * GB2 + b) * 8 + j]
            for h in range(RBLOCK // 128):
                oh = (rl_col == iota + 128 * h).astype(jnp.float32)
                part = jnp.sum(oh * e_col, axis=0, keepdims=True)
                base = rb * (RBLOCK // 128) + h
                y_ref[pl.ds(base, 1), :] += part
        return 0

    lax.fori_loop(0, GB2, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_cb", "n_rbp", "quantum", "g1", "g2", "interpret"),
)
def _spmv_v2_call(
    col_local,
    weights,
    rl_t,
    rb_of,
    x2d: jnp.ndarray,
    *,
    n_cb: int,
    n_rbp: int,
    quantum: int,
    g1: int,
    g2: int,
    interpret: bool = False,
):
    C1 = col_local.shape[0]
    C2g = rl_t.shape[0]
    R = x2d.shape[0]
    Q = quantum
    ry = max(R, n_rbp * (RBLOCK // 128))

    e1 = pl.pallas_call(
        functools.partial(_gather_kernel, chunks_per_cb=g1 // CHUNK),
        out_shape=jax.ShapeDtypeStruct((C1, 4, 128), jnp.float32),
        grid=(C1 // GB1,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((GB1, 4, 128), lambda c: (c, 0, 0)),
            pl.BlockSpec((GB1, 4, 128), lambda c: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((GB1, 4, 128), lambda c: (c, 0, 0)),
        interpret=interpret,
    )(x2d, col_local, weights)

    # Dense bucket transpose: (cb, rbp, Q) -> (rbp, cb*Q), pad to g2.
    S1 = n_cb * g1
    et = (
        e1.reshape(-1)[:S1]
        .reshape(n_cb, n_rbp, Q)
        .transpose(1, 0, 2)
        .reshape(n_rbp, n_cb * Q)
    )
    et = jnp.pad(et, ((0, 0), (0, g2 - n_cb * Q)))
    C2 = n_rbp * g2 // CHUNK
    et = jnp.pad(
        et.reshape(C2, CHUNK), ((0, C2g * 8 - C2), (0, 0))
    ).reshape(C2g, 8, CHUNK)

    y = pl.pallas_call(
        functools.partial(_reduce_kernel, ry=ry),
        out_shape=jax.ShapeDtypeStruct((ry, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C2g // GB2,),
            in_specs=[
                pl.BlockSpec((GB2, 8, CHUNK), lambda c, *_: (c, 0, 0)),
                pl.BlockSpec((GB2, 8, CHUNK), lambda c, *_: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (ry, 128), lambda c, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(rb_of, et, rl_t)
    return y[:R]

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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from eig_kl_tpu.graph.csr import Graph

CHUNK = 512           # entries per chunk, laid out (4, 128)
WINDOW = 1024         # x-window and y-window size (8 x 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class SpmvPlan(NamedTuple):
    """Static routing plan for one sparse matrix (a JAX pytree).

    Attributes:
      cw8: int32[C] per-chunk x-window start, in (*,128)-row units.
      rw8: int32[C] per-chunk y-window start, in (*,128)-row units.
      col_local: int32[C,4,128] entry column minus window base (0..1023).
      row_local: int32[C,4,128] entry row minus window base (0..1023).
      weights: f32[C,4,128] entry weights (0 for padding entries).
      route_src: int32[C,8,128] flat chunk position (0..511) of the
        segment-last entry for each y-window row; 0 where invalid.
      route_valid: f32[C,8,128] 1.0 where the window row receives a
        total from this chunk, else 0.0.
      padded_nodes: n rounded up to a multiple of 1024.
    """

    cw8: jnp.ndarray
    rw8: jnp.ndarray
    col_local: jnp.ndarray
    row_local: jnp.ndarray
    weights: jnp.ndarray
    route_src: jnp.ndarray
    route_valid: jnp.ndarray
    padded_nodes: int

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
    n: int, rows: np.ndarray, cols: np.ndarray, weights: np.ndarray
) -> SpmvPlan:
    """Build the static chunk plan from COO entries (host, NumPy)."""
    P = _round_up(max(n, 1), WINDOW)
    nnz = rows.shape[0]
    if nnz == 0:
        rows = np.zeros(1, np.int64)
        cols = np.zeros(1, np.int64)
        weights = np.zeros(1, np.float32)
        nnz = 1

    stripe = cols // WINDOW
    order = np.lexsort((cols, rows, stripe))
    rows, cols, weights = rows[order], cols[order], weights[order]
    stripe = stripe[order]

    # Chunk boundaries: stay within one stripe and one 1024-row window.
    starts = []
    ends = []
    i = 0
    stripe_end_at = np.searchsorted(
        stripe, np.arange(stripe[-1] + 2)
    )  # stripe_end_at[s] = first index of stripe >= s
    while i < nnz:
        s = stripe[i]
        se = stripe_end_at[s + 1]
        # Clamp so the 1024-row y-window never overruns the padded array.
        rw_base = min((rows[i] // 128) * 128, P - WINDOW)
        # last entry allowed: row < rw_base + WINDOW
        je = np.searchsorted(rows[i:se], rw_base + WINDOW) + i
        j = min(i + CHUNK, je, se)
        starts.append(i)
        ends.append(j)
        i = j
    C = len(starts)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    counts = ends - starts

    cw8 = (stripe[starts] * (WINDOW // 128)).astype(np.int32)
    rw_base = np.minimum((rows[starts] // 128) * 128, P - WINDOW)
    rw8 = (rw_base // 128).astype(np.int32)

    # Scatter entries into (C, 512) with padding that extends the last
    # real segment with zero weight.
    flat_pos = np.arange(nnz) - np.repeat(starts, counts)
    chunk_id = np.repeat(np.arange(C), counts)
    col_local = np.zeros((C, CHUNK), np.int32)
    row_local = np.zeros((C, CHUNK), np.int32)
    w_arr = np.zeros((C, CHUNK), np.float32)
    col_local[chunk_id, flat_pos] = cols - stripe[starts][chunk_id] * WINDOW
    row_local[chunk_id, flat_pos] = rows - rw_base[chunk_id]
    w_arr[chunk_id, flat_pos] = weights
    # Padding rows continue the last real segment (weight stays 0).
    last_rl = row_local[np.arange(C), counts - 1]
    pad_mask = np.arange(CHUNK)[None, :] >= counts[:, None]
    row_local = np.where(pad_mask, last_rl[:, None], row_local)

    # Segment-last flat positions -> routing map.
    nxt = np.roll(row_local, -1, axis=1)
    is_last = (np.arange(CHUNK)[None, :] == CHUNK - 1) | (nxt != row_local)
    c_idx, p_idx = np.nonzero(is_last)
    r_idx = row_local[c_idx, p_idx]
    route_src = np.zeros((C, WINDOW), np.int32)
    route_valid = np.zeros((C, WINDOW), np.float32)
    route_src[c_idx, r_idx] = p_idx
    route_valid[c_idx, r_idx] = 1.0

    return SpmvPlan(
        cw8=jnp.asarray(cw8),
        rw8=jnp.asarray(rw8),
        col_local=jnp.asarray(col_local.reshape(C, 4, 128)),
        row_local=jnp.asarray(row_local.reshape(C, 4, 128)),
        weights=jnp.asarray(w_arr.reshape(C, 4, 128)),
        route_src=jnp.asarray(route_src.reshape(C, 8, 128)),
        route_valid=jnp.asarray(route_valid.reshape(C, 8, 128)),
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


def _spmv_kernel(cw_ref, rw_ref, x_ref, cl_ref, rl_ref, w_ref, src_ref, val_ref, y_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    lane4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    flat4 = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0) * 128 + lane4

    # --- expand: g[p] = x_window[col_local[p]] -------------------------
    X = x_ref[pl.ds(cw_ref[c], 8), :]
    cl = cl_ref[0]
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
    rl = rl_ref[0]
    for k in (1, 2, 4, 8, 16, 32, 64, 128, 256):
        se = _flat_shift(e, k, lane4)
        sr = _flat_shift(rl, k, lane4)
        m = (sr == rl) & (flat4 >= k)
        e = e + jnp.where(m, se, 0.0)

    # --- route segment totals into the y window ------------------------
    src = src_ref[0]
    ps = src >> 7
    pl_ = src & 127
    out = jnp.zeros((8, 128), jnp.float32)
    for qq in range(4):
        cand = jnp.take_along_axis(
            jnp.broadcast_to(e[qq : qq + 1, :], (8, 128)), pl_, axis=1
        )
        out = out + jnp.where(ps == qq, cand, 0.0)
    out = out * val_ref[0]

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
        plan.route_valid,
    )


def spmv_pallas(
    plan: SpmvPlan, x: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    """``A @ x`` through the chunk plan.  x: float[n] (any float dtype,
    computed in f32).  Returns float32[n]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P = plan.padded_nodes
    n = x.shape[0]
    x2d = (
        jnp.zeros(P, jnp.float32).at[:n].set(x.astype(jnp.float32)).reshape(P // 128, 128)
    )
    y = _spmv_call(plan, x2d, interpret=interpret)
    return y.reshape(-1)[:n]

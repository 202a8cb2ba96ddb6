"""Graph containers: host-side symmetric CSR and device-side padded ELL.

The reference keeps three redundant adjacency structures (Eigen sparse,
upper-triangular hash maps, and flattened CSR -- SURVEY.md C2-C4).  Here
there is exactly one host container (:class:`Graph`, symmetric CSR with
an upper-triangular COO view) and one device container
(:class:`DeviceGraph`).

:class:`DeviceGraph` uses the padded **ELL** layout -- ``(n, max_deg)``
index/weight matrices, rows padded with the row's own index and weight
0 -- because XLA wants static shapes and because the two hot access
patterns of the TPU KL engine are exactly ELL-shaped:

* full SpMV ``A @ x`` = gather + row-sum over the lane axis (the
  connectionsKernel analog, gKL.cu:104-145);
* O(degree) incremental updates = gather/scatter of *one* ELL row.

Padding with (self, 0.0) makes both patterns branch-free: gathered pads
contribute ``0 * x[i]`` and scattered pads add ``0`` to the node's own
slot.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np

# jax is imported lazily inside the device-facing methods: the
# host-side ``Graph`` half of this module is pure NumPy and is all the
# no-jax CPU fast path needs (bin/eigkl runs it under ``python -S``,
# skipping the ~9 s axon-sitecustomize jax boot).  An eager module-level
# import would drag jax into every entry point via the package
# __init__ re-exports.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=64)
def _ell_scatter_fn(n, dmax, dtype_name):
    """Jitted scatter factory: (flat positions, indices, weights) ->
    padded ELL pair.  Memoized per (n, dmax, dtype) so repeated builds
    of the same shape hit jit's in-memory cache (a fresh closure per
    call would retrace every time); a cold process pays one compile
    (persisted by the compilation cache) instead of ~10 eager dispatch
    compiles."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def build(flat, idx, w):
        base = jax.lax.broadcasted_iota(jnp.int32, (n, dmax), 0).reshape(-1)
        ell_idx = base.at[flat].set(idx).reshape(n, dmax)
        ell_w = (
            jnp.zeros((n * dmax,), jnp.dtype(dtype_name))
            .at[flat]
            .set(w)
            .reshape(n, dmax)
        )
        return ell_idx, ell_w

    return build


def _ell_scatter(n, dmax, dtype_name, flat, idx, w):
    return _ell_scatter_fn(n, dmax, dtype_name)(flat, idx, w)


@dataclasses.dataclass(frozen=True)
class Graph:
    """Symmetric weighted graph in CSR form (host / NumPy).

    Attributes:
      num_nodes: node count n.
      indptr: int64[n+1] CSR row offsets (both edge directions stored,
        like the flattened adjacency at gKL.cu:248-268).
      indices: int32[nnz] column indices, sorted within each row.
      data: float64[nnz] edge weights.
    """

    num_nodes: int
    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray

    @classmethod
    def from_upper_coo(
        cls, n: int, rows: np.ndarray, cols: np.ndarray, weights: np.ndarray
    ) -> "Graph":
        """Build from deduplicated upper-triangular COO (rows < cols)."""
        # Symmetrize: store both directions.
        r = np.concatenate([rows, cols]).astype(np.int64)
        c = np.concatenate([cols, rows]).astype(np.int64)
        w = np.concatenate([weights, weights])
        order = np.lexsort((c, r))
        r, c, w = r[order], c[order], w[order]
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(r, minlength=n), out=indptr[1:])
        return cls(
            num_nodes=n,
            indptr=indptr,
            indices=c.astype(np.int32),
            data=np.asarray(w),
        )

    @property
    def nnz(self) -> int:
        """Stored entries (2x the undirected edge count)."""
        return int(self.indices.shape[0])

    @property
    def degrees(self) -> np.ndarray:
        """Unweighted degree (neighbors per node)."""
        return np.diff(self.indptr)

    @property
    def weighted_degrees(self) -> np.ndarray:
        """deg_i = sum_j w_ij."""
        out = np.zeros(self.num_nodes, dtype=self.data.dtype)
        np.add.at(out, np.repeat(np.arange(self.num_nodes), self.degrees), self.data)
        return out

    @property
    def total_weight(self) -> float:
        """Sum of undirected edge weights T = sum_{i<j} w_ij."""
        return float(self.data.sum()) / 2.0

    @property
    def max_degree(self) -> int:
        d = self.degrees
        return int(d.max()) if d.size else 0

    def upper_coo(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(rows, cols, weights) with rows < cols, each edge once."""
        r = np.repeat(np.arange(self.num_nodes, dtype=np.int64), self.degrees)
        c = self.indices.astype(np.int64)
        keep = r < c
        return r[keep], c[keep], self.data[keep]

    def edge_weight(self, u: int, v: int) -> float:
        """w(u, v), 0 if absent (getEdgeWeight, cKL.cpp:75-82)."""
        lo, hi = self.indptr[u], self.indptr[u + 1]
        j = np.searchsorted(self.indices[lo:hi], v)
        if j < hi - lo and self.indices[lo + j] == v:
            return float(self.data[lo + j])
        return 0.0

    def relabel(self, perm: np.ndarray) -> "Graph":
        """Relabel nodes: old node ``perm[p]`` becomes new node ``p``.

        Mirrors cKL's random-init ensemble (cKL.cpp:175-193): the
        reference scans ``remain[]`` in shuffle order, so equal-gain
        ties break by *permutation* position, not node index.  Our
        engines tie-break by index, so running on the relabeled graph
        with the first-half/second-half split reproduces the
        reference's randomized tie-breaking exactly.
        """
        n = self.num_nodes
        new_id = np.empty(n, dtype=np.int64)
        new_id[perm] = np.arange(n, dtype=np.int64)
        rows = new_id[np.repeat(np.arange(n, dtype=np.int64), self.degrees)]
        cols = new_id[self.indices.astype(np.int64)]
        order = np.lexsort((cols, rows))
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows, minlength=n), out=indptr[1:])
        return Graph(
            num_nodes=n,
            indptr=indptr,
            indices=cols[order].astype(np.int32),
            data=self.data[order],
        )

    def to_ell(
        self, pad_multiple: int = 8, dtype=None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Pad CSR rows into (n, dmax) ELL index/weight matrices.

        Pad entries hold (row's own index, weight 0.0).  ``dtype``
        overrides the weight dtype (building f32 directly halves the
        host write volume vs building f64 and converting).
        """
        n = self.num_nodes
        deg = self.degrees
        dmax = max(_round_up(self.max_degree, pad_multiple), pad_multiple)
        ell_idx = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, dmax))
        ell_w = np.zeros((n, dmax), dtype=dtype or self.data.dtype)
        # Position of each stored entry inside its row.
        pos = np.arange(self.nnz, dtype=np.int64) - np.repeat(self.indptr[:-1], deg)
        row = np.repeat(np.arange(n, dtype=np.int64), deg)
        ell_idx[row, pos] = self.indices
        ell_w[row, pos] = self.data
        return ell_idx, ell_w

    def ell_on_device(self, pad_multiple: int = 8, dtype="float32"):
        """Build the padded ELL *on device* from CSR-sized uploads.

        For degree-skewed graphs the padded ELL is much larger than the
        CSR it encodes (ibm10's max-degree-574 rows pad to 320 MB vs
        17 MB of CSR), so ship (indices, weights, flat scatter
        positions) and scatter into the (n, dmax) pad layout on device
        via one jitted scatter (a single cacheable compile -- the
        round-2 eager version cost ~54 s of one-time compiles at 200K
        nodes).  Produces bit-identical arrays to :meth:`to_ell`.
        """
        import jax.numpy as jnp

        n = self.num_nodes
        deg = self.degrees
        dmax = max(_round_up(self.max_degree, pad_multiple), pad_multiple)
        pos = np.arange(self.nnz, dtype=np.int64) - np.repeat(self.indptr[:-1], deg)
        row = np.repeat(np.arange(n, dtype=np.int64), deg)
        flat = row * dmax + pos
        idx_dtype = np.int32 if n * dmax < 2**31 else np.int64
        return _ell_scatter(
            n,
            dmax,
            jnp.dtype(dtype).name,
            jnp.asarray(flat.astype(idx_dtype)),
            jnp.asarray(self.indices),
            jnp.asarray(self.data.astype(jnp.dtype(dtype))),
        )

    def to_device(
        self, pad_multiple: int = 8, dtype="float32", with_plan: bool = False
    ) -> "DeviceGraph":
        """Build the device graph.  ``with_plan=True`` attaches the
        chunk-planned Pallas SpMV routing (used automatically by
        :func:`eig_kl_tpu.ops.partition.spmv` for f32 matvecs on TPU,
        where XLA's scalar-loop gather is ~1000x off HBM speed)."""
        import os

        import jax.numpy as jnp

        n = self.num_nodes
        dmax = max(_round_up(self.max_degree, pad_multiple), pad_multiple)
        ell_bytes = n * dmax * (4 + jnp.dtype(dtype).itemsize)
        # Host-build + upload is compile-free and costs ~3.9 s at 200K
        # nodes (77 MB over the tunnel); the on-device scatter build
        # only wins when the padded ELL is transfer-bound.
        threshold = int(
            os.environ.get("EIG_KL_TPU_ELL_DEVICE_BYTES", str(192 << 20))
        )
        import jax

        key = None
        if self.nnz > 32_768:
            from eig_kl_tpu.ops import plan_cache

            key = plan_cache.graph_key(self)
        if self.nnz > 0 and ell_bytes > threshold:
            ell_idx, ell_w = self.ell_on_device(pad_multiple, dtype)
            hostside = ()
        else:
            # Build weights directly in the target dtype (halves the
            # host write volume) and ship EVERYTHING in one batched
            # device_put: on the axon plugin each individual transfer
            # pays ~1.5 s of tunnel round-trip latency regardless of
            # size, so per-array jnp.asarray calls dominate the build.
            # Host-side dtype conversion also avoids dispatching
            # one-off convert programs (remote compiles) per shape.
            # The padded ELL is a pure function of the graph: disk-
            # cached next to the SpMV plan (ops/plan_cache.py).
            hostside = None
            if key is not None:
                from eig_kl_tpu.ops import plan_cache

                hostside = plan_cache.load_ell(key, pad_multiple, dtype)
            if hostside is None:
                hostside = self.to_ell(pad_multiple, dtype=dtype)
                if key is not None:
                    plan_cache.save_ell(key, pad_multiple, dtype, *hostside)
            hostside = tuple(hostside)
        batch = jax.device_put(
            hostside
            + (
                np.asarray(self.weighted_degrees, dtype=dtype),
                np.asarray(self.total_weight, dtype=dtype),
            )
        )
        if hostside:
            ell_idx, ell_w, degrees, total_weight = batch
        else:
            degrees, total_weight = batch
        plan = None
        if with_plan:
            from eig_kl_tpu.ops.spmv_pallas import plan_for_graph

            plan = plan_for_graph(self)
        return DeviceGraph(
            ell_indices=ell_idx,
            ell_weights=ell_w,
            degrees=degrees,
            total_weight=total_weight,
            plan=plan,
        )


class DeviceGraph(NamedTuple):
    """Device-resident padded-ELL adjacency (a JAX pytree).

    Attributes:
      ell_indices: int32[n, dmax] neighbor ids, padded with own row id.
      ell_weights: float[n, dmax] edge weights, padded with 0.
      degrees: float[n] weighted degrees (sum_j w_ij).
      total_weight: float scalar, T = sum_{i<j} w_ij.
      plan: optional chunk plan for the Pallas SpMV kernel
        (:class:`eig_kl_tpu.ops.spmv_pallas.SpmvPlan`).
    """

    ell_indices: jnp.ndarray
    ell_weights: jnp.ndarray
    degrees: jnp.ndarray
    total_weight: jnp.ndarray
    plan: object | None = None

    @property
    def num_nodes(self) -> int:
        return self.ell_indices.shape[0]

    @property
    def max_degree(self) -> int:
        return self.ell_indices.shape[1]

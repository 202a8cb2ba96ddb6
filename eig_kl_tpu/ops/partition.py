"""Cut-size and KL-gain semantics as dense vector algebra.

The central TPU-native identity: encode the partition as a *signed* side
vector ``s in {+1, -1}^n`` (side 0 -> +1, side 1 -> -1).  Then with the
symmetric weighted adjacency ``A``:

* ``s_i * (A s)_i  = I_i - E_i``  (internal minus external weight), so
  the KL "D-value" of every node is one SpMV:
  ``D = E - I = -s * (A s)``  -- the whole connectionsKernel
  (gKL.cu:104-145) collapses to a gather + row-sum.
* ``E_i = (deg_i - s_i (A s)_i) / 2`` and the cut is
  ``cut = sum_i E_i / 2 = (sum_i deg_i - s^T A s) / 4``.
* Swapping a (side 0) with b (side 1) changes the cut by
  ``-(D_a + D_b - 2 w_ab)`` -- the swap-gain used at cKL.cpp:360 and
  gKL.cu:384-414.

Everything here is pure jnp on :class:`DeviceGraph` and jit/vmap/shard
friendly.  These are the reference implementations; Pallas kernels in
:mod:`eig_kl_tpu.ops.pallas_kernels` specialize the hot ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from eig_kl_tpu.graph.csr import DeviceGraph


def sides_to_signs(sides: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """0/1 side labels -> +1/-1 signs (side 0 -> +1.0)."""
    return (1.0 - 2.0 * sides.astype(dtype)).astype(dtype)


def signs_to_sides(s: jnp.ndarray) -> jnp.ndarray:
    """+1/-1 signs -> 0/1 side labels."""
    return (s < 0).astype(jnp.int8)


def spmv(g: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    """``A @ x`` -- the workhorse of both gains and the spectral phase
    (sparseMVKernel analog, gKL2.cu:65-89).

    Dispatch: if the graph carries a chunk plan and the compute dtype is
    f32, use the Pallas lane-shuffle kernel (vector-speed gathers);
    otherwise the padded-ELL gather + row-sum (pads gather the row's own
    x with weight 0, so they contribute nothing).
    """
    if g.plan is not None and g.ell_weights.dtype == jnp.float32:
        from eig_kl_tpu.ops.spmv_pallas import spmv_pallas

        return spmv_pallas(g.plan, x)
    return (g.ell_weights * x[g.ell_indices].astype(g.ell_weights.dtype)).sum(axis=1)


def gains(g: DeviceGraph, s: jnp.ndarray, a_s: jnp.ndarray | None = None) -> jnp.ndarray:
    """KL D-values for all nodes: ``D = E - I = -s * (A s)``.

    Args:
      g: device graph.
      s: signed side vector (+1 / -1).
      a_s: optional precomputed ``A @ s`` (the KL engine maintains it
        incrementally across swaps).
    """
    if a_s is None:
        a_s = spmv(g, s)
    return -s * a_s


def external_costs(
    g: DeviceGraph, s: jnp.ndarray, a_s: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-node external (cut-crossing) weight E_i = (deg_i - s_i (A s)_i)/2."""
    if a_s is None:
        a_s = spmv(g, s)
    return 0.5 * (g.degrees - s * a_s)


def cut_size(
    g: DeviceGraph, s: jnp.ndarray, a_s: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Total cut weight: sum of weights of edges crossing the partition.

    From-scratch evaluation -- the self-verification oracle the
    reference applies at termination (gKL.cu:524-530).
    """
    if a_s is None:
        a_s = spmv(g, s)
    return 0.25 * (g.degrees.sum() - jnp.vdot(s, a_s))


def edge_weight(g: DeviceGraph, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """w(u, v) via one ELL-row gather (nodeConnection analog,
    gKL.cu:337-344).  O(max_degree), fine for per-swap use."""
    row_idx = g.ell_indices[u]
    row_w = g.ell_weights[u]
    return jnp.where(row_idx == v, row_w, 0.0).sum()


def swap_gain(
    g: DeviceGraph,
    d: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
) -> jnp.ndarray:
    """Cut reduction from swapping nodes a and b across the cut:
    ``gain = D_a + D_b - 2 w_ab`` (cKL.cpp:360; gKL.cu:384-414)."""
    return d[a] + d[b] - 2.0 * edge_weight(g, a, b)

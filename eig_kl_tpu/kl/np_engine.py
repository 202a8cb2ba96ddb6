"""Pure-NumPy KL engine — the zero-compile CPU fast path.

Same algorithm and semantics as the XLA while-loop engine
(:mod:`eig_kl_tpu.kl.engine`, itself matching cKL.cpp:288-406): per
swap, ``D = -s * (A s)``, one masked first-max argmax per side, the
swap gain ``D_a + D_b - 2 w_ab``, an O(degree) cached ``A s`` update,
and the ``floor(log2 n) + 5`` consecutive-non-improving termination.

Why it exists: a JAX process pays compile time at first execution — on
the axon TPU plugin a *remote* compile with 80-600 s variance, and even
on XLA:CPU ~3-4 s for the while-loop engine.  The reference binary
(cKL.cpp:424) starts computing instantly.  For the circuit sizes where
compile dwarfs compute (fract 149 … ibm10 70K nodes), this engine runs
the identical refinement in plain NumPy with zero compile and zero JAX
import, which is what lets ``bin/eigkl`` serve a cold ``kl fract -EIG``
in ~2 s instead of 160+.

Parity: with float64 arithmetic the swap trajectory (a, b, gain, cut)
is bit-identical to the XLA engine's (tests/test_np_engine.py); float32
matches to roundoff (reduction order differs in the initial SpMV).
"""

from __future__ import annotations

import numpy as np

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.kl.result import KLResult, best_iteration, replay_swaps
from eig_kl_tpu.utils.config import KLConfig


def spmv_np(g: Graph, x: np.ndarray) -> np.ndarray:
    """``A @ x`` on the host CSR, O(nnz)."""
    row = np.repeat(np.arange(g.num_nodes, dtype=np.int64), g.degrees)
    out = np.zeros(g.num_nodes, dtype=x.dtype)
    np.add.at(out, row, (g.data.astype(x.dtype) * x[g.indices]))
    return out


def cut_size_np(g: Graph, s: np.ndarray, a_s: np.ndarray | None = None) -> float:
    """cut = (sum_i deg_i - s^T A s) / 4 (ops/partition.py:78)."""
    if a_s is None:
        a_s = spmv_np(g, s)
    deg = g.data.astype(s.dtype).sum()
    return float(0.25 * (deg - np.dot(s, a_s)))


def refine_np(
    g: Graph,
    sides: np.ndarray,
    config: KLConfig = KLConfig(),
    dtype=np.float32,
) -> KLResult:
    """Run one KL pass to termination in NumPy; return host result.

    Mirrors :func:`eig_kl_tpu.kl.engine.refine` exactly (selection,
    gain arithmetic, termination, logging); composes with
    :func:`eig_kl_tpu.kl.multipass.refine_multipass` and
    :func:`~eig_kl_tpu.kl.multipass.refine_ils` like every other
    backend.
    """
    n = g.num_nodes
    sides = np.asarray(sides, dtype=np.int8)
    n1 = int(sides.astype(np.int64).sum())
    natural_cap = min(n - n1, n1)
    max_iters = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )
    dtype = np.dtype(dtype).type
    gain_eps = dtype(config.gain_eps)
    terminate_limit = config.terminate_limit(n)
    refresh = config.refresh_interval

    data = g.data.astype(dtype)
    indptr, indices = g.indptr, g.indices

    s = (1.0 - 2.0 * sides.astype(dtype)).astype(dtype)
    a_s = spmv_np(g, s)
    deg_total = data.sum()
    cut = dtype(0.25) * (deg_total - np.dot(s, a_s).astype(dtype))
    cut0 = cut
    best_cut = cut

    log_cut = np.zeros(max_iters + 1, dtype=dtype)
    log_gain = np.zeros(max_iters + 1, dtype=dtype)
    log_a = np.zeros(max_iters + 1, dtype=np.int32)
    log_b = np.zeros(max_iters + 1, dtype=np.int32)
    log_cut[0] = cut

    free = np.ones(n, dtype=bool)
    n_free0 = n - n1
    n_free1 = n1
    it = 0
    terminate = 0
    neg = dtype(-np.inf)
    two = dtype(2.0)

    while it < max_iters and n_free0 > 0 and n_free1 > 0:
        d = -s * a_s
        d_left = np.where((s > 0) & free, d, neg)
        d_right = np.where((s < 0) & free, d, neg)
        a = int(np.argmax(d_left))
        b = int(np.argmax(d_right))
        d_a, d_b = d_left[a], d_right[b]

        lo, hi = indptr[a], indptr[a + 1]
        idx_a, w_a = indices[lo:hi], data[lo:hi]
        lo, hi = indptr[b], indptr[b + 1]
        idx_b, w_b = indices[lo:hi], data[lo:hi]
        w_ab = w_a[idx_a == b].sum(dtype=dtype)
        gain = d_a + d_b - two * w_ab

        cut = cut - gain
        if cut < best_cut:
            best_cut = cut

        s_a, s_b = s[a], s[b]
        a_s[idx_a] += (-two * s_a) * w_a
        a_s[idx_b] += (-two * s_b) * w_b
        s[a] = -s_a
        s[b] = -s_b
        free[a] = False
        free[b] = False
        n_free0 -= 1
        n_free1 -= 1

        terminate = terminate + 1 if gain <= gain_eps else 0
        it += 1
        log_cut[it] = cut
        log_gain[it] = gain
        log_a[it] = a
        log_b[it] = b
        if refresh > 0 and it % refresh == 0:
            a_s = spmv_np(g, s)
        if terminate > terminate_limit:
            break

    # From-scratch oracle: never trust the incrementally-updated a_s.
    verified = dtype(0.25) * (deg_total - np.dot(s, spmv_np(g, s)).astype(dtype))
    init_sides = sides
    return KLResult(
        sides=(s < 0).astype(np.int8),
        best_sides=replay_swaps(
            init_sides, log_a, log_b, best_iteration(log_cut, it)
        ),
        initial_cut=float(cut0),
        final_cut=float(cut),
        best_cut=float(best_cut),
        verified_cut=float(verified),
        iterations=it,
        cut_trajectory=log_cut[: it + 1],
        gain_trajectory=log_gain[: it + 1],
    )

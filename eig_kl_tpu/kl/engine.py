"""TPU-native KL refinement engine.

The reference KL loop (cKL.cpp:288-406, gKL.cu:417-549) does, per swap:
re-run a gain kernel over every unlocked node (with a host->device copy
of the work lists and membership and a device->host copy of the gains),
an O(n) host argmax, and an O(n) ``std::find``-based swap.  Here the
*entire* refinement runs as one ``jax.lax.while_loop`` compiled by XLA;
no host<->device traffic happens between swaps, and per-swap work is:

* ``D = -s * a_s``: elementwise over n (the cached SpMV),
* two masked argmaxes over n (node selection, first-max tie-breaking
  exactly like the strict ``>`` scans at cKL.cpp:341-355 and
  gKL.cu:469-481),
* O(max_degree) gather/scatter to update the cached ``a_s = A @ s``
  after flipping the two chosen nodes (replacing the reference's full
  gain-kernel relaunch),
* scalar bookkeeping (cut, termination counter, trajectory log).

Shrinking ``remain[]`` lists become a fixed-shape ``free`` mask; locked
nodes are excluded with ``-inf`` gains.  Selection picks the max-D node
on *each* side and swaps them 1-for-1 with
``gain = D_a + D_b - 2 w_ab``; termination is ``floor(log2 n) + 5``
consecutive non-improving swaps or side exhaustion, matching the
reference semantics exactly.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.kl.result import KLResult, best_iteration, replay_swaps
from eig_kl_tpu.ops import partition as P
from eig_kl_tpu.utils.config import KLConfig

__all__ = ["KLResult", "kl_step", "refine", "best_iteration", "replay_swaps"]


class _LoopState(NamedTuple):
    s: jnp.ndarray          # float[n], +1/-1 signed sides
    a_s: jnp.ndarray        # float[n], cached A @ s
    free: jnp.ndarray       # bool[n], unlocked nodes
    cut: jnp.ndarray        # scalar, incrementally tracked cut
    best_cut: jnp.ndarray   # scalar, min cut seen (tracked, not rolled back,
                            # matching cKL.cpp:363)
    n_free0: jnp.ndarray    # int32, unlocked nodes on side 0
    n_free1: jnp.ndarray    # int32, unlocked nodes on side 1
    iteration: jnp.ndarray  # int32, swaps performed
    terminate: jnp.ndarray  # int32, consecutive non-improving swaps
    stop: jnp.ndarray       # bool
    log_cut: jnp.ndarray    # float[max_iters+1]
    log_gain: jnp.ndarray   # float[max_iters+1]
    log_a: jnp.ndarray      # int32[max_iters+1], left node of each swap
    log_b: jnp.ndarray      # int32[max_iters+1], right node of each swap


class _KLOutput(NamedTuple):
    s: jnp.ndarray
    cut: jnp.ndarray
    best_cut: jnp.ndarray
    initial_cut: jnp.ndarray
    verified_cut: jnp.ndarray
    iterations: jnp.ndarray
    log_cut: jnp.ndarray
    log_gain: jnp.ndarray
    log_a: jnp.ndarray
    log_b: jnp.ndarray


def kl_step(g: DeviceGraph, state: _LoopState, gain_eps: float, terminate_limit: int) -> _LoopState:
    """One KL swap: select best pair, swap, update cached state.

    Jittable; used both by the while_loop body and exposed for sharded
    execution.
    """
    s, a_s, free = state.s, state.a_s, state.free
    d = -s * a_s
    neg = jnp.asarray(-jnp.inf, dtype=d.dtype)
    d_left = jnp.where((s > 0) & free, d, neg)
    d_right = jnp.where((s < 0) & free, d, neg)
    # jnp.argmax returns the first maximal index: same tie-breaking as
    # the reference's strict-> scans (cKL.cpp:341-347).
    a = jnp.argmax(d_left)
    b = jnp.argmax(d_right)
    d_a = d_left[a]
    d_b = d_right[b]

    idx_a, w_a = g.ell_indices[a], g.ell_weights[a]
    idx_b, w_b = g.ell_indices[b], g.ell_weights[b]
    w_ab = jnp.where(idx_a == b, w_a, 0.0).sum()
    gain = d_a + d_b - 2.0 * w_ab

    cut = state.cut - gain
    best_cut = jnp.minimum(cut, state.best_cut)

    # Flip both nodes and update the cached A @ s in O(max_degree):
    # flipping node x adds (-2 * s_x_old) * A[:, x] to A @ s.
    s_a, s_b = s[a], s[b]
    a_s = a_s.at[idx_a].add(-2.0 * s_a * w_a)
    a_s = a_s.at[idx_b].add(-2.0 * s_b * w_b)
    s = s.at[a].set(-s_a).at[b].set(-s_b)
    free = free.at[a].set(False).at[b].set(False)

    non_improving = gain <= gain_eps
    terminate = jnp.where(non_improving, state.terminate + 1, 0)
    stop = terminate > terminate_limit
    it = state.iteration + 1
    return _LoopState(
        s=s,
        a_s=a_s,
        free=free,
        cut=cut,
        best_cut=best_cut,
        n_free0=state.n_free0 - 1,
        n_free1=state.n_free1 - 1,
        iteration=it,
        terminate=terminate,
        stop=stop,
        log_cut=state.log_cut.at[it].set(cut),
        log_gain=state.log_gain.at[it].set(gain),
        log_a=state.log_a.at[it].set(a.astype(jnp.int32)),
        log_b=state.log_b.at[it].set(b.astype(jnp.int32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "gain_eps", "terminate_limit", "refresh_interval"),
)
def _kl_loop(
    g: DeviceGraph,
    sides0: jnp.ndarray,
    max_iters: int,
    gain_eps: float,
    terminate_limit: int,
    refresh_interval: int,
) -> _KLOutput:
    dtype = g.ell_weights.dtype
    n = g.num_nodes
    s0 = P.sides_to_signs(sides0, dtype=dtype)
    a_s0 = P.spmv(g, s0)
    cut0 = P.cut_size(g, s0, a_s0)

    log_cut = jnp.zeros(max_iters + 1, dtype=dtype).at[0].set(cut0)
    log_gain = jnp.zeros(max_iters + 1, dtype=dtype)
    n1 = jnp.sum(sides0.astype(jnp.int32))
    init = _LoopState(
        s=s0,
        a_s=a_s0,
        free=jnp.ones(n, dtype=bool),
        cut=cut0,
        best_cut=cut0,
        n_free0=jnp.asarray(n, jnp.int32) - n1,
        n_free1=n1,
        iteration=jnp.asarray(0, jnp.int32),
        terminate=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(False),
        log_cut=log_cut,
        log_gain=log_gain,
        log_a=jnp.zeros(max_iters + 1, jnp.int32),
        log_b=jnp.zeros(max_iters + 1, jnp.int32),
    )

    def cond(st: _LoopState):
        return (
            (~st.stop)
            & (st.iteration < max_iters)
            & (st.n_free0 > 0)
            & (st.n_free1 > 0)
        )

    def body(st: _LoopState):
        st = kl_step(g, st, gain_eps, terminate_limit)
        if refresh_interval > 0:
            st = st._replace(
                a_s=jax.lax.cond(
                    st.iteration % refresh_interval == 0,
                    lambda: P.spmv(g, st.s),
                    lambda: st.a_s,
                )
            )
        return st

    final = jax.lax.while_loop(cond, body, init)
    verified = P.cut_size(g, final.s)
    return _KLOutput(
        s=final.s,
        cut=final.cut,
        best_cut=final.best_cut,
        initial_cut=cut0,
        verified_cut=verified,
        iterations=final.iteration,
        log_cut=final.log_cut,
        log_gain=final.log_gain,
        log_a=final.log_a,
        log_b=final.log_b,
    )


def refine(
    g: DeviceGraph,
    sides: np.ndarray | jnp.ndarray,
    config: KLConfig = KLConfig(),
) -> KLResult:
    """Run KL refinement to termination on device; return host result."""
    n = g.num_nodes
    sides = jnp.asarray(np.asarray(sides), dtype=jnp.int8)
    n1 = int(np.asarray(sides, dtype=np.int64).sum())
    natural_cap = min(n - n1, n1)
    max_iters = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )
    out = _kl_loop(
        g,
        sides,
        max_iters=max_iters,
        gain_eps=config.gain_eps,
        terminate_limit=config.terminate_limit(n),
        refresh_interval=config.refresh_interval,
    )
    iterations = int(out.iterations)
    init_sides = np.asarray(sides, dtype=np.int8)
    return KLResult(
        # Host-side sign decode: an eager signs_to_sides(out.s) would
        # dispatch two tiny one-off programs (less + convert) per
        # process — pure cold-start cost on the axon plugin.
        sides=(np.asarray(out.s) < 0).astype(np.int8),
        best_sides=replay_swaps(
            init_sides,
            np.asarray(out.log_a),
            np.asarray(out.log_b),
            best_iteration(np.asarray(out.log_cut), iterations),
        ),
        initial_cut=float(out.initial_cut),
        final_cut=float(out.cut),
        best_cut=float(out.best_cut),
        verified_cut=float(out.verified_cut),
        iterations=iterations,
        cut_trajectory=np.asarray(out.log_cut)[: iterations + 1],
        gain_trajectory=np.asarray(out.log_gain)[: iterations + 1],
    )

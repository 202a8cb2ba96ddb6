"""Node-sharded KL refinement over an ICI device mesh.

Shards the padded ELL adjacency, the cached ``A @ s``, the gain values
and the lock mask across the ``"mp"`` mesh axis; the signed side vector
and all scalar bookkeeping stay replicated.  Per swap the collectives
are tiny and ride the ICI:

* selection: local masked argmax per shard, then an ``all_gather`` of
  one (value, index) candidate pair per device + replicated argmax --
  the distributed analog of the host argmax at gKL.cu:469-481, with
  identical first-max tie-breaking (shards are contiguous node ranges).
* swap update: the two chosen adjacency rows are broadcast with
  ``psum`` (owner contributes, others zero) and every shard scatter-adds
  the entries that land in its ``A @ s`` range.

There is *no* per-iteration host round-trip -- the entire refinement is
one ``shard_map``-ped ``lax.while_loop``, the multi-chip generalization
of the single-chip engine in eig_kl_tpu.kl.engine (both produce
identical trajectories; see tests/test_sharded.py).

Nodes are padded to a multiple of the shard count with zero-degree,
permanently-locked dummies, so shapes stay static and balanced.
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
from eig_kl_tpu.utils.config import KLConfig


class _ShardState(NamedTuple):
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


def _pad_ell(g: Graph, n_pad: int, dtype):
    """Padded ELL arrays: rows n..n_pad are zero-degree self-loops."""
    ell_idx, ell_w = g.to_ell()
    n, dmax = ell_idx.shape
    if n_pad > n:
        pad_idx = np.tile(
            np.arange(n, n_pad, dtype=np.int32)[:, None], (1, dmax)
        )
        ell_idx = np.vstack([ell_idx, pad_idx])
        ell_w = np.vstack([ell_w, np.zeros((n_pad - n, dmax), ell_w.dtype)])
    deg = np.zeros(n_pad, dtype=np.float64)
    deg[:n] = g.weighted_degrees
    return ell_idx, ell_w.astype(dtype), deg.astype(dtype)


@functools.cache
def _build_sharded_kl(
    mesh: Mesh,
    n_valid: int,
    max_iters: int,
    gain_eps: float,
    terminate_limit: int,
):
    """Compile the shard-mapped refinement loop for a given mesh."""

    def run(ell_idx, ell_w, deg, sides, n0, n1):
        # Local views: ell_idx/ell_w (n_l, dmax), deg (n_l,);
        # sides (n_pad,) and the scalars are replicated.
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

        init = _ShardState(
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

        def select(mask, d_l):
            """Masked first-max over the sharded gain vector."""
            dm = jnp.where(mask, d_l, neg)
            li = jnp.argmax(dm)
            vals = jax.lax.all_gather(dm[li], "mp")
            idxs = jax.lax.all_gather(r0 + li, "mp")
            p = jnp.argmax(vals)
            return idxs[p].astype(jnp.int32), vals[p]

        def fetch_row(node):
            """Broadcast ELL row of `node` from its owner shard."""
            own = (node >= r0) & (node < r0 + n_l)
            ln = jnp.clip(node - r0, 0, n_l - 1)
            row_i = jnp.where(own, ell_idx[ln], 0)
            row_w = jnp.where(own, ell_w[ln], 0.0)
            return (
                jax.lax.psum(row_i, "mp"),
                jax.lax.psum(row_w, "mp"),
            )

        def scatter_row(a_s_l, row_i, row_w, coeff):
            tgt = row_i - r0
            ok = (tgt >= 0) & (tgt < n_l)
            return a_s_l.at[jnp.clip(tgt, 0, n_l - 1)].add(
                jnp.where(ok, coeff * row_w, 0.0)
            )

        def cond(st: _ShardState):
            return (
                (~st.stop)
                & (st.iteration < max_iters)
                & (st.n_free0 > 0)
                & (st.n_free1 > 0)
            )

        def body(st: _ShardState):
            s_l = jax.lax.dynamic_slice(st.s, (r0,), (n_l,))
            d_l = -s_l * st.a_s_l
            a, d_a = select((s_l > 0) & st.free_l, d_l)
            b, d_b = select((s_l < 0) & st.free_l, d_l)

            row_ia, row_wa = fetch_row(a)
            row_ib, row_wb = fetch_row(b)
            w_ab = jnp.where(row_ia == b, row_wa, 0.0).sum()
            gain = d_a + d_b - 2.0 * w_ab

            cut = st.cut - gain

            s_a, s_b = st.s[a], st.s[b]
            a_s_l = scatter_row(st.a_s_l, row_ia, row_wa, -2.0 * s_a)
            a_s_l = scatter_row(a_s_l, row_ib, row_wb, -2.0 * s_b)
            s = st.s.at[a].set(-s_a).at[b].set(-s_b)
            free_l = st.free_l & (g_ids != a) & (g_ids != b)

            non_improving = gain <= gain_eps
            terminate = jnp.where(non_improving, st.terminate + 1, 0)
            it = st.iteration + 1
            return _ShardState(
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
        # From-scratch verification (the gKL.cu:524-530 oracle),
        # computed sharded + psum-reduced.
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
        in_specs=(P("mp", None), P("mp", None), P("mp"), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_refine(
    g: Graph,
    sides: np.ndarray,
    mesh: Mesh,
    config: KLConfig = KLConfig(),
    *,
    dtype=jnp.float32,
) -> KLResult:
    """Run KL refinement sharded over the mesh's "mp" axis.

    Produces trajectories identical to the single-chip engine
    (eig_kl_tpu.kl.engine.refine) on the same input.
    """
    n = g.num_nodes
    n_shards = mesh.shape["mp"]
    n_pad = ((n + n_shards - 1) // n_shards) * n_shards
    ell_idx, ell_w, deg = _pad_ell(g, n_pad, np.dtype(jnp.dtype(dtype).name))

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

    fn = _build_sharded_kl(
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

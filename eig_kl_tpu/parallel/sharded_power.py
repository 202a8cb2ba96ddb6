"""Node-sharded spectral phase (power iteration) over an ICI mesh.

The spectral solve is the dominant end-to-end phase (70-90% of wall
time at 200K+ nodes), and unlike the KL swap loop it is *throughput*
bound -- one SpMV per iteration -- so it is exactly the part of the
pipeline where multi-chip sharding pays.  Row-block decomposition:

* the padded ELL adjacency rows, weighted degrees, and the local output
  block are sharded over the ``"mp"`` axis;
* the iterate ``x`` is replicated: each shard computes its local block
  of ``y = x - (L x) / shift`` (the gKL2 operator, gKL2.cu:65-89 /
  335-353), contributes its partial sum-of-squares to a ``psum`` norm,
  and an ``all_gather`` rebuilds the replicated iterate.

Per-iteration communication is one f32 all-gather of n/S elements per
chip plus one scalar psum; compute per chip is nnz/S multiply-adds.
At ibm18 scale (202K nodes, 1.1M nnz) the all-gather moves ~800 KB
over ICI (~10 us) against a ~1.3 ms single-chip matvec -- near-linear
scaling until n/S drops under ~50K rows per chip.

Semantics match :func:`eig_kl_tpu.spectral.power.power_iteration_fiedler`
with the "gkl2" convergence rule (fixed-point parity is exercised in
tests/test_sharded.py on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.parallel.sharded_kl import _pad_ell
from eig_kl_tpu.utils.config import SpectralConfig


@functools.cache
def _build_sharded_power(
    mesh: Mesh,
    n_valid: int,
    shift: float,
    tolerance: float,
    min_iters: int,
    max_iters: int,
    seed: int,
):
    def run(ell_idx, ell_w, deg, x_init):
        n_l = ell_idx.shape[0]
        dtype = ell_w.dtype
        inv_shift = 1.0 / shift
        safe_deg = jnp.where(deg > 0, deg, 1.0)
        me = jax.lax.axis_index("mp")
        r0 = me * n_l
        # Padding rows (>= n_valid) are zero-degree self-loops
        # (_pad_ell) and x_init is zero there, so the iterate stays 0
        # on the padding throughout.
        g_ids = r0 + jax.lax.broadcasted_iota(jnp.int32, (n_l, 1), 0)[:, 0]
        valid_l = g_ids < n_valid

        def step(x):
            # x: replicated (n_pad,).  Local block of the shift-inverted
            # normalized-Laplacian step (gKL2.cu:65-89).
            x_l = jax.lax.dynamic_slice(x, (r0,), (n_l,))
            ax_l = (ell_w * x[ell_idx]).sum(axis=1)
            lx_l = 2.0 * x_l - 2.0 * ax_l / safe_deg
            y_l = x_l - inv_shift * lx_l
            nrm = jnp.sqrt(jax.lax.psum(jnp.vdot(y_l, y_l), "mp"))
            safe = nrm > 0
            y_l = jnp.where(safe, y_l / jnp.where(safe, nrm, 1.0), y_l)
            y = jax.lax.all_gather(y_l, "mp").reshape(-1)
            return y, nrm

        x0, n0 = step(x_init)

        def cond(st):
            x, nrm, prev, it = st
            done = (jnp.abs(nrm - prev) < tolerance) & (it > min_iters)
            return (~done) & (it < max_iters)

        def body(st):
            x, nrm, _prev, it = st
            x2, nrm2 = step(x)
            return (x2, nrm2, nrm, it + 1)

        x, nrm, _prev, iters = jax.lax.while_loop(
            cond,
            body,
            (x0, n0, jnp.asarray(0.0, dtype), jnp.asarray(1, jnp.int32)),
        )
        # Rayleigh quotient of the normalized Laplacian, psum-reduced.
        x_l = jax.lax.dynamic_slice(x, (r0,), (n_l,))
        ax_l = (ell_w * x[ell_idx]).sum(axis=1)
        lx_l = 2.0 * x_l - 2.0 * ax_l / safe_deg
        lam = jax.lax.psum(jnp.vdot(x_l, jnp.where(valid_l, lx_l, 0.0)), "mp")
        return x, lam, iters

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P("mp", None), P("mp", None), P("mp"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_power_fiedler(
    g: Graph,
    mesh: Mesh,
    config: SpectralConfig = SpectralConfig(solver="power"),
    *,
    dtype=jnp.float32,
):
    """Run the gKL2 power iteration sharded over the mesh's "mp" axis.

    Args:
      g: host CSR graph with the "kl" weighting (gKL2 reuses the KL
        adjacency for its Laplacian, gKL2.cu:262-303).
      mesh: mesh with an "mp" axis; rows are padded to a multiple of
        its size with zero-degree dummies.

    Returns:
      (rayleigh_quotient, fiedler_vector[n]) -- same contract as the
      single-chip :func:`power_iteration_fiedler` in "gkl2" mode.
    """
    n = g.num_nodes
    n_shards = mesh.shape["mp"]
    n_pad = ((n + n_shards - 1) // n_shards) * n_shards
    ell_idx, ell_w, deg = _pad_ell(g, n_pad, np.dtype(jnp.dtype(dtype).name))
    fn = _build_sharded_power(
        mesh,
        n_valid=n,
        shift=config.shift,
        tolerance=config.tolerance,
        min_iters=config.min_power_iters,
        max_iters=config.max_iterations,
        seed=config.seed,
    )
    # Same draw as the single-chip solver (power.py): bit-identical
    # trajectories when n is already a multiple of the shard count.
    jdt = jnp.dtype(dtype)
    key = jax.random.PRNGKey(config.seed)  # srand(42) analog
    x_init = (
        jnp.zeros(n_pad, jdt)
        .at[:n]
        .set(jax.random.uniform(key, (n,), dtype=jdt) - 0.5)
    )
    x, lam, iters = fn(
        jnp.asarray(ell_idx), jnp.asarray(ell_w), jnp.asarray(deg), x_init
    )
    globals()["last_iterations"] = int(iters)
    return lam, x[:n]


#: iteration count of the most recent run (mirrors spectral.power).
last_iterations: int = 0

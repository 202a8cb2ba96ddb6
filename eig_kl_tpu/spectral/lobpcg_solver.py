"""Preconditioned LOBPCG for the smallest nontrivial Laplacian pair.

``jax.experimental.sparse.linalg.lobpcg_standard`` only finds *largest*
eigenpairs and its docstring rules out the smallest-pair problem (no
preconditioning support) -- and the naive workaround, flipping the
spectrum with ``c I - L``, separates lambda_2 from lambda_3 by
``(lambda_3 - lambda_2) / c ~ 1e-4`` and stalls.  This module is a
native block LOBPCG (Knyazev's locally-optimal basis [X | W | P],
Rayleigh-Ritz on the orthonormalized 3k-column subspace) aimed directly
at the smallest end, with a Jacobi (inverse-degree) preconditioner and
analytic deflation of the constant nullvector.

Everything is tall-skinny-matmul shaped: the per-iteration work is one
blocked SpMV (k sparse matvecs), one (n,3k) QR, and a (3k,3k) eigh --
exactly the MXU-friendly profile SURVEY.md section 7 asks of the
spectral phase.  This is the third solver backend next to lanczos
(cEIG parity, cEIG.cpp:193-207) and power (gKL2 parity,
gKL2.cu:257-432).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.ops.partition import spmv
from eig_kl_tpu.utils.config import SpectralConfig


class LobpcgResult(NamedTuple):
    eigenvalue: jnp.ndarray   # lambda_2
    vector: jnp.ndarray       # Fiedler vector, unit norm
    iterations: jnp.ndarray
    residual: jnp.ndarray     # ||L v - lambda v|| of the returned pair


@functools.partial(jax.jit, static_argnames=("k", "m", "tol", "seed", "dtype"))
def _lobpcg_core(g, k, m, tol, seed, dtype):
    dtype = jnp.dtype(dtype)
    n = g.num_nodes
    deg = g.degrees.astype(dtype)
    inv_deg = jnp.where(deg > 0, 1.0 / jnp.where(deg > 0, deg, 1.0), 1.0)

    def deflate(X):
        return X - jnp.mean(X, axis=0, keepdims=True)

    def lap(X):  # L X = deg * X - A X, blocked over columns
        return deg[:, None] * X - jax.vmap(
            lambda col: spmv(g, col.astype(g.ell_weights.dtype)).astype(dtype),
            in_axes=1,
            out_axes=1,
        )(X)

    def rayleigh_ritz(S):
        """Orthonormalize S, Rayleigh-Ritz, return smallest-k pairs."""
        Q, _ = jnp.linalg.qr(deflate(S))
        AQ = lap(Q)
        G = Q.T @ AQ
        theta, Y = jnp.linalg.eigh(0.5 * (G + G.T))
        return Q, theta[:k], Y[:, :k]

    key = jax.random.PRNGKey(seed)
    X0 = deflate(jax.random.normal(key, (n, k), dtype=dtype))
    Q0, theta0, Y0 = rayleigh_ritz(X0)
    X = Q0 @ Y0
    P = jnp.zeros_like(X)

    def body(carry):
        X, P, theta, _res, it = carry
        AX = lap(X)
        R = AX - X * theta[None, :]
        res = jnp.linalg.norm(R, axis=0)
        W = deflate(inv_deg[:, None] * R)  # Jacobi-preconditioned step
        S = jnp.concatenate([X, W, P], axis=1)
        Q, theta2, Y = rayleigh_ritz(S)
        X2 = Q @ Y
        # New conjugate direction: the part of X2 outside span(X).
        P2 = X2 - X @ (X.T @ X2)
        pn = jnp.linalg.norm(P2, axis=0)
        P2 = jnp.where(pn[None, :] > 1e-12, P2 / jnp.where(pn > 1e-12, pn, 1.0)[None, :], 0.0)
        return X2, P2, theta2, res, it + 1

    def cond(carry):
        _X, _P, theta, res, it = carry
        # Converge on the wanted (smallest) pair only.
        done = res[0] <= tol * jnp.maximum(1.0, jnp.abs(theta[0]))
        return (~done) & (it < m)

    res0 = jnp.full((k,), jnp.inf, dtype)
    X, P, theta, res, it = jax.lax.while_loop(
        cond, body, (X, P, theta0, res0, jnp.asarray(0, jnp.int32))
    )
    vec = deflate(X[:, 0])
    vec = vec / jnp.linalg.norm(vec)
    lam = vec @ lap(vec[:, None])[:, 0]
    resid = jnp.linalg.norm(lap(vec[:, None])[:, 0] - lam * vec)
    return lam, vec, it, resid


def lobpcg_fiedler(
    g: DeviceGraph,
    config: SpectralConfig = SpectralConfig(solver="lobpcg"),
    *,
    dtype=jnp.float64,
) -> LobpcgResult:
    """Compute (lambda_2, v_2) of the clique-expansion Laplacian.

    Args:
      g: DeviceGraph built with the "eig" weighting (2/k).
      config: ``max_iterations`` caps LOBPCG iterations; ``tolerance``
        is the relative residual bound on the wanted pair.
      dtype: f64 for pure-device golden parity; f32 (+ the automatic
        host refinement in :func:`eig_partition`) for speed.
    """
    k = 4 if g.num_nodes >= 32 else 2  # wanted pair + guard vectors
    lam, vec, iters, resid = _lobpcg_core(
        g,
        k=k,
        m=config.max_iterations,
        tol=config.tolerance,
        seed=config.seed,
        dtype=jnp.dtype(dtype).name,
    )
    return LobpcgResult(
        eigenvalue=lam, vector=vec, iterations=iters, residual=resid
    )

"""Thick-restart Lanczos for the Fiedler pair (lambda_2, v_2).

The reference's spectral phase uses Spectra's implicitly-restarted
Lanczos on the clique-expansion Laplacian with nev=2,
ncv=min(100, n/2) (cEIG.cpp:193-207).  This is the TPU-native
equivalent: a thick-restart Lanczos (TRLan -- mathematically equivalent
to implicit restarting) built entirely from SpMV + tall-skinny matmuls,
which XLA maps onto the MXU.  Differences by design:

* The exact zero eigenpair (constant vector) of the Laplacian is
  **deflated analytically** -- every operator application is projected
  onto the complement of ``ones`` -- so the solver targets lambda_2
  directly instead of computing the known lambda_1 = 0 like the
  reference does.
* Full reorthogonalization against the whole basis (one fused
  ``V @ (V^T w)`` matmul pair per step) replaces selective schemes;
  at ncv <= 100 the cost is negligible and the numerics are airtight.
* The Laplacian is never materialized: ``L x = deg * x - A x`` reuses
  the ELL adjacency SpMV (the 2/k "eig" weighting,
  cEIG.cpp:110,126-130).

The restart loop runs on host (one scalar sync per restart, same as
Spectra's outer loop); each m-step Lanczos pass is a single jitted
``fori_loop``.

Caveat (applies equally to the reference's Spectra solve): a
*disconnected* graph has lambda_2 = 0 with multiplicity = number of
components, and the "Fiedler vector" is an arbitrary nullspace vector.
The synthetic generator's uniform sampling leaves ~7% of nodes isolated
at full scale, so spectral init on generator circuits is inherently
noise-level; the reference's golden EIG outputs only cover connected
benchmark circuits.  Use the power init (gKL2 parity) or random init
for disconnected inputs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.ops.partition import spmv
from eig_kl_tpu.utils.config import SpectralConfig


class LanczosResult(NamedTuple):
    eigenvalue: jnp.ndarray   # lambda_2
    vector: jnp.ndarray       # Fiedler vector, unit norm
    residual: jnp.ndarray     # ||L v - lambda v||
    restarts: int
    converged: bool


def laplacian_matvec(g: DeviceGraph, x: jnp.ndarray) -> jnp.ndarray:
    """L x = deg * x - A x (L = D - A, the PSD clique-expansion
    Laplacian built at cEIG.cpp:86-133)."""
    return g.degrees * x - spmv(g, x)


def _deflate(x: jnp.ndarray) -> jnp.ndarray:
    """Project out the constant nullvector: x - mean(x)."""
    return x - jnp.mean(x)


@functools.partial(jax.jit, static_argnames=("m",))
def _lanczos_pass(
    g: DeviceGraph,
    V: jnp.ndarray,      # (m+1, n) basis rows; rows >= j_start are ignored
    H: jnp.ndarray,      # (m, m) Rayleigh-Ritz matrix (filled cols < j_start)
    j_start: jnp.ndarray,
    m: int,
):
    """Extend the Lanczos factorization from basis size j_start to m.

    Records full projection coefficients into H (Rayleigh-Ritz matrix
    V^T L V), which subsumes both the tridiagonal part and the
    arrow-head coupling after a thick restart.
    """

    def body(j, carry):
        V, H = carry
        v_j = V[j]
        # The exact nullvector (constant) is handled purely by
        # deflation: every operator output is projected onto the
        # complement of `ones` here and re-projected after the
        # orthogonalization below, so rounding cannot regrow a spurious
        # lambda ~ 0 Ritz pair.
        w = _deflate(laplacian_matvec(g, v_j))
        # Two-pass full reorthogonalization (rows >= j+1 of V are zero,
        # so they contribute nothing).
        c1 = V @ w
        w = w - V.T @ c1
        c2 = V @ w
        w = w - V.T @ c2
        # Re-deflate: rounding in the projections can regrow the
        # constant nullvector, and Lanczos amplifies any leaked
        # nullspace component toward a spurious lambda = 0.
        w = _deflate(w)
        c = (c1 + c2)[:m]
        # Column j and row j of the symmetric Rayleigh-Ritz matrix.
        H = H.at[:, j].set(c).at[j, :].set(c)
        beta = jnp.linalg.norm(w)
        safe = beta > 1e-30
        v_next = jnp.where(safe, w / jnp.where(safe, beta, 1.0), 0.0)
        V = V.at[j + 1].set(v_next)
        H = jax.lax.cond(
            j + 1 < m, lambda H: H.at[j + 1, j].set(beta).at[j, j + 1].set(beta),
            lambda H: H, H,
        )
        return V, H

    return jax.lax.fori_loop(j_start, m, body, (V, H))


def lanczos_fiedler(
    g: DeviceGraph,
    config: SpectralConfig = SpectralConfig(),
    *,
    dtype=jnp.float64,
) -> LanczosResult:
    """Compute (lambda_2, v_2) of the clique-expansion Laplacian.

    Args:
      g: DeviceGraph built with the "eig" weighting (2/k).
      config: tolerances; ``num_lanczos`` defaults to min(100, n//2)
        like Spectra's ncv (cEIG.cpp:195).
      dtype: float64 gives Spectra-parity to 1e-6; float32 for speed.
    """
    n = g.num_nodes
    m = config.num_lanczos or min(100, max(n // 2, 2))
    m = min(m, n - 1)
    keep = max(2, min(16, m // 3))
    tol = config.tolerance

    if g.ell_weights.dtype != dtype:
        g = g._replace(
            ell_weights=g.ell_weights.astype(dtype),
            degrees=g.degrees.astype(dtype),
            total_weight=g.total_weight.astype(dtype),
        )

    key = jax.random.PRNGKey(config.seed)
    v0 = _deflate(jax.random.normal(key, (n,), dtype=dtype))
    v0 = v0 / jnp.linalg.norm(v0)

    V = jnp.zeros((m + 1, n), dtype=dtype).at[0].set(v0)
    H = jnp.zeros((m, m), dtype=dtype)
    j_start = jnp.asarray(0, jnp.int32)

    lam = jnp.asarray(0.0, dtype)
    vec = v0
    res_norm = jnp.asarray(jnp.inf, dtype)
    converged = False
    restarts = 0

    prev_res = float("inf")
    stagnant = 0
    max_restarts = max(config.max_iterations // m, 30)
    for restarts in range(1, max_restarts + 1):
        V, H = _lanczos_pass(g, V, H, j_start, m)
        theta, Y = jnp.linalg.eigh(H)
        # beta_m: norm of the residual direction before normalization is
        # not carried out of the pass; recover the true residual
        # explicitly for the wanted Ritz pair (cheap: one matvec).
        vec = _deflate(V[:m].T @ Y[:, 0])
        vec = vec / jnp.linalg.norm(vec)
        lam = theta[0]
        r = _deflate(laplacian_matvec(g, vec)) - lam * vec
        res_norm = jnp.linalg.norm(r)
        if float(res_norm) < tol * max(1.0, abs(float(lam))):
            converged = True
            break
        # Stagnation stop: f32 residuals floor out far above typical
        # f64 tolerances; returning the current (good) Ritz pair beats
        # burning the remaining restarts.
        if float(res_norm) > 0.7 * prev_res:
            stagnant += 1
            if stagnant >= 2:
                break
        else:
            stagnant = 0
        prev_res = float(res_norm)
        # Thick restart: lock the `keep` smallest Ritz vectors, then
        # re-append the residual direction as the next basis vector.
        U = (V[:m].T @ Y[:, :keep]).T          # (keep, n) Ritz vectors
        U = U - jnp.mean(U, axis=1, keepdims=True)  # re-deflate
        U = U / jnp.linalg.norm(U, axis=1, keepdims=True)
        r_vec = _deflate(V[m])
        r_norm = jnp.linalg.norm(r_vec)
        r_vec = jnp.where(r_norm > 1e-30, r_vec / jnp.where(r_norm > 1e-30, r_norm, 1.0), V[m])
        V_new = jnp.zeros_like(V).at[:keep].set(U)
        V_new = V_new.at[keep].set(r_vec)
        H_new = jnp.zeros_like(H)
        H_new = H_new.at[jnp.arange(keep), jnp.arange(keep)].set(theta[:keep])
        V, H = V_new, H_new
        j_start = jnp.asarray(keep, jnp.int32)

    return LanczosResult(
        eigenvalue=lam,
        vector=vec,
        residual=res_norm,
        restarts=restarts,
        converged=converged,
    )

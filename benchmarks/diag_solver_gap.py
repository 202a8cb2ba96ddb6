#!/usr/bin/env python
"""Isolate the real power solve's per-iteration gap over the bare chain.

diag_matvec_phases: bare chain (matvec+norm+divide) = 5.61 ms/iter at
1.8M, while the real solve times at ~8.1 ms/iter apparent.  Candidates:
the norm-Laplacian combine's extra elementwise passes, the sign-check
machinery (rank-select median + best_x wheres), or something about the
while_loop state.  Time three variants of the SAME 176 iterations:

  A. chain_fori: matvec + norm + renorm only (the diag baseline);
  B. gkl2-cap: the real solver, convergence="gkl2", tolerance=0 so it
     runs straight to max_iters — full step() combine, NO checks;
  C. sign mode as shipped (checks every 25, best_x bookkeeping).

Usage: python benchmarks/diag_solver_gap.py [spec ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from eig_kl_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.ops.spmv_pallas import spmv_pallas_2d
from eig_kl_tpu.spectral import power as powmod
from eig_kl_tpu.utils.config import SpectralConfig


def load(spec: str):
    ref = os.path.join("/root/reference/circuit", f"{spec}.hgr")
    if os.path.exists(ref):
        return read_hgr(ref), spec
    return read_hgr(os.path.join(HERE, "data", f"gen_{spec}_42.hgr")), f"gen{spec}"


def fence(y):
    return float(jnp.asarray(y).reshape(-1)[0])


@functools.partial(jax.jit, static_argnames=("k",))
def chain_fori(plan, x2d, k: int):
    def one(_, x):
        y = spmv_pallas_2d(plan, x, inter_dtype=jnp.bfloat16)
        nrm = jnp.linalg.norm(y)
        return y / jnp.where(nrm > 0, nrm, 1.0)

    return jax.lax.fori_loop(0, k, one, x2d)


def main() -> int:
    specs = sys.argv[1:] or ["9.0"]
    print(f"backend={jax.default_backend()}")
    for spec in specs:
        hg, name = load(spec)
        g = clique_expand(hg, "kl")
        dg = g.to_device(with_plan=True)
        n = g.num_nodes
        P = dg.plan.padded_nodes
        x = (
            jnp.zeros(P, jnp.float32)
            .at[:n]
            .set(jax.random.uniform(jax.random.PRNGKey(0), (n,)) - 0.5)
            .reshape(P // 128, 128)
        )

        # How many iterations does the shipped solve run?
        cfg_sign = SpectralConfig(solver="power")
        powmod.power_partition_fiedler(dg, cfg_sign)
        iters = powmod.last_iterations

        def time_solve(cfg, reps=3):
            powmod.power_partition_fiedler(dg, cfg)  # warm/compile
            t0 = time.perf_counter()
            for _ in range(reps):
                powmod.power_partition_fiedler(dg, cfg)
            return (time.perf_counter() - t0) / reps

        # A: bare chain, same iteration count, plus one fetch.
        fence(chain_fori(dg.plan, x, iters))
        t0 = time.perf_counter()
        for _ in range(3):
            y = chain_fori(dg.plan, x, iters)
            h = np.asarray(y)
        t_a = (time.perf_counter() - t0) / 3

        # B: full solver combine, no checks (gkl2 straight to cap).
        cfg_b = SpectralConfig(
            solver="power",
            convergence="gkl2",
            tolerance=0.0,
            max_iterations=iters,
            min_power_iters=iters + 1,
        )
        t_b = time_solve(cfg_b)

        # C: shipped sign mode.
        t_c = time_solve(cfg_sign)

        checks = iters // cfg_sign.check_interval
        print(
            f"{name}: n={n} iters={iters} checks~{checks}\n"
            f"  A bare chain+fetch   {t_a*1e3:8.1f} ms ({t_a/iters*1e3:.3f}/iter)\n"
            f"  B full combine, 0 ck {t_b*1e3:8.1f} ms ({t_b/iters*1e3:.3f}/iter)\n"
            f"  C shipped sign mode  {t_c*1e3:8.1f} ms ({t_c/iters*1e3:.3f}/iter)\n"
            f"  combine cost {(t_b-t_a)/iters*1e3:.3f} ms/iter; "
            f"check cost {(t_c-t_b)/max(checks,1)*1e3:.3f} ms/check"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

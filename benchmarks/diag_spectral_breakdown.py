#!/usr/bin/env python
"""Where does the spectral phase's wall time actually go?

VERDICT r3: at 200K the solve runs 2.4x above its measured compute
floor (126 iters x 0.495 ms).  Before fusing anything, split the
phase into its parts and time each ON CHIP:

  * t_iter   — one bare power step (matvec + combine + norm), from a
               differenced K-step chain;
  * t_check  — one sign-exit check (rank-select median + split compare
               + flip count), differenced chains with/without checks;
  * t_solve  — the real packed solve end-to-end (incl. x0 setup and
               the single fetch);
  * t_fetch  — a packed-size device_get alone.

Usage: python benchmarks/diag_spectral_breakdown.py [spec ...]
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
from eig_kl_tpu.ops.select import upper_median
from eig_kl_tpu.ops.spmv_pallas import spmv_pallas_2d
from eig_kl_tpu.spectral import power as powmod
from eig_kl_tpu.utils.config import SpectralConfig


def load(spec: str):
    ref = os.path.join("/root/reference/circuit", f"{spec}.hgr")
    if os.path.exists(ref):
        return read_hgr(ref), spec
    cache = os.path.join(HERE, "data", f"gen_{spec}_42.hgr")
    if not os.path.exists(cache):
        from eig_kl_tpu.io.hgr import write_hgr
        from eig_kl_tpu.models.generator import CircuitGenerator

        write_hgr(cache, CircuitGenerator(float(spec), seed=42).generate())
    return read_hgr(cache), f"gen{spec}"


def fence(y):
    return float(jnp.asarray(y).reshape(-1)[0])


@functools.partial(jax.jit, static_argnames=("k", "checks", "n"))
def chain(plan, x2d, deg2d, k: int, checks: bool, n: int):
    def step(x):
        y = spmv_pallas_2d(plan, x, inter_dtype=jnp.bfloat16) / deg2d
        nrm = jnp.linalg.norm(y)
        return y / jnp.where(nrm > 0, nrm, 1.0)

    def body(i, carry):
        x, acc = carry
        x = step(x)
        if checks:
            v = x.reshape(-1)[:n]
            med = upper_median(v, n)
            split = med > v
            acc = acc + jnp.sum(split).astype(jnp.int32)
        return (x, acc)

    x, acc = jax.lax.fori_loop(0, k, body, (x2d, jnp.int32(0)))
    return x, acc


def main() -> int:
    specs = sys.argv[1:] or ["1.0", "9.0"]
    print(f"backend={jax.default_backend()}")
    for spec in specs:
        hg, name = load(spec)
        g = clique_expand(hg, "kl")
        dg = g.to_device(with_plan=True)
        n = g.num_nodes
        P = dg.plan.padded_nodes
        deg = jnp.where(dg.degrees > 0, dg.degrees, 1.0).astype(jnp.float32)
        deg2d = jnp.ones(P, jnp.float32).at[:n].set(deg).reshape(P // 128, 128)
        key = jax.random.PRNGKey(42)
        x = jnp.zeros(P, jnp.float32).at[:n].set(
            jax.random.uniform(key, (n,), jnp.float32) - 0.5
        ).reshape(P // 128, 128)

        # --- bare chain per-iteration (differenced 25 vs 100) ---
        def run(k, checks, reps):
            fence(chain(dg.plan, x, deg2d, k, checks, n)[0])
            t0 = time.perf_counter()
            for _ in range(reps):
                y, acc = chain(dg.plan, x, deg2d, k, checks, n)
            fence(y)
            return (time.perf_counter() - t0) / reps

        t25 = run(25, False, 8)
        t100 = run(100, False, 4)
        t_iter = (t100 - t25) / 75
        # --- with a check every iteration: t_check from the delta ---
        c25 = run(25, True, 8)
        c100 = run(100, True, 4)
        t_iterc = (c100 - c25) / 75
        t_check = t_iterc - t_iter

        # --- the real solve ---
        cfg = SpectralConfig(solver="power")
        t0 = time.perf_counter()
        lam, med, vals, sides = powmod.power_partition_fiedler(dg, cfg)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        lam, med, vals, sides = powmod.power_partition_fiedler(dg, cfg)
        t_solve = time.perf_counter() - t0
        iters = powmod.last_iterations

        # --- fetch cost alone ---
        big = chain(dg.plan, x, deg2d, 1, False, n)[0]
        fence(big)
        t0 = time.perf_counter()
        for _ in range(10):
            h = np.asarray(big)
        t_fetch = (time.perf_counter() - t0) / 10

        checks = iters // cfg.check_interval
        model = iters * t_iter + checks * t_check + t_fetch
        print(
            f"{name}: n={n} iters={iters} t_iter={t_iter*1e3:.3f}ms "
            f"t_check={t_check*1e3:.3f}ms t_fetch={t_fetch*1e3:.1f}ms\n"
            f"  solve={t_solve*1e3:.1f}ms (warm; cold {t_cold*1e3:.0f}ms)  "
            f"model={model*1e3:.1f}ms  "
            f"unexplained={(t_solve-model)*1e3:.1f}ms"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

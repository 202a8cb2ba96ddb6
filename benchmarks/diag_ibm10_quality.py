#!/usr/bin/env python
"""Quality vs spectral-iteration-budget on real circuits.

Runs the fused (power EIG -> KL) pipeline with capped power iteration
budgets and reports the downstream KL best cut -- the decision data
for an early sign-exit: if the iter-300 iterate refines as well as the
iter-1000 one, the cap is free speedup (VERDICT r2 missing #4).

Usage: python benchmarks/diag_ibm10_quality.py [circuit] [caps...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from eig_kl_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig


def main() -> int:
    args = sys.argv[1:]
    name = args[0] if args else "ibm10"
    caps = [int(c) for c in args[1:]] or [150, 200, 300, 500, 1000]
    hg = read_hgr(os.path.join("/root/reference/circuit", f"{name}.hgr"))
    on_tpu = jax.default_backend() == "tpu"
    g_host = clique_expand(hg, "kl")
    g = g_host.to_device(dtype=jnp.float32, with_plan=on_tpu)
    if on_tpu:
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        do_refine = lambda sides: refine_mega(mg, sides, KLConfig(gain_eps=1e-6))
    else:
        from eig_kl_tpu.kl.engine import refine

        do_refine = lambda sides: refine(g, sides, KLConfig(gain_eps=1e-6))

    from eig_kl_tpu.spectral import power as powermod

    for cap in caps:
        sc = SpectralConfig(
            solver="power", convergence="sign", max_iterations=cap
        )
        # warm (per-cap compile), then timed
        eig = eig_partition(hg, sc, dtype=jnp.float32, graph=g)
        t0 = time.perf_counter()
        eig = eig_partition(hg, sc, dtype=jnp.float32, graph=g)
        t_spec = time.perf_counter() - t0
        iters = powermod.last_iterations
        t0 = time.perf_counter()
        kl = do_refine(eig.sides)
        t_kl = time.perf_counter() - t0
        print(
            f"{name} cap={cap:5d} used={iters:5d} spectral={t_spec:.3f}s "
            f"init_cut={kl.initial_cut:10.1f} best_cut={kl.best_cut:10.1f} "
            f"kl={t_kl:.3f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

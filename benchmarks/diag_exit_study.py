#!/usr/bin/env python
"""Multi-seed study: downstream KL cut vs power-iteration budget.

The N=1 diagnostic (diag_ibm10_quality.py) showed earlier-stopped
power iterates can refine BETTER than converged ones.  One seed is an
anecdote; this sweeps power seeds x iteration caps per circuit and
prints mean +- std of the downstream best cut and the spectral time,
the decision data for tightening the default sign-exit.

Usage: python benchmarks/diag_exit_study.py [circuits...] [--caps ...]
"""

from __future__ import annotations

import argparse
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
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig


def circuit(name):
    p = os.path.join("/root/reference/circuit", f"{name}.hgr")
    if os.path.exists(p):
        return read_hgr(p)
    return read_hgr(os.path.join(HERE, "data", f"{name}.hgr"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("circuits", nargs="*", default=["ibm01", "industry2", "ibm10"])
    ap.add_argument("--caps", type=int, nargs="*", default=[100, 150, 200, 300, 1000])
    ap.add_argument("--seeds", type=int, nargs="*", default=[42, 43, 44, 45, 46])
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"
    for name in args.circuits:
        hg = circuit(name)
        g_host = clique_expand(hg, "kl")
        g = g_host.to_device(dtype=jnp.float32, with_plan=on_tpu)
        if on_tpu:
            from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

            mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
            do_refine = lambda s: refine_mega(mg, s, KLConfig(gain_eps=1e-6))
        else:
            from eig_kl_tpu.kl.engine import refine

            do_refine = lambda s: refine(g, s, KLConfig(gain_eps=1e-6))
        from eig_kl_tpu.spectral import power as powermod

        for cap in args.caps:
            cuts, specs, useds = [], [], []
            for seed in args.seeds:
                sc = SpectralConfig(
                    solver="power", convergence="sign",
                    max_iterations=cap, seed=seed,
                )
                t0 = time.perf_counter()
                eig = eig_partition(hg, sc, dtype=jnp.float32, graph=g)
                specs.append(time.perf_counter() - t0)
                useds.append(powermod.last_iterations)
                cuts.append(float(do_refine(eig.sides).best_cut))
            cuts = np.asarray(cuts)
            print(
                f"{name:10s} cap={cap:5d} used={int(np.mean(useds)):4d} "
                f"spectral={np.mean(specs[1:]) if len(specs) > 1 else specs[0]:.3f}s "
                f"best_cut={cuts.mean():10.1f} +- {cuts.std(ddof=1):8.1f} "
                f"(min {cuts.min():10.1f})",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

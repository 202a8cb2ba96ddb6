#!/usr/bin/env python
"""Does per-run relabeling close the random-init mean-cut gap?

The reference's random init shuffles remain[] (cKL.cpp:175-193), so
equal-gain ties break in a fresh random order every run; our engines
tie-break by node index, giving every run the same tie order.
Graph.relabel was built to reproduce the reference ensemble (relabel
by the shuffle permutation + first-half/second-half split == the
reference's randomized scan order) but was never wired in.  Measure
both ensembles side by side.

Usage: python benchmarks/diag_relabel.py [circuit] [N]
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
import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.kl.init import random_split
from eig_kl_tpu.utils.config import KLConfig


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "ibm01"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    hg = read_hgr(os.path.join("/root/reference/circuit", f"{name}.hgr"))
    n = hg.num_nodes
    g_host = clique_expand(hg, "kl")
    on_tpu = jax.default_backend() == "tpu"
    config = KLConfig(gain_eps=0.0)

    def run(gh, sides):
        if on_tpu:
            from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

            g = gh.to_device(dtype=jnp.float32, with_plan=True)
            mg = MegaGraph(gh, plan=g.plan, device_graph=g)
            return refine_mega(mg, sides, config)
        from eig_kl_tpu.kl.engine import refine

        return refine(gh.to_device(dtype=jnp.float32), sides, config)

    plain, relab = [], []
    t0 = time.perf_counter()
    for seed in range(N):
        r = run(g_host, random_split(n, seed))
        plain.append(r.best_cut)
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    for seed in range(N):
        rng = np.random.default_rng(seed + 10_000)
        perm = rng.permutation(n)
        gr = g_host.relabel(perm)
        sides = np.zeros(n, np.int8)
        sides[n // 2 :] = 1  # first half side 0 == reference split
        r = run(gr, sides)
        relab.append(r.best_cut)
    t_rel = time.perf_counter() - t0
    plain = np.asarray(plain)
    relab = np.asarray(relab)
    print(
        f"{name} N={N}\n"
        f"  plain:   {plain.mean():9.2f} +- {plain.std(ddof=1):7.2f} "
        f"(min {plain.min():9.2f})  [{t_plain:.1f}s]\n"
        f"  relabel: {relab.mean():9.2f} +- {relab.std(ddof=1):7.2f} "
        f"(min {relab.min():9.2f})  [{t_rel:.1f}s]"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Does gain-arithmetic precision explain the residual random-init gap?

The reference cKL accumulates D values and cut sizes in double
(cKL.cpp:288-406); our engines keep A@s and gains in f32.  Equal-samples
parity shows ours ~1.4 SE worse on ibm01/industry2 means.  This runs OUR
engine at f32 and f64 on the SAME seeds (CPU backend, x64 on) and prints
both distributions: if f64 closes the gap, precision is the cause and the
fix is compensated gain updates (or refresh) in the mega-kernel.

Usage: python benchmarks/diag_precision.py [circuit] [--n 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.kl.init import random_split
from eig_kl_tpu.utils.config import KLConfig


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("circuits", nargs="*", default=["ibm01"])
    ap.add_argument("--n", type=int, default=30)
    args = ap.parse_args()
    config = KLConfig(gain_eps=0.0)  # cKL's "gain <= 0" rule
    for name in args.circuits:
        hg = read_hgr(os.path.join("/root/reference/circuit", f"{name}.hgr"))
        g_host = clique_expand(hg, "kl")
        for dtype in (jnp.float32, jnp.float64):
            g = g_host.to_device(dtype=dtype, with_plan=False)
            cuts, iters = [], []
            t0 = time.perf_counter()
            for seed in range(args.n):
                sides = random_split(hg.num_nodes, seed)
                r = refine(g, sides, config)
                cuts.append(float(r.best_cut))
                iters.append(int(r.iterations))
            dt = time.perf_counter() - t0
            cuts = np.asarray(cuts)
            print(
                f"{name:10s} {np.dtype(dtype).name:8s} "
                f"best_cut={cuts.mean():9.2f} +- {cuts.std(ddof=1):7.2f} "
                f"(min {cuts.min():9.2f}) iters={np.mean(iters):7.1f} "
                f"[{dt:.1f}s total]",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Momentum (Chebyshev) power mode vs the sign-exit default.

Measures, per real circuit: iterations to exit, the Rayleigh quotient
reached, and the downstream single-pass KL best cut from the resulting
median split.  Decision data for whether convergence="momentum" is a
spectral-speed lever (measured: it is NOT -- more iterations than the
sign exit on every real circuit and worse downstream cuts; see
NOTES.md).

Iteration counts and cut quality are platform-independent, so this
runs fine on CPU (forced unless EIG_KL_TPU_DIAG_TPU=1).

Usage: python benchmarks/diag_momentum.py [circuits...]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

if os.environ.get("EIG_KL_TPU_DIAG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.spectral import power as pw
from eig_kl_tpu.spectral.partition import median_split
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig


def main() -> int:
    circuits = sys.argv[1:] or ["ibm01", "industry2", "ibm10"]
    for circ in circuits:
        hg = read_hgr(f"/root/reference/circuit/{circ}.hgr")
        g = clique_expand(hg, "kl")
        dg = g.to_device(dtype=jnp.float32)
        for mode in ("sign", "momentum"):
            cfg = SpectralConfig(
                solver="power", convergence=mode, max_iterations=1000
            )
            t0 = time.time()
            lam, v = pw.power_iteration_fiedler(dg, cfg, dtype=jnp.float32)
            dt = time.time() - t0
            med, sides = median_split(
                jnp.asarray(np.asarray(v)[: hg.num_nodes]), "upper"
            )
            r = refine(
                dg, np.asarray(sides, dtype=np.int8), KLConfig(gain_eps=1e-6)
            )
            print(
                f"{circ:10s} {mode:9s} iters={pw.last_iterations:4d} "
                f"lam={float(lam):.6g} downstream_cut={r.best_cut:9.1f} "
                f"({dt:.1f}s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Justify ``auto_lanczos_max_nodes`` with a measured crossover sweep.

VERDICT r3 weak #6: the fused pipeline's auto solver picks Lanczos at
<= 2048 nodes and the power solver above, but that threshold was
asserted from ONE data point (fract, 149 nodes: lanczos-init descends
to 21.50, power-init to 29.17).  This sweep measures the downstream
single-shot cut (fused, starts=1, passes=0 multi-pass) for BOTH
solver inits across the scale axis:

* the four real circuits (149 / 12,752 / 12,637 / 70,151 nodes), and
* generated circuits at ~512 / ~2048 / ~8192 nodes x 5 generator
  seeds (models/generator.py, the reference's own distribution).

Cut quality is platform-independent; runs forced-CPU.

Usage: python benchmarks/diag_solver_sweep.py [--seeds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # lanczos golden-parity path

import numpy as np

from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.models.generator import CircuitGenerator
from eig_kl_tpu.models.pipelines import fused_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig

# multiplier -> ~nodes: the generator scales linearly (1.0 = 201,920).
GEN_SCALES = [0.0025, 0.01, 0.04]  # ~512, ~2048, ~8192 nodes
REAL = ["fract", "ibm01", "industry2", "ibm10"]


def one(hg, solver: str) -> tuple[float, float]:
    t0 = time.time()
    run = fused_partition(
        hg,
        spectral_config=SpectralConfig(solver=solver),
        kl_config=KLConfig(passes=0),
    )
    return float(run.kl.best_cut), time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(HERE, "parity_results",
                                                  "solver_sweep.jsonl"))
    args = ap.parse_args()
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    for circ in REAL:
        hg = read_hgr(f"/root/reference/circuit/{circ}.hgr")
        lz, t_lz = one(hg, "lanczos")
        pw, t_pw = one(hg, "power")
        emit({"circuit": circ, "n": hg.num_nodes, "seed": None,
              "lanczos": lz, "power": pw,
              "t_lanczos": round(t_lz, 1), "t_power": round(t_pw, 1)})

    for mult in GEN_SCALES:
        for seed in range(args.seeds):
            hg = CircuitGenerator(mult, seed=seed).generate()
            lz, t_lz = one(hg, "lanczos")
            pw, t_pw = one(hg, "power")
            emit({"circuit": f"gen{mult}", "n": hg.num_nodes, "seed": seed,
                  "lanczos": lz, "power": pw,
                  "t_lanczos": round(t_lz, 1), "t_power": round(t_pw, 1)})

    # crossover summary: mean (power - lanczos) per scale bucket
    print("\n== power minus lanczos (negative = power better) ==")
    by = {}
    for r in rows:
        by.setdefault(r["circuit"], []).append(r["power"] - r["lanczos"])
    for k, v in by.items():
        n = next(r["n"] for r in rows if r["circuit"] == k)
        print(f"{k:12s} n={n:7d} mean_delta={np.mean(v):+10.2f} (N={len(v)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

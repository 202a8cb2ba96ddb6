#!/usr/bin/env python
"""Bisect the round-4 headline quality regression (VERDICT r4 weak #1).

BENCH_r03 on gen_1.0_42.hgr seed 42: initial cut 68242.8 -> best 39391.8.
BENCH_r04 on the SAME circuit/seed/solver: initial cut 73201.1 -> best
41900.5.  The init itself moved, so the suspect is the spectral matvec.
The only spectral-matvec changes in round 4 were (a) bf16 WEIGHT
streaming (commit 4865de2 -- intermediates were already bf16 since
round 2) and (b) the exact-histogram (rblock, Q) geometry search + COO
spill tail (commit 66a0e8a -- r3 geometry was rblock=512, lam-rule Q,
v1-chunk tail).

This script runs the spectral phase per configuration CELL in a fresh
subprocess (so geometry/dtype env pins apply cleanly) and reports the
downstream INITIAL cut -- the quantity that regressed.  Optionally
(--kl) it also runs the mega-kernel KL to the final best cut.

Cells:
  r4            auto geometry, bf16 intermediates + bf16 weights (r4 default)
  r4-f32w       auto geometry, bf16 intermediates, f32 weights
  r4-f32        auto geometry, all-f32 matvec
  r3geom        rblock=512 lam-Q, bf16 intermediates + bf16 weights
  r3            rblock=512 lam-Q, bf16 intermediates, f32 weights  (= r3 exactly)
  r3-f32        rblock=512 lam-Q, all-f32 matvec
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CELLS = {
    "r4": {},
    "r4-f32w": {"EIG_KL_TPU_BF16_W": "0"},
    "r4-f32": {"INTER_DTYPE": "float32"},
    "r3geom": {"EIG_KL_TPU_RBLOCK": "512"},
    "r3": {"EIG_KL_TPU_RBLOCK": "512", "EIG_KL_TPU_BF16_W": "0"},
    "r3-f32": {"EIG_KL_TPU_RBLOCK": "512", "INTER_DTYPE": "float32"},
}

_CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.ops.partition import cut_size
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig

circuit, inter_dtype, seed, do_kl = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4] == "1"
hg = read_hgr(circuit)
on_tpu = jax.default_backend() == "tpu"
g = clique_expand(hg, "kl").to_device(dtype=jnp.float32, with_plan=on_tpu)
plan = g.plan
geom = None
if plan is not None and hasattr(plan, "rblock"):
    tail = type(plan.tail).__name__ if plan.tail is not None else "none"
    geom = {"rblock": plan.rblock, "quantum": plan.quantum, "tail": tail}
cfg = SpectralConfig(solver="power", seed=seed, inter_dtype=inter_dtype)
eig = eig_partition(hg, cfg, dtype=jnp.float32, graph=g)
init_cut = float(cut_size(g, eig.sides.astype(jnp.float32)))
out = {"init_cut": init_cut, "geom": geom, "backend": jax.default_backend()}
if do_kl:
    from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
    mg = MegaGraph(clique_expand(hg, "kl"), plan=plan, device_graph=g)
    kl = refine_mega(mg, eig.sides, KLConfig(gain_eps=1e-6))
    out.update(best_cut=float(kl.best_cut), iters=int(kl.iterations))
print("CELL_RESULT " + json.dumps(out))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="benchmarks/data/gen_1.0_42.hgr")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--kl", action="store_true", help="also run KL to best cut")
    ap.add_argument("--cells", default=",".join(CELLS))
    args = ap.parse_args()

    results = {}
    for name in args.cells.split(","):
        pins = CELLS[name]
        env = dict(os.environ)
        inter = "bfloat16"
        for k, v in pins.items():
            if k == "INTER_DTYPE":
                inter = v
            else:
                env[k] = v
        t0 = __import__("time").perf_counter()
        p = subprocess.run(
            [sys.executable, "-c", _CHILD, args.circuit, inter,
             str(args.seed), "1" if args.kl else "0"],
            env=env, capture_output=True, text=True, timeout=900,
        )
        dt = __import__("time").perf_counter() - t0
        line = [l for l in p.stdout.splitlines() if l.startswith("CELL_RESULT ")]
        if not line:
            print(f"{name:10s} FAILED rc={p.returncode}\n{p.stderr[-2000:]}")
            continue
        r = json.loads(line[0][len("CELL_RESULT "):])
        results[name] = r
        extra = f" best={r['best_cut']:.1f} iters={r['iters']}" if args.kl else ""
        print(
            f"{name:10s} init={r['init_cut']:.1f}{extra} "
            f"geom={r['geom']} backend={r['backend']} ({dt:.0f}s)",
            flush=True,
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

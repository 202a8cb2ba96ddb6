#!/usr/bin/env python
"""Quality A/B of the bf16 matvec paths across scales (VERDICT r4 #2).

Round 5's bisect convicted bf16 WEIGHT streaming of the 201k headline
regression (gen1.0 seed 42: init 68.2k -> 73.2k) and made it opt-in.
The remaining default under question is ``inter_dtype="bfloat16"``
(matvec intermediates), justified so far only by provenance ("the
parity samples used it").  This script produces the cut-quality table
that justifies (or kills) the default: for each circuit x dtype cell,
N seeds of spectral power init (seed drives the random start vector)
+ mega-kernel KL to the final best cut.

Cells:
  bf16i   bf16 intermediates, f32 weights   (the round-5 default)
  f32     all-f32 matvec                    (gKL2.cu:65-89 precision baseline)
  bf16w   bf16 intermediates + bf16 weights (the convicted r4 default, for
          the record; enable with --with-bf16w)

One subprocess per (circuit, cell); all seeds run inside it so the
compile/build cost is paid once.  Reports mean +- sd of init and best
cut per cell, and the per-seed rows as JSON.

Usage (on the TPU):
  python benchmarks/diag_bf16_ab.py \
      --circuits benchmarks/data/gen_1.0_42.hgr,/root/reference/circuit/ibm10.hgr
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CELLS = {
    "bf16i": {},
    "f32": {"INTER_DTYPE": "float32"},
    "bf16w": {"EIG_KL_TPU_BF16_W": "1"},
}

_CHILD = r"""
import json, sys
import jax, jax.numpy as jnp
from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
from eig_kl_tpu.ops.partition import cut_size
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig

circuit, inter_dtype, seeds = sys.argv[1], sys.argv[2], [int(s) for s in sys.argv[3].split(",")]
hg = read_hgr(circuit)
on_tpu = jax.default_backend() == "tpu"
g = clique_expand(hg, "kl").to_device(dtype=jnp.float32, with_plan=on_tpu)
mg = MegaGraph(clique_expand(hg, "kl"), plan=g.plan, device_graph=g)
rows = []
for seed in seeds:
    cfg = SpectralConfig(solver="power", seed=seed, inter_dtype=inter_dtype)
    eig = eig_partition(hg, cfg, dtype=jnp.float32, graph=g)
    init_cut = float(cut_size(g, eig.sides.astype(jnp.float32)))
    kl = refine_mega(mg, eig.sides, KLConfig(gain_eps=1e-6))
    rows.append({"seed": seed, "init": init_cut,
                 "best": float(kl.best_cut), "iters": int(kl.iterations)})
    print(f"  seed={seed} init={init_cut:.1f} best={float(kl.best_cut):.1f}",
          file=sys.stderr, flush=True)
print("AB_RESULT " + json.dumps({"rows": rows, "backend": jax.default_backend()}))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--circuits",
        default="benchmarks/data/gen_1.0_42.hgr,/root/reference/circuit/ibm10.hgr",
    )
    ap.add_argument("--seeds", default="42,1,2,3,4")
    ap.add_argument("--with-bf16w", action="store_true")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    cells = ["bf16i", "f32"] + (["bf16w"] if args.with_bf16w else [])
    table = {}
    for circuit in args.circuits.split(","):
        base = os.path.basename(circuit)
        for cell in cells:
            pins = CELLS[cell]
            env = dict(os.environ)
            inter = pins.get("INTER_DTYPE", "bfloat16")
            for k, v in pins.items():
                if k != "INTER_DTYPE":
                    env[k] = v
            t0 = time.perf_counter()
            p = subprocess.run(
                [sys.executable, "-c", _CHILD, circuit, inter, args.seeds],
                env=env, capture_output=True, text=True, timeout=args.timeout,
            )
            dt = time.perf_counter() - t0
            line = [l for l in p.stdout.splitlines() if l.startswith("AB_RESULT ")]
            if not line:
                print(f"{base} {cell}: FAILED rc={p.returncode}\n{p.stderr[-2000:]}")
                continue
            r = json.loads(line[0][len("AB_RESULT "):])
            rows = r["rows"]
            import statistics as st
            inits = [x["init"] for x in rows]
            bests = [x["best"] for x in rows]
            mi, si = st.mean(inits), (st.stdev(inits) if len(inits) > 1 else 0.0)
            mb, sb = st.mean(bests), (st.stdev(bests) if len(bests) > 1 else 0.0)
            table[f"{base}:{cell}"] = {
                "init_mean": round(mi, 1), "init_sd": round(si, 1),
                "best_mean": round(mb, 1), "best_sd": round(sb, 1),
                "rows": rows, "backend": r["backend"],
            }
            print(
                f"{base:18s} {cell:6s} init {mi:10.1f} +-{si:8.1f}   "
                f"best {mb:10.1f} +-{sb:7.1f}   ({dt:.0f}s, {r['backend']})",
                flush=True,
            )
    print(json.dumps(table))
    return 0


if __name__ == "__main__":
    sys.exit(main())

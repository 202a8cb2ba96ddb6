"""Per-swap selection cost microbenchmark for the mega-kernel.

Times the hot refinement at several scales with the selection strategy
forced to flat / hierarchical (monkeypatching HIER_THRESHOLD before the
kernel is traced), reporting us/swap for each.  Used to tune
HIER_THRESHOLD and validate selection optimizations (VERDICT r1 #7).

Usage: python benchmarks/bench_selection.py [mult ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_one(mult: float, modes=("flat", "hier")) -> None:
    import os

    import eig_kl_tpu.kl.megakernel as mk
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr, write_hgr
    from eig_kl_tpu.kl.init import random_split
    from eig_kl_tpu.models.generator import generate_circuit
    from eig_kl_tpu.utils.config import KLConfig

    cache = os.path.join(
        os.path.dirname(__file__), "data", f"gen_{mult}_42.hgr"
    )
    if os.path.exists(cache):
        hg = read_hgr(cache)
    else:
        hg = generate_circuit(mult, seed=42)
        write_hgr(cache, hg)
    g = clique_expand(hg, "kl")
    mg = mk.MegaGraph(g)
    sides = random_split(g.num_nodes, 7)
    cfg = KLConfig()
    saved = mk.HIER_THRESHOLD
    for mode in modes:
        if mode == "flat" and mg.padded_nodes > mk.HIER_THRESHOLD:
            # Flat selection materializes ~6 (R, 128) temporaries in the
            # loop body; above the threshold those plus the state exceed
            # the 16 MB VMEM budget (that is what HIER_THRESHOLD encodes).
            print(f"n={g.num_nodes:>9,}  flat: skipped (VMEM: > HIER_THRESHOLD)")
            continue
        mk.HIER_THRESHOLD = 0 if mode == "hier" else 1 << 62
        # New threshold ⇒ new `hierarchical` static arg ⇒ fresh trace.
        res = mk.refine_mega(mg, sides, cfg)  # compile + warm
        t0 = time.time()
        res = mk.refine_mega(mg, sides, cfg)
        dt = time.time() - t0
        print(
            f"n={g.num_nodes:>9,}  {mode:>4}: {dt:6.3f}s "
            f"{res.iterations:>7} swaps  {dt / max(res.iterations, 1) * 1e6:6.2f} us/swap  "
            f"best={res.best_cut:.1f}"
        )
    mk.HIER_THRESHOLD = saved


if __name__ == "__main__":
    mults = [float(a) for a in sys.argv[1:]] or [0.05, 1.0]
    for m in mults:
        bench_one(m)

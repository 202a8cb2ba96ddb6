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
    import eig_kl_tpu.kl.megakernel as mk
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.kl.init import random_split
    from eig_kl_tpu.models.generator import generate_circuit
    from eig_kl_tpu.utils.config import KLConfig

    hg = generate_circuit(mult, seed=42)
    g = clique_expand(hg, "kl")
    mg = mk.MegaGraph(g)
    sides = random_split(g.num_nodes, 7)
    cfg = KLConfig()
    saved = mk.HIER_THRESHOLD
    for mode in modes:
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

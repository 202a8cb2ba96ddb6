#!/usr/bin/env python
"""Validate the HBM-striped batched multi-start above 1M padded nodes.

Round 2 fell back to a sequential per-start loop above 1<<20 padded
nodes (pipelined VMEM input blocks doubled the footprint); round 3
stages per-start state through HBM stripes, so one launch should hold
to the single-start node ceiling.  This measures S-start batched vs
S sequential single-start runs on a >1M-node generated circuit and
checks the batched results against the sequential ones start-by-start.

Usage: python benchmarks/bench_batch_large.py [mult] [S]
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
from eig_kl_tpu.models.generator import generate_circuit
from eig_kl_tpu.utils.config import KLConfig


def main() -> int:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cache = os.path.join(HERE, "data", f"gen_{mult}_42.hgr")
    if os.path.exists(cache):
        hg = read_hgr(cache)
    else:
        hg = generate_circuit(mult, seed=1)
    print(f"circuit: {hg.num_nodes} nodes, {hg.num_nets} nets")
    assert jax.default_backend() == "tpu", "real-chip validation only"

    from eig_kl_tpu.kl.megakernel import (
        MegaGraph,
        refine_mega,
        refine_mega_batch,
    )

    t0 = time.perf_counter()
    g_host = clique_expand(hg, "kl")
    g = g_host.to_device(dtype=jnp.float32, with_plan=True)
    mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
    print(f"build: {time.perf_counter() - t0:.2f}s padded={mg.padded_nodes}")
    assert mg.padded_nodes > (1 << 20), "pick a mult with >1M padded nodes"

    config = KLConfig(gain_eps=1e-6)
    batch = np.stack([random_split(hg.num_nodes, s) for s in range(S)])

    # warm both shapes outside the timings
    refine_mega(mg, batch[0], config)
    refine_mega_batch(mg, batch, config)

    t0 = time.perf_counter()
    seq = [refine_mega(mg, batch[s], config) for s in range(S)]
    t_seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    bat = refine_mega_batch(mg, batch, config)
    t_bat = time.perf_counter() - t0

    ok = True
    for s in range(S):
        same = (
            seq[s].iterations == bat[s].iterations
            and abs(seq[s].best_cut - bat[s].best_cut) < 1e-2
        )
        ok &= same
        print(
            f"start {s}: seq cut {seq[s].best_cut:.2f} it {seq[s].iterations}"
            f" | bat cut {bat[s].best_cut:.2f} it {bat[s].iterations}"
            f" {'OK' if same else 'MISMATCH'}"
        )
    total_swaps = sum(r.iterations for r in bat)
    print(
        f"S={S}: sequential {t_seq:.2f}s, batched ONE launch {t_bat:.2f}s "
        f"({t_seq / t_bat:.2f}x), {total_swaps} swaps, "
        f"{t_bat / max(total_swaps, 1) * 1e6:.2f} us/swap batched"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

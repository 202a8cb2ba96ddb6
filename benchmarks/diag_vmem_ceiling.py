#!/usr/bin/env python
"""Find the largest single-chip mega-kernel instance (VERDICT r4 #5).

The mega-kernel's per-node VMEM state is 8 B (two (R, 128) f32 arrays,
kl/megakernel.py:11-13); the docstring estimates a ~1.9M-node/chip
ceiling but nobody ever measured where Mosaic actually refuses.  This
probe builds a synthetic 2-pin ring hypergraph at a given node count
(VMEM fit depends on padded node count, not the circuit), runs a
capped mega-kernel refinement on the real chip, and reports fit/no-fit
per probe point, so the "largest instance" row in RESULTS.md is a
measurement rather than an estimate.

Run on the TPU (default backend).  Each distinct padded node count is
a fresh Mosaic compile — keep the probe list short.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ring_hypergraph(n: int, span: int = 3):
    """2-pin nets i--(i+k) for k=1..span: constant degree 2*span,
    connected, deterministic, O(n) to build."""
    from eig_kl_tpu.io.hgr import Hypergraph

    num_nets = n * span
    pins = np.empty(2 * num_nets, dtype=np.int32)
    base = np.arange(n, dtype=np.int64)
    for k in range(1, span + 1):
        s = (k - 1) * 2 * n
        pins[s : s + 2 * n : 2] = base
        pins[s + 1 : s + 2 * n : 2] = (base + k) % n
    offs = np.arange(num_nets + 1, dtype=np.int64) * 2
    return Hypergraph(
        num_nodes=n, num_nets=num_nets, pins=pins, net_offsets=offs
    )


def probe(n: int, cap: int) -> dict:
    import jax
    import jax.numpy as jnp

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.kl.init import random_split
    from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
    from eig_kl_tpu.utils.config import KLConfig

    row = {"n": n}
    try:
        t0 = time.perf_counter()
        g_host = clique_expand(ring_hypergraph(n), "kl")
        g = g_host.to_device(dtype=jnp.float32, with_plan=False)
        jax.block_until_ready(g.ell_weights)
        mg = MegaGraph(g_host, device_graph=g)
        row["state_mb"] = round(mg.padded_nodes * 8 / 2**20, 2)
        row["build_s"] = round(time.perf_counter() - t0, 1)
        sides = random_split(n, seed=7)
        t0 = time.perf_counter()
        res = refine_mega(mg, sides, KLConfig(max_iterations=cap))
        row.update(
            fits=True,
            swaps=int(res.iterations),
            compile_plus_run_s=round(time.perf_counter() - t0, 1),
            final_cut=float(res.final_cut),
            verified_cut=float(res.verified_cut),
        )
        drift = abs(res.verified_cut - res.final_cut) / max(
            abs(res.final_cut), 1.0
        )
        assert drift < 1e-5, f"drift {drift:.2e}"
    except Exception as e:
        # Mosaic VMEM overflow surfaces as a compile failure
        # (remote_compile HTTP 500 / RESOURCE_EXHAUSTED).  The remote
        # compile service also flakes occasionally — retry the kernel
        # launch once (graph + plan already device-resident) so a
        # transient 500 is not misread as a VMEM refusal.
        if "500" in str(e) or "INTERNAL" in str(e):
            try:
                t0 = time.perf_counter()
                res = refine_mega(mg, sides, KLConfig(max_iterations=cap))
                row.update(
                    fits=True,
                    retried=True,
                    swaps=int(res.iterations),
                    compile_plus_run_s=round(time.perf_counter() - t0, 1),
                    final_cut=float(res.final_cut),
                    verified_cut=float(res.verified_cut),
                )
                return row
            except Exception as e2:
                e = e2
        row.update(fits=False, error=str(e)[:600])
    return row


def probe_fast(n: int, cap: int) -> dict:
    """Compile-only fit probe: calls the mega-kernel's jitted core
    (`kl/megakernel._run`) with ON-DEVICE zero meta arrays of the real
    shapes — no host graph build, no upload.  A degree-0 adjacency
    makes every swap a no-op, but compile success/failure (the Mosaic
    VMEM fit decision) depends only on the shapes, which is what this
    probe measures.  ~compile-time per point instead of ~13 min."""
    import jax
    import jax.numpy as jnp

    from eig_kl_tpu.kl.megakernel import _round_up, _run

    P = _round_up(n, 1024)
    R = P // 128
    n8 = _round_up(n, 8)
    W = 128
    row = {"n": n, "state_mb": round(P * 8 / 2**20, 2), "fast": True}
    max_iters = _round_up(cap, 4096)
    try:
        t0 = time.perf_counter()
        meta_idx = jnp.zeros((n8, W), jnp.int32)
        meta_w = jnp.zeros((n8, W), jnp.float32)
        sf0 = jnp.ones((R, 128), jnp.float32)
        as0 = jnp.zeros((R, 128), jnp.float32)
        fparams = jnp.zeros((1, 2), jnp.float32)
        iparams = jnp.asarray([[cap, 0]], jnp.int32)
        out = _run(
            meta_idx, meta_w, sf0, as0, fparams, iparams,
            num_nodes=n, max_iters=max_iters,
            terminate_limit=25, gain_eps=1e-6,
        )
        jax.block_until_ready(out)
        row.update(fits=True,
                   compile_plus_run_s=round(time.perf_counter() - t0, 1))
    except Exception as e:
        print(f"--- full error at n={n} ---\n{e}\n---", file=sys.stderr,
              flush=True)
        row.update(fits=False, error=str(e)[:600])
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--nodes",
        default="2019200,2097152",
        help="comma list of node counts to probe (default: gen10.0, 2^21)",
    )
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--fast", action="store_true",
                    help="compile-only probe (zero meta, no graph build)")
    args = ap.parse_args()

    # Synthetic probe rings should neither pay the plan-cache host
    # fetch (HBM-pressure transfers at the boundary we're probing)
    # nor leave multi-hundred-MB cache entries behind.
    os.environ["EIG_KL_TPU_PLAN_CACHE"] = "0"

    from eig_kl_tpu.utils.jaxcache import (
        enable_persistent_cache,
        ensure_responsive_backend,
    )

    ensure_responsive_backend()
    enable_persistent_cache()
    import jax

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    rows = []
    for n in [int(x) for x in args.nodes.split(",")]:
        row = (probe_fast if args.fast else probe)(n, args.cap)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

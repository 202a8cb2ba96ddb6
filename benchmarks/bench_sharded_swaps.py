#!/usr/bin/env python
"""Per-swap cost of every KL engine on the real chip (VERDICT r4 #4).

Times, at a configurable node count, the µs/swap of:

  mega       single-chip Pallas mega-kernel (kl/megakernel.py)
  smega1     sharded mega-kernel on a mesh of 1 (parallel/smega.py) —
             same kernel structure the multi-chip path runs, minus the
             two exchange rounds, so it bounds the sharded engine's
             local-work cost per swap
  xla        single-chip XLA while_loop engine (kl/engine.py)
  oc1        owner-computes sharded engine on a mesh of 1
             (parallel/sharded_kl2.py) — the round-4 multi-chip path

Each engine warms up (compile) on a capped run, then times a full
refinement to termination; µs/swap = time / iterations.  Prints a table
and one JSON line.

Run on the TPU (unset JAX_PLATFORMS); the XLA engines also run on CPU
but the numbers are then meaningless for the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="benchmarks/data/gen_1.0_42.hgr")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--engines", default="mega,smega1,xla,oc1",
        help="comma list of mega,smega1,smega8,xla,oc1,oc8 "
        "(the *8 variants need an 8-device mesh — pass "
        "--cpu-devices 8 for the virtual-mesh scaling check)",
    )
    ap.add_argument(
        "--cpu-devices", type=int, default=0,
        help="force the CPU backend with N virtual devices (the "
        "jax.config route — the axon plugin intercepts JAX_PLATFORMS/"
        "XLA_FLAGS env vars in this image, see tests/conftest.py)",
    )
    ap.add_argument(
        "--cap", type=int, default=0,
        help="swap cap (0 = run to termination)",
    )
    ap.add_argument(
        "--marginal", action="store_true",
        help="also report the MARGINAL us/swap per engine by "
        "differencing two capped runs (caps 4100 and 8192 — one "
        "4096-granule compile bucket for the Pallas engines, so the "
        "program, log sizes and fixed host work are identical and the "
        "difference is pure per-swap kernel cost)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu_devices:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)

    import jax.numpy as jnp

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.kl.init import random_split
    from eig_kl_tpu.parallel.mesh import make_mesh
    from eig_kl_tpu.utils.config import KLConfig

    hg = read_hgr(args.circuit)
    g = clique_expand(hg, "kl")
    n = g.num_nodes
    print(f"circuit: {n} nodes nnz={g.nnz} backend={jax.default_backend()}")
    sides = random_split(n, seed=args.seed)
    cap = args.cap if args.cap > 0 else None
    cfg = KLConfig(max_iterations=cap)
    on_tpu = jax.default_backend() == "tpu"

    results = {}

    def record(name, fn):
        # Warm with the IDENTICAL config: a smaller cap compiles a
        # different max_iters bucket and the timed run would then
        # include its own compile.
        fn(cfg)
        t0 = time.perf_counter()
        res = fn(cfg)
        dt = time.perf_counter() - t0
        us = dt / max(res.iterations, 1) * 1e6
        results[name] = {
            "us_per_swap": round(us, 2),
            "iterations": int(res.iterations),
            "seconds": round(dt, 4),
            "best_cut": float(res.best_cut),
        }
        print(
            f"{name:8s} {us:10.2f} us/swap  iters={res.iterations}"
            f"  t={dt:.3f}s  best={res.best_cut:.1f}",
            flush=True,
        )
        if args.marginal:
            # Marginal per-swap cost: difference two capped runs.  Both
            # caps land in the 8192 compile bucket for the Pallas
            # engines (identical program + log sizes); the XLA engines
            # compile per cap, so each cap gets its own warm call.
            # This subtracts ALL fixed per-call cost (host build,
            # upload, device_get, replay, verification oracle).
            pts = []
            for cap in (4100, 8192):
                ccfg = KLConfig(max_iterations=cap)
                fn(ccfg)  # warm this cap's program
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    r = fn(ccfg)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                pts.append((r.iterations, best))
            (i1, t1), (i2, t2) = pts
            mus = (t2 - t1) / max(i2 - i1, 1) * 1e6
            results[name]["marginal_us_per_swap"] = round(mus, 2)
            results[name]["marginal_points"] = [
                {"iters": int(i1), "seconds": round(t1, 4)},
                {"iters": int(i2), "seconds": round(t2, 4)},
            ]
            print(
                f"{name:8s} {mus:10.2f} us/swap MARGINAL "
                f"({i1}sw {t1:.3f}s vs {i2}sw {t2:.3f}s)",
                flush=True,
            )

    wanted = args.engines.split(",")

    if "mega" in wanted:
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

        dg = g.to_device(dtype=jnp.float32, with_plan=on_tpu)
        mg = MegaGraph(g, plan=dg.plan, device_graph=dg)
        record(
            "mega",
            lambda c: refine_mega(mg, sides, c, interpret=not on_tpu),
        )

    if "smega1" in wanted:
        from eig_kl_tpu.parallel.smega import SmegaPlan, smega_refine

        mesh1 = make_mesh(1)
        plan1 = SmegaPlan(g, n_shards=1)
        record(
            "smega1",
            lambda c: smega_refine(
                g, sides, mesh1, c, interpret=not on_tpu, plan=plan1
            ),
        )

    if "smega8" in wanted:
        from eig_kl_tpu.parallel.smega import SmegaPlan, smega_refine

        mesh8 = make_mesh(8)
        plan8 = SmegaPlan(g, n_shards=8, align=128)
        record(
            "smega8",
            lambda c: smega_refine(
                g, sides, mesh8, c, interpret=not on_tpu, align=128,
                plan=plan8,
            ),
        )

    if "xla" in wanted:
        from eig_kl_tpu.kl.engine import refine

        dg2 = g.to_device(dtype=jnp.float32)
        record("xla", lambda c: refine(dg2, sides, c))

    if "oc1" in wanted:
        from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc

        mesh1 = make_mesh(1)
        record(
            "oc1",
            lambda c: sharded_refine_oc(
                g, sides, mesh1, c, dtype=jnp.float32
            ),
        )

    if "oc8" in wanted:
        from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc

        mesh8 = make_mesh(8)
        record(
            "oc8",
            lambda c: sharded_refine_oc(
                g, sides, mesh8, c, dtype=jnp.float32
            ),
        )

    print(json.dumps({"nodes": n, "engines": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

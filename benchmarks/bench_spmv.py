#!/usr/bin/env python
"""Micro-benchmark: v2 SpMV matvec wall time per circuit/scale.

Times the jitted padded-state matvec (the power loop's hot op) alone,
plus a 25-step fori_loop chain (the sign-exit check granularity), so
per-iteration overhead and per-matvec cost separate cleanly.

Usage: python benchmarks/bench_spmv.py [circuit|multiplier ...]
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


def load(spec: str):
    if os.path.exists(os.path.join("/root/reference/circuit", f"{spec}.hgr")):
        return read_hgr(os.path.join("/root/reference/circuit", f"{spec}.hgr")), spec
    path = os.path.join(HERE, "data", f"gen_{spec}_42.hgr")
    return read_hgr(path), f"gen{spec}"


def main() -> int:
    import functools

    from eig_kl_tpu.ops.spmv_pallas import spmv_pallas_2d

    # Plans travel as jit ARGUMENTS (like the real power loop's device
    # graph), never closure constants -- baked-in multi-MB constants
    # blow the remote compiler's request-size cap.
    @jax.jit
    def mv1(plan, x):
        return spmv_pallas_2d(plan, x, inter_dtype=jnp.bfloat16)

    @jax.jit
    def mv25(plan, x):
        def one(_, x):
            y = spmv_pallas_2d(plan, x, inter_dtype=jnp.bfloat16)
            nrm = jnp.linalg.norm(y)
            return y / jnp.where(nrm > 0, nrm, 1.0)

        return jax.lax.fori_loop(0, 25, one, x)

    def fence(y):
        # block_until_ready returns early through the axon tunnel;
        # a scalar device_get is the only reliable execution fence.
        return float(jnp.sum(y[:1, :1]))

    def timeit(plan, x, label):
        fence(mv1(plan, x))
        t0 = time.perf_counter()
        for _ in range(50):
            y = mv1(plan, x)
        fence(y)
        t_fence0 = time.perf_counter()
        t_mv = (t_fence0 - t0) / 50

        fence(mv25(plan, x))
        t0 = time.perf_counter()
        for _ in range(4):
            y = mv25(plan, x)
        fence(y)
        t_25 = (time.perf_counter() - t0) / 4 / 25

        extra = ""
        if hasattr(plan, "n_cb"):
            C2g = plan.rl_t.shape[0]
            extra = (
                f" n_cb={plan.n_cb} Q={plan.quantum} "
                f"slots={plan.n_cb * plan.g1} reduce_steps={C2g // 8} "
                f"tail={'y' if plan.tail is not None else 'n'}"
            )
        print(
            f"{label}: mv_alone={t_mv * 1e3:.3f}ms "
            f"mv_chained={t_25 * 1e3:.3f}ms{extra}",
            flush=True,
        )

    specs = sys.argv[1:] or ["ibm10", "1.0", "9.0"]
    for spec in specs:
        hg, label = load(spec)
        n = hg.num_nodes
        g_host = clique_expand(hg, "kl")
        g = g_host.to_device(dtype=jnp.float32, with_plan=True)
        P = g.plan.padded_nodes
        x = (
            jnp.zeros(P, jnp.float32)
            .at[:n]
            .set(jnp.asarray(np.random.default_rng(0).normal(size=n), jnp.float32))
            .reshape(P // 128, 128)
        )
        kind = "v2" if hasattr(g.plan, "n_cb") else "v1"
        timeit(g.plan, x, f"{label}[auto={kind}] n={n}")
        if kind == "v1":
            # Also measure the v2 plan for threshold retuning.
            from eig_kl_tpu.ops.spmv_pallas import build_plan_v2

            r, c, w = g_host.upper_coo()
            rows = np.concatenate([r, c]).astype(np.int32)
            cols = np.concatenate([c, r]).astype(np.int32)
            ww = np.concatenate([w, w]).astype(np.float32)
            order = np.lexsort((cols, rows))
            p2 = build_plan_v2(n, rows[order], cols[order], ww[order])
            if p2.padded_nodes == P:
                timeit(p2, x, f"{label}[v2] n={n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

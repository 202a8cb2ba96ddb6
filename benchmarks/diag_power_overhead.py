#!/usr/bin/env python
"""Where does the power solve's non-matvec time go?

VERDICT r3 weak #2: at 200K the sign-mode solve costs ~0.99 ms/iter
while the bare normalized matvec chain costs 0.495 ms/iter.  The gap
is either (a) the per-check work (rank-select median + split + flips +
best_x selects, every ``check_interval`` iters) or (b) per-iteration
overhead the mv25 chain doesn't have (deg divide, while_loop carries).

Method: run the sign-mode core with min_iters == max_iters == CAP so
the exit rule never fires and every config runs exactly CAP iterations
(the cond ignores crisp/rose until iteration > min_iters).  Sweep
check_interval over {CAP, 25}: the first runs ONE check, the second
CAP/25 of them; the time difference / extra checks = cost per check.
A gkl2-convergence run at the same cap gives the no-median floor.

Usage: python benchmarks/diag_power_overhead.py [spec ...] [--cap N]
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from eig_kl_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.spectral.power import _power_core


def load(spec: str):
    ref = os.path.join("/root/reference/circuit", f"{spec}.hgr")
    if os.path.exists(ref):
        return read_hgr(ref), spec
    return read_hgr(os.path.join(HERE, "data", f"gen_{spec}_42.hgr")), f"gen{spec}"


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cap = 125
    for a in sys.argv[1:]:
        if a.startswith("--cap="):
            cap = int(a.split("=", 1)[1])
    specs = args or ["1.0"]

    for spec in specs:
        hg, label = load(spec)
        g = clique_expand(hg, "kl").to_device(
            dtype=jnp.float32, with_plan=True
        )

        def run(convergence, check_interval, reps=5):
            def once():
                lam, v, iters = _power_core(
                    g,
                    shift=2.0,
                    tolerance=1e-6,
                    min_iters=cap,
                    max_iters=cap,
                    seed=42,
                    dtype="float32",
                    convergence=convergence,
                    check_interval=check_interval,
                    stable_checks=2,
                    inter_dtype="bfloat16",
                )
                return float(lam)  # scalar fetch = execution fence

            once()  # compile + warm
            t0 = time.perf_counter()
            for _ in range(reps):
                once()
            return (time.perf_counter() - t0) / reps

        t_one = run("sign", cap)
        t_many = run("sign", 25)
        t_gkl2 = run("gkl2", cap)
        n_extra = cap // 25 - 1
        per_check = (t_many - t_one) / max(n_extra, 1)
        print(
            f"{label} n={hg.num_nodes} cap={cap}: "
            f"sign@ci=25 {t_many:.4f}s  sign@ci={cap} {t_one:.4f}s  "
            f"gkl2 {t_gkl2:.4f}s  -> per-check {per_check * 1e3:.2f}ms "
            f"({cap // 25} checks = "
            f"{(t_many - t_one) / max(t_many, 1e-9) * 100:.0f}% of sign@25); "
            f"per-iter floor (gkl2) {t_gkl2 / cap * 1e3:.3f}ms",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Cut-quality parity harness vs the reference CPU KL binary.

The reference's cKL.cpp builds and runs in this environment with plain
``g++ -O3 -fopenmp`` (no CUDA needed), so cut quality can be MEASURED
instead of asserted:

* ``benchmarks/run_ref_parity.sh`` runs the reference binary (random
  init uses its internal random_device RNG, cKL.cpp:178-180, so each
  run is an independent sample; -EIG init is deterministic) and appends
  to ``benchmarks/parity_results/ref_runs.jsonl``.
* ``python benchmarks/parity_ckl.py ours`` runs our engine on the same
  circuits/init modes (seeds 0..N-1 for random) and appends to
  ``ours_runs.jsonl``.
* ``python benchmarks/parity_ckl.py report`` prints the mean +- std
  best-cut comparison table (markdown) from both files.

Both implementations use identical 1/(k-1) clique-expansion weights
(cKL.cpp:117), identical termination (log2(n)+5 consecutive
non-positive gains, cKL.cpp:303,382-386) and the same -EIG initial
partitions (read from /root/reference/pre_saved_EIG), so best-cut
distributions are directly comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RESULTS = os.path.join(HERE, "parity_results")
CIRCUITS = ["fract", "ibm01", "industry2", "ibm10"]
REF_CIRCUIT_DIR = "/root/reference/circuit"
REF_EIG_DIR = "/root/reference/pre_saved_EIG"


def _append(path: str, row: dict) -> None:
    os.makedirs(RESULTS, exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def run_ours(
    circuits: list[str],
    n_random: int,
    seed_start: int = 0,
    include_eig: bool = True,
    ensemble: str = "index",
    passes: int = 1,
) -> None:
    """ensemble="index": tie-break by node index (our engines' native
    order, one graph upload per circuit).  ensemble="shuffle": relabel
    the graph by the per-seed shuffle permutation
    (kl.init.reference_shuffle_init) so equal-gain ties break in the
    reference's randomized order; rows are tagged init
    "random-shuffled".  passes != 1 runs multi-pass KL
    (kl.multipass; 0 = until converged) and tags rows "<init>-mp"."""
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.kl.engine import refine
    from eig_kl_tpu.kl.init import (
        random_split,
        reference_shuffle_init,
        split_from_eig,
    )
    from eig_kl_tpu.utils.config import KLConfig

    from eig_kl_tpu.kl.multipass import refine_multipass, resolved_passes

    out = os.path.join(RESULTS, "ours_runs.jsonl")
    platform = jax.default_backend()
    on_tpu = platform == "tpu"
    # gain_eps=0.0 matches cKL's "gain <= 0" terminate count
    # (cKL.cpp:382); the GPU flavors use 1e-6 (gKL.cu:26).
    config = KLConfig(gain_eps=0.0, passes=passes)
    multipass = resolved_passes(config) > 1
    mp_tag = "-mp" if multipass else ""
    for name in circuits:
        hg = read_hgr(os.path.join(REF_CIRCUIT_DIR, f"{name}.hgr"))
        eig_path = os.path.join(REF_EIG_DIR, f"{name}.hgr_out.txt")
        # Build + upload the graph ONCE per circuit (like any caller
        # doing repeated runs would); per-run seconds below are pure
        # refinement so they compare against the reference's KL() span.
        g_host = clique_expand(hg, "kl")

        def make_refine(gh):
            g = gh.to_device(dtype=jnp.float32, with_plan=on_tpu)
            if on_tpu:
                from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

                mg = MegaGraph(gh, plan=g.plan, device_graph=g)
                return lambda sides: refine_mega(mg, sides, config)
            return lambda sides: refine(g, sides, config)

        do_refine = make_refine(g_host)
        init_tag = "random" if ensemble == "index" else "random-shuffled"
        runs = [("eig", 0)] if include_eig else []
        runs += [(init_tag, s) for s in range(seed_start, seed_start + n_random)]
        warm = False
        for mode, seed in runs:
            if mode == "eig":
                sides = split_from_eig(eig_path)
                single = do_refine
            elif ensemble == "index":
                sides = random_split(hg.num_nodes, seed)
                single = do_refine
            else:
                gr, sides, _perm = reference_shuffle_init(g_host, seed)
                single = make_refine(gr)  # per-seed relabel + upload
            if multipass:
                run = lambda s, fn=single: refine_multipass(fn, s, config)
            else:
                run = single
            mode = mode + mp_tag
            if not warm:  # pay the per-shape compile outside the timing
                run(sides)
                warm = True
            t0 = time.perf_counter()
            result = run(sides)
            dt = time.perf_counter() - t0
            row = {
                "impl": f"eig_kl_tpu-{platform}",
                "circuit": name,
                "init": mode,
                "run": seed,
                "initial_cut": round(float(result.initial_cut), 3),
                "best_cut": round(float(result.best_cut), 3),
                "iterations": int(result.iterations),
                "seconds": round(dt, 3),
            }
            _append(out, row)
            print(json.dumps(row), flush=True)


def run_bestofk(
    circuits: list[str],
    n_repeats: int = 3,
    base_seed: int = 1000,
    k_cap: int = 2048,
    rep_offset: int = 0,
    passes: int = 1,
) -> None:
    """Wall-clock-matched protocol: best-of-K multi-start where
    K = floor(reference seconds per run / our seconds per run) -- the
    honest "equal-or-better at equal time" reading of the north star
    (BASELINE.json).  All K starts run in ONE batched mega-kernel
    launch; recorded wall time is the whole launch, so the comparison
    charges us for everything we do inside the reference's budget.

    passes != 1 runs each start multi-pass; K is then sized from the
    measured "random-mp" per-run seconds (multi-pass runs cost 3-7x a
    single pass, so K shrinks to stay inside the same budget).
    """
    sys.path.insert(0, REPO)
    import statistics

    import jax
    import jax.numpy as jnp

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.utils.config import KLConfig

    from eig_kl_tpu.kl.multipass import resolved_passes

    ref = _load(os.path.join(RESULTS, "ref_runs.jsonl"))
    ours = _load(os.path.join(RESULTS, "ours_runs.jsonl"))
    out = os.path.join(RESULTS, "bestofk_runs.jsonl")
    platform = jax.default_backend()
    config = KLConfig(gain_eps=0.0, passes=passes)
    multipass = resolved_passes(config) > 1
    mp_tag = "-mp" if multipass else ""
    for name in circuits:
        ref_rows = [
            r for r in ref if r["circuit"] == name and r["init"] == "random"
        ]
        our_init = "random-mp" if multipass else "random"
        our_rows = [
            r for r in ours if r["circuit"] == name and r["init"] == our_init
        ]
        if multipass and not our_rows:
            # No measured multi-pass samples yet: assume the observed
            # ~4x single-pass cost so K still fits the budget.
            our_rows = [
                dict(r, seconds=4.0 * r["seconds"])
                for r in ours
                if r["circuit"] == name and r["init"] == "random"
            ]
        if not ref_rows or not our_rows:
            print(f"skipping {name}: missing samples", file=sys.stderr)
            continue
        ref_secs = statistics.mean(r["seconds"] for r in ref_rows)
        our_secs = statistics.mean(r["seconds"] for r in our_rows)
        K = max(1, min(int(ref_secs / max(our_secs, 1e-9)), k_cap))
        hg = read_hgr(os.path.join(REF_CIRCUIT_DIR, f"{name}.hgr"))
        g_host = clique_expand(hg, "kl")
        on_tpu = platform == "tpu"
        g = g_host.to_device(dtype=jnp.float32, with_plan=on_tpu)
        from eig_kl_tpu.parallel.multi_start import (
            multi_start_refine,
            multi_start_refine_mega,
        )

        def do(seed):
            if on_tpu:
                return multi_start_refine_mega(
                    g_host, K, config=config, base_seed=seed, device_graph=g
                )
            return multi_start_refine(g, K, config=config, base_seed=seed)

        do(base_seed)  # warm the per-shape compile outside the timing
        for rep in range(rep_offset, rep_offset + n_repeats):
            seed = base_seed + rep * k_cap
            t0 = time.perf_counter()
            best, cuts = do(seed)
            dt = time.perf_counter() - t0
            row = {
                "impl": f"eig_kl_tpu-{platform}-bestof{K}{mp_tag}",
                "circuit": name,
                "init": "random" + mp_tag,
                "run": rep,
                "K": K,
                "ref_seconds_per_run": round(ref_secs, 2),
                "best_cut": round(float(best.best_cut), 3),
                "mean_start_cut": round(float(sum(cuts) / len(cuts)), 3),
                "seconds": round(dt, 3),
            }
            _append(out, row)
            print(json.dumps(row), flush=True)


def _load(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def report() -> str:
    import statistics

    ref = _load(os.path.join(RESULTS, "ref_runs.jsonl"))
    ours = _load(os.path.join(RESULTS, "ours_runs.jsonl"))

    def agg(rows):
        cuts = [r["best_cut"] for r in rows]
        if not cuts:
            return None
        mean = statistics.mean(cuts)
        std = statistics.stdev(cuts) if len(cuts) > 1 else 0.0
        secs = statistics.mean(r["seconds"] for r in rows)
        return mean, std, min(cuts), len(cuts), secs

    lines = [
        "| circuit | init | reference best cut (mean+-std, min, N) | ours best cut (mean+-std, min, N) | ref s/run | ours s/run |",
        "|---|---|---|---|---|---|",
    ]
    for name in CIRCUITS:
        for mode in [
            "eig",
            "eig-mp",
            "random",
            "random-mp",
            "random-shuffled",
            "random-shuffled-mp",
        ]:
            # shuffled-ensemble and multi-pass ours rows compare against
            # the same reference single-pass rows (the reference ensemble
            # IS shuffled; it has no multi-pass mode at all)
            ref_mode = mode.removesuffix("-mp")
            if ref_mode == "random-shuffled":
                ref_mode = "random"
            r = agg(
                [x for x in ref if x["circuit"] == name and x["init"] == ref_mode]
            )
            o = agg([x for x in ours if x["circuit"] == name and x["init"] == mode])
            if o is None and mode != "eig" and mode != "random":
                continue
            if r is None and o is None:
                continue
            fmt = (
                lambda a: "--"
                if a is None
                else f"{a[0]:.2f} +- {a[1]:.2f} (min {a[2]:.2f}, N={a[3]})"
            )
            fs = lambda a: "--" if a is None else f"{a[4]:.2f}"
            lines.append(
                f"| {name} | {mode} | {fmt(r)} | {fmt(o)} | {fs(r)} | {fs(o)} |"
            )
    bok = _load(os.path.join(RESULTS, "bestofk_runs.jsonl"))
    if bok:
        import statistics

        lines += [
            "",
            "Equal-time protocol (best-of-K multi-start inside the "
            "reference's per-run budget):",
            "",
            "| circuit | K | ref best cut (mean, N) | ours best-of-K "
            "(mean+-std, min, N) | ref s/run | ours s/launch |",
            "|---|---|---|---|---|---|",
        ]
        for name in CIRCUITS:
            for init in ["random", "random-mp"]:
                rows = [
                    b
                    for b in bok
                    if b["circuit"] == name
                    and b.get("init", "random") == init
                ]
                if not rows:
                    continue
                r = agg(
                    [
                        x
                        for x in ref
                        if x["circuit"] == name and x["init"] == "random"
                    ]
                )
                cuts = [b["best_cut"] for b in rows]
                mean = statistics.mean(cuts)
                std = statistics.stdev(cuts) if len(cuts) > 1 else 0.0
                secs = statistics.mean(b["seconds"] for b in rows)
                K = rows[-1]["K"]
                ktxt = f"{K}{' (mp)' if init.endswith('-mp') else ''}"
                rtxt = "--" if r is None else f"{r[0]:.2f} (N={r[3]})"
                rsec = "--" if r is None else f"{r[4]:.2f}"
                lines.append(
                    f"| {name} | {ktxt} | {rtxt} | {mean:.2f} +- {std:.2f} "
                    f"(min {min(cuts):.2f}, N={len(cuts)}) | {rsec} | {secs:.2f} |"
                )
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["ours", "bestofk", "report"])
    ap.add_argument("--circuits", nargs="*", default=CIRCUITS)
    ap.add_argument("--n-random", type=int, default=10)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--no-eig", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--rep-offset", type=int, default=0)
    ap.add_argument("--ensemble", choices=["index", "shuffle"], default="index")
    ap.add_argument(
        "--passes",
        type=int,
        default=1,
        help="multi-pass KL (0 = until converged); rows tagged <init>-mp",
    )
    args = ap.parse_args()
    if args.cmd == "ours":
        run_ours(
            args.circuits,
            args.n_random,
            seed_start=args.seed_start,
            include_eig=not args.no_eig,
            ensemble=args.ensemble,
            passes=args.passes,
        )
    elif args.cmd == "bestofk":
        run_bestofk(
            args.circuits,
            n_repeats=args.repeats,
            rep_offset=args.rep_offset,
            passes=args.passes,
        )
    else:
        print(report())
    return 0


if __name__ == "__main__":
    sys.exit(main())

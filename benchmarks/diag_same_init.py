#!/usr/bin/env python
"""Same-init trajectory diff vs the reference cKL binary.

The last unexplained parity cell (PARITY.md appendix): ibm01
equal-samples random-init mean is ~+1.7 SE worse than the reference.
Tie-ordering (shuffle ensemble) and precision (f64 A/B) are ruled out.
This experiment removes the remaining confound — the *initial
partition distribution* — by injecting IDENTICAL initial partitions
into both implementations and diffing the per-swap trajectories:

* ours: :func:`eig_kl_tpu.kl.np_engine.refine_np` records per-swap
  ``(a, b, gain, cut)``.
* reference: ``cKL <circ> -EIG`` reads the partition from
  ``pre_saved_EIG/<base>_out.txt`` (cKL.cpp:155-174 — side column
  only; the header lines and value column are ignored for the split)
  and writes ``results/<base>_KL_CutSize_EIG_output.txt`` with one
  ``iter\tcut\tgain`` row per swap (cKL.cpp:330,378).

With the eigfile injection the reference's ``remain[]`` scan order is
the file line order — we write nodes 0..n-1 ascending, so its
first-wins max/min scan (cKL.cpp:338-352) tie-breaks exactly like our
``np.argmax``.  Any trajectory divergence is therefore either float
summation-order noise (cKL sums gains over unordered_map iteration
order in f32, cKL.cpp:225-250; we keep an incrementally-updated
``A s``) or a genuine selection-rule difference.

Outputs one JSON line per seed to stdout and a summary; run as

    python benchmarks/diag_same_init.py --circuit ibm01 --runs 10
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from eig_kl_tpu.graph.expand import clique_expand  # noqa: E402
from eig_kl_tpu.io.eigfile import EigResult, write_eig_file  # noqa: E402
from eig_kl_tpu.io.hgr import read_hgr  # noqa: E402
from eig_kl_tpu.kl.init import random_split  # noqa: E402
from eig_kl_tpu.kl.np_engine import refine_np  # noqa: E402

REF_BIN = os.path.join(HERE, "ref_build", "cKL")


def ensure_ref_binary() -> str:
    if not os.path.exists(REF_BIN):
        os.makedirs(os.path.dirname(REF_BIN), exist_ok=True)
        subprocess.run(
            ["g++", "-std=c++17", "-O3", "-fopenmp",
             "/root/reference/cKL.cpp", "-o", REF_BIN],
            check=True,
        )
    return REF_BIN


def run_reference(circ_path: str, sides: np.ndarray) -> dict:
    """Run cKL -EIG with an injected partition; return its trajectory."""
    base = os.path.basename(circ_path)
    wd = tempfile.mkdtemp(prefix="same_init_")
    try:
        eig_dir = os.path.join(wd, "pre_saved_EIG")
        os.makedirs(eig_dir)
        n = len(sides)
        # Header lines + value column are parsed but unused for the
        # split; side alone determines membership (cKL.cpp:166-171).
        write_eig_file(
            os.path.join(eig_dir, base + "_out.txt"),
            EigResult(
                eigenvalue=0.0,
                median=0.0,
                sides=np.asarray(sides, np.int8),
                values=np.zeros(n),
            ),
        )
        t0 = time.perf_counter()
        proc = subprocess.run(
            [REF_BIN, circ_path, "-EIG"],
            cwd=wd, capture_output=True, text=True, timeout=7200,
        )
        dt = time.perf_counter() - t0
        if proc.returncode != 0:
            raise RuntimeError(f"cKL failed: {proc.stdout[-500:]} {proc.stderr[-500:]}")
        best = None
        for line in proc.stdout.splitlines():
            if line.startswith("Best cut size achieved"):
                best = float(line.split(":")[1])
        rows = np.loadtxt(
            os.path.join(wd, "results", base + "_KL_CutSize_EIG_output.txt"),
            ndmin=2,
        )
        return {
            "cut": rows[:, 1],       # row 0 is the initial cut
            "gain": rows[:, 2],
            "best": best,
            "seconds": dt,
        }
    finally:
        shutil.rmtree(wd, ignore_errors=True)


def first_divergence(g_ref, g_ours, atol=5e-2, rtol=1e-3) -> int:
    """Index of the first swap whose gains differ beyond float noise
    (-1 = identical).  Gains are O(1)-O(100); unordered_map-order f32
    summation noise is <<0.05 for these weights."""
    m = min(len(g_ref), len(g_ours))
    diff = np.abs(g_ref[:m] - g_ours[:m]) > (atol + rtol * np.abs(g_ref[:m]))
    idx = np.flatnonzero(diff)
    if idx.size:
        return int(idx[0])
    return -1 if len(g_ref) == len(g_ours) else m


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="ibm01")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(HERE, "parity_results",
                                                  "same_init.jsonl"))
    args = ap.parse_args()

    circ = os.path.join("/root/reference/circuit", args.circuit + ".hgr")
    ensure_ref_binary()
    hg = read_hgr(circ)
    g = clique_expand(hg, "kl")
    n = g.num_nodes

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    ref_bests, our_bests, divs = [], [], []
    for seed in range(args.seed_start, args.seed_start + args.runs):
        sides = random_split(n, seed)
        ref = run_reference(circ, sides)
        t0 = time.perf_counter()
        ours = refine_np(g, sides, dtype=np.float32)
        our_s = time.perf_counter() - t0

        init_ok = abs(ref["cut"][0] - ours.initial_cut) <= 1e-2 + 1e-4 * abs(
            ours.initial_cut
        )
        div = first_divergence(ref["gain"][1:], ours.gain_trajectory[1:])
        row = {
            "circuit": args.circuit,
            "seed": seed,
            "n": n,
            "init_cut_ref": float(ref["cut"][0]),
            "init_cut_ours": ours.initial_cut,
            "init_match": bool(init_ok),
            "iters_ref": len(ref["gain"]) - 1,
            "iters_ours": ours.iterations,
            "first_divergence_swap": div,
            "best_ref": ref["best"],
            "best_ours": ours.best_cut,
            "ref_seconds": round(ref["seconds"], 2),
            "ours_seconds": round(our_s, 2),
        }
        if div >= 0:
            # context around the divergence for classification
            lo = max(0, div - 2)
            hi = div + 3
            row["ref_gains_at_div"] = [round(float(x), 4)
                                       for x in ref["gain"][1 + lo:1 + hi]]
            row["our_gains_at_div"] = [round(float(x), 4)
                                       for x in ours.gain_trajectory[1 + lo:1 + hi]]
            row["our_pair_at_div"] = None  # filled by --inspect reruns
        ref_bests.append(ref["best"])
        our_bests.append(ours.best_cut)
        divs.append(div)
        line = json.dumps(row)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")

    rb, ob = np.array(ref_bests), np.array(our_bests)
    ident = sum(1 for d in divs if d < 0)
    summary = {
        "summary": True,
        "circuit": args.circuit,
        "runs": args.runs,
        "ref_best_mean": round(float(rb.mean()), 2),
        "ref_best_std": round(float(rb.std(ddof=1)), 2) if len(rb) > 1 else 0.0,
        "ours_best_mean": round(float(ob.mean()), 2),
        "ours_best_std": round(float(ob.std(ddof=1)), 2) if len(ob) > 1 else 0.0,
        "ours_minus_ref_mean": round(float((ob - rb).mean()), 2),
        "identical_trajectories": ident,
        "median_first_divergence": float(np.median([d for d in divs if d >= 0]))
        if ident < len(divs) else None,
    }
    line = json.dumps(summary)
    print(line, flush=True)
    with open(args.out, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()

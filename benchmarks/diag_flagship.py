#!/usr/bin/env python
"""Flagship quality flow vs the reference's best flow.

The reference's best deterministic result is ``cKL <file> -EIG``
(golden Lanczos init, one KL pass, no rollback; cKL.cpp:424-468).
This framework's flagship is one command:

    python -m eig_kl_tpu fused <file> -EIG --starts 8 --passes 0

i.e. power-iteration spectral init (better downstream than the golden
Lanczos init, see diag_exit_study.py), spectral-seeded multi-start
(start 0 unperturbed + 7 balanced jitters, kl.init.perturb_split),
and multi-pass KL per start — all starts in one batched launch.

This script measures both the single-shot (power init + multi-pass)
and the best-of-8 flagship per circuit, next to the reference's -EIG
number (from the committed golden results in
benchmarks/parity_results/ref_runs.jsonl, or PARITY.md).

Cut quality is platform-independent; runs on CPU unless
EIG_KL_TPU_DIAG_TPU=1.

Usage: python benchmarks/diag_flagship.py [circuits...]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

if os.environ.get("EIG_KL_TPU_DIAG_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.models.pipelines import fused_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig


def ref_eig_cut(circ: str) -> float | None:
    path = os.path.join(HERE, "parity_results", "ref_runs.jsonl")
    if not os.path.exists(path):
        return None
    for line in open(path):
        r = json.loads(line)
        if r["circuit"] == circ and r["init"] == "eig":
            return r["best_cut"]
    return None


def main() -> int:
    circuits = sys.argv[1:] or ["fract", "ibm01", "industry2", "ibm10"]
    for circ in circuits:
        hg = read_hgr(f"/root/reference/circuit/{circ}.hgr")
        spec = SpectralConfig(solver="power")
        t0 = time.time()
        single = fused_partition(
            hg, spectral_config=spec, kl_config=KLConfig(passes=0)
        )
        t_single = time.time() - t0
        t0 = time.time()
        flag = fused_partition(
            hg,
            spectral_config=spec,
            kl_config=KLConfig(passes=0),
            starts=8,
        )
        t_flag = time.time() - t0
        t0 = time.time()
        kicked = fused_partition(
            hg,
            spectral_config=spec,
            kl_config=KLConfig(passes=0, kicks=20),
            starts=8,
        )
        t_kick = time.time() - t0
        ref = ref_eig_cut(circ)
        reftxt = f"{ref:.2f}" if ref is not None else "--"
        print(
            f"{circ:10s} ref -EIG {reftxt:>9s} | power+mp "
            f"{single.kl.best_cut:9.2f} ({t_single:.1f}s) | flagship "
            f"best-of-8 {flag.kl.best_cut:9.2f} ({t_flag:.1f}s) | "
            f"+20 kicks {kicked.kl.best_cut:9.2f} ({t_kick:.1f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

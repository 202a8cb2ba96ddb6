"""JAX-free KL pipeline — the cold-start fast path.

Mirrors :func:`eig_kl_tpu.models.pipelines.kl_partition` on the
pure-NumPy engine (:mod:`eig_kl_tpu.kl.np_engine`).  This module (and
everything it imports) MUST stay jax-free: ``bin/eigkl`` runs it under
``python -S`` to skip the ~9 s axon-sitecustomize jax boot, which is
what lets a cold ``kl fract -EIG`` answer in ~2 s against the
reference binary's instant start (cKL.cpp:424-468).

Supports the full ``kl`` subcommand surface: random / -EIG /
explicit-sides init, shuffled-ties relabeling, multi-pass, ILS kicks,
and sequential multi-start.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.eigfile import EigResult
from eig_kl_tpu.io.hgr import Hypergraph
from eig_kl_tpu.kl.init import (
    perturb_split,
    random_split,
    reference_shuffle_init,
    split_from_eig,
)
from eig_kl_tpu.kl.multipass import refine_ils, refine_multipass
from eig_kl_tpu.kl.np_engine import refine_np
from eig_kl_tpu.kl.result import KLResult
from eig_kl_tpu.utils.config import KLConfig
from eig_kl_tpu.utils.tracing import Tracer


def kl_partition_np(
    hg: Hypergraph,
    *,
    init: EigResult | str | np.ndarray | None = None,
    kl_config: KLConfig = KLConfig(),
    seed: int = 0,
    dtype=np.float32,
    shuffled_ties: bool = False,
    starts: int = 1,
    perturb: float = 0.05,
):
    """KL refinement on the NumPy engine; same contract as
    :func:`eig_kl_tpu.models.pipelines.kl_partition` (returns a
    ``PartitionRun``-shaped object)."""
    from eig_kl_tpu.models.run import PartitionRunData

    tracer = Tracer()
    perm = None
    shuffled_sides = None
    with tracer.span("graph.build"):
        g_host = clique_expand(hg, "kl")
        if shuffled_ties and init is None:
            g_host, shuffled_sides, perm = reference_shuffle_init(
                g_host, seed
            )
    eig = init if isinstance(init, EigResult) else None
    with tracer.span("init"):
        if init is None:
            sides = (
                shuffled_sides
                if perm is not None
                else random_split(hg.num_nodes, seed)
            )
        elif isinstance(init, (EigResult, str)):
            sides = split_from_eig(init)
        else:
            sides = np.asarray(init, dtype=np.int8)

    backend = lambda s: refine_np(g_host, s, kl_config, dtype=dtype)  # noqa: E731

    def one_descent(s0: np.ndarray, kick_seed: int) -> KLResult:
        if kl_config.kicks > 0:
            return refine_ils(
                backend,
                s0,
                kl_config,
                kicks=kl_config.kicks,
                kick_frac=kl_config.kick_frac,
                seed=kick_seed,
            )
        return refine_multipass(backend, s0, kl_config)

    start_cuts = None
    with tracer.span("kl.refine"):
        result = one_descent(sides, seed)
        if starts > 1:
            start_cuts = [result.best_cut]
            for i in range(1, starts):
                if init is not None:
                    # Spectral-seeded multi-start: start 0 is the -EIG
                    # init, the rest balanced jitters of it (same
                    # protocol as the jax multi-start paths).
                    s_i = perturb_split(sides, seed + i, perturb)
                else:
                    s_i = random_split(hg.num_nodes, seed + i)
                r_i = one_descent(s_i, seed + i)
                start_cuts.append(r_i.best_cut)
                if r_i.best_cut < result.best_cut:
                    result = r_i
    if perm is not None:
        mapped_sides = np.empty(len(perm), dtype=np.int8)
        mapped_sides[perm] = np.asarray(result.sides)
        mapped_best = np.empty(len(perm), dtype=np.int8)
        mapped_best[perm] = np.asarray(result.best_sides)
        result = dataclasses.replace(
            result, sides=mapped_sides, best_sides=mapped_best
        )
    return PartitionRunData(
        circuit=hg.name,
        eig=eig,
        kl=result,
        timings=dict(tracer.spans),
        nnz=g_host.nnz,
        start_cuts=start_cuts,
    )

"""Result bundle of an end-to-end run (jax-free).

Split out of :mod:`eig_kl_tpu.models.pipelines` so the no-jax CPU fast
path (:mod:`eig_kl_tpu.models.np_pipeline`) can construct the same
result type the CLI formats, without importing JAX.
``pipelines.PartitionRun`` is an alias of this class.
"""

from __future__ import annotations

import dataclasses

from eig_kl_tpu.io.eigfile import EigResult
from eig_kl_tpu.kl.result import KLResult


@dataclasses.dataclass
class PartitionRunData:
    """Result bundle of an end-to-end run."""

    circuit: str
    eig: EigResult | None
    kl: KLResult | None
    timings: dict[str, float]
    #: adjacency nonzeros (both directions), for the matrix-statistics
    #: block (cKL.cpp:134-146); None when no graph was built.
    nnz: int | None = None
    #: per-start best cuts when the run was a multi-start (printed by
    #: the CLI as "Multi-start best cuts: ..."); None otherwise.
    start_cuts: list | None = None

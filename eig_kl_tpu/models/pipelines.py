"""End-to-end partitioning pipelines.

The reference's four executables map to three library pipelines (the
CPU and GPU KL variants collapse into one device-resident engine):

* :func:`spectral_partition`  == ``./cEIG <file>``   (cEIG.cpp:138-229)
* :func:`kl_partition`        == ``./cKL|./gKL <file> [-EIG]``
  (cKL.cpp:424-468, gKL.cu:672-713)
* :func:`fused_partition`     == ``./gKL2 <file> [-EIG]``
  (gKL2.cu:989-1033) -- in-process power-iteration init feeding KL.
  Unlike gKL2, the spectral solve runs ONCE (the reference runs it
  twice under -EIG: gKL2.cu:1018 and :440).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

import jax

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.eigfile import EigResult
from eig_kl_tpu.io.hgr import Hypergraph
from eig_kl_tpu.kl.engine import KLResult, refine
from eig_kl_tpu.kl.init import (
    random_split,
    reference_shuffle_init,
    split_from_eig,
)
from eig_kl_tpu.models.run import PartitionRunData as PartitionRun
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig
from eig_kl_tpu.utils.tracing import Tracer


def _use_mega(config: KLConfig, dtype) -> bool:
    """Engine auto-selection: the single-kernel Pallas engine on TPU
    (f32 only), else the XLA while_loop engine."""
    if config.use_pallas is not None:
        return config.use_pallas
    return (
        jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32
    )


def refine_backend(g_host, g_dev, config: KLConfig, dtype):
    """Single-pass refinement closure on the auto-selected engine."""
    if _use_mega(config, dtype):
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

        mg = MegaGraph(g_host, plan=g_dev.plan, device_graph=g_dev)
        return lambda s: refine_mega(mg, s, config)
    return lambda s: refine(g_dev, s, config)


def _refine_dispatch(
    g_host, g_dev, sides, config: KLConfig, dtype, seed: int = 0
) -> KLResult:
    backend = refine_backend(g_host, g_dev, config, dtype)
    from eig_kl_tpu.kl.multipass import (
        refine_ils,
        refine_multipass,
        resolved_passes,
    )

    if config.kicks > 0:
        return refine_ils(
            backend, sides, config,
            kicks=config.kicks, kick_frac=config.kick_frac, seed=seed,
        )
    if resolved_passes(config) <= 1:
        return backend(sides)
    return refine_multipass(backend, sides, config)


# PartitionRun is the jax-free PartitionRunData from models/run.py
# (imported above) — the NumPy fast path constructs the same type.


def spectral_partition(
    hg: Hypergraph,
    config: SpectralConfig = SpectralConfig(),
    *,
    dtype=jnp.float64,
) -> PartitionRun:
    """Spectral phase only (the cEIG executable)."""
    tracer = Tracer()
    with tracer.span("spectral.total"):
        res = eig_partition(hg, config, dtype=dtype)
    return PartitionRun(circuit=hg.name, eig=res, kl=None, timings=dict(tracer.spans))


def kl_partition(
    hg: Hypergraph,
    *,
    init: EigResult | str | np.ndarray | None = None,
    kl_config: KLConfig = KLConfig(),
    seed: int = 0,
    dtype=jnp.float32,
    shuffled_ties: bool = False,
) -> PartitionRun:
    """KL refinement from a random or spectral initial partition.

    Args:
      init: None -> random split (cKL.cpp:175-193); an EigResult or EIG
        file path -> the -EIG flow (cKL.cpp:155-174); an int8 array ->
        explicit initial sides.
      seed: RNG seed for the random init.
      dtype: device compute dtype for the KL engine.
      shuffled_ties: random-init only — relabel the graph by the
        shuffle permutation (kl.init.reference_shuffle_init) so
        equal-gain ties break in the reference's randomized scan order
        rather than by node index; results are mapped back to original
        node ids.
    """
    tracer = Tracer()
    perm = None
    with tracer.span("graph.build"):
        g_host = clique_expand(hg, "kl")
        if shuffled_ties and init is None:
            g_host, shuffled_sides, perm = reference_shuffle_init(
                g_host, seed
            )
        g = g_host.to_device(
            dtype=dtype, with_plan=jax.default_backend() == "tpu"
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
    with tracer.span("kl.refine"):
        result = _refine_dispatch(g_host, g, sides, kl_config, dtype, seed)
    if perm is not None:
        # Map the relabeled run back to original node ids
        # (new node p == old node perm[p]).
        mapped_sides = np.empty(len(perm), dtype=np.int8)
        mapped_sides[perm] = np.asarray(result.sides)
        mapped_best = np.empty(len(perm), dtype=np.int8)
        mapped_best[perm] = np.asarray(result.best_sides)
        result = dataclasses.replace(
            result, sides=mapped_sides, best_sides=mapped_best
        )
    return PartitionRun(
        circuit=hg.name,
        eig=eig,
        kl=result,
        timings=dict(tracer.spans),
        nnz=g_host.nnz,
    )


def fused_partition(
    hg: Hypergraph,
    *,
    use_eig: bool = True,
    spectral_config: SpectralConfig = SpectralConfig(solver="power"),
    kl_config: KLConfig = KLConfig(gain_eps=1e-6),
    seed: int = 0,
    dtype=jnp.float32,
    starts: int = 1,
    perturb: float = 0.05,
) -> PartitionRun:
    """Fused spectral + KL pipeline (the gKL2 executable).

    Builds the KL-weighted graph once and shares it between the power
    iteration (gKL2 builds its Laplacian from the same adjacency,
    gKL2.cu:262-303) and the refinement engine.  ``use_eig=False``
    mirrors running gKL2 without ``-EIG`` (random init).

    ``starts > 1`` runs *spectral-seeded multi-start*: the spectral
    solve runs ONCE, start 0 refines the unperturbed median split, and
    each further start jitters it with :func:`kl.init.perturb_split`
    (``perturb`` = fraction of nodes pair-swapped) before refinement —
    all starts in one batched launch, best kept.  With random init
    (``use_eig=False``) the starts are independent random splits.
    """
    tracer = Tracer()
    with tracer.span("graph.build"):
        g_host = clique_expand(hg, "kl")
        g = g_host.to_device(
            dtype=dtype, with_plan=jax.default_backend() == "tpu"
        )
    eig = None
    if use_eig:
        # Resolve "auto" up front: the power solver reuses the
        # KL-weighted adjacency (gKL2's own design, gKL2.cu:262-303);
        # lanczos/lobpcg need the 2/k EIG weighting and build it
        # themselves.
        from eig_kl_tpu.utils.config import resolve_solver

        spectral_config = resolve_solver(spectral_config, hg.num_nodes)
        if (
            spectral_config.solver == "power"
            and starts == 1
            and _use_mega(kl_config, dtype)
            and kl_config.refresh_interval == 0
            and kl_config.kicks == 0
        ):
            from eig_kl_tpu.kl.multipass import resolved_passes

            if resolved_passes(kl_config) <= 1:
                # Whole gKL2 pipeline — solve, split, refine, verify —
                # as ONE program + ONE fetch (fused_refine_mega); the
                # phases are not separable, so the span covers both.
                from eig_kl_tpu.kl.megakernel import (
                    MegaGraph,
                    fused_refine_mega,
                )

                mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
                with tracer.span("spectral+kl.fused"):
                    eig, result = fused_refine_mega(
                        mg, g, spectral_config, kl_config
                    )
                return PartitionRun(
                    circuit=hg.name,
                    eig=eig,
                    kl=result,
                    timings=dict(tracer.spans),
                    nnz=g_host.nnz,
                )
    with tracer.span("init"):
        if use_eig:
            with tracer.span("spectral.total"):
                shared = g if spectral_config.solver == "power" else None
                eig = eig_partition(
                    hg, spectral_config, dtype=dtype, graph=shared
                )
            sides = eig.sides
        else:
            sides = random_split(hg.num_nodes, seed)
    with tracer.span("kl.refine"):
        if starts > 1:
            result, _cuts = _multi_start_dispatch(
                g_host, g, sides, kl_config, dtype,
                starts=starts, perturb=perturb, seed=seed,
                perturb_base=use_eig,
            )
        else:
            result = _refine_dispatch(g_host, g, sides, kl_config, dtype, seed)
    return PartitionRun(
        circuit=hg.name,
        eig=eig,
        kl=result,
        timings=dict(tracer.spans),
        nnz=g_host.nnz,
    )


def _multi_start_dispatch(
    g_host, g_dev, sides, config: KLConfig, dtype, *,
    starts: int, perturb: float, seed: int, perturb_base: bool,
):
    """Batched multi-start on the auto-selected engine.

    ``perturb_base=True``: start 0 is ``sides`` unperturbed, starts
    1..S-1 are balanced jitters of it (spectral-seeded multi-start).
    ``perturb_base=False``: independent random splits from ``seed``.
    """
    from eig_kl_tpu.kl.init import perturb_split
    from eig_kl_tpu.parallel.multi_start import (
        multi_start_refine,
        multi_start_refine_mega,
    )

    if perturb_base:
        base = np.asarray(sides, dtype=np.int8)
        init_sides = np.stack(
            [base]
            + [
                perturb_split(base, seed + 1 + i, perturb)
                for i in range(starts - 1)
            ]
        )
    else:
        init_sides = None
    if _use_mega(config, dtype):
        best, cuts = multi_start_refine_mega(
            g_host,
            starts,
            config=config,
            base_seed=seed,
            device_graph=g_dev,
            init_sides=init_sides,
        )
    else:
        best, cuts = multi_start_refine(
            g_dev, starts, config=config, base_seed=seed,
            init_sides=init_sides,
        )
    if config.kicks > 0:
        # Iterated local search around the winning start; the winner is
        # already converged, so it enters as the incumbent (no wasted
        # leading re-descent).
        from eig_kl_tpu.kl.multipass import refine_ils

        best = refine_ils(
            refine_backend(g_host, g_dev, config, dtype),
            best.best_sides,
            config,
            kicks=config.kicks,
            kick_frac=config.kick_frac,
            seed=seed,
            incumbent=best,
        )
    return best, cuts

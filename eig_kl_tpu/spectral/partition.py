"""Median-split partitioning of the Fiedler vector, and the end-to-end
spectral partition ("EIG") pipeline.

Two median conventions exist in the reference and both are kept:

* ``"average"`` (cEIG.cpp:55-65): full sort; for even n the average of
  the two middle elements.
* ``"upper"`` (gKL2.cu:396-398): plain ``sorted[n/2]``.

Side assignment is ``side = (median > value)`` (cEIG.cpp:218,
gKL2.cu:403-414), i.e. values >= median go to side 0.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.io.eigfile import EigResult
from eig_kl_tpu.io.hgr import Hypergraph
from eig_kl_tpu.utils.config import SpectralConfig


def median_split(values: jnp.ndarray, convention: str = "average"):
    """Split node values at the median.

    Returns (median, sides) with ``sides[i] = median > values[i]``.
    """
    v = jnp.sort(values)
    n = values.shape[0]
    if convention == "average":
        med = jnp.where(
            n % 2 != 0, v[n // 2], 0.5 * (v[(n - 1) // 2] + v[n // 2])
        )
    elif convention == "upper":
        med = v[n // 2]
    else:
        raise ValueError(f"unknown median convention {convention!r}")
    sides = (med > values).astype(jnp.int8)
    return med, sides


def eig_partition(
    hg: Hypergraph,
    config: SpectralConfig = SpectralConfig(),
    *,
    dtype=jnp.float64,
    graph: DeviceGraph | None = None,
    host_graph=None,
) -> EigResult:
    """The full spectral phase: clique-expand (2/k weights), solve for
    the Fiedler pair, median-split.  Equivalent of ``./cEIG <file>``
    (cEIG.cpp:138-229) producing a writable :class:`EigResult`.

    Args:
      hg: input hypergraph.
      config: solver selection + tolerances.  With ``host_refine`` on
        (the default for f32 lanczos/lobpcg runs), the device-converged
        f32 Ritz pair is polished to f64 accuracy by a ~25-step host
        Lanczos (:mod:`eig_kl_tpu.spectral.refine`), meeting the 1e-6
        golden-parity bar without x64 emulation on the chip.
      dtype: float64 for pure-device Spectra parity; float32 (+ host
        refinement) on TPU for speed.
      graph: optionally a pre-built DeviceGraph ("eig" weighting for the
        lanczos/lobpcg solvers, "kl" weighting for the power solver,
        matching gKL2's reuse of the KL adjacency, gKL2.cu:262-303).
      host_graph: optionally the matching host CSR :class:`Graph`
        (built internally when omitted and refinement is on).
    """
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.utils.config import resolve_solver

    config = resolve_solver(config, hg.num_nodes)
    refine = config.host_refine
    if refine is None:
        refine = config.solver in ("lanczos", "lobpcg") and (
            jnp.dtype(dtype) == jnp.float32
        )

    if config.solver == "power":
        from eig_kl_tpu.spectral.power import power_partition_fiedler

        if graph is None:
            graph = clique_expand(hg, "kl").to_device(dtype=dtype)
        # Fused solve + "upper" median split: the solver packs
        # [vector, median, lambda, iterations] into one array so the
        # whole phase costs a single device fetch (a ~30 ms-floor
        # operation through the tunnel; the unpacked path paid it 5x).
        lam, med, vec, sides = power_partition_fiedler(
            graph, config, dtype=dtype
        )
    elif config.solver in ("lanczos", "lobpcg"):
        if graph is None:
            if host_graph is None:
                host_graph = clique_expand(hg, "eig")
            graph = host_graph.to_device(dtype=dtype)
        if config.solver == "lanczos":
            from eig_kl_tpu.spectral.lanczos import lanczos_fiedler

            res = lanczos_fiedler(graph, config, dtype=dtype)
            lam, vec = res.eigenvalue, res.vector
        else:
            from eig_kl_tpu.spectral.lobpcg_solver import lobpcg_fiedler

            res = lobpcg_fiedler(graph, config, dtype=dtype)
            lam, vec = res.eigenvalue, res.vector
        if refine:
            from eig_kl_tpu.spectral.refine import refine_fiedler_host

            if host_graph is None:
                host_graph = clique_expand(hg, "eig")
            rf = refine_fiedler_host(
                host_graph, np.asarray(vec), tol=config.tolerance * 1e-3
            )
            lam, vec = rf.eigenvalue, jnp.asarray(rf.vector)
        med, sides = median_split(vec, convention="average")
    else:
        raise ValueError(f"unknown spectral solver {config.solver!r}")

    return EigResult(
        eigenvalue=float(lam),
        median=float(med),
        sides=np.asarray(sides),
        values=np.asarray(vec, dtype=np.float64),
    )

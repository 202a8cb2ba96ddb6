"""Initial partitioners.

Two initializers exist in the reference and both are kept:

* random: Fisher-Yates shuffle then split at n/2 (cKL.cpp:175-193,
  gKL.cu:304-319).
* spectral ("-EIG"): read sides from the EIG result file
  (cKL.cpp:155-174) -- here, directly from an :class:`EigResult` or the
  on-disk file.
"""

from __future__ import annotations

import numpy as np

from eig_kl_tpu.io.eigfile import EigResult, read_eig_file


def random_split(num_nodes: int, seed: int | np.random.Generator = 0) -> np.ndarray:
    """Random balanced bipartition: int8[n] sides, exactly floor(n/2)
    nodes on side 0 (matching cKL.cpp:183-192's split at mid)."""
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    perm = rng.permutation(num_nodes)
    sides = np.ones(num_nodes, dtype=np.int8)
    sides[perm[: num_nodes // 2]] = 0
    return sides


def reference_shuffle_init(
    g, seed: int | np.random.Generator = 0
) -> tuple[object, np.ndarray, np.ndarray]:
    """Random init reproducing the reference's *tie-break ensemble*.

    cKL shuffles the node list and splits it at n/2 (cKL.cpp:175-193),
    then scans ``remain[]`` in that shuffle order — so equal-gain ties
    break in a fresh random order every run.  Our engines tie-break by
    node index (argmax picks the lowest index), which by itself yields
    a *different, narrower* outcome distribution on tie-rich circuits
    (measured: ibm01 random-init mean 3334 index-ordered vs 3216
    shuffle-ordered vs 3189 for the reference binary).

    Relabeling the graph by the shuffle permutation and splitting at
    n/2 makes index order == shuffle order, reproducing the reference
    ensemble exactly.

    Args:
      g: host :class:`eig_kl_tpu.graph.csr.Graph`.
      seed: int seed or Generator for the shuffle.

    Returns:
      ``(relabeled_graph, sides, perm)``: run any engine on
      ``relabeled_graph`` with ``sides`` (first half side 0); map a
      partition ``p_new`` back to original node ids with
      ``p_old[perm] = p_new``.
    """
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    n = g.num_nodes
    perm = rng.permutation(n)
    sides = np.ones(n, dtype=np.int8)
    sides[: n // 2] = 0
    return g.relabel(perm), sides, perm


def split_from_eig(eig: EigResult | str) -> np.ndarray:
    """Sides from a spectral result (object or file path)."""
    if isinstance(eig, str):
        eig = read_eig_file(eig)
    return eig.sides.astype(np.int8)


def sides_balance(sides: np.ndarray) -> tuple[int, int]:
    right = int(np.asarray(sides).sum())
    return len(sides) - right, right


def perturb_split(
    sides: np.ndarray,
    seed: int | np.random.Generator = 0,
    frac: float = 0.05,
) -> np.ndarray:
    """Balanced perturbation of an existing partition: swap the sides
    of ``ceil(frac * n / 2)`` random cross pairs (one node from each
    side), preserving the balance exactly.

    This seeds *spectral multi-start*: each start jitters the spectral
    init into a different KL basin, and multi-pass refinement
    (:mod:`eig_kl_tpu.kl.multipass`) descends each.  The reference has
    no analog — its only diversification is a fully random init
    (cKL.cpp:175-193), which starts ~7x further from the optimum
    (measured ibm01: random-init multi-pass mean 1646 vs
    perturbed-power-init best-of-8 356, reference -EIG flow 497).
    """
    sides = np.asarray(sides, dtype=np.int8)
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    rng = (
        seed
        if isinstance(seed, np.random.Generator)
        else np.random.default_rng(seed)
    )
    side0 = np.flatnonzero(sides == 0)
    side1 = np.flatnonzero(sides == 1)
    k = min(int(np.ceil(frac * len(sides) / 2)), len(side0), len(side1))
    if k == 0:  # frac == 0 disables the jitter entirely
        return sides.copy()
    out = sides.copy()
    out[rng.choice(side0, size=k, replace=False)] = 1
    out[rng.choice(side1, size=k, replace=False)] = 0
    return out

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


def split_from_eig(eig: EigResult | str) -> np.ndarray:
    """Sides from a spectral result (object or file path)."""
    if isinstance(eig, str):
        eig = read_eig_file(eig)
    return eig.sides.astype(np.int8)


def sides_balance(sides: np.ndarray) -> tuple[int, int]:
    right = int(np.asarray(sides).sum())
    return len(sides) - right, right

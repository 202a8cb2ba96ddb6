"""Clique expansion: hypergraph -> weighted graph.

Each k-pin net is expanded into all k(k-1)/2 node pairs; weights of
duplicate pairs (the same pair produced by several nets, or repeated
pins) accumulate.  Two weight conventions exist in the reference and
both are preserved here:

* ``"eig"``: weight ``2/k`` per pair (cEIG.cpp:110) -- used to build the
  graph Laplacian for the spectral phase.
* ``"kl"``: weight ``1/(k-1)`` per pair (cKL.cpp:117, gKL.cu:602) --
  used by KL refinement.

Nets with fewer than 2 pins contribute nothing (gKL.cu:622 skips them
explicitly; in cEIG/cKL the pair loops are simply empty).

The expansion is the reference's hot O(sum k^2) CPU loop
(cEIG.cpp:105-121).  Here it is fully vectorized: nets are grouped by
size so each group becomes one reshape + fancy-index, and duplicate
accumulation is one ``np.unique`` + ``np.bincount``.  A native C++
implementation (``native/``) provides a faster path for very large
instances; both produce identical CSR output.
"""

from __future__ import annotations

import numpy as np

from eig_kl_tpu.graph.csr import Graph
from eig_kl_tpu.io.hgr import Hypergraph

_WEIGHTINGS = ("eig", "kl")


def _pair_weight(weighting: str, k: np.ndarray | int):
    if weighting == "eig":
        return 2.0 / np.asarray(k, dtype=np.float64)
    if weighting == "kl":
        return 1.0 / (np.asarray(k, dtype=np.float64) - 1.0)
    raise ValueError(f"weighting must be one of {_WEIGHTINGS}, got {weighting!r}")


def expand_pairs(
    hg: Hypergraph, weighting: str = "kl"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Expand every net into (u, v, w) pair triples with u, v unordered
    and duplicates *not yet* merged.  Returns int64 u, v and float64 w.
    """
    sizes = hg.net_sizes.astype(np.int64)
    us, vs, ws = [], [], []
    for k in np.unique(sizes):
        if k < 2:
            continue
        sel = np.nonzero(sizes == k)[0]
        starts = hg.net_offsets[sel]
        # (m, k) matrix of pins for all nets of this size
        pk = hg.pins[starts[:, None] + np.arange(k)[None, :]].astype(np.int64)
        ju, ku = np.triu_indices(int(k), 1)
        us.append(pk[:, ju].ravel())
        vs.append(pk[:, ku].ravel())
        w = float(_pair_weight(weighting, int(k)))
        ws.append(np.full(pk.shape[0] * ju.size, w, dtype=np.float64))
    if not us:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), np.zeros(0, dtype=np.float64)
    return np.concatenate(us), np.concatenate(vs), np.concatenate(ws)


def clique_expand(
    hg: Hypergraph,
    weighting: str = "kl",
    *,
    dtype=np.float64,
    use_native: bool | None = None,
) -> Graph:
    """Clique-expand a hypergraph into a symmetric weighted :class:`Graph`.

    Duplicate pairs are weight-accumulated (matching Eigen's
    ``setFromTriplets`` dup-sum at cEIG.cpp:124 and the ``+=`` insert at
    cKL.cpp:128).  Self-loops arising from repeated pins within one net
    are dropped (they cannot occur in well-formed circuits and would not
    affect cuts).
    """
    if weighting not in _WEIGHTINGS:
        raise ValueError(f"weighting must be one of {_WEIGHTINGS}, got {weighting!r}")
    if use_native is not False:
        try:
            from eig_kl_tpu.io import native_io

            return native_io.clique_expand_native(hg, weighting, dtype=dtype)
        except (ImportError, OSError):
            if use_native is True:
                raise
    u, v, w = expand_pairs(hg, weighting)
    keep = u != v
    u, v, w = u[keep], v[keep], w[keep]
    n = hg.num_nodes
    # Canonicalize to upper triangle, then dedup-accumulate.
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    key = lo * n + hi
    uniq, inv = np.unique(key, return_inverse=True)
    acc = np.bincount(inv, weights=w, minlength=uniq.size)
    lo = (uniq // n).astype(np.int32)
    hi = (uniq % n).astype(np.int32)
    return Graph.from_upper_coo(n, lo, hi, acc.astype(dtype))

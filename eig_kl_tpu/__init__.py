"""eig_kl_tpu — a TPU-native hypergraph 2-way partitioning framework.

A ground-up JAX/XLA/Pallas re-design of the classic hybrid partitioner
(spectral "EIG" initialization via the Fiedler vector of a clique-expanded
graph Laplacian, followed by Kernighan-Lin-style "KL" gain-driven swap
refinement) with the same capabilities as the reference CUDA/C++ project
(see /root/reference: cEIG.cpp, cKL.cpp, gKL.cu, gKL2.cu).

Design stance (TPU-first, not a port):

* All per-iteration KL state (side vector, lock mask, cached ``A @ s``,
  cut size) lives on-device inside ``jax.lax.while_loop``; there is no
  host<->device traffic per swap (the reference crosses the device
  boundary 4x per swap, gKL.cu:205-226).
* The gain vector for *all* nodes is one SpMV: with the signed side
  vector ``s in {+1,-1}^n``, ``D = E - I = -s * (A @ s)``.  Swaps update
  ``A @ s`` incrementally in O(degree) via gather/scatter on a padded
  (ELL) adjacency -- the reference's per-iteration full gain kernel
  relaunch (gKL.cu:459-462) becomes two row updates.
* Shrinking ``remain[]`` work lists (cKL.cpp:274-286) become a
  fixed-shape lock mask (XLA needs static shapes).
* Multi-chip scaling is via ``jax.sharding``/``shard_map`` over an ICI
  mesh (node axis sharded for gains/SpMV, ``psum``-style reductions for
  argmax/cut) -- a new capability; the reference is single-device.
"""

__version__ = "0.1.0"

from eig_kl_tpu.io.hgr import Hypergraph, read_hgr, write_hgr
from eig_kl_tpu.io.eigfile import EigResult, read_eig_file, write_eig_file
from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.graph.csr import Graph, DeviceGraph

__all__ = [
    "Hypergraph",
    "read_hgr",
    "write_hgr",
    "EigResult",
    "read_eig_file",
    "write_eig_file",
    "clique_expand",
    "Graph",
    "DeviceGraph",
    "__version__",
]

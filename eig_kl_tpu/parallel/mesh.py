"""Device mesh construction and sharding helpers.

The reference is single-device (SURVEY.md section 2: no distribution
anywhere); multi-chip scaling is a new capability of the rebuild.  Two
parallel axes map naturally onto an ICI mesh:

* ``"mp"`` (model/graph parallel): the **node axis** -- ELL adjacency
  rows, the cached ``A @ s``, gains, and lock masks are sharded;
  selection uses a local-argmax + tiny all-gather reduction; swap
  updates broadcast two adjacency rows with ``psum``.
* ``"dp"`` (data parallel): **multi-start** KL -- a batch of
  independent refinements from different seeds, one (or more) per
  device; the cheap way to exploit chips for instances below the
  single-chip memory/latency crossover.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, dp: int = 1, axis_names=("dp", "mp")
) -> Mesh:
    """Create a (dp, mp) mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % dp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by dp={dp}")
    arr = np.asarray(devices[:n_devices]).reshape(dp, n_devices // dp)
    return Mesh(arr, axis_names)


def node_sharding(mesh: Mesh, axis: str = "mp") -> NamedSharding:
    """Sharding that splits the leading (node) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""A/B: sort-median vs rank-select median in the power solver, on TPU.

The sign-stability exit recomputes the "upper" median every
check_interval steps; commit 898e6b1 replaced the jnp.sort with an
exact 32-pass rank selection on TPU (eig_kl_tpu/ops/select.py).  This
times the full spectral phase both ways in ONE process (the gate is
trace-time, so jax.clear_caches() forces the retrace) and checks the
results are bit-identical.

Usage: python benchmarks/diag_median_ab.py [multiplier]   # default 1.0
"""

import os
import sys
import time

from eig_kl_tpu.utils.jaxcache import (
    enable_persistent_cache,
    ensure_responsive_backend,
)

probe = ensure_responsive_backend()
enable_persistent_cache()

import jax
import jax.numpy as jnp

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.spectral.partition import eig_partition
from eig_kl_tpu.utils.config import SpectralConfig

mult = sys.argv[1] if len(sys.argv) > 1 else "1.0"
print(f"backend={jax.default_backend()} (probe={probe})", flush=True)
hg = read_hgr(os.path.join(os.path.dirname(__file__), "data", f"gen_{mult}_42.hgr"))
t0 = time.perf_counter()
g = clique_expand(hg, "kl").to_device(
    dtype=jnp.float32, with_plan=jax.default_backend() == "tpu"
)
jax.block_until_ready(g.ell_weights)
print(f"build {time.perf_counter() - t0:.2f}s n={g.num_nodes}", flush=True)
cfg = SpectralConfig(solver="power")

results = {}
for mode, name in (("0", "sort"), ("1", "select")):
    os.environ["EIG_KL_TPU_MEDIAN_SELECT"] = mode
    jax.clear_caches()  # the gate is trace-time; force a retrace
    t0 = time.perf_counter()
    eig = eig_partition(hg, cfg, dtype=jnp.float32, graph=g)
    print(
        f"[{name}] warm {time.perf_counter() - t0:.2f}s "
        f"lam={eig.eigenvalue:.9f} med={eig.median:.9e}",
        flush=True,
    )
    for i in range(3):
        t0 = time.perf_counter()
        eig = eig_partition(hg, cfg, dtype=jnp.float32, graph=g)
        print(f"[{name}] run{i} spectral {time.perf_counter() - t0:.3f}s", flush=True)
    results[name] = eig
del os.environ["EIG_KL_TPU_MEDIAN_SELECT"]

a, b = results["sort"], results["select"]
assert a.eigenvalue == b.eigenvalue, (a.eigenvalue, b.eigenvalue)
assert a.median == b.median, (a.median, b.median)
import numpy as np

np.testing.assert_array_equal(a.sides, b.sides)
print("bit-identical across modes: OK", flush=True)

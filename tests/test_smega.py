"""Sharded mega-kernel (smega) trajectory parity on the CPU mesh.

The engine under test runs the whole KL swap loop inside one Pallas
kernel per shard with remote-DMA candidate/w_ab exchange
(eig_kl_tpu/parallel/smega.py); interpret mode emulates the RDMA and
semaphores on the simulated mesh.

Mesh sizes: 1 (degenerate, no exchange), 2 and 4 (real two-round RDMA
protocol).  A full 8-shard mesh is exercised by the driver dryrun; in
THIS suite the conftest pins exactly 8 virtual devices and the PJRT CPU
client services blocking interpret callbacks and host transfers from
one pool sized by the device count — an 8-shard pallas run would leave
no spare pool thread and can deadlock on this 1-core host, so the suite
stops at 4 shards (half the pool free).  align=128 keeps every pallas
input under the client's ~100 KB small-transfer cutoff for the same
reason (see smega_refine's docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import Hypergraph
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.kl.init import random_split
from eig_kl_tpu.parallel.mesh import make_mesh
from eig_kl_tpu.parallel.smega import _build_colT, smega_refine
from eig_kl_tpu.utils.config import KLConfig

from test_kl import dyadic_hypergraph


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    hg = dyadic_hypergraph(rng, num_nodes=61, num_nets=140)
    g = clique_expand(hg, "kl")
    sides = random_split(g.num_nodes, seed=9)
    ref = refine(g.to_device(dtype=jnp.float32), sides, KLConfig())
    return g, sides, ref


def _assert_parity(sm, ref):
    assert sm.iterations == ref.iterations
    np.testing.assert_array_equal(
        np.asarray(sm.cut_trajectory), np.asarray(ref.cut_trajectory)
    )
    np.testing.assert_array_equal(
        np.asarray(sm.gain_trajectory), np.asarray(ref.gain_trajectory)
    )
    np.testing.assert_array_equal(sm.sides, ref.sides)
    np.testing.assert_array_equal(sm.best_sides, ref.best_sides)
    # Incremental vs from-scratch oracle (gKL.cu:524-530).
    assert abs(sm.verified_cut - sm.final_cut) < 1e-3


def test_smega_mesh1_matches_single_chip(problem):
    g, sides, ref = problem
    mesh = make_mesh(1)
    sm = smega_refine(g, sides, mesh, KLConfig(), interpret=True)
    _assert_parity(sm, ref)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_smega_sharded_matches_single_chip(problem, n_shards):
    """The RDMA exchange protocol must reproduce the single-chip
    trajectory bit-for-bit (dyadic weights -> bit-stable float ops,
    global first-max tie order preserved across the shard split)."""
    g, sides, ref = problem
    mesh = make_mesh(n_shards)
    sm = smega_refine(
        g, sides, mesh, KLConfig(), interpret=True, align=128
    )
    _assert_parity(sm, ref)


def test_smega_overflow_columns():
    """Columns with more than 15 local entries spill to the indirect
    overflow level; a hypergraph with 33-pin nets (dyadic 1/32 weights)
    forces that path and must still match the single-chip engine."""
    rng = np.random.default_rng(5)
    nn = 61
    sizes = np.concatenate([
        np.full(6, 33), rng.choice([2, 3, 5], size=80, p=[0.5, 0.3, 0.2]),
    ])
    pins = np.concatenate(
        [rng.choice(nn, size=k, replace=False) for k in sizes]
    ).astype(np.int32)
    offs = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    hg = Hypergraph(
        num_nodes=nn, num_nets=len(sizes), pins=pins, net_offsets=offs
    )
    g = clique_expand(hg, "kl")
    sides = random_split(nn, seed=3)

    # The layout must actually overflow somewhere, or this test is vacuous.
    for n_shards in (1, 2):
        ci, _, oi, _ = _build_colT(g, 1024 * max(n_shards, 1), n_shards)
        assert (oi[:, :, 0] > 0).any(), "expected overflow columns"

    ref = refine(g.to_device(dtype=jnp.float32), sides, KLConfig())
    for n_shards in (1, 2):
        sm = smega_refine(
            g, sides, make_mesh(n_shards), KLConfig(),
            interpret=True, align=128 if n_shards > 1 else 1024,
        )
        _assert_parity(sm, ref)


def test_smega_honors_cap(problem):
    g, sides, _ = problem
    for cap in [0, 1, 7]:
        sm = smega_refine(
            g, sides, make_mesh(2), KLConfig(max_iterations=cap),
            interpret=True, align=128,
        )
        assert sm.iterations <= cap


def test_smega_plan_reuse(problem):
    """A prebuilt SmegaPlan must produce bit-identical results to the
    build-per-call path, and serve multiple refinements (different
    initial partitions) from one host build + device upload."""
    from eig_kl_tpu.parallel.smega import SmegaPlan

    g, sides, ref = problem
    mesh = make_mesh(2)
    plan = SmegaPlan(g, n_shards=2, align=128)
    sm = smega_refine(
        g, sides, mesh, KLConfig(), interpret=True, align=128, plan=plan
    )
    _assert_parity(sm, ref)
    # Second call, different init, same plan object (device cache warm).
    sides2 = random_split(g.num_nodes, seed=17)
    ref2 = refine(g.to_device(dtype=jnp.float32), sides2, KLConfig())
    sm2 = smega_refine(
        g, sides2, mesh, KLConfig(), interpret=True, align=128, plan=plan
    )
    _assert_parity(sm2, ref2)
    # Shard-count mismatch is refused, not silently rebuilt.
    with pytest.raises(AssertionError):
        smega_refine(
            g, sides, make_mesh(1), KLConfig(), interpret=True, plan=plan
        )

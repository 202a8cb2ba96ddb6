"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.kl.init import random_split
from eig_kl_tpu.parallel.mesh import make_mesh
from eig_kl_tpu.parallel.sharded_kl import sharded_refine
from eig_kl_tpu.parallel.multi_start import multi_start_refine
from eig_kl_tpu.utils.config import KLConfig

from test_kl import dyadic_hypergraph


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(21)
    hg = dyadic_hypergraph(rng, num_nodes=61, num_nets=140)  # odd n -> padding
    g = clique_expand(hg, "kl")
    sides = random_split(g.num_nodes, seed=9)
    return g, sides


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, dp=2)
    assert mesh.shape == {"dp": 2, "mp": 4}
    mesh2 = make_mesh(8)
    assert mesh2.shape == {"dp": 1, "mp": 8}


def test_sharded_matches_single_chip(problem):
    """The sharded engine must produce the exact same trajectory as the
    single-chip engine (dyadic weights -> bit-stable arithmetic)."""
    g, sides = problem
    mesh = make_mesh(8)
    ref = refine(g.to_device(dtype=jnp.float64), sides, KLConfig())
    shd = sharded_refine(g, sides, mesh, KLConfig(), dtype=jnp.float64)
    assert shd.iterations == ref.iterations
    np.testing.assert_allclose(shd.cut_trajectory, ref.cut_trajectory, rtol=1e-12)
    np.testing.assert_allclose(shd.gain_trajectory, ref.gain_trajectory, rtol=1e-12)
    np.testing.assert_array_equal(shd.sides, ref.sides)
    np.testing.assert_array_equal(shd.best_sides, ref.best_sides)
    assert shd.drift < 1e-9


def test_owner_computes_matches_single_chip(problem):
    """The O(1)-scalar owner-computes engine must reproduce the
    single-chip trajectory exactly (same selection tie-breaking, same
    float ops; dyadic weights -> bit-stable arithmetic)."""
    from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc

    g, sides = problem
    mesh = make_mesh(8)
    ref = refine(g.to_device(dtype=jnp.float64), sides, KLConfig())
    shd = sharded_refine_oc(g, sides, mesh, KLConfig(), dtype=jnp.float64)
    assert shd.iterations == ref.iterations
    np.testing.assert_allclose(shd.cut_trajectory, ref.cut_trajectory, rtol=1e-12)
    np.testing.assert_allclose(shd.gain_trajectory, ref.gain_trajectory, rtol=1e-12)
    np.testing.assert_array_equal(shd.sides, ref.sides)
    np.testing.assert_array_equal(shd.best_sides, ref.best_sides)
    assert shd.drift < 1e-9


def test_owner_computes_various_shard_counts(problem):
    from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc

    g, sides = problem
    ref = refine(g.to_device(dtype=jnp.float64), sides, KLConfig())
    for nd in (2, 4):
        mesh = make_mesh(nd)
        shd = sharded_refine_oc(g, sides, mesh, KLConfig(), dtype=jnp.float64)
        np.testing.assert_allclose(
            shd.cut_trajectory, ref.cut_trajectory, rtol=1e-12
        )


def test_owner_computes_overflow_columns(rng):
    """High-degree columns exceeding the dense CSC-ELL slot count
    (_CMAX_DENSE) spill to the per-shard overflow lists; the
    trajectory must still match the single-chip engine exactly."""
    from conftest import random_hypergraph
    from eig_kl_tpu.parallel import sharded_kl2
    from eig_kl_tpu.parallel.sharded_kl2 import (
        _transpose_partition,
        sharded_refine_oc,
    )
    from eig_kl_tpu.io.hgr import Hypergraph

    hg = random_hypergraph(rng, num_nodes=64, num_nets=60, max_net=4)
    # One extra 41-pin net -> a 40-degree clique; with 2 shards some
    # columns hold >16 local entries and must overflow.
    pins = np.concatenate([hg.pins, np.arange(41, dtype=np.int32)])
    offs = np.concatenate(
        [hg.net_offsets, [hg.net_offsets[-1] + 41]]
    ).astype(np.int64)
    hg = Hypergraph(
        num_nodes=64, num_nets=hg.num_nets + 1, pins=pins, net_offsets=offs
    )
    g = clique_expand(hg, "kl", use_native=False)
    n_shards = 2
    colT_r, colT_w, ov_r, ov_c, ov_w, cmax = _transpose_partition(
        g, 64, n_shards, np.float64
    )
    assert cmax == sharded_kl2._CMAX_DENSE
    assert (ov_c >= 0).sum() > 0, "test graph must exercise overflow"
    # Every nnz entry lands exactly once across the two levels.
    assert (colT_w != 0).sum() + (ov_c >= 0).sum() == g.nnz

    sides = random_split(64, 3)
    ref = refine(g.to_device(dtype=jnp.float64), sides, KLConfig())
    shd = sharded_refine_oc(g, sides, make_mesh(2), KLConfig(), dtype=jnp.float64)
    assert shd.iterations == ref.iterations
    np.testing.assert_allclose(shd.cut_trajectory, ref.cut_trajectory, rtol=1e-12)
    np.testing.assert_array_equal(shd.sides, ref.sides)
    assert shd.drift < 1e-9


def test_owner_computes_bf16_index_packing(problem):
    """With a bfloat16 compute dtype, node indices above 256 cannot
    survive a value cast; the bitcast packing must keep the swap log's
    ids exact and the cut oracle consistent."""
    from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc
    from conftest import random_hypergraph

    rng = np.random.default_rng(9)
    hg = random_hypergraph(rng, num_nodes=320, num_nets=600, max_net=4)
    g = clique_expand(hg, "kl", use_native=False)
    sides = random_split(320, 1)
    shd = sharded_refine_oc(
        g, sides, make_mesh(4), KLConfig(max_iterations=40),
        dtype=jnp.bfloat16,
    )
    # Swapped ids recorded in the log must be real node ids (mapping
    # through bf16 values would collapse most of them to multiples of 2).
    assert shd.iterations > 0
    assert int(np.asarray(shd.sides).sum()) == int(sides.sum())
    # bf16 arithmetic is coarse; the oracle still bounds the drift.
    assert shd.drift <= max(4.0, 0.05 * abs(shd.final_cut))


def test_sharded_on_2d_mesh(problem):
    """Works when the mesh also has a dp axis (computation replicated
    across dp)."""
    g, sides = problem
    mesh = make_mesh(8, dp=2)
    shd = sharded_refine(g, sides, mesh, KLConfig(max_iterations=5))
    assert shd.iterations <= 5
    assert shd.initial_cut > 0


def test_sharded_various_shard_counts(problem):
    g, sides = problem
    ref = refine(g.to_device(dtype=jnp.float64), sides, KLConfig())
    for nd in (2, 4):
        mesh = make_mesh(nd)
        shd = sharded_refine(g, sides, mesh, KLConfig(), dtype=jnp.float64)
        np.testing.assert_allclose(
            shd.cut_trajectory, ref.cut_trajectory, rtol=1e-12
        )


def test_multi_start_finds_better_or_equal(problem):
    g, _ = problem
    dg = g.to_device(dtype=jnp.float64)
    single = refine(dg, random_split(g.num_nodes, 0), KLConfig())
    best, cuts = multi_start_refine(dg, 8, base_seed=0)
    assert cuts.shape == (8,)
    assert best.best_cut == pytest.approx(cuts.min())
    assert best.best_cut <= single.best_cut + 1e-9
    # start 0 of the batch reproduces the single run exactly
    assert cuts[0] == pytest.approx(single.best_cut, rel=1e-12)


def test_multi_start_sharded_over_dp(problem):
    g, _ = problem
    dg = g.to_device(dtype=jnp.float64)
    mesh = make_mesh(8, dp=8)
    best_m, cuts_m = multi_start_refine(dg, 8, mesh=mesh, base_seed=0)
    best_r, cuts_r = multi_start_refine(dg, 8, base_seed=0)
    np.testing.assert_allclose(cuts_m, cuts_r, rtol=1e-12)
    assert best_m.best_cut == pytest.approx(best_r.best_cut)


def test_multi_start_mega_launch_chunking(problem):
    """Auto-splitting a big batch into multiple kernel launches (the
    TPU-worker-watchdog guard) returns the same per-start results as a
    single launch."""
    from eig_kl_tpu.parallel.multi_start import multi_start_refine_mega

    g_host, _sides = problem
    best_1, cuts_1 = multi_start_refine_mega(
        g_host, 6, base_seed=2, launch_chunk=6
    )
    best_c, cuts_c = multi_start_refine_mega(
        g_host, 6, base_seed=2, launch_chunk=4
    )
    np.testing.assert_allclose(cuts_c, cuts_1, rtol=1e-6)
    assert best_c.best_cut == pytest.approx(best_1.best_cut)


def test_multi_start_mega_sharded_matches_batched(problem):
    """The dp-sharded batched mega-kernel multi-start (one Pallas grid
    launch per chip) reproduces the single-chip batched engine exactly
    on every start."""
    from eig_kl_tpu.parallel.multi_start import (
        multi_start_refine_mega,
        multi_start_refine_mega_sharded,
    )

    g_host, _sides = problem
    mesh = make_mesh(8, dp=8)
    best_s, cuts_s = multi_start_refine_mega_sharded(
        g_host, 8, mesh=mesh, base_seed=5
    )
    best_b, cuts_b = multi_start_refine_mega(g_host, 8, base_seed=5)
    np.testing.assert_allclose(cuts_s, cuts_b, rtol=1e-5)
    assert best_s.best_cut == pytest.approx(best_b.best_cut)
    np.testing.assert_array_equal(best_s.best_sides, best_b.best_sides)
    assert abs(best_s.verified_cut - best_s.final_cut) < 1e-3


def test_multi_start_mega_sharded_multipass(problem):
    """Multi-pass through the dp-sharded batched launch: per-start cuts
    match the single-chip batched multi-pass engine and never regress
    vs single-pass."""
    from eig_kl_tpu.parallel.multi_start import (
        multi_start_refine_mega,
        multi_start_refine_mega_sharded,
    )
    from eig_kl_tpu.utils.config import KLConfig

    g_host, _sides = problem
    mesh = make_mesh(8, dp=8)
    cfg = KLConfig(passes=3)
    best_s, cuts_s = multi_start_refine_mega_sharded(
        g_host, 8, mesh=mesh, base_seed=5, config=cfg
    )
    best_b, cuts_b = multi_start_refine_mega(
        g_host, 8, base_seed=5, config=cfg
    )
    np.testing.assert_allclose(cuts_s, cuts_b, rtol=1e-5)
    np.testing.assert_array_equal(best_s.best_sides, best_b.best_sides)
    _best_1, cuts_1 = multi_start_refine_mega_sharded(
        g_host, 8, mesh=mesh, base_seed=5
    )
    assert (cuts_s <= cuts_1 + 1e-6).all()


class TestShardedPower:
    def test_matches_single_chip_power(self, rng):
        """The mp-sharded power iteration reproduces the single-chip
        solver's (lambda, vector) when n divides the shard count (same
        initial draw, same convergence rule)."""
        from eig_kl_tpu.parallel.sharded_power import sharded_power_fiedler
        from eig_kl_tpu.spectral.power import power_iteration_fiedler
        from eig_kl_tpu.utils.config import SpectralConfig
        from conftest import random_hypergraph

        hg = random_hypergraph(rng, num_nodes=64, num_nets=128, max_net=5)
        g = clique_expand(hg, "kl")
        cfg = SpectralConfig(
            solver="power", convergence="gkl2", max_iterations=150
        )
        lam1, v1 = power_iteration_fiedler(
            g.to_device(dtype=jnp.float32), cfg, dtype=jnp.float32
        )
        mesh = make_mesh(8, dp=1)
        lam8, v8 = sharded_power_fiedler(g, mesh, cfg, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(v8), np.asarray(v1), rtol=2e-5, atol=2e-5
        )
        assert float(lam8) == pytest.approx(float(lam1), rel=1e-4, abs=1e-5)

    def test_padded_shard_counts(self, rng):
        """n not divisible by the shard count: zero-degree padding rows
        must not perturb the spectrum (checked against a fresh
        single-chip run on the same graph up to sign)."""
        from eig_kl_tpu.parallel.sharded_power import sharded_power_fiedler
        from eig_kl_tpu.spectral.power import power_iteration_fiedler
        from eig_kl_tpu.utils.config import SpectralConfig
        from conftest import random_hypergraph

        hg = random_hypergraph(rng, num_nodes=61, num_nets=128, max_net=5)
        g = clique_expand(hg, "kl")
        cfg = SpectralConfig(
            solver="power", convergence="gkl2", max_iterations=300
        )
        lam1, v1 = power_iteration_fiedler(
            g.to_device(dtype=jnp.float32), cfg, dtype=jnp.float32
        )
        mesh = make_mesh(8, dp=1)
        lam8, v8 = sharded_power_fiedler(g, mesh, cfg, dtype=jnp.float32)
        assert v8.shape == (61,)
        # Same operator -> same dominant eigenpair, possibly different
        # iterate path (different init shape); compare the subspace.
        corr = abs(np.vdot(np.asarray(v8), np.asarray(v1))) / (
            np.linalg.norm(np.asarray(v8)) * np.linalg.norm(np.asarray(v1))
        )
        assert corr > 0.99

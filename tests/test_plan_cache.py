"""Disk-cache tests for the v2 SpMV plan (ops/plan_cache.py).

The plan cache is this framework's pre_saved_EIG protocol
(cEIG.cpp:213-220 / cKL.cpp:155-174): compute the expensive
deterministic artifact once, reload it in every later process.  These
tests pin the round-trip (a reloaded plan computes the same matvec as
a freshly built one), the miss/hit lifecycle, and the non-fatality
contract — a failed cache WRITE must never kill the run (observed in
the wild: a deferred RESOURCE_EXHAUSTED surfacing at host-fetch time
inside save_v2, diag_vmem_ceiling probe 2026-08-20).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_hypergraph


@pytest.fixture
def big_graph(rng):
    """A graph over plan_for_graph's 32,768-nnz caching threshold."""
    from eig_kl_tpu.graph.expand import clique_expand

    hg = random_hypergraph(rng, num_nodes=2048, num_nets=7000)
    g = clique_expand(hg, "kl", use_native=False)
    assert g.nnz > 32_768, "fixture must exceed the caching threshold"
    return g


def _matvec(plan, g, rng):
    from eig_kl_tpu.ops.spmv_pallas import spmv_pallas

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(g.num_nodes), jnp.float32
    )
    return np.asarray(spmv_pallas(plan, x, interpret=True))


class TestPlanCacheRoundTrip:
    def test_miss_then_hit_same_matvec(self, big_graph, rng, tmp_path,
                                       monkeypatch):
        from eig_kl_tpu.ops import plan_cache
        from eig_kl_tpu.ops.spmv_pallas import plan_for_graph

        monkeypatch.setenv("EIG_KL_TPU_PLAN_CACHE", str(tmp_path))
        key = plan_cache.graph_key(big_graph)
        assert plan_cache.load_v2(key) is None  # cold

        p1 = plan_for_graph(big_graph)  # miss: builds + writes
        files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert files, "miss path must persist a plan file"

        p2 = plan_cache.load_v2(key)
        assert p2 is not None, "second process must hit"
        # Identical static geometry and identical matvec bits: the
        # plan is a pure function of the matrix, and the kernel is
        # deterministic for a fixed plan.
        for f in ("padded_nodes", "n_cb", "n_rbp", "quantum", "g1",
                  "g2", "rblock"):
            assert getattr(p1, f) == getattr(p2, f), f
        np.testing.assert_array_equal(
            _matvec(p1, big_graph, rng), _matvec(p2, big_graph, rng)
        )

    def test_key_depends_on_weights(self, big_graph, monkeypatch,
                                    tmp_path):
        from eig_kl_tpu.ops import plan_cache

        monkeypatch.setenv("EIG_KL_TPU_PLAN_CACHE", str(tmp_path))
        k1 = plan_cache.graph_key(big_graph)
        bumped = big_graph.__class__(
            num_nodes=big_graph.num_nodes,
            indptr=big_graph.indptr,
            indices=big_graph.indices,
            data=big_graph.data * 2.0,
        )
        assert plan_cache.graph_key(bumped) != k1

    def test_disabled_writes_nothing(self, big_graph, monkeypatch,
                                     tmp_path):
        from eig_kl_tpu.ops import plan_cache
        from eig_kl_tpu.ops.spmv_pallas import plan_for_graph

        monkeypatch.setenv("EIG_KL_TPU_PLAN_CACHE", "0")
        assert plan_cache.cache_dir() is None
        plan_for_graph(big_graph)
        assert not os.listdir(tmp_path)


class TestNonFatality:
    def test_save_failure_does_not_propagate(self, big_graph, tmp_path,
                                             monkeypatch):
        """A cache write that blows up mid-save (disk, or a device
        array that fails to fetch) must leave the caller with a
        working plan and no torn cache file."""
        from eig_kl_tpu.ops import plan_cache
        from eig_kl_tpu.ops.spmv_pallas import plan_for_graph

        monkeypatch.setenv("EIG_KL_TPU_PLAN_CACHE", str(tmp_path))

        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: simulated")

        monkeypatch.setattr(plan_cache.np, "savez", boom)
        plan = plan_for_graph(big_graph)  # must not raise
        assert plan is not None
        assert not [f for f in os.listdir(tmp_path)
                    if f.endswith(".npz")], "no torn/partial plan files"

    def test_ell_save_failure_nonfatal(self, monkeypatch, tmp_path):
        from eig_kl_tpu.ops import plan_cache

        monkeypatch.setenv("EIG_KL_TPU_PLAN_CACHE", str(tmp_path))

        def boom(*a, **k):
            raise RuntimeError("simulated")

        monkeypatch.setattr(plan_cache.np, "savez", boom)
        plan_cache.save_ell(
            "k", 8, np.float32,
            np.zeros((4, 8), np.int32), np.zeros((4, 8), np.float32),
        )  # must not raise

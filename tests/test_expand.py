"""Tests for clique expansion and graph containers."""

import numpy as np
import pytest
import scipy.sparse as sp

from eig_kl_tpu.io.hgr import Hypergraph, read_hgr
from eig_kl_tpu.graph.expand import clique_expand, expand_pairs

from conftest import circuit_path, random_hypergraph


def tiny_hg():
    """Two nets: {0,1,2} (3-pin) and {1,2} (2-pin) over 4 nodes."""
    return Hypergraph(
        num_nodes=4,
        num_nets=2,
        pins=np.array([0, 1, 2, 1, 2], dtype=np.int32),
        net_offsets=np.array([0, 3, 5], dtype=np.int64),
    )


def test_expand_weights_kl():
    """KL convention: w = 1/(k-1) per pair (cKL.cpp:117), duplicates sum."""
    g = clique_expand(tiny_hg(), "kl")
    # 3-pin net -> pairs (0,1),(0,2),(1,2) at w=1/2; 2-pin net -> (1,2) at w=1.
    assert g.edge_weight(0, 1) == pytest.approx(0.5)
    assert g.edge_weight(0, 2) == pytest.approx(0.5)
    assert g.edge_weight(1, 2) == pytest.approx(1.5)
    assert g.edge_weight(0, 3) == 0.0
    assert g.edge_weight(2, 1) == pytest.approx(1.5)  # symmetric
    assert g.total_weight == pytest.approx(2.5)


def test_expand_weights_eig():
    """EIG convention: w = 2/k per pair (cEIG.cpp:110)."""
    g = clique_expand(tiny_hg(), "eig")
    assert g.edge_weight(0, 1) == pytest.approx(2.0 / 3.0)
    assert g.edge_weight(1, 2) == pytest.approx(2.0 / 3.0 + 1.0)


def test_expand_skips_tiny_nets():
    """1-pin nets contribute no edges (gKL.cu:622)."""
    hg = Hypergraph(
        num_nodes=3,
        num_nets=2,
        pins=np.array([0, 1, 2], dtype=np.int32),
        net_offsets=np.array([0, 1, 3], dtype=np.int64),
    )
    g = clique_expand(hg, "kl")
    assert g.nnz == 2  # just (1,2) both directions
    assert g.edge_weight(1, 2) == pytest.approx(1.0)


@pytest.mark.parametrize(
    "name,pair_count",
    [("fract", 869), ("ibm01", 144148)],
)
def test_pair_counts_match_baseline(name, pair_count):
    """Pre-dedup pair counts Sum k(k-1)/2 from BASELINE.md."""
    hg = read_hgr(circuit_path(name))
    u, v, w = expand_pairs(hg, "kl")
    assert u.shape[0] == pair_count


def test_expand_matches_scipy(rng):
    """Cross-check the vectorized expansion against a naive scipy build."""
    hg = random_hypergraph(rng, num_nodes=50, num_nets=80)
    g = clique_expand(hg, "kl")

    rows, cols, ws = [], [], []
    offs = hg.net_offsets
    for i in range(hg.num_nets):
        net = hg.pins[offs[i] : offs[i + 1]]
        k = len(net)
        if k < 2:
            continue
        w = 1.0 / (k - 1)
        for a in range(k):
            for b in range(a + 1, k):
                rows += [net[a], net[b]]
                cols += [net[b], net[a]]
                ws += [w, w]
    ref = sp.coo_matrix(
        (ws, (rows, cols)), shape=(hg.num_nodes, hg.num_nodes)
    ).tocsr()
    ref.sum_duplicates()
    ours = sp.csr_matrix(
        (g.data, g.indices, g.indptr), shape=(g.num_nodes, g.num_nodes)
    )
    assert (abs(ours - ref) > 1e-12).nnz == 0


def test_ell_padding(rng):
    hg = random_hypergraph(rng, num_nodes=40, num_nets=60)
    g = clique_expand(hg, "kl")
    ell_idx, ell_w = g.to_ell(pad_multiple=8)
    assert ell_idx.shape == ell_w.shape
    assert ell_idx.shape[1] % 8 == 0
    assert ell_idx.shape[1] >= g.max_degree
    # Row sums over ELL weights = weighted degrees.
    np.testing.assert_allclose(
        ell_w.sum(axis=1), g.weighted_degrees, rtol=1e-6
    )
    # Pad entries point at the row itself.
    n, dmax = ell_idx.shape
    deg = g.degrees
    for i in [0, n // 2, n - 1]:
        assert (ell_idx[i, deg[i] :] == i).all()
        assert (ell_w[i, deg[i] :] == 0).all()


def test_device_graph_roundtrip(rng):
    import jax.numpy as jnp

    hg = random_hypergraph(rng, num_nodes=32, num_nets=48)
    g = clique_expand(hg, "kl")
    dg = g.to_device()
    assert dg.num_nodes == 32
    assert float(dg.total_weight) == pytest.approx(g.total_weight, rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(dg.degrees), g.weighted_degrees, rtol=1e-6
    )


class TestEdgeCases:
    def _hg(self, num_nodes, nets):
        from eig_kl_tpu.io.hgr import Hypergraph

        pins = np.concatenate([np.asarray(e, np.int32) for e in nets]) if nets else np.zeros(0, np.int32)
        offs = np.zeros(len(nets) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in nets], out=offs[1:])
        return Hypergraph(
            num_nodes=num_nodes, num_nets=len(nets), pins=pins, net_offsets=offs
        )

    def test_one_pin_nets_skipped(self):
        """1-pin nets contribute no edges (the reference skips them,
        gKL.cu:622)."""
        from eig_kl_tpu.graph.expand import clique_expand

        hg = self._hg(4, [[0], [1, 2], [3]])
        g = clique_expand(hg, "kl", use_native=False)
        assert g.nnz == 2  # the single 2-pin net, both directions

    def test_isolated_nodes_locked_out_of_kl(self):
        """Nodes in no net have degree 0; KL runs and the cut oracle
        holds (generator circuits have ~7% isolated nodes at scale)."""
        import jax.numpy as jnp

        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.kl.engine import refine
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.utils.config import KLConfig

        hg = self._hg(16, [[0, 1], [2, 3, 4], [5, 6]])  # nodes 7..15 isolated
        g = clique_expand(hg, "kl", use_native=False).to_device(
            dtype=jnp.float32
        )
        r = refine(g, random_split(16, 0), KLConfig())
        assert r.drift < 1e-6
        assert r.best_cut <= r.initial_cut

    def test_duplicate_pins_in_net(self):
        """A net listing the same node twice must not create self loops."""
        from eig_kl_tpu.graph.expand import clique_expand

        hg = self._hg(3, [[0, 1, 1, 2]])
        g = clique_expand(hg, "kl", use_native=False)
        rows = np.repeat(np.arange(3), g.degrees)
        assert (rows != g.indices).all()


def test_ell_on_device_matches_host(rng):
    """The device-side ELL scatter (transfer-bound TPU path) is
    bit-identical to the host to_ell layout."""
    from tests.test_expand import random_hypergraph  # self-import safe

    hg = random_hypergraph(rng, num_nodes=57, num_nets=90)
    g = clique_expand(hg, "kl")
    h_idx, h_w = g.to_ell(pad_multiple=8)
    d_idx, d_w = g.ell_on_device(pad_multiple=8, dtype=np.float64)
    np.testing.assert_array_equal(np.asarray(d_idx), h_idx)
    np.testing.assert_array_equal(np.asarray(d_w), h_w)


def test_relabel_preserves_structure(rng):
    """relabel(perm) is an exact graph isomorphism: edge weights map
    through the permutation and cut values are label-invariant."""
    hg = random_hypergraph(rng, num_nodes=31, num_nets=50)
    g = clique_expand(hg, "kl")
    perm = rng.permutation(g.num_nodes)
    rg = g.relabel(perm)
    assert rg.nnz == g.nnz
    new_id = np.empty(g.num_nodes, dtype=np.int64)
    new_id[perm] = np.arange(g.num_nodes)
    for u in range(g.num_nodes):
        for v in range(u + 1, g.num_nodes):
            assert rg.edge_weight(int(new_id[u]), int(new_id[v])) == pytest.approx(
                g.edge_weight(u, v)
            )

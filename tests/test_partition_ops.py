"""Property tests for cut/gain algebra (the gKL.cu:524-530 oracle family)."""

import numpy as np
import jax.numpy as jnp
import pytest

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.ops import partition as P

from conftest import random_hypergraph


def brute_cut(g, sides):
    """O(nnz) from-scratch cut over the CSR (computeCutSize analog,
    gKL.cu:322-335)."""
    total = 0.0
    for i in range(g.num_nodes):
        for jj in range(g.indptr[i], g.indptr[i + 1]):
            j = g.indices[jj]
            if sides[i] != sides[j]:
                total += g.data[jj]
    return total / 2.0  # each cut edge seen from both ends


def brute_gains(g, sides):
    """D_i = E_i - I_i by direct neighbor scan (connections analog,
    cKL.cpp:225-251, membership-referenced as in gKL.cu:129-143)."""
    d = np.zeros(g.num_nodes)
    for i in range(g.num_nodes):
        for jj in range(g.indptr[i], g.indptr[i + 1]):
            j = g.indices[jj]
            w = g.data[jj]
            d[i] += w if sides[i] != sides[j] else -w
    return d


@pytest.fixture(scope="module")
def small_graph(rng=np.random.default_rng(7)):
    hg = random_hypergraph(rng, num_nodes=48, num_nets=70)
    return clique_expand(hg, "kl")


def test_cut_and_gains_match_bruteforce(small_graph):
    g = small_graph
    dg = g.to_device(dtype=jnp.float64)
    rng = np.random.default_rng(1)
    for _ in range(5):
        sides = rng.integers(0, 2, size=g.num_nodes)
        s = P.sides_to_signs(jnp.asarray(sides), dtype=jnp.float64)
        np.testing.assert_allclose(
            float(P.cut_size(dg, s)), brute_cut(g, sides), rtol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(P.gains(dg, s)), brute_gains(g, sides), rtol=1e-9
        )


def test_external_costs(small_graph):
    g = small_graph
    dg = g.to_device(dtype=jnp.float64)
    sides = np.arange(g.num_nodes) % 2
    s = P.sides_to_signs(jnp.asarray(sides), dtype=jnp.float64)
    e = np.asarray(P.external_costs(dg, s))
    assert e.min() >= -1e-12
    np.testing.assert_allclose(e.sum() / 2.0, brute_cut(g, sides), rtol=1e-9)


def test_swap_gain_identity(small_graph):
    """The KL invariant: cut(after swap) = cut(before) - (D_a + D_b - 2 w_ab)
    for a, b on opposite sides (cKL.cpp:360-362)."""
    g = small_graph
    dg = g.to_device(dtype=jnp.float64)
    rng = np.random.default_rng(2)
    sides = rng.integers(0, 2, size=g.num_nodes)
    s = jnp.asarray(P.sides_to_signs(jnp.asarray(sides), dtype=jnp.float64))
    d = P.gains(dg, s)
    left = np.nonzero(sides == 0)[0]
    right = np.nonzero(sides == 1)[0]
    for _ in range(10):
        a = int(rng.choice(left))
        b = int(rng.choice(right))
        gain = float(P.swap_gain(dg, d, jnp.asarray(a), jnp.asarray(b)))
        new_sides = sides.copy()
        new_sides[a], new_sides[b] = 1, 0
        assert brute_cut(g, new_sides) == pytest.approx(
            brute_cut(g, sides) - gain, rel=1e-9, abs=1e-12
        )


def test_edge_weight_lookup(small_graph):
    g = small_graph
    dg = g.to_device(dtype=jnp.float64)
    rng = np.random.default_rng(4)
    for _ in range(20):
        u = int(rng.integers(g.num_nodes))
        v = int(rng.integers(g.num_nodes))
        if u == v:
            continue
        assert float(
            P.edge_weight(dg, jnp.asarray(u), jnp.asarray(v))
        ) == pytest.approx(g.edge_weight(u, v), rel=1e-9, abs=1e-12)


def test_signs_roundtrip():
    sides = jnp.asarray(np.array([0, 1, 1, 0], dtype=np.int8))
    s = P.sides_to_signs(sides)
    np.testing.assert_array_equal(np.asarray(s), [1.0, -1.0, -1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(P.signs_to_sides(s)), [0, 1, 1, 0])

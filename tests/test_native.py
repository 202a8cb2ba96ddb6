"""Native C++ runtime parity tests: the ctypes-bound parser and graph
builder must agree exactly with the NumPy implementations."""

import numpy as np
import pytest

import jax


def test_native_plan_builders_match_numpy(rng):
    """The C++ counting-sort planners must produce bit-identical plans
    to the NumPy reference implementations (both v1 and v2)."""
    from eig_kl_tpu.io import native_io
    from eig_kl_tpu.io.hgr import Hypergraph
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.ops import spmv_pallas as SP

    if not native_io.available():
        pytest.skip("native library unavailable")
    sizes = rng.integers(2, 7, size=800)
    pins = np.concatenate(
        [rng.choice(2500, size=k, replace=False) for k in sizes]
    ).astype(np.int32)
    offs = np.zeros(801, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    hg = Hypergraph(num_nodes=2500, num_nets=800, pins=pins, net_offsets=offs)
    g = clique_expand(hg, "kl", use_native=False)
    n = g.num_nodes
    rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
    cols = g.indices.astype(np.int64)
    w = g.data.astype(np.float32)

    for build in (SP.build_plan, SP.build_plan_v2):
        nat = build(n, rows, cols, w, use_native=True)
        ref = build(n, rows, cols, w, use_native=False)
        for a, b in zip(
            jax.tree_util.tree_leaves(nat), jax.tree_util.tree_leaves(ref)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr, write_hgr

from conftest import circuit_path, random_hypergraph

native_io = pytest.importorskip("eig_kl_tpu.io.native_io")

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library not built"
)


@pytest.mark.parametrize("name", ["fract", "ibm01", "industry2"])
def test_native_parse_matches_python(name):
    path = circuit_path(name)
    hn = native_io.read_hgr_native(path)
    hp = read_hgr(path, use_native=False)
    assert hn.num_nets == hp.num_nets
    assert hn.num_nodes == hp.num_nodes
    np.testing.assert_array_equal(hn.pins, hp.pins)
    np.testing.assert_array_equal(hn.net_offsets, hp.net_offsets)


@pytest.mark.parametrize("weighting", ["eig", "kl"])
def test_native_expand_matches_python(rng, weighting):
    hg = random_hypergraph(rng, num_nodes=200, num_nets=400, max_net=8)
    gn = native_io.clique_expand_native(hg, weighting)
    gp = clique_expand(hg, weighting, use_native=False)
    assert gn.nnz == gp.nnz
    np.testing.assert_array_equal(gn.indptr, gp.indptr)
    np.testing.assert_array_equal(gn.indices, gp.indices)
    np.testing.assert_allclose(gn.data, gp.data, rtol=1e-12)


def test_native_expand_reference_circuit():
    hg = read_hgr(circuit_path("industry2"), use_native=False)
    gn = native_io.clique_expand_native(hg, "kl")
    gp = clique_expand(hg, "kl", use_native=False)
    assert gn.nnz == gp.nnz
    np.testing.assert_array_equal(gn.indices, gp.indices)
    np.testing.assert_allclose(gn.data, gp.data, rtol=1e-12)


def test_native_parse_error_handling(tmp_path):
    with pytest.raises(OSError):
        native_io.read_hgr_native(str(tmp_path / "missing.hgr"))
    bad = tmp_path / "bad.hgr"
    bad.write_text("2 3\n1 99\n2 3\n")  # pin 99 out of range
    with pytest.raises(OSError):
        native_io.read_hgr_native(str(bad))


def test_default_reader_uses_native(tmp_path, rng):
    """read_hgr/clique_expand auto-select the native path when built."""
    hg = random_hypergraph(rng, num_nodes=30, num_nets=40)
    p = str(tmp_path / "x.hgr")
    write_hgr(p, hg)
    h1 = read_hgr(p)  # auto
    h2 = read_hgr(p, use_native=True)
    np.testing.assert_array_equal(h1.pins, h2.pins)

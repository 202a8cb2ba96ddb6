"""Tests for the .hgr reader/writer and EIG file protocol.

Golden circuit statistics come from BASELINE.md (verified counts of the
bundled reference circuits).
"""

import numpy as np
import pytest

from eig_kl_tpu.io.hgr import read_hgr, write_hgr, Hypergraph
from eig_kl_tpu.io.eigfile import read_eig_file, write_eig_file, EigResult

from conftest import circuit_path, golden_eig_path


# (name, nets, nodes, pins, max_net) -- BASELINE.md benchmark table.
CIRCUIT_STATS = [
    ("fract", 147, 149, 462, 17),
    ("industry2", 13419, 12637, 48158, 585),
    ("ibm01", 14111, 12752, 50566, 42),
    ("ibm10", 75196, 69429, 297567, 41),
]


@pytest.mark.parametrize("name,nets,nodes,pins,max_net", CIRCUIT_STATS)
def test_read_reference_circuits(name, nets, nodes, pins, max_net):
    hg = read_hgr(circuit_path(name))
    assert hg.num_nets == nets
    assert hg.num_nodes == nodes
    assert hg.num_pins == pins
    assert hg.max_net_size == max_net
    assert hg.pins.min() >= 0
    assert hg.pins.max() < nodes
    assert hg.name == name + ".hgr"


def test_hgr_roundtrip(tmp_path, fract):
    p = tmp_path / "copy.hgr"
    write_hgr(p, fract)
    hg2 = read_hgr(p)
    assert hg2.num_nets == fract.num_nets
    assert hg2.num_nodes == fract.num_nodes
    np.testing.assert_array_equal(hg2.pins, fract.pins)
    np.testing.assert_array_equal(hg2.net_offsets, fract.net_offsets)


def test_read_golden_eig_fract():
    res = read_eig_file(golden_eig_path("fract"))
    assert res.eigenvalue == pytest.approx(0.254706743273, abs=1e-12)
    assert res.median == pytest.approx(-0.00160517327355, abs=1e-12)
    assert res.num_nodes == 149
    # side = (median > value), cEIG.cpp:218
    np.testing.assert_array_equal(
        res.sides, (res.median > res.values).astype(np.int8)
    )


def test_read_golden_eig_ibm01_balance():
    res = read_eig_file(golden_eig_path("ibm01"))
    # BASELINE.md: ibm01 EIG split balance 6376 / 6376.
    assert res.balance() == (6376, 6376)


def test_eig_file_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    values = rng.normal(size=33)
    median = float(np.median(values))
    sides = (median > values).astype(np.int8)
    res = EigResult(eigenvalue=0.123456789012, median=median, sides=sides, values=values)
    p = tmp_path / "x_out.txt"
    write_eig_file(p, res)
    res2 = read_eig_file(p)
    assert res2.eigenvalue == pytest.approx(res.eigenvalue, rel=1e-11)
    np.testing.assert_array_equal(res2.sides, res.sides)
    np.testing.assert_allclose(res2.values, res.values, rtol=1e-11)


def test_eig_file_format_is_reference_compatible(tmp_path):
    """Byte-level format check: 12-sig-digit floats, tab-separated rows."""
    res = EigResult(
        eigenvalue=0.254706743273,
        median=-0.00160517327355,
        sides=np.array([1, 0], dtype=np.int8),
        values=np.array([-0.041331366998, 0.0804491508382]),
    )
    p = tmp_path / "f_out.txt"
    write_eig_file(p, res)
    lines = p.read_text().splitlines()
    # Matches head of pre_saved_EIG/fract.hgr_out.txt byte for byte.
    assert lines[0] == "0.254706743273"
    assert lines[1] == "-0.00160517327355"
    assert lines[2] == "0\t1\t-0.041331366998"
    assert lines[3] == "1\t0\t0.0804491508382"

"""End-to-end pipeline, generator, and CLI tests."""

import os

import numpy as np
import pytest

from eig_kl_tpu.models.generator import CircuitGenerator, NET_SIZE_DISTRIBUTION
from eig_kl_tpu.models.pipelines import kl_partition, fused_partition, spectral_partition
from eig_kl_tpu.utils.config import KLConfig, SpectralConfig
from eig_kl_tpu.utils.logging import kl_results_path, write_kl_trajectory


def test_generator_scale_and_structure():
    gen = CircuitGenerator(0.01, seed=7)
    hg = gen.generate()
    assert hg.num_nodes == int(201920 * 0.01)
    assert hg.num_nets == int(210613 * 0.01)
    sizes = hg.net_sizes
    allowed = {s for s, _ in NET_SIZE_DISTRIBUTION}
    assert set(np.unique(sizes)) <= allowed
    # ~84% 2-pin nets (circuit_generator.py:12-19); allow slack.
    frac2 = (sizes == 2).mean()
    assert 0.80 < frac2 < 0.88
    # Pins within each net distinct and sorted (circuit_generator.py:39).
    offs = hg.net_offsets
    for i in range(0, hg.num_nets, 97):
        net = hg.pins[offs[i] : offs[i + 1]]
        assert (np.diff(net) > 0).all()


def test_generator_deterministic_seed():
    a = CircuitGenerator(0.005, seed=3).generate()
    b = CircuitGenerator(0.005, seed=3).generate()
    np.testing.assert_array_equal(a.pins, b.pins)


def test_generator_roundtrip(tmp_path):
    from eig_kl_tpu.io.hgr import read_hgr

    gen = CircuitGenerator(0.002, seed=1)
    p = str(tmp_path / "g.hgr")
    hg = gen.write(p)
    hg2 = read_hgr(p)
    assert hg2.num_nets == hg.num_nets
    np.testing.assert_array_equal(hg2.pins, hg.pins)


def test_kl_partition_random_init():
    hg = CircuitGenerator(0.002, seed=2).generate()
    run = kl_partition(hg, seed=1)
    assert run.kl.improvement > 0
    assert run.kl.drift < 1e-2
    assert "kl.refine" in run.timings


def test_kl_partition_explicit_sides():
    hg = CircuitGenerator(0.002, seed=2).generate()
    sides = (np.arange(hg.num_nodes) % 2).astype(np.int8)
    run = kl_partition(hg, init=sides)
    assert run.kl.initial_cut > 0


def test_fused_partition_eig_beats_random_start(fract):
    eig_run = fused_partition(fract, use_eig=True)
    rand_run = fused_partition(fract, use_eig=False, seed=0)
    assert eig_run.eig is not None
    assert rand_run.eig is None
    # Spectral init starts from a better cut (README.md:163 claim).
    assert eig_run.kl.initial_cut < rand_run.kl.initial_cut


def test_fused_single_program_matches_split(fract):
    """The one-program fused pipeline (megakernel.fused_refine_mega:
    spectral solve + median split + mega refinement + finalize in ONE
    jitted program) is bit-identical to the split path — same
    _power_core_impl arguments, same split, same engine."""
    import jax.numpy as jnp

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.kl.megakernel import (
        MegaGraph,
        fused_refine_mega,
        refine_mega,
    )
    from eig_kl_tpu.spectral.partition import eig_partition

    spec = SpectralConfig(solver="power")
    klc = KLConfig(gain_eps=1e-6)
    g_host = clique_expand(fract, "kl")
    g = g_host.to_device(dtype=jnp.float32, with_plan=True)
    mg = MegaGraph(g_host, plan=g.plan, device_graph=g)

    eig_s = eig_partition(fract, spec, dtype=jnp.float32, graph=g)
    kl_s = refine_mega(mg, eig_s.sides, klc, interpret=True)
    eig_f, kl_f = fused_refine_mega(mg, g, spec, klc, interpret=True)

    assert eig_f.eigenvalue == pytest.approx(eig_s.eigenvalue, abs=1e-6)
    assert eig_f.median == pytest.approx(eig_s.median, abs=1e-7)
    np.testing.assert_array_equal(eig_f.sides, eig_s.sides)
    np.testing.assert_allclose(
        eig_f.values, np.asarray(eig_s.values, np.float64), atol=1e-7
    )
    assert kl_f.initial_cut == kl_s.initial_cut
    assert kl_f.best_cut == kl_s.best_cut
    assert kl_f.final_cut == kl_s.final_cut
    assert kl_f.verified_cut == kl_s.verified_cut
    assert kl_f.iterations == kl_s.iterations
    np.testing.assert_array_equal(kl_f.best_sides, kl_s.best_sides)
    np.testing.assert_array_equal(kl_f.sides, kl_s.sides)
    np.testing.assert_array_equal(kl_f.cut_trajectory, kl_s.cut_trajectory)


def test_fused_partition_routes_single_program(fract, monkeypatch):
    """fused_partition with the mega engine forced takes the
    one-program route (span 'spectral+kl.fused') and still reproduces
    the split path's quality on fract."""
    run = fused_partition(
        fract,
        use_eig=True,
        spectral_config=SpectralConfig(solver="power"),
        kl_config=KLConfig(gain_eps=1e-6, use_pallas=True),
    )
    assert "spectral+kl.fused" in run.timings
    assert run.kl.verified_cut == pytest.approx(run.kl.final_cut, abs=1e-3)
    assert run.eig is not None and run.eig.num_nodes == fract.num_nodes


def test_spectral_partition_pipeline(fract):
    run = spectral_partition(fract)
    assert run.eig.eigenvalue == pytest.approx(0.254706743273, abs=1e-6)
    assert run.kl is None


def test_fused_partition_lanczos_solver(fract):
    """fused --solver lanczos runs the cEIG-parity init in-process:
    the eigenvalue must match the golden Spectra λ₂ (the power solver's
    shift-inverted iterate does not), on the 2/k weighting even though
    the refinement graph is 1/(k−1)-weighted."""
    run = fused_partition(
        fract, use_eig=True, spectral_config=SpectralConfig(solver="lanczos")
    )
    assert run.eig.eigenvalue == pytest.approx(0.254706743273, abs=1e-6)
    assert run.kl.best_cut <= run.kl.initial_cut


def test_solver_auto_resolution(fract):
    """solver="auto" picks lanczos at <=256 nodes and power above —
    the measured crossover (benchmarks/diag_solver_sweep.py: lanczos
    wins only on the 149-node fract; power is already better at n~504
    and every larger scale).  On fract the fused auto pipeline
    therefore reproduces the golden Spectra λ₂ exactly."""
    from eig_kl_tpu.utils.config import resolve_solver

    cfg = SpectralConfig(solver="auto")
    assert resolve_solver(cfg, 149).solver == "lanczos"
    assert resolve_solver(cfg, 257).solver == "power"
    # Concrete solvers pass through untouched.
    assert resolve_solver(SpectralConfig(solver="power"), 1).solver == "power"

    run = fused_partition(fract, use_eig=True, spectral_config=cfg)
    assert run.eig.eigenvalue == pytest.approx(0.254706743273, abs=1e-6)


def test_trajectory_file_format(tmp_path, fract):
    run = kl_partition(fract, seed=0, kl_config=KLConfig(max_iterations=5))
    path = str(tmp_path / "results" / "t.txt")
    write_kl_trajectory(path, run.kl)
    lines = open(path).read().splitlines()
    assert len(lines) == run.kl.iterations + 1
    first = lines[0].split("\t")
    assert first[0] == "0" and first[2] == "0"
    for i, line in enumerate(lines[1:], start=1):
        it, cut, gain = line.split("\t")
        assert int(it) == i


def test_kl_results_path():
    assert kl_results_path("/x/ibm01.hgr", False).endswith(
        "results/ibm01.hgr_KL_CutSize_output.txt"
    )
    assert kl_results_path("/x/ibm01.hgr", True).endswith(
        "results/ibm01.hgr_KL_CutSize_EIG_output.txt"
    )


def test_cli_end_to_end(tmp_path, monkeypatch):
    """generate -> eig -> kl -EIG through the real CLI entry point."""
    from eig_kl_tpu.cli.main import main

    monkeypatch.chdir(tmp_path)
    circuit = str(tmp_path / "c.hgr")
    assert main(["generate", "0.001", "-o", circuit, "--seed", "9"]) == 0
    assert main(["eig", circuit]) == 0
    eig_file = tmp_path / "pre_saved_EIG" / "c.hgr_out.txt"
    assert eig_file.exists()
    assert main(["kl", circuit, "-EIG"]) == 0
    out = tmp_path / "results" / "c.hgr_KL_CutSize_EIG_output.txt"
    assert out.exists()
    assert main(["kl", circuit]) == 0
    assert (tmp_path / "results" / "c.hgr_KL_CutSize_output.txt").exists()
    assert main(["fused", circuit, "-EIG"]) == 0
    assert main(["info"]) == 0

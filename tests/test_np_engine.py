"""Pure-NumPy KL engine: parity with the XLA engine + routing tests.

The np engine is the zero-compile CPU fast path (bin/eigkl): it must
implement the exact same refinement semantics as the XLA while-loop
engine.  On dyadic-weight graphs (all arithmetic exact) the two produce
bit-identical trajectories; on real circuits they agree to roundoff
(XLA:CPU fuses multiply-adds, so ±1-ulp ties can break differently —
quality is statistically identical, see NOTES.md round 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.kl.init import random_split, split_from_eig
from eig_kl_tpu.kl.multipass import refine_ils, refine_multipass
from eig_kl_tpu.kl.np_engine import cut_size_np, refine_np, spmv_np
from eig_kl_tpu.utils.config import KLConfig

from conftest import circuit_path, golden_eig_path
from test_kl import dyadic_hypergraph


@pytest.fixture(scope="module")
def dyadic():
    rng = np.random.default_rng(33)
    hg = dyadic_hypergraph(rng, num_nodes=96, num_nets=200)
    g = clique_expand(hg, "kl")
    return g, random_split(96, 4)


class TestParityWithXlaEngine:
    def test_bit_identical_on_dyadic_graph(self, dyadic):
        """Exact-arithmetic graph -> the trajectories must match
        bit-for-bit in both precisions."""
        g, sides = dyadic
        for jdt, ndt in ((jnp.float64, np.float64), (jnp.float32, np.float32)):
            r_x = refine(g.to_device(dtype=jdt), sides, KLConfig())
            r_n = refine_np(g, sides, KLConfig(), dtype=ndt)
            assert r_n.iterations == r_x.iterations
            np.testing.assert_array_equal(r_n.cut_trajectory, r_x.cut_trajectory)
            np.testing.assert_array_equal(r_n.gain_trajectory, r_x.gain_trajectory)
            np.testing.assert_array_equal(r_n.sides, r_x.sides)
            np.testing.assert_array_equal(r_n.best_sides, r_x.best_sides)

    def test_spmv_and_cut_match(self, dyadic):
        g, sides = dyadic
        s = (1.0 - 2.0 * sides.astype(np.float64))
        from eig_kl_tpu.ops import partition as P

        gd = g.to_device(dtype=jnp.float64)
        np.testing.assert_array_equal(
            spmv_np(g, s), np.asarray(P.spmv(gd, jnp.asarray(s)))
        )
        assert cut_size_np(g, s) == pytest.approx(
            float(P.cut_size(gd, jnp.asarray(s))), rel=1e-14
        )

    def test_gain_eps_termination(self, dyadic):
        """gKL's 1e-6 non-improving threshold shortens or equals the
        0.0-threshold run, exactly like the XLA engine."""
        g, sides = dyadic
        for eps in (0.0, 1e-6):
            r_x = refine(g.to_device(dtype=jnp.float64), sides, KLConfig(gain_eps=eps))
            r_n = refine_np(g, sides, KLConfig(gain_eps=eps), dtype=np.float64)
            assert r_n.iterations == r_x.iterations

    def test_refresh_interval(self, dyadic):
        g, sides = dyadic
        r_plain = refine_np(g, sides, KLConfig(), dtype=np.float64)
        r_refresh = refine_np(
            g, sides, KLConfig(refresh_interval=3), dtype=np.float64
        )
        # Exact arithmetic: refreshing A@s must change nothing.
        np.testing.assert_array_equal(
            r_plain.cut_trajectory, r_refresh.cut_trajectory
        )


class TestInvariants:
    def test_incremental_cut_consistency(self, dyadic):
        g, sides = dyadic
        r = refine_np(g, sides, KLConfig(), dtype=np.float64)
        # cut[i] = cut[i-1] - gain[i] along the whole trajectory.
        np.testing.assert_allclose(
            r.cut_trajectory[1:],
            r.cut_trajectory[:-1] - r.gain_trajectory[1:],
            rtol=1e-12,
        )
        assert r.drift < 1e-9
        assert r.best_cut == pytest.approx(r.cut_trajectory.min())

    def test_balance_preserved(self, dyadic):
        g, sides = dyadic
        r = refine_np(g, sides, KLConfig(), dtype=np.float64)
        assert int(r.sides.sum()) == int(sides.sum())
        assert int(r.best_sides.sum()) == int(sides.sum())

    def test_best_sides_cut_matches_best_cut(self, dyadic):
        g, sides = dyadic
        r = refine_np(g, sides, KLConfig(), dtype=np.float64)
        s_best = 1.0 - 2.0 * r.best_sides.astype(np.float64)
        assert cut_size_np(g, s_best) == pytest.approx(r.best_cut, rel=1e-12)


class TestRealCircuits:
    def test_fract_eig_init_cut(self):
        """The f32 np engine reproduces the reference's 21.50 best cut
        from the golden EIG init (cKL.cpp -EIG flow)."""
        from eig_kl_tpu.io.hgr import read_hgr

        hg = read_hgr(circuit_path("fract"))
        g = clique_expand(hg, "kl")
        sides = split_from_eig(golden_eig_path("fract"))
        r = refine_np(g, sides, KLConfig(), dtype=np.float32)
        assert r.best_cut == pytest.approx(21.50, abs=1e-2)
        assert r.initial_cut == pytest.approx(27.75, abs=1e-2)

    def test_multipass_and_ils_compose(self):
        from eig_kl_tpu.io.hgr import read_hgr

        hg = read_hgr(circuit_path("fract"))
        g = clique_expand(hg, "kl")
        sides = random_split(hg.num_nodes, 0)
        backend = lambda s: refine_np(g, s, KLConfig(), dtype=np.float32)  # noqa: E731
        single = backend(sides)
        multi = refine_multipass(backend, sides, KLConfig(passes=0))
        assert multi.best_cut <= single.best_cut + 1e-6
        ils = refine_ils(
            backend, sides, KLConfig(), kicks=3, kick_frac=0.2, seed=0
        )
        assert ils.best_cut <= single.best_cut + 1e-6


class TestPlatformRouting:
    def test_peek_header(self):
        from eig_kl_tpu.io.hgr import peek_hgr_header

        nets, nodes = peek_hgr_header(circuit_path("fract"))
        assert (nets, nodes) == (147, 149)

    def test_route_decisions(self, monkeypatch):
        import eig_kl_tpu.utils.jaxcache as jc

        # auto: small -> cpu, large -> default; explicit always wins.
        monkeypatch.setattr(jc, "_routed", None)
        assert jc.route_platform("auto", 149) == "cpu-auto"
        monkeypatch.setattr(jc, "_routed", None)
        assert jc.route_platform("auto", 500_000) == "default"
        monkeypatch.setattr(jc, "_routed", None)
        assert jc.route_platform("cpu", 500_000) == "cpu-requested"
        monkeypatch.setattr(jc, "_routed", None)
        assert jc.route_platform("tpu", 10) == "tpu"
        # threshold is env-tunable
        monkeypatch.setattr(jc, "_routed", None)
        monkeypatch.setenv("EIG_KL_TPU_AUTO_CPU_MAX_NODES", "100")
        assert jc.route_platform("auto", 149) == "default"

    def test_route_sticks_per_process(self, monkeypatch):
        import eig_kl_tpu.utils.jaxcache as jc

        monkeypatch.setattr(jc, "_routed", None)
        assert jc.route_platform("cpu", 10) == "cpu-requested"
        assert jc.route_platform("tpu", 10) == "cpu-requested"


class TestCliNumpyPath:
    @pytest.fixture()
    def workdir(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        return tmp_path

    def test_kl_platform_cpu_uses_numpy_engine(self, workdir, capsys, monkeypatch):
        import eig_kl_tpu.utils.jaxcache as jc
        from eig_kl_tpu.cli.main import main

        monkeypatch.setattr(jc, "_routed", None)
        rc = main(["kl", circuit_path("fract"), "--platform", "cpu", "--seed", "1"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Engine: numpy (zero-compile CPU path)" in out
        assert "Best cut size achieved" in out
        assert (workdir / "results").exists()

    def test_kl_numpy_multi_start_prints_cuts(self, workdir, capsys, monkeypatch):
        import eig_kl_tpu.utils.jaxcache as jc
        from eig_kl_tpu.cli.main import main

        monkeypatch.setattr(jc, "_routed", None)
        rc = main(
            ["kl", circuit_path("fract"), "--platform", "cpu", "--starts", "3"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "Multi-start best cuts" in out
        assert "Engine: numpy" in out

    def test_env_can_force_xla_engine(self, workdir, capsys, monkeypatch):
        import eig_kl_tpu.utils.jaxcache as jc
        from eig_kl_tpu.cli.main import main

        monkeypatch.setattr(jc, "_routed", None)
        monkeypatch.setenv("EIG_KL_TPU_CPU_ENGINE", "xla")
        rc = main(["kl", circuit_path("fract"), "--platform", "cpu"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Engine: numpy" not in out
        assert "Best cut size achieved" in out

"""On-hardware (Mosaic) tests: the CPU suite runs every Pallas kernel
in interpret mode, so a Mosaic compile/lowering regression on the real
chip would pass CI and only surface in the bench (VERDICT r1 weak #4).
This lane re-runs the kernel-equivalence and trajectory-parity tests
with ``interpret=False`` on the actual TPU:

    EIG_KL_TPU_TEST_TPU=1 python -m pytest -m tpu -q

All tests here are f32 (the TPU-native precision; x64 stays off in
this lane, see conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import circuit_path

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="no TPU backend"
    ),
]


@pytest.fixture(scope="module")
def fract_graph():
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr

    hg = read_hgr(circuit_path("fract"))
    g_host = clique_expand(hg, "kl")
    return hg, g_host, g_host.to_device(dtype=jnp.float32, with_plan=True)


@pytest.fixture(scope="module")
def random_coo():
    rng = np.random.default_rng(7)
    n, nnz = 4000, 30000
    rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
    cols = rng.integers(0, n, nnz).astype(np.int64)
    w = rng.random(nnz).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    y_ref = np.zeros(n, np.float32)
    np.add.at(y_ref, rows, w * x[cols])
    return n, rows, cols, w, x, y_ref


class TestSpmvOnChip:
    def test_v1_plan(self, random_coo):
        from eig_kl_tpu.ops.spmv_pallas import build_plan, spmv_pallas

        n, rows, cols, w, x, y_ref = random_coo
        plan = build_plan(n, rows, cols, w)
        y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=False))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    def test_v2_plan_f32_and_bf16(self, random_coo):
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2, spmv_pallas_2d

        n, rows, cols, w, x, y_ref = random_coo
        plan = build_plan_v2(n, rows, cols, w)
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y32 = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=False)
        ).reshape(-1)[:n]
        np.testing.assert_allclose(y32, y_ref, rtol=1e-4, atol=1e-4)
        y16 = np.asarray(
            spmv_pallas_2d(
                plan, x2d, interpret=False, inter_dtype=jnp.bfloat16
            )
        ).reshape(-1)[:n]
        assert np.abs(y16 - y_ref).max() <= 2e-2 * np.abs(y_ref).max()

    def test_v3_plan(self, random_coo):
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v3, spmv_pallas

        n, rows, cols, w, x, y_ref = random_coo
        plan = build_plan_v3(n, rows, cols, w)
        y = np.asarray(spmv_pallas(plan, jnp.asarray(x), interpret=False))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    def test_v2_plan_coarse_rblock(self, random_coo):
        """Coarse row-blocks (the auto-coarsen path large sparse graphs
        take) through the REAL Mosaic lowering: exercises the H = 16
        one-hot groups and the (H, 128) single dynamic y-update."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2, spmv_pallas_2d

        n, rows, cols, w, x, y_ref = random_coo
        plan = build_plan_v2(n, rows, cols, w, rblock=2048)
        assert plan.rblock == 2048
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=False)
        ).reshape(-1)[:n]
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


class TestMegaKernelOnChip:
    def test_trajectory_parity_vs_xla_engine(self, fract_graph):
        """The Mosaic-compiled mega-kernel must reproduce the XLA
        engine's swap trajectory exactly (same selection/tie-breaking),
        like the interpret-mode test in test_pallas_kernels.py."""
        from eig_kl_tpu.kl.engine import refine
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
        from eig_kl_tpu.utils.config import KLConfig

        hg, g_host, g = fract_graph
        sides = random_split(hg.num_nodes, seed=3)
        cfg = KLConfig(gain_eps=1e-6)
        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        res_mega = refine_mega(mg, sides, cfg, interpret=False)
        res_xla = refine(g, sides, cfg)
        assert res_mega.iterations == res_xla.iterations
        np.testing.assert_allclose(
            res_mega.cut_trajectory, res_xla.cut_trajectory, rtol=1e-4
        )
        assert res_mega.best_cut == pytest.approx(res_xla.best_cut, rel=1e-4)

    def test_invariant_oracle(self, fract_graph):
        """From-scratch verified cut == incrementally tracked cut."""
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
        from eig_kl_tpu.utils.config import KLConfig

        hg, g_host, g = fract_graph
        sides = random_split(hg.num_nodes, seed=11)
        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        res = refine_mega(mg, sides, KLConfig(), interpret=False)
        assert res.drift <= 1e-3

    def test_refresh_interval_chunks(self, fract_graph):
        """Chunked re-entry (refresh_interval) works through Mosaic."""
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
        from eig_kl_tpu.utils.config import KLConfig

        hg, g_host, g = fract_graph
        sides = random_split(hg.num_nodes, seed=11)
        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        base = refine_mega(mg, sides, KLConfig(gain_eps=1e-6), interpret=False)
        chunked = refine_mega(
            mg,
            sides,
            KLConfig(gain_eps=1e-6, refresh_interval=16),
            interpret=False,
        )
        assert chunked.iterations == base.iterations
        assert chunked.best_cut == pytest.approx(base.best_cut, rel=1e-4)


class TestPowerOnChip:
    def test_power_partition_balanced(self, fract_graph):
        from eig_kl_tpu.spectral.partition import median_split
        from eig_kl_tpu.spectral.power import power_iteration_fiedler
        from eig_kl_tpu.utils.config import SpectralConfig

        hg, g_host, g = fract_graph
        lam, vec = power_iteration_fiedler(
            g, SpectralConfig(solver="power"), dtype=jnp.float32
        )
        assert np.isfinite(np.asarray(vec)).all()
        _, sides = median_split(vec, convention="upper")
        counts = np.bincount(np.asarray(sides), minlength=2)
        assert counts.min() >= hg.num_nodes // 2 - 1


class TestMegaBatchOnChip:
    def test_batched_multistart_matches_per_start(self, fract_graph):
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import (
            MegaGraph,
            refine_mega,
            refine_mega_batch,
        )
        from eig_kl_tpu.utils.config import KLConfig

        hg, g_host, g = fract_graph
        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        cfg = KLConfig(gain_eps=1e-6)
        batch = np.stack([random_split(hg.num_nodes, s) for s in range(4)])
        rb = refine_mega_batch(mg, batch, cfg, interpret=False)
        for s in range(4):
            r1 = refine_mega(mg, batch[s], cfg, interpret=False)
            assert rb[s].iterations == r1.iterations
            assert rb[s].best_cut == pytest.approx(r1.best_cut, rel=1e-4)

    def test_multipass_seeded_multistart_on_chip(self, fract_graph):
        """The flagship quality flow's pieces on real hardware:
        multi-pass through the batched mega-kernel with perturbed
        spectral-seeded inits (start 0 unperturbed), monotone vs the
        single-pass single-start run and oracle-consistent."""
        from eig_kl_tpu.kl.init import perturb_split, split_from_eig
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
        from eig_kl_tpu.ops.partition import cut_size
        from eig_kl_tpu.parallel.multi_start import multi_start_refine_mega
        from eig_kl_tpu.utils.config import KLConfig
        from tests.conftest import golden_eig_path

        hg, g_host, g = fract_graph
        mg = MegaGraph(g_host, plan=g.plan, device_graph=g)
        base = split_from_eig(golden_eig_path("fract"))
        single = refine_mega(mg, base, KLConfig(gain_eps=1e-6), interpret=False)
        init_sides = np.stack(
            [base] + [perturb_split(base, 1 + i, 0.05) for i in range(3)]
        )
        best, cuts = multi_start_refine_mega(
            g_host,
            4,
            config=KLConfig(gain_eps=1e-6, passes=0),
            device_graph=g,
            init_sides=init_sides,
        )
        assert best.best_cut <= single.best_cut + 1e-4
        oracle = float(
            cut_size(g, jnp.asarray(1.0 - 2.0 * best.best_sides, jnp.float32))
        )
        assert oracle == pytest.approx(best.best_cut, rel=1e-4)

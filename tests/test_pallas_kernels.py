"""Pallas kernel tests (interpreter mode on CPU).

The mega-kernel KL engine and the chunk-planned SpMV must agree with
the XLA reference implementations exactly (same swap sequences / same
matvec up to f32 rounding) -- the cross-implementation redundancy test
strategy of the reference (SURVEY.md #4.3: cKL vs gKL agreement).
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import random_hypergraph


def _kl_graph(hg):
    from eig_kl_tpu.graph.expand import clique_expand

    return clique_expand(hg, "kl", use_native=False)


class TestSpmvPallas:
    def test_matches_xla_spmv_random(self, rng):
        from eig_kl_tpu.ops.partition import spmv
        from eig_kl_tpu.ops.spmv_pallas import SpmvPlan, spmv_pallas

        hg = random_hypergraph(rng, num_nodes=300, num_nets=500)
        g_host = _kl_graph(hg)
        g = g_host.to_device(dtype=jnp.float32)
        plan = SpmvPlan.from_graph(g_host)
        x = jnp.asarray(rng.standard_normal(hg.num_nodes), jnp.float32)
        y_ref = np.asarray(spmv(g, x))
        y = np.asarray(spmv_pallas(plan, x, interpret=True))
        np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)

    def test_matches_on_fract(self, fract):
        from eig_kl_tpu.ops.partition import spmv
        from eig_kl_tpu.ops.spmv_pallas import SpmvPlan, spmv_pallas

        g_host = _kl_graph(fract)
        g = g_host.to_device(dtype=jnp.float32)
        plan = SpmvPlan.from_graph(g_host)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal(fract.num_nodes), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(spmv_pallas(plan, x, interpret=True)),
            np.asarray(spmv(g, x)),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_random_coo_multi_stripe_both_plans(self, rng):
        """General COO (duplicates, unsorted, spanning many column
        stripes) through both plan flavors.  Regression: v1 once
        indexed the per-entry stripe array by chunk id, which only
        showed up with >1 stripe (n > 1024)."""
        from eig_kl_tpu.ops.spmv_pallas import (
            build_plan,
            build_plan_v2,
            spmv_pallas,
        )

        n, nnz = 3000, 9000
        rows = rng.integers(0, n, nnz).astype(np.int64)
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.standard_normal(nnz).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float64)
        np.add.at(y_ref, rows, w * x[cols])
        for plan in (
            build_plan(n, rows, cols, w),
            build_plan_v2(n, rows, cols, w),
        ):
            y = np.asarray(
                spmv_pallas(plan, jnp.asarray(x), interpret=True)
            )
            np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    def test_v1_chunk_batching_matches(self, rng, monkeypatch):
        """The nb-batched v1 kernel (8 chunks per grid step, the form
        every plan with >= 64 chunks takes) matches the single-chunk
        form bit-for-bit, including when the chunk count needed padding
        to the 8-multiple (inert chunks: zero weights, route_src -1)."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan, spmv_pallas_2d

        n, nnz = 20000, 40000  # ~80+ chunks across many stripes
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        plan = build_plan(n, rows, cols, w, use_native=False)
        assert plan.num_chunks % 8 == 0 and plan.num_chunks >= 64
        x = rng.standard_normal(n).astype(np.float32)
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        outs = {}
        for nb in ("1", "8"):
            monkeypatch.setenv("EIG_KL_TPU_V1_NB", nb)
            y = np.asarray(spmv_pallas_2d(plan, x2d, interpret=True))
            np.testing.assert_allclose(
                y.reshape(-1)[:n], y_ref, rtol=1e-4, atol=1e-4,
                err_msg=f"nb={nb}",
            )
            outs[nb] = y
        np.testing.assert_array_equal(outs["1"], outs["8"])

    def test_skewed_degrees(self, rng):
        """One giant net (the industry2 585-pin case, scaled down)."""
        from eig_kl_tpu.io.hgr import Hypergraph
        from eig_kl_tpu.ops.partition import spmv
        from eig_kl_tpu.ops.spmv_pallas import SpmvPlan, spmv_pallas

        n = 400
        big = np.arange(150, dtype=np.int32)  # one 150-pin net
        smalls = [
            rng.choice(n, size=2, replace=False).astype(np.int32)
            for _ in range(300)
        ]
        pins = np.concatenate([big] + smalls)
        offs = np.zeros(302, dtype=np.int64)
        np.cumsum([150] + [2] * 300, out=offs[1:])
        hg = Hypergraph(num_nodes=n, num_nets=301, pins=pins, net_offsets=offs)
        g_host = _kl_graph(hg)
        plan = SpmvPlan.from_graph(g_host)
        g = g_host.to_device(dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(spmv_pallas(plan, x, interpret=True)),
            np.asarray(spmv(g, x)),
            rtol=1e-4,
            atol=1e-4,
        )


class TestMegaKernel:
    def _compare(self, hg, seed=7):
        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.kl.engine import refine
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega
        from eig_kl_tpu.utils.config import KLConfig

        g_host = clique_expand(hg, "kl", use_native=False)
        g = g_host.to_device(dtype=jnp.float32)
        rng = np.random.default_rng(seed)
        n = hg.num_nodes
        sides = np.zeros(n, np.int8)
        sides[rng.permutation(n)[: n // 2]] = 1
        cfg = KLConfig()
        r_xla = refine(g, sides, cfg)
        r_mega = refine_mega(MegaGraph(g_host), sides, cfg, interpret=True)
        return r_xla, r_mega

    def test_fract_trajectory_parity(self, fract):
        r_xla, r_mega = self._compare(fract)
        assert r_mega.iterations == r_xla.iterations
        assert (r_mega.sides == r_xla.sides).all()
        np.testing.assert_allclose(
            r_mega.cut_trajectory, r_xla.cut_trajectory, rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            r_mega.best_cut, r_xla.best_cut, rtol=1e-5, atol=1e-3
        )

    def test_random_graph_parity(self, rng):
        """Engine-level agreement.  The initial ``A @ s`` is summed in a
        different order (chunk plan vs ELL rows), so f32 ties may break
        differently -- like cKL vs gKL in the reference, agreement is at
        the quality level, not bitwise."""
        hg = random_hypergraph(rng, num_nodes=200, num_nets=320)
        r_xla, r_mega = self._compare(hg, seed=3)
        np.testing.assert_allclose(
            r_mega.initial_cut, r_xla.initial_cut, rtol=1e-5
        )
        assert r_mega.drift < 1e-2
        assert abs(r_mega.best_cut - r_xla.best_cut) <= 0.05 * max(
            r_xla.initial_cut, 1.0
        )

    def test_invariants(self, fract):
        _, r = self._compare(fract)
        # Cut oracle: incremental vs from-scratch (gKL.cu:524-530).
        assert r.drift < 1e-2
        assert r.best_cut <= r.initial_cut
        # best_sides replay achieves best_cut.
        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.ops import partition as P

        g = clique_expand(fract, "kl", use_native=False).to_device(
            dtype=jnp.float32
        )
        s = P.sides_to_signs(jnp.asarray(r.best_sides))
        np.testing.assert_allclose(
            float(P.cut_size(g, s)), r.best_cut, rtol=1e-5, atol=1e-3
        )


class TestBenesV3:
    def test_benes_permutation_kernel(self, rng):
        """The Benes network kernel must realize arbitrary permutations
        (switch bits from the native router)."""
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from eig_kl_tpu.io import native_io
        from eig_kl_tpu.ops import spmv_pallas as SP

        if not native_io.available():
            pytest.skip("native library unavailable")
        N = 8192
        dest = rng.permutation(N).astype(np.int32)
        masks = SP._benes_masks(dest)
        x = rng.standard_normal(N).astype(np.float32)
        Rn = N // 128
        e = pl.pallas_call(
            functools.partial(SP._benes_kernel, n_pad=N),
            out_shape=jax.ShapeDtypeStruct((Rn, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, Rn // 32, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={1: 0},
            interpret=True,
        )(jnp.asarray(masks), jnp.asarray(x.reshape(Rn, 128)))
        exp = np.empty(N, np.float32)
        exp[dest] = x
        np.testing.assert_array_equal(np.asarray(e).reshape(-1), exp)

    def test_v3_spmv_matches(self, fract):
        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.io import native_io
        from eig_kl_tpu.ops import spmv_pallas as SP

        if not native_io.available():
            pytest.skip("native library unavailable")
        g = clique_expand(fract, "kl", use_native=False)
        n = g.num_nodes
        rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
        plan = SP.build_plan_v3(
            n, rows, g.indices.astype(np.int64), g.data.astype(np.float32)
        )
        rng = np.random.default_rng(5)
        x = rng.standard_normal(n).astype(np.float32)
        y = np.asarray(SP.spmv_pallas(plan, jnp.asarray(x), interpret=True))
        y_ref = np.zeros(n)
        np.add.at(y_ref, rows, g.data * x[g.indices])
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_mega_hierarchical_selection_parity(fract, monkeypatch):
    """Force the hierarchical row-max selection path and require the
    exact same trajectory as the full-scan path."""
    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.kl import megakernel as M
    from eig_kl_tpu.utils.config import KLConfig

    g_host = clique_expand(fract, "kl", use_native=False)
    rng = np.random.default_rng(7)
    n = fract.num_nodes
    sides = np.zeros(n, np.int8)
    sides[rng.permutation(n)[: n // 2]] = 1
    mg = M.MegaGraph(g_host)
    cfg = KLConfig()
    r_flat = M.refine_mega(mg, sides, cfg, interpret=True)
    monkeypatch.setattr(M, "HIER_THRESHOLD", 0)
    M._run.clear_cache()
    r_hier = M.refine_mega(mg, sides, cfg, interpret=True)
    M._run.clear_cache()
    assert r_hier.iterations == r_flat.iterations
    assert (r_hier.sides == r_flat.sides).all()
    np.testing.assert_allclose(
        r_hier.cut_trajectory, r_flat.cut_trajectory, rtol=1e-5, atol=1e-4
    )


class TestQuantumFloor:
    def test_native_q_min_raises_quantum_and_stays_correct(self, rng):
        """The q_min floor (used by build_plan_v2's pathological-tail
        retry) must raise the bucket quantum and keep the matvec
        exact (entries displaced from the tail into main slots)."""
        from eig_kl_tpu.io import native_io
        from eig_kl_tpu.ops.spmv_pallas import SpmvPlanV2, build_plan, spmv_pallas

        try:
            native_io._load()
        except (ImportError, OSError):
            pytest.skip("native library unavailable")
        from tests.conftest import random_hypergraph
        from eig_kl_tpu.graph.expand import clique_expand

        # Large and sparse so the lam-derived quantum is small (tiny
        # graphs have so few buckets that auto-Q saturates at 512 and
        # the floor has nothing to raise).
        hg = random_hypergraph(rng, num_nodes=60_000, num_nets=40_000, max_net=3)
        g = clique_expand(hg, "kl")
        n = g.num_nodes
        rows = np.repeat(np.arange(n, dtype=np.int64), g.degrees)
        cols = g.indices.astype(np.int64)
        w = g.data.astype(np.float32)
        d0 = native_io.build_plan_v2_native(n, rows, cols, w)
        assert d0["quantum"] < 512, "graph too small for this test"
        d1 = native_io.build_plan_v2_native(n, rows, cols, w, q_min=4 * d0["quantum"])
        assert d1["quantum"] >= 4 * d0["quantum"]

        def to_plan(d):
            tail = None
            if d["tail"] is not None:
                tr, tc, tw = d["tail"]
                tail = build_plan(n, tr, tc, tw)
            return SpmvPlanV2(
                col_local=jnp.asarray(d["col_local"]),
                weights=jnp.asarray(d["weights"]),
                weights_bf16=None,
                rl_t=jnp.asarray(d["rl_t"]),
                rb_of=jnp.asarray(d["rb_of"]),
                tail=tail,
                padded_nodes=d["padded_nodes"],
                n_cb=d["n_cb"],
                n_rbp=d["n_rbp"],
                quantum=d["quantum"],
                g1=d["g1"],
                g2=d["g2"],
            )

        x = rng.standard_normal(n).astype(np.float32)
        y0 = np.asarray(spmv_pallas(to_plan(d0), jnp.asarray(x)))
        y1 = np.asarray(spmv_pallas(to_plan(d1), jnp.asarray(x)))
        np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)


class TestBf16Intermediates:
    def test_v2_bf16_matches_f32(self, rng):
        """bf16 streamed intermediates through the v2 plan stay within
        bf16 rounding of the f32 result (the power loop's fast path)."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2, spmv_pallas_2d

        n, nnz = 3000, 24000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        plan = build_plan_v2(n, rows, cols, w)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y32 = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=True)
        ).reshape(-1)[:n]
        y16 = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=True, inter_dtype=jnp.bfloat16)
        ).reshape(-1)[:n]
        np.testing.assert_allclose(y32, y_ref, rtol=1e-4, atol=1e-4)
        scale = np.abs(y_ref).max()
        assert np.abs(y16 - y_ref).max() <= 2e-2 * scale

    def test_v2_coarse_rblock_matches(self, rng):
        """Coarsened row-blocks (the multi-million-node bucket-grid fix:
        rblock 1024/2048/4096 instead of 512) stay exact through both
        the native and the NumPy planner, f32 and bf16."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2, spmv_pallas_2d

        n, nnz = 6000, 18000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        for rblock, quantum in (
            (1024, None),
            (2048, None),
            (4096, None),
            (8192, 32),
            (16384, 64),  # H=128: the 1.8M-scale geometry-search pick
        ):
            for use_native in (True, False):
                try:
                    plan = build_plan_v2(
                        n, rows, cols, w, use_native=use_native,
                        rblock=rblock, quantum=quantum,
                    )
                except (ImportError, OSError):
                    continue  # no native toolchain in this env
                assert plan.rblock == rblock
                if quantum is not None:
                    assert plan.quantum == quantum
                P = plan.padded_nodes
                x2d = (
                    jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
                )
                y = np.asarray(
                    spmv_pallas_2d(plan, x2d, interpret=True)
                ).reshape(-1)[:n]
                np.testing.assert_allclose(
                    y, y_ref, rtol=1e-4, atol=1e-4, err_msg=f"rblock={rblock}"
                )
                y16 = np.asarray(
                    spmv_pallas_2d(
                        plan, x2d, interpret=True, inter_dtype=jnp.bfloat16
                    )
                ).reshape(-1)[:n]
                assert (
                    np.abs(y16 - y_ref).max()
                    <= 2e-2 * max(np.abs(y_ref).max(), 1.0)
                )

    def test_v2_reduce_rowwise_forms_match(self, rng, monkeypatch):
        """The MXU reduce's two y-update forms (per-row dynamic updates
        vs one (H,128) multi-row update) are bit-identical at both
        rblock classes; EIG_KL_TPU_REDUCE_ROWWISE=1/0 forces the form
        and the default gate picks per-row at rblock 512 (H<=4, the
        hardware-proven path) and batched at coarse rblocks."""
        from eig_kl_tpu.ops.spmv_pallas import (
            _reduce_rowwise, build_plan_v2, spmv_pallas_2d,
        )

        monkeypatch.delenv("EIG_KL_TPU_REDUCE_ROWWISE", raising=False)
        assert _reduce_rowwise(512) and not _reduce_rowwise(2048)
        monkeypatch.setenv("EIG_KL_TPU_REDUCE_ROWWISE", "0")
        assert not _reduce_rowwise(512)
        monkeypatch.setenv("EIG_KL_TPU_REDUCE_ROWWISE", "1")
        assert _reduce_rowwise(2048)

        n, nnz = 4000, 12000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        for rblock in (512, 2048):
            plan = build_plan_v2(n, rows, cols, w, rblock=rblock)
            P = plan.padded_nodes
            x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
            outs = []
            for force in ("1", "0"):
                monkeypatch.setenv("EIG_KL_TPU_REDUCE_ROWWISE", force)
                outs.append(np.asarray(spmv_pallas_2d(plan, x2d, interpret=True)))
            np.testing.assert_array_equal(outs[0], outs[1])

    def test_v2_reduce_impls_match(self, rng, monkeypatch):
        """The factored-one-hot reduce ("mxu2") matches the dense
        one-hot form ("mxu") at every rblock class, in f32 and bf16,
        to f32-reassociation tolerance (the two dot shapes contract
        the same per-row term sets in different orders);
        EIG_KL_TPU_REDUCE_IMPL selects the kernel."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2, spmv_pallas_2d

        n, nnz = 9000, 36000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        for rblock in (512, 2048):
            plan = build_plan_v2(n, rows, cols, w, rblock=rblock)
            P = plan.padded_nodes
            x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
            outs = {}
            for impl in ("mxu", "mxu2", "mxuv"):
                monkeypatch.setenv("EIG_KL_TPU_REDUCE_IMPL", impl)
                y = np.asarray(spmv_pallas_2d(plan, x2d, interpret=True))
                np.testing.assert_allclose(
                    y.reshape(-1)[:n], y_ref, rtol=1e-4, atol=1e-4,
                    err_msg=f"{impl} rblock={rblock}",
                )
                outs[impl] = y
                outs[impl + "-bf16"] = np.asarray(
                    spmv_pallas_2d(
                        plan, x2d, interpret=True, inter_dtype=jnp.bfloat16
                    )
                )
            for impl in ("mxu2", "mxuv"):
                np.testing.assert_allclose(
                    outs["mxu"], outs[impl], rtol=1e-5, atol=1e-6
                )
                np.testing.assert_allclose(
                    outs["mxu-bf16"].astype(np.float32),
                    outs[impl + "-bf16"].astype(np.float32),
                    rtol=1e-5,
                    atol=1e-6,
                )

    def test_v2_coo_tail_matches_dense(self, rng):
        """The CooTail spill representation (XLA scatter-add for
        scattered bucket overflow) is exact: a plan whose tail is
        replaced by the equivalent CooTail matches the dense reference
        through both spmv entry points, f32 and bf16.  Also checks the
        chooser: a scattered synthetic spill (1 entry per far-apart
        tile) goes COO, a clustered one keeps the v1 plan."""
        import dataclasses

        from eig_kl_tpu.ops.spmv_pallas import (
            CooTail, _build_tail, build_plan_v2, spmv_pallas_2d,
        )

        n, nnz = 6000, 18000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        # Extra scattered entries to carry in the tail (few enough
        # that they land ~1 per (stripe x window) tile).
        t = 40
        tr = np.sort(rng.integers(0, n, t).astype(np.int64))
        tc = rng.integers(0, n, t).astype(np.int64)
        tw = rng.random(t).astype(np.float32)
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        np.add.at(y_ref, tr, tw * x[tc])

        # Chooser: scattered -> CooTail; clustered (one dense tile's
        # worth of entries) -> v1 plan.
        scattered = _build_tail(n, tr, tc, tw, None)
        assert isinstance(scattered, CooTail)
        # Determinism contract: every duplicate-rank group has unique,
        # sorted rows (each scatter is then order-free).
        srows = np.asarray(scattered.rows)
        offs = scattered.offsets
        assert offs[0] == 0 and offs[-1] == len(srows)
        for a, b in zip(offs[:-1], offs[1:]):
            grp = srows[a:b]
            assert bool(np.all(np.diff(grp) > 0)), (a, b)
        cr = np.sort(rng.integers(0, 900, 5000).astype(np.int64))
        clustered = _build_tail(
            n, cr, rng.integers(0, 900, 5000).astype(np.int64),
            rng.random(5000).astype(np.float32), None,
        )
        assert not isinstance(clustered, CooTail)

        plan = dataclasses.replace(
            build_plan_v2(n, rows, cols, w), tail=scattered
        )
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=True)
        ).reshape(-1)[:n]
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
        y16 = np.asarray(
            spmv_pallas_2d(
                plan, x2d, interpret=True, inter_dtype=jnp.bfloat16
            )
        ).reshape(-1)[:n]
        assert (
            np.abs(y16 - y_ref).max()
            <= 2e-2 * max(np.abs(y_ref).max(), 1.0)
        )

    def test_v2_geometry_search_bounds_slot_padding(self, rng):
        """The exact-histogram geometry search keeps total slot padding
        under 2x nnz on a scale-free random instance where the old
        occupancy heuristic + lam*1.5 quantum rule left ~3x (the
        matvec's reduce is MXU-K-stream-bound, so slots ARE the cost;
        measured on chip 2026-08-19: all three reduce kernels time
        identically at 1.8M because padding, not one-hot build ops,
        sets the wall).  The spill feasibility bound keeps the v1
        overflow tail under the SMEM chunk budget."""
        from eig_kl_tpu.ops.spmv_pallas import (
            _SPILL_MAX, _search_v2_geometry, build_plan_v2,
        )

        n, nnz = 120_000, 600_000
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        rblock, q = _search_v2_geometry(
            n, rows.astype(np.int32), cols.astype(np.int32)
        )
        plan = build_plan_v2(n, rows, cols, w)
        assert plan.rblock == rblock and plan.quantum == q
        slots = plan.n_cb * plan.g1
        assert slots <= 2.0 * nnz, (slots, nnz)
        if plan.tail is not None:
            from eig_kl_tpu.ops.spmv_pallas import CooTail

            n_spill = (
                plan.tail.rows.shape[0]
                if isinstance(plan.tail, CooTail)
                else plan.tail.num_chunks
            )
            assert n_spill <= _SPILL_MAX

    def test_v2_slot_grid_is_bf16_tile_aligned(self, rng):
        """The gather pass's per-column-block row count must be a whole
        number of (16,128) bf16 tiles (build_plan_v2's n_rbp rounding)."""
        from eig_kl_tpu.ops.spmv_pallas import build_plan_v2

        for n, nnz in ((700, 2000), (3000, 24000), (9000, 11000)):
            rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
            cols = rng.integers(0, n, nnz).astype(np.int64)
            w = rng.random(nnz).astype(np.float32)
            plan = build_plan_v2(n, rows, cols, w)
            assert plan.g1 % 2048 == 0, (n, nnz, plan.g1)


class TestMegaBatch:
    def test_batched_matches_per_start(self, fract):
        """refine_mega_batch (grid over starts) reproduces refine_mega
        per start exactly."""
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import (
            MegaGraph,
            refine_mega,
            refine_mega_batch,
        )
        from eig_kl_tpu.utils.config import KLConfig

        g_host = _kl_graph(fract)
        mg = MegaGraph(g_host)
        cfg = KLConfig(gain_eps=1e-6)
        batch = np.stack([random_split(fract.num_nodes, s) for s in range(3)])
        rb = refine_mega_batch(mg, batch, cfg)
        for s in range(3):
            r1 = refine_mega(mg, batch[s], cfg)
            assert rb[s].iterations == r1.iterations
            np.testing.assert_allclose(
                rb[s].cut_trajectory, r1.cut_trajectory, rtol=1e-5
            )
            assert rb[s].best_cut == pytest.approx(r1.best_cut, rel=1e-5)
            assert abs(rb[s].verified_cut - rb[s].final_cut) < 1e-3

    def test_batched_honors_per_start_cap(self, fract):
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega_batch
        from eig_kl_tpu.utils.config import KLConfig

        g_host = _kl_graph(fract)
        mg = MegaGraph(g_host)
        batch = np.stack([random_split(fract.num_nodes, s) for s in range(2)])
        rb = refine_mega_batch(mg, batch, KLConfig(max_iterations=7))
        assert all(r.iterations <= 7 for r in rb)

    def test_batched_refresh_matches_per_start(self, fract):
        """Batched refresh (chunked kernel re-entry for all starts at
        once) reproduces the single-start refresh path per start."""
        from eig_kl_tpu.kl.init import random_split
        from eig_kl_tpu.kl.megakernel import (
            MegaGraph,
            refine_mega,
            refine_mega_batch,
        )
        from eig_kl_tpu.utils.config import KLConfig

        g_host = _kl_graph(fract)
        mg = MegaGraph(g_host)
        batch = np.stack([random_split(fract.num_nodes, s) for s in range(2)])
        cfg = KLConfig(refresh_interval=8)
        rb = refine_mega_batch(mg, batch, cfg)
        for s in range(2):
            r1 = refine_mega(mg, batch[s], cfg)
            assert rb[s].iterations == r1.iterations
            assert rb[s].best_cut == pytest.approx(r1.best_cut, abs=1e-4)
            assert rb[s].final_cut == pytest.approx(r1.final_cut, abs=1e-4)
            np.testing.assert_array_equal(rb[s].sides, r1.sides)
            np.testing.assert_array_equal(rb[s].best_sides, r1.best_sides)
            assert abs(rb[s].verified_cut - rb[s].final_cut) < 1e-3


class TestDenseGeometryFallback:
    def test_dense_small_circuit_geometry(self, rng):
        """Dense small circuits (ibm01/industry2 class) overflow the
        geometry search's scattered-spill entry bound at EVERY
        (rblock, Q) candidate — mean bucket occupancy >> Q=512 — and
        must fall back to the round-3 (512, 512) geometry with the
        clustered v1 chunk tail instead of asserting (found by the
        round-5 on-chip flagship lane: cEIG-parity circuits crashed
        build_plan_v2 after the round-4 exact-histogram search
        landed)."""
        from eig_kl_tpu.ops.spmv_pallas import (
            _search_v2_geometry,
            build_plan_v2,
            spmv_pallas_2d,
        )

        n, nnz = 1024, 90_000  # one column block; spill > 40K at any Q
        rows = np.sort(rng.integers(0, n, nnz).astype(np.int64))
        cols = rng.integers(0, n, nnz).astype(np.int64)
        w = rng.random(nnz).astype(np.float32)
        assert _search_v2_geometry(n, rows, cols) == (512, 512)
        plan = build_plan_v2(n, rows, cols, w)
        assert plan.rblock == 512 and plan.quantum == 512
        x = rng.standard_normal(n).astype(np.float32)
        y_ref = np.zeros(n, np.float32)
        np.add.at(y_ref, rows, w * x[cols])
        P = plan.padded_nodes
        x2d = jnp.zeros(P, jnp.float32).at[:n].set(x).reshape(P // 128, 128)
        y = np.asarray(
            spmv_pallas_2d(plan, x2d, interpret=True)
        ).reshape(-1)[:n]
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

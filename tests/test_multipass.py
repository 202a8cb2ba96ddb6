"""Multi-pass KL tests.

The reference runs a single KL pass and only tracks the minimum cut
(cKL.cpp:363); ``KLConfig.passes`` adds the classic multi-pass outer
loop (restart from the best partition with all nodes unlocked).  These
tests pin its invariants: pass-1 equivalence, monotone improvement,
oracle-consistent best cut, bookkeeping consistency, and that every
backend (XLA engine, Pallas mega-kernel, batched multi-start, sharded
multi-start) produces identical multi-pass results.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.kl.engine import refine
from eig_kl_tpu.kl.init import random_split, sides_balance
from eig_kl_tpu.kl.multipass import (
    AUTO_PASS_CAP,
    refine_multipass,
    refine_multipass_batch,
    resolved_passes,
)
from eig_kl_tpu.utils.config import KLConfig

from conftest import random_hypergraph
from test_partition_ops import brute_cut


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    hg = random_hypergraph(rng, num_nodes=80, num_nets=160)
    g = clique_expand(hg, "kl")
    return g, g.to_device(dtype=jnp.float64)


def _backend(dg, config):
    return lambda s: refine(dg, s, config)


def test_resolved_passes():
    assert resolved_passes(KLConfig(passes=1)) == 1
    assert resolved_passes(KLConfig(passes=4)) == 4
    assert resolved_passes(KLConfig(passes=0)) == AUTO_PASS_CAP
    with pytest.raises(ValueError):
        resolved_passes(KLConfig(passes=-1))


def test_passes_one_is_single_pass(problem):
    g, dg = problem
    sides = random_split(g.num_nodes, seed=3)
    cfg = KLConfig()
    single = refine(dg, sides, cfg)
    multi = refine_multipass(_backend(dg, cfg), sides, cfg)
    assert multi.best_cut == single.best_cut
    assert multi.iterations == single.iterations
    np.testing.assert_array_equal(multi.best_sides, single.best_sides)


def test_multipass_improves_and_is_oracle_consistent(problem):
    g, dg = problem
    improved_somewhere = False
    for seed in range(4):
        sides = random_split(g.num_nodes, seed=seed)
        cfg = KLConfig(passes=0)
        single = refine(dg, sides, cfg)
        multi = refine_multipass(_backend(dg, cfg), sides, cfg)
        # Monotone: a later pass starts AT the previous best, so the
        # best cut can only improve or stay.
        assert multi.best_cut <= single.best_cut + 1e-9
        improved_somewhere |= multi.best_cut < single.best_cut - 1e-9
        # The reported best cut is achieved by the reported partition.
        assert brute_cut(g, multi.best_sides) == pytest.approx(
            multi.best_cut, rel=1e-9
        )
        # Balance (the KL invariant) survives every pass.
        assert sides_balance(multi.best_sides) == sides_balance(sides)
        assert sides_balance(multi.sides) == sides_balance(sides)
        # Bookkeeping: cumulative iterations match the concatenated
        # trajectory; initial cut is pass 1's.
        assert multi.iterations == len(multi.cut_trajectory) - 1
        assert multi.iterations == len(multi.gain_trajectory) - 1
        assert multi.initial_cut == single.initial_cut
        assert multi.best_cut == pytest.approx(
            multi.cut_trajectory.min(), rel=1e-9
        )
    assert improved_somewhere, "multi-pass never improved on 4 seeds"


def test_multipass_trajectory_telescopes(problem):
    g, dg = problem
    sides = random_split(g.num_nodes, seed=1)
    cfg = KLConfig(passes=3)
    multi = refine_multipass(_backend(dg, cfg), sides, cfg)
    # Within each pass the cut telescopes; across the pass seam the
    # replayed best partition resets the cut, so only check the global
    # min and monotone non-increase of per-pass minima.
    assert multi.cut_trajectory[0] == pytest.approx(multi.initial_cut)
    assert multi.best_cut == pytest.approx(multi.cut_trajectory.min())


def test_auto_passes_converges_quickly(problem):
    g, dg = problem
    sides = random_split(g.num_nodes, seed=2)
    cfg = KLConfig(passes=0)
    calls = []

    def counting(s):
        calls.append(1)
        return refine(dg, s, cfg)

    refine_multipass(counting, sides, cfg)
    assert 2 <= len(calls) < AUTO_PASS_CAP


def test_batch_matches_sequential(problem):
    g, dg = problem
    cfg = KLConfig(passes=0)
    S = 4
    init = np.stack([random_split(g.num_nodes, seed=s) for s in range(S)])

    def run_batch(batch):
        return [refine(dg, batch[k], cfg) for k in range(len(batch))]

    batched = refine_multipass_batch(run_batch, init, cfg)
    for k in range(S):
        seq = refine_multipass(_backend(dg, cfg), init[k], cfg)
        assert batched[k].best_cut == pytest.approx(seq.best_cut, rel=1e-12)
        np.testing.assert_array_equal(batched[k].best_sides, seq.best_sides)
        # The batch keeps every start active until NO start improves,
        # so a start that converged early logs >= the sequential run's
        # iterations; its trajectory stays self-consistent regardless.
        assert batched[k].iterations >= seq.iterations
        assert batched[k].iterations == len(batched[k].cut_trajectory) - 1


def test_mega_backend_matches_engine():
    # Dyadic weights (1, 1/2, 1/4) make the f32 gain arithmetic exact,
    # so the two engines' argmax tie-breaks agree (same device as the
    # bit-parity tests in test_pallas_kernels.py).
    from test_kl import dyadic_hypergraph

    rng = np.random.default_rng(13)
    g = clique_expand(dyadic_hypergraph(rng, num_nodes=80, num_nets=160), "kl")
    from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega

    dg32 = g.to_device(dtype=jnp.float32)
    mg = MegaGraph(g, plan=None, device_graph=dg32)
    sides = random_split(g.num_nodes, seed=4)
    cfg = KLConfig(passes=3)
    eng = refine_multipass(
        lambda s: refine(dg32, s, cfg), sides, cfg
    )
    mega = refine_multipass(
        lambda s: refine_mega(mg, s, cfg, interpret=True), sides, cfg
    )
    assert mega.best_cut == pytest.approx(eng.best_cut, rel=1e-5)
    assert mega.iterations == eng.iterations


def test_multi_start_passes(problem):
    g, dg = problem
    from eig_kl_tpu.parallel.multi_start import multi_start_refine

    dg64 = dg
    best1, cuts1 = multi_start_refine(
        dg64, 4, config=KLConfig(passes=1), base_seed=0
    )
    bestm, cutsm = multi_start_refine(
        dg64, 4, config=KLConfig(passes=0), base_seed=0
    )
    assert (cutsm <= cuts1 + 1e-9).all()
    assert bestm.best_cut <= best1.best_cut + 1e-9
    assert brute_cut(g, bestm.best_sides) == pytest.approx(
        bestm.best_cut, rel=1e-9
    )


def test_perturb_split():
    from eig_kl_tpu.kl.init import perturb_split

    sides = random_split(101, seed=0)
    for frac in (0.0, 0.05, 0.5):
        p = perturb_split(sides, seed=3, frac=frac)
        assert sides_balance(p) == sides_balance(sides)
        if frac > 0:
            assert (p != sides).sum() >= 2  # at least one pair moved
        else:
            np.testing.assert_array_equal(p, sides)  # frac=0 = identity
    # deterministic per seed, different across seeds
    np.testing.assert_array_equal(
        perturb_split(sides, 7, 0.1), perturb_split(sides, 7, 0.1)
    )
    assert (perturb_split(sides, 7, 0.1) != perturb_split(sides, 8, 0.1)).any()
    with pytest.raises(ValueError):
        perturb_split(sides, 0, frac=1.5)


def test_fused_spectral_seeded_multi_start(problem):
    """fused_partition(starts=N) keeps start 0 unperturbed, so its
    best cut never regresses vs the single-start run."""
    from eig_kl_tpu.models.pipelines import fused_partition
    from eig_kl_tpu.utils.config import SpectralConfig

    rng = np.random.default_rng(7)
    hg = random_hypergraph(rng, num_nodes=80, num_nets=160)
    spec = SpectralConfig(solver="power", max_iterations=150)
    r1 = fused_partition(hg, spectral_config=spec, kl_config=KLConfig(passes=2))
    rm = fused_partition(
        hg, spectral_config=spec, kl_config=KLConfig(passes=2), starts=4
    )
    assert rm.kl.best_cut <= r1.kl.best_cut + 1e-6


def test_refine_ils_improves_or_equal(problem):
    from eig_kl_tpu.kl.multipass import refine_ils
    from test_partition_ops import brute_cut as _bc

    g, dg = problem
    sides = random_split(g.num_nodes, seed=5)
    cfg = KLConfig(passes=0)
    base = refine_multipass(_backend(dg, cfg), sides, cfg)
    ils = refine_ils(
        _backend(dg, cfg), sides, cfg, kicks=6, kick_frac=0.15, seed=1
    )
    assert ils.best_cut <= base.best_cut + 1e-9
    assert _bc(g, ils.best_sides) == pytest.approx(ils.best_cut, rel=1e-9)
    assert sides_balance(ils.best_sides) == sides_balance(sides)
    assert ils.iterations == len(ils.cut_trajectory) - 1


def test_pipeline_kicks_flag(problem):
    from eig_kl_tpu.models.pipelines import kl_partition

    rng = np.random.default_rng(7)
    hg = random_hypergraph(rng, num_nodes=80, num_nets=160)
    r0 = kl_partition(hg, kl_config=KLConfig(passes=0), seed=4)
    rk = kl_partition(
        hg, kl_config=KLConfig(passes=0, kicks=4, kick_frac=0.2), seed=4
    )
    assert rk.kl.best_cut <= r0.kl.best_cut + 1e-9
    # The run's report must measure from the ORIGINAL init, not a
    # winning kick's perturbed restart: same seed => same random init
    # => identical initial_cut with and without kicks.
    assert rk.kl.initial_cut == pytest.approx(r0.kl.initial_cut)


def test_refine_ils_seed_and_incumbent(problem):
    """--seed reaches the kick perturbations (a fixed regression: the
    single-start dispatch dropped it), kick seeds are decorrelated from
    the multi-start jitter stream, and an incumbent skips the leading
    re-descent while keeping its bookkeeping."""
    from eig_kl_tpu.kl.multipass import _kick_seed, refine_ils

    g, dg = problem
    sides = random_split(g.num_nodes, seed=5)
    cfg = KLConfig(passes=1)
    # Kick-seed stream never collides with the multi-start jitter
    # seeds (seed + 1 + i) for small offsets.
    assert {_kick_seed(3, k) for k in range(32)}.isdisjoint(
        {3 + 1 + i for i in range(32)}
    )
    # The seed must reach the kick perturbations: record the partition
    # each kick descends from and check it varies with the seed.
    def recording_backend(log):
        def fn(s):
            log.append(np.asarray(s).copy())
            return _backend(dg, cfg)(s)
        return fn

    kick_inputs = {}
    for s in (1, 2):
        log = []
        refine_ils(
            recording_backend(log), sides, cfg, kicks=1, kick_frac=0.3,
            seed=s,
        )
        kick_inputs[s] = log[-1]  # last call = the kicked restart
    assert not np.array_equal(kick_inputs[1], kick_inputs[2]), (
        "seed must vary ILS exploration"
    )

    calls = []
    base = refine_multipass(_backend(dg, cfg), sides, cfg)

    def counting_backend(s):
        calls.append(1)
        return _backend(dg, cfg)(s)

    r = refine_ils(
        counting_backend, sides, cfg, kicks=2, kick_frac=0.3, seed=0,
        incumbent=base,
    )
    # Only the kick descents run (passes=1 => one call per kick).
    assert len(calls) == 2
    assert r.best_cut <= base.best_cut + 1e-9
    assert r.initial_cut == pytest.approx(base.initial_cut)


def test_pipeline_passes_flag(problem):
    """kl_partition honors KLConfig.passes end to end."""
    from eig_kl_tpu.io.hgr import Hypergraph  # noqa: F401  (type only)
    from eig_kl_tpu.models.pipelines import kl_partition

    rng = np.random.default_rng(7)
    hg = random_hypergraph(rng, num_nodes=80, num_nets=160)
    r1 = kl_partition(hg, kl_config=KLConfig(passes=1), seed=9)
    rm = kl_partition(hg, kl_config=KLConfig(passes=0), seed=9)
    assert rm.kl.best_cut <= r1.kl.best_cut + 1e-9
    assert rm.kl.initial_cut == pytest.approx(r1.kl.initial_cut)

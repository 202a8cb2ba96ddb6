"""kth_smallest / upper_median: bit-exact rank selection vs jnp.sort.

The power solver's sign exit and packed fetch use upper_median in
place of ``jnp.sort(v)[n // 2]`` (eig_kl_tpu/ops/select.py); these
tests pin exact agreement across sign mixes, ties, extremes, and every
rank of small inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from eig_kl_tpu.ops.select import kth_smallest, upper_median


def _check_all_ranks(v):
    ref = np.sort(np.asarray(v))
    for k in range(len(ref)):
        got = float(kth_smallest(jnp.asarray(v, jnp.float32), k))
        assert got == ref[k], (k, got, ref[k])


# Both exact implementations (radix = 4-pass histogram default, bits =
# 32-pass binary search) must agree with sort on every rank.
@pytest.fixture(params=["radix", "bits"])
def select_impl(request, monkeypatch):
    monkeypatch.setenv("EIG_KL_TPU_SELECT_IMPL", request.param)
    return request.param


def test_small_exhaustive_ranks(select_impl):
    rng = np.random.default_rng(0)
    _check_all_ranks(rng.standard_normal(17).astype(np.float32))


def test_ties_and_zeros(select_impl):
    v = np.array([0.0, 1.5, 1.5, -2.0, 0.0, 1.5, -2.0, 3.0], np.float32)
    _check_all_ranks(v)


def test_all_equal(select_impl):
    v = np.full(33, 0.25, np.float32)
    _check_all_ranks(v)


def test_negatives_and_extremes(select_impl):
    v = np.array(
        [-np.inf, np.inf, 1e-38, -1e-38, 3.4e38, -3.4e38, 0.0, 7.0],
        np.float32,
    )
    _check_all_ranks(v)


@pytest.mark.parametrize("n", [100, 1001, 4096])
def test_random_median_matches_sort(n):
    rng = np.random.default_rng(n)
    v = (rng.standard_normal(n) * rng.choice([1e-6, 1.0, 1e6], n)).astype(
        np.float32
    )
    med = float(upper_median(jnp.asarray(v)))
    assert med == np.sort(v)[n // 2]


def test_signed_zero_compares_equal():
    # -0.0 keys below +0.0 (same as XLA's total-order sort); the value
    # returned is a zero either way and downstream `median > v` treats
    # both identically.
    v = np.array([-0.0, 0.0, -0.0, 0.0, -1.0, 1.0], np.float32)
    med = float(upper_median(jnp.asarray(v)))
    assert med == 0.0


def test_f64_fallback():
    v = np.linspace(-3, 5, 11)
    got = float(kth_smallest(jnp.asarray(v, jnp.float64), 4))
    assert got == np.sort(v)[4]


def test_jit_and_grad_free_path():
    import jax

    f = jax.jit(lambda x: upper_median(x, x.shape[0]))
    v = np.random.default_rng(7).standard_normal(257).astype(np.float32)
    assert float(f(jnp.asarray(v))) == np.sort(v)[257 // 2]


def test_power_solver_select_path_bit_identical(monkeypatch):
    """The TPU median gate (EIG_KL_TPU_MEDIAN_SELECT=1) routes the power
    solver's sign-exit and packed fetch through kth_smallest; the
    trajectory and result must be bit-identical to the sort path."""
    import jax

    from eig_kl_tpu.graph.expand import clique_expand
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.spectral.power import power_partition_fiedler
    from eig_kl_tpu.utils.config import SpectralConfig

    hg = read_hgr("/root/reference/circuit/fract.hgr")
    g = clique_expand(hg, "kl").to_device(dtype=jnp.float32)
    cfg = SpectralConfig(solver="power")

    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("EIG_KL_TPU_MEDIAN_SELECT", mode)
        jax.clear_caches()  # the gate is trace-time
        results[mode] = power_partition_fiedler(g, cfg, dtype=jnp.float32)
    monkeypatch.delenv("EIG_KL_TPU_MEDIAN_SELECT")
    jax.clear_caches()

    lam0, med0, vec0, sides0 = results["0"]
    lam1, med1, vec1, sides1 = results["1"]
    assert lam1 == lam0
    assert med1 == med0
    np.testing.assert_array_equal(vec1, vec0)
    np.testing.assert_array_equal(sides1, sides0)

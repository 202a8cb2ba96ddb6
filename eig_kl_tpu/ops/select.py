"""Exact order statistics without a sort.

The power solver's sign-stability exit recomputes the "upper" median
``jnp.sort(v)[n // 2]`` (gKL2.cu:396-398) every ``check_interval``
steps, and the packed result fetch computes it once more at the end
(spectral/power.py).  A full XLA sort is O(n log n) with a large
constant on TPU; at 1.8M nodes the per-check sort dominates the whole
check.  The median is a single order statistic, so compute it exactly
with a 32-step binary search over the float bit space instead:

* map f32 values to uint32 keys whose unsigned order equals the float
  total order (sign-magnitude flip — the classic radix-sort key);
* build the answer key bit by bit, MSB first: set a bit iff the count
  of keys below the candidate stays <= k (one O(n) compare+reduce per
  bit, 32 passes in a ``fori_loop``);
* map the key back to f32.

Each pass streams the vector once: 32 * n elementwise ops total
(~58M at 1.8M nodes) vs the sort's full key shuffle.  The result is
bit-identical to ``jnp.sort(v)[k]`` (XLA sorts floats by the same
total order; the only divergence class is -0.0 vs +0.0, which compare
equal downstream in ``median > v``).

NaN keys map above +inf, matching XLA's sort-to-the-end behavior.
Non-f32 dtypes fall back to the sort (the f64 gkl2-parity path is not
perf-critical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# A host scalar, NOT jnp.uint32(...): a module-scope jnp constant is an
# eager device op — one extra compiled program (a remote compile on the
# axon plugin) paid at import time.  Inside traced code the numpy
# scalar participates identically.
_SIGN = np.uint32(0x80000000)


def _f32_keys(v: jnp.ndarray) -> jnp.ndarray:
    """Monotone f32 -> uint32 key: unsigned key order == float order."""
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jnp.where(bits & _SIGN, ~bits, bits ^ _SIGN)


def _key_to_f32(key: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.where(key & _SIGN, key ^ _SIGN, ~key)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _kth_key_bits(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """32-pass bit binary search for the rank-k key (one compare+reduce
    per bit; each pass streams the key vector once)."""
    k32 = jnp.asarray(k, jnp.int32)

    def body(i, result):
        cand = result | (jnp.uint32(1) << (jnp.uint32(31) - i.astype(jnp.uint32)))
        below = jnp.sum((keys < cand).astype(jnp.int32))
        return jnp.where(below <= k32, cand, result)

    # After the loop `result` is the largest key K with #{keys < K} <= k,
    # which is exactly the rank-k key (monotone count argument).
    return jax.lax.fori_loop(0, 32, body, jnp.uint32(0))


def _kth_key_radix(keys: jnp.ndarray, k: int) -> jnp.ndarray:
    """Radix-histogram rank select: FOUR passes over the data (8 bits
    per pass) instead of the bit search's 32.

    Each pass builds a 256-bin histogram of the current byte over the
    keys still matching the resolved high-byte prefix — one fused
    one-hot compare + column reduce, streaming the key vector once —
    then picks the bin containing rank ``k_left`` and narrows.  Inside
    the power solver's check body the select's sequential pass count is
    the cost (each pass is a full-vector reduce with its own latency);
    8x fewer passes is the point.  Result is bit-identical to the bit
    search (both return the exact rank-k key)."""
    bins = jnp.arange(256, dtype=jnp.uint32)[None, :]
    prefix = jnp.uint32(0)
    k_left = jnp.asarray(k, jnp.int32)
    for p in range(4):
        shift = 24 - 8 * p
        # Bits above the current byte; Python-static masks avoid a
        # dynamic >>32 on the first pass.
        high_mask = np.uint32(0xFFFFFFFF ^ ((1 << (shift + 8)) - 1))
        active = (keys & high_mask) == prefix
        byte = (keys >> np.uint32(shift)) & np.uint32(0xFF)
        counts = jnp.sum(
            jnp.where(active[:, None] & (byte[:, None] == bins), 1, 0),
            axis=0,
            dtype=jnp.int32,
        )
        cum = jnp.cumsum(counts)
        bin_ = jnp.sum((cum <= k_left).astype(jnp.int32)).astype(jnp.uint32)
        below = jnp.where(bin_ > 0, cum[jnp.maximum(bin_, 1) - 1], 0)
        k_left = k_left - below
        prefix = prefix | (bin_ << np.uint32(shift))
    return prefix


def _select_impl() -> str:
    """"bits" (32-pass binary search, the default) or "radix" (4-pass
    histogram).  Both are exact and bit-identical.  Chip-measured
    2026-08-19 (diag_power_overhead, cap=125): per-check cost inside
    the sign-exit solve is 0.14-0.18 ms for bits at 69K/200K/1.8M
    nodes, but radix blows up to 7.0 ms/check at 1.8M — its (n, 256)
    one-hot histogram pays 256x the compare bandwidth per pass, which
    beats the 8x pass-count saving only in theory.  Fewer passes lose
    to narrower passes on real HBM.  EIG_KL_TPU_SELECT_IMPL overrides
    for A/B."""
    import os

    return os.environ.get("EIG_KL_TPU_SELECT_IMPL", "bits")


def kth_smallest(v: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact ``jnp.sort(v)[k]`` (0-indexed rank ``k``) without sorting.

    ``v`` must be 1-D.  f32 runs the 32-pass bit binary search
    (EIG_KL_TPU_SELECT_IMPL=radix switches to the 4-pass histogram,
    slower on chip — see _select_impl); other dtypes fall back to
    ``jnp.sort``.
    """
    if v.dtype != jnp.float32:
        return jnp.sort(v)[k]
    keys = _f32_keys(v)
    if _select_impl() == "radix":
        result = _kth_key_radix(keys, k)
    else:
        result = _kth_key_bits(keys, k)
    return _key_to_f32(result)


def _use_select() -> bool:
    """Select path on TPU (sort is the slow op there); sort elsewhere.

    Both paths return bit-identical values, so the choice is pure
    performance: CPU XLA's vectorized sort beats 32 sequential passes,
    TPU's sort does not.  ``EIG_KL_TPU_MEDIAN_SELECT={0,1}`` overrides.
    """
    import os

    env = os.environ.get("EIG_KL_TPU_MEDIAN_SELECT")
    if env is not None:
        return env != "0"
    import jax

    return jax.default_backend() == "tpu"


def upper_median(v: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """The reference's "upper" median ``sorted[n // 2]`` (gKL2.cu:396-398)."""
    if n is None:
        n = v.shape[0]
    if not _use_select():
        return jnp.sort(v)[n // 2]
    return kth_smallest(v, n // 2)

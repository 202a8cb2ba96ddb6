"""gKL2-flavor spectral partitioner: shift-inverted power iteration.

The reference's fused GPU pipeline builds a row-degree-normalized
"Laplacian" with off-diagonal ``-2 w_ij / deg_i`` and diagonal
``+2`` (negative row-sum, gKL2.cu:262-303) from the *KL-weighted*
adjacency, then iterates ``y = x - (L x) / shift`` with shift 2.0
(gKL2.cu:335-353).  Algebraically that is exactly one step of power
iteration on the random-walk matrix ``D^-1 A``; the iterate converges
toward the constant Perron vector plus a slowly-decaying second
component, and the subsequent median split (gKL2.cu:391-414) keys on
that second component's sign pattern.  We reproduce the scheme
faithfully -- normalization every step, convergence on
``|norm_t - norm_{t-1}| < 1e-6`` only after 100 iterations, cap 1000
(gKL2.cu:26-27, 370-377) -- but run the whole loop device-resident in
one ``lax.while_loop`` instead of a per-iteration host norm readback.

Note a reference quirk we intentionally do NOT reproduce: gKL2's
in-process partition puts ``median > value`` nodes on split[0]
(gKL2.cu:404) while its own file writer labels the same nodes side 1
(gKL2.cu:249); we follow the file convention everywhere (labels are
symmetric, cut size is unaffected).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.ops.partition import spmv
from eig_kl_tpu.ops.select import upper_median
from eig_kl_tpu.utils.config import SpectralConfig


class _PowerState(NamedTuple):
    x: jnp.ndarray
    norm: jnp.ndarray
    prev_norm: jnp.ndarray
    iteration: jnp.ndarray


def power_iteration_fiedler(
    g: DeviceGraph,
    config: SpectralConfig = SpectralConfig(solver="power"),
    *,
    dtype=jnp.float32,
):
    """Run the gKL2 power iteration; returns (rayleigh_quotient, vector).

    The iteration count of the last run is stashed on the module as
    ``last_iterations`` (gKL2 prints its count at gKL2.cu:385-387).

    Args:
      g: DeviceGraph with the "kl" (1/(k-1)) weighting -- gKL2 reuses
        the KL adjacency for its Laplacian (gKL2.cu:262-303).
    """
    convergence = config.convergence
    if convergence == "auto":
        convergence = "gkl2" if jnp.dtype(dtype) == jnp.float64 else "sign"
    lam, v, iters = _power_core(
        g,
        shift=config.shift,
        tolerance=config.tolerance,
        min_iters=config.min_power_iters,
        max_iters=config.max_iterations,
        seed=config.seed,
        dtype=jnp.dtype(dtype).name,
        convergence=convergence,
        check_interval=config.check_interval,
        stable_checks=config.stable_checks,
        inter_dtype=config.inter_dtype,
    )
    global last_iterations
    last_iterations = int(iters)
    return lam, v


#: iteration count of the most recent power_iteration_fiedler run.
last_iterations: int = 0


class _SignState(NamedTuple):
    x: jnp.ndarray
    split: jnp.ndarray  # median-split pattern at the last check
    best_x: jnp.ndarray  # iterate with the lowest flip distance so far
    best_flips: jnp.ndarray  # that minimum distance
    flips: jnp.ndarray  # distance at the last check
    stable: jnp.ndarray  # consecutive below-tolerance checks
    iteration: jnp.ndarray


class _MomState(NamedTuple):
    xp: jnp.ndarray  # previous iterate (momentum carry)
    x: jnp.ndarray
    beta: jnp.ndarray  # adaptive Chebyshev/Polyak momentum coefficient
    split: jnp.ndarray
    best_x: jnp.ndarray
    best_flips: jnp.ndarray
    flips: jnp.ndarray
    stable: jnp.ndarray
    iteration: jnp.ndarray


_POWER_STATICS = (
    "shift",
    "tolerance",
    "min_iters",
    "max_iters",
    "seed",
    "dtype",
    "convergence",
    "check_interval",
    "stable_checks",
    "inter_dtype",
)


def _power_core_impl(
    g,
    shift,
    tolerance,
    min_iters,
    max_iters,
    seed,
    dtype,
    convergence="gkl2",
    check_interval=25,
    stable_checks=2,
    inter_dtype="float32",
):
    dtype = jnp.dtype(dtype)
    n = g.num_nodes
    inv_shift = 1.0 / shift
    safe_deg = jnp.where(g.degrees > 0, g.degrees, 1.0).astype(dtype)

    # With a chunk plan and f32 state, iterate on zero-padded (P/128,
    # 128) state so the hot loop has no per-iteration pad/unpad passes.
    padded = g.plan is not None and dtype == jnp.float32
    if padded:
        from eig_kl_tpu.ops.spmv_pallas import spmv_pallas_2d

        P = g.plan.padded_nodes
        pad_deg = jnp.ones(P, dtype).at[:n].set(safe_deg).reshape(P // 128, 128)

        inter = jnp.dtype(inter_dtype)

        def matvec(x2d):
            # bf16 intermediates halve the v2 plan's streamed HBM bytes
            # (gather output, bucket transpose, reduce input); the
            # reduce pass accumulates in f32 and the iterate stays f32.
            # The v2 slot grid is 16-row aligned (build_plan_v2) so the
            # gather's bf16 block writes land on (16,128) tiles.
            return spmv_pallas_2d(g.plan, x2d, inter_dtype=inter)

        def to_state(x):
            return jnp.zeros(P, dtype).at[:n].set(x).reshape(P // 128, 128)

        def from_state(x2d):
            return x2d.reshape(-1)[:n]

        deg_used = pad_deg
    else:

        def matvec(x):
            return spmv(g, x.astype(g.ell_weights.dtype)).astype(dtype)

        def to_state(x):
            return x

        def from_state(x):
            return x

        deg_used = safe_deg

    def norm_lap(x):
        # L x with L = 2 I - 2 D^-1 A  (row-normalized, gKL2.cu:262-303).
        return 2.0 * x - 2.0 * matvec(x) / deg_used

    def step(x):
        y = x - inv_shift * norm_lap(x)  # gKL2.cu:65-89 sparseMVKernel
        nrm = jnp.linalg.norm(y)
        safe = nrm > 0
        return jnp.where(safe, y / jnp.where(safe, nrm, 1.0), y), nrm

    key = jax.random.PRNGKey(seed)  # srand(42) analog, gKL2.cu:322
    x0 = to_state(jax.random.uniform(key, (n,), dtype=dtype) - 0.5)
    x0, n0 = step(x0)

    if convergence == "sign":
        # f32-appropriate exit: the delta-norm test (gKL2.cu:370-377)
        # can never fire below f32 resolution on a unit-norm vector.
        # Instead watch the quantity the partition actually consumes --
        # the median-split sign pattern (gKL2.cu:391-414) -- every
        # `check_interval` steps.  Its complement-normalized Hamming
        # distance between consecutive checks decreases while the
        # Fiedler component still dominates the deviation around the
        # median, then RISES once that component decays below the f32
        # noise floor of the (dominant) constant component.  So:
        #   * crisp exit: distance <= flip_tol * n for `stable_checks`
        #     consecutive checks (real circuits converge this way);
        #   * dip exit: distance exceeded its running minimum by >10%,
        #     i.e. we are past the noise turn -- return the iterate that
        #     achieved the minimum (the best split seen).
        # Distance is taken up to complement (min(d, n-d)) because the
        # high-frequency end of the spectrum survives at |mu| ~ 1 under
        # shift 2.0 and alternates sign per step.
        flip_tol = 1e-3

        def split_of(x):
            v = from_state(x)
            # "upper" convention, gKL2.cu:396-398; rank-select instead
            # of a full sort -- this runs every check_interval steps.
            med = upper_median(v, n)
            return med > v

        def sign_body(st: _SignState):
            def inner(_, x):
                return step(x)[0]

            x = jax.lax.fori_loop(0, check_interval, inner, st.x)
            split = split_of(x)
            d = jnp.sum(split != st.split).astype(jnp.int32)
            flips = jnp.minimum(d, n - d).astype(jnp.int32)
            improved = flips < st.best_flips
            return _SignState(
                x=x,
                split=split,
                best_x=jnp.where(improved, x, st.best_x),
                best_flips=jnp.where(improved, flips, st.best_flips),
                flips=flips,
                stable=jnp.where(flips <= flip_tol * n, st.stable + 1, 0),
                iteration=st.iteration + check_interval,
            )

        def sign_cond(st: _SignState):
            past_min = st.iteration > min_iters
            crisp = (st.stable >= stable_checks) & past_min
            rose = (
                (st.flips.astype(jnp.float32) > 1.1 * st.best_flips.astype(jnp.float32))
                & past_min
            )
            return (~crisp) & (~rose) & (st.iteration < max_iters)

        big = jnp.asarray(n + 1, jnp.int32)
        init = _SignState(
            x=x0,
            split=split_of(x0),
            best_x=x0,
            best_flips=big,
            flips=big,
            stable=jnp.asarray(0, jnp.int32),
            iteration=jnp.asarray(1, jnp.int32),
        )
        final = jax.lax.while_loop(sign_cond, sign_body, init)
        # Past-the-dip stop returns the minimum-distance iterate; crisp
        # or cap stops return the latest (best_x == x there anyway for
        # crisp, and the cap case has no better candidate than best_x).
        v = jnp.where(final.flips > final.best_flips, final.best_x, final.x)
    elif convergence == "momentum":
        # Chebyshev/Polyak-accelerated power iteration:
        #     u_{k+1} = B u_k - beta * u_{k-1},   B = I - L / shift.
        # With 2*sqrt(beta) set just below the dominant surviving
        # eigenvalue mu, every mode inside the Chebyshev ellipse
        # collapses to magnitude ~sqrt(beta) per step while modes above
        # the edge keep growing -- the Fiedler/bulk separation runs at
        # z(mu_F)/sqrt(beta) per step instead of the plain-power
        # mu_F/mu_3 (a quadratic speedup in iteration count; 126-step
        # 200K runs drop to ~30-50 steps).  beta adapts each check from
        # the Rayleigh quotient of the constant-deflated iterate, and
        # the constant subspace (invariant under the linear recurrence)
        # is projected off BOTH carries at every check, so the f32
        # noise-floor turn the plain "sign" mode must dip-detect never
        # builds up.  Exit logic (split stability + dip safety net) is
        # shared with the "sign" mode.
        flip_tol = 1e-3
        edge = 0.995  # 2*sqrt(beta) = edge * mu_estimate

        # Run the recurrence in the SYMMETRIC similarity basis
        #   B_sym = D^-1/2 A D^-1/2  (B = D^-1 A = D^-1/2 B_sym D^1/2),
        # where the Rayleigh quotient of the deflated iterate is
        # GUARANTEED <= mu_F (top surviving eigenvalue) -- so the
        # adaptive ellipse edge never swallows the Fiedler mode.  In
        # the reference's non-symmetric basis the quotient carries no
        # such bound and the first implementation of this mode
        # measurably collapsed the target mode with it.  The split is
        # always taken on the back-converted D^-1/2 w vector (the one
        # the reference's median split consumes).
        dsq = jnp.sqrt(safe_deg)
        dsinv = 1.0 / dsq
        dsinv_st = to_state(dsinv)
        q0 = dsq / jnp.linalg.norm(dsq)  # B_sym's top (constant) mode

        def opm_sym(w):
            # LAZY walk (I + B_sym) / 2: B_sym's spectrum spans
            # [-1, 1], and a Chebyshev ellipse amplifies BOTH ends --
            # plain momentum on B_sym grows the mu ~ -1 oscillatory
            # modes as fast as the Fiedler and locks onto the wrong
            # subspace (observed: deterministic bad splits).  The lazy
            # map sends them to ~0 while preserving eigenvectors and
            # the top-of-spectrum order.
            return 0.5 * (w + dsinv_st * matvec(dsinv_st * w))

        def deflate(w):
            return w - jnp.vdot(q0, w) * q0

        def split_of_w(w):
            v = from_state(w) * dsinv
            med = upper_median(v, n)
            return med > v

        def mom_body(st: _MomState):
            def inner(_, c):
                wp, w = c
                u = opm_sym(w) - st.beta * wp
                nrm = jnp.linalg.norm(u)
                safe = nrm > 0
                inv = jnp.where(safe, 1.0 / jnp.where(safe, nrm, 1.0), 1.0)
                return (w * inv, u * inv)

            wp, w = jax.lax.fori_loop(
                0, check_interval, inner, (st.xp, st.x)
            )
            # Deflate the constant mode from both carries (linearity:
            # the projected pair still satisfies the recurrence).
            wv = deflate(from_state(w))
            wpv = deflate(from_state(wp))
            nv = jnp.linalg.norm(wv)
            safe = nv > 0
            inv = jnp.where(safe, 1.0 / jnp.where(safe, nv, 1.0), 1.0)
            wv = wv * inv
            wpv = wpv * inv
            w = to_state(wv)
            # One extra matvec per check: symmetric Rayleigh quotient
            # of the deflated unit iterate, a lower bound on mu_F.
            mu = jnp.clip(
                jnp.vdot(wv, from_state(opm_sym(w))), 0.05, 1.0 - 1e-7
            )
            beta = jnp.square(edge * mu) * 0.25
            v = wv * dsinv
            med = upper_median(v, n)
            split = med > v
            d = jnp.sum(split != st.split).astype(jnp.int32)
            flips = jnp.minimum(d, n - d).astype(jnp.int32)
            improved = flips < st.best_flips
            return _MomState(
                xp=to_state(wpv),
                x=w,
                beta=beta,
                split=split,
                best_x=jnp.where(improved, w, st.best_x),
                best_flips=jnp.where(improved, flips, st.best_flips),
                flips=flips,
                stable=jnp.where(flips <= flip_tol * n, st.stable + 1, 0),
                iteration=st.iteration + check_interval,
            )

        def mom_cond(st: _MomState):
            # No dip exit here: the constant mode is deflated away every
            # check, so the f32 noise turn the "sign" mode dip-detects
            # cannot build up -- and beta adaptation re-excites bulk
            # modes transiently between checks, which a dip rule
            # misreads as the turn.  Split stability or the cap decide.
            past_min = st.iteration > 2 * check_interval
            crisp = (st.stable >= stable_checks) & past_min
            return (~crisp) & (st.iteration < max_iters)

        big = jnp.asarray(n + 1, jnp.int32)
        w0 = deflate(from_state(x0) * dsq)  # reference draw -> sym basis
        nv0 = jnp.linalg.norm(w0)
        w0 = w0 / jnp.where(nv0 > 0, nv0, 1.0)
        x0d = to_state(w0)
        init = _MomState(
            xp=to_state(jnp.zeros_like(w0)),
            x=x0d,
            beta=jnp.asarray(0.0, dtype),
            split=split_of_w(x0d),
            best_x=x0d,
            best_flips=big,
            flips=big,
            stable=jnp.asarray(0, jnp.int32),
            iteration=jnp.asarray(1, jnp.int32),
        )
        final = jax.lax.while_loop(mom_cond, mom_body, init)
        # Back to the reference basis for the split/output vector.
        v_flat = from_state(final.x) * dsinv
        nvf = jnp.linalg.norm(v_flat)
        v = to_state(v_flat / jnp.where(nvf > 0, nvf, 1.0))
    else:  # "gkl2": exact reference rule (gKL2.cu:26-27, 370-377)

        def cond(st: _PowerState):
            done = (jnp.abs(st.norm - st.prev_norm) < tolerance) & (
                st.iteration > min_iters
            )
            return (~done) & (st.iteration < max_iters)

        def body(st: _PowerState):
            x, nrm = step(st.x)
            return _PowerState(x, nrm, st.norm, st.iteration + 1)

        init = _PowerState(
            x=x0,
            norm=n0,
            prev_norm=jnp.asarray(0.0, dtype),
            iteration=jnp.asarray(1, jnp.int32),
        )
        final = jax.lax.while_loop(cond, body, init)
        v = final.x
    # Rayleigh quotient on the normalized Laplacian.
    lam = jnp.vdot(v, norm_lap(v))
    return lam, from_state(v), final.iteration


_power_core = functools.partial(jax.jit, static_argnames=_POWER_STATICS)(
    _power_core_impl
)


@functools.partial(jax.jit, static_argnames=_POWER_STATICS)
def _power_core_packed(
    g,
    shift,
    tolerance,
    min_iters,
    max_iters,
    seed,
    dtype,
    convergence="gkl2",
    check_interval=25,
    stable_checks=2,
    inter_dtype="float32",
):
    """_power_core plus the "upper" median (gKL2.cu:396-398), packed
    into ONE array ``[v(n), median, lambda, iterations]`` so the whole
    spectral phase costs a single device fetch.  Through the tunnel a
    device_get has a ~30 ms floor; the unpacked path pays it 4-5 times
    (lambda, median, sides, values, count) -- more than the entire
    126-iteration solve at 200K nodes."""
    lam, v, iters = _power_core_impl(
        g,
        shift,
        tolerance,
        min_iters,
        max_iters,
        seed,
        dtype,
        convergence=convergence,
        check_interval=check_interval,
        stable_checks=stable_checks,
        inter_dtype=inter_dtype,
    )
    n = v.shape[0]
    med = upper_median(v, n)
    extras = jnp.stack(
        [med.astype(v.dtype), lam.astype(v.dtype), iters.astype(v.dtype)]
    )
    return jnp.concatenate([v, extras])


def power_partition_fiedler(
    g: DeviceGraph,
    config: SpectralConfig = SpectralConfig(solver="power"),
    *,
    dtype=jnp.float32,
):
    """Fused power solve + "upper"-median split, one device fetch.

    Returns host-side ``(eigenvalue, median, values, sides)`` with
    ``sides[i] = median > values[i]`` (int8) -- the gKL2 split
    semantics (gKL2.cu:403-414).  Numerically identical to
    ``power_iteration_fiedler`` + ``median_split(..., "upper")``: the
    median is the same device sort, and the f32 comparison against it
    is exact on host bits.  Stashes ``last_iterations`` like the
    unpacked entry point."""
    convergence = config.convergence
    if convergence == "auto":
        convergence = "gkl2" if jnp.dtype(dtype) == jnp.float64 else "sign"
    packed = _power_core_packed(
        g,
        shift=config.shift,
        tolerance=config.tolerance,
        min_iters=config.min_power_iters,
        max_iters=config.max_iterations,
        seed=config.seed,
        dtype=jnp.dtype(dtype).name,
        convergence=convergence,
        check_interval=config.check_interval,
        stable_checks=config.stable_checks,
        inter_dtype=config.inter_dtype,
    )
    p = np.asarray(packed)  # the single transfer
    n = g.num_nodes
    values = p[:n]
    med = p[n].item()
    lam = p[n + 1].item()
    global last_iterations
    last_iterations = int(p[n + 2])
    sides = (med > values).astype(np.int8)
    return lam, med, values, sides

"""Multi-start (data-parallel) KL refinement.

KL quality depends on the initial partition (the reference runs one
start per invocation and relies on the RNG, cKL.cpp:175-193).  On a
TPU mesh, independent starts are embarrassingly parallel: we ``vmap``
the device-resident refinement loop over a batch of initial partitions
and shard the batch across the ``"dp"`` mesh axis -- each chip runs its
own while_loop in lockstep, no communication until the final best-cut
reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eig_kl_tpu.graph.csr import DeviceGraph
from eig_kl_tpu.kl.engine import KLResult, _kl_loop
from eig_kl_tpu.kl.init import random_split
from eig_kl_tpu.utils.config import KLConfig


@functools.partial(
    jax.jit,
    static_argnames=("max_iters", "gain_eps", "terminate_limit"),
)
def _batched_kl(g: DeviceGraph, sides_batch, max_iters, gain_eps, terminate_limit):
    return jax.vmap(
        lambda sides: _kl_loop(
            g,
            sides,
            max_iters=max_iters,
            gain_eps=gain_eps,
            terminate_limit=terminate_limit,
            refresh_interval=0,
        )
    )(sides_batch)


def multi_start_refine(
    g: DeviceGraph,
    num_starts: int,
    *,
    config: KLConfig = KLConfig(),
    mesh: Mesh | None = None,
    base_seed: int = 0,
    init_sides: np.ndarray | None = None,
) -> tuple[KLResult, np.ndarray]:
    """Run ``num_starts`` independent KL refinements; return the best.

    Args:
      g: device graph (replicated across the mesh).
      num_starts: batch size; with a mesh, should be a multiple of the
        "dp" axis size.
      mesh: optional mesh; the start batch is sharded over its "dp"
        axis so each chip refines its own starts.
      init_sides: optional (num_starts, n) explicit initial partitions
        (overrides the seeded random splits).

    Returns:
      (best KLResult, best_cut per start).
    """
    n = g.num_nodes
    if g.plan is not None:
        # The batched loop vmaps the XLA engine; the Pallas SpMV plan is
        # single-instance machinery -- drop it for this path.
        g = g._replace(plan=None)
    if init_sides is None:
        init_sides = np.stack(
            [random_split(n, base_seed + i) for i in range(num_starts)]
        )
    elif len(init_sides) != num_starts:
        raise ValueError(
            f"init_sides has {len(init_sides)} starts, expected {num_starts}"
        )
    if mesh is not None:
        g = jax.device_put(g, NamedSharding(mesh, P()))

    n1 = int(np.asarray(init_sides[0], dtype=np.int64).sum())
    natural_cap = min(n - n1, n1)
    max_iters = (
        natural_cap
        if config.max_iterations is None
        else min(config.max_iterations, natural_cap)
    )
    gref = g

    def run_raw(batch: np.ndarray):
        # int8 on HOST first: a device-side dtype convert is a one-off
        # compiled program (cold-start cost on the axon plugin).
        sb = jnp.asarray(np.asarray(batch, dtype=np.int8))
        if mesh is not None:
            sb = jax.device_put(sb, NamedSharding(mesh, P("dp", None)))
        return _batched_kl(
            gref,
            sb,
            max_iters=max_iters,
            gain_eps=config.gain_eps,
            terminate_limit=config.terminate_limit(n),
        )

    from eig_kl_tpu.kl.multipass import (
        refine_multipass_batch,
        resolved_passes,
    )

    if resolved_passes(config) > 1:
        results = refine_multipass_batch(
            lambda batch: _materialize_batched(run_raw(batch), batch),
            init_sides,
            config,
        )
        best_cuts = np.asarray([r.best_cut for r in results])
        best = results[int(np.argmin(best_cuts))]
        return best, best_cuts
    # Single pass: fetch only the argmin start's logs (the full
    # per-start materialization is multipass machinery -- it would
    # device_get S whole log matrices and run S host replays).
    out = run_raw(init_sides)
    best_cuts = np.asarray(out.best_cut)
    k = int(np.argmin(best_cuts))
    best = _materialize_one(out, init_sides, k)
    return best, best_cuts


@jax.jit
def _slice_start(out, k):
    """Device-side slice of start ``k`` across every field of a vmapped
    ``_kl_loop`` batch — ONE compiled program and one fetch, where
    eager per-field ``out.x[k]`` indexing dispatched a (dynamic_slice,
    squeeze) pair of one-off programs per field (~10 extra remote
    compiles per process on the axon plugin)."""
    return jax.tree_util.tree_map(lambda x: x[k], out)


def _materialize_one(out, init_sides: np.ndarray, k: int) -> KLResult:
    """Host KLResult for start ``k`` of a vmapped ``_kl_loop`` batch."""
    from eig_kl_tpu.kl.engine import best_iteration, replay_swaps

    sl = jax.device_get(_slice_start(out, k))
    iterations = int(sl.iterations)
    log_cut = np.asarray(sl.log_cut)
    return KLResult(
        sides=(np.asarray(sl.s) < 0).astype(np.int8),
        best_sides=replay_swaps(
            init_sides[k],
            np.asarray(sl.log_a),
            np.asarray(sl.log_b),
            best_iteration(log_cut, iterations),
        ),
        initial_cut=float(sl.initial_cut),
        final_cut=float(sl.cut),
        best_cut=float(sl.best_cut),
        verified_cut=float(sl.verified_cut),
        iterations=iterations,
        cut_trajectory=log_cut[: iterations + 1],
        gain_trajectory=np.asarray(sl.log_gain)[: iterations + 1],
    )


def _materialize_batched(out, init_sides: np.ndarray) -> list[KLResult]:
    """Host KLResults for every start of a vmapped ``_kl_loop`` batch."""
    from eig_kl_tpu.kl.engine import best_iteration, replay_swaps

    s = np.asarray(out.s)
    log_a = np.asarray(out.log_a)
    log_b = np.asarray(out.log_b)
    log_cut = np.asarray(out.log_cut)
    log_gain = np.asarray(out.log_gain)
    results = []
    for k in range(len(init_sides)):
        iterations = int(out.iterations[k])
        results.append(
            KLResult(
                sides=np.asarray(s[k] < 0, dtype=np.int8),
                best_sides=replay_swaps(
                    init_sides[k],
                    log_a[k],
                    log_b[k],
                    best_iteration(log_cut[k], iterations),
                ),
                initial_cut=float(out.initial_cut[k]),
                final_cut=float(out.cut[k]),
                best_cut=float(out.best_cut[k]),
                verified_cut=float(out.verified_cut[k]),
                iterations=iterations,
                cut_trajectory=log_cut[k][: iterations + 1],
                gain_trajectory=log_gain[k][: iterations + 1],
            )
        )
    return results


# Auto-chunk ceiling for one batched launch, in node-starts
# (starts_per_launch * padded_nodes).  The whole batch runs as ONE
# long-lived Mosaic kernel (a grid step per start, each a full
# refinement); a single launch running for minutes trips the TPU
# worker's watchdog and kills the process (measured: ibm10 x 2048
# starts = 143M node-starts ~ est. 250 s crashed the worker;
# industry2 x 2048 = 26M ran 72 s fine).  16M node-starts is ~10-30 s
# of kernel time at the measured 3-5 us/swap.
_LAUNCH_NODE_STARTS = 16 << 20


def multi_start_refine_mega(
    graph,
    num_starts: int,
    *,
    config: KLConfig = KLConfig(),
    base_seed: int = 0,
    device_graph=None,
    launch_chunk: int | None = None,
    init_sides: np.ndarray | None = None,
) -> tuple[KLResult, np.ndarray]:
    """Multi-start refinement through the single-kernel Pallas engine.

    Starts run batched in a grid over the start axis
    (:func:`eig_kl_tpu.kl.megakernel.refine_mega_batch`): one compile,
    batched initial ``A @ s``/cut setup, and one host round-trip per
    launch, instead of a per-start host loop.  Per-start VMEM stays
    constant (each grid step owns the (R, 128) state), so the batch
    size is memory-unbounded; very large batches are auto-split into
    multiple launches to keep each kernel under the TPU worker's
    watchdog (see ``_LAUNCH_NODE_STARTS``).

    Args mirror :func:`multi_start_refine` but take the host graph;
    ``launch_chunk`` overrides the auto starts-per-launch split;
    ``init_sides`` (num_starts, n) overrides the seeded random splits
    (e.g. perturbed spectral inits, :func:`eig_kl_tpu.kl.init.perturb_split`).
    """
    from eig_kl_tpu.kl.megakernel import MegaGraph, refine_mega_batch
    from eig_kl_tpu.kl.multipass import (
        refine_multipass_batch,
        resolved_passes,
    )

    plan = getattr(device_graph, "plan", None)
    mg = MegaGraph(graph, plan=plan, device_graph=device_graph)
    if launch_chunk is None:
        launch_chunk = max(8, _LAUNCH_NODE_STARTS // max(mg.padded_nodes, 1))

    def run_batch(batch: np.ndarray) -> list[KLResult]:
        out = []
        for s0 in range(0, len(batch), launch_chunk):
            out += refine_mega_batch(mg, batch[s0 : s0 + launch_chunk], config)
        return out

    if init_sides is None:
        init_batch = np.stack(
            [
                random_split(graph.num_nodes, base_seed + i)
                for i in range(num_starts)
            ]
        )
    else:
        init_batch = np.asarray(init_sides, dtype=np.int8)
        if len(init_batch) != num_starts:
            raise ValueError(
                f"init_sides has {len(init_batch)} starts, "
                f"expected {num_starts}"
            )
    if resolved_passes(config) > 1:
        results = refine_multipass_batch(run_batch, init_batch, config)
    else:
        results = run_batch(init_batch)
    cuts = np.asarray([r.best_cut for r in results])
    best = results[int(np.argmin(cuts))]
    return best, cuts


def multi_start_refine_mega_sharded(
    graph,
    num_starts: int,
    *,
    mesh: Mesh,
    config: KLConfig = KLConfig(),
    base_seed: int = 0,
    device_graph=None,
    interpret: bool | None = None,
    init_sides: np.ndarray | None = None,
) -> tuple[KLResult, np.ndarray]:
    """Pod-scale multi-start: the start axis sharded over the mesh's
    "dp" axis, each chip running its local starts through the batched
    single-kernel Pallas engine (one grid launch per chip, zero
    cross-chip communication until the host-side best-cut argmin).

    This is the production way to use a multi-chip mesh for KL quality:
    per-swap latency stays at the single-chip mega-kernel's ~3-5 us
    (sharding the swap loop itself pays a ~1 us ICI collective floor
    4x per swap, see README "Multi-chip performance design"), and
    throughput scales linearly in chips.

    Requires ``num_starts`` divisible by the "dp" axis size.
    """
    from eig_kl_tpu.kl import megakernel as mk

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dp = mesh.shape["dp"]
    if num_starts % dp != 0:
        raise ValueError(
            f"num_starts={num_starts} must be divisible by dp={dp}"
        )
    if config.refresh_interval > 0:
        # Chunked refresh re-enters the kernel with host-side log
        # replay between chunks, which does not compose with the
        # shard_map launch; run the single-chip batched refresh path
        # (refine_mega_batch handles refresh natively) instead of
        # failing.  That forfeits the dp sharding, so say so.
        import warnings

        warnings.warn(
            "refresh_interval > 0 is not supported by the dp-sharded "
            "batched launch; running all starts on a single chip "
            "(~mesh-size x slower than requested)",
            stacklevel=2,
        )
        return multi_start_refine_mega(
            graph,
            num_starts,
            config=config,
            base_seed=base_seed,
            device_graph=device_graph,
            init_sides=init_sides,
        )
    n = graph.num_nodes
    mg = mk.MegaGraph(
        graph,
        plan=getattr(device_graph, "plan", None),
        device_graph=device_graph,
    )
    if init_sides is None:
        sides_batch = np.stack(
            [random_split(n, base_seed + i) for i in range(num_starts)]
        )
    else:
        sides_batch = np.asarray(init_sides, dtype=np.int8)
        if len(sides_batch) != num_starts:
            raise ValueError(
                f"init_sides has {len(sides_batch)} starts, "
                f"expected {num_starts}"
            )
    Pn = mk._round_up(mg.padded_nodes, 1024)
    R = Pn // 128
    S = num_starts
    # KL swaps preserve balance, so the per-start caps computed from
    # the initial batch hold for every later multi-pass batch too.
    caps, naturals = [], []
    for k in range(S):
        n1 = int(sides_batch[k].astype(np.int64).sum())
        natural = min(n - n1, n1)
        naturals.append(natural)
        caps.append(
            natural
            if config.max_iterations is None
            else min(config.max_iterations, natural)
        )
    max_iters = min(
        mk._round_up(max(max(caps), 1), 4096), max(max(naturals), 1)
    )
    terminate_limit = config.terminate_limit(n)
    gain_eps = config.gain_eps

    shard3 = NamedSharding(mesh, P("dp", None, None))
    caps_dev = jax.device_put(
        jnp.asarray(caps, jnp.int32), NamedSharding(mesh, P("dp"))
    )
    wsum = mg.weighted_degrees.sum()

    def local(meta_idx, meta_w, plan, wsum, sf_loc, caps_loc):
        a_s, cut0 = mk._batch_init(
            plan, wsum, sf_loc, n=n, P=Pn, interp=interpret
        )
        fparams = jnp.stack([cut0, cut0], axis=0)
        iparams = jnp.stack(
            [caps_loc, jnp.zeros_like(caps_loc)], axis=0
        )
        outs = mk._run_batched(
            meta_idx,
            meta_w,
            sf_loc,
            a_s,
            fparams,
            iparams,
            num_nodes=n,
            max_iters=max_iters,
            terminate_limit=terminate_limit,
            gain_eps=gain_eps,
            interpret=interpret,
        )
        _sf_out, lc, lg, la, lb, sc = outs
        ver, _bi, bs, fs = mk._finalize_batch(
            plan, wsum, sf_loc, lc, la, lb, sc, n=n, P=Pn,
            interp=interpret,
        )
        return sc, lc, lg, ver, bs, fs

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("dp", None, None), P("dp")),
        out_specs=(P(None, "dp"), P("dp", None, None),
                   P("dp", None, None), P("dp"), P("dp", None),
                   P("dp", None)),
        check_vma=False,
    )

    def run_batch(batch: np.ndarray) -> list[KLResult]:
        sf_host = np.zeros((S, Pn), dtype=np.float32)
        sf_host[:, :n] = 1.0 - 2.0 * batch.astype(np.float32)
        sf_dev = jax.device_put(
            jnp.asarray(sf_host.reshape(S, R, 128)), shard3
        )
        sc, lc, lg, ver, bs, fs = jax.device_get(
            sharded(
                mg.meta_indices,
                mg.meta_weights,
                mg.spmv_plan,
                wsum,
                sf_dev,
                caps_dev,
            )
        )
        results = []
        for k in range(S):
            col = sc[:, k]
            iters = int(col[2])
            lck = lc[k].reshape(-1)
            results.append(
                KLResult(
                    sides=fs[k],
                    best_sides=bs[k],
                    initial_cut=float(col[6]),
                    final_cut=float(col[0]),
                    best_cut=float(col[1]),
                    verified_cut=float(ver[k]),
                    iterations=iters,
                    cut_trajectory=lck[: iters + 1],
                    gain_trajectory=lg[k].reshape(-1)[: iters + 1],
                )
            )
        return results

    from eig_kl_tpu.kl.multipass import (
        refine_multipass_batch,
        resolved_passes,
    )

    if resolved_passes(config) > 1:
        results = refine_multipass_batch(run_batch, sides_batch, config)
    else:
        results = run_batch(sides_batch)
    cuts = np.asarray([r.best_cut for r in results])
    best = results[int(np.argmin(cuts))]
    return best, cuts

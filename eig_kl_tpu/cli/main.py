"""Command-line interface.

The reference's four executables become subcommands of one CLI
(run as ``python -m eig_kl_tpu ...``):

* ``eig <file>``              == ``./cEIG <file>``      (cEIG.cpp:138)
* ``kl <file> [-EIG]``        == ``./cKL|./gKL``        (cKL.cpp:424, gKL.cu:672)
* ``fused <file> [-EIG]``     == ``./gKL2``             (gKL2.cu:989)
* ``generate <mult> -o FILE`` == ``circuit_generator.py`` (:71-84)
* ``info``                    == printGPUInfo           (gKL.cu:555-571)

Output artifacts land in ``pre_saved_EIG/`` and ``results/`` relative
to the working directory, with reference-compatible names and formats.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _add_platform(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--platform",
        choices=["auto", "tpu", "cpu"],
        default="auto",
        help="JAX backend: 'auto' (default) runs small circuits on the "
        "in-process CPU engine — a cold TPU process pays a remote "
        "compile at first execution that dwarfs compute below ~16K "
        "nodes (fract -EIG: 2.6 s CPU vs 162.7 s cold TPU, identical "
        "cut).  'tpu'/'cpu' force the backend",
    )


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("input", help="path to .hgr circuit")
    _add_platform(p)
    p.add_argument(
        "-EIG",
        dest="eig_init",
        action="store_true",
        help="initialize from pre_saved_EIG/<base>_out.txt (the reference -EIG flag)",
    )
    p.add_argument("--seed", type=int, default=0, help="random-init seed")
    p.add_argument(
        "--f64", action="store_true", help="run the KL engine in float64"
    )
    p.add_argument(
        "--passes",
        type=int,
        default=1,
        help="KL passes: each pass after the first restarts from the "
        "best partition with all nodes unlocked (classic multi-pass "
        "KL; 1 = the reference's single-pass semantics, 0 = until "
        "converged).  Converges in 3-7 passes and improves random-init "
        "cuts dramatically (ibm01 N=30 mean 3332 -> 1646)",
    )
    p.add_argument(
        "--kicks",
        type=int,
        default=0,
        help="iterated local search: after the descent, perturb the "
        "best partition and re-descend this many times, keeping the "
        "global best (ibm01 power init: 20 kicks move 369 -> 341)",
    )
    p.add_argument(
        "--kick-frac",
        type=float,
        default=0.15,
        help="kick size as a fraction of nodes (large kicks escape "
        "the basin; 0.02 plateaus, 0.15-0.3 works)",
    )


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="eig_kl_tpu", description="TPU-native EIG+KL hypergraph partitioner"
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p_eig = sub.add_parser("eig", help="spectral (Fiedler) partition, writes pre_saved_EIG/")
    p_eig.add_argument("input")
    _add_platform(p_eig)
    p_eig.add_argument(
        "--solver", choices=["lanczos", "power", "lobpcg"], default="lanczos"
    )
    prec = p_eig.add_mutually_exclusive_group()
    prec.add_argument(
        "--f32",
        action="store_true",
        help="force float32 on-device + f64 host refinement",
    )
    prec.add_argument(
        "--f64",
        action="store_true",
        help="force a pure float64 device solve (software-emulated and "
        "slow on TPU; the default there is f32 + f64 host refinement, "
        "which meets the same 1e-6 bar)",
    )
    p_eig.add_argument("--tol", type=float, default=1e-6)

    p_kl = sub.add_parser("kl", help="KL refinement (random or -EIG init)")
    _add_common(p_kl)
    p_kl.add_argument(
        "--gain-eps",
        type=float,
        default=0.0,
        help="non-improving threshold (0.0 = cKL, 1e-6 = gKL)",
    )
    p_kl.add_argument(
        "--starts",
        type=int,
        default=1,
        help="multi-start: run N refinements data-parallel across "
        "devices, keep the best.  Random inits, or with -EIG, "
        "perturbed spectral inits (start 0 unperturbed)",
    )
    p_kl.add_argument(
        "--perturb",
        type=float,
        default=0.05,
        help="with -EIG --starts: fraction of nodes pair-swapped to "
        "jitter each start's spectral init",
    )
    p_kl.add_argument(
        "--sharded",
        action="store_true",
        help="shard the node axis across all devices (mp mesh)",
    )
    p_kl.add_argument(
        "--table",
        action="store_true",
        help="print the per-swap iteration table (cKL.cpp:323-330)",
    )
    p_kl.add_argument(
        "--shuffled-ties",
        action="store_true",
        help="random init only: break equal-gain ties in the "
        "reference's randomized scan order (cKL.cpp:175-193) instead "
        "of by node index",
    )

    p_fused = sub.add_parser(
        "fused", help="in-process power-iteration EIG + KL (gKL2 pipeline)"
    )
    _add_common(p_fused)
    p_fused.add_argument(
        "--starts",
        type=int,
        default=1,
        help="spectral-seeded multi-start: one spectral solve, N "
        "perturbed-init refinements in one batched launch, best kept "
        "(random inits without -EIG)",
    )
    p_fused.add_argument(
        "--perturb",
        type=float,
        default=0.05,
        help="with -EIG --starts: fraction of nodes pair-swapped to "
        "jitter each start's spectral init",
    )
    p_fused.add_argument(
        "--solver",
        choices=["auto", "power", "lanczos", "lobpcg"],
        default="auto",
        help="in-process eigensolver. 'power' is the gKL2-parity "
        "solver (shift-inverted iteration, gKL2.cu:65-89); 'lanczos' "
        "matches the cEIG/Spectra init instead — it wins on tiny "
        "circuits (fract: 21.50 vs power's 29.17, PARITY.md). "
        "'auto' (default) picks lanczos at <=256 nodes, power above "
        "(measured crossover, benchmarks/diag_solver_sweep.py)",
    )
    p_fused.add_argument(
        "--power-iters",
        type=int,
        default=None,
        help="cap the power-iteration budget (reference cap 1000, "
        "gKL2.cu:26).  Measured on the reference circuits: the sign "
        "exit fires at 126-401 iterations, and EARLIER-stopped "
        "iterates refine as well or better (see NOTES.md), so a "
        "100-300 cap is a free speed lever",
    )

    p_gen = sub.add_parser("generate", help="synthetic circuit generator")
    p_gen.add_argument("size", type=float, help="size multiplier (1.0 = 201,920 nodes)")
    p_gen.add_argument("--output", "-o", default="generated_circuit.hgr")
    p_gen.add_argument("--seed", type=int, default=None)

    sub.add_parser("info", help="print accelerator devices (printGPUInfo analog)")
    return ap


def cmd_eig(args) -> int:
    import jax
    import jax.numpy as jnp

    from eig_kl_tpu.io.eigfile import eig_out_path, write_eig_file
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.models.pipelines import spectral_partition
    from eig_kl_tpu.utils.config import SpectralConfig

    # Precision default: pure f64 off-TPU (native there), f32 device
    # solve + f64 host refinement on TPU, where x64 is software-emulated
    # and ~20x slower; both meet the 1e-6 golden-parity bar.
    if args.f32:
        use_f64 = False
    elif args.f64:
        use_f64 = True
    else:
        use_f64 = jax.default_backend() != "tpu"
    dtype = jnp.float64 if use_f64 else jnp.float32
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    t0 = time.perf_counter()
    hg = read_hgr(args.input)
    print(f"Problem size: {hg.num_nets} nets, {hg.num_nodes} nodes, {hg.num_pins} pins")
    run = spectral_partition(
        hg, SpectralConfig(solver=args.solver, tolerance=args.tol), dtype=dtype
    )
    os.makedirs("pre_saved_EIG", exist_ok=True)
    os.makedirs("results", exist_ok=True)
    out = eig_out_path(args.input)
    write_eig_file(out, run.eig)
    left, right = run.eig.balance()
    print(f"lambda_2 = {run.eig.eigenvalue:.12g}")
    print(f"median   = {run.eig.median:.12g}")
    print(f"balance  = {left} / {right}")
    print(f"Execution time: {time.perf_counter() - t0:.3f} seconds")
    print(f"Results written to: {out}")
    return 0


def _numpy_path_eligible(args, fused: bool) -> bool:
    """Can this invocation run on the jax-free NumPy engine?

    Everything the plain ``kl`` subcommand supports qualifies (random /
    -EIG / shuffled-ties init, passes, kicks, sequential multi-start);
    ``fused`` (needs the spectral solver) and ``--sharded`` (needs a
    device mesh) do not.
    """
    if fused or getattr(args, "sharded", False):
        return False
    if os.environ.get("EIG_KL_TPU_CPU_ENGINE", "").lower() == "xla":
        return False
    return True


def _run_kl_numpy(args) -> int:
    """The zero-compile CPU path: no jax import anywhere.

    The reference binary starts computing the moment it launches
    (cKL.cpp:424-468); this path is how we match that — plain NumPy,
    no backend probe, no compile.  Invoked for cpu-routed ``kl`` runs
    (bin/eigkl additionally skips the axon sitecustomize jax boot by
    running under ``python -S``).
    """
    import numpy as np

    from eig_kl_tpu.io.eigfile import eig_out_path
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.models.np_pipeline import kl_partition_np
    from eig_kl_tpu.utils.config import KLConfig
    from eig_kl_tpu.utils import logging as rlog

    t0 = time.perf_counter()
    hg = read_hgr(args.input)
    print(f"Circuit: {hg.num_nets} nets, {hg.num_nodes} nodes, {hg.num_pins} pins")
    kl_config = KLConfig(
        gain_eps=getattr(args, "gain_eps", 0.0),
        passes=getattr(args, "passes", 1),
        kicks=getattr(args, "kicks", 0),
        kick_frac=getattr(args, "kick_frac", 0.15),
    )
    run = kl_partition_np(
        hg,
        init=eig_out_path(args.input) if args.eig_init else None,
        kl_config=kl_config,
        seed=args.seed,
        dtype=np.float64 if args.f64 else np.float32,
        shuffled_ties=getattr(args, "shuffled_ties", False),
        starts=getattr(args, "starts", 1),
        perturb=getattr(args, "perturb", 0.05),
    )
    runtime = time.perf_counter() - t0
    out = rlog.kl_results_path(args.input, args.eig_init)
    rlog.write_kl_trajectory(out, run.kl)
    if run.start_cuts is not None:
        print(
            "Multi-start best cuts: "
            f"{np.sort(np.asarray(run.start_cuts))[:8].round(2).tolist()} ..."
        )
    if run.nnz is not None:
        print(rlog.format_matrix_stats(hg.num_nodes, run.nnz))
    if getattr(args, "table", False):
        print(
            rlog.format_iteration_table(
                run.kl, kl_seconds=run.timings.get("kl.refine")
            )
        )
    print(rlog.format_final_results(run.kl, runtime))
    for name, secs in sorted(run.timings.items()):
        print(f"  [{name}] {secs:.3f}s")
    print("Engine: numpy (zero-compile CPU path)")
    print(f"Trajectory written to: {out}")
    return 0


def _run_kl(args, fused: bool) -> int:
    import numpy as np
    import jax.numpy as jnp

    from eig_kl_tpu.io.eigfile import eig_out_path
    from eig_kl_tpu.io.hgr import read_hgr
    from eig_kl_tpu.models.pipelines import fused_partition, kl_partition
    from eig_kl_tpu.utils.config import KLConfig, SpectralConfig
    from eig_kl_tpu.utils import logging as rlog
    from eig_kl_tpu.utils.tracing import maybe_profile

    dtype = jnp.float64 if args.f64 else jnp.float32
    if args.f64:
        import jax

        jax.config.update("jax_enable_x64", True)
    t0 = time.perf_counter()
    hg = read_hgr(args.input)
    print(f"Circuit: {hg.num_nets} nets, {hg.num_nodes} nodes, {hg.num_pins} pins")
    gain_eps = getattr(args, "gain_eps", 1e-6)
    kl_config = KLConfig(
        gain_eps=gain_eps,
        passes=getattr(args, "passes", 1),
        kicks=getattr(args, "kicks", 0),
        kick_frac=getattr(args, "kick_frac", 0.15),
    )
    profile_ctx = maybe_profile()
    profile_ctx.__enter__()
    if fused:
        spec_kwargs = {}
        if getattr(args, "power_iters", None) is not None:
            spec_kwargs["max_iterations"] = args.power_iters
        run = fused_partition(
            hg,
            use_eig=args.eig_init,
            spectral_config=SpectralConfig(
                solver=getattr(args, "solver", "power"), **spec_kwargs
            ),
            kl_config=kl_config,
            seed=args.seed,
            dtype=dtype,
            starts=getattr(args, "starts", 1),
            perturb=getattr(args, "perturb", 0.05),
        )
    elif getattr(args, "starts", 1) > 1:
        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.models.pipelines import PartitionRun
        from eig_kl_tpu.parallel import make_mesh, multi_start_refine

        import jax

        on_tpu = jax.default_backend() == "tpu"
        g_host = clique_expand(hg, "kl")
        g = g_host.to_device(dtype=dtype, with_plan=on_tpu)
        n_dev = len(jax.devices())
        init_sides = None
        if args.eig_init:
            # Spectral-seeded multi-start: start 0 is the -EIG init,
            # the rest are balanced jitters of it (kl.init.perturb_split).
            from eig_kl_tpu.kl.init import perturb_split, split_from_eig

            base_sides = split_from_eig(eig_out_path(args.input))
            init_sides = np.stack(
                [base_sides]
                + [
                    perturb_split(base_sides, args.seed + 1 + i, args.perturb)
                    for i in range(args.starts - 1)
                ]
            )
        if on_tpu and jnp.dtype(dtype) == jnp.float32:
            if n_dev > 1 and args.starts % n_dev == 0:
                # Pod path: start axis dp-sharded, one batched Pallas
                # launch per chip.
                from eig_kl_tpu.parallel.multi_start import (
                    multi_start_refine_mega_sharded,
                )

                best, cuts = multi_start_refine_mega_sharded(
                    g_host,
                    args.starts,
                    mesh=make_mesh(dp=n_dev),
                    config=kl_config,
                    base_seed=args.seed,
                    device_graph=g,
                    init_sides=init_sides,
                )
            else:
                from eig_kl_tpu.parallel.multi_start import (
                    multi_start_refine_mega,
                )

                best, cuts = multi_start_refine_mega(
                    g_host,
                    args.starts,
                    config=kl_config,
                    base_seed=args.seed,
                    device_graph=g,
                    init_sides=init_sides,
                )
        else:
            dp = n_dev
            mesh = make_mesh(dp=dp) if args.starts % dp == 0 and dp > 1 else None
            best, cuts = multi_start_refine(
                g,
                args.starts,
                config=kl_config,
                mesh=mesh,
                base_seed=args.seed,
                init_sides=init_sides,
            )
        print(f"Multi-start best cuts: {np.sort(cuts)[:8].round(2).tolist()} ...")
        if kl_config.kicks > 0:
            from eig_kl_tpu.kl.multipass import refine_ils
            from eig_kl_tpu.models.pipelines import refine_backend

            best = refine_ils(
                refine_backend(g_host, g, kl_config, dtype),
                best.best_sides,
                kl_config,
                kicks=kl_config.kicks,
                kick_frac=kl_config.kick_frac,
                seed=args.seed,
                incumbent=best,
            )
        run = PartitionRun(
            circuit=hg.name, eig=None, kl=best, timings={}, nnz=g_host.nnz
        )
    elif getattr(args, "sharded", False):
        from eig_kl_tpu.graph.expand import clique_expand
        from eig_kl_tpu.kl.init import (
            random_split,
            reference_shuffle_init,
            split_from_eig,
        )
        from eig_kl_tpu.models.pipelines import PartitionRun
        from eig_kl_tpu.parallel import make_mesh
        from eig_kl_tpu.parallel.sharded_kl2 import sharded_refine_oc

        g_host = clique_expand(hg, "kl")
        perm = None
        if args.eig_init:
            sides = split_from_eig(eig_out_path(args.input))
        elif getattr(args, "shuffled_ties", False):
            g_host, sides, perm = reference_shuffle_init(g_host, args.seed)
        else:
            sides = random_split(hg.num_nodes, args.seed)
        from eig_kl_tpu.kl.multipass import refine_ils, refine_multipass

        mesh = make_mesh()
        sharded_backend = lambda s: sharded_refine_oc(  # noqa: E731
            g_host, s, mesh, config=kl_config, dtype=dtype
        )
        if kl_config.kicks > 0:
            res = refine_ils(
                sharded_backend,
                sides,
                kl_config,
                kicks=kl_config.kicks,
                kick_frac=kl_config.kick_frac,
                seed=args.seed,
            )
        else:
            res = refine_multipass(sharded_backend, sides, kl_config)
        if perm is not None:
            import dataclasses

            mapped = np.empty(len(perm), dtype=np.int8)
            mapped[perm] = np.asarray(res.sides)
            mapped_best = np.empty(len(perm), dtype=np.int8)
            mapped_best[perm] = np.asarray(res.best_sides)
            res = dataclasses.replace(
                res, sides=mapped, best_sides=mapped_best
            )
        run = PartitionRun(
            circuit=hg.name, eig=None, kl=res, timings={}, nnz=g_host.nnz
        )
    else:
        init = eig_out_path(args.input) if args.eig_init else None
        run = kl_partition(
            hg,
            init=init,
            kl_config=kl_config,
            seed=args.seed,
            dtype=dtype,
            shuffled_ties=getattr(args, "shuffled_ties", False),
        )
    profile_ctx.__exit__(None, None, None)
    runtime = time.perf_counter() - t0
    out = rlog.kl_results_path(args.input, args.eig_init)
    rlog.write_kl_trajectory(out, run.kl)
    if run.nnz is not None:
        # Matrix-statistics block, printed on every run like the
        # reference (cKL.cpp:134-146).
        print(rlog.format_matrix_stats(hg.num_nodes, run.nnz))
    if getattr(args, "table", False):
        print(
            rlog.format_iteration_table(
                run.kl, kl_seconds=run.timings.get("kl.refine")
            )
        )
    print(rlog.format_final_results(run.kl, runtime))
    for name, secs in sorted(run.timings.items()):
        print(f"  [{name}] {secs:.3f}s")
    print(f"Trajectory written to: {out}")
    return 0


def cmd_generate(args) -> int:
    from eig_kl_tpu.models.generator import CircuitGenerator

    hg = CircuitGenerator(args.size, args.seed).write(args.output)
    print(f"Generated circuit written to: {args.output}")
    print(
        f"Circuit size: {args.size}x reference "
        f"({hg.num_nets} nets, {hg.num_nodes} nodes, {hg.num_pins} pins)"
    )
    return 0


def cmd_info() -> int:
    import jax

    print("================= Device Info ===================")
    for i, d in enumerate(jax.devices()):
        print(f"Device {i}: {d.device_kind} ({d.platform})")
        print(f"  id={d.id} process={d.process_index}")
    return 0


def _reexec_with_site(raw_argv: list[str]) -> None:
    """Replace this ``python -S`` process with a full-site interpreter.

    bin/eigkl starts without site processing (skipping the ~9 s axon
    sitecustomize jax boot) on the bet that the run routes to CPU; when
    it routes to TPU instead, the TPU plugin is required and only
    sitecustomize registers it — so exec the normal interpreter, which
    pays the boot the TPU run needed anyway.
    """
    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = dict(os.environ)
    parts = [repo] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    env["PYTHONPATH"] = ":".join(parts)
    os.execve(
        sys.executable,
        [sys.executable, "-m", "eig_kl_tpu"] + raw_argv,
        env,
    )


def main(argv: list[str] | None = None) -> int:
    raw_argv = list(argv) if argv is not None else sys.argv[1:]
    args = build_parser().parse_args(raw_argv)

    route = None
    if getattr(args, "platform", None):
        # Must run before any JAX device use (enable_persistent_cache
        # initializes the backend to decide whether to cache).
        from eig_kl_tpu.io.hgr import peek_hgr_header
        from eig_kl_tpu.utils.jaxcache import route_platform

        try:
            _, num_nodes = peek_hgr_header(args.input)
        except (OSError, ValueError, IndexError):
            num_nodes = None  # read_hgr will surface the real error
        route = route_platform(args.platform, num_nodes)
        if route.startswith("cpu"):
            print(f"Platform: cpu ({route})")
    on_cpu = route in ("cpu-requested", "cpu-auto")
    if sys.flags.no_site and args.command in ("eig", "kl", "fused", "info") and not on_cpu:
        _reexec_with_site(raw_argv)  # does not return

    try:
        if args.command == "kl" and on_cpu and _numpy_path_eligible(args, False):
            # Zero-compile NumPy path: returns without ever importing
            # jax (matches the reference's instant start, cKL.cpp:424).
            return _run_kl_numpy(args)
    except FileNotFoundError as e:
        print(f"Error: file not found: {e.filename}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1

    from eig_kl_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    try:
        if args.command == "eig":
            return cmd_eig(args)
        if args.command == "kl":
            return _run_kl(args, fused=False)
        if args.command == "fused":
            return _run_kl(args, fused=True)
        if args.command == "generate":
            return cmd_generate(args)
        if args.command == "info":
            return cmd_info()
    except FileNotFoundError as e:
        # Fail-fast with a clean message, like the reference's
        # try/catch->exit mains (cKL.cpp:459-464, cEIG.cpp:231-234).
        print(f"Error: file not found: {e.filename}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    return 1


if __name__ == "__main__":
    sys.exit(main())

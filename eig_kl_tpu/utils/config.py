"""Configuration for the two algorithm phases.

All of the reference's hard-coded constants are surfaced here with their
origins:

* terminate limit ``log2(n) + 5`` (cKL.cpp:303, gKL.cu:443)
* gain epsilon: cKL stops counting on ``gain <= 0`` (cKL.cpp:382), the
  GPU versions on ``gain <= 1e-6`` (gKL.cu:26,495)
* power iteration: max 1000 iterations, convergence ``|delta norm| <
  1e-6`` only after iteration 100, shift 2.0, seed 42
  (gKL2.cu:26-27,322,335,370-377)
* Lanczos/Spectra: nev=2, ncv=min(100, n/2) (cEIG.cpp:195)
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class KLConfig:
    """KL refinement options.

    Attributes:
      gain_eps: swaps with gain <= gain_eps count toward termination
        (0.0 matches cKL.cpp:382; 1e-6 matches gKL.cu:495).
      terminate_extra: terminate after ``floor(log2(n)) + terminate_extra``
        consecutive non-improving swaps (5 in the reference).
      max_iterations: hard cap on swaps; None = min side size (the
        natural KL exhaustion point).
      refresh_interval: if > 0, recompute the cached ``A @ s`` and the
        incremental cut from scratch every this many swaps (a stronger
        form of the disabled verifyAndCorrectCutSize at
        gKL.cu:368-382).  0 = off.  Supported by both engines (the
        Pallas engine re-enters the kernel at each refresh point).
      use_pallas: engine selection for :func:`models.pipelines` --
        True = single-kernel Pallas engine (megakernel), False = XLA
        while_loop engine, None = auto (Pallas on TPU).
      passes: number of KL passes.  Each pass after the first restarts
        from the best partition seen so far with every node unlocked
        (classic multi-pass KL).  The reference runs exactly ONE pass
        and only *tracks* the minimum cut without rolling back to it
        (cKL.cpp:363, gKL.cu:484); 1 therefore matches reference
        semantics.  0 = keep running passes until one fails to improve
        the best cut (capped at :data:`eig_kl_tpu.kl.multipass.AUTO_PASS_CAP`).
        Passes converge in ~3-7 on the reference circuits and improve
        random-init cuts dramatically (ibm01 N=30 mean 3332 -> 1646).
      kicks: iterated-local-search rounds after the (multi-pass)
        descent: perturb the best partition by ``kick_frac`` balanced
        pair swaps (:func:`eig_kl_tpu.kl.init.perturb_split`),
        re-descend, keep the global best.  0 = off.  Measured ibm01
        (power init): 20 kicks at 0.15 move the best cut 369 -> 341.
      kick_frac: kick size as a fraction of nodes.  Large kicks are
        required to escape the basin (0.02 plateaus, 0.15-0.3 works).
    """

    gain_eps: float = 0.0
    terminate_extra: int = 5
    max_iterations: int | None = None
    refresh_interval: int = 0
    use_pallas: bool | None = None
    passes: int = 1
    kicks: int = 0
    kick_frac: float = 0.15

    def terminate_limit(self, num_nodes: int) -> int:
        return int(math.log2(max(num_nodes, 2))) + self.terminate_extra


@dataclasses.dataclass(frozen=True)
class SpectralConfig:
    """Spectral (Fiedler) phase options.

    Attributes:
      solver: "lanczos" (cEIG-flavor, Spectra-equivalent),
        "power" (gKL2-flavor shift-inverted power iteration),
        "lobpcg" (jax.experimental LOBPCG on the spectrum-flipped
        operator), or "auto" (lanczos when the circuit has at most
        ``auto_lanczos_max_nodes`` nodes, power otherwise — measured:
        the power init refines 25-37% BELOW the reference flow on
        every real circuit, but on the 149-node fract the Lanczos
        init is the one that ties the reference's 21.50, PARITY.md).
        Resolve with :func:`resolve_solver` before dispatching.
        The 256 threshold comes from the round-4 crossover sweep
        (benchmarks/diag_solver_sweep.py, downstream single-shot cut
        for both inits): lanczos wins only on fract (n=149, +10.4);
        power is already better at n≈504 (-5.2 mean over 5 generated
        circuits), n≈2019 (-18.5), n≈8076 (-200.9), and on every
        real circuit (ibm01 -127.5, industry2 -198.5, ibm10 -1228.7).
      num_lanczos: Krylov subspace size, min(100, n//2) if None
        (cEIG.cpp:195's ncv).
      max_iterations: power-iteration cap (gKL2.cu:26) / Lanczos restarts.
      tolerance: convergence tolerance (power: delta-norm 1e-6,
        gKL2.cu:27; lanczos: residual on lambda_2).
      min_power_iters: power iteration only tests convergence after this
        many steps (gKL2.cu:377).
      shift: power-iteration spectral shift (gKL2.cu:335).
      seed: RNG seed for the initial vector (srand(42), gKL2.cu:322).
      convergence: power-iteration exit rule.  "gkl2" = the reference's
        ``|delta norm| < tolerance`` (gKL2.cu:370-377) -- in f32 this is
        below the resolution of a unit-norm vector's norm and never
        fires, so all ``max_iterations`` steps run.  "sign" = stop when
        the median-split sign pattern (the quantity the partition
        actually consumes, gKL2.cu:391-414) is unchanged across
        ``stable_checks`` consecutive checks ``check_interval`` steps
        apart.  "momentum" = Chebyshev/Polyak-accelerated iteration on
        the symmetrized LAZY walk (I + D^-1/2 A D^-1/2)/2 with an
        adaptive ellipse edge; it reaches the genuinely-converged
        dominant deflated mode several times faster, but note the
        measured quality caveat: the *early-stopped* iterate the
        reference pipeline effectively uses often median-splits to a
        BETTER initial cut than the true converged mode (ibm01: 431
        early vs 740-778 converged), so "sign" remains the default
        quality-parity choice.  "auto" (default) = "sign" for f32,
        "gkl2" for f64.
      check_interval: power steps between sign-stability checks.
      stable_checks: consecutive unchanged checks required to stop.
      inter_dtype: dtype of the SpMV's streamed intermediates in the
        f32 power loop ("float32" or "bfloat16").  bf16 halves the
        matvec's HBM traffic through the v2 (bucket-transpose) plan;
        the accumulation and the iterate itself stay f32, and the
        matrix WEIGHTS always stream f32 unless EIG_KL_TPU_BF16_W=1
        opts in (weight rounding measurably hurts cut quality —
        round-5 bisect: gen1.0x seed-42 best cut 39.2k f32-weights vs
        41.9k bf16-weights, see ops/spmv_pallas._bf16_w_enabled).
        The bf16-INTERMEDIATES default is justified by a cut-quality
        A/B (benchmarks/diag_bf16_ab.py, N=5 spectral seeds, TPU,
        2026-08-20; table in PARITY.md "Matvec precision A/B"): final
        cut bf16i beats all-f32 on ALL five paired seeds at gen1.0x
        (38975+-244 vs 39737+-292) and ties it exactly on ibm10
        (3116+-1049 vs 3124+-1042); bf16 weights is the only cell
        that regresses (40258+-1370 at gen1.0x).  The reference's
        all-f32 matvec (gKL2.cu:65-89) is the precision baseline.
        Only consulted by the power solver on the padded fast path.
        Plans whose pass-1 groups aren't 16-row aligned silently fall
        back to f32 (ops/spmv_pallas.py, spmv_pallas_2d).
      host_refine: polish the device Ritz pair with a ~25-step f64
        host Lanczos (:mod:`eig_kl_tpu.spectral.refine`), reaching the
        1e-6 golden-parity bar from an f32 on-chip solve.  None = auto
        (on for f32 lanczos/lobpcg runs, off otherwise).
    """

    solver: str = "lanczos"
    num_lanczos: int | None = None
    max_iterations: int = 1000
    tolerance: float = 1e-6
    min_power_iters: int = 100
    shift: float = 2.0
    seed: int = 42
    convergence: str = "auto"
    check_interval: int = 25
    stable_checks: int = 2
    inter_dtype: str = "bfloat16"
    host_refine: bool | None = None
    auto_lanczos_max_nodes: int = 256


def resolve_solver(config: SpectralConfig, num_nodes: int) -> SpectralConfig:
    """Resolve ``solver="auto"`` to a concrete solver for this circuit.

    Tiny circuits get the Lanczos (cEIG-flavor) init — it is cheap at
    that scale and measurably the better downstream init there (fract:
    21.50 vs the power init's 29.17, PARITY.md); everything else gets
    the power solver, whose init refines 25-37% below the reference
    flow on the real circuits.  No-op for concrete solvers.
    """
    if config.solver != "auto":
        return config
    solver = (
        "lanczos" if num_nodes <= config.auto_lanczos_max_nodes else "power"
    )
    return dataclasses.replace(config, solver=solver)

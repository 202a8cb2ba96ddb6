"""Persistent XLA compilation cache.

The reference binaries pay their (C++) compile cost once, at build time;
a JAX process pays it at *run* time, every process, unless the
persistent compilation cache is on.  Measured on the round-2 bench
(201,920 nodes): ~80 s of warm-up compiles per fresh process, none of
which survived process exit.  Enabling the cache makes process #2+ load
each executable from disk instead of recompiling, which is the
difference between "fast benchmark" and "fast tool" for one-shot CLI
use (the reference's cKL.cpp:424-468 starts computing immediately).

Called from every entry point (CLI, bench.py, __graft_entry__) before
the first compilation.  Safe to call multiple times.

Environment knobs:
  EIG_KL_TPU_NO_COMPILE_CACHE=1  disable entirely
  EIG_KL_TPU_CACHE_DIR=PATH      cache location (default
                                 ~/.cache/eig_kl_tpu/jax_cache)
"""

from __future__ import annotations

import os

_enabled = False
_probed: str | None = None
_routed: str | None = None


def route_platform(requested: str, num_nodes: int | None = None) -> str:
    """Choose the JAX platform for this process BEFORE backend init.

    The reference binary starts computing instantly (cKL.cpp:424-468);
    a TPU process pays a remote-compile round trip at first execution
    that the persistent cache cannot hide (measured round 3: fract -EIG
    cold 162.7 s on TPU vs 2.56 s on the local CPU engine, identical
    21.50 cut).  For small circuits, compile time dwarfs compute, so
    ``auto`` routes them to the in-process CPU backend via the config
    API (the env-var route is intercepted by the axon plugin — see
    tests/conftest.py:23).

    Args:
      requested: "auto" | "cpu" | "tpu".
      num_nodes: circuit node count (header peek) — used by "auto".

    Returns the route taken: "cpu-requested", "cpu-auto", "tpu", or
    "default".  Must be called before any JAX device use; calling it
    after backend init has no effect on the backend (JAX ignores the
    config change) and the first route sticks for the process.

    Environment knobs:
      EIG_KL_TPU_AUTO_CPU_MAX_NODES  auto routes circuits with at most
                                     this many nodes to CPU (default
                                     16384; measured crossover — see
                                     benchmarks/diag_platform_crossover.py)
    """
    global _routed
    if _routed is not None:
        return _routed
    import sys

    def force_cpu() -> None:
        if "jax" in sys.modules:
            # Normal interpreter: the axon sitecustomize has already
            # imported jax (and may intercept JAX_PLATFORMS), so the
            # config API — which wins over the plugin — is required.
            import jax

            try:
                jax.config.update("jax_platforms", "cpu")
            except Exception:
                pass
        else:
            # No-site process (bin/eigkl under python -S): jax is not
            # loaded and no plugin can intercept the env route.  Avoid
            # importing jax here — the NumPy fast path never needs it
            # (importing it costs ~5.4 s).
            os.environ["JAX_PLATFORMS"] = "cpu"

    if requested == "cpu":
        force_cpu()
        _routed = "cpu-requested"
    elif requested == "auto":
        max_nodes = int(
            os.environ.get("EIG_KL_TPU_AUTO_CPU_MAX_NODES", "16384")
        )
        if num_nodes is not None and num_nodes <= max_nodes:
            force_cpu()
            _routed = "cpu-auto"
        else:
            _routed = "default"
    else:
        _routed = "tpu" if requested == "tpu" else "default"
    return _routed


def ensure_responsive_backend(timeout: float | None = None) -> str:
    """Guard against a *hanging* (not erroring) default backend.

    When the TPU plugin is registered but the device is unreachable,
    ``jax.default_backend()`` blocks indefinitely inside native code —
    no RuntimeError is raised, so the fallback in
    :func:`enable_persistent_cache` never runs and an unattended
    caller (bench.py, the driver's compile check) hangs forever.

    This probes backend initialization in a *subprocess* with a hard
    timeout; on timeout/failure it forces the current process onto CPU
    via ``jax.config`` BEFORE the backend initializes.  Must therefore
    be called before any jax device use.

    Returns the probed backend name, or ``"cpu-forced"`` /
    ``"skipped"`` / ``"env"``.

    The retries cover *hang/timeout* outages only: a probe that quickly
    SUCCEEDS returning "cpu" (e.g. the plugin silently de-registered by
    a PYTHONPATH override — a known gotcha) is accepted on the first
    attempt.  To catch that failure mode too, set
    ``EIG_KL_TPU_EXPECT_BACKEND=tpu``: a successful probe of any other
    backend then prints a loud stderr warning (it does not abort — an
    unattended bench still completes, with the honest ``"backend"``
    field recording what actually ran).

    Environment knobs:
      EIG_KL_TPU_BACKEND_PROBE=0      skip the probe entirely
      EIG_KL_TPU_PROBE_TIMEOUT=SECS   per-attempt timeout (default 120)
      EIG_KL_TPU_PROBE_ATTEMPTS=N     attempts before forcing CPU
      EIG_KL_TPU_EXPECT_BACKEND=NAME  warn if the probe succeeds on a
                                      different backend
    """
    global _probed
    if _probed is not None:
        return _probed
    if os.environ.get("EIG_KL_TPU_BACKEND_PROBE") == "0":
        return "skipped"
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # Pinned to CPU already — nothing that can hang, and nothing
        # the fallback would change.  (Any OTHER value, e.g. the axon
        # TPU plugin, must still be probed: the plugin hangs rather
        # than errors when the device is unreachable.  The probe child
        # inherits the env, so it tests exactly what this process
        # would initialize.)
        _probed = "env-cpu"
        return _probed
    if timeout is None:
        timeout = float(os.environ.get("EIG_KL_TPU_PROBE_TIMEOUT", "120"))
    import signal
    import subprocess
    import sys
    import tempfile

    import time

    attempts = max(int(os.environ.get("EIG_KL_TPU_PROBE_ATTEMPTS", "3")), 1)

    def probe_once() -> str:
        # NOT subprocess.run(capture_output=True): a hanging plugin can
        # spawn helper processes that inherit the pipe, so after the
        # timeout-kill the parent still blocks on pipe EOF.  Write
        # stdout to a file and kill the whole process group instead.
        try:
            with tempfile.TemporaryFile(mode="w+") as out_f:
                proc = subprocess.Popen(
                    [
                        sys.executable,
                        "-c",
                        "import jax; print(jax.default_backend())",
                    ],
                    stdout=out_f,
                    stderr=subprocess.DEVNULL,
                    start_new_session=True,
                )
                try:
                    rc = proc.wait(timeout=timeout)
                except subprocess.TimeoutExpired:
                    rc = -1
                    try:
                        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        proc.kill()
                    proc.wait()
                if rc == 0:
                    out_f.seek(0)
                    text = out_f.read().strip()
                    if text:
                        return text.splitlines()[-1]
        except OSError:
            pass
        return ""

    backend = ""
    for attempt in range(attempts):
        backend = probe_once()
        if backend:
            break
        if attempt + 1 < attempts:
            time.sleep(min(20.0, timeout / 4))
    if backend:
        expected = os.environ.get("EIG_KL_TPU_EXPECT_BACKEND", "").strip()
        if expected and backend != expected:
            import sys as _sys

            print(
                f"WARNING: probed JAX backend is '{backend}' but "
                f"EIG_KL_TPU_EXPECT_BACKEND={expected}; the plugin may "
                "have been dropped from sys.path (e.g. a PYTHONPATH "
                "override — append, don't replace). Proceeding on "
                f"'{backend}'.",
                file=_sys.stderr,
            )
        _probed = backend
        return _probed
    import jax

    try:
        # Wins over a registered-but-unreachable plugin as long as the
        # backend has not initialized yet (the env route can be
        # intercepted by the plugin, hence the config API).
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    _probed = "cpu-forced"
    return _probed


class CompileStats:
    """Live counters for XLA compilation activity in this process.

    The reference ships four precompiled binaries and compiles nothing
    at run time (Makefile:52-71); every distinct jitted program WE ask
    the backend for is cold-start latency — on the axon TPU plugin a
    *remote* compile per program.  Tracking the count makes program-set
    regressions mechanical (VERDICT r3 next #2): bench.py prints it on
    every run.

    Attributes:
      requests: compile-cache lookups == distinct programs the process
        asked for (fires whether the persistent cache hits or misses).
      compiles: programs actually compiled by the backend this process
        (cache misses).
      seconds: total backend-compile wall seconds (lazy remote compiles
        on the axon plugin are NOT included — those are paid at first
        execution and show up in warm-up wall time instead).
    """

    def __init__(self) -> None:
        self.requests = 0
        self.compiles = 0
        self.seconds = 0.0


def track_compiles() -> CompileStats:
    """Register jax monitoring listeners; returns the live counter.

    Call before the first compilation.  Safe to call multiple times
    (each call returns an independent counter)."""
    from jax._src import monitoring

    stats = CompileStats()

    def on_event(name: str, **kw) -> None:
        if name == "/jax/compilation_cache/compile_requests_use_cache":
            stats.requests += 1

    def on_duration(name: str, secs: float, **kw) -> None:
        if name == "/jax/core/compile/backend_compile_duration":
            stats.compiles += 1
            stats.seconds += secs

    monitoring.register_event_listener(on_event)
    monitoring.register_event_duration_secs_listener(on_duration)
    return stats


def enable_persistent_cache() -> str | None:
    """Turn on JAX's on-disk compilation cache.  Returns the cache dir
    (None if disabled via env)."""
    global _enabled
    if os.environ.get("EIG_KL_TPU_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = os.environ.get(
        "EIG_KL_TPU_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "eig_kl_tpu", "jax_cache"
        ),
    )
    if _enabled:
        return cache_dir
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        # The default backend cannot initialize — e.g. a TPU plugin is
        # registered but the device is unreachable (it may also
        # intercept JAX_PLATFORMS, so the env route can't opt out).
        # Force CPU via the config API (which wins over the plugin) so
        # the caller proceeds on CPU instead of dying here; no cache in
        # that case.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        return None
    if backend != "tpu":
        # XLA:CPU persists AOT results whose machine-feature stamps
        # mismatch on reload (warning spam, documented SIGILL risk),
        # and CPU compiles here are seconds, not the TPU's ~80 s --
        # cache only where it pays.
        return None
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default 1 s floor would skip the many small
    # executables (scatter builds, reductions) that dominate cold start.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir

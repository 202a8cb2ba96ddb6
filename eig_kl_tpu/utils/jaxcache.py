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

    A transient outage (the axon service drops for a few minutes) must
    not silently demote an unattended bench run to CPU, so the probe
    retries before giving up: up to ``EIG_KL_TPU_PROBE_ATTEMPTS``
    attempts (default 3) with a short pause between.  Worst case on a
    dead backend is attempts * timeout before the CPU fallback.

    Environment knobs:
      EIG_KL_TPU_BACKEND_PROBE=0      skip the probe entirely
      EIG_KL_TPU_PROBE_TIMEOUT=SECS   per-attempt timeout (default 120)
      EIG_KL_TPU_PROBE_ATTEMPTS=N     attempts before forcing CPU
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

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

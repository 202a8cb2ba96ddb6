"""Lightweight tracing/profiling.

The reference uses manual ``chrono`` spans (cEIG.cpp:139,223-227;
cKL.cpp:335,368-378; gKL.cu:454,504-515).  Here: a span registry with
wall-clock timing that optionally nests inside a ``jax.profiler`` trace
for TPU timeline capture (set ``EIG_KL_TPU_PROFILE_DIR``).
"""

from __future__ import annotations

import contextlib
import os
import time


class Tracer:
    """Named wall-clock spans; spans of the same name accumulate."""

    def __init__(self):
        self.spans: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.spans[name] = self.spans.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{'span':<28}{'calls':>8}{'seconds':>12}"]
        for name, secs in sorted(self.spans.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<28}{self.counts[name]:>8}{secs:>12.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_profile():
    """Wrap a region in a jax.profiler trace if EIG_KL_TPU_PROFILE_DIR
    is set (TPU equivalent of the reference's GPU info / timing dumps)."""
    profile_dir = os.environ.get("EIG_KL_TPU_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

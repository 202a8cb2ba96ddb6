"""Disk cache for v2 SpMV plans, keyed by matrix content.

The bucket-transpose plan is a pure deterministic function of
(n, rows, cols, f32 weights) plus the geometry pins and the planner
code version — yet round 4 re-derived it in every process: exact-
histogram geometry search + native counting-sort scatter + spill-tail
split + host bf16 convert cost ~1.2 s at 201K nodes and grew the bench
"ell+plan+upload" phase 1.47 -> 3.66 s (VERDICT r4 weak #2).  The
reference's protocol for exactly this shape of cost is pre_saved_EIG
(cEIG.cpp:213-220 / cKL.cpp:155-174): compute once, write a checkpoint
keyed by the circuit, and every later run loads it.  This module is
that protocol for the plan: one uncompressed ``.npz`` per
(matrix content, geometry pins, planner version) under the same cache
root as the jit compile cache.

Layout: arrays under flat names (tail arrays prefixed ``t_``), static
geometry in an ``aux`` JSON string.  Writes are atomic
(tmp + ``os.replace``) so concurrent processes never read a torn file.

Env knobs:
  EIG_KL_TPU_PLAN_CACHE      cache dir; ``0`` disables entirely.
  (EIG_KL_TPU_RBLOCK/QUANTUM geometry pins participate in the key.)
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

# Bump whenever planner output bits can change (geometry search, spill
# split rules, array layouts).
_VERSION = 1


def cache_dir() -> str | None:
    env = os.environ.get("EIG_KL_TPU_PLAN_CACHE")
    if env == "0":
        return None
    if env:
        return env
    return os.path.expanduser("~/.cache/eig_kl_tpu/plans")


def graph_key(graph) -> str:
    """Content hash of the matrix the plan encodes.

    Hashes the CSR triplet directly (degrees + indices + f32 data)
    rather than the expanded COO rows — same information, no O(nnz)
    int64 materialization on the hit path."""
    h = hashlib.blake2b(digest_size=20)
    pins = (
        os.environ.get("EIG_KL_TPU_RBLOCK", ""),
        os.environ.get("EIG_KL_TPU_QUANTUM", ""),
    )
    h.update(json.dumps([_VERSION, graph.num_nodes, pins]).encode())
    h.update(np.ascontiguousarray(graph.degrees).tobytes())
    h.update(np.ascontiguousarray(graph.indices).tobytes())
    h.update(np.ascontiguousarray(graph.data.astype(np.float32)).tobytes())
    return h.hexdigest()


_ELL_CACHE_MAX = int(
    os.environ.get("EIG_KL_TPU_ELL_CACHE_MAX", str(512 << 20))
)


def ell_path(key: str, pad_multiple: int, dtype) -> str | None:
    root = cache_dir()
    if root is None:
        return None
    return os.path.join(
        root, f"{key}.ell{pad_multiple}.{np.dtype(dtype).name}.npz"
    )


def load_ell(key: str, pad_multiple: int, dtype):
    """Cached padded-ELL pair (host arrays), or None."""
    path = ell_path(key, pad_multiple, dtype)
    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return z["ell_idx"], z["ell_w"]
    except (OSError, KeyError, ValueError):
        return None


def save_ell(key: str, pad_multiple: int, dtype, ell_idx, ell_w) -> None:
    """Persist the padded ELL (skipped above _ELL_CACHE_MAX bytes —
    at multi-million-node scale re-deriving beats a giant cache file)."""
    path = ell_path(key, pad_multiple, dtype)
    if path is None or ell_idx.nbytes + ell_w.nbytes > _ELL_CACHE_MAX:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, ell_idx=ell_idx, ell_w=ell_w)
        os.replace(tmp, path)
    except Exception:
        # Cache writes are an accelerator, never a dependency: swallow
        # anything (disk errors, but also device-side failures if the
        # caller handed us device arrays under HBM pressure).
        pass


def _tail_to_host(tail):
    from eig_kl_tpu.ops.spmv_pallas import CooTail, SpmvPlan

    if tail is None:
        return None, {}
    if isinstance(tail, CooTail):
        return "coo", {
            "t_rows": np.asarray(tail.rows),
            "t_cols": np.asarray(tail.cols),
            "t_w": np.asarray(tail.w),
            "_aux": {"offsets": list(tail.offsets)},
        }
    assert isinstance(tail, SpmvPlan)
    return "v1", {
        "t_cw8": np.asarray(tail.cw8),
        "t_rw8": np.asarray(tail.rw8),
        "t_col_local": np.asarray(tail.col_local),
        "t_row_local": np.asarray(tail.row_local),
        "t_weights": np.asarray(tail.weights),
        "t_route_src": np.asarray(tail.route_src),
        "_aux": {"padded_nodes": tail.padded_nodes},
    }


def _tail_from_host(kind, z, aux):
    import jax.numpy as jnp

    from eig_kl_tpu.ops.spmv_pallas import CooTail, SpmvPlan

    if kind is None:
        return None
    if kind == "coo":
        return CooTail(
            rows=jnp.asarray(z["t_rows"]),
            cols=jnp.asarray(z["t_cols"]),
            w=jnp.asarray(z["t_w"]),
            offsets=tuple(aux["offsets"]),
        )
    return SpmvPlan(
        cw8=jnp.asarray(z["t_cw8"]),
        rw8=jnp.asarray(z["t_rw8"]),
        col_local=jnp.asarray(z["t_col_local"]),
        row_local=jnp.asarray(z["t_row_local"]),
        weights=jnp.asarray(z["t_weights"]),
        route_src=jnp.asarray(z["t_route_src"]),
        padded_nodes=aux["padded_nodes"],
    )


def save_v2(key: str, plan) -> None:
    """Persist a built v2 plan.  Fetches the arrays host-side (a few
    tens of MB, once per circuit ever) and writes atomically.  Any
    failure is non-fatal: the cache is an accelerator, not a
    dependency."""
    root = cache_dir()
    if root is None:
        return
    try:
        os.makedirs(root, exist_ok=True)
        tail_kind, tail_arrays = _tail_to_host(plan.tail)
        tail_aux = tail_arrays.pop("_aux", {})
        aux = {
            "tail": tail_kind,
            "tail_aux": tail_aux,
            "padded_nodes": plan.padded_nodes,
            "n_cb": plan.n_cb,
            "n_rbp": plan.n_rbp,
            "quantum": plan.quantum,
            "g1": plan.g1,
            "g2": plan.g2,
            "rblock": plan.rblock,
        }
        path = os.path.join(root, key + ".npz")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                aux=np.frombuffer(json.dumps(aux).encode(), np.uint8),
                col_local=np.asarray(plan.col_local),
                weights=np.asarray(plan.weights),
                rl_t=np.asarray(plan.rl_t),
                rb_of=np.asarray(plan.rb_of),
                **tail_arrays,
            )
        os.replace(tmp, path)
    except Exception:
        # Non-fatal by contract (see docstring).  The host fetch of
        # plan arrays can raise JAX runtime errors (e.g. a deferred
        # RESOURCE_EXHAUSTED surfacing at transfer time) — a failed
        # cache write must not kill a run the compute side of which
        # may still succeed.  Observed: diag_vmem_ceiling probe at
        # 2,019,200 nodes, 2026-08-20.
        pass


def load_v2(key: str):
    """Load a cached v2 plan (device-uploaded), or None on miss."""
    root = cache_dir()
    if root is None:
        return None
    path = os.path.join(root, key + ".npz")
    if not os.path.exists(path):
        return None
    import jax

    from eig_kl_tpu.ops.spmv_pallas import (
        SpmvPlanV2,
        _bf16_w_enabled,
        _host_bf16,
    )

    try:
        with np.load(path) as z:
            aux = json.loads(bytes(z["aux"]).decode())
            # ONE batched device_put for every array: on the axon
            # plugin each individual host->device transfer pays ~1.5 s
            # of tunnel round-trip latency regardless of payload size.
            host = {k: z[k] for k in z.files if k != "aux"}
            if _bf16_w_enabled():
                host["weights_bf16"] = _host_bf16(host["weights"])
            keys = list(host)
            dev = dict(
                zip(keys, jax.device_put(tuple(host[k] for k in keys)))
            )
            return SpmvPlanV2(
                col_local=dev["col_local"],
                weights=dev["weights"],
                weights_bf16=dev.get("weights_bf16"),
                rl_t=dev["rl_t"],
                rb_of=dev["rb_of"],
                tail=_tail_from_host(aux["tail"], dev, aux["tail_aux"]),
                padded_nodes=aux["padded_nodes"],
                n_cb=aux["n_cb"],
                n_rbp=aux["n_rbp"],
                quantum=aux["quantum"],
                g1=aux["g1"],
                g2=aux["g2"],
                rblock=aux["rblock"],
            )
    except (OSError, KeyError, ValueError, json.JSONDecodeError):
        return None

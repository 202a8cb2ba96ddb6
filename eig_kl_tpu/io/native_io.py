"""ctypes bindings for the native C++ runtime (native/libeigkl.so).

Provides the fast paths for .hgr parsing and clique expansion.  The
library is built on demand with ``make -C native`` (g++); every entry
point raises ImportError/OSError when unavailable so callers fall back
to the NumPy implementations, which produce identical results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libeigkl.so")

_lib = None
_load_error: str | None = None


class _EklHgr(ctypes.Structure):
    _fields_ = [
        ("num_nets", ctypes.c_int64),
        ("num_nodes", ctypes.c_int64),
        ("num_pins", ctypes.c_int64),
        ("pins", ctypes.POINTER(ctypes.c_int32)),
        ("net_offsets", ctypes.POINTER(ctypes.c_int64)),
        ("status", ctypes.c_int32),
    ]


class _EklCsr(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("indptr", ctypes.POINTER(ctypes.c_int64)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("data", ctypes.POINTER(ctypes.c_double)),
        ("status", ctypes.c_int32),
    ]


def _build_library() -> None:
    subprocess.run(
        ["make", "-C", _NATIVE_DIR],
        check=True,
        capture_output=True,
        timeout=120,
    )


# Must match ekl_abi_version() in native/eigkl_native.cpp.  A stale
# .so with a different exported ABI (e.g. pre-q_min ekl_build_plan_v2)
# would silently misinterpret arguments; on mismatch we rebuild once
# and refuse (falling back to the Python implementations) if the
# rebuilt library still disagrees.
_ABI_VERSION = 5


def _abi_of(lib) -> int:
    try:
        fn = lib.ekl_abi_version
    except AttributeError:
        return 0  # pre-versioning library
    fn.restype = ctypes.c_int64
    fn.argtypes = []
    return int(fn())


def _load():
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        # Negative cache: don't re-run CDLL + make on every call once
        # loading has failed in this process.
        raise ImportError(_load_error)
    try:
        lib = _load_uncached()
    except ImportError as e:
        _load_error = str(e)
        raise
    _lib = lib
    return lib


def _load_uncached():
    if not os.path.exists(_LIB_PATH):
        try:
            _build_library()
        except (subprocess.SubprocessError, OSError) as e:
            raise ImportError(f"cannot build native library: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
    if _abi_of(lib) != _ABI_VERSION:
        # Stale build.  The stale image is mmap'd RIGHT NOW, and the
        # linker truncates + rewrites its output in place -- rewriting
        # a mapped inode can fault the old image's unfaulted pages.
        # Unlink first (POSIX keeps the old inode alive for the
        # existing mapping), let make create a FRESH inode, then load
        # it through a unique temp copy: glibc's dlopen dedupes by
        # pathname, so a same-path reload would return the stale
        # handle regardless of the new file.
        stale_abi = _abi_of(lib)
        try:
            os.unlink(_LIB_PATH)
            _build_library()
        except (subprocess.SubprocessError, OSError) as e:
            raise ImportError(
                f"native library ABI {stale_abi} != {_ABI_VERSION} "
                f"and rebuild failed: {e}"
            ) from e
        import shutil
        import tempfile

        fd, fresh = tempfile.mkstemp(
            suffix=".so", prefix="libeigkl_", dir=_NATIVE_DIR
        )
        os.close(fd)
        shutil.copy2(_LIB_PATH, fresh)
        lib = ctypes.CDLL(fresh)
        if _abi_of(lib) != _ABI_VERSION:
            raise ImportError(
                f"native library ABI {_abi_of(lib)} != {_ABI_VERSION} "
                "after rebuild; using Python fallbacks"
            )
    lib.ekl_read_hgr.restype = ctypes.POINTER(_EklHgr)
    lib.ekl_read_hgr.argtypes = [ctypes.c_char_p]
    lib.ekl_free_hgr.argtypes = [ctypes.POINTER(_EklHgr)]
    lib.ekl_clique_expand.restype = ctypes.POINTER(_EklCsr)
    lib.ekl_clique_expand.argtypes = [
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.ekl_free_csr.argtypes = [ctypes.POINTER(_EklCsr)]
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (ImportError, OSError):
        return False


def read_hgr_native(path: str):
    """Parse a .hgr with the native tokenizer; returns Hypergraph."""
    from eig_kl_tpu.io.hgr import Hypergraph

    lib = _load()
    h = lib.ekl_read_hgr(path.encode())
    try:
        if not h or h.contents.status != 0:
            code = h.contents.status if h else -1
            raise OSError(f"native .hgr parse failed (status {code}): {path}")
        c = h.contents
        pins = np.ctypeslib.as_array(c.pins, shape=(max(c.num_pins, 1),))[
            : c.num_pins
        ].copy()
        offs = np.ctypeslib.as_array(c.net_offsets, shape=(c.num_nets + 1,)).copy()
        return Hypergraph(
            num_nodes=int(c.num_nodes),
            num_nets=int(c.num_nets),
            pins=pins.astype(np.int32),
            net_offsets=offs.astype(np.int64),
        )
    finally:
        if h:
            lib.ekl_free_hgr(h)


def clique_expand_native(hg, weighting: str, dtype=np.float64):
    """Clique expansion via the native builder; returns Graph."""
    from eig_kl_tpu.graph.csr import Graph

    lib = _load()
    mode = 0 if weighting == "eig" else 1
    pins = np.ascontiguousarray(hg.pins, dtype=np.int32)
    offs = np.ascontiguousarray(hg.net_offsets, dtype=np.int64)
    c = lib.ekl_clique_expand(
        hg.num_nodes,
        hg.num_nets,
        pins.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mode,
    )
    try:
        if not c or c.contents.status != 0:
            raise OSError("native clique expansion failed")
        s = c.contents
        indptr = np.ctypeslib.as_array(s.indptr, shape=(s.n + 1,)).copy()
        nnz = int(s.nnz)
        indices = np.ctypeslib.as_array(s.indices, shape=(max(nnz, 1),))[:nnz].copy()
        data = np.ctypeslib.as_array(s.data, shape=(max(nnz, 1),))[:nnz].copy()
        return Graph(
            num_nodes=int(s.n),
            indptr=indptr.astype(np.int64),
            indices=indices.astype(np.int32),
            data=data.astype(dtype),
        )
    finally:
        if c:
            lib.ekl_free_csr(c)


class _EklPlanV1(ctypes.Structure):
    _fields_ = [
        ("cw8", ctypes.POINTER(ctypes.c_int32)),
        ("rw8", ctypes.POINTER(ctypes.c_int32)),
        ("col_local", ctypes.POINTER(ctypes.c_int16)),
        ("row_local", ctypes.POINTER(ctypes.c_int16)),
        ("weights", ctypes.POINTER(ctypes.c_float)),
        ("route_src", ctypes.POINTER(ctypes.c_int16)),
        ("num_chunks", ctypes.c_int64),
        ("padded_nodes", ctypes.c_int64),
        ("status", ctypes.c_int32),
    ]


class _EklPlanV2(ctypes.Structure):
    _fields_ = [
        ("col_local", ctypes.POINTER(ctypes.c_int16)),
        ("weights", ctypes.POINTER(ctypes.c_float)),
        ("rl_t", ctypes.POINTER(ctypes.c_int16)),
        ("rb_of", ctypes.POINTER(ctypes.c_int32)),
        ("s1", ctypes.c_int64),
        ("c2p", ctypes.c_int64),
        ("q", ctypes.c_int64),
        ("n_cb", ctypes.c_int64),
        ("n_rbp", ctypes.c_int64),
        ("g1", ctypes.c_int64),
        ("g2", ctypes.c_int64),
        ("padded_nodes", ctypes.c_int64),
        ("tail_nnz", ctypes.c_int64),
        ("tail_rows", ctypes.POINTER(ctypes.c_int32)),
        ("tail_cols", ctypes.POINTER(ctypes.c_int32)),
        ("tail_w", ctypes.POINTER(ctypes.c_float)),
        ("status", ctypes.c_int32),
    ]


def _load_plan_symbols(lib):
    if getattr(lib, "_plan_symbols", False):
        return
    I32P = ctypes.POINTER(ctypes.c_int32)
    F64P = ctypes.POINTER(ctypes.c_double)
    lib.ekl_build_plan_v1.restype = ctypes.POINTER(_EklPlanV1)
    lib.ekl_build_plan_v1.argtypes = [ctypes.c_int64, ctypes.c_int64, I32P, I32P, F64P]
    lib.ekl_build_plan_v2.restype = ctypes.POINTER(_EklPlanV2)
    lib.ekl_build_plan_v2.argtypes = [ctypes.c_int64, ctypes.c_int64, I32P, I32P, F64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
    lib.ekl_free_plan_v1.argtypes = [ctypes.POINTER(_EklPlanV1)]
    lib.ekl_free_plan_v2.argtypes = [ctypes.POINTER(_EklPlanV2)]
    lib._plan_symbols = True


def _coo_args(n, rows, cols, weights):
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    return (
        rows,
        cols,
        w,
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )


def build_plan_v1_native(n, rows, cols, weights) -> dict:
    """Native v1 chunk plan; returns a dict of NumPy arrays matching
    eig_kl_tpu.ops.spmv_pallas.build_plan's fill exactly."""
    lib = _load()
    _load_plan_symbols(lib)
    r, c, w, rp, cp, wp = _coo_args(n, rows, cols, weights)
    p = lib.ekl_build_plan_v1(n, len(r), rp, cp, wp)
    try:
        s = p.contents
        C = int(s.num_chunks)
        def arr(ptr, size, dt):
            return np.ctypeslib.as_array(ptr, shape=(max(size, 1),))[:size].copy()
        return dict(
            cw8=arr(s.cw8, C, np.int32),
            rw8=arr(s.rw8, C, np.int32),
            col_local=arr(s.col_local, C * 512, np.int16).reshape(C, 4, 128),
            row_local=arr(s.row_local, C * 512, np.int16).reshape(C, 4, 128),
            weights=arr(s.weights, C * 512, np.float32).reshape(C, 4, 128),
            route_src=arr(s.route_src, C * 1024, np.int16).reshape(C, 8, 128),
            padded_nodes=int(s.padded_nodes),
        )
    finally:
        if p:
            lib.ekl_free_plan_v1(p)


def build_plan_v2_native(
    n, rows, cols, weights, q_min: int = 0, rblock: int = 512,
    q_force: int = 0,
) -> dict:
    """Native v2 (bucket-transpose) plan arrays + overflow-tail COO.

    q_min: lower bound on the bucket quantum (0 = automatic); raised by
    the caller when the overflow tail is pathologically large.
    rblock: y-window rows per row-block (coarsened at scale so the
    dense bucket grid stays ~nnz-sized).
    q_force: exact bucket quantum (0 = native's lam*1.5 rule) — set by
    build_plan_v2's exact-spill geometry search; q_min still wins."""
    lib = _load()
    _load_plan_symbols(lib)
    r, c, w, rp, cp, wp = _coo_args(n, rows, cols, weights)
    p = lib.ekl_build_plan_v2(n, len(r), rp, cp, wp, q_min, rblock, q_force)
    try:
        s = p.contents
        S1, C2p = int(s.s1), int(s.c2p)
        def arr(ptr, size, dt):
            return np.ctypeslib.as_array(ptr, shape=(max(size, 1),))[:size].copy()
        tail = None
        if s.tail_nnz:
            tail = (
                arr(s.tail_rows, int(s.tail_nnz), np.int32),
                arr(s.tail_cols, int(s.tail_nnz), np.int32),
                arr(s.tail_w, int(s.tail_nnz), np.float32),
            )
        C1 = S1 // 512
        return dict(
            col_local=arr(s.col_local, S1, np.int16).reshape(C1, 4, 128),
            weights=arr(s.weights, S1, np.float32).reshape(C1, 4, 128),
            rl_t=arr(s.rl_t, C2p * 512, np.int16).reshape(C2p // 8, 8, 512),
            rb_of=arr(s.rb_of, C2p, np.int32),
            tail=tail,
            padded_nodes=int(s.padded_nodes),
            n_cb=int(s.n_cb),
            n_rbp=int(s.n_rbp),
            quantum=int(s.q),
            g1=int(s.g1),
            g2=int(s.g2),
        )
    finally:
        if p:
            lib.ekl_free_plan_v2(p)


def benes_route_native(N: int, dest: np.ndarray) -> np.ndarray:
    """Benes switch bits for out[dest[j]] = in[j]; (2*log2(N)-1, N/32)
    uint32, flat little-endian bit packing."""
    lib = _load()
    if not getattr(lib, "_benes_symbols", False):
        lib.ekl_benes_route.restype = ctypes.c_int32
        lib.ekl_benes_route.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib._benes_symbols = True
    m = N.bit_length() - 1
    assert (1 << m) == N and N >= 32
    masks = np.zeros((2 * m - 1, N // 32), np.uint32)
    d = np.ascontiguousarray(dest, dtype=np.int32)
    st = lib.ekl_benes_route(
        N,
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if st != 0:
        raise OSError(f"benes route failed (status {st})")
    return masks

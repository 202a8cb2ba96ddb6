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


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            _build_library()
        except (subprocess.SubprocessError, OSError) as e:
            raise ImportError(f"cannot build native library: {e}") from e
    lib = ctypes.CDLL(_LIB_PATH)
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
    _lib = lib
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

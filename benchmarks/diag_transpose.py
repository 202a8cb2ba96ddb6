#!/usr/bin/env python
"""Is the v2 matvec's dense bucket transpose XLA-bound?

At 1.8M nodes the (n_cb, n_rbp, Q) -> (n_rbp, n_cb*Q) bf16 transpose
moves ~102 MB and times at ~1.3 ms (78 GB/s — ~10x off HBM bandwidth).
Time the XLA form against a Pallas 128x128-tile transpose (each grid
step loads a (128, 128*Q) block, swaps the two major axes with the
Q-minor kept contiguous, and writes the transposed block).

Usage: python benchmarks/diag_transpose.py [spec ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from eig_kl_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr


def fence(y):
    return float(jnp.asarray(y).reshape(-1)[0].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_cb", "n_rbp", "Q"))
def xla_t(e1, *, n_cb, n_rbp, Q):
    return (
        e1.reshape(n_cb, n_rbp, Q).transpose(1, 0, 2).reshape(n_rbp, n_cb * Q)
    )


def _tile_kernel(x_ref, y_ref, *, Q):
    y_ref[:] = (
        x_ref[:].reshape(128, 128, Q).swapaxes(0, 1).reshape(128, 128 * Q)
    )


@functools.partial(jax.jit, static_argnames=("n_cbp", "n_rbp", "Q"))
def pallas_t(e1p, *, n_cbp, n_rbp, Q):
    # e1p: (n_cbp, n_rbp*Q), n_cbp/n_rbp multiples of 128.
    return pl.pallas_call(
        functools.partial(_tile_kernel, Q=Q),
        out_shape=jax.ShapeDtypeStruct((n_rbp, n_cbp * Q), e1p.dtype),
        grid=(n_rbp // 128, n_cbp // 128),
        in_specs=[
            pl.BlockSpec((128, 128 * Q), lambda r, c: (c, r)),
        ],
        out_specs=pl.BlockSpec((128, 128 * Q), lambda r, c: (r, c)),
        interpret=jax.default_backend() != "tpu",
    )(e1p)


def main() -> int:
    specs = sys.argv[1:] or ["9.0", "1.0"]
    print(f"backend={jax.default_backend()}")
    for spec in specs:
        path = os.path.join("/root/reference/circuit", f"{spec}.hgr")
        if not os.path.exists(path):
            path = os.path.join(HERE, "data", f"gen_{spec}_42.hgr")
        hg = read_hgr(path)
        g = clique_expand(hg, "kl")
        dg = g.to_device(with_plan=True)
        p = dg.plan
        n_cb, n_rbp, Q = p.n_cb, p.n_rbp, p.quantum
        rng = np.random.default_rng(0)
        e1 = jnp.asarray(
            rng.standard_normal(n_cb * n_rbp * Q).astype(np.float32)
        ).astype(jnp.bfloat16).reshape(n_cb, n_rbp * Q)
        n_cbp = ((n_cb + 127) // 128) * 128
        e1p = jnp.pad(e1, ((0, n_cbp - n_cb), (0, 0)))
        assert n_rbp % 128 == 0, n_rbp

        def timeit(fn, reps=30):
            fence(fn())
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn()
            fence(y)
            return (time.perf_counter() - t0) / reps

        t_x = timeit(lambda: xla_t(e1.reshape(-1), n_cb=n_cb, n_rbp=n_rbp, Q=Q))
        t_p = timeit(lambda: pallas_t(e1p, n_cbp=n_cbp, n_rbp=n_rbp, Q=Q))
        # parity
        yx = np.asarray(
            xla_t(e1.reshape(-1), n_cb=n_cb, n_rbp=n_rbp, Q=Q).astype(jnp.float32)
        )
        yp = np.asarray(
            pallas_t(e1p, n_cbp=n_cbp, n_rbp=n_rbp, Q=Q).astype(jnp.float32)
        )[:, : n_cb * Q]
        ok = np.array_equal(yx, yp)
        mb = n_cb * n_rbp * Q * 2 * 2 / 1e6
        print(
            f"{spec}: n_cb={n_cb} n_rbp={n_rbp} Q={Q} ({mb:.0f} MB moved)  "
            f"xla={t_x*1e3:.3f}ms ({mb/t_x/1e3:.0f} GB/s)  "
            f"pallas={t_p*1e3:.3f}ms ({mb/t_p/1e3:.0f} GB/s)  parity={'OK' if ok else 'FAIL'}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

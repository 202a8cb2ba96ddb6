#!/usr/bin/env python
"""Per-phase timing of the v2 matvec + loop-construct overhead, on chip.

The 1.8M matvec streams ~410 MB/call (measured plan: 25.4M slots at
2.56x nnz padding) — a ~0.5 ms bandwidth floor on v5e — yet times at
~5.6 ms.  Split the call into its three phases and time each, plus the
lax.while_loop-vs-fori_loop per-iteration overhead that is the prime
suspect for the solver's 47 ms (200K) / 400 ms (1.8M) of unexplained
wall time over its component model (VERDICT r3 weak #2).

Usage: python benchmarks/diag_matvec_phases.py [spec ...]
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

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.io.hgr import read_hgr
from eig_kl_tpu.ops import spmv_pallas as sp


def load(spec: str):
    ref = os.path.join("/root/reference/circuit", f"{spec}.hgr")
    if os.path.exists(ref):
        return read_hgr(ref), spec
    cache = os.path.join(HERE, "data", f"gen_{spec}_42.hgr")
    if not os.path.exists(cache):
        from eig_kl_tpu.io.hgr import write_hgr
        from eig_kl_tpu.models.generator import CircuitGenerator

        write_hgr(cache, CircuitGenerator(float(spec), seed=42).generate())
    return read_hgr(cache), f"gen{spec}"


def fence(y):
    return float(jnp.asarray(y).reshape(-1)[0])


def timeit(fn, *args, reps=20):
    fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / reps


INTER = jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("n_cb", "n_rbp", "quantum", "g1"))
def gather_only(col_local, weights, x2d, *, n_cb, n_rbp, quantum, g1):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C1 = col_local.shape[0]
    R = x2d.shape[0]
    rows_pc = g1 // 128
    cb_bytes = rows_pc * 128 * (2 + 4 + jnp.dtype(INTER).itemsize)
    nb1 = max(1, min(16, (4 << 20) // max(cb_bytes, 1), n_cb))
    return pl.pallas_call(
        functools.partial(sp._gather_kernel, nb=nb1),
        out_shape=jax.ShapeDtypeStruct((n_cb * rows_pc, 128), INTER),
        grid=((n_cb + nb1 - 1) // nb1,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb1 * rows_pc, 128), lambda c: (c, 0)),
            pl.BlockSpec((nb1 * rows_pc, 128), lambda c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((nb1 * rows_pc, 128), lambda c: (c, 0)),
    )(x2d, col_local.reshape(-1, 128), weights.reshape(-1, 128))


@functools.partial(
    jax.jit, static_argnames=("n_cb", "n_rbp", "quantum", "g1", "g2", "C2g")
)
def transpose_only(e1, *, n_cb, n_rbp, quantum, g1, g2, C2g):
    S1 = n_cb * g1
    Q = quantum
    CHUNK = 512
    et = (
        e1.reshape(-1)[:S1]
        .reshape(n_cb, n_rbp, Q)
        .transpose(1, 0, 2)
        .reshape(n_rbp, n_cb * Q)
    )
    et = jnp.pad(et, ((0, 0), (0, g2 - n_cb * Q)))
    C2 = n_rbp * g2 // CHUNK
    return jnp.pad(
        et.reshape(C2, CHUNK), ((0, C2g * 8 - C2), (0, 0))
    ).reshape(C2g, 8, CHUNK)


@functools.partial(jax.jit, static_argnames=("ry", "rblock"))
def reduce_only(rb_of, et, rl_t, *, ry, rblock):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C2g = rl_t.shape[0]
    impl = os.environ.get("EIG_KL_TPU_REDUCE_IMPL", "mxu")
    kern = {
        "mxu": sp._reduce_kernel_mxu,
        "mxu2": sp._reduce_kernel_mxu2,
        "mxuv": sp._reduce_kernel_mxuv,
    }[impl]
    red = functools.partial(kern, rowwise=False)
    return pl.pallas_call(
        functools.partial(red, ry=ry, rblock=rblock),
        out_shape=jax.ShapeDtypeStruct((ry, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C2g // sp.GB2,),
            in_specs=[
                pl.BlockSpec((sp.GB2, 8, 512), lambda c, *_: (c, 0, 0)),
                pl.BlockSpec((sp.GB2, 8, 512), lambda c, *_: (c, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (ry, 128), lambda c, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )(rb_of, et, rl_t)


@functools.partial(jax.jit, static_argnames=("k",))
def chain_fori(plan, x2d, k: int):
    def one(_, x):
        y = sp.spmv_pallas_2d(plan, x, inter_dtype=INTER)
        nrm = jnp.linalg.norm(y)
        return y / jnp.where(nrm > 0, nrm, 1.0)

    return jax.lax.fori_loop(0, k, one, x2d)


@jax.jit
def chain_while(plan, x2d, k):
    def cond(c):
        return c[0] < k

    def body(c):
        i, x = c
        y = sp.spmv_pallas_2d(plan, x, inter_dtype=INTER)
        nrm = jnp.linalg.norm(y)
        return (i + 1, y / jnp.where(nrm > 0, nrm, 1.0))

    return jax.lax.while_loop(cond, body, (jnp.int32(0), x2d))[1]


@jax.jit
def chain_while_nested(plan, x2d, k, inner: int = 25):
    """The solver's actual shape: while_loop whose body is a 25-step
    fori_loop (check omitted)."""

    def cond(c):
        return c[0] < k

    def body(c):
        i, x = c

        def one(_, x):
            y = sp.spmv_pallas_2d(plan, x, inter_dtype=INTER)
            nrm = jnp.linalg.norm(y)
            return y / jnp.where(nrm > 0, nrm, 1.0)

        return (i + 25, jax.lax.fori_loop(0, 25, one, x))

    return jax.lax.while_loop(cond, body, (jnp.int32(0), x2d))[1]


def main() -> int:
    specs = sys.argv[1:] or ["1.0", "9.0"]
    print(f"backend={jax.default_backend()}")
    for spec in specs:
        hg, name = load(spec)
        g = clique_expand(hg, "kl")
        dg = g.to_device(with_plan=True)
        p = dg.plan
        n = g.num_nodes
        P = p.padded_nodes
        key = jax.random.PRNGKey(0)
        x = (
            jnp.zeros(P, jnp.float32)
            .at[:n]
            .set(jax.random.uniform(key, (n,), jnp.float32) - 0.5)
            .reshape(P // 128, 128)
        )
        geom = dict(n_cb=p.n_cb, n_rbp=p.n_rbp, quantum=p.quantum, g1=p.g1)
        C2g = p.rl_t.shape[0]
        R = x.shape[0]
        ry = max(R, p.n_rbp * (p.rblock // 128))

        t_g = timeit(lambda: gather_only(p.col_local, p.weights, x, **geom))
        e1 = gather_only(p.col_local, p.weights, x, **geom)
        e1 = jax.block_until_ready(e1)
        t_t = timeit(
            lambda: transpose_only(e1, g2=p.g2, C2g=C2g, **geom)
        )
        et = transpose_only(e1, g2=p.g2, C2g=C2g, **geom)
        et = jax.block_until_ready(et)
        t_r = timeit(
            lambda: reduce_only(p.rb_of, et, p.rl_t, ry=ry, rblock=p.rblock)
        )
        t_full = timeit(lambda: chain_fori(dg.plan, x, 25)) / 25
        if p.tail is None:
            tail = "none"
        elif hasattr(p.tail, "num_chunks"):
            tail = f"{p.tail.num_chunks}ch"
        else:
            tail = f"coo{p.tail.rows.shape[0]}"
        print(
            f"{name}: n={n} rblock={p.rblock} Q={p.quantum} tail={tail}\n"
            f"  gather={t_g*1e3:.3f}ms transpose={t_t*1e3:.3f}ms "
            f"reduce={t_r*1e3:.3f}ms sum={(t_g+t_t+t_r)*1e3:.3f}ms "
            f"chain_iter={t_full*1e3:.3f}ms"
        )

        # loop-construct overhead
        t_f100 = timeit(lambda: chain_fori(dg.plan, x, 100), reps=3)
        t_f25 = timeit(lambda: chain_fori(dg.plan, x, 25), reps=6)
        t_w100 = timeit(lambda: chain_while(dg.plan, x, jnp.int32(100)), reps=3)
        t_w25 = timeit(lambda: chain_while(dg.plan, x, jnp.int32(25)), reps=6)
        t_n100 = timeit(
            lambda: chain_while_nested(dg.plan, x, jnp.int32(100)), reps=3
        )
        t_n25 = timeit(
            lambda: chain_while_nested(dg.plan, x, jnp.int32(25)), reps=6
        )
        per_f = (t_f100 - t_f25) / 75
        per_w = (t_w100 - t_w25) / 75
        per_n = (t_n100 - t_n25) / 75
        print(
            f"  per-iter fori={per_f*1e3:.3f}ms while={per_w*1e3:.3f}ms "
            f"nested(25)={per_n*1e3:.3f}ms  "
            f"while_oh={(per_w-per_f)*1e3:.3f}ms/iter "
            f"nested_oh={(per_n-per_f)*1e3:.3f}ms/iter"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

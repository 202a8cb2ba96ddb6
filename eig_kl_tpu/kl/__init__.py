"""KL refinement engines.

``refine``/``kl_step`` (the XLA while-loop engine) are re-exported
lazily: importing them pulls in JAX, which the no-jax CPU fast path
(:mod:`eig_kl_tpu.kl.np_engine` under ``python -S``) must avoid.
"""

from eig_kl_tpu.kl.init import random_split, sides_balance, split_from_eig
from eig_kl_tpu.kl.result import KLResult

__all__ = [
    "KLResult",
    "refine",
    "kl_step",
    "random_split",
    "split_from_eig",
    "sides_balance",
]


def __getattr__(name):
    if name in ("refine", "kl_step"):
        from eig_kl_tpu.kl import engine

        return getattr(engine, name)
    raise AttributeError(name)

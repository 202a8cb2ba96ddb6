"""End-to-end pipelines and the circuit generator.

The jax-backed pipelines are re-exported lazily (PEP 562): importing
this package must not pull in JAX, or the no-jax CPU fast path
(:mod:`eig_kl_tpu.models.np_pipeline` under ``python -S``) pays the
~5 s jax import it exists to avoid.
"""

from eig_kl_tpu.models.generator import CircuitGenerator, generate_circuit
from eig_kl_tpu.models.run import PartitionRunData as PartitionRun

__all__ = [
    "spectral_partition",
    "kl_partition",
    "fused_partition",
    "PartitionRun",
    "CircuitGenerator",
    "generate_circuit",
]

_PIPELINE_EXPORTS = ("spectral_partition", "kl_partition", "fused_partition")


def __getattr__(name):
    if name in _PIPELINE_EXPORTS:
        from eig_kl_tpu.models import pipelines

        return getattr(pipelines, name)
    raise AttributeError(name)

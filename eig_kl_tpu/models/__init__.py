from eig_kl_tpu.models.pipelines import (
    spectral_partition,
    kl_partition,
    fused_partition,
    PartitionRun,
)
from eig_kl_tpu.models.generator import CircuitGenerator, generate_circuit

__all__ = [
    "spectral_partition",
    "kl_partition",
    "fused_partition",
    "PartitionRun",
    "CircuitGenerator",
    "generate_circuit",
]

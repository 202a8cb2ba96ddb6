from eig_kl_tpu.spectral.lanczos import lanczos_fiedler
from eig_kl_tpu.spectral.lobpcg_solver import lobpcg_fiedler
from eig_kl_tpu.spectral.power import (
    power_iteration_fiedler,
    power_partition_fiedler,
)
from eig_kl_tpu.spectral.partition import median_split, eig_partition
from eig_kl_tpu.spectral.refine import refine_fiedler_host

__all__ = [
    "lanczos_fiedler",
    "lobpcg_fiedler",
    "power_iteration_fiedler",
    "power_partition_fiedler",
    "median_split",
    "eig_partition",
    "refine_fiedler_host",
]

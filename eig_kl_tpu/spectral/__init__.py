from eig_kl_tpu.spectral.lanczos import lanczos_fiedler
from eig_kl_tpu.spectral.power import power_iteration_fiedler
from eig_kl_tpu.spectral.partition import median_split, eig_partition

__all__ = [
    "lanczos_fiedler",
    "power_iteration_fiedler",
    "median_split",
    "eig_partition",
]

from eig_kl_tpu.ops.partition import (
    spmv,
    gains,
    cut_size,
    external_costs,
    edge_weight,
    sides_to_signs,
    signs_to_sides,
)

__all__ = [
    "spmv",
    "gains",
    "cut_size",
    "external_costs",
    "edge_weight",
    "sides_to_signs",
    "signs_to_sides",
]

from eig_kl_tpu.parallel.mesh import make_mesh, node_sharding
from eig_kl_tpu.parallel.sharded_kl import sharded_refine
from eig_kl_tpu.parallel.sharded_power import sharded_power_fiedler
from eig_kl_tpu.parallel.multi_start import (
    multi_start_refine,
    multi_start_refine_mega_sharded,
)

__all__ = [
    "make_mesh",
    "node_sharding",
    "sharded_refine",
    "sharded_power_fiedler",
    "multi_start_refine",
    "multi_start_refine_mega_sharded",
]

from eig_kl_tpu.graph.expand import clique_expand
from eig_kl_tpu.graph.csr import Graph, DeviceGraph

__all__ = ["clique_expand", "Graph", "DeviceGraph"]

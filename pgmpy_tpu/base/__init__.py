from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.base.pdag import PDAG
from pgmpy_tpu.base.undirected import UndirectedGraph
from pgmpy_tpu.base.roles import GraphRolesMixin
from pgmpy_tpu.base.admg import ADMG
from pgmpy_tpu.base.mag import MAG, AncestralBase

__all__ = ["DAG", "PDAG", "UndirectedGraph", "GraphRolesMixin", "ADMG", "MAG", "AncestralBase"]

from pgmpy_tpu.base.dag import DAG
from pgmpy_tpu.base.pdag import PDAG
from pgmpy_tpu.base.undirected import UndirectedGraph
from pgmpy_tpu.base.roles import GraphRolesMixin

__all__ = ["DAG", "PDAG", "UndirectedGraph", "GraphRolesMixin"]

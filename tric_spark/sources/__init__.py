from tric_spark.sources.binary_csr import read_binary_csr, read_binary_csr_local
from tric_spark.sources.edgelist import (
    read_edge_list,
    write_edge_list,
    write_graphml,
)
from tric_spark.sources.tables import load_table

__all__ = [
    "read_binary_csr",
    "read_binary_csr_local",
    "load_table",
    "read_edge_list",
    "write_edge_list",
    "write_graphml",
]

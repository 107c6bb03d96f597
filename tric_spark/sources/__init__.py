from tric_spark.sources.binary_csr import read_binary_csr, read_binary_csr_local
from tric_spark.sources.tables import load_table

__all__ = ["read_binary_csr", "read_binary_csr_local", "load_table"]

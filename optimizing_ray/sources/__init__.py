from optimizing_ray.sources.storage import read_table, write_partitioned
from optimizing_ray.sources.corpus import synthetic_documents
from optimizing_ray.sources import driver_tables

__all__ = ["read_table", "write_partitioned", "synthetic_documents", "driver_tables"]

"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (geometry derivation -> tile-key
assignment -> box spatial join) on sf0.001.  ``queries()`` exposes one
callable per implemented operator from SURVEY.md §2; ``oracle_sql()``
returns the DuckDB twin for every SQL-expressible one.  Column names match
between the two on purpose (the driver hash-compares values per column).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in optimizing_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

N_BOX_QUERIES = 48
N_KNN_QUERIES = 24
DEPTH = 4  # driver-table tile depth (16x16 grid over the 100k^2 world)


def _docs(sf_dir: str):
    from optimizing_ray.sources import driver_tables
    return driver_tables.documents_with_geometry(sf_dir)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: read documents, derive
    geometry, assign Morton tile keys, box-join against the query workload."""
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import box_join
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.stages.assign import assign_tiles

    sf_dir = "/root/testdata/sf0.001"
    docs = assign_tiles(_docs(sf_dir), DEPTH, WORLD_2D)
    queries = driver_tables.driver_queries(N_BOX_QUERIES)
    return box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=DEPTH, max_extent=(10.0, 10.0),
        payload_cols=("doc_id", "cell_key"))


def _q_tile_assign(sf_dir: str):
    import pyarrow as pa
    from optimizing_ray import cells
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.stages.assign import assign_tiles

    ds = assign_tiles(_docs(sf_dir), DEPTH, WORLD_2D)

    def add_ixiy(t: pa.Table) -> pa.Table:
        import numpy as np
        _, ix, iy = cells.decode2(t["cell_key"].to_numpy().astype(np.uint64))
        t = t.append_column("cell_ix", pa.array(ix.astype(np.int64)))
        t = t.append_column("cell_iy", pa.array(iy.astype(np.int64)))
        return t.select(["doc_id", "x", "y", "cell_ix", "cell_iy", "cell_key"])

    return ds.map_batches(add_ixiy, batch_format="pyarrow", zero_copy_batch=True)


def _q_tile_counts(sf_dir: str):
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.stages.assign import assign_tiles

    ds = assign_tiles(_docs(sf_dir), DEPTH, WORLD_2D)
    return ds.groupby("cell_key").count().rename_columns({"count()": "n_docs"})


def _q_box_join(sf_dir: str):
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import box_join
    from optimizing_ray.sources import driver_tables

    queries = driver_tables.driver_queries(N_BOX_QUERIES)
    return box_join.box_join_broadcast(
        _docs(sf_dir), queries, world=WORLD_2D, depth=DEPTH,
        max_extent=(10.0, 10.0), payload_cols=("doc_id",))


def _q_knn(sf_dir: str):
    from optimizing_ray.pipelines import knn
    from optimizing_ray.sources import driver_tables

    queries = driver_tables.driver_knn_queries(N_KNN_QUERIES)
    return knn.knn_brute(_docs(sf_dir), queries)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "tile_assign": _q_tile_assign,
        "tile_counts": _q_tile_counts,
        "box_join": _q_box_join,
        "knn": _q_knn,
    }


def oracle_sql() -> dict[str, str]:
    from optimizing_ray import oracle

    return {
        "tile_assign": oracle.tile_assign_sql(DEPTH),
        "tile_counts": oracle.tile_counts_sql(DEPTH),
        "box_join": oracle.box_join_sql(N_BOX_QUERIES),
        "knn": oracle.knn_sql(N_KNN_QUERIES),
    }

"""Query the tile-partitioned store with pruned reads.

The payoff of the manifest layout (one Parquet tile group per cell,
``state/manifest.py``): a box query reads ONLY the tile groups its cover
touches — the disk twin of the reference's load-only-the-neighborhood
working set (``WorldPartition.hpp:196-204``).  At 100 TB this is the
difference between scanning everything and scanning the few cells under
the query.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World
from optimizing_ray.pipelines.box_join import box_join_broadcast
from optimizing_ray.state import manifest

__all__ = ["query_tiles", "pruned_read"]


def pruned_read(store_dir: str, cell_keys: np.ndarray) -> tuple[rd.Dataset, int, int]:
    """Read only the completed tile groups whose key is in `cell_keys`.

    Returns (dataset, n_parts_read, n_parts_total)."""
    rows = [r for r in manifest.read_manifest(store_dir) if r.get("status") == "done"]
    wanted = set(int(k) for k in np.asarray(cell_keys).ravel())
    hit = [os.path.join(r["part_path"], "data.parquet")
           for r in rows if r["cell_key"] in wanted]
    if not hit:
        return rd.from_items([]), 0, len(rows)
    return rd.read_parquet(hit), len(hit), len(rows)


def query_tiles(store_dir: str, queries: pa.Table, *, world: World, depth: int,
                max_extent: tuple[float, float],
                payload_cols: tuple[str, ...] = ("doc_id",)) -> tuple[rd.Dataset, dict]:
    """Box-join queries against the on-disk tile store, reading only the
    covered tile groups.  Returns (result, metrics) where metrics records
    the pruning ratio (parts_read / parts_total)."""
    covers = []
    for row in queries.to_pylist():
        covers.append(cells.cover2(row["min_x"] - max_extent[0],
                                   row["min_y"] - max_extent[1],
                                   row["max_x"], row["max_y"], world, depth))
    keys = np.unique(np.concatenate(covers)).astype(np.int64) if covers else \
        np.empty(0, dtype=np.int64)
    ds, n_read, n_total = pruned_read(store_dir, keys)
    metrics = {"parts_read": n_read, "parts_total": n_total,
               "prune_ratio": round(1 - n_read / n_total, 4) if n_total else 0.0}
    if n_read == 0:
        empty = pa.table({"query_id": pa.array([], queries.schema.field("query_id").type),
                          **{c: pa.array([], pa.string()) for c in payload_cols}})
        return rd.from_arrow(empty), metrics
    res = box_join_broadcast(ds, queries, world=world, depth=depth,
                             max_extent=max_extent, payload_cols=payload_cols)
    return res, metrics

"""Multi-resolution tile pyramid — the map-tile aggregation build.

Per-cell occupancy at EVERY depth ``min_depth..max_depth`` from ONE
pass over the corpus: a batch computes its partial counts at max depth,
then derives every coarser level by pure key shifts (``parent = key >>
2``, the sentinel-tagged Morton algebra of ``cells.py``) — deeper
levels never re-read the input, and the shuffle-free plan follows
``tile_counts`` (__ray_entry__): the result is bounded by
``sum_d 4^d`` cells regardless of corpus size, so partials merge
driver-side by construction.

Reference analogue: the quadtree's per-level occupancy is implicit in
its node structure (``DynamicOctree.hpp:113-124`` recursive ``size()``,
one count per node at every level); a batch engine materializes the
whole pyramid as one (depth, cell_key, n_docs) table.  This is also the
tile-serving layout a slippy-map / LOD renderer expects (zoom z = depth
z slice).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World

__all__ = ["tile_pyramid"]


def tile_pyramid(docs: rd.Dataset, *, world: World, max_depth: int,
                 min_depth: int = 0, x_col: str = "x",
                 y_col: str = "y") -> pa.Table:
    """(depth, cell_key, n_docs) for every non-empty cell at every depth.

    Keys are sentinel-tagged Morton keys (``cells.encode2``); a depth-d
    row's key is exactly ``point_cell2(x, y, world, d)`` — flooring to a
    coarser grid commutes with the key shift, so one max-depth
    quantization per row serves every level.
    """
    if not (0 <= min_depth <= max_depth):
        raise ValueError("need 0 <= min_depth <= max_depth")
    depths = list(range(max_depth, min_depth - 1, -1))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or x_col not in t.column_names:
            return pa.table({"depth": pa.array([], pa.int64()),
                             "cell_key": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64())})
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        key = cells.point_cell2(x, y, world, max_depth)
        out_d, out_k, out_n = [], [], []
        # aggregate the finest level once, then roll coarser levels up
        # from the PREVIOUS level's (already tiny) uniques — per-batch
        # work beyond max_depth is O(distinct cells), not O(rows)
        uk, cnt = np.unique(key, return_counts=True)
        for d in depths:
            out_d.append(np.full(len(uk), d, dtype=np.int64))
            out_k.append(uk.astype(np.int64))
            out_n.append(cnt.astype(np.int64))
            if d > min_depth:
                pk = cells.parent(uk)
                uk, inv = np.unique(pk, return_inverse=True)
                cnt = np.bincount(inv, weights=cnt).astype(np.int64)
        return pa.table({"depth": pa.array(np.concatenate(out_d)),
                         "cell_key": pa.array(np.concatenate(out_k)),
                         "n_docs": pa.array(np.concatenate(out_n))})

    parts = docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"depth": pa.array([], pa.int64()),
                         "cell_key": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64())})
    df = pa.concat_tables(tabs).to_pandas()
    out = (df.groupby(["depth", "cell_key"], as_index=False, sort=True)
           ["n_docs"].sum())
    return pa.Table.from_pandas(out, preserve_index=False)

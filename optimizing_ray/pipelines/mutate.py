"""Mutations: delete (D1/D2), relocate (D3) — as anti-join / re-key stages.

Reference semantics: ``remove`` erases by identity (container O(1) path,
``DynamicOctree.hpp:293-297``; the 3D tree path never compiled,
``DynamicOctree.hpp:194`` — semantics taken from the working 2D versions,
``.Test/listQuadTree.cpp:517-521``); ``relocate`` = erase + reinsert at
the new box, master list untouched (``DynamicOctree.hpp:299-303``).

Engine twins:
* delete: broadcast tombstone key set, vectorized anti-join filter inside
  ``map_batches`` (no shuffle; a Bloom filter replaces the set when the
  tombstone list itself is huge).
* relocate: broadcast moves map; rows present in it get new coordinates
  and a recomputed ``cell_key``.  ``changed_only=True`` emits just the
  rows whose key changed (the incremental re-shuffle that makes resumable
  incremental runs cheap — only affected tile groups rewrite).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.config import World
from optimizing_ray.stages.assign import assign_point_cells_batch

__all__ = ["delete_docs", "relocate_docs"]


def delete_docs(docs: rd.Dataset, tombstones, *, id_col: str = "doc_id") -> rd.Dataset:
    """Anti-join: drop rows whose id is in the tombstone set."""
    tomb = np.sort(np.asarray(tombstones))
    tomb_ref = ray.put(tomb)

    def anti(t: pa.Table) -> pa.Table:
        ts = ray.get(tomb_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, ts)))

    return docs.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def relocate_docs(docs: rd.Dataset, moves: pa.Table, *, world: World, depth: int,
                  id_col: str = "doc_id", changed_only: bool = False) -> rd.Dataset:
    """Apply (doc_id, new_x, new_y) moves and recompute cell keys.

    With ``changed_only`` the output contains only rows whose tile key
    changed (old key in ``old_cell_key``) — the shuffle-minimizing D3
    path: row count conserved overall, but only changed tile groups need
    rewriting."""
    mv_ids = moves[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(mv_ids)
    moves_ref = ray.put({
        "ids": mv_ids[order],
        "x": moves["new_x"].to_numpy()[order],
        "y": moves["new_y"].to_numpy()[order],
    })

    def apply(t: pa.Table) -> pa.Table:
        mv = ray.get(moves_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(mv["ids"], ids)
        pos = np.clip(pos, 0, len(mv["ids"]) - 1)
        hit = mv["ids"][pos] == ids if len(mv["ids"]) else np.zeros(len(ids), bool)
        old = assign_point_cells_batch(t, depth, world, out_col="old_cell_key")
        x = t["x"].to_numpy(zero_copy_only=False).copy()
        y = t["y"].to_numpy(zero_copy_only=False).copy()
        x[hit] = mv["x"][pos[hit]]
        y[hit] = mv["y"][pos[hit]]
        t = old.set_column(old.schema.get_field_index("x"), "x", pa.array(x))
        t = t.set_column(t.schema.get_field_index("y"), "y", pa.array(y))
        t = assign_point_cells_batch(t, depth, world)
        if changed_only:
            keep = t["cell_key"].to_numpy() != t["old_cell_key"].to_numpy()
            t = t.filter(pa.array(keep))
        return t

    return docs.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)

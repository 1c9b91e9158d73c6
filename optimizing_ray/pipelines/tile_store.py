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

__all__ = ["query_tiles", "pruned_read", "apply_moves"]


def pruned_read(store_dir: str, cell_keys: np.ndarray) -> tuple[rd.Dataset, int, int]:
    """Read only the completed tile groups whose key is in `cell_keys`.

    Returns (dataset, n_parts_read, n_parts_total)."""
    rows = [r for r in manifest.read_manifest(store_dir) if r.get("status") == "done"]
    wanted = set(int(k) for k in np.asarray(cell_keys).ravel())
    # compacted parts: several cells share one path — read each ONCE
    all_paths = {os.path.join(r["part_path"], "data.parquet") for r in rows}
    hit = sorted({os.path.join(r["part_path"], "data.parquet")
                  for r in rows if r["cell_key"] in wanted})
    if not hit:
        return rd.from_items([]), 0, len(all_paths)
    return rd.read_parquet(hit), len(hit), len(all_paths)


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


def _refresh_record(key: int, part_dir: str, n_rows: int):
    import json as _json
    rec = {"cell_key": key, "rows_out": n_rows, "wall_s": 0.0,
           "part_path": part_dir, "status": "done"}
    tmp = os.path.join(part_dir, manifest.DONE + ".tmp")
    with open(tmp, "w") as f:
        _json.dump(rec, f)
    os.replace(tmp, os.path.join(part_dir, manifest.DONE))


def _atomic_write_table(t: pa.Table, path: str):
    """tmp + os.replace, the resumable_write atomic-rename discipline: a
    crash mid-write must never leave a truncated data.parquet whose DONE
    record still claims the old row count (round-2 ADVICE) — doubly so
    now that part rewrites run as parallel Ray tasks."""
    import pyarrow.parquet as pq
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)


def _rewrite_source_part(key: int, part_path: str, id_col: str,
                         s_ids, new_x, new_y, new_key):
    """Rewrite one source part: refresh stayers' coordinates in place,
    return (leavers_table, n_hit).  Runs as a parallel Ray task."""
    import pyarrow.parquet as pq

    def apply_coords(mt: pa.Table, mpos: np.ndarray) -> pa.Table:
        mt = mt.set_column(mt.schema.get_field_index("x"), "x", pa.array(new_x[mpos]))
        mt = mt.set_column(mt.schema.get_field_index("y"), "y", pa.array(new_y[mpos]))
        return mt.set_column(mt.schema.get_field_index("cell_key"), "cell_key",
                             pa.array(new_key[mpos]))

    path = os.path.join(part_path, "data.parquet")
    t = pq.read_table(path)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    pos = np.clip(np.searchsorted(s_ids, ids), 0, len(s_ids) - 1)
    hit = s_ids[pos] == ids
    if not hit.any():
        return None, [], False
    sel = np.nonzero(hit)[0]
    mpos = pos[sel]
    leaves = new_key[mpos] != key
    keep_mask = np.ones(len(t), dtype=bool)
    keep_mask[sel[leaves]] = False
    kept = t.filter(pa.array(keep_mask))
    stay_sel = sel[~leaves]
    if len(stay_sel):
        # rebuild: non-hit rows + stayers with refreshed coordinates
        non_hit = np.ones(len(t), dtype=bool)
        non_hit[sel] = False
        stayed = apply_coords(t.take(pa.array(stay_sel)), mpos[~leaves])
        kept = pa.concat_tables([t.filter(pa.array(non_hit)), stayed])
    leavers = (apply_coords(t.take(pa.array(sel[leaves])), mpos[leaves])
               if leaves.any() else None)
    _atomic_write_table(kept, path)
    _refresh_record(key, part_path, kept.num_rows)
    return leavers, s_ids[np.unique(mpos)].tolist(), True


def _append_dest_part(key: int, part_dir: str, sub: pa.Table, exists: bool):
    """Append leavers to (or create) one destination part — parallel task."""
    import pyarrow.parquet as pq
    path = os.path.join(part_dir, "data.parquet")
    if not exists:
        os.makedirs(part_dir, exist_ok=True)
        _atomic_write_table(sub, path)
        _refresh_record(key, part_dir, sub.num_rows)
    else:
        merged = pa.concat_tables([pq.read_table(path), sub])
        _atomic_write_table(merged, path)
        _refresh_record(key, part_dir, merged.num_rows)


def apply_moves(store_dir: str, moves: pa.Table, *, world: World, depth: int,
                id_col: str = "doc_id") -> dict:
    """Incremental relocate against the tile store (D3,
    ``DynamicOctree.hpp:299-303``): only the tile groups that contain a
    moved row (source) or receive one (destination) are rewritten; every
    other part file stays byte-identical on disk AND UNREAD.

    SOURCE PRUNING: when `moves` carries ``old_x``/``old_y`` columns (the
    engine's analogue of the reference's location back-pointer,
    ``OctreeItemLocation`` ``DynamicOctree.hpp:46-49``), only the parts
    whose key appears among the old positions are opened — at 100 TB the
    difference between touching k parts and scanning the store.  STALE
    HINTS ARE SAFE, not silent no-ops: any move id the pruned pass did
    not find triggers a fallback probe of the remaining parts (reported
    as ``fallback_parts_read``), so correctness never depends on the
    hint.  Without old coordinates every part is probed.  Part rewrites
    run as parallel Ray tasks.

    Returns metrics {parts_rewritten, parts_read, fallback_parts_read,
    parts_total, rows_moved}.
    """
    import ray

    mv_ids = moves[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(mv_ids)
    s_ids = mv_ids[order]
    new_x = moves["new_x"].to_numpy()[order]
    new_y = moves["new_y"].to_numpy()[order]
    new_key = cells.point_cell2(new_x, new_y, world, depth).astype(np.int64)

    records = {r["cell_key"]: r for r in manifest.read_manifest(store_dir)
               if r.get("status") == "done"}

    if len(s_ids) and "old_x" in moves.column_names and "old_y" in moves.column_names:
        old_key = cells.point_cell2(moves["old_x"].to_numpy()[order],
                                    moves["old_y"].to_numpy()[order],
                                    world, depth).astype(np.int64)
        src_keys = [k for k in np.unique(old_key).tolist() if k in records]
    else:
        src_keys = list(records) if len(s_ids) else []

    rewrite = ray.remote(_rewrite_source_part)
    append = ray.remote(_append_dest_part)
    s_ref = ray.put(s_ids)
    x_ref, y_ref, k_ref = ray.put(new_x), ray.put(new_y), ray.put(new_key)

    def run_pass(keys, ids_ref, xr, yr, kr):
        futs = [rewrite.remote(key, records[key]["part_path"], id_col,
                               ids_ref, xr, yr, kr) for key in keys]
        out_leavers, matched, n = [], set(), 0
        for key, (leave, hit_ids, touched) in zip(keys, ray.get(futs)):
            n += len(hit_ids)
            matched.update(hit_ids)
            if touched:
                rewritten.add(key)
            if leave is not None:
                out_leavers.append(leave)
        return out_leavers, matched, n

    leavers: list[pa.Table] = []
    rewritten: set[int] = set()
    part1, matched, n_moved = run_pass(src_keys, s_ref, x_ref, y_ref, k_ref)
    leavers.extend(part1)

    fallback_keys: list[int] = []
    if len(matched) < len(s_ids) and len(src_keys) < len(records):
        # stale/incomplete back-pointer: probe the remaining parts with
        # ONLY the unmatched moves
        miss = np.asarray([i not in matched for i in s_ids], dtype=bool)
        if miss.any():
            fallback_keys = [k for k in records if k not in set(src_keys)]
            fb_refs = (ray.put(s_ids[miss]), ray.put(new_x[miss]),
                       ray.put(new_y[miss]), ray.put(new_key[miss]))
            part2, _matched2, n2 = run_pass(fallback_keys, *fb_refs)
            leavers.extend(part2)
            n_moved += n2

    # pass 2: append leavers to their destination parts (parallel per part)
    if leavers:
        allm = pa.concat_tables(leavers)
        dkeys = allm["cell_key"].to_numpy()
        dfuts = []
        for key in np.unique(dkeys).tolist():
            key = int(key)
            sub = allm.filter(pa.array(dkeys == key))
            rec = records.get(key)
            part_dir = (rec["part_path"] if rec is not None
                        else os.path.join(store_dir, f"part={key}"))
            dfuts.append(append.remote(key, part_dir, sub, rec is not None))
            rewritten.add(key)
        ray.get(dfuts)
    manifest._write_compacted(store_dir)
    return {"parts_rewritten": len(rewritten), "parts_read": len(src_keys),
            "fallback_parts_read": len(fallback_keys),
            "parts_total": len(records), "rows_moved": n_moved}

"""Tile-key assignment — the engine's ingest stage.

The Ray-Data twin of ``WorldPartition::insert`` (``WorldPartition.hpp:169-181``):
instead of routing rows into per-cell vectors under a mutex, a stateless
zero-copy ``map_batches`` appends a depth-tagged Morton ``cell_key``
column; the shuffle that co-locates a cell's rows happens later (groupby)
and only when an operator needs it.

Two assignment strategies for box-shaped rows:

* point assignment (default): a row belongs to the cell of its position
  (min corner, like the reference's ``int(pos/cell)`` grid key,
  ``WorldPartition.hpp:174``).  Joins that must see boundary-spanning rows
  expand the QUERY side by the max row extent instead of duplicating rows.
* cover explosion (``explode_cover_batch``): a row is emitted once per
  overlapped cell — the old-quadtree multi-child duplicating insert
  (``.Test/oldQuadTree.cpp:237-253``), deduped after the join
  (``REPORT.md:4-8``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World

__all__ = ["assign_point_cells_batch", "assign_tiles", "explode_cover_batch",
           "assign_hex_batch", "assign_hex",
           "segment_cover_batch", "segment_cover"]


def assign_point_cells_batch(t: pa.Table, depth: int, world: World,
                             x_col: str = "x", y_col: str = "y",
                             out_col: str = "cell_key") -> pa.Table:
    """Append the depth-tagged Morton key of each row's position.

    Key is stored as int64 (values < 2^(2*depth+1), far below 2^62) so it
    round-trips Parquet/DuckDB without unsigned-type edge cases.
    """
    key = cells.point_cell2(t[x_col].to_numpy(zero_copy_only=False),
                            t[y_col].to_numpy(zero_copy_only=False), world, depth)
    return t.append_column(out_col, pa.array(key.astype(np.int64)))


def assign_hilbert_batch(t: pa.Table, depth: int, world: World,
                         x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Append (cell_ix, cell_iy, hkey): grid indices (the point_cell2
    quantization) plus the Hilbert-curve index — the locality-
    preserving layout key for range scans (``cells.hilbert_d``;
    consecutive hkey are always 4-adjacent cells, unlike Morton).
    SQL twin: ``oracle.hilbert_assign_sql`` unrolls the identical
    per-bit rotate/reflect steps."""
    if t.num_rows == 0 or x_col not in t.column_names:
        t = t.append_column("cell_ix", pa.array([], pa.int64()))
        t = t.append_column("cell_iy", pa.array([], pa.int64()))
        return t.append_column("hkey", pa.array([], pa.int64()))
    n = 1 << depth
    wx, wy, _ = world.size
    fx = (t[x_col].to_numpy(zero_copy_only=False) - world.min_x) / wx
    fy = (t[y_col].to_numpy(zero_copy_only=False) - world.min_y) / wy
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
    t = t.append_column("cell_ix", pa.array(ix))
    t = t.append_column("cell_iy", pa.array(iy))
    return t.append_column("hkey", pa.array(
        cells.hilbert_d(ix, iy, depth)))


def rendezvous_assign_batch(t: pa.Table, n_buckets: int = 16,
                            id_col: str = "doc_id") -> pa.Table:
    """Append ``owner``: rendezvous (highest-random-weight) placement —
    owner(id) = argmax over b < n_buckets of splitmix64(id*B + b),
    ties to the lowest b (argmax first-max == the SQL (h DESC, b)
    row_number).  The consistent-placement primitive: removing a
    bucket reassigns ONLY that bucket's keys (no global reshuffle) —
    the shard-ownership rule a serving tier or incremental store uses.
    Pure mod-2^64 arithmetic, SQL twin ``oracle.rendezvous_sql``."""
    from optimizing_ray.pipelines.sketches import splitmix64
    if t.num_rows == 0 or id_col not in t.column_names:
        return t.append_column("owner", pa.array([], pa.int64()))
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        keys = (ids[:, None] * np.uint64(n_buckets)
                + np.arange(n_buckets, dtype=np.uint64)[None, :])
    h = splitmix64(keys.reshape(-1)).reshape(len(ids), n_buckets)
    return t.append_column("owner",
                           pa.array(h.argmax(axis=1).astype(np.int64)))


def assign_tiles(ds: rd.Dataset, depth: int, world: World,
                 x_col: str = "x", y_col: str = "y",
                 out_col: str = "cell_key") -> rd.Dataset:
    """Dataset wrapper: stateless zero-copy Arrow map_batches."""
    return ds.map_batches(
        lambda t: assign_point_cells_batch(t, depth, world, x_col, y_col, out_col),
        batch_format="pyarrow", zero_copy_batch=True)


def segment_cover_batch(t: pa.Table, depth: int, world: World,
                        x0_col: str = "x", y0_col: str = "y",
                        x1_col: str = "x1", y1_col: str = "y1",
                        id_col: str = "doc_id") -> pa.Table:
    """Line-segment -> grid-cell supercover (trajectory tile assignment),
    by COLUMN SWEEP: for every x-column the segment's x-span touches,
    the y-interval of the (monotone linear) segment inside that column
    picks the y-cells.  Two vectorized explodes (per-column, then
    per-cell), no per-row Python.  Every float expression is in the
    exact op order of ``oracle.segment_cover_sql`` so the emitted
    (cell_ix, cell_iy) sets match bit-for-bit.

    The reference analogue is the duplicating multi-cell insert of a
    box (``.Test/oldQuadTree.cpp:237-253``) applied to a moving point's
    path (``WorldPartition::update`` relocation, WorldPartition.hpp:240).
    """
    if t.num_rows == 0 or x0_col not in t.column_names:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cell_ix": pa.array([], pa.int64()),
                         "cell_iy": pa.array([], pa.int64())})
    n = 1 << depth
    wx, wy, _ = world.size
    cw, ch = wx / n, wy / n
    x0 = t[x0_col].to_numpy(zero_copy_only=False)
    y0 = t[y0_col].to_numpy(zero_copy_only=False)
    x1 = t[x1_col].to_numpy(zero_copy_only=False)
    y1 = t[y1_col].to_numpy(zero_copy_only=False)
    xmin = np.minimum(x0, x1)
    xmax = np.maximum(x0, x1)
    ix_lo = np.clip(np.floor((xmin - world.min_x) / cw).astype(np.int64),
                    0, n - 1)
    ix_hi = np.clip(np.floor((xmax - world.min_x) / cw).astype(np.int64),
                    0, n - 1)
    ncols = ix_hi - ix_lo + 1
    total = int(ncols.sum())
    seg = np.repeat(np.arange(len(x0), dtype=np.int64), ncols)
    starts = np.concatenate([[0], np.cumsum(ncols)[:-1]])
    ix = ix_lo[seg] + (np.arange(total, dtype=np.int64)
                       - np.repeat(starts, ncols))
    # clip the segment's x-span to the column, then its y-interval there
    xa = np.maximum(xmin[seg], world.min_x + ix * cw)
    xb = np.minimum(xmax[seg], world.min_x + (ix + 1) * cw)
    vert = x1[seg] == x0[seg]
    with np.errstate(invalid="ignore", divide="ignore"):
        ta = (xa - x0[seg]) / (x1[seg] - x0[seg])
        tb = (xb - x0[seg]) / (x1[seg] - x0[seg])
    ya = np.where(vert, np.minimum(y0[seg], y1[seg]),
                  y0[seg] + (y1[seg] - y0[seg]) * ta)
    yb = np.where(vert, np.maximum(y0[seg], y1[seg]),
                  y0[seg] + (y1[seg] - y0[seg]) * tb)
    iy_lo = np.clip(np.floor((np.minimum(ya, yb) - world.min_y) / ch)
                    .astype(np.int64), 0, n - 1)
    iy_hi = np.clip(np.floor((np.maximum(ya, yb) - world.min_y) / ch)
                    .astype(np.int64), 0, n - 1)
    nys = iy_hi - iy_lo + 1
    total2 = int(nys.sum())
    colrep = np.repeat(np.arange(total, dtype=np.int64), nys)
    starts2 = np.concatenate([[0], np.cumsum(nys)[:-1]])
    iy = iy_lo[colrep] + (np.arange(total2, dtype=np.int64)
                          - np.repeat(starts2, nys))
    ids = t[id_col].take(pa.array(seg[colrep]))
    return pa.table({id_col: ids, "cell_ix": pa.array(ix[colrep]),
                     "cell_iy": pa.array(iy)})


def segment_cover(ds: rd.Dataset, depth: int, world: World,
                  **cols) -> rd.Dataset:
    """Dataset wrapper for ``segment_cover_batch`` (stateless map)."""
    return ds.map_batches(
        lambda t: segment_cover_batch(t, depth, world, **cols),
        batch_format="pyarrow", zero_copy_batch=True)


def assign_hex_batch(t: pa.Table, size: float,
                     x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Append axial hexagonal cell coordinates (hex_q, hex_r) — the
    H3-flavored sibling of the Morton quadkey assignment (north-star
    'distributed H3/S2 cell encoding').  SQL twin: oracle.hex_assign_sql."""
    if t.num_rows == 0 or x_col not in t.column_names:
        t = t.append_column("hex_q", pa.array([], pa.int64()))
        return t.append_column("hex_r", pa.array([], pa.int64()))
    q, r = cells.hex_axial(t[x_col].to_numpy(zero_copy_only=False),
                           t[y_col].to_numpy(zero_copy_only=False), size)
    t = t.append_column("hex_q", pa.array(q))
    return t.append_column("hex_r", pa.array(r))


def assign_hex(ds: rd.Dataset, size: float, x_col: str = "x",
               y_col: str = "y") -> rd.Dataset:
    """Dataset wrapper for ``assign_hex_batch`` (stateless zero-copy map)."""
    return ds.map_batches(lambda t: assign_hex_batch(t, size, x_col, y_col),
                          batch_format="pyarrow", zero_copy_batch=True)


def explode_cover_batch(t: pa.Table, depth: int, world: World,
                        min_x: str = "min_x", min_y: str = "min_y",
                        max_x: str = "max_x", max_y: str = "max_y",
                        out_col: str = "cell_key") -> pa.Table:
    """Emit each row once per cell its box overlaps at `depth` (vectorized).

    Mirrors the multi-child duplicating insert of the old quadtree
    (``.Test/oldQuadTree.cpp:237-253``); consumers MUST dedup join output
    on (query_id, doc_id) — the REPORT.md:4-8 failure mode.
    """
    n = 1 << depth
    wx, wy, _ = world.size
    cw, ch = wx / n, wy / n
    bx0 = t[min_x].to_numpy(zero_copy_only=False)
    by0 = t[min_y].to_numpy(zero_copy_only=False)
    bx1 = t[max_x].to_numpy(zero_copy_only=False)
    by1 = t[max_y].to_numpy(zero_copy_only=False)
    ix0 = np.clip(np.floor((bx0 - world.min_x) / cw).astype(np.int64), 0, n - 1)
    ix1 = np.clip(np.floor((bx1 - world.min_x) / cw).astype(np.int64), 0, n - 1)
    iy0 = np.clip(np.floor((by0 - world.min_y) / ch).astype(np.int64), 0, n - 1)
    iy1 = np.clip(np.floor((by1 - world.min_y) / ch).astype(np.int64), 0, n - 1)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    reps = nx * ny
    row_idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
    # per-duplicate local ordinal -> (dx, dy) within the row's cell rectangle
    starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
    local = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(starts, reps)
    nx_r = np.repeat(nx, reps)
    dx = local % nx_r
    dy = local // nx_r
    gx = (np.repeat(ix0, reps) + dx).astype(np.uint64)
    gy = (np.repeat(iy0, reps) + dy).astype(np.uint64)
    keys = cells.encode2(gx, gy, depth).astype(np.int64)
    out = t.take(pa.array(row_idx))
    return out.append_column(out_col, pa.array(keys))

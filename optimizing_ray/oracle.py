"""DuckDB oracle SQL generators.

The driver verifies every ``queries()`` pipeline against an equivalent SQL
string run by DuckDB on the same Parquet tables.  This module builds those
strings so the arithmetic (geometry derivation, cell quantization, Morton
bit-interleave) is generated from the SAME constants the engine uses —
one source of truth, two execution engines.

The Morton spread is expressed as a CTE chain of shift/and steps (the SQL
twin of ``cells.spread2``).
"""

from __future__ import annotations

from optimizing_ray.config import World
from optimizing_ray.sources.driver_tables import (
    BOX_MIN, BOX_SPAN, DRIVER_WORLD, QUERY_MULTS, QUERY_SALT,
    frac_sql, geometry_sql,
)

_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def geo_cte(table: str = "documents", world: World = DRIVER_WORLD,
            extra_cols: str = "") -> str:
    """CTE `geo`: doc_id + derived x, y, w, h (exact twin of
    ``driver_tables.derive_geometry_batch``)."""
    g = geometry_sql(world)
    extra = f", {extra_cols}" if extra_cols else ""
    return (f"geo AS (SELECT doc_id, {g['x']} AS x, {g['y']} AS y, "
            f"{g['w']} AS w, {g['h']} AS h{extra} FROM {table})")


def cell_idx_expr(col: str, world_min: float, world_extent: float, depth: int) -> str:
    """SQL twin of the quantization in ``cells.point_cell2``."""
    n = 1 << depth
    # NOTE: DuckDB CAST(double AS BIGINT) ROUNDS; numpy .astype truncates.
    # floor() first (values are non-negative here, so floor == trunc).
    return (f"LEAST({n - 1}, GREATEST(0, CAST(floor(((({col} - {world_min!r}) / "
            f"{world_extent!r}) * {n})) AS BIGINT)))")


def morton_ctes(src_cte: str, depth: int, carry: str = "doc_id, x, y",
                ix: str = "ix", iy: str = "iy") -> str:
    """CTE chain spreading ix/iy bits and producing `mkey` (sentinel-tagged
    Morton key as BIGINT) in final CTE `mz`."""
    parts = [f"m0 AS (SELECT {carry}, {ix} AS ix, {iy} AS iy, "
             f"CAST({ix} AS UBIGINT) AS sx, CAST({iy} AS UBIGINT) AS sy FROM {src_cte})"]
    prev = "m0"
    for i, (shift, mask) in enumerate(_SPREAD_STEPS, start=1):
        parts.append(
            f"m{i} AS (SELECT * REPLACE (((sx | (sx << {shift})) & {mask}) AS sx, "
            f"((sy | (sy << {shift})) & {mask}) AS sy) FROM {prev})")
        prev = f"m{i}"
    sentinel = 1 << (2 * depth)
    parts.append(
        f"mz AS (SELECT *, CAST((sx | (sy * 2)) | {sentinel} AS BIGINT) AS mkey FROM {prev})")
    return ", ".join(parts)


def tile_assign_sql(depth: int, world: World = DRIVER_WORLD,
                    table: str = "documents") -> str:
    """Full oracle for the tile-assignment pipeline over driver documents."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id, x, y,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', depth)}
SELECT doc_id, x, y, ix AS cell_ix, iy AS cell_iy, mkey AS cell_key
FROM mz
"""


def tile_counts_sql(depth: int, world: World = DRIVER_WORLD,
                    table: str = "documents") -> str:
    """Per-cell row counts (A1: groupby(cell).count())."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id, x, y,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', depth)}
SELECT mkey AS cell_key, COUNT(*) AS n_docs
FROM mz
GROUP BY mkey
"""


def driver_queries_cte(nq: int, world: World = DRIVER_WORLD) -> str:
    """SQL twin of ``driver_tables.driver_queries``."""
    wx, wy, _ = world.size
    h = f"(qid + {QUERY_SALT})"
    cx = f"({world.min_x!r} + {frac_sql(h, QUERY_MULTS['cx'])} * {wx!r})"
    cy = f"({world.min_y!r} + {frac_sql(h, QUERY_MULTS['cy'])} * {wy!r})"
    qw = f"({BOX_MIN!r} + {frac_sql(h, QUERY_MULTS['qw'])} * {BOX_SPAN!r})"
    qh = f"({BOX_MIN!r} + {frac_sql(h, QUERY_MULTS['qh'])} * {BOX_SPAN!r})"
    return (f"q AS (SELECT qid AS query_id, "
            f"{cx} - {qw} / 2 AS min_x, {cy} - {qh} / 2 AS min_y, "
            f"{cx} + {qw} / 2 AS max_x, {cy} + {qh} / 2 AS max_y "
            f"FROM generate_series(0, {nq - 1}) t(qid))")


def driver_knn_queries_cte(nq: int, world: World = DRIVER_WORLD) -> str:
    """SQL twin of ``driver_tables.driver_knn_queries``."""
    wx, wy, _ = world.size
    h = f"(qid + {QUERY_SALT})"
    x = f"({world.min_x!r} + {frac_sql(h, QUERY_MULTS['cx'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql(h, QUERY_MULTS['cy'])} * {wy!r})"
    k = "CASE qid % 3 WHEN 0 THEN 1 WHEN 1 THEN 4 ELSE 16 END"
    return (f"q AS (SELECT qid AS query_id, {x} AS x, {y} AS y, {k} AS k "
            f"FROM generate_series(0, {nq - 1}) t(qid))")


def box_join_sql(nq: int, world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """Oracle for the box spatial join over driver documents: boundary-
    inclusive AABB overlap (``BoundaryBox.hpp:47-51`` family)."""
    return f"""
WITH {geo_cte(table, world)},
{driver_queries_cte(nq, world)}
SELECT q.query_id AS query_id, g.doc_id AS doc_id
FROM geo g
JOIN q ON g.x <= q.max_x AND g.x + g.w >= q.min_x
      AND g.y <= q.max_y AND g.y + g.h >= q.min_y
"""


def knn_sql(nq: int, world: World = DRIVER_WORLD, table: str = "documents") -> str:
    """Oracle for exact kNN: per-query top-k by (dist2, doc_id) tiebreak —
    the same ordering the engine's merge stage uses."""
    return f"""
WITH {geo_cte(table, world)},
{driver_knn_queries_cte(nq, world)}
SELECT query_id, doc_id, dist, knn_rank
FROM (
  SELECT q.query_id AS query_id, g.doc_id AS doc_id,
         sqrt((g.x - q.x) * (g.x - q.x) + (g.y - q.y) * (g.y - q.y)) AS dist,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY ((g.x - q.x) * (g.x - q.x) + (g.y - q.y) * (g.y - q.y)), g.doc_id
         ) AS knn_rank,
         q.k AS k
  FROM geo g CROSS JOIN q
) s
WHERE knn_rank <= k
"""

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
from optimizing_ray.sources.driver_tables import DRIVER_WORLD, geometry_sql

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

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
    BOX_MIN, BOX_SPAN, DRIVER_WORLD, GEO_MULTS, QUERY_MULTS, QUERY_SALT,
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


def pip_join_sql(polygons, world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """Oracle for the convex point-in-polygon join: HAVING min(edge cross)
    >= 0 over inlined polygon edges (CCW rings -> boundary-inclusive
    half-plane test, the exact twin of ``pip.pip_convex``)."""
    values = []
    for row in polygons.to_pylist():
        ring = row["ring"]
        for i in range(len(ring)):
            v1, v2 = ring[i], ring[(i + 1) % len(ring)]
            values.append(f"('{row['poly_id']}', {v1['x']!r}, {v1['y']!r}, "
                          f"{v2['x']!r}, {v2['y']!r})")
    edges = ",\n  ".join(values)
    return f"""
WITH {geo_cte(table, world)},
edges(poly_id, x1, y1, x2, y2) AS (VALUES
  {edges})
SELECT e.poly_id AS poly_id, g.doc_id AS doc_id
FROM geo g CROSS JOIN edges e
GROUP BY e.poly_id, g.doc_id
HAVING min((e.x2 - e.x1) * (g.y - e.y1) - (e.y2 - e.y1) * (g.x - e.x1)) >= 0
"""


def raster_near_sql(width: int, height: int, world: World = DRIVER_WORLD,
                    table: str = "documents") -> str:
    """Oracle for raster->vector nearest-doc per pixel."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world)},
pixels AS (
  SELECT b.py * {width} + a.px AS pixel_id, a.px AS px, b.py AS py,
         ({world.min_x!r} + (a.px + 0.5) / {width} * {wx!r}) AS cx,
         ({world.min_y!r} + (b.py + 0.5) / {height} * {wy!r}) AS cy
  FROM generate_series(0, {width - 1}) a(px)
  CROSS JOIN generate_series(0, {height - 1}) b(py)
)
SELECT pixel_id, px, py, doc_id
FROM (
  SELECT p.pixel_id, p.px, p.py, g.doc_id,
         row_number() OVER (
           PARTITION BY p.pixel_id
           ORDER BY (g.x - p.cx) * (g.x - p.cx) + (g.y - p.cy) * (g.y - p.cy), g.doc_id
         ) AS rn
  FROM pixels p CROSS JOIN geo g
) s WHERE rn = 1
"""


def vector_raster_sql(width: int, height: int, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """Oracle for vector->raster cover explosion (doc box -> pixels)."""
    wx, wy, _ = world.size
    pw, ph = wx / width, wy / height
    # bounds precomputed in a CTE: DuckDB 1.0's range join on inline
    # computed expressions hits an internal "flat vector" assertion
    return f"""
WITH {geo_cte(table, world)},
bounds AS (
  SELECT doc_id,
    LEAST({width - 1}, GREATEST(0, CAST(floor((x - {world.min_x!r}) / {pw!r}) AS BIGINT))) AS px0,
    LEAST({width - 1}, GREATEST(0, CAST(floor((x + w - {world.min_x!r}) / {pw!r}) AS BIGINT))) AS px1,
    LEAST({height - 1}, GREATEST(0, CAST(floor((y - {world.min_y!r}) / {ph!r}) AS BIGINT))) AS py0,
    LEAST({height - 1}, GREATEST(0, CAST(floor((y + h - {world.min_y!r}) / {ph!r}) AS BIGINT))) AS py1
  FROM geo
),
pixels AS (
  SELECT a.px AS px, b.py AS py
  FROM generate_series(0, {width - 1}) a(px)
  CROSS JOIN generate_series(0, {height - 1}) b(py)
)
SELECT g.doc_id AS doc_id, p.px AS px, p.py AS py,
       p.py * {width} + p.px AS pixel_id
FROM bounds g JOIN pixels p
  ON p.px BETWEEN g.px0 AND g.px1
 AND p.py BETWEEN g.py0 AND g.py1
"""


def delete_assign_sql(depth: int, modulus: int, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """Tile assignment after tombstone delete (doc_id % modulus == 0)."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world)},
alive AS (SELECT * FROM geo WHERE doc_id % {modulus} <> 0),
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM alive
),
{morton_ctes('cellidx', depth, carry='doc_id')}
SELECT doc_id, mkey AS cell_key FROM mz
"""


RELOC_MULTS = {"x": 2_885_564_586, "y": 2_654_435_789}


def relocate_assign_sql(depth: int, modulus: int, world: World = DRIVER_WORLD,
                        table: str = "documents") -> str:
    """Tile assignment after relocating doc_id % modulus == 0 rows to a
    rehashed position (the D3 changed-key re-shuffle, full table view)."""
    wx, wy, _ = world.size
    nx = f"({world.min_x!r} + {frac_sql('doc_id', RELOC_MULTS['x'])} * {wx!r})"
    ny = f"({world.min_y!r} + {frac_sql('doc_id', RELOC_MULTS['y'])} * {wy!r})"
    return f"""
WITH {geo_cte(table, world)},
moved AS (
  SELECT doc_id,
         CASE WHEN doc_id % {modulus} = 0 THEN {nx} ELSE x END AS x,
         CASE WHEN doc_id % {modulus} = 0 THEN {ny} ELSE y END AS y
  FROM geo
),
cellidx AS (
  SELECT doc_id, x, y,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM moved
),
{morton_ctes('cellidx', depth)}
SELECT doc_id, x, y, mkey AS cell_key FROM mz
"""


def dedup_exact_sql(table: str = "documents") -> str:
    return f"SELECT MIN(doc_id) AS doc_id, text FROM {table} GROUP BY text"


def doc_stats_sql(table: str = "documents") -> str:
    """n_chars_calc / n_ws_tokens with the same empty/whitespace-only
    semantics as functions.text.token_count."""
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_calc,
       CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE array_length(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
         AS n_ws_tokens
FROM {table}
"""


def events_window_sql(window_s: int = 3600, table: str = "events") -> str:
    return f"""
SELECT user_id,
       epoch_us(ts) // {window_s * 1_000_000} AS window_id,
       COUNT(*) AS n_events,
       round(SUM(value), 6) AS sum_value
FROM {table}
GROUP BY user_id, epoch_us(ts) // {window_s * 1_000_000}
"""


def ann_topk_sql(n_queries: int, k: int, table: str = "embeddings") -> str:
    """Cosine top-k; queries = the first n_queries vectors of the table.
    Tiebreak (score desc, vec_id asc) matches ``ann._merge_topk``."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM {table}
           WHERE vec_id < {n_queries})
SELECT query_id, vec_id, ann_rank
FROM (
  SELECT q.query_id, e.vec_id,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id
         ) AS ann_rank
  FROM {table} e CROSS JOIN q
) s WHERE ann_rank <= {k}
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


def raster_density_sql(width: int, height: int, world: World = DRIVER_WORLD,
                       table: str = "documents") -> str:
    """Per-pixel doc-coverage counts (A4-style aggregate over the
    vector->raster explosion)."""
    inner = vector_raster_sql(width, height, world, table)
    return f"SELECT pixel_id, COUNT(*) AS n_docs FROM ({inner}) t GROUP BY pixel_id"


def session_window_sql(gap_s: int = 1800, table: str = "events") -> str:
    """Session windows via lag + cumulative-sum window functions; ties on
    ts break by event_id (the engine sorts identically)."""
    gap_us = gap_s * 1_000_000
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM {table}
),
s AS (
  SELECT user_id, ts, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
)
SELECT user_id, CAST(sess AS BIGINT) AS session_id, COUNT(*) AS n_events,
       round(SUM(value), 6) AS sum_value,
       MIN(epoch_us(ts)) AS t_start_us, MAX(epoch_us(ts)) AS t_end_us
FROM s GROUP BY user_id, sess
"""


def grid_cells_sql(cell: float = 255.0, world: World = DRIVER_WORLD,
                   table: str = "documents") -> str:
    """The reference uniform-grid key (``WorldPartition.hpp:174``):
    C-style int truncation toward zero = SQL trunc()."""
    return f"""
WITH {geo_cte(table, world)}
SELECT doc_id,
       CAST(trunc(x / {cell!r}) AS BIGINT) AS grid_x,
       CAST(trunc(y / {cell!r}) AS BIGINT) AS grid_z
FROM geo
"""


def sliding_window_sql(window_s: int = 3600, slide_s: int = 900,
                       table: str = "events") -> str:
    """Sliding windows via a lateral generate_series over each event's
    window-id range — the exact twin of ``windows.sliding_window``."""
    win_us = window_s * 1_000_000
    slide_us = slide_s * 1_000_000
    return f"""
SELECT user_id, gs.w AS window_id, COUNT(*) AS n_events,
       round(SUM(value), 6) AS sum_value
FROM {table} e,
LATERAL (SELECT unnest(generate_series(
    (epoch_us(e.ts) - {win_us}) // {slide_us} + 1,
    epoch_us(e.ts) // {slide_us})) AS w) gs
GROUP BY user_id, gs.w
"""


def distinct_sources_sql(table: str = "documents") -> str:
    return f"SELECT DISTINCT source FROM {table}"


def top_docs_per_lang_sql(k: int = 3, table: str = "documents") -> str:
    """Top-k docs per language by (n_chars desc, doc_id asc)."""
    return f"""
SELECT lang, doc_id, n_chars, lang_rank
FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS lang_rank
  FROM {table}
) s WHERE lang_rank <= {k}
"""


def sales_by_nation_sql() -> str:
    """Broadcast dimension join: order revenue per customer nation."""
    return """
SELECT n.n_name AS nation, COUNT(*) AS n_orders,
       round(SUM(o.o_totalprice), 4) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def prev_value_sql(table: str = "events") -> str:
    """As-of self-join oracle: lag(value) per key ordered by (ts, event_id)."""
    return f"""
SELECT event_id, user_id, ts, value,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM {table}
"""


def median_qty_sql(table: str = "lineitem") -> str:
    """Exact discrete median per return flag (quantile_disc returns an
    actual element — bit-for-bit matchable, verified convention-equal to
    sketches.percentile_disc)."""
    return f"""
SELECT l_returnflag, quantile_disc(l_quantity, 0.5) AS p50
FROM {table} GROUP BY l_returnflag
"""


def train_split_sql(train_frac: float = 0.9, mult: int = 2_885_564_557,
                    table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       CASE WHEN {frac_sql('doc_id', mult)} < {train_frac!r}
            THEN 'train' ELSE 'val' END AS split
FROM {table}
"""


def box_join_3d_sql(nq: int, world3_min=(0.0, 0.0, 0.0),
                    world3_size=(800.0, 600.0, 50.0),
                    table: str = "documents") -> str:
    """Oracle for the 3D octree-keyed box join over driver documents: z and
    extents derived from doc_id like x/y (same frac arithmetic), queries as
    50x10x50 boxes around hashed centers (the reference per-frame search,
    ``WorldPartition.hpp:105``)."""
    wx, wy, wz = world3_size
    mx, my, mz = world3_min
    gz = f"({mz!r} + {frac_sql('doc_id', 3266489917)} * {wz!r})"
    gd = f"(0.1 + {frac_sql('doc_id', 198491317)} * 4.9)"
    h = f"(qid + {QUERY_SALT})"
    cx = f"({mx!r} + {frac_sql(h, QUERY_MULTS['cx'])} * {wx!r})"
    cy = f"({my!r} + {frac_sql(h, QUERY_MULTS['cy'])} * {wy!r})"
    cz = f"({mz!r} + {frac_sql(h, QUERY_MULTS['qw'])} * {wz!r})"
    g = geometry_sql()  # reuse w/h derivations; x/y rescaled to the 3D world
    return f"""
WITH geo AS (
  SELECT doc_id,
         ({mx!r} + {frac_sql('doc_id', GEO_MULTS['x'])} * {wx!r}) AS x,
         ({my!r} + {frac_sql('doc_id', GEO_MULTS['y'])} * {wy!r}) AS y,
         {gz} AS z,
         (0.1 + {frac_sql('doc_id', GEO_MULTS['w'])} * 9.9) AS w,
         (0.1 + {frac_sql('doc_id', GEO_MULTS['h'])} * 9.9) AS h,
         {gd} AS d
  FROM {table}
),
q AS (
  SELECT qid AS query_id,
         {cx} - 25.0 AS min_x, {cy} - 5.0 AS min_y, {cz} - 25.0 AS min_z,
         {cx} + 25.0 AS max_x, {cy} + 5.0 AS max_y, {cz} + 25.0 AS max_z
  FROM generate_series(0, {nq - 1}) t(qid)
)
SELECT q.query_id AS query_id, g.doc_id AS doc_id
FROM geo g JOIN q
  ON g.x <= q.max_x AND g.x + g.w >= q.min_x
 AND g.y <= q.max_y AND g.y + g.h >= q.min_y
 AND g.z <= q.max_z AND g.z + g.d >= q.min_z
"""

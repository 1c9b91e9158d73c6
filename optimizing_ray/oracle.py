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
    SPAN_MULTS, SPAN_SALT, SPAN_TOKENS, frac_sql, geometry_sql,
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


def hilbert_ctes(src_cte: str, depth: int, carry: str = "doc_id",
                 ix: str = "ix", iy: str = "iy") -> str:
    """CTE chain replaying ``cells.hilbert_d`` bit by bit (MSB first):
    quadrant digit as a CASE on the two bit tests (no XOR), then the
    masked rotate/reflect — final CTE ``hz`` carries ``hkey``."""
    parts = [f"h0 AS (SELECT {carry}, CAST(0 AS BIGINT) AS hd, "
             f"{ix} AS hx, {iy} AS hy FROM {src_cte})"]
    prev = "h0"
    for t, b in enumerate(range(depth - 1, -1, -1), start=1):
        s = 1 << b
        m = s - 1
        parts.append(f"""h{t} AS (SELECT {carry},
  hd + {s * s} * (CASE WHEN (hx & {s}) = 0 AND (hy & {s}) = 0 THEN 0
                  WHEN (hx & {s}) = 0 THEN 1
                  WHEN (hy & {s}) = 0 THEN 3 ELSE 2 END) AS hd,
  CASE WHEN (hy & {s}) > 0 THEN (hx & {m})
       WHEN (hx & {s}) > 0 THEN {m} - (hy & {m})
       ELSE (hy & {m}) END AS hx,
  CASE WHEN (hy & {s}) > 0 THEN (hy & {m})
       WHEN (hx & {s}) > 0 THEN {m} - (hx & {m})
       ELSE (hx & {m}) END AS hy
  FROM {prev})""")
        prev = f"h{t}"
    parts.append(f"hz AS (SELECT {carry}, hd AS hkey FROM {prev})")
    return ", ".join(parts)


def hilbert_assign_sql(depth: int, world: World = DRIVER_WORLD,
                       table: str = "documents") -> str:
    """stages.assign.assign_hilbert_batch twin."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{hilbert_ctes('cellidx', depth, carry='doc_id, ix, iy')}
SELECT doc_id, ix AS cell_ix, iy AS cell_iy, hkey
FROM hz ORDER BY doc_id"""


def focal_stats_sql(depth: int, world: World = DRIVER_WORLD,
                    table: str = "documents") -> str:
    """raster.focal_stats twin: per-cell counts, a 9-offset cross join
    with the bounds filter in WHERE (precomputed jx/jy CTE — the
    range-join-assertion-safe shape), COALESCE'd neighbor sum (self
    always matches, so never NULL), n_cells = count of in-grid
    offsets, Morton key attached to the center cell."""
    wx, wy, _ = world.size
    n = 1 << depth
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1))
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n
        FROM cellidx GROUP BY ix, iy),
off AS (SELECT * FROM (VALUES {offs}) t(dx, dy)),
ce AS (SELECT c.ix, c.iy, c.n, c.ix + o.dx AS jx, c.iy + o.dy AS jy
       FROM cnt c, off o),
cef AS (SELECT * FROM ce
        WHERE jx BETWEEN 0 AND {n - 1} AND jy BETWEEN 0 AND {n - 1}),
fc AS (SELECT cef.ix AS ix, cef.iy AS iy, cef.n AS n,
              COALESCE(SUM(nb.n), 0) AS focal,
              CAST(count(*) AS BIGINT) AS ncells
       FROM cef LEFT JOIN cnt nb ON nb.ix = cef.jx AND nb.iy = cef.jy
       GROUP BY cef.ix, cef.iy, cef.n),
{morton_ctes('fc', depth, carry='n, focal, ncells')}
SELECT mkey AS cell_key, CAST(n AS BIGINT) AS n_docs,
       CAST(focal AS BIGINT) AS focal_docs, ncells AS n_cells
FROM mz ORDER BY cell_key"""


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
    Tiebreak (score desc, vec_id asc) matches ``ann._driver_merge``."""
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


def source_cap_sql(k: int = 20, table: str = "documents") -> str:
    """Per-source document cap: the k smallest doc_ids per source with
    their 1-based crawl-order rank (textops.source_cap twin)."""
    return f"""
SELECT source, doc_id, src_rank
FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
  FROM {table}
) s WHERE src_rank <= {k}
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


def global_rank_sql(table: str = "documents") -> str:
    """Distributed sample-sort oracle: exact total-order rank by
    (n_chars, doc_id) — sort.global_rank twin."""
    return f"""
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
         AS global_rank
FROM {table}
"""


def running_total_sql(table: str = "events") -> str:
    """Cumulative-window oracle: per-key running total of fixed-point
    cents ordered by (ts, event_id) — int64 prefix sums are order-exact,
    so the window twin matches windows.running_total bit-for-bit."""
    return f"""
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS run_cents
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


# ===========================================================================
# Round-2 oracles: the previously rows-only training-data operators.
#
# Shared trick: all engine-side hashes in these operators are plain
# mod-2^64 integer arithmetic (polynomial byte folds + murmur3 fmix64),
# which DuckDB reproduces bit-for-bit with HUGEINT intermediates — a
# 64x64-bit multiply mod 2^64 is expressed by splitting one operand into
# 32-bit halves so no intermediate exceeds 2^97 (HUGEINT holds 2^127-1),
# and xor/bit_count run on the signed BIGINT bit pattern.  IMPORTANT:
# every value returned to the driver is cast to BIGINT — a HUGEINT result
# column goes through float64 in `.df()` and silently loses low bits.
# ===========================================================================

_M64 = "CAST('18446744073709551616' AS HUGEINT)"
_FMIX_C1 = 0xFF51AFD7ED558CCD
_FMIX_C2 = 0xC4CEB9FE1A85EC53


def _mulmod64(a: str, c: int) -> str:
    """(a * c) mod 2^64 for uint64-valued HUGEINT `a` without overflow."""
    return (f"((({a}) % 4294967296) * {c} + "
            f"(((({a}) // 4294967296) * {c}) % 4294967296) * 4294967296) % {_M64}")


def _xorshift33(u: str) -> str:
    """u ^ (u >> 33) for uint64-valued HUGEINT `u` (xor on the BIGINT bit
    pattern; the shifted value is < 2^31 so it is its own bit pattern)."""
    to_s = (f"CAST(CASE WHEN ({u}) >= 9223372036854775808 THEN ({u}) - {_M64} "
            f"ELSE ({u}) END AS BIGINT)")
    shift = f"CAST(({u}) // 8589934592 AS BIGINT)"
    x = f"xor({to_s}, {shift})"
    return (f"(CASE WHEN {x} < 0 THEN CAST({x} AS HUGEINT) + {_M64} "
            f"ELSE CAST({x} AS HUGEINT) END)")


def _u64_to_i64(u: str) -> str:
    """uint64-valued HUGEINT -> signed BIGINT bit pattern."""
    return (f"CAST(CASE WHEN ({u}) >= 9223372036854775808 THEN ({u}) - {_M64} "
            f"ELSE ({u}) END AS BIGINT)")


def simhash_ctes(table: str = "documents") -> str:
    """CTE chain computing each doc's 64-bit simhash — the exact twin of
    ``dedup.simhash64``/``token_hash64`` (polynomial byte fold base
    1000003 + fmix64 finalizer + strict-majority bit vote).  Byte values
    come from ``unicode()`` code points == UTF-8 bytes for the ASCII
    driver corpus.  Final CTE ``sim(doc_id, sim)`` with BIGINT sim."""
    bit_sums = ",\n    ".join(
        f"SUM(CAST((h // {1 << b}) % 2 AS BIGINT)) AS b{b}" for b in range(64))
    sim_expr = " + ".join(
        f"CAST(CASE WHEN 2 * b{b} > n_tok THEN {1 << b} ELSE 0 END AS HUGEINT)"
        for b in range(64))
    return f"""toks AS (
  SELECT doc_id, tok, length(tok) AS L, row_number() OVER () AS tid
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM {table}) u
  WHERE tok <> ''
),
poly AS (
  SELECT tid, doc_id, L, 1 AS i, CAST(0 AS HUGEINT) AS h, tok FROM toks
  UNION ALL
  SELECT tid, doc_id, L, i + 1,
         (h * 1000003 + unicode(substr(tok, i, 1))) % {_M64}, tok
  FROM poly WHERE i <= L
),
ph AS (SELECT tid, doc_id, h FROM poly WHERE i = L + 1),
fm1 AS (SELECT tid, doc_id, {_xorshift33('h')} AS h FROM ph),
fm2 AS (SELECT tid, doc_id, {_mulmod64('h', _FMIX_C1)} AS h FROM fm1),
fm3 AS (SELECT tid, doc_id, {_xorshift33('h')} AS h FROM fm2),
fm4 AS (SELECT tid, doc_id, {_mulmod64('h', _FMIX_C2)} AS h FROM fm3),
fm5 AS (SELECT tid, doc_id, {_xorshift33('h')} AS h FROM fm4),
votes AS (SELECT doc_id, COUNT(*) AS n_tok,
    {bit_sums}
  FROM fm5 GROUP BY doc_id),
simu AS (SELECT doc_id, ({sim_expr}) AS su FROM votes),
sim AS (SELECT doc_id, {_u64_to_i64('su')} AS sim FROM simu)"""


def simhash_pairs_sql(max_hamming: int = 3, table: str = "documents") -> str:
    """Oracle for simhash near-dup pairs: the banding in
    ``dedup.simhash_pairs`` is pigeonhole-COMPLETE for hamming <=
    max_hamming <= 3, so the engine output is exactly the cross-join
    hamming filter over the recomputed simhashes."""
    return f"""
WITH RECURSIVE {simhash_ctes(table)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= {max_hamming}
"""


def minhash_pairs_sql(k_shingle: int = 5, jaccard_threshold: float = 0.5,
                      table: str = "documents") -> str:
    """Oracle for MinHash+LSH near-dup pairs: EXACT character-k-shingle
    Jaccard over a cross join.  The engine's LSH stage is probabilistic
    recall but its verify stage computes exact Jaccard, and on the driver
    corpus every true pair has jaccard >= 0.92, where the 16x4 banding
    miss probability is < 1e-8 per pair — verified equal on the fixed
    test data (the oracle is the ground-truth exhaustive plan,
    ``.Test/cacheQuadTree.cpp:425-441`` pattern)."""
    return f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substring(text, i, {k_shingle}) AS s
  FROM {table},
       LATERAL (SELECT unnest(generate_series(1, greatest(1, length(text) - {k_shingle - 1}))) AS i) g
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ninter / CAST(sa.n + sb.n - ninter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ninter / CAST(sa.n + sb.n - ninter AS DOUBLE) >= {jaccard_threshold!r}
"""


def fingerprints_sql(window: int = 8, table: str = "documents") -> str:
    """Oracle for the rolling-hash fingerprint (``text.fingerprint64``):
    XOR over all window-gram Rabin-Karp hashes, base 1000003 mod 2^64.
    Valid for texts of length >= window (the driver corpus minimum is 44;
    shorter texts take the engine's zero-pad branch which this SQL does
    not reproduce)."""
    B = 1000003
    pows = [pow(B, window - 1 - i, 1 << 64) for i in range(window)]
    terms = " + ".join(
        f"CAST(unicode(substr(text, i + {i}, 1)) AS HUGEINT) * "
        f"CAST('{pows[i]}' AS HUGEINT)" for i in range(window))
    return f"""
WITH wins AS (
  SELECT doc_id, (({terms}) % {_M64}) AS h
  FROM {table},
       LATERAL (SELECT unnest(generate_series(1, length(text) - {window - 1})) AS i) g
)
SELECT doc_id, bit_xor({_u64_to_i64('h')}) AS fingerprint
FROM wins GROUP BY doc_id
"""


_STOPWORD_SQL = {
    "en": "'the','and','of','to','a','in','is','it','that','was'",
    "fr": "'le','la','les','et','de','des','un','une','est','que'",
    "de": "'der','die','das','und','ist','nicht','ein','eine','zu','mit'",
    "es": "'el','la','los','las','y','de','que','es','un','una'",
}


def text_analysis_ctes(table: str = "documents") -> str:
    """CTE chain producing per-doc lang_pred / lang_conf / quality /
    n_tokens — the exact twin of ``functions.text.TextAnalyzer``
    (stopword-hit argmax with first-wins ties in dict order en,fr,de,es;
    the 4-component quality composite; whitespace token counts).  Float
    expressions mirror the Python operation ORDER so doubles are
    bit-identical; round(x, 6) differs from Python only at exact decimal
    halfway points, which the rational component values cannot hit.
    Final CTE ``ta(doc_id, lang_pred, lang_conf, quality, n_tokens)``."""
    hits = ",\n    ".join(
        f"COUNT(*) FILTER (WHERE tok IN ({words})) AS {lang}_hits"
        for lang, words in _STOPWORD_SQL.items())
    return f"""tatoks AS (
  SELECT doc_id, lower(tok) AS tok
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM {table}) u
  WHERE tok <> ''
),
tastats AS (
  SELECT doc_id, COUNT(*) AS n_toks,
    {hits}
  FROM tatoks GROUP BY doc_id
),
tafeat AS (
  SELECT d.doc_id, length(d.text) AS n, s.n_toks,
         s.en_hits, s.fr_hits, s.de_hits, s.es_hits,
         greatest(s.en_hits, s.fr_hits, s.de_hits, s.es_hits) AS mh,
         (length(d.text) - length(regexp_replace(d.text, '[^\\w\\s]', '', 'g'))) AS n_punct
  FROM {table} d JOIN tastats s USING (doc_id)
),
tascore AS (
  SELECT doc_id, n, n_toks, mh,
    CASE WHEN mh = 0 THEN 'und'
         WHEN en_hits = mh THEN 'en' WHEN fr_hits = mh THEN 'fr'
         WHEN de_hits = mh THEN 'de' ELSE 'es' END AS lang_pred,
    CASE WHEN mh = 0 THEN 0.0 ELSE mh / CAST(n_toks AS DOUBLE) END AS stop_ratio,
    LEAST(1.0, n / 500.0) AS len_score,
    GREATEST(0.0, 1.0 - abs(n / CAST(n_toks AS DOUBLE) - 6.0) / 10.0) AS tok_score,
    GREATEST(0.0, 1.0 - 4.0 * (n_punct / CAST(n AS DOUBLE))) AS punct_score
  FROM tafeat
),
ta AS (
  SELECT doc_id, lang_pred, stop_ratio AS lang_conf,
         floor(0.25 * (len_score + tok_score + punct_score
                       + LEAST(1.0, 4.0 * stop_ratio)) * 1e6 + 0.5) / 1e6 AS quality,
         CAST(n_toks AS BIGINT) AS n_tokens
  FROM tascore
)"""


def text_analysis_sql(table: str = "documents") -> str:
    return f"""
WITH {text_analysis_ctes(table)}
SELECT d.doc_id, d.lang, t.lang_pred, t.lang_conf, t.quality, t.n_tokens
FROM {table} d JOIN ta t USING (doc_id)
"""


def curate_sql(min_quality: float = 0.2, train_frac: float = 0.9,
               mult: int = 2_885_564_557, table: str = "documents") -> str:
    """Oracle for the composed curation funnel: exact dedup winners (min
    doc_id per text) -> text analysis -> quality gate -> id-hash split."""
    return f"""
WITH winners AS (SELECT MIN(doc_id) AS doc_id FROM {table} GROUP BY text),
{text_analysis_ctes(table)}
SELECT w.doc_id, t.lang_pred, t.quality,
       CASE WHEN {frac_sql('w.doc_id', mult)} < {train_frac!r}
            THEN 'train' ELSE 'val' END AS split
FROM winners w JOIN ta t ON t.doc_id = w.doc_id
WHERE t.quality >= {min_quality!r}
"""


def embedding_near_dup_sql(threshold: float = 0.9, plant_mod: int = 25,
                           plant_offset: int = 10_000_000,
                           table: str = "embeddings") -> str:
    """Oracle for embedding near-dup pairs over the PLANTED corpus (the
    base table + an exact copy of every ``vec_id % plant_mod == 0`` row
    under ``vec_id + plant_offset`` — identical vectors give identical
    LSH signatures, so the engine's recall on the planted pairs is
    certain).  Exact cross-join cosine filter; embeddings cast to DOUBLE
    so both engines do float64 math; cosine floor-rounded to 6 decimals
    (summation order differs between numpy and DuckDB).

    GATED ON THE PLANTED PAIRS ONLY (``b = a + plant_offset``): an
    organic non-identical pair with cosine just above the threshold has
    ~0.996 LSH recall at 12-bit/32-band settings, so including organic
    pairs would make the gate data-dependent — it could fail on a future
    corpus through no engine bug (round-2 ADVICE).  The engine query
    applies the same filter; general recall is pytest-verified."""
    return f"""
WITH aug AS (
  SELECT vec_id, embedding FROM {table}
  UNION ALL
  SELECT vec_id + {plant_offset}, embedding FROM {table}
  WHERE vec_id % {plant_mod} = 0
),
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM aug)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       floor(list_cosine_similarity(a.e, b.e) * 1e6 + 0.5) / 1e6 AS cosine
FROM v a JOIN v b ON b.vec_id = a.vec_id + {plant_offset}
WHERE floor(list_cosine_similarity(a.e, b.e) * 1e6 + 0.5) / 1e6 >= {threshold!r}
"""


def adaptive_assign_sql(capacity: int, coarse_depth: int, max_depth: int,
                        world: World = DRIVER_WORLD,
                        table: str = "documents") -> str:
    """Oracle for the adaptive capacity-split assignment
    (``stages.adaptive.adaptive_assign``): a doc's leaf is its shallowest
    ancestor cell (depth coarse..max) whose subtree count <= capacity,
    else the max-depth cell — the order-free closure of the reference
    subdivision rule (``DynamicOctree.hpp:130-143``).  Keys are
    sentinel-tagged Morton keys; ancestor keys derive from the max-depth
    key by right-shifting bit pairs.  Salt is 0 (the driver query's
    salt_threshold exceeds every cell count)."""
    wx, wy, _ = world.size
    sentinel = 1 << (2 * max_depth)
    key_defs = []
    for d in range(coarse_depth, max_depth):
        key_defs.append(f"raw // {1 << (2 * (max_depth - d))} + {1 << (2 * d)} AS k{d}")
    key_defs.append(f"raw + {sentinel} AS k{max_depth}")
    counts = ",\n".join(
        f"c{d} AS (SELECT k{d}, count(*) AS n FROM keys GROUP BY k{d})"
        for d in range(coarse_depth, max_depth))
    joins = "\n".join(f"JOIN c{d} USING (k{d})"
                      for d in range(coarse_depth, max_depth))
    case = "\n       ".join(
        f"WHEN c{d}.n <= {capacity} THEN k{d}"
        for d in range(coarse_depth, max_depth))
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id, x, y,
         {cell_idx_expr('x', world.min_x, wx, max_depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, max_depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', max_depth, carry='doc_id')},
keys AS (
  SELECT doc_id, {", ".join(key_defs)}
  FROM (SELECT doc_id, mkey - {sentinel} AS raw FROM mz) t
),
{counts}
SELECT doc_id,
       CASE {case}
            ELSE k{max_depth} END AS cell_key,
       CAST(0 AS BIGINT) AS salt
FROM keys
{joins}
"""


def _xorshift(u: str, s: int) -> str:
    """u ^ (u >> s) for uint64-valued HUGEINT `u` (s >= 1 so the shifted
    value is nonnegative in BIGINT)."""
    to_s = (f"CAST(CASE WHEN ({u}) >= 9223372036854775808 THEN ({u}) - {_M64} "
            f"ELSE ({u}) END AS BIGINT)")
    shift = f"CAST(({u}) // {1 << s} AS BIGINT)"
    x = f"xor({to_s}, {shift})"
    return (f"(CASE WHEN {x} < 0 THEN CAST({x} AS HUGEINT) + {_M64} "
            f"ELSE CAST({x} AS HUGEINT) END)")


def hll_distinct_sql(col: str = "user_id", table: str = "events",
                     p: int = 12) -> str:
    """Oracle for the HLL distinct-count sketch: recomputes the EXACT
    same registers (splitmix64 hash, top-p bucket, leading-zero rank) and
    the exact-integer harmonic sum, so the approximate estimate is
    bit-reproducible (``sketches._hll_registers``/``_hll_estimate``).
    Works for integer id columns (the splitmix path)."""
    m = 1 << p
    gamma, c1, c2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    # leading-zero binary scan, exact twin of the numpy loop
    lz_steps = []
    prev = "r0"
    for i, s in enumerate((32, 16, 8, 4, 2, 1), start=1):
        lz_steps.append(
            f"r{i} AS (SELECT bucket, rest, "
            f"lz + CASE WHEN r < CAST('{1 << (64 - s)}' AS HUGEINT) THEN {s} ELSE 0 END AS lz, "
            f"CASE WHEN r < CAST('{1 << (64 - s)}' AS HUGEINT) "
            f"THEN (r * {1 << s}) % {_M64} ELSE r END AS r "
            f"FROM r{i - 1})")
        prev = f"r{i}"
    lz_sql = ",\n".join(lz_steps)
    alpha = "(0.7213 / (1 + 1.079 / 4096.0))"
    return f"""
WITH u0 AS (SELECT DISTINCT CAST(CASE WHEN {col} < 0
                 THEN CAST({col} AS HUGEINT) + {_M64}
                 ELSE CAST({col} AS HUGEINT) END AS HUGEINT) AS u FROM {table}),
z1 AS (SELECT ((u + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h FROM u0),
z2 AS (SELECT {_xorshift('h', 30)} AS h FROM z1),
z3 AS (SELECT {_mulmod64('h', c1)} AS h FROM z2),
z4 AS (SELECT {_xorshift('h', 27)} AS h FROM z3),
z5 AS (SELECT {_mulmod64('h', c2)} AS h FROM z4),
hf AS (SELECT {_xorshift('h', 31)} AS h FROM z5),
br AS (SELECT h // {1 << (64 - p)} AS bucket, (h * {1 << p}) % {_M64} AS rest FROM hf),
r0 AS (SELECT bucket, rest, 0 AS lz, rest AS r FROM br),
{lz_sql},
ranked AS (SELECT bucket,
             CASE WHEN rest = 0 THEN {64 - p + 1} ELSE lz + 1 END AS rank
           FROM r6),
regs AS (SELECT bucket, MAX(rank) AS reg FROM ranked GROUP BY bucket),
agg AS (SELECT COUNT(*) AS present,
               SUM(CAST(pow(2.0, 64 - reg) AS HUGEINT)) AS s_present
        FROM regs),
est AS (
  SELECT {m} - present AS zeros,
         {alpha} * 4096.0 * 4096.0 /
           (CAST(s_present + ({m} - present) * {_M64} AS DOUBLE)
            / 18446744073709551616.0) AS raw
  FROM agg
)
SELECT 'distinct_users_hll' AS metric,
       floor(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                  THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END * 1e6 + 0.5)
         / 1e6 AS estimate
FROM est
"""


def user_median_sql(table: str = "events") -> str:
    """Oracle for the grouped quantile sketch at driver scale: every
    per-(batch, user) group is far below the summary size k, so the
    sketch provably equals the exact discrete median (quantile_disc)."""
    return f"""
SELECT user_id, quantile_disc(value, 0.5) AS p50
FROM {table} GROUP BY user_id
"""


def span_passthrough_sql(nq: int, world: World = DRIVER_WORLD,
                         table: str = "documents") -> str:
    """Oracle for the span-sequence invariant: the box join of
    ``box_join_sql`` plus a per-doc 64-bit fingerprint over the ORDERED
    derived spans (driver_tables.derive_spans_batch /
    span_fingerprint_batch twins).  Per span h = polynomial byte fold
    (base 1000003 mod 2^64) of kind||US||text||US||media_ref then
    h*B+offset; per doc fp = sum of h * FNV^(n_spans-1-ordinal) mod 2^64
    (== the engine's left fold).  Fingerprint equality proves the engine
    carried every span byte- and order-exact through the join."""
    B, FNV = 1_000_003, 1_099_511_628_211
    toks = "[" + ", ".join(f"'{t}'" for t in SPAN_TOKENS) + "]"
    ntok = len(SPAN_TOKENS)
    skey = "(doc_id * 16 + ord)"
    fnv_pow = {k: pow(FNV, k, 1 << 64) for k in range(1, 8)}
    hw_cases = " ".join(
        f"WHEN {k} THEN {_mulmod64('h', fnv_pow[k])}" for k in range(1, 8))
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
{driver_queries_cte(nq, world)},
joined AS (
  SELECT q.query_id AS query_id, g.doc_id AS doc_id
  FROM geo g
  JOIN q ON g.x <= q.max_x AND g.x + g.w >= q.min_x
        AND g.y <= q.max_y AND g.y + g.h >= q.min_y),
din AS (SELECT DISTINCT doc_id FROM joined),
ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM din),
sp AS (SELECT doc_id, n_spans,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, n_spans, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t1'])} * {ntok}) AS BIGINT) AS t1,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t2'])} * {ntok}) AS BIGINT) AS t2,
         1 + CAST(floor({frac_sql(skey, SPAN_MULTS['len'])} * 64) AS BIGINT) AS span_len
        FROM sp),
fld2 AS (SELECT doc_id, n_spans, ord,
          CASE kind_i WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS kind,
          CASE WHEN kind_i = 0 THEN {toks}[t1 + 1] || ' ' || {toks}[t2 + 1] ELSE '' END AS txt,
          CASE WHEN kind_i <> 0 THEN 'media://doc-' || lpad(CAST(doc_id AS VARCHAR), 12, '0')
                                     || '/' || CAST(ord AS VARCHAR) ELSE '' END AS media,
          COALESCE(SUM(span_len) OVER (PARTITION BY doc_id ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM fld),
comb AS (SELECT doc_id, n_spans, ord, off,
          kind || chr(31) || txt || chr(31) || media AS c,
          length(kind || chr(31) || txt || chr(31) || media) AS L
         FROM fld2),
poly AS (
  SELECT doc_id, n_spans, ord, off, c, L, 1 AS i, CAST(0 AS HUGEINT) AS h FROM comb
  UNION ALL
  SELECT doc_id, n_spans, ord, off, c, L, i + 1,
         (h * {B} + unicode(substr(c, i, 1))) % {_M64}
  FROM poly WHERE i <= L),
ph AS (SELECT doc_id, n_spans, ord,
         ((h * {B} + off) % {_M64}) AS h
       FROM poly WHERE i = L + 1),
wt AS (SELECT doc_id,
         CASE (n_spans - 1 - ord) WHEN 0 THEN h {hw_cases} END AS hw
       FROM ph),
fpd AS (SELECT doc_id, SUM(hw) % {_M64} AS fp FROM wt GROUP BY doc_id)
SELECT j.query_id AS query_id, j.doc_id AS doc_id,
       {_u64_to_i64('fp')} AS span_fp
FROM joined j JOIN fpd USING (doc_id)
"""


def trace_first_hit_sql(width: int, height: int) -> str:
    """DuckDB twin of ``tracer.first_hits`` (the reference's nearest-hit
    raycast scan, ``Raytracing.hpp:640-669``) over pixel-CENTER camera
    rays: recomputes the per-pixel ray (fx/fy -> d -> origin ->
    normalize), the sphere quadratic (``rays.ray_sphere``) and the AABB
    slab test (``rays.ray_aabb``, reciprocal-multiply like numpy — NOT
    division, which differs in the last ulp), then picks the nearest
    t > 1e-4 with first-object tie-break.  All expressions preserve the
    numpy evaluation order so doubles match bit-for-bit; t_hit is
    floor-rounded at 1e-6 on both sides (shared rounding discipline).
    Camera BASIS constants (normalized direction, ax/ay) are embedded as
    shortest-roundtrip literals computed by the same numpy code — they
    are scene configuration, like the sphere coordinates."""
    import numpy as np
    from optimizing_ray.pipelines.tracer import (CAM_DIR, CAM_POS,
                                                 cornell_scene)
    sc = cornell_scene()
    rows = []
    for i in range(len(sc["type"])):
        rows.append(
            f"({i}, {int(sc['type'][i])}, {sc['px'][i]!r}, {sc['py'][i]!r},"
            f" {sc['pz'][i]!r}, {sc['sx'][i]!r}, {sc['sy'][i]!r},"
            f" {sc['sz'][i]!r}, {sc['radius'][i]!r})")
    scene_values = ",\n    ".join(rows)
    # camera basis exactly as make_camera_rays computes it
    ax = np.asarray([width * 0.5135 / height, 0.0, 0.0])
    ay = np.cross(ax, CAM_DIR)
    ay = ay / np.linalg.norm(ay) * 0.5135
    axx, ayy, ayz = ax[0], ay[1], ay[2]
    cdx, cdy, cdz = CAM_DIR
    cpx, cpy, cpz = CAM_POS
    return f"""
WITH scene(idx, typ, spx, spy, spz, ssx, ssy, ssz, sr) AS (VALUES
    {scene_values}
),
pix AS (
  SELECT (py * {width} + px) AS pixel_id, px, py
  FROM range({width}) t1(px) CROSS JOIN range({height}) t2(py)
),
d0 AS (
  SELECT pixel_id, px, py,
         ({axx!r} * ((px + 0.5) / {width} - 0.5) + {cdx!r}) AS dx0,
         ({ayy!r} * ((py + 0.5) / {height} - 0.5) + {cdy!r}) AS dy0,
         ({ayz!r} * ((py + 0.5) / {height} - 0.5) + {cdz!r}) AS dz0
  FROM pix
),
ray AS (
  SELECT pixel_id, px, py,
         ({cpx!r} + dx0 * 140.0) AS ox,
         ({cpy!r} + dy0 * 140.0) AS oy,
         ({cpz!r} + dz0 * 140.0) AS oz,
         dx0 / sqrt((dx0*dx0 + dy0*dy0) + dz0*dz0) AS dx,
         dy0 / sqrt((dx0*dx0 + dy0*dy0) + dz0*dz0) AS dy,
         dz0 / sqrt((dx0*dx0 + dy0*dy0) + dz0*dz0) AS dz
  FROM d0
),
geo AS (
  SELECT r.pixel_id, r.px, r.py, s.idx, s.typ, s.sr,
         r.dx, r.dy, r.dz, r.ox, r.oy, r.oz,
         (s.spx - r.ox) AS lx, (s.spy - r.oy) AS ly, (s.spz - r.oz) AS lz,
         s.spx AS bx0, (s.spx + s.ssx) AS bx1,
         s.spy AS by0, (s.spy + s.ssy) AS by1,
         s.spz AS bz0, (s.spz + s.ssz) AS bz1,
         (1.0 / r.dx) AS ivx, (1.0 / r.dy) AS ivy, (1.0 / r.dz) AS ivz
  FROM ray r CROSS JOIN scene s
),
sph AS (
  SELECT *, ((lx*dx + ly*dy) + lz*dz) AS b FROM geo
),
sph2 AS (
  SELECT *, ((b*b - ((lx*lx + ly*ly) + lz*lz)) + sr*sr) AS det FROM sph
),
sph3 AS (
  SELECT *, sqrt(greatest(det, 0.0)) AS sq,
         least((bx0-ox)*ivx, (bx1-ox)*ivx) AS txl,
         greatest((bx0-ox)*ivx, (bx1-ox)*ivx) AS txh,
         least((by0-oy)*ivy, (by1-oy)*ivy) AS tyl,
         greatest((by0-oy)*ivy, (by1-oy)*ivy) AS tyh,
         least((bz0-oz)*ivz, (bz1-oz)*ivz) AS tzl,
         greatest((bz0-oz)*ivz, (bz1-oz)*ivz) AS tzh
  FROM sph2
),
slab AS (
  SELECT *, greatest(greatest(txl, tyl), tzl) AS tmn,
            least(least(txh, tyh), tzh) AS tmx
  FROM sph3
),
tt AS (
  SELECT pixel_id, px, py, idx,
    CASE WHEN typ = 0 THEN
      CASE WHEN det >= 0.0 THEN
        CASE WHEN (b - sq) > 1e-4 THEN (b - sq)
             WHEN (b + sq) > 1e-4 THEN (b + sq)
             ELSE 0.0 END
      ELSE 0.0 END
    ELSE
      CASE WHEN tmx >= greatest(tmn, 0.0) THEN
        CASE WHEN tmn < 0.0 THEN tmx ELSE tmn END
      ELSE 0.0 END
    END AS t
  FROM slab
),
best AS (
  SELECT pixel_id, idx, t,
         row_number() OVER (PARTITION BY pixel_id
                            ORDER BY t ASC, idx ASC) AS rn
  FROM tt WHERE t > 1e-4
)
SELECT p.pixel_id, CAST(p.px AS BIGINT) AS px, CAST(p.py AS BIGINT) AS py,
       CAST(COALESCE(b.idx, -1) AS BIGINT) AS hit_id,
       COALESCE(floor(b.t * 1e6 + 0.5) / 1e6, 0.0) AS t_hit
FROM pix p LEFT JOIN best b ON b.pixel_id = p.pixel_id AND b.rn = 1
"""


def media_features_sql(table: str = "documents") -> str:
    """DuckDB twin of ``media.extract_media_features`` over driver docs
    with derived spans: re-derives the media spans (same CTE arithmetic
    as ``span_passthrough_sql``), recomputes the fixture pixel / sample
    values (``codecs.image_pixels`` / ``codecs.audio_samples`` — plain
    BIGINT arithmetic), and aggregates the SAME integer stats per doc.
    The engine path goes ref -> real PNG/WAV bytes -> real stdlib decode
    -> stats; the oracle skips the codec roundtrip — equality therefore
    PROVES the encoder+decoder reconstruct every pixel/sample exactly
    (a wrong scanline filter or sample width breaks the hash gate).
    All divisions are one exact-integer-over-integer double op, finished
    by the shared floor-round(1e-6); min/max/crossings are integers."""
    from optimizing_ray.stages.codecs import IMG_H, IMG_W, N_SAMPLES, PIX_MOD
    npx, ns_ = IMG_W * IMG_H, N_SAMPLES
    skey = "(doc_id * 16 + ord)"
    r6 = "floor({} * 1e6 + 0.5) / 1e6"
    return f"""
WITH ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i
        FROM sp),
med AS (SELECT doc_id, ord, kind_i,
         (doc_id * 16 + ord) % {PIX_MOD} AS base
        FROM fld WHERE kind_i <> 0),
cnt AS (SELECT doc_id, COUNT(*) AS n_media,
         SUM(CASE WHEN kind_i = 1 THEN 1 ELSE 0 END) AS n_img,
         SUM(CASE WHEN kind_i = 2 THEN 1 ELSE 0 END) AS n_aud
        FROM med GROUP BY doc_id),
imgpix AS (SELECT doc_id, p.p AS p,
            (base * (p.p + 1) + ((p.p * p.p) % 257) * 31) % 256 AS v
           FROM med, range({npx * 3}) p(p) WHERE kind_i = 1),
imga AS (SELECT doc_id,
          SUM(CASE WHEN p % 3 = 0 THEN v ELSE 0 END) AS sum_r,
          SUM(CASE WHEN p % 3 = 1 THEN v ELSE 0 END) AS sum_g,
          SUM(CASE WHEN p % 3 = 2 THEN v ELSE 0 END) AS sum_b,
          MIN(v) AS vmin, MAX(v) AS vmax
         FROM imgpix GROUP BY doc_id),
audx AS (SELECT doc_id, ord, i.i AS i,
          ((base * (i.i + 1) + i.i * i.i * 7) % 4096) - 2048 AS x
         FROM med, range({ns_}) i(i) WHERE kind_i = 2),
audl AS (SELECT doc_id, x,
          lag(x) OVER (PARTITION BY doc_id, ord ORDER BY i) AS xp
         FROM audx),
auda AS (SELECT doc_id, SUM(x) AS sum_x, SUM(x * x) AS sum_x2,
          SUM(CASE WHEN xp IS NOT NULL AND xp * x < 0 THEN 1 ELSE 0 END) AS crossings
         FROM audl GROUP BY doc_id)
SELECT d.doc_id,
  CAST(COALESCE(c.n_media, 0) AS BIGINT) AS n_media_spans,
  CAST(COALESCE(c.n_img, 0) AS BIGINT) AS n_img,
  CAST(COALESCE(c.n_aud, 0) AS BIGINT) AS n_aud,
  COALESCE({r6.format(f'(CAST(ia.sum_r AS DOUBLE) / (c.n_img * {float(npx)!r}))')}, 0.0) AS img_mean_r,
  COALESCE({r6.format(f'(CAST(ia.sum_g AS DOUBLE) / (c.n_img * {float(npx)!r}))')}, 0.0) AS img_mean_g,
  COALESCE({r6.format(f'(CAST(ia.sum_b AS DOUBLE) / (c.n_img * {float(npx)!r}))')}, 0.0) AS img_mean_b,
  CAST(COALESCE(ia.vmin, 0) AS BIGINT) AS img_min,
  CAST(COALESCE(ia.vmax, 0) AS BIGINT) AS img_max,
  COALESCE({r6.format(f'(CAST(aa.sum_x AS DOUBLE) / (c.n_aud * {float(ns_)!r}))')}, 0.0) AS aud_mean,
  COALESCE({r6.format(f'sqrt(CAST(aa.sum_x2 AS DOUBLE) / (c.n_aud * {float(ns_)!r}))')}, 0.0) AS aud_rms,
  CAST(COALESCE(aa.crossings, 0) AS BIGINT) AS aud_crossings
FROM {table} d
LEFT JOIN cnt c USING (doc_id)
LEFT JOIN imga ia USING (doc_id)
LEFT JOIN auda aa USING (doc_id)
"""


def asof_join_sql(dim_mod: int = 37, table: str = "events") -> str:
    """Oracle for the temporal as-of join (DuckDB native ASOF JOIN): each
    event takes the dimension row with the latest ts <= its ts per user
    (inclusive), NULL before the first dimension row.  The dimension is
    derived deterministically from the events view (event_id % dim_mod)
    and deduped per (user, ts) by max(rate) — the exact twin of the
    engine-side derivation in ``_q_asof_join``."""
    return f"""
WITH rates AS (
  SELECT user_id, ts, MAX(value) AS rate FROM {table}
  WHERE event_id % {dim_mod} = 0 GROUP BY user_id, ts
)
SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts, r.rate AS rate
FROM {table} e ASOF LEFT JOIN rates r
  ON e.user_id = r.user_id AND e.ts >= r.ts
"""


def range_join_sql(n_bands: int = 12, width: float = 40.0,
                   step: float = 25.0, table: str = "events") -> str:
    """Oracle for the 1-D interval join: OVERLAPPING bands
    [i*step, i*step + width) from generate_series (bounds precomputed in
    a CTE — DuckDB 1.0's range join on inline computed expressions hits
    an internal assertion, working notes)."""
    return f"""
WITH bands AS (
  SELECT i AS band_id, i * {step!r} AS lo, i * {step!r} + {width!r} AS hi
  FROM generate_series(0, {n_bands - 1}) t(i)
)
SELECT e.event_id AS event_id, b.band_id AS band_id, e.value AS value
FROM {table} e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""


# --- round 3: tile pyramid + kNN join -------------------------------------

def tile_pyramid_sql(max_depth: int, min_depth: int = 0,
                     world: World = DRIVER_WORLD,
                     table: str = "documents") -> str:
    """Per-cell counts at every depth — one morton CTE at ``max_depth``,
    coarser levels by key shifts (``parent = key >> 2``; the sentinel tag
    ``1 << 2*depth`` shifts into exactly the coarser level's tag, so the
    shifted key IS the depth-d engine key)."""
    wx, wy, _ = world.size
    per_depth = " UNION ALL ".join(
        f"SELECT {d} AS depth, (mkey >> {2 * (max_depth - d)}) AS cell_key, "
        f"COUNT(*) AS n_docs FROM mz GROUP BY 2"
        for d in range(min_depth, max_depth + 1))
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id, x, y,
         {cell_idx_expr('x', world.min_x, wx, max_depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, max_depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', max_depth)}
SELECT CAST(depth AS BIGINT) AS depth, CAST(cell_key AS BIGINT) AS cell_key,
       CAST(n_docs AS BIGINT) AS n_docs
FROM ({per_depth}) p
"""


def knn_join_sql(k: int, world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """Oracle for the kNN self-join: per-left-row top-k by the
    (dist2, neighbor_id) tiebreak — identical ordering to the engine's
    finalize stage (and to ``knn_sql``)."""
    d2 = "((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
    return f"""
WITH {geo_cte(table, world)}
SELECT doc_id, neighbor_id, dist, CAST(knn_rank AS BIGINT) AS knn_rank
FROM (
  SELECT a.doc_id AS doc_id, b.doc_id AS neighbor_id,
         sqrt({d2}) AS dist,
         row_number() OVER (PARTITION BY a.doc_id
                            ORDER BY {d2}, b.doc_id) AS knn_rank
  FROM geo a, geo b
  WHERE a.doc_id <> b.doc_id
) s
WHERE knn_rank <= {k}
"""


def zonal_stats_sql(polygons, world: World = DRIVER_WORLD,
                    table: str = "documents",
                    value_col: str = "n_chars") -> str:
    """Zonal statistics twin: the pip_join_sql containment (HAVING min
    edge-cross >= 0 over inlined convex edges) aggregated per zone.
    ``value_col`` is integer, so SUM is order-exact and the mean is one
    shared division of exact integers floor-rounded at 1e-6 on both
    sides — no float-sum-order hazard."""
    values = []
    for row in polygons.to_pylist():
        ring = row["ring"]
        for i in range(len(ring)):
            v1, v2 = ring[i], ring[(i + 1) % len(ring)]
            values.append(f"('{row['poly_id']}', {v1['x']!r}, {v1['y']!r}, "
                          f"{v2['x']!r}, {v2['y']!r})")
    edges = ",\n  ".join(values)
    return f"""
WITH {geo_cte(table, world, extra_cols=value_col)},
edges(poly_id, x1, y1, x2, y2) AS (VALUES
  {edges}),
hits AS (
  SELECT e.poly_id AS poly_id, g.doc_id AS doc_id,
         min(g.{value_col}) AS v
  FROM geo g CROSS JOIN edges e
  GROUP BY e.poly_id, g.doc_id
  HAVING min((e.x2 - e.x1) * (g.y - e.y1) - (e.y2 - e.y1) * (g.x - e.x1)) >= 0
)
SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(v) AS BIGINT) AS sum_{value_col},
       floor((CAST(SUM(v) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
         AS mean_{value_col}
FROM hits GROUP BY poly_id
"""


# --- round 3: hexagonal (H3-flavored) cells --------------------------------

def hex_assign_sql(size: float, world: World = DRIVER_WORLD,
                   table: str = "documents") -> str:
    """DuckDB twin of ``cells.hex_axial``: fractional pointy-top axial
    coordinates + cube rounding, in EXACTLY the engine's IEEE op order.
    Rounding is floor(v + 0.5) on both sides (never round(): Python
    half-even vs DuckDB half-away).  The cube-round fix-up replicates the
    engine's predicate order: fix x when dx is strictly largest, else fix
    z unless dy > dz (y never needs output fixing — only q = x and r = z
    are returned)."""
    qf = f"((sqrt(3.0) / 3.0 * x - y / 3.0) / {size!r})"
    rf = f"((2.0 / 3.0 * y) / {size!r})"
    return f"""
WITH {geo_cte(table, world)},
hexf AS (
  SELECT doc_id, {qf} AS qf, {rf} AS rf FROM geo),
cube AS (
  SELECT doc_id, qf, rf, (-qf - rf) AS cy,
         floor(qf + 0.5) AS rx,
         floor((-qf - rf) + 0.5) AS ry,
         floor(rf + 0.5) AS rz
  FROM hexf),
fixed AS (
  SELECT doc_id, rx, ry, rz,
         (abs(rx - qf) > abs(ry - cy) AND abs(rx - qf) > abs(rz - rf)) AS fix_x,
         (abs(ry - cy) > abs(rz - rf)) AS y_gt_z
  FROM cube)
SELECT doc_id,
       CAST(CASE WHEN fix_x THEN -ry - rz ELSE rx END AS BIGINT) AS hex_q,
       CAST(CASE WHEN (NOT fix_x) AND (NOT y_gt_z) THEN -rx - ry ELSE rz END
            AS BIGINT) AS hex_r
FROM fixed
"""


def hex_counts_sql(size: float, world: World = DRIVER_WORLD,
                   table: str = "documents") -> str:
    """Per-hex document counts over the hex assignment."""
    return f"""
WITH assigned AS ({hex_assign_sql(size, world, table)})
SELECT hex_q, hex_r, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM assigned GROUP BY hex_q, hex_r
"""


def dwithin_join_sql(radius: float, world: World = DRIVER_WORLD,
                     table: str = "documents") -> str:
    """Distance-band self-join twin: each unordered pair once
    (doc_a < doc_b), same d2 expression order as the engine residual."""
    d2 = "((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
    return f"""
WITH {geo_cte(table, world)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sqrt({d2}) AS dist
FROM geo a, geo b
WHERE a.doc_id < b.doc_id AND {d2} <= {radius * radius!r}
"""


def pip_anti_join_sql(polygons, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """Spatial anti-join twin: docs whose id is in NO convex-containment
    group (same HAVING min(edge cross) >= 0 as pip_join_sql)."""
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
  {edges}),
hits AS (
  SELECT g.doc_id AS doc_id
  FROM geo g CROSS JOIN edges e
  GROUP BY e.poly_id, g.doc_id
  HAVING min((e.x2 - e.x1) * (g.y - e.y1) - (e.y2 - e.y1) * (g.x - e.x1)) >= 0
)
SELECT doc_id, x, y FROM geo
WHERE doc_id NOT IN (SELECT doc_id FROM hits)
"""


def nearest_zone_sql(polygons, world: World = DRIVER_WORLD,
                     table: str = "documents") -> str:
    """Reverse-geocode twin: argmin centroid distance with the
    (d2, poly_id) row_number tiebreak.  Centroids are the SHARED
    floor-rounded constants from ``pip.zone_centroids`` (fixture
    constants, like the ring vertices everywhere else)."""
    from optimizing_ray.pipelines.pip import zone_centroids
    pids, cx, cy = zone_centroids(polygons)
    cent = ",\n  ".join(f"('{p}', {x!r}, {y!r})"
                        for p, x, y in zip(pids, cx, cy))
    return f"""
WITH {geo_cte(table, world)},
cent(poly_id, cx, cy) AS (VALUES
  {cent}),
d AS (
  SELECT g.doc_id AS doc_id, c.poly_id AS poly_id,
         ((g.x - c.cx) * (g.x - c.cx) + (g.y - c.cy) * (g.y - c.cy)) AS d2,
         row_number() OVER (PARTITION BY g.doc_id
                            ORDER BY ((g.x - c.cx) * (g.x - c.cx)
                                      + (g.y - c.cy) * (g.y - c.cy)),
                                     c.poly_id) AS rn
  FROM geo g CROSS JOIN cent c)
SELECT doc_id, poly_id, floor(sqrt(d2) * 1e6 + 0.5) / 1e6 AS dist
FROM d WHERE rn = 1
"""


def idw_grid_sql(width: int, height: int, radius: float,
                 world: World = DRIVER_WORLD, table: str = "documents",
                 value_col: str = "n_chars") -> str:
    """IDW raster twin: pixel centers x docs within radius, fixed-point
    integer weight w = floor(1e9 / (1 + d2)) so SUM(w) / SUM(w*v) are
    order-exact BIGINTs; the final mean is one shared division, floor-
    rounded at 1e-6 (matching ``raster.idw_grid``)."""
    wx, wy, _ = world.size
    d2 = "((g.x - p.cx) * (g.x - p.cx) + (g.y - p.cy) * (g.y - p.cy))"
    return f"""
WITH {geo_cte(table, world, extra_cols=value_col)},
pixels AS (
  SELECT a.px AS px, b.py AS py,
         ({world.min_x!r} + (a.px + 0.5) / {width} * {wx!r}) AS cx,
         ({world.min_y!r} + (b.py + 0.5) / {height} * {wy!r}) AS cy
  FROM generate_series(0, {width - 1}) a(px)
  CROSS JOIN generate_series(0, {height - 1}) b(py)
),
hits AS (
  SELECT p.px, p.py,
         CAST(floor(1e9 / (1.0 + {d2})) AS BIGINT) AS w,
         g.{value_col} AS v
  FROM pixels p JOIN geo g ON {d2} <= {radius * radius!r}
)
SELECT px, py, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS wsum,
       floor(CAST(SUM(w * v) AS DOUBLE) / SUM(w) * 1e6 + 0.5) / 1e6 AS idw
FROM hits GROUP BY px, py
"""


def heavy_hitters_sql(k: int = 50, table: str = "documents") -> str:
    """Heavy-hitters twin: whitespace-split trimmed text, lowercased,
    empties dropped (the tatoks convention), global count, top-k by
    (n DESC, token ASC) with row_number rank."""
    return f"""
WITH toks AS (
  SELECT lower(tok) AS token
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM {table}) u
  WHERE tok <> ''
),
counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
r AS (SELECT token, n,
             row_number() OVER (ORDER BY n DESC, token) AS rank
      FROM counts)
SELECT token, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def segment_intersections_sql(scale: int = 16, world: World = DRIVER_WORLD,
                              table: str = "documents") -> str:
    """poly_join.segment_intersection_join twin: the UNBUCKETED brute
    — all doc pairs, the same quantized integer orientation predicate
    (strict proper crossing: opposite strict signs pairwise).  A green
    row proves the cell-bucket candidate generation lossless."""
    from optimizing_ray.sources.driver_tables import (
        short_segment_endpoint_sql)
    ep = short_segment_endpoint_sql()
    return f"""
WITH {geo_cte(table, world)},
sg AS (SELECT doc_id, x, y, {ep['x1']} AS x1, {ep['y1']} AS y1 FROM geo),
q AS (SELECT doc_id,
             CAST(floor(x * {float(scale)!r}) AS BIGINT) AS ax0,
             CAST(floor(y * {float(scale)!r}) AS BIGINT) AS ay0,
             CAST(floor(x1 * {float(scale)!r}) AS BIGINT) AS ax1,
             CAST(floor(y1 * {float(scale)!r}) AS BIGINT) AS ay1
      FROM sg),
d AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (b.ax1 - b.ax0) * (a.ay0 - b.ay0)
               - (b.ay1 - b.ay0) * (a.ax0 - b.ax0) AS d1,
             (b.ax1 - b.ax0) * (a.ay1 - b.ay0)
               - (b.ay1 - b.ay0) * (a.ax1 - b.ax0) AS d2,
             (a.ax1 - a.ax0) * (b.ay0 - a.ay0)
               - (a.ay1 - a.ay0) * (b.ax0 - a.ax0) AS d3,
             (a.ax1 - a.ax0) * (b.ay1 - a.ay0)
               - (a.ay1 - a.ay0) * (b.ax1 - a.ax0) AS d4
      FROM q a JOIN q b ON a.doc_id < b.doc_id)
SELECT doc_a, doc_b FROM d
WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
  AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
ORDER BY doc_a, doc_b"""


def segment_cover_sql(depth: int, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """Segment->tile supercover twin (column sweep).  Every float
    expression is in ``stages.assign.segment_cover_batch``'s exact op
    order; bounds live in CTEs (the DuckDB flat-vector gotcha)."""
    from optimizing_ray.sources.driver_tables import segment_endpoint_sql
    n = 1 << depth
    wx, wy, _ = world.size
    cw, ch = wx / n, wy / n
    seg = segment_endpoint_sql(world)
    return f"""
WITH {geo_cte(table, world)},
seg AS (
  SELECT doc_id, x AS x0, y AS y0, {seg['x1']} AS x1, {seg['y1']} AS y1
  FROM geo),
bounds AS (
  SELECT *, LEAST(x0, x1) AS xmin, GREATEST(x0, x1) AS xmax FROM seg),
colidx AS (
  SELECT *,
    GREATEST(0, LEAST({n - 1},
      CAST(floor((xmin - {world.min_x!r}) / {cw!r}) AS BIGINT))) AS ixlo,
    GREATEST(0, LEAST({n - 1},
      CAST(floor((xmax - {world.min_x!r}) / {cw!r}) AS BIGINT))) AS ixhi
  FROM bounds),
cols AS (
  SELECT c.*, u.ix
  FROM colidx c,
  LATERAL (SELECT unnest(generate_series(c.ixlo, c.ixhi)) AS ix) u),
spans AS (
  SELECT doc_id, x0, y0, x1, y1, ix,
    GREATEST(xmin, {world.min_x!r} + ix * {cw!r}) AS xa,
    LEAST(xmax, {world.min_x!r} + (ix + 1) * {cw!r}) AS xb
  FROM cols),
yint AS (
  SELECT doc_id, ix,
    CASE WHEN x1 = x0 THEN LEAST(y0, y1)
         ELSE y0 + (y1 - y0) * ((xa - x0) / (x1 - x0)) END AS ya,
    CASE WHEN x1 = x0 THEN GREATEST(y0, y1)
         ELSE y0 + (y1 - y0) * ((xb - x0) / (x1 - x0)) END AS yb
  FROM spans),
yidx AS (
  SELECT doc_id, ix,
    GREATEST(0, LEAST({n - 1},
      CAST(floor((LEAST(ya, yb) - {world.min_y!r}) / {ch!r}) AS BIGINT))) AS iylo,
    GREATEST(0, LEAST({n - 1},
      CAST(floor((GREATEST(ya, yb) - {world.min_y!r}) / {ch!r}) AS BIGINT))) AS iyhi
  FROM yint)
SELECT doc_id, ix AS cell_ix, u.iy AS cell_iy
FROM yidx, LATERAL (SELECT unnest(generate_series(iylo, iyhi)) AS iy) u
"""


def polygon_stats_sql(world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """poly_join.polygon_stats twin: the shoelace crosses, the
    left-associated 5-term sums, the (xj + xj1) * cross_j centroid
    numerators, and the nx / (3.0 * a2) division — every float op in
    the exact engine order, micro-rounded with floor(v*1e6 + 0.5)."""
    from optimizing_ray.sources.driver_tables import (
        PENT_UX, PENT_UY, doc_polygon_scale_sql)
    sc = doc_polygon_scale_sql()
    vcols = ", ".join(
        f"(x + sx * {PENT_UX[j]!r}) AS x{j}, "
        f"(y + sy * {PENT_UY[j]!r}) AS y{j}" for j in range(5))
    ccols = ", ".join(
        f"(x{j} * y{(j + 1) % 5} - x{(j + 1) % 5} * y{j}) AS c{j}"
        for j in range(5))
    a2 = "((((c0 + c1) + c2) + c3) + c4)"
    tx = [f"((x{j} + x{(j + 1) % 5}) * c{j})" for j in range(5)]
    ty = [f"((y{j} + y{(j + 1) % 5}) * c{j})" for j in range(5)]
    nx = f"(((({tx[0]} + {tx[1]}) + {tx[2]}) + {tx[3]}) + {tx[4]})"
    ny = f"(((({ty[0]} + {ty[1]}) + {ty[2]}) + {ty[3]}) + {ty[4]})"
    return f"""
WITH {geo_cte(table, world)},
geo2 AS (SELECT doc_id, x, y, {sc['sx']} AS sx, {sc['sy']} AS sy FROM geo),
v AS (SELECT doc_id, {vcols} FROM geo2),
c AS (SELECT *, {ccols} FROM v),
a AS (SELECT doc_id, {a2} AS a2, {nx} AS nx, {ny} AS ny FROM c)
SELECT doc_id,
       CAST(floor(a2 * 1000000.0 + 0.5) AS BIGINT) AS area2_micro,
       CAST(floor((nx / (3.0 * a2)) * 1000000.0 + 0.5) AS BIGINT)
         AS cx_micro,
       CAST(floor((ny / (3.0 * a2)) * 1000000.0 + 0.5) AS BIGINT)
         AS cy_micro
FROM a ORDER BY doc_id"""


def poly_overlap_join_sql(zones, world: World = DRIVER_WORLD,
                          table: str = "documents") -> str:
    """Convex polygon-polygon join twin (separating-axis theorem over
    edge normals of BOTH shapes, strict comparisons).  Pentagon verts
    are computed from the shared unit-shape constants + per-doc scales
    in the exact engine op order; zone rings inline as VALUES; min/max
    projections are order-independent, so every float is bit-identical
    to ``poly_join.poly_overlap_join``."""
    from optimizing_ray.sources.driver_tables import (
        PENT_UX, PENT_UY, doc_polygon_scale_sql)
    sc = doc_polygon_scale_sql()
    pentv = ",\n  ".join(f"({j}, {PENT_UX[j]!r}, {PENT_UY[j]!r})"
                         for j in range(5))
    pente = ",\n  ".join(
        f"({i}, {PENT_UX[i]!r}, {PENT_UY[i]!r}, "
        f"{PENT_UX[(i + 1) % 5]!r}, {PENT_UY[(i + 1) % 5]!r})"
        for i in range(5))
    zedges, zverts = [], []
    for row in zones.to_pylist():
        ring = row["ring"]
        for i in range(len(ring)):
            v1, v2 = ring[i], ring[(i + 1) % len(ring)]
            zedges.append(f"('{row['poly_id']}', {i}, {v1['x']!r}, "
                          f"{v1['y']!r}, {v2['x']!r}, {v2['y']!r})")
            zverts.append(f"('{row['poly_id']}', {v1['x']!r}, {v1['y']!r})")
    return f"""
WITH {geo_cte(table, world)},
geo2 AS (
  SELECT doc_id, x, y, {sc['sx']} AS sx, {sc['sy']} AS sy FROM geo),
pentv(j, ux, uy) AS (VALUES
  {pentv}),
pente(i, ux1, uy1, ux2, uy2) AS (VALUES
  {pente}),
zedge(poly_id, eid, x1, y1, x2, y2) AS (VALUES
  {",".join(zedges)}),
zvert(poly_id, zx, zy) AS (VALUES
  {",".join(zverts)}),
docv AS (
  SELECT g.doc_id, p.j, (g.x + g.sx * p.ux) AS vx, (g.y + g.sy * p.uy) AS vy
  FROM geo2 g CROSS JOIN pentv p),
zaxis AS (
  SELECT poly_id, eid, -(y2 - y1) AS nx, (x2 - x1) AS ny FROM zedge),
zself AS (
  SELECT z.poly_id, z.eid,
         min(z.nx * v.zx + z.ny * v.zy) AS zmin,
         max(z.nx * v.zx + z.ny * v.zy) AS zmax
  FROM zaxis z JOIN zvert v USING (poly_id) GROUP BY z.poly_id, z.eid),
dprojz AS (
  SELECT z.poly_id, z.eid, d.doc_id,
         min(z.nx * d.vx + z.ny * d.vy) AS pmin,
         max(z.nx * d.vx + z.ny * d.vy) AS pmax
  FROM zaxis z CROSS JOIN docv d GROUP BY z.poly_id, z.eid, d.doc_id),
sep1 AS (
  SELECT p.poly_id, p.doc_id
  FROM dprojz p JOIN zself s ON s.poly_id = p.poly_id AND s.eid = p.eid
  WHERE p.pmax < s.zmin OR s.zmax < p.pmin
  GROUP BY p.poly_id, p.doc_id),
daxis AS (
  SELECT g.doc_id, e.i,
         -((g.y + g.sy * e.uy2) - (g.y + g.sy * e.uy1)) AS nx,
         ((g.x + g.sx * e.ux2) - (g.x + g.sx * e.ux1)) AS ny
  FROM geo2 g CROSS JOIN pente e),
dself AS (
  SELECT d.doc_id, d.i,
         min(d.nx * v.vx + d.ny * v.vy) AS qmin,
         max(d.nx * v.vx + d.ny * v.vy) AS qmax
  FROM daxis d JOIN docv v USING (doc_id) GROUP BY d.doc_id, d.i),
zprojd AS (
  SELECT d.doc_id, d.i, zv.poly_id,
         min(d.nx * zv.zx + d.ny * zv.zy) AS rmin,
         max(d.nx * zv.zx + d.ny * zv.zy) AS rmax
  FROM daxis d CROSS JOIN zvert zv GROUP BY d.doc_id, d.i, zv.poly_id),
sep2 AS (
  SELECT z.poly_id, z.doc_id
  FROM zprojd z JOIN dself q ON q.doc_id = z.doc_id AND q.i = z.i
  WHERE q.qmax < z.rmin OR z.rmax < q.qmin
  GROUP BY z.poly_id, z.doc_id),
seps AS (SELECT * FROM sep1 UNION SELECT * FROM sep2)
SELECT z.poly_id, g.doc_id
FROM (SELECT DISTINCT poly_id FROM zvert) z CROSS JOIN geo2 g
WHERE NOT EXISTS (SELECT 1 FROM seps s
                  WHERE s.poly_id = z.poly_id AND s.doc_id = g.doc_id)
"""


def tile_median_sql(depth: int, world: World = DRIVER_WORLD,
                    table: str = "documents",
                    value_col: str = "n_chars") -> str:
    """Per-tile median twin: the grouped quantile sketch keyed by the
    Morton cell (driver-scale groups stay below the summary size, so
    the sketch provably equals quantile_disc)."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world, extra_cols=value_col)},
cellidx AS (
  SELECT doc_id, x, y, {value_col},
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', depth, carry=f'doc_id, x, y, {value_col}')}
SELECT mkey AS cell_key,
       CAST(quantile_disc({value_col}, 0.5) AS DOUBLE) AS p50
FROM mz GROUP BY mkey
"""


def interval_join_sql(table: str = "events") -> str:
    """Interval-overlap self-join twin: half-open [s, s+dur) intervals
    with the shared pure-int64 duration derivation
    (``windows.interval_durations``); exact integer overlap length."""
    from optimizing_ray.pipelines.windows import (
        IVJ_DUR_MIN_US, IVJ_DUR_MULT, IVJ_DUR_SALT, IVJ_DUR_SPAN_US)
    dur = (f"({IVJ_DUR_MIN_US} + ((event_id + {IVJ_DUR_SALT}) "
           f"* {IVJ_DUR_MULT}) % {1 << 32} % {IVJ_DUR_SPAN_US})")
    return f"""
WITH iv AS (
  SELECT event_id, epoch_us(ts) AS s, epoch_us(ts) + {dur} AS e
  FROM {table})
SELECT a.event_id AS event_a, b.event_id AS event_b,
       CAST(LEAST(a.e, b.e) - GREATEST(a.s, b.s) AS BIGINT) AS overlap_us
FROM iv a, iv b
WHERE a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
"""


def interval_coverage_sql(table: str = "events") -> str:
    """Union-of-intervals coverage twin (``windows.interval_coverage``):
    the classic gaps-and-islands window pattern — running max end per
    user with a 1-preceding frame flags island starts (s > prev frontier
    merges touching half-open intervals), a running sum numbers islands,
    and each island's union length is max(e) - min(s).  All int64 µs."""
    from optimizing_ray.pipelines.windows import (
        IVJ_DUR_MIN_US, IVJ_DUR_MULT, IVJ_DUR_SALT, IVJ_DUR_SPAN_US)
    dur = (f"({IVJ_DUR_MIN_US} + ((event_id + {IVJ_DUR_SALT}) "
           f"* {IVJ_DUR_MULT}) % {1 << 32} % {IVJ_DUR_SPAN_US})")
    return f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {dur} AS e
  FROM {table}),
w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_cm
  FROM iv),
f AS (
  SELECT *, CASE WHEN prev_cm IS NULL OR s > prev_cm THEN 1 ELSE 0 END
           AS isl_start
  FROM w),
g AS (
  SELECT *, SUM(isl_start) OVER (PARTITION BY user_id ORDER BY s, e
                                 ROWS UNBOUNDED PRECEDING) AS isl
  FROM f),
i AS (
  SELECT user_id, isl, MIN(s) AS s0, MAX(e) AS e1, COUNT(*) AS cnt
  FROM g GROUP BY user_id, isl)
SELECT user_id,
       CAST(SUM(cnt) AS BIGINT) AS n_intervals,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(e1 - s0) AS BIGINT) AS covered_us
FROM i GROUP BY user_id
"""


def geohash_sql(length: int = 8, world: World = DRIVER_WORLD,
                table: str = "documents") -> str:
    """Geohash twin: quantize, spread-interleave (x on the odd LSB
    lanes = MSB-first even positions), then 5-bit groups index the
    standard base32 alphabet."""
    from optimizing_ray.cells import GEOHASH_ALPHABET
    bits = 5 * length
    nx = bits // 2
    n = 1 << nx
    wx, wy, _ = world.size
    parts = [
        "g0 AS (SELECT doc_id, CAST(ixq AS UBIGINT) AS sx, "
        "CAST(iyq AS UBIGINT) AS sy FROM cellidx)"]
    prev = "g0"
    for i, (shift, mask) in enumerate(_SPREAD_STEPS, start=1):
        parts.append(
            f"g{i} AS (SELECT * REPLACE (((sx | (sx << {shift})) & {mask}) AS sx, "
            f"((sy | (sy << {shift})) & {mask}) AS sy) FROM {prev})")
        prev = f"g{i}"
    spread = ", ".join(parts)
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST(((code >> {bits - 5 * (k + 1)}) & 31) AS INTEGER) + 1, 1)"
        for k in range(length))
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, nx)} AS ixq,
         {cell_idx_expr('y', world.min_y, wy, nx)} AS iyq
  FROM geo
),
{spread},
codes AS (SELECT doc_id, CAST(sy | (sx * 2) AS BIGINT) AS code FROM {prev})
SELECT doc_id, {chars} AS geohash FROM codes
"""


def tile_topk_sql(depth: int, k: int = 3, world: World = DRIVER_WORLD,
                  table: str = "documents",
                  value_col: str = "n_chars") -> str:
    """Top-k docs per Morton tile by (value desc, doc_id asc)."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world, extra_cols=value_col)},
cellidx AS (
  SELECT doc_id, x, y, {value_col},
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', depth, carry=f'doc_id, x, y, {value_col}')}
SELECT cell_key, doc_id, {value_col}, cell_rank
FROM (
  SELECT mkey AS cell_key, doc_id, {value_col},
         row_number() OVER (PARTITION BY mkey
                            ORDER BY {value_col} DESC, doc_id) AS cell_rank
  FROM mz
) s WHERE cell_rank <= {k}
"""


def spatial_clusters_sql(radius: float, world: World = DRIVER_WORLD,
                         table: str = "documents") -> str:
    """Spatial-cluster twin: recursive-CTE transitive closure of the
    distance-band graph, cluster_id = min reachable id (singletons seed
    from the self row)."""
    d2 = "((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
p0 AS (
  SELECT a.doc_id AS ea, b.doc_id AS eb
  FROM geo a, geo b
  WHERE a.doc_id < b.doc_id AND {d2} <= {radius * radius!r}),
pairs AS (SELECT ea, eb FROM p0 UNION ALL SELECT eb, ea FROM p0),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM geo
  UNION
  SELECT r.src, p.eb FROM reach r JOIN pairs p ON p.ea = r.dst
)
SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src
"""


def stratified_sample_sql(rates: dict, default_rate: float = 0.0,
                          mult: int = 2_885_564_557,
                          table: str = "documents") -> str:
    """Stratified-sample twin: the train_split frac hash gated by a
    per-stratum CASE rate."""
    cases = " ".join(f"WHEN lang = '{k}' THEN {v!r}"
                     for k, v in rates.items())
    frac = f"(((doc_id * {mult}) % {1 << 32}) / {float(1 << 32)!r})"
    return f"""
SELECT doc_id, lang
FROM {table}
WHERE {frac} < (CASE {cases} ELSE {default_rate!r} END)
"""


def tile_distinct_sources_sql(depth: int, world: World = DRIVER_WORLD,
                              table: str = "documents") -> str:
    """Exact per-tile distinct-source counts."""
    wx, wy, _ = world.size
    return f"""
WITH {geo_cte(table, world, extra_cols="source")},
cellidx AS (
  SELECT doc_id, x, y, source,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
{morton_ctes('cellidx', depth, carry='doc_id, x, y, source')}
SELECT mkey AS cell_key,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM mz GROUP BY mkey
"""


def decontaminate_sql(benchmark_mod: int = 97, n: int = 4,
                      table: str = "documents") -> str:
    """Benchmark n-gram decontamination twin
    (``textops.decontaminate``): the benchmark suite is the docs with
    doc_id % benchmark_mod == 0; a corpus doc is contaminated per n-gram
    POSITION whose word n-gram (single-space split, string identity —
    the engine rides 64-bit hashes of the same token sequences) appears
    anywhere in the benchmark set."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - {n - 1})) AS i
        FROM lists),
grams AS (SELECT doc_id, array_to_string(list_slice(l, i, i + {n - 1}), ' ') AS ng
          FROM pos),
bench AS (SELECT DISTINCT ng FROM grams WHERE doc_id % {benchmark_mod} = 0)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN bench USING (ng)
WHERE g.doc_id % {benchmark_mod} <> 0
GROUP BY g.doc_id
"""


def repetition_stats_sql(table: str = "documents") -> str:
    """Gopher-style repetition signal twin (``textops.repetition_stats``):
    single-space token identity, fractions floor(x*1e6+0.5)/1e6-rounded in
    the engine's exact float op order (left-assoc divide, scale, shift)."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, unnest(l) AS tok FROM lists),
cnt AS (SELECT doc_id, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
        FROM toks GROUP BY doc_id),
tcnt AS (SELECT doc_id, max(c) AS top_count
         FROM (SELECT doc_id, tok, count(*) AS c FROM toks
               GROUP BY doc_id, tok) GROUP BY doc_id),
pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i
        FROM lists),
bg AS (SELECT doc_id, l[i] || ' ' || l[i + 1] AS b FROM pos),
bcnt AS (SELECT doc_id, count(*) AS nb, count(DISTINCT b) AS ndb
         FROM bg GROUP BY doc_id)
SELECT c.doc_id,
  CAST(c.n_tokens AS BIGINT) AS n_tokens,
  floor(c.n_distinct / CAST(c.n_tokens AS DOUBLE) * 1e6 + 0.5) / 1e6 AS uniq_frac,
  floor(t.top_count / CAST(c.n_tokens AS DOUBLE) * 1e6 + 0.5) / 1e6 AS top_frac,
  CASE WHEN b.nb IS NULL OR b.nb = 0 THEN 0.0
       ELSE floor((1.0 - b.ndb / CAST(b.nb AS DOUBLE)) * 1e6 + 0.5) / 1e6
       END AS dup_bigram_frac
FROM cnt c JOIN tcnt t USING (doc_id) LEFT JOIN bcnt b USING (doc_id)
"""


def pii_redact_sql(table: str = "documents") -> str:
    """PII count+redaction twin (``textops.pii_redact`` over
    ``driver_tables.derive_pii_batch``-augmented text): same RE2
    patterns, counts on the original text, replacements applied in
    PII_PATTERNS order."""
    from optimizing_ray.pipelines.textops import PII_PATTERNS
    from optimizing_ray.sources.driver_tables import pii_text_sql
    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    clean = "ptext"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
WITH pii AS (SELECT doc_id, {pii_text_sql()} AS ptext FROM {table})
SELECT doc_id,
  CAST(len(regexp_extract_all(ptext, '{pats["email"]}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(ptext, '{pats["phone"]}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(ptext, '{pats["ip"]}')) AS BIGINT) AS n_ips,
  {clean} AS clean_text
FROM pii
"""


def polygon_cover_sql(max_depth: int, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """Adaptive polygon region-cover twin (``poly_join.polygon_cover``)
    as a NON-recursive closure — the BFS emission rule re-expressed per
    depth (containment is monotone down the cell tree, disjointness is
    monotone up, so):

      * full cells at depth d  =  inside(cell) AND NOT inside(parent)
      * partial leaves at max_depth  =  overlap(cell) AND NOT inside(cell)

    Candidates per depth come from the polygon bbox index range padded
    by one cell (a strict superset of every emitted cell); the exact SAT
    / half-plane classification then matches the engine bit-for-bit:
    cell bounds derive from (ix, iy) by the same wmin + ix*cw float
    formula, centers/halfwidths/projections in the same op order."""
    from optimizing_ray.sources.driver_tables import (
        PENT_UX, PENT_UY, doc_polygon_scale_sql)
    sc = doc_polygon_scale_sql()
    k = len(PENT_UX)
    wminx, wminy = world.min_x, world.min_y
    wx, wy, _ = world.size
    pentv = ",\n  ".join(f"({j}, {PENT_UX[j]!r}, {PENT_UY[j]!r})"
                         for j in range(k))
    parts = [
        geo_cte(table, world),
        f"geo2 AS (SELECT doc_id, x, y, {sc['sx']} AS sx, {sc['sy']} AS sy"
        " FROM geo)",
        f"pentv(j, ux, uy) AS (VALUES\n  {pentv})",
        "pv AS (SELECT g.doc_id, p.j, (g.x + g.sx * p.ux) AS vx,"
        " (g.y + g.sy * p.uy) AS vy FROM geo2 g CROSS JOIN pentv p)",
        "ax0 AS (SELECT v1.doc_id, v1.j, v1.vx, v1.vy,"
        " -(v2.vy - v1.vy) AS nx, (v2.vx - v1.vx) AS ny FROM pv v1"
        f" JOIN pv v2 ON v2.doc_id = v1.doc_id AND v2.j = (v1.j + 1) % {k})",
        "ax1 AS (SELECT doc_id, j, nx, ny, nx * vx + ny * vy AS c FROM ax0)",
        "axes AS (SELECT a.doc_id, a.j, a.nx, a.ny, a.c,"
        " min(a.nx * p.vx + a.ny * p.vy) AS pmin,"
        " max(a.nx * p.vx + a.ny * p.vy) AS pmax"
        " FROM ax1 a JOIN pv p USING (doc_id)"
        " GROUP BY a.doc_id, a.j, a.nx, a.ny, a.c)",
        "pbox AS (SELECT doc_id, min(vx) AS bminx, max(vx) AS bmaxx,"
        " min(vy) AS bminy, max(vy) AS bmaxy FROM pv GROUP BY doc_id)",
    ]
    sels = []
    for d in range(max_depth + 1):
        nd = 1 << d
        cw = wx / nd
        ch = wy / nd
        parent = ""
        if d:
            cwp = wx / (nd // 2)
            chp = wy / (nd // 2)
            parent = f""",
    {wminx!r} + (u.ix // 2) * {cwp!r} AS qminx,
    {wminx!r} + ((u.ix // 2) + 1) * {cwp!r} AS qmaxx,
    {wminy!r} + (v.iy // 2) * {chp!r} AS qminy,
    {wminy!r} + ((v.iy // 2) + 1) * {chp!r} AS qmaxy"""
        parts.append(f"""cand{d} AS (
  SELECT b.doc_id, u.ix, v.iy,
    {wminx!r} + u.ix * {cw!r} AS cminx,
    {wminx!r} + (u.ix + 1) * {cw!r} AS cmaxx,
    {wminy!r} + v.iy * {ch!r} AS cminy,
    {wminy!r} + (v.iy + 1) * {ch!r} AS cmaxy{parent}
  FROM pbox b,
  LATERAL (SELECT unnest(generate_series(
     GREATEST(0, CAST(floor((b.bminx - {wminx!r}) / {cw!r}) AS BIGINT) - 1),
     LEAST({nd - 1}, CAST(floor((b.bmaxx - {wminx!r}) / {cw!r}) AS BIGINT) + 1)
     )) AS ix) u,
  LATERAL (SELECT unnest(generate_series(
     GREATEST(0, CAST(floor((b.bminy - {wminy!r}) / {ch!r}) AS BIGINT) - 1),
     LEAST({nd - 1}, CAST(floor((b.bmaxy - {wminy!r}) / {ch!r}) AS BIGINT) + 1)
     )) AS iy) v)""")

        def center(lo: str, hi: str, lo2: str, hi2: str) -> str:
            return (f"(a.nx * ((c.{lo} + c.{hi}) * 0.5)"
                    f" + a.ny * ((c.{lo2} + c.{hi2}) * 0.5))")

        def radius(lo: str, hi: str, lo2: str, hi2: str) -> str:
            return (f"(abs(a.nx) * ((c.{hi} - c.{lo}) * 0.5)"
                    f" + abs(a.ny) * ((c.{hi2} - c.{lo2}) * 0.5))")

        cell = ("cminx", "cmaxx", "cminy", "cmaxy")
        par = ("qminx", "qmaxx", "qminy", "qmaxy")
        cdmr = f"{center(*cell)} - {radius(*cell)}"
        cdpr = f"{center(*cell)} + {radius(*cell)}"
        ins = f"bool_and({cdmr} >= a.c)"
        pins = (f"bool_and({center(*par)} - {radius(*par)} >= a.c)"
                if d else "FALSE")
        sepax = f"bool_or(({cdpr}) < a.pmin OR a.pmax < ({cdmr}))"
        gcols = ("c.doc_id, c.ix, c.iy, c.cminx, c.cmaxx, c.cminy, c.cmaxy"
                 + (", c.qminx, c.qmaxx, c.qminy, c.qmaxy" if d else ""))
        parts.append(
            f"cls{d} AS (SELECT c.doc_id, c.ix, c.iy, c.cminx, c.cmaxx,"
            f" c.cminy, c.cmaxy, {ins} AS ins, {pins} AS pins,"
            f" {sepax} AS sepax FROM cand{d} c JOIN axes a USING (doc_id)"
            f" GROUP BY {gcols})")
        sels.append(
            f"SELECT doc_id, CAST({d} AS BIGINT) AS depth,"
            f" CAST(ix AS BIGINT) AS cell_ix, CAST(iy AS BIGINT) AS cell_iy,"
            f" CAST(1 AS BIGINT) AS full_cover FROM cls{d}"
            f" WHERE ins AND NOT pins")
        if d == max_depth:
            sels.append(
                f"SELECT c.doc_id, CAST({d} AS BIGINT), CAST(c.ix AS BIGINT),"
                f" CAST(c.iy AS BIGINT), CAST(0 AS BIGINT)"
                f" FROM cls{d} c JOIN pbox b USING (doc_id)"
                " WHERE NOT c.ins AND NOT c.sepax"
                " AND NOT (b.bmaxx < c.cminx OR c.cmaxx < b.bminx"
                " OR b.bmaxy < c.cminy OR c.cmaxy < b.bminy)")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


def tfidf_top_terms_sql(k: int = 3, table: str = "documents") -> str:
    """Per-doc top-k TF-IDF twin (``textops.tfidf_top_terms``): tatoks
    tokenization, EXACT integer score tf * 1_000_000 // df (log-free by
    design — libm is not bit-reproducible across engines), row_number
    over (score DESC, token ASC)."""
    return f"""
WITH toks AS (
  SELECT doc_id, lower(tok) AS token
  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM {table}) u
  WHERE tok <> ''
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
sc AS (SELECT t.doc_id, t.token, t.tf, (t.tf * 1000000) // d.df AS score
       FROM tf t JOIN df d USING (token)),
r AS (SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token ASC) AS rank
      FROM sc)
SELECT doc_id, token, CAST(score AS BIGINT) AS score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


def bloom_semi_join_sql(priority: str = "1-URGENT") -> str:
    """Semi-join twin (``relational.bloom_semi_join``): the bloom is a
    prefilter only (exact verify exchange downstream), so the oracle is
    the plain IN-subquery semi-join."""
    return f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '{priority}')
"""


def dup_ngram_stats_sql(n: int = 4, table: str = "documents") -> str:
    """Cross-doc duplicated n-gram stats twin
    (``textops.dup_ngram_stats``): single-space split, gram identity by
    string (engine rides 64-bit hashes of the same token sequences);
    dup_frac in the engine's float op order."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - {n - 1})) AS i
        FROM lists),
grams AS (SELECT doc_id, array_to_string(list_slice(l, i, i + {n - 1}), ' ') AS ng
          FROM pos),
gdoc AS (SELECT ng, count(DISTINCT doc_id) AS nd FROM grams GROUP BY ng)
SELECT g.doc_id,
  CAST(count(*) FILTER (WHERE d.nd >= 2) AS BIGINT) AS n_dup,
  CAST(count(*) AS BIGINT) AS n_grams,
  floor(count(*) FILTER (WHERE d.nd >= 2) / CAST(count(*) AS DOUBLE)
        * 1e6 + 0.5) / 1e6 AS dup_frac
FROM grams g JOIN gdoc d USING (ng)
GROUP BY g.doc_id
"""


def strip_dup_ngrams_sql(n: int = 4, table: str = "documents") -> str:
    """Exact-substring dedup removal twin (``textops.strip_dup_ngrams``):
    single-space split; a token survives iff no duplicated n-gram (>= 2
    distinct docs, gram identity by string — the engine rides 64-bit
    hashes of the same token sequences) covers its position; survivors
    re-join with single spaces (string_agg ORDER BY position).  Coverage
    bounds precompute in the dup CTE (the DuckDB computed-expression
    range-join assertion gotcha)."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
pos AS (SELECT doc_id, l, unnest(generate_series(1, len(l) - {n - 1})) AS i
        FROM lists),
grams AS (SELECT doc_id, i, array_to_string(list_slice(l, i, i + {n - 1}), ' ') AS ng
          FROM pos),
gdup AS (SELECT ng FROM grams GROUP BY ng HAVING count(DISTINCT doc_id) >= 2),
dup AS (SELECT doc_id, i AS lo, i + {n - 1} AS hi FROM grams JOIN gdup USING (ng)),
toks AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS p, unnest(l) AS tok
         FROM lists),
kept AS (SELECT t.doc_id, t.p, t.tok FROM toks t
         WHERE NOT EXISTS (SELECT 1 FROM dup d
                           WHERE d.doc_id = t.doc_id
                             AND t.p >= d.lo AND t.p <= d.hi)),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT l.doc_id,
       COALESCE(a.clean_text, '') AS clean_text,
       CAST(len(l.l) AS BIGINT) AS n_tokens,
       CAST(len(l.l) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM lists l LEFT JOIN agg a USING (doc_id)
"""


def span_kind_rollup_sql(table: str = "documents") -> str:
    """Per-kind span rollup twin (``textops.span_kind_rollup`` over
    ``derive_spans_batch``): the span derivation CTEs of
    ``span_passthrough_sql`` over ALL docs, then one GROUP BY kind."""
    from optimizing_ray.sources.driver_tables import SPAN_MULTS, SPAN_SALT
    toks = "[" + ", ".join(f"'{t}'" for t in SPAN_TOKENS) + "]"
    ntok = len(SPAN_TOKENS)
    skey = "(doc_id * 16 + ord)"
    return f"""
WITH ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id, n_spans,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, n_spans, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t1'])} * {ntok}) AS BIGINT) AS t1,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t2'])} * {ntok}) AS BIGINT) AS t2,
         1 + CAST(floor({frac_sql(skey, SPAN_MULTS['len'])} * 64) AS BIGINT) AS span_len
        FROM sp),
fld2 AS (SELECT doc_id, n_spans, ord,
          CASE kind_i WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS kind,
          CASE WHEN kind_i = 0 THEN {toks}[t1 + 1] || ' ' || {toks}[t2 + 1] ELSE '' END AS txt,
          CASE WHEN kind_i <> 0 THEN 'media://doc-' || lpad(CAST(doc_id AS VARCHAR), 12, '0')
                                     || '/' || CAST(ord AS VARCHAR) ELSE '' END AS media,
          COALESCE(SUM(span_len) OVER (PARTITION BY doc_id ORDER BY ord
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM fld)
SELECT kind,
  CAST(count(*) AS BIGINT) AS n_spans,
  CAST(sum(length(txt)) AS BIGINT) AS text_chars,
  CAST(count(*) FILTER (WHERE media <> '') AS BIGINT) AS n_media,
  CAST(max(off) AS BIGINT) AS max_offset
FROM fld2 GROUP BY kind
"""


def image_resize_sql(out_w: int = 4, out_h: int = 4,
                     table: str = "documents") -> str:
    """Image-resize twin (``media.resize_images``): per image span,
    nearest-neighbor source index src = (dst * src_dim) // dst_dim —
    exact integers — then the fixture pixel formula per selected pixel.
    The engine path decodes REAL PNG bytes first, so equality proves
    decode + resample reconstruct every selected pixel."""
    from optimizing_ray.stages.codecs import IMG_H, IMG_W, PIX_MOD
    skey = "(doc_id * 16 + ord)"
    nq = out_w * out_h * 3
    r6 = "floor({} * 1e6 + 0.5) / 1e6"
    npix = float(out_w * out_h)
    return f"""
WITH ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i
        FROM sp),
med AS (SELECT doc_id, ord,
         (doc_id * 16 + ord) % {PIX_MOD} AS base
        FROM fld WHERE kind_i = 1),
rp AS (SELECT doc_id, ord, base, q.q AS q FROM med, range({nq}) q(q)),
pix AS (SELECT doc_id, ord,
         ((((q // {out_w * 3}) * {IMG_H}) // {out_h}) * {IMG_W}
          + (((q % {out_w * 3}) // 3) * {IMG_W}) // {out_w}) * 3
         + (q % 3) AS p,
         q % 3 AS c, base
        FROM rp),
pv AS (SELECT doc_id, ord, c,
        (base * (p + 1) + ((p * p) % 257) * 31) % 256 AS v
       FROM pix)
SELECT doc_id, ord,
  {r6.format(f"(CAST(SUM(CASE WHEN c = 0 THEN v ELSE 0 END) AS DOUBLE) / {npix!r})")} AS r_mean_r,
  {r6.format(f"(CAST(SUM(CASE WHEN c = 1 THEN v ELSE 0 END) AS DOUBLE) / {npix!r})")} AS r_mean_g,
  {r6.format(f"(CAST(SUM(CASE WHEN c = 2 THEN v ELSE 0 END) AS DOUBLE) / {npix!r})")} AS r_mean_b,
  CAST(MIN(v) AS BIGINT) AS r_min,
  CAST(MAX(v) AS BIGINT) AS r_max
FROM pv GROUP BY doc_id, ord
"""


def kmeans_sql(k: int = 8, scale: int = 1024,
               table: str = "embeddings") -> str:
    """One-Lloyd-step k-means twin (``cluster.kmeans_step`` +
    ``kmeans_assign``): quantize q = floor(double(v) * scale) (scale a
    power of two, so exact for float32 inputs), seeds = vec_id < k,
    integer argmin with (d2, cluster) tiebreak, refined centroids by the
    exact nonneg-mod floor division, second assignment.  All arithmetic
    int64 — no float summation order anywhere."""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {table}),
seeds AS (SELECT vec_id AS c, pos, q FROM eq WHERE vec_id < {k}),
d0 AS (SELECT e.vec_id, s.c, sum((e.q - s.q) * (e.q - s.q)) AS d2
       FROM eq e JOIN seeds s USING (pos) GROUP BY e.vec_id, s.c),
a0 AS (SELECT vec_id, c FROM (
         SELECT vec_id, c,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         FROM d0) WHERE rn = 1),
cs AS (SELECT a.c, e.pos, sum(e.q) AS s, count(*) AS n
       FROM a0 a JOIN eq e USING (vec_id) GROUP BY a.c, e.pos),
cent AS (SELECT c, pos,
                CAST((s - ((s % n) + n) % n) / n AS BIGINT) AS m FROM cs),
d1 AS (SELECT e.vec_id, t.c, sum((e.q - t.m) * (e.q - t.m)) AS d2
       FROM eq e JOIN cent t USING (pos) GROUP BY e.vec_id, t.c)
SELECT vec_id, c AS cluster, CAST(d2 AS BIGINT) AS dist2 FROM (
  SELECT vec_id, c, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
  FROM d1) WHERE rn = 1
"""


def pack_sequences_sql(budget: int = 2048, table: str = "documents") -> str:
    """Sequence-packing twin (``textops.pack_sequences``): docs
    concatenated in doc_id order into one token stream, chunked into
    fixed ``budget``-token packs; each doc reports its global token
    start offset and the pack containing its first token.  Token count =
    single-space split length (the decontaminate-family lockstep).  All
    integers; floor division via the exact divisible-subtraction form
    (never CAST(double), which rounds)."""
    return f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM {table}),
c AS (SELECT doc_id, n_tokens,
             CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT)
               AS pack_start
      FROM t)
SELECT doc_id, n_tokens, pack_start,
       CAST((pack_start - (pack_start % {budget})) / {budget} AS BIGINT)
         AS pack_id
FROM c
"""


def unigram_logprob_sql(table: str = "documents") -> str:
    """Unigram-LM quality-score twin (``textops.unigram_logprob``):
    corpus unigram counts (single-space token identity; the engine rides
    64-bit token hashes, collision caveat as decontaminate), per-doc
    score = mean ln(count(tok)) - ln(total corpus tokens), rounded
    floor(x*1e6+0.5)/1e6 at the END on both sides (per-doc float sums
    are order-ambiguous at ~1e-13 — far inside the rounding guard)."""
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM {table}),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (SELECT count(*) AS t FROM toks),
per AS (SELECT doc_id, count(*) AS n_tokens, sum(ln(c)) AS s
        FROM toks JOIN cnt USING (tok) GROUP BY doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       floor((s / n_tokens - ln((SELECT t FROM tot))) * 1e6 + 0.5) / 1e6
         AS logprob
FROM per
"""


def collocations_sql(k: int = 20, min_count: int = 2,
                     scale: int = 1_000_000,
                     table: str = "documents") -> str:
    """textops.collocations twin: adjacent pairs via the lag window
    (raw single-space split, the bigram_logprob lockstep), corpus
    unigram counts, the integer Dice score
    (2*c_uv*scale) // (c_u + c_v), row_number cut at k under
    (score DESC, c_uv DESC, u, v)."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS p,
                unnest(l) AS tok
         FROM lists),
pairs AS (SELECT doc_id, p, lag(tok) OVER (PARTITION BY doc_id ORDER BY p)
                 AS prev, tok
          FROM toks),
pr AS (SELECT prev AS u, tok AS v FROM pairs WHERE prev IS NOT NULL),
pc AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c_uv FROM pr
       GROUP BY u, v HAVING count(*) >= {min_count}),
uc AS (SELECT tok AS w, CAST(count(*) AS BIGINT) AS c FROM toks
       GROUP BY tok),
sc AS (SELECT pc.u, pc.v, pc.c_uv, cu.c AS c_u, cv.c AS c_v,
              CAST((2 * pc.c_uv * {scale}) // (cu.c + cv.c) AS BIGINT)
                AS score_micro
       FROM pc JOIN uc cu ON cu.w = pc.u JOIN uc cv ON cv.w = pc.v),
r AS (SELECT *, row_number() OVER
        (ORDER BY score_micro DESC, c_uv DESC, u, v) AS rk FROM sc)
SELECT CAST(rk AS BIGINT) AS coll_rank, u, v, c_uv, c_u, c_v, score_micro
FROM r WHERE rk <= {k} ORDER BY coll_rank"""


def bigram_logprob_sql(vocab_size: int = 4096,
                       table: str = "documents") -> str:
    """Bigram-LM quality-score twin (``textops.bigram_logprob``): pair
    identity by token STRINGS via a lag window (the engine rides 64-bit
    hash mixes of the same sequences); add-1 / add-V smoothing with the
    CONSTANT vocabulary V, prefix counts from the pair counts; docs
    with < 2 tokens score 0.0; floor(x*1e6+0.5)/1e6 at the END (the
    engine groups its float sums differently — drift ~1e-12, far inside
    the guard)."""
    V = float(vocab_size)
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS p,
                unnest(l) AS tok
         FROM lists),
pairs AS (SELECT doc_id, p, lag(tok) OVER (PARTITION BY doc_id ORDER BY p)
                 AS prev, tok
          FROM toks),
pr AS (SELECT doc_id, prev, tok FROM pairs WHERE prev IS NOT NULL),
pc AS (SELECT prev, tok, count(*) AS c FROM pr GROUP BY prev, tok),
pv AS (SELECT prev, sum(c) AS cp FROM pc GROUP BY prev),
per AS (SELECT pr.doc_id, count(*) AS n_pairs,
               sum(ln(c + 1.0) - ln(cp + {V!r})) AS s
        FROM pr JOIN pc USING (prev, tok) JOIN pv USING (prev)
        GROUP BY pr.doc_id)
SELECT l.doc_id, CAST(COALESCE(per.n_pairs, 0) AS BIGINT) AS n_pairs,
       COALESCE(floor(per.s / per.n_pairs * 1e6 + 0.5) / 1e6, 0.0)
         AS logprob
FROM lists l LEFT JOIN per USING (doc_id)
"""


def chunk_docs_sql(chunk_tokens: int = 64, stride: int = 48,
                   table: str = "documents") -> str:
    """Sliding-window chunking twin (``textops.chunk_docs``): single-space
    token windows every ``stride`` tokens; chunk text via inclusive
    list_slice + single-space join, byte-equal to the engine's contiguous
    blob slice of the original text."""
    return f"""
WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
ch AS (SELECT doc_id, l,
              unnest(generate_series(0, (len(l) - 1) // {stride})) AS chunk_id
       FROM lists)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
  CAST(chunk_id * {stride} AS BIGINT) AS chunk_start,
  CAST(least(chunk_id * {stride} + {chunk_tokens}, len(l))
       - chunk_id * {stride} AS BIGINT) AS n_chunk_tokens,
  array_to_string(list_slice(l, chunk_id * {stride} + 1,
                             chunk_id * {stride} + {chunk_tokens}), ' ')
    AS chunk_text
FROM ch
"""


def mix_corpus_sql(targets: dict, budget_tokens: int,
                   mult: int = 2_885_564_557,
                   table: str = "documents") -> str:
    """Corpus-mixing twin (``textops.mix_corpus``): per-language keep rate
    min(1, (budget * frac) / lang_tokens) — ONE multiply then ONE divide,
    bit-identical IEEE order to the engine — gated by the train_split
    id-hash frac.  Languages outside ``targets`` keep nothing."""
    cases = " ".join(f"WHEN lang = '{k}' THEN {float(v)!r}"
                     for k, v in targets.items())
    frac = f"(((doc_id * {mult}) % {1 << 32}) / {float(1 << 32)!r})"
    return f"""
WITH t AS (SELECT doc_id, lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM {table}),
tl AS (SELECT lang, sum(n_tokens) AS lang_toks FROM t GROUP BY lang),
r AS (SELECT lang,
             least(1.0, ({float(budget_tokens)!r} *
                         (CASE {cases} ELSE 0.0 END)) / CAST(lang_toks AS DOUBLE))
               AS rate
      FROM tl)
SELECT t.doc_id, t.lang, t.n_tokens
FROM t JOIN r USING (lang)
WHERE {frac} < r.rate
"""


def near_dedup_keep_sql(k_shingle: int = 5, jaccard_threshold: float = 0.5,
                        table: str = "documents") -> str:
    """End-to-end near-dedup keep-list twin (``dedup.near_dedup_keep``):
    the exact-Jaccard pair graph of ``minhash_pairs_sql`` closed into
    connected components by a recursive CTE (the ``spatial_clusters_sql``
    pattern), rep_id = the component's minimum member, kept = 1 iff the
    doc IS its representative.  Every document emits a row (singletons
    seed from the self row).  The engine's LSH stage is probabilistic
    recall, but on the driver corpus every true pair has jaccard >= 0.92
    where the 16x4 banding miss probability is < 1e-8 per pair — the
    exhaustive closure and the engine's clusters provably coincide."""
    return f"""
WITH RECURSIVE sh AS (
  SELECT DISTINCT doc_id, substring(text, i, {k_shingle}) AS s
  FROM {table},
       LATERAL (SELECT unnest(generate_series(1, greatest(1, length(text) - {k_shingle - 1}))) AS i) g
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
p0 AS (
  SELECT doc_a AS ea, doc_b AS eb
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ninter / CAST(sa.n + sb.n - ninter AS DOUBLE) >= {jaccard_threshold!r}
),
pairs AS (SELECT ea, eb FROM p0 UNION ALL SELECT eb, ea FROM p0),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT r.src, p.eb FROM reach r JOIN pairs p ON p.ea = r.dst
)
SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS rep_id,
       CAST(CASE WHEN MIN(dst) = src THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM reach GROUP BY src
"""


def semantic_dedup_sql(k: int = 8, scale: int = 1024,
                       tau_num: int = 9, tau_den: int = 10,
                       table: str = "embeddings",
                       plant_mod: int | None = None,
                       plant_offset: int = 10_000_000) -> str:
    """SemDeDup twin (``cluster.semantic_dedup``): the ``kmeans_sql``
    one-Lloyd-step assignment, then within each cluster a vector is a
    duplicate iff some LOWER-id same-cluster vector passes the integer
    cross-multiplied cosine gate

        dot > 0 AND tau_den^2*dot^2 >= tau_num^2*n2_a*n2_b

    over the same quantized vectors.  DuckDB sums BIGINT into HUGEINT so
    every product is exact; the engine guards its int64 range.

    ``plant_mod`` mirrors the driver query's planted exact copies
    (vec_id % mod == 0 duplicated under vec_id + offset): an identical
    vector lands in the same cluster with cosine exactly 1, so the
    operator provably marks every plant — the embedding_near_dup
    certainty argument applied to SemDeDup."""
    src = table
    if plant_mod is not None:
        src = f"""(SELECT vec_id, embedding FROM {table}
       UNION ALL
       SELECT vec_id + {plant_offset} AS vec_id, embedding
       FROM {table} WHERE vec_id % {plant_mod} = 0)"""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {src} AS src_emb),
seeds AS (SELECT vec_id AS c, pos, q FROM eq WHERE vec_id < {k}),
d0 AS (SELECT e.vec_id, s.c, sum((e.q - s.q) * (e.q - s.q)) AS d2
       FROM eq e JOIN seeds s USING (pos) GROUP BY e.vec_id, s.c),
a0 AS (SELECT vec_id, c FROM (
         SELECT vec_id, c,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         FROM d0) WHERE rn = 1),
cs AS (SELECT a.c, e.pos, sum(e.q) AS s, count(*) AS n
       FROM a0 a JOIN eq e USING (vec_id) GROUP BY a.c, e.pos),
cent AS (SELECT c, pos,
                CAST((s - ((s % n) + n) % n) / n AS BIGINT) AS m FROM cs),
d1 AS (SELECT e.vec_id, t.c, sum((e.q - t.m) * (e.q - t.m)) AS d2
       FROM eq e JOIN cent t USING (pos) GROUP BY e.vec_id, t.c),
a1 AS (SELECT vec_id, c AS cluster FROM (
         SELECT vec_id, c, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         FROM d1) WHERE rn = 1),
n2 AS (SELECT vec_id, sum(q * q) AS n2 FROM eq GROUP BY vec_id),
cp AS (SELECT a.vec_id AS va, b.vec_id AS vb
       FROM a1 a JOIN a1 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
dots AS (SELECT cp.va, cp.vb, sum(ea.q * eb.q) AS dot
         FROM cp
         JOIN eq ea ON ea.vec_id = cp.va
         JOIN eq eb ON eb.vec_id = cp.vb AND eb.pos = ea.pos
         GROUP BY cp.va, cp.vb),
dups AS (SELECT DISTINCT d.vb AS vec_id
         FROM dots d
         JOIN n2 na ON na.vec_id = d.va
         JOIN n2 nb ON nb.vec_id = d.vb
         WHERE d.dot > 0
           AND {tau_den * tau_den} * d.dot * d.dot
               >= {tau_num * tau_num} * na.n2 * nb.n2)
SELECT a1.vec_id, CAST(a1.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN dups.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM a1 LEFT JOIN dups USING (vec_id)
"""


def build_vocab_sql(min_count: int = 5, table: str = "documents") -> str:
    """Tokenizer-vocabulary twin (``textops.build_vocab``): single-space
    token counts (empties dropped), min-count cutoff, rank by
    (cnt DESC, term ASC) — DuckDB's default binary collation matches the
    engine's byte-order tie sort (UTF-8 byte order == code-point order)."""
    return f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM {table}),
cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks
        WHERE term <> '' GROUP BY term HAVING count(*) >= {min_count})
SELECT term, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS term_rank
FROM cnt
"""


def trajectory_stats_sql(world: World = DRIVER_WORLD,
                         table: str = "events") -> str:
    """Per-user trajectory twin (``windows.trajectory_stats``): points
    derived from event_id by the shared geometry formula, ordered by
    (ts, event_id); lag-window segment lengths, arg_min/arg_max first
    and last points, order-independent bbox extrema.  path_len and
    net_disp floor(x*1e6+0.5)/1e6 at the END on both sides."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT user_id, ts, event_id, {x} AS x, {y} AS y FROM {table}),
seg AS (SELECT user_id, x, y,
               x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy,
               row_number() OVER w AS rn
        FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
       floor(coalesce(sum(sqrt(dx * dx + dy * dy)), 0.0) * 1e6 + 0.5) / 1e6
         AS path_len,
       floor(sqrt((arg_max(x, rn) - arg_min(x, rn))
                  * (arg_max(x, rn) - arg_min(x, rn))
                + (arg_max(y, rn) - arg_min(y, rn))
                  * (arg_max(y, rn) - arg_min(y, rn))) * 1e6 + 0.5) / 1e6
         AS net_disp,
       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
FROM seg GROUP BY user_id
"""


def tile_embedding_centroid_sql(depth: int, world: World = DRIVER_WORLD,
                                scale: int = 1024,
                                table: str = "embeddings") -> str:
    """Semantic-tile-map twin (``cluster.tile_embedding_centroid``):
    points derived from vec_id by the shared geometry formula, quantized
    elements summed per (Morton tile, pos), exact floor-div mean via the
    nonneg-mod identity (never CAST(double AS BIGINT), which rounds)."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('vec_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('vec_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT vec_id, {x} AS px, {y} AS py FROM {table}),
cix AS (SELECT vec_id,
               {cell_idx_expr('px', world.min_x, wx, depth)} AS ix,
               {cell_idx_expr('py', world.min_y, wy, depth)} AS iy
        FROM pts),
{morton_ctes('cix', depth, carry='vec_id')},
eq AS (
  SELECT vec_id,
         CAST(unnest(generate_series(1, len(embedding))) AS BIGINT) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {table}),
agg AS (SELECT mz.mkey AS tile, eq.pos,
               CAST(count(*) AS BIGINT) AS n_vecs, sum(eq.q) AS s
        FROM mz JOIN eq USING (vec_id)
        GROUP BY mz.mkey, eq.pos)
SELECT tile, pos, n_vecs,
       CAST((s - ((s % n_vecs) + n_vecs) % n_vecs) / n_vecs AS BIGINT)
         AS centroid_q
FROM agg
"""


def importance_weights_sql(target_lang: str = "en", n_buckets: int = 4096,
                           max_token_len: int = 32,
                           table: str = "documents") -> str:
    """DSIR importance-weight twin (``textops.importance_weights``): the
    SAME polynomial token hash (base 1000003 mod 2^64) computed in SQL
    via a powers-of-base table — h = sum(byte_i * base^(L-i)) mod 2^64,
    HUGEINT products, one final mod.  ``ord(substring(tok, i, 1))`` is
    the UTF-8 byte for ASCII corpora (the driver tables are ASCII; the
    engine hashes raw bytes).  Tokens longer than ``max_token_len``
    would fall outside the powers table — the driver corpus max is far
    below it.  Bucket b = h % n_buckets; add-1 smoothed log-ratio score
    with the identical float expression shape, floor(x*1e6+0.5)/1e6 at
    the END."""
    base = 1000003
    mod = 1 << 64
    powers = ", ".join(f"({e}, {pow(base, e, mod)})"
                       for e in range(max_token_len))
    B = n_buckets
    return f"""
WITH powers(e, p) AS (VALUES {powers}),
lists AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, lang, i AS tpos, l[i] AS tok
         FROM lists,
              LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
chars AS (SELECT doc_id, tpos, length(tok) - ci AS e,
                 ord(substring(tok, ci, 1)) AS byte
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, length(tok))) AS ci) h),
th AS (SELECT doc_id, tpos,
              CAST(sum(CAST(byte AS HUGEINT) * p) % {mod} AS HUGEINT) AS h
       FROM chars JOIN powers USING (e) GROUP BY doc_id, tpos),
bk AS (SELECT t.doc_id, t.lang, CAST(coalesce(th.h, 0) % {B} AS BIGINT) AS b
       FROM toks t LEFT JOIN th ON th.doc_id = t.doc_id AND th.tpos = t.tpos),
rcnt AS (SELECT b, count(*) AS rc FROM bk GROUP BY b),
tcnt AS (SELECT b, count(*) AS tc FROM bk WHERE lang = '{target_lang}'
         GROUP BY b),
tots AS (SELECT (SELECT count(*) FROM bk) AS r_tot,
                (SELECT coalesce(sum(tc), 0) FROM tcnt) AS t_tot),
per AS (SELECT bk.doc_id, count(*) AS n_tokens,
               sum(ln(coalesce(tc, 0) + 1.0) - ln(rc + 1.0)) AS s
        FROM bk JOIN rcnt USING (b) LEFT JOIN tcnt USING (b)
        GROUP BY bk.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       floor((s + n_tokens * (ln(CAST(r_tot AS DOUBLE) + {float(B)!r})
                            - ln(CAST(t_tot AS DOUBLE) + {float(B)!r})))
             * 1e6 + 0.5) / 1e6 AS weight
FROM per, tots
"""


def dsir_sample_sql(target_lang: str = "en", scale: int = 2,
                    offset6: int = 500_000, mult: int = 2_654_435_761,
                    table: str = "documents") -> str:
    """DSIR importance-resampling twin (``textops.dsir_sample``): the
    importance_weights query feeds an all-integer acceptance gate —
    rate6 = clamp(scale * floor(weight / n_tokens * 1e6 + 0.5) + offset6,
    0, 1e6); keep iff ((doc_id * mult) % 2^32) * 1e6 < rate6 * 2^32.
    Every arithmetic step lands on identical doubles/BIGINTs in both
    engines (the train_split 2^32-wrap discipline)."""
    iw = importance_weights_sql(target_lang=target_lang, table=table)
    return f"""
WITH iw AS ({iw}),
rated AS (SELECT doc_id, n_tokens, weight,
                 least(greatest({scale} * CAST(floor(weight / n_tokens * 1e6
                                                     + 0.5) AS BIGINT)
                                + {offset6}, 0), 1000000) AS rate6
          FROM iw)
SELECT doc_id, n_tokens, weight, rate6
FROM rated
WHERE ((doc_id * {mult}) % 4294967296) * 1000000 < rate6 * 4294967296
"""


def source_quality_gate_sql(tau: float = 0.7,
                            table: str = "documents") -> str:
    """Per-domain curation gate twin (``textops.source_quality_gate``):
    the text_analysis quality CTEs feed a per-source HAVING with the
    integer cross-multiply mean test (sum of q6 >= tau6 * count — no
    float division), then a semi-join keeps the surviving sources'
    docs."""
    tau6 = int(tau * 1e6 + 0.5)  # tau > 0: int() == floor here
    return f"""
WITH {text_analysis_ctes(table)},
q AS (SELECT d.doc_id, d.source, t.quality
      FROM {table} d JOIN ta t USING (doc_id)),
ok AS (SELECT source FROM q GROUP BY source
       HAVING sum(CAST(floor(quality * 1e6 + 0.5) AS BIGINT))
              >= {tau6} * count(*))
SELECT q.doc_id, q.source, q.quality FROM q JOIN ok USING (source)
"""


def event_transitions_sql(table: str = "events") -> str:
    """Event-type transition-matrix twin (``windows.event_transitions``):
    lag window over (ts, event_id) per user, group by the pair."""
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM {table})
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM seq WHERE prev IS NOT NULL
GROUP BY prev, event_type
"""


def curriculum_bins_sql(n_bins: int = 10, table: str = "documents") -> str:
    """Curriculum-binning twin (``sort.curriculum_bins``): exact rank by
    (n_chars, doc_id), bin = (rank-1)*B // N via the divisible-
    subtraction floor division (values nonnegative)."""
    return f"""
WITH r AS (
  SELECT doc_id, n_chars,
         CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS global_rank,
         CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n
  FROM {table})
SELECT doc_id, n_chars, global_rank,
       CAST(((global_rank - 1) * {n_bins}
             - (((global_rank - 1) * {n_bins}) % n)) / n AS BIGINT) AS bin
FROM r
"""


def embedding_knn_graph_sql(k: int = 5, scale: int = 1024,
                            table: str = "embeddings") -> str:
    """Embedding kNN-graph twin (``ann.embedding_knn_graph``): exhaustive
    quantized-integer L2 with the (d2, neighbor_id) total order —
    row_number cut at k is deterministic because neighbor ids are
    unique per query."""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {table}),
d AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             sum((a.q - b.q) * (a.q - b.q)) AS d2
      FROM eq a JOIN eq b ON a.pos = b.pos AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
r AS (SELECT va, vb, d2,
             row_number() OVER (PARTITION BY va ORDER BY d2, vb) AS rn
      FROM d)
SELECT va AS vec_id, vb AS neighbor_id, CAST(d2 AS BIGINT) AS dist2,
       CAST(rn AS BIGINT) AS knn_rank
FROM r WHERE rn <= {k}
"""


def ann_recall_sql(k: int = 5, n_probe: int = 2, n_seeds: int = 8,
                   scale: int = 1024, table: str = "embeddings") -> str:
    """ann.ivf_recall twin: replay the one-step kmeans centroids
    (assign-to-seed argmin under (d2, seed), per-cluster floor-division
    means via the mod-adjust), the engine's own-cell / probe-cell
    selection ((d2, cell) row_number), the pruned-candidate top-k cut,
    the exact top-k cut, and the per-vector intersection histogram —
    every step integer-exact, so the approximate-by-design IVF recall
    is deterministically verifiable."""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
           AS q
  FROM {table}),
sd AS (SELECT vec_id AS c, pos, q FROM eq WHERE vec_id < {n_seeds}),
ad AS (SELECT e.vec_id AS v, s.c AS c,
              sum((e.q - s.q) * (e.q - s.q)) AS d2
       FROM eq e JOIN sd s ON s.pos = e.pos
       GROUP BY e.vec_id, s.c),
a0 AS (SELECT v, c FROM (SELECT v, c, row_number() OVER
         (PARTITION BY v ORDER BY d2, c) AS rn FROM ad) WHERE rn = 1),
cn AS (SELECT c, CAST(count(*) AS BIGINT) AS n FROM a0 GROUP BY c),
cs AS (SELECT a0.c AS c, e.pos AS pos, sum(e.q) AS s
       FROM a0 JOIN eq e ON e.vec_id = a0.v GROUP BY a0.c, e.pos),
ct AS (SELECT cs.c AS c, cs.pos AS pos,
              CAST((cs.s - (((cs.s % cn.n) + cn.n) % cn.n)) / cn.n
                   AS BIGINT) AS cq
       FROM cs JOIN cn ON cn.c = cs.c),
vc AS (SELECT e.vec_id AS v, ct.c AS c,
              sum((e.q - ct.cq) * (e.q - ct.cq)) AS d2
       FROM eq e JOIN ct ON ct.pos = e.pos
       GROUP BY e.vec_id, ct.c),
vr AS (SELECT v, c, row_number() OVER
         (PARTITION BY v ORDER BY d2, c) AS rn FROM vc),
own AS (SELECT v, c FROM vr WHERE rn = 1),
prb AS (SELECT v, c FROM vr WHERE rn <= {n_probe}),
dall AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                sum((a.q - b.q) * (a.q - b.q)) AS d2
         FROM eq a JOIN eq b ON a.pos = b.pos AND a.vec_id <> b.vec_id
         GROUP BY a.vec_id, b.vec_id),
cand AS (SELECT d.va, d.vb, d.d2 FROM dall d
         JOIN prb p ON p.v = d.va
         JOIN own o ON o.v = d.vb AND o.c = p.c),
appr AS (SELECT va, vb FROM (SELECT va, vb, row_number() OVER
           (PARTITION BY va ORDER BY d2, vb) AS rn FROM cand)
         WHERE rn <= {k}),
exct AS (SELECT va, vb FROM (SELECT va, vb, row_number() OVER
           (PARTITION BY va ORDER BY d2, vb) AS rn FROM dall)
         WHERE rn <= {k}),
hv AS (SELECT x.va AS v, count(a.vb) AS h
       FROM exct x LEFT JOIN appr a ON a.va = x.va AND a.vb = x.vb
       GROUP BY x.va)
SELECT CAST(h AS BIGINT) AS n_hits, CAST(count(*) AS BIGINT) AS n_vectors
FROM hv GROUP BY h ORDER BY n_hits"""


def kcore_sql(k_nn: int = 5, k_core: int = 2, rounds: int = 4,
              scale: int = 1024, table: str = "embeddings") -> str:
    """cluster.kcore twin over the MUTUAL kNN graph (reciprocal edges
    — already symmetric, and degree-irregular so the peel is
    non-trivial): one CTE pair per peeling round (alive-restricted
    degree, >= k filter), final LEFT-JOINed degree so zero-degree
    survivors keep their row."""
    blocks = [f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
           AS q
  FROM {table}),
dd AS (SELECT a.vec_id AS va, b.vec_id AS vb,
              sum((a.q - b.q) * (a.q - b.q)) AS d2
       FROM eq a JOIN eq b ON a.pos = b.pos AND a.vec_id <> b.vec_id
       GROUP BY a.vec_id, b.vec_id),
rr AS (SELECT va, vb, row_number() OVER
         (PARTITION BY va ORDER BY d2, vb) AS rn FROM dd),
g AS (SELECT va, vb FROM rr WHERE rn <= {k_nn}),
ed AS (SELECT DISTINCT g1.va AS a, g1.vb AS b FROM g g1
       JOIN g g2 ON g2.va = g1.vb AND g2.vb = g1.va),
a0 AS (SELECT DISTINCT vec_id AS v FROM {table})"""]
    for t in range(1, rounds + 1):
        blocks.append(f"""
d{t} AS (SELECT e.a AS v, count(*) AS dg FROM ed e
         JOIN a{t - 1} x ON x.v = e.a JOIN a{t - 1} y ON y.v = e.b
         GROUP BY e.a),
a{t} AS (SELECT v FROM d{t} WHERE dg >= {k_core})""")
    blocks.append(f"""
df AS (SELECT e.a AS v, count(*) AS dg FROM ed e
       JOIN a{rounds} x ON x.v = e.a JOIN a{rounds} y ON y.v = e.b
       GROUP BY e.a)""")
    return ",".join(blocks) + f"""
SELECT x.v AS node, CAST(COALESCE(df.dg, 0) AS BIGINT) AS deg
FROM a{rounds} x LEFT JOIN df ON df.v = x.v
ORDER BY node"""


def knn_classify_sql(k: int = 5, holdout_mod: int = 5,
                     holdout_rem: int = 0, scale: int = 1024,
                     table: str = "embeddings") -> str:
    """kNN majority-vote classifier twin (``ann.knn_classify``):
    exhaustive quantized-integer L2 from the held-out queries to the
    train split, row_number cut at k under (d2, train_id), then the
    (count DESC, label ASC) vote winner per query."""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT)
           AS q
  FROM {table}),
d AS (SELECT a.vec_id AS qv, b.vec_id AS tv,
             sum((a.q - b.q) * (a.q - b.q)) AS d2
      FROM eq a JOIN eq b ON a.pos = b.pos
      WHERE a.vec_id % {holdout_mod} = {holdout_rem}
        AND b.vec_id % {holdout_mod} <> {holdout_rem}
      GROUP BY a.vec_id, b.vec_id),
r AS (SELECT qv, tv, d2,
             row_number() OVER (PARTITION BY qv ORDER BY d2, tv) AS rn
      FROM d),
nb AS (SELECT r.qv, e.label FROM r JOIN {table} e ON e.vec_id = r.tv
       WHERE rn <= {k}),
vc AS (SELECT qv, label, count(*) AS c FROM nb GROUP BY qv, label),
w AS (SELECT qv, label, c,
             row_number() OVER (PARTITION BY qv ORDER BY c DESC, label ASC)
               AS wr
      FROM vc)
SELECT w.qv AS vec_id, CAST(e.label AS BIGINT) AS label,
       CAST(w.label AS BIGINT) AS pred_label, CAST(w.c AS BIGINT) AS n_votes
FROM w JOIN {table} e ON e.vec_id = w.qv
WHERE w.wr = 1
"""


def user_tile_visits_sql(depth: int, world: World = DRIVER_WORLD,
                         table: str = "events") -> str:
    """Spatio-temporal visit-matrix twin (``windows.user_tile_visits``):
    the Morton CTE chain over event_id-derived points, grouped by
    (user, tile) with exact min/max timestamps."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                    {x} AS px, {y} AS py
             FROM {table}),
cix AS (SELECT event_id, user_id, ts_us,
               {cell_idx_expr('px', world.min_x, wx, depth)} AS ix,
               {cell_idx_expr('py', world.min_y, wy, depth)} AS iy
        FROM pts),
{morton_ctes('cix', depth, carry='event_id, user_id, ts_us')}
SELECT user_id, mkey AS tile, CAST(count(*) AS BIGINT) AS n_visits,
       CAST(min(ts_us) AS BIGINT) AS first_ts_us,
       CAST(max(ts_us) AS BIGINT) AS last_ts_us
FROM mz GROUP BY user_id, mkey
"""


def geofence_transitions_sql(fence: tuple, world: World = DRIVER_WORLD,
                             table: str = "events") -> str:
    """Geofence enter/exit twin (``windows.geofence_transitions``): the
    shared event-point derivation feeds an inside-flag, lag window over
    (ts, event_id) per user, transitions where the flag changes."""
    fx0, fy0, fx1, fy1 = (float(v) for v in fence)
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                    {x} AS px, {y} AS py
             FROM {table}),
fl AS (SELECT event_id, user_id, ts_us,
              CASE WHEN px >= {fx0!r} AND px < {fx1!r}
                    AND py >= {fy0!r} AND py < {fy1!r}
                   THEN 1 ELSE 0 END AS ins
       FROM pts),
seq AS (SELECT *, lag(ins) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id) AS prev
        FROM fl)
SELECT user_id, event_id, CAST(ts_us AS BIGINT) AS ts_us,
       CASE WHEN ins = 1 THEN 'enter' ELSE 'exit' END AS kind
FROM seq WHERE prev IS NOT NULL AND prev <> ins
"""


def od_matrix_sql(depth: int, gap_s: int = 1800,
                  world: World = DRIVER_WORLD,
                  table: str = "events") -> str:
    """Origin-destination matrix twin (``windows.od_matrix``): Morton
    tiles over event points, session ids via the session_window lag +
    cumulative-sum rule, first/last tile per session via window
    functions (full frame for last_value), pair counts."""
    gap_us = int(gap_s) * 1_000_000
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                    {x} AS px, {y} AS py
             FROM {table}),
cix AS (SELECT event_id, user_id, ts_us,
               {cell_idx_expr('px', world.min_x, wx, depth)} AS ix,
               {cell_idx_expr('py', world.min_y, wy, depth)} AS iy
        FROM pts),
{morton_ctes('cix', depth, carry='event_id, user_id, ts_us')},
brk AS (SELECT event_id, user_id, ts_us, mkey,
               CASE WHEN ts_us - lag(ts_us) OVER
                         (PARTITION BY user_id ORDER BY ts_us, event_id)
                    > {gap_us} THEN 1 ELSE 0 END AS b
        FROM mz),
sid AS (SELECT *, SUM(b) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS s
        FROM brk),
ses AS (SELECT DISTINCT user_id, s,
               first_value(mkey) OVER w AS o,
               last_value(mkey) OVER
                 (PARTITION BY user_id, s ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS d
        FROM sid WINDOW w AS (PARTITION BY user_id, s
                              ORDER BY ts_us, event_id))
SELECT o AS origin_tile, d AS dest_tile,
       CAST(count(*) AS BIGINT) AS n_trips
FROM ses GROUP BY o, d
"""


def dedup_incremental_sql(old_mod: int = 3, table: str = "documents") -> str:
    """Incremental-dedup twin (``dedup.filter_new_against_store``): keep
    every doc whose TEXT does not appear among the stored docs
    (doc_id % old_mod != 0) — content-exact anti-join; the engine's
    joint-128-bit fingerprints are collision-negligible (the
    dedup_exact argument)."""
    return f"""
SELECT d.doc_id
FROM {table} d
WHERE NOT EXISTS (SELECT 1 FROM {table} o
                  WHERE o.doc_id % {old_mod} <> 0 AND o.text = d.text)
"""


def lang_confusion_sql(table: str = "documents") -> str:
    """Language-ID confusion-matrix twin (``textops.lang_confusion``):
    declared vs predicted language counts over the exact
    ``text_analysis_ctes`` lang_pred."""
    return f"""
WITH {text_analysis_ctes(table)}
SELECT d.lang, ta.lang_pred, CAST(count(*) AS BIGINT) AS n
FROM ta JOIN {table} d USING (doc_id)
GROUP BY d.lang, ta.lang_pred
"""


def cluster_top_terms_sql(k: int = 8, k_terms: int = 3, scale: int = 1024,
                          emb_table: str = "embeddings",
                          doc_table: str = "documents") -> str:
    """Cluster-topic twin (``cluster.cluster_top_terms``): the
    ``kmeans_sql`` assignment joined to the documents by id, token
    counts per (cluster, term) in the tatoks convention, row_number
    top-k by (cnt DESC, term)."""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {emb_table}),
seeds AS (SELECT vec_id AS c, pos, q FROM eq WHERE vec_id < {k}),
d0 AS (SELECT e.vec_id, s.c, sum((e.q - s.q) * (e.q - s.q)) AS d2
       FROM eq e JOIN seeds s USING (pos) GROUP BY e.vec_id, s.c),
a0 AS (SELECT vec_id, c FROM (
         SELECT vec_id, c,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         FROM d0) WHERE rn = 1),
cs AS (SELECT a.c, e.pos, sum(e.q) AS s, count(*) AS n
       FROM a0 a JOIN eq e USING (vec_id) GROUP BY a.c, e.pos),
cent AS (SELECT c, pos,
                CAST((s - ((s % n) + n) % n) / n AS BIGINT) AS m FROM cs),
d1 AS (SELECT e.vec_id, t.c, sum((e.q - t.m) * (e.q - t.m)) AS d2
       FROM eq e JOIN cent t USING (pos) GROUP BY e.vec_id, t.c),
a1 AS (SELECT vec_id, c AS cluster FROM (
         SELECT vec_id, c, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         FROM d1) WHERE rn = 1),
toks AS (
  SELECT doc_id, lower(tok) AS term
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text), '\\s+')) AS tok
        FROM {doc_table}) u
  WHERE tok <> ''),
ct AS (SELECT a1.cluster, t.term, count(*) AS cnt
       FROM toks t JOIN a1 ON a1.vec_id = t.doc_id
       GROUP BY a1.cluster, t.term),
r AS (SELECT cluster, term, cnt,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY cnt DESC, term) AS trank
      FROM ct)
SELECT CAST(cluster AS BIGINT) AS cluster, term, CAST(cnt AS BIGINT) AS cnt,
       CAST(trank AS BIGINT) AS term_rank
FROM r WHERE trank <= {k_terms}
"""


def late_events_sql(mult: int = 2_885_564_557,
                    table: str = "events") -> str:
    """Out-of-order accounting twin (``windows.late_events``): arrival
    order = event_id * mult mod 2^32 (bijective for odd mult and ids
    below 2^32 — the train_split wrap; a full-width mod 2^64 never
    wraps for small ids and preserves the original order); running max
    event time per
    user in arrival order with a 1-preceding frame; late = ts <
    watermark-before-arrival."""
    return f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
             PARTITION BY user_id
             ORDER BY (CAST(event_id AS HUGEINT) * {mult})
                      % {1 << 32}
             ROWS BETWEEN UNBOUNDED PRECEDING
             AND 1 PRECEDING) AS wm
  FROM {table})
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE ts_us < wm) AS BIGINT) AS n_late,
       CAST(coalesce(max(CASE WHEN ts_us < wm THEN wm - ts_us END), 0)
            AS BIGINT) AS max_skew_us
FROM seq GROUP BY user_id
"""


def semantic_decontaminate_sql(bench_mod: int = 25, scale: int = 1024,
                               tau_num: int = 9, tau_den: int = 10,
                               plant_offset: int = 10_000_000,
                               table: str = "embeddings") -> str:
    """Semantic-decontamination twin (``ann.semantic_decontaminate``)
    over the PLANTED corpus (originals plus exact copies of every
    benchmark vector under +offset, the embedding_near_dup certainty
    argument): survivors = non-benchmark vectors with NO benchmark
    vector at integer-exact cosine >= tau (a planted copy sits at
    cosine exactly 1 and provably drops)."""
    src = f"""(SELECT vec_id, embedding FROM {table}
       UNION ALL
       SELECT vec_id + {plant_offset} AS vec_id, embedding
       FROM {table} WHERE vec_id % {bench_mod} = 0)"""
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {src} AS src_emb),
n2 AS (SELECT vec_id, sum(q * q) AS n2 FROM eq GROUP BY vec_id),
bench AS (SELECT vec_id FROM {table} WHERE vec_id % {bench_mod} = 0),
dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.q * b.q) AS dot
         FROM eq a JOIN eq b ON a.pos = b.pos
         WHERE b.vec_id IN (SELECT vec_id FROM bench)
           AND a.vec_id NOT IN (SELECT vec_id FROM bench)
         GROUP BY a.vec_id, b.vec_id),
hits AS (SELECT DISTINCT d.va AS vec_id
         FROM dots d
         JOIN n2 na ON na.vec_id = d.va
         JOIN n2 nb ON nb.vec_id = d.vb
         WHERE d.dot > 0
           AND {tau_den * tau_den} * d.dot * d.dot
               >= {tau_num * tau_num} * na.n2 * nb.n2)
SELECT e.vec_id
FROM (SELECT DISTINCT vec_id FROM eq) e
WHERE e.vec_id NOT IN (SELECT vec_id FROM bench)
  AND e.vec_id NOT IN (SELECT vec_id FROM hits)
"""


def image_dhash_sql(gw: int = 9, gh: int = 8,
                    table: str = "documents") -> str:
    """Perceptual-dhash twin (``media.image_dhash``): the image_resize
    fixture-pixel formula resampled to a (gh, gw) integer-gray grid
    (gray = r+g+b), bit (y, x) = gray(y,x) < gray(y,x+1), weights from
    a 2^b VALUES table (HUGEINT literals), signed-int64 fold at the
    end (the split-multiply hash convention)."""
    from optimizing_ray.stages.codecs import IMG_H, IMG_W, PIX_MOD
    skey = "(doc_id * 16 + ord)"
    nq = gw * gh * 3
    n_bits = gh * (gw - 1)
    weights = ", ".join(f"({b}, {1 << b})" for b in range(n_bits))
    return f"""
WITH wt(b, w) AS (VALUES {weights}),
ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i
        FROM sp),
med AS (SELECT doc_id, ord,
         (doc_id * 16 + ord) % {PIX_MOD} AS base
        FROM fld WHERE kind_i = 1),
rp AS (SELECT doc_id, ord, base, q.q AS q FROM med, range({nq}) q(q)),
pix AS (SELECT doc_id, ord,
         q // {gw * 3} AS y, (q % {gw * 3}) // 3 AS x,
         ((((q // {gw * 3}) * {IMG_H}) // {gh}) * {IMG_W}
          + (((q % {gw * 3}) // 3) * {IMG_W}) // {gw}) * 3
         + (q % 3) AS p, base
        FROM rp),
g AS (SELECT doc_id, ord, y, x,
        SUM((base * (p + 1) + ((p * p) % 257) * 31) % 256) AS gray
      FROM pix GROUP BY doc_id, ord, y, x),
bits AS (SELECT a.doc_id, a.ord, a.y * {gw - 1} + a.x AS b
         FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.ord = a.ord
                          AND n.y = a.y AND n.x = a.x + 1
         WHERE a.gray < n.gray),
h AS (SELECT m.doc_id, m.ord,
        CAST(coalesce((SELECT SUM(wt.w) FROM bits
                       JOIN wt USING (b)
                       WHERE bits.doc_id = m.doc_id
                         AND bits.ord = m.ord), 0) AS HUGEINT) AS u
      FROM med m)
SELECT doc_id, ord,
       CAST(CASE WHEN u >= {1 << 63} THEN u - {1 << 64} ELSE u END
            AS BIGINT) AS dhash
FROM h
"""


def audio_fingerprint_sql(table: str = "documents") -> str:
    """Audio-fingerprint twin (``media.audio_fingerprint``): fixture
    samples x(i) = (base*(i+1) + i*i*7) % 4096 - 2048, bit i =
    x(i) < x(i+1), 2^i VALUES weights, signed-int64 fold."""
    from optimizing_ray.stages.codecs import N_SAMPLES, PIX_MOD
    skey = "(doc_id * 16 + ord)"
    weights = ", ".join(f"({b}, {1 << b})" for b in range(N_SAMPLES - 1))
    return f"""
WITH wt(b, w) AS (VALUES {weights}),
ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i
        FROM sp),
aud AS (SELECT doc_id, ord,
         (doc_id * 16 + ord) % {PIX_MOD} AS base
        FROM fld WHERE kind_i = 2),
smp AS (SELECT doc_id, ord, i.i AS i,
         (base * (i.i + 1) + i.i * i.i * 7) % 4096 - 2048 AS x
        FROM aud, range({N_SAMPLES}) i(i)),
bits AS (SELECT a.doc_id, a.ord, a.i AS b
         FROM smp a JOIN smp n ON n.doc_id = a.doc_id AND n.ord = a.ord
                             AND n.i = a.i + 1
         WHERE a.x < n.x),
h AS (SELECT m.doc_id, m.ord,
        CAST(coalesce((SELECT SUM(wt.w) FROM bits
                       JOIN wt USING (b)
                       WHERE bits.doc_id = m.doc_id
                         AND bits.ord = m.ord), 0) AS HUGEINT) AS u
      FROM aud m)
SELECT doc_id, ord,
       CAST(CASE WHEN u >= {1 << 63} THEN u - {1 << 64} ELSE u END
            AS BIGINT) AS afp
FROM h
"""


def audio_resample_sql(m: int = 48, table: str = "documents") -> str:
    """media.audio_resample twin: the fixture sample formula at the
    precomputed (j, i0, i1, r) interpolation grid (inlined VALUES —
    pure functions of j), v = x(i0) + floor((x(i1) - x(i0)) * r / den)
    with the negative-safe mod-adjust floor division."""
    from optimizing_ray.stages.codecs import N_SAMPLES, PIX_MOD
    den = m - 1
    rows = []
    for j in range(m):
        num = j * (N_SAMPLES - 1)
        i0, r = num // den, num % den
        i1 = min(i0 + 1, N_SAMPLES - 1)
        rows.append(f"({j}, {i0}, {i1}, {r})")
    skey = "(doc_id * 16 + ord)"
    return f"""
WITH jm(j, i0, i1, r) AS (VALUES {", ".join(rows)}),
ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id, ord,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i
        FROM sp),
aud AS (SELECT doc_id, ord,
         (doc_id * 16 + ord) % {PIX_MOD} AS base
        FROM fld WHERE kind_i = 2),
v0 AS (SELECT doc_id, ord, jm.j,
         ((base * (jm.i0 + 1) + jm.i0 * jm.i0 * 7) % 4096 - 2048) AS xa,
         (((base * (jm.i1 + 1) + jm.i1 * jm.i1 * 7) % 4096 - 2048)
          - ((base * (jm.i0 + 1) + jm.i0 * jm.i0 * 7) % 4096 - 2048))
           * jm.r AS s
       FROM aud, jm)
SELECT doc_id, ord, CAST(j AS BIGINT) AS out_i,
       CAST(xa + (s - (((s % {den}) + {den}) % {den})) / {den} AS BIGINT)
         AS v
FROM v0 ORDER BY doc_id, ord, out_i"""


def top_orders_sql(segment: str = "BUILDING", cutoff: str = "1997-06-15",
                   k: int = 10) -> str:
    """TPC-H Q3 twin (relational.top_orders): integer revenue4 =
    cents(price) * (100 - cents(discount)) summed per order; the LIMIT
    is deterministic because the ORDER BY composite ends in the unique
    o_orderkey."""
    return f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS rev
  FROM lineitem
  WHERE l_shipdate > TIMESTAMP '{cutoff} 00:00:00'),
o AS (
  SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us
  FROM orders JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment = '{segment}'
    AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00')
SELECT o.o_orderkey, o.o_orderdate_us,
       CAST(SUM(li.rev) AS BIGINT) AS revenue4
FROM li JOIN o ON li.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate_us
ORDER BY revenue4 DESC, o.o_orderkey
LIMIT {k}
"""


def pricing_summary_sql(cutoff: str = "1998-09-02",
                        table: str = "lineitem") -> str:
    """TPC-H Q1 twin (relational.pricing_summary): integer-cents fixed
    point keeps every sum order-exact; averages use the divisible-
    subtraction floor division (all operands nonnegative).  DuckDB sums
    integers as HUGEINT automatically — cast each output to BIGINT (the
    HUGEINT->float64 pandas gotcha)."""
    return f"""
WITH q AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pc,
         CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS dc,
         CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS tc
  FROM {table}
  WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'),
s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(qc) AS BIGINT) AS sum_qty_c,
         CAST(SUM(pc) AS BIGINT) AS sum_base_c,
         CAST(SUM(dc) AS BIGINT) AS sum_disc_c,
         CAST(SUM(pc * (100 - dc)) AS BIGINT) AS sum_disc_price4,
         CAST(SUM(pc * (100 - dc) * (100 + tc)) AS BIGINT) AS sum_charge6,
         CAST(COUNT(*) AS BIGINT) AS count_order
  FROM q GROUP BY l_returnflag, l_linestatus)
SELECT l_returnflag, l_linestatus, sum_qty_c, sum_base_c, sum_disc_c,
       sum_disc_price4, sum_charge6, count_order,
       CAST((sum_qty_c - (sum_qty_c % count_order)) / count_order
            AS BIGINT) AS avg_qty_c,
       CAST((sum_base_c - (sum_base_c % count_order)) / count_order
            AS BIGINT) AS avg_price_c,
       CAST((sum_disc_c - (sum_disc_c % count_order)) / count_order
            AS BIGINT) AS avg_disc_c
FROM s
"""


def sample_per_group_sql(n: int = 5, mult: int = 3_267_000_013,
                         table: str = "documents") -> str:
    """textops.sample_per_group twin: fixed-quota per-group sample by
    the 2^32-wrap hash rank (ties by doc_id — the hash is a permutation
    of ids so ties cannot occur, but the order pins the convention)."""
    return f"""
SELECT source, doc_id, smp_h, smp_rank
FROM (
  SELECT source, doc_id,
         (doc_id * {mult}) % 4294967296 AS smp_h,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {mult}) % 4294967296, doc_id) AS smp_rank
  FROM {table}
) s WHERE smp_rank <= {n}
"""

def funnel_sql(stages: tuple = ("view", "click", "purchase"),
               table: str = "events") -> str:
    """windows.funnel twin: per stage k the lexicographically FIRST
    (ts, event_id) stage-k event strictly after the user's stage-(k-1)
    match (greedy earliest match — optimal for existence).  The
    composite min is two plain aggregates: min ts, then min event_id
    among rows at that ts."""
    ctes = []
    for k, s in enumerate(stages, start=1):
        if k == 1:
            ctes.append(
                f"c1 AS (SELECT user_id, ts, event_id FROM {table} "
                f"WHERE event_type = '{s}')")
        else:
            ctes.append(
                f"c{k} AS (SELECT e.user_id, e.ts, e.event_id "
                f"FROM {table} e JOIN s{k - 1}e p ON e.user_id = p.user_id "
                f"WHERE e.event_type = '{s}' "
                f"AND (e.ts > p.t OR (e.ts = p.t AND e.event_id > p.i)))")
        ctes.append(
            f"s{k} AS (SELECT user_id, min(ts) AS t FROM c{k} "
            f"GROUP BY user_id)")
        ctes.append(
            f"s{k}e AS (SELECT c.user_id, s.t, min(c.event_id) AS i "
            f"FROM c{k} c JOIN s{k} s ON c.user_id = s.user_id "
            f"AND c.ts = s.t GROUP BY c.user_id, s.t)")
    selects = "\nUNION ALL\n".join(
        f"SELECT {k} AS stage, '{s}' AS event_type, "
        f"CAST(count(*) AS BIGINT) AS users FROM s{k}e"
        for k, s in enumerate(stages, start=1))
    return ("WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY stage")

def customer_distribution_sql(order_date_min: str | None = None) -> str:
    """relational.customer_distribution twin (TPC-H Q13 shape): order
    count per customer INCLUDING zero-order customers (left join), then
    the histogram of those counts.  order_date_min stands in for Q13's
    comment filter so the zero bucket exists on the driver fixture."""
    osrc = ("orders" if order_date_min is None else
            f"(SELECT * FROM orders WHERE o_orderdate >= "
            f"TIMESTAMP '{order_date_min} 00:00:00')")
    return f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(count(o.o_custkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN {osrc} o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def large_orders_sql(min_qty: float = 250.0) -> str:
    """relational.large_orders twin (TPC-H Q18 shape): integer-cents
    quantity sums (exact for 2-decimal TPC-H values), HAVING threshold
    on the integer sum, customer name via plain joins."""
    import math
    min_qty_c = int(math.floor(min_qty * 100.0 + 0.5))
    return f"""
WITH w AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) > {min_qty_c})
SELECT c.c_name, o.o_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_totalprice_c,
       w.sum_qty_c
FROM w JOIN orders o ON w.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice_c DESC, o.o_orderkey
"""

def count_min_sql(d: int = 4, w: int = 256, probe_start: int = 0,
                  probe_stop: int = 198, probe_step: int = 3,
                  key: str = "user_id", table: str = "events") -> str:
    """sketches.count_min twin: recomputes the EXACT counter matrix —
    bucket_j(u) = splitmix64((u + j*gamma) mod 2^64) mod w via the
    HUGEINT splitmix chain (hll_distinct_sql pattern, generalized to d
    seeded rows) — and the min-over-rows estimate for the same probe
    keys; absent buckets contribute 0 via the LEFT JOIN coalesce."""
    gamma = 0x9E3779B97F4A7C15
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

    def chain(prefix: str, src: str, keep: str) -> str:
        # splitmix64 on column h of `src`, carrying `keep` columns along
        return f"""{prefix}2 AS (SELECT {keep}, {_xorshift('h', 30)} AS h FROM {src}),
{prefix}3 AS (SELECT {keep}, {_mulmod64('h', c1)} AS h FROM {prefix}2),
{prefix}4 AS (SELECT {keep}, {_xorshift('h', 27)} AS h FROM {prefix}3),
{prefix}5 AS (SELECT {keep}, {_mulmod64('h', c2)} AS h FROM {prefix}4),
{prefix}f AS (SELECT {keep}, {_xorshift('h', 31)} AS h FROM {prefix}5)"""

    start = (f"((u + (j + 1) * CAST('{gamma}' AS HUGEINT)) % {_M64})")
    return f"""
WITH js AS (SELECT unnest(generate_series(0, {d - 1})) AS j),
ev AS (SELECT CAST({key} AS HUGEINT) AS u FROM {table}),
e1 AS (SELECT j, {start} AS h FROM ev, js),
{chain('e', 'e1', 'j')},
cells AS (SELECT j, CAST(h % {w} AS BIGINT) AS b,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM ef GROUP BY j, b),
pk AS (SELECT unnest(generate_series({probe_start}, {probe_stop},
                                     {probe_step})) AS k),
p1 AS (SELECT k, j, ((CAST(k AS HUGEINT) + (j + 1) *
         CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h FROM pk, js),
{chain('p', 'p1', 'k, j')},
pb AS (SELECT k, j, CAST(h % {w} AS BIGINT) AS b FROM pf)
SELECT pb.k AS {key},
       CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS cms_count
FROM pb LEFT JOIN cells ON pb.j = cells.j AND pb.b = cells.b
GROUP BY pb.k
ORDER BY pb.k
"""

def _splitmix_chain(prefix: str, src: str, keep: str) -> str:
    """CTE text applying the splitmix64 mix steps to HUGEINT column h of
    ``src`` (z = x + gamma must already be folded into h), carrying the
    ``keep`` columns; final CTE is ``{prefix}f``."""
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    return f"""{prefix}2 AS (SELECT {keep}, {_xorshift('h', 30)} AS h FROM {src}),
{prefix}3 AS (SELECT {keep}, {_mulmod64('h', c1)} AS h FROM {prefix}2),
{prefix}4 AS (SELECT {keep}, {_xorshift('h', 27)} AS h FROM {prefix}3),
{prefix}5 AS (SELECT {keep}, {_mulmod64('h', c2)} AS h FROM {prefix}4),
{prefix}f AS (SELECT {keep}, {_xorshift('h', 31)} AS h FROM {prefix}5)"""


def random_projection_sql(out_dim: int = 16, scale: int = 1024,
                          table: str = "embeddings") -> str:
    """ann.random_projection twin: the ±1 sign matrix is recomputed from
    the same splitmix64((pos * 4096 + j)) parity over a tiny
    (in_dim x out_dim) key grid, then y = sum(q * sgn) per (vec, j) —
    all-integer, bit-exact."""
    gamma = 0x9E3779B97F4A7C15
    return f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {table}),
js AS (SELECT unnest(generate_series(0, {out_dim - 1})) AS j),
sk AS (SELECT pos, j,
              ((CAST(pos * 4096 + j AS HUGEINT)
                + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h
       FROM (SELECT DISTINCT pos FROM eq) p, js),
{_splitmix_chain('s', 'sk', 'pos, j')},
sgn AS (SELECT pos, j,
               CASE WHEN h % 2 = 0 THEN 1 ELSE -1 END AS s FROM sf)
SELECT e.vec_id, CAST(g.j AS BIGINT) AS out_dim,
       CAST(SUM(e.q * g.s) AS BIGINT) AS y_q
FROM eq e JOIN sgn g USING (pos)
GROUP BY e.vec_id, g.j
ORDER BY e.vec_id, g.j
"""

def regional_sales_sql(region: str = "ASIA", date_from: str = "1996-01-01",
                       date_to: str = "1997-01-01") -> str:
    """relational.regional_sales twin (TPC-H Q5 shape): same-nation
    customer/supplier revenue per nation of the region, integer
    revenue4 (order-exact parallel sums)."""
    return f"""
SELECT n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue4,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
  AND o.o_orderdate < TIMESTAMP '{date_to} 00:00:00'
GROUP BY n.n_name
ORDER BY revenue4 DESC
"""

def triangle_count_sql(k: int = 5, scale: int = 1024,
                       table: str = "embeddings") -> str:
    """cluster.triangle_count twin over the kNN graph: symmetrize +
    orient the embedding_knn_graph_sql edge set to a < b, count
    same-min-vertex neighbor pairs (wedges) and those closed by an
    edge (each triangle once, at its minimum vertex)."""
    return f"""
WITH g AS ({embedding_knn_graph_sql(k=k, scale=scale, table=table)}),
e AS (SELECT DISTINCT least(vec_id, neighbor_id) AS a,
                      greatest(vec_id, neighbor_id) AS b
      FROM g WHERE vec_id <> neighbor_id),
w AS (SELECT e1.b AS x, e2.b AS y
      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b),
t AS (SELECT count(*) AS n_triangles
      FROM w JOIN e ON e.a = w.x AND e.b = w.y)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT) FROM w) AS n_wedges,
       CAST(t.n_triangles AS BIGINT) AS n_triangles
FROM t
"""

def sales_rollup_sql() -> str:
    """relational.sales_rollup twin: ROLLUP(nation, year) expressed as
    three sentinel-labelled GROUP BYs unioned ('ALL' / -1 instead of
    ROLLUP NULLs, sidestepping NULL normalization), integer cents."""
    base = """
  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS rev_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation n ON c.c_nationkey = n.n_nationkey"""
    return f"""
WITH b AS ({base})
SELECT n_name, o_year, CAST(SUM(rev_c) AS BIGINT) AS revenue_c,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM b GROUP BY n_name, o_year
UNION ALL
SELECT n_name, -1 AS o_year, CAST(SUM(rev_c) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM b GROUP BY n_name
UNION ALL
SELECT 'ALL' AS n_name, -1 AS o_year, CAST(SUM(rev_c) AS BIGINT),
       CAST(COUNT(*) AS BIGINT)
FROM b
"""

def cohort_retention_sql(week_us: int = 7 * 86400 * 1_000_000,
                         table: str = "events") -> str:
    """windows.cohort_retention twin: integer epoch weeks (nonneg, so
    plain integer division == floor), cohort = min week per user,
    one row per (cohort, offset) with distinct-user counts."""
    return f"""
WITH uw AS (SELECT DISTINCT user_id,
                   CAST(epoch_us(ts) // {week_us} AS BIGINT) AS w
            FROM {table}),
c AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY user_id)
SELECT c.cw AS cohort_week, CAST(uw.w - c.cw AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY c.cw, uw.w - c.cw
ORDER BY cohort_week, week_offset
"""

def skyline_docs_sql(table: str = "documents") -> str:
    """textops.skyline_docs twin: Pareto dominance by NOT EXISTS over
    the integer (q6, n_tokens) plane from the text_analysis CTEs."""
    return f"""
WITH {text_analysis_ctes(table)},
pts AS (SELECT doc_id,
               CAST(floor(quality * 1e6 + 0.5) AS BIGINT) AS q6,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM ta)
SELECT p.doc_id, p.q6, p.n_tokens
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts o
  WHERE o.q6 >= p.q6 AND o.n_tokens >= p.n_tokens
    AND (o.q6 > p.q6 OR o.n_tokens > p.n_tokens))
ORDER BY p.q6 DESC, p.n_tokens DESC, p.doc_id
"""

def pagerank_sql(k: int = 5, iters: int = 3, r0: int = 10 ** 9,
                 damp_num: int = 85, damp_den: int = 100,
                 scale: int = 1024, table: str = "embeddings") -> str:
    """cluster.pagerank twin over the directed kNN graph: the fixed-
    iteration recurrence unrolled as a CTE chain.  All arithmetic is
    integer: DuckDB ``//`` on the non-negative HUGEINT sums equals the
    engine's int64 floor division (trunc == floor for non-negatives);
    dangling mass leaks identically on both sides."""
    base = (r0 * (damp_den - damp_num)) // damp_den
    ctes = [f"""WITH g AS ({embedding_knn_graph_sql(k=k, scale=scale, table=table)}),
e AS (SELECT vec_id AS src, neighbor_id AS dst FROM g),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
n0 AS (SELECT vec_id FROM {table}),
r0 AS (SELECT vec_id, CAST({r0} AS BIGINT) AS r FROM n0)"""]
    for i in range(1, iters + 1):
        ctes.append(f""",
s{i} AS (SELECT e.dst AS vec_id, SUM(r.r // deg.d) AS s
         FROM e JOIN r{i - 1} r ON r.vec_id = e.src
                JOIN deg ON deg.src = e.src
         GROUP BY e.dst),
r{i} AS (SELECT n.vec_id,
                CAST({base} + ({damp_num} * COALESCE(s.s, 0)) // {damp_den}
                     AS BIGINT) AS r
         FROM n0 n LEFT JOIN s{i} s USING (vec_id))""")
    return "".join(ctes) + f"""
SELECT vec_id, r AS rank_fp FROM r{iters} ORDER BY vec_id
"""

def boolean_search_sql(terms, table: str = "documents") -> str:
    """search.boolean_search twin: AND-of-terms by string identity —
    single-space tokenization (string_split lockstep with the engine's
    token-hash identity), docs matching ALL distinct query terms, tf
    ranked.  Terms must be SQL-literal-safe ASCII (the driver corpus)."""
    uniq = sorted(set(terms))
    vals = ", ".join("('" + t.replace("'", "''") + "')" for t in uniq)
    return f"""
WITH q(term) AS (VALUES {vals}),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM {table}),
hits AS (SELECT t.doc_id, t.term FROM tok t JOIN q USING (term)),
agg AS (SELECT doc_id, COUNT(DISTINCT term) AS nt, COUNT(*) AS tf_total
        FROM hits GROUP BY doc_id)
SELECT doc_id, CAST(tf_total AS BIGINT) AS tf_total
FROM agg WHERE nt = {len(uniq)}
ORDER BY tf_total DESC, doc_id
"""

def order_priority_check_sql(date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01",
                             returnflag: str = "R") -> str:
    """relational.order_priority_check twin (TPC-H Q4 shape): EXISTS
    semi-join against returned lineitems, counts per priority."""
    return f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '{date_lo}'
  AND o.o_orderdate <  DATE '{date_hi}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = '{returnflag}')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

def churned_high_balance_sql(nations=(1, 3, 5, 8, 13, 17, 21),
                             cutoff: str = "2000-06-01") -> str:
    """relational.churned_high_balance twin (TPC-H Q22 shape): the
    above-average gate is the division-free cross-multiply over integer
    cents; the anti-join is NOT EXISTS on recent orders."""
    nat = ", ".join(str(int(n)) for n in nations)
    return f"""
WITH pos AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN ({nat})),
avg_ AS (
  SELECT CAST(SUM(bal_c) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM pos WHERE bal_c > 0),
sel AS (
  SELECT p.c_nationkey, p.bal_c
  FROM pos p, avg_
  WHERE p.bal_c * avg_.n > avg_.s
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= DATE '{cutoff}'))
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) AS totbal_c
FROM sel GROUP BY c_nationkey ORDER BY c_nationkey
"""

def robust_quality_stats_sql(trim_denom: int = 10,
                             table: str = "documents") -> str:
    """textops.robust_quality_stats twin: lower-median / MAD / trimmed
    sum-and-count per source via row_number order statistics over the
    integer q6 plane — (n+1)//2 picks the LOWER median (never averaged),
    trim drops n//trim_denom ranks from each end (boundary ties are
    value-identical so the kept multiset is tie-order invariant)."""
    return f"""
WITH {text_analysis_ctes(table)},
q AS (SELECT d.source,
             CAST(floor(ta.quality * 1e6 + 0.5) AS BIGINT) AS q6
      FROM ta JOIN {table} d USING (doc_id)),
r AS (SELECT source, q6,
             row_number() OVER (PARTITION BY source ORDER BY q6) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM q),
med AS (SELECT source, CAST(n AS BIGINT) AS n, q6 AS med_q6
        FROM r WHERE rn = (n + 1) // 2),
dev AS (SELECT r.source, abs(r.q6 - m.med_q6) AS dv, r.n
        FROM r JOIN med m USING (source)),
dr AS (SELECT source, dv, n,
              row_number() OVER (PARTITION BY source ORDER BY dv) AS rn
       FROM dev),
mad AS (SELECT source, dv AS mad_q6 FROM dr WHERE rn = (n + 1) // 2),
tr AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS trim_n,
              CAST(SUM(q6) AS BIGINT) AS trim_sum_q6
       FROM r WHERE rn > n // {trim_denom} AND rn <= n - n // {trim_denom}
       GROUP BY source)
SELECT m.source, m.n, m.med_q6, mad.mad_q6, tr.trim_n, tr.trim_sum_q6
FROM med m JOIN mad USING (source) JOIN tr USING (source)
ORDER BY m.source
"""

def promo_revenue_sql(date_from: str = "1997-09-01",
                      date_to: str = "1997-10-01",
                      promo_type: str = "PROMO") -> str:
    """relational.promo_revenue twin (TPC-H Q14 shape): integer rev4
    sums to HUGEINT; the share is the divisible-subtraction floor of
    promo*1e6/total (all operands nonnegative), CASE-guarded for the
    empty window."""
    return f"""
WITH li AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'),
s AS (
  SELECT COALESCE(SUM(CASE WHEN p_type = '{promo_type}'
                           THEN rev4 ELSE 0 END), 0) AS p4,
         COALESCE(SUM(rev4), 0) AS t4
  FROM li JOIN part ON p_partkey = l_partkey)
SELECT CAST(p4 AS BIGINT) AS promo_rev4, CAST(t4 AS BIGINT) AS total_rev4,
       CAST(CASE WHEN t4 = 0 THEN 0
            ELSE (p4 * 1000000 - ((p4 * 1000000) % t4)) / t4 END
            AS BIGINT) AS promo_share6
FROM s
"""


def bracket_revenue_sql(brackets: tuple = (("Brand#12", 1, 5, 1, 11),
                                           ("Brand#23", 1, 10, 10, 20),
                                           ("Brand#24", 1, 15, 20, 30))
                        ) -> str:
    """relational.bracket_revenue twin (TPC-H Q19 shape): the literal
    disjunctive form — one OR bracket per (brand, size, qty) tuple,
    quantity compared on integer cents exactly as the engine does."""
    ors = "\n   OR ".join(
        f"""(p_brand = '{br}' AND p_size BETWEEN {slo} AND {shi}
        AND CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)
            BETWEEN {qlo * 100} AND {qhi * 100})"""
        for br, slo, shi, qlo, qhi in brackets)
    return f"""
SELECT CAST(COALESCE(SUM(
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))), 0)
       AS BIGINT) AS revenue4,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {ors}
"""


def top_supplier_sql(date_from: str = "1996-01-01",
                     date_to: str = "1996-04-01") -> str:
    """relational.top_supplier twin (TPC-H Q15 shape): revenue ties all
    survive the scalar-max equality — exact because rev4 is integer."""
    return f"""
WITH r AS (
  SELECT l_suppkey,
         SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
           AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
  GROUP BY l_suppkey),
m AS (SELECT max(total) AS mt FROM r)
SELECT s_suppkey, s_name, CAST(total AS BIGINT) AS total_rev4
FROM r JOIN supplier ON s_suppkey = l_suppkey CROSS JOIN m
WHERE total = mt
ORDER BY s_suppkey
"""

def small_qty_revenue_sql(brand: str = "Brand#12", max_size: int = 25,
                          frac_den: int = 5) -> str:
    """relational.small_qty_revenue twin (TPC-H Q17 shape): the
    correlated average gate as the division-free cross-multiply
    frac_den*qc*n < sum(qc); /7 is one divisible-subtraction floor."""
    return f"""
WITH el AS (
  SELECT l_partkey,
         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS pc
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{brand}' AND p_size <= {max_size}),
s AS (SELECT l_partkey, SUM(qc) AS sq, COUNT(*) AS n
      FROM el GROUP BY l_partkey),
q AS (SELECT COALESCE(SUM(pc), 0) AS sp, COUNT(*) AS nl
      FROM el JOIN s USING (l_partkey)
      WHERE {frac_den} * qc * n < sq)
SELECT CAST(sp AS BIGINT) AS sum_price_c, CAST(nl AS BIGINT) AS n_lines,
       CAST((sp - (sp % 7)) / 7 AS BIGINT) AS avg_yearly_c
FROM q
"""


def returned_top_customers_sql(date_from: str = "1997-01-01",
                               date_to: str = "1997-04-01",
                               returnflag: str = "R",
                               k: int = 20) -> str:
    """relational.returned_top_customers twin (TPC-H Q10 shape): the
    LIMIT is deterministic on (revenue4 DESC, c_custkey)."""
    return f"""
WITH r AS (
  SELECT o_custkey,
         SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
           AS revenue4
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
    AND o_orderdate <  TIMESTAMP '{date_to} 00:00:00'
    AND l_returnflag = '{returnflag}'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, CAST(revenue4 AS BIGINT) AS revenue4,
       CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS c_acctbal_c,
       n_name
FROM r JOIN customer ON c_custkey = o_custkey
       JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue4 DESC, c_custkey
LIMIT {k}
"""


def nation_volume_sql(nat_a: int = 2, nat_b: int = 3,
                      date_from: str = "1996-01-01",
                      date_to: str = "1998-01-01") -> str:
    """relational.nation_volume twin (TPC-H Q7 shape): both directions
    of the nation pair, revenue per ship year, integer rev4."""
    return f"""
SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(c_nationkey AS BIGINT) AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
            * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue4
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
     JOIN supplier ON s_suppkey = l_suppkey
     JOIN customer ON c_custkey = o_custkey
WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
  AND ((s_nationkey = {nat_a} AND c_nationkey = {nat_b})
       OR (s_nationkey = {nat_b} AND c_nationkey = {nat_a}))
GROUP BY s_nationkey, c_nationkey, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

def winnow_fingerprints_sql(k: int = 8, w: int = 4,
                            table: str = "documents") -> str:
    """textops.winnow_fingerprints twin: per-position Horner mod-2^64
    k-gram hashes (unicode(substr) == byte for the ASCII driver corpus),
    window min over ROWS BETWEEN CURRENT AND w-1 FOLLOWING evaluated at
    the window starts i <= greatest(1, n-w+1) (the frame self-truncates
    for docs with fewer than w k-grams — the clipped single window),
    rightmost selection via max(position) among in-window minima, then
    DISTINCT.  HUGEINT headroom: h*B + byte < 2^84, one mod per step."""
    B = 1000003
    expr = f"CAST(unicode(substr(text, i, 1)) AS HUGEINT)"
    for j in range(1, k):
        expr = (f"(({expr}) * {B} "
                f"+ CAST(unicode(substr(text, i + {j}, 1)) AS HUGEINT)) "
                f"% {_M64}")
    return f"""
WITH pos AS (
  SELECT doc_id, i, length(text) - {k - 1} AS n, ({expr}) AS h
  FROM {table},
       LATERAL (SELECT unnest(generate_series(1, length(text) - {k - 1}))
                AS i) g
),
wm AS (
  SELECT doc_id, i, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS mh
  FROM pos
),
ws AS (SELECT doc_id, i AS wstart, mh FROM wm
       WHERE i <= greatest(1, n - {w - 1})),
sel AS (
  SELECT ws.doc_id, max(p.i) AS pi
  FROM ws JOIN pos p ON p.doc_id = ws.doc_id
       AND p.i BETWEEN ws.wstart AND ws.wstart + {w - 1}
       AND p.h = ws.mh
  GROUP BY ws.doc_id, ws.wstart)
SELECT DISTINCT s.doc_id AS doc_id, CAST(s.pi - 1 AS BIGINT) AS pos,
       {_u64_to_i64('p.h')} AS fp
FROM sel s JOIN pos p ON p.doc_id = s.doc_id AND p.i = s.pi
ORDER BY s.doc_id, pos
"""

def set_similarity_join_sql(theta_num: int = 19, theta_den: int = 20,
                            max_token_len: int = 32,
                            table: str = "documents") -> str:
    """dedup.set_similarity_join twin: the UNFILTERED brute self-join on
    the same polynomial token hashes (importance_weights powers-table
    pattern; empty tokens hash to 0 via the LEFT JOIN coalesce), DISTINCT
    per doc = the token SET, gate = division-free den*inter >=
    num*(na+nb-inter), jaccard6 one divisible-subtraction floor.  The
    engine's prefix filter must lose nothing against this brute."""
    base = 1000003
    mod = 1 << 64
    powers = ", ".join(f"({e}, {pow(base, e, mod)})"
                       for e in range(max_token_len))
    return f"""
WITH powers(e, p) AS (VALUES {powers}),
lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, i AS tpos, l[i] AS tok
         FROM lists,
              LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
chars AS (SELECT doc_id, tpos, length(tok) - ci AS e,
                 ord(substring(tok, ci, 1)) AS byte
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, length(tok)))
                        AS ci) h),
th AS (SELECT doc_id, tpos,
              CAST(sum(CAST(byte AS HUGEINT) * p) % {mod} AS HUGEINT) AS h
       FROM chars JOIN powers USING (e) GROUP BY doc_id, tpos),
uth AS (SELECT DISTINCT t.doc_id, coalesce(th.h, 0) AS h
        FROM toks t LEFT JOIN th ON th.doc_id = t.doc_id
                                AND th.tpos = t.tpos),
sz AS (SELECT doc_id, count(*) AS n FROM uth GROUP BY doc_id),
ipair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM uth a JOIN uth b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
gated AS (SELECT doc_a, doc_b, i, sa.n + sb.n - i AS u
          FROM ipair JOIN sz sa ON sa.doc_id = doc_a
                     JOIN sz sb ON sb.doc_id = doc_b
          WHERE {theta_den} * i >= {theta_num} * (sa.n + sb.n - i))
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter, CAST(u AS BIGINT) AS union_n,
       CAST((i * 1000000 - ((i * 1000000) % u)) / u AS BIGINT) AS jaccard6
FROM gated ORDER BY doc_a, doc_b
"""

def mutual_knn_sql(k: int = 5, scale: int = 1024,
                   table: str = "embeddings") -> str:
    """cluster.mutual_knn_pairs twin: distinct directed kNN edges
    self-joined on the reversed pair, kept once at a < b."""
    return f"""
WITH g AS ({embedding_knn_graph_sql(k=k, scale=scale, table=table)}),
d AS (SELECT DISTINCT vec_id AS a, neighbor_id AS b
      FROM g WHERE vec_id <> neighbor_id)
SELECT CAST(d1.a AS BIGINT) AS vec_a, CAST(d1.b AS BIGINT) AS vec_b
FROM d d1 JOIN d d2 ON d2.a = d1.b AND d2.b = d1.a
WHERE d1.a < d1.b
ORDER BY vec_a, vec_b
"""

def winnow_overlap_stats_sql(k: int = 8, w: int = 4, min_shared: int = 8,
                             max_df: int = 64,
                             table: str = "documents") -> str:
    """dedup.winnow_overlap_stats twin: distinct (doc, fp) from the
    winnow CTE, boilerplate fps (df > max_df) masked exactly as the
    engine's in-shard gate, self-join pair counts, gate, both-side
    per-doc rollup."""
    return f"""
WITH win AS ({winnow_fingerprints_sql(k=k, w=w, table=table)}),
fps0 AS (SELECT DISTINCT doc_id, fp FROM win),
keepfp AS (SELECT fp FROM fps0 GROUP BY fp
           HAVING count(*) <= {max_df}),
fps AS (SELECT doc_id, fp FROM fps0 JOIN keepfp USING (fp)),
p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS s
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
g AS (SELECT da, db, s FROM p WHERE s >= {min_shared}),
sides AS (SELECT da AS doc_id, s FROM g
          UNION ALL SELECT db AS doc_id, s FROM g)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_partners,
       CAST(max(s) AS BIGINT) AS max_shared
FROM sides GROUP BY doc_id ORDER BY doc_id
"""

def product_profit_sql(name_substr: str = "red") -> str:
    """relational.product_profit twin (TPC-H Q9 shape): profit4 =
    pc*(100-dc) - retail_c*qty_c, integer 1e-4 dollars (p_retailprice
    stands in for the absent ps_supplycost)."""
    return f"""
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
                - CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS profit4
FROM lineitem JOIN part ON p_partkey = l_partkey
     JOIN supplier ON s_suppkey = l_suppkey
     JOIN orders ON o_orderkey = l_orderkey
WHERE contains(p_name, '{name_substr}')
GROUP BY s_nationkey, o_year
ORDER BY s_nationkey, o_year
"""

def market_share_sql(target_nation: int = 3, region: str = "ASIA",
                     part_type: str = "ECONOMY") -> str:
    """relational.market_share twin (TPC-H Q8 shape): per-year integer
    totals + HUGEINT divisible-subtraction floor share."""
    return f"""
WITH j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)) AS rev4,
         CASE WHEN s_nationkey = {target_nation} THEN 1 ELSE 0 END AS tgt
  FROM lineitem JOIN part ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN customer ON c_custkey = o_custkey
       JOIN nation ON n_nationkey = c_nationkey
       JOIN region ON r_regionkey = n_regionkey
  WHERE p_type = '{part_type}' AND r_name = '{region}'),
s AS (SELECT o_year, SUM(rev4) AS t4, SUM(tgt * rev4) AS n4
      FROM j GROUP BY o_year)
SELECT o_year, CAST(t4 AS BIGINT) AS total_rev4,
       CAST(n4 AS BIGINT) AS nation_rev4,
       CAST(CASE WHEN t4 = 0 THEN 0
            ELSE (n4 * 1000000 - ((n4 * 1000000) % t4)) / t4 END
            AS BIGINT) AS share6
FROM s ORDER BY o_year
"""

def windowed_topk_sql(window_s: int = 3600, k: int = 3,
                      table: str = "events") -> str:
    """windows.windowed_topk_types twin: row_number over grouped counts
    under the (count DESC, type) composite — deterministic cut."""
    w_us = window_s * 1_000_000
    return f"""
WITH c AS (
  SELECT CAST((epoch_us(ts) // {w_us}) * {w_us} AS BIGINT)
           AS window_start_us,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM {table} GROUP BY 1, 2),
r AS (SELECT window_start_us, event_type, n,
             row_number() OVER (PARTITION BY window_start_us
                                ORDER BY n DESC, event_type) AS rank
      FROM c)
SELECT window_start_us, event_type, n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
ORDER BY window_start_us, rank
"""

def dominant_suppliers_sql(name_substr: str = "red", share_num: int = 3,
                           share_den: int = 20) -> str:
    """relational.dominant_suppliers twin (TPC-H Q20 shape): the
    correlated inner total + division-free share gate."""
    return f"""
WITH el AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qc
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE contains(p_name, '{name_substr}')),
ps AS (SELECT l_partkey, l_suppkey, SUM(qc) AS s FROM el
       GROUP BY l_partkey, l_suppkey),
pt AS (SELECT l_partkey, SUM(qc) AS tot FROM el GROUP BY l_partkey),
win AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts
        FROM ps JOIN pt USING (l_partkey)
        WHERE {share_den} * s > {share_num} * tot
        GROUP BY l_suppkey)
SELECT s_suppkey, s_name, n_parts
FROM win JOIN supplier ON s_suppkey = l_suppkey
ORDER BY s_suppkey
"""

def balance_deciles_sql(k: int = 10) -> str:
    """relational.balance_deciles twin: row_number under the same
    (bal_c, custkey) composite, the same integer bucket formula
    (NOT the builtin NTILE remainder rule), grouped summary."""
    return f"""
WITH b AS (
  SELECT CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_c,
         c_custkey
  FROM customer),
r AS (SELECT bal_c,
             row_number() OVER (ORDER BY bal_c, c_custkey) AS rn,
             (SELECT count(*) FROM b) AS n
      FROM b)
SELECT CAST((rn - 1) * {k} // n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c,
       CAST(MIN(bal_c) AS BIGINT) AS min_bal_c,
       CAST(MAX(bal_c) AS BIGINT) AS max_bal_c
FROM r GROUP BY 1 ORDER BY 1
"""

def trajectory_similarity_sql(depth: int, theta_num: int = 1,
                              theta_den: int = 5,
                              world: World = DRIVER_WORLD,
                              table: str = "events") -> str:
    """windows.trajectory_similarity twin: distinct (user, tile) from
    the user_tile_visits CTE, unfiltered brute self-join, division-free
    Jaccard gate, one divisible-subtraction floor for jaccard6."""
    return f"""
WITH utv AS ({user_tile_visits_sql(depth, world=world, table=table)}),
ut AS (SELECT DISTINCT user_id, tile FROM utv),
s AS (SELECT user_id, count(*) AS n FROM ut GROUP BY user_id),
i AS (SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS it
      FROM ut a JOIN ut b ON a.tile = b.tile AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id),
g AS (SELECT ua, ub, it, sa.n + sb.n - it AS un
      FROM i JOIN s sa ON sa.user_id = ua JOIN s sb ON sb.user_id = ub
      WHERE {theta_den} * it >= {theta_num} * (sa.n + sb.n - it))
SELECT ua AS user_a, ub AS user_b, CAST(it AS BIGINT) AS inter,
       CAST(un AS BIGINT) AS union_n,
       CAST((it * 1000000 - ((it * 1000000) % un)) / un AS BIGINT)
         AS jaccard6
FROM g ORDER BY user_a, user_b
"""

def slow_suppliers_sql() -> str:
    """relational.slow_suppliers twin (TPC-H Q21 shape): per-order
    distinct-supplier count, the strict unique-max-shipdate achiever,
    counted per supplier."""
    return """
WITH ps AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS sd
            FROM lineitem GROUP BY l_orderkey, l_suppkey),
o AS (SELECT l_orderkey, count(*) AS ns, max(sd) AS mx
      FROM ps GROUP BY l_orderkey),
w AS (SELECT ps.l_orderkey, ps.l_suppkey
      FROM ps JOIN o ON o.l_orderkey = ps.l_orderkey AND ps.sd = o.mx
      WHERE o.ns >= 2),
u AS (SELECT l_orderkey FROM w GROUP BY l_orderkey HAVING count(*) = 1),
n AS (SELECT w.l_suppkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM w JOIN u USING (l_orderkey) GROUP BY w.l_suppkey)
SELECT s_suppkey, s_name, n_orders
FROM n JOIN supplier ON s_suppkey = l_suppkey
ORDER BY s_suppkey
"""

def forecast_revenue_sql(date_from: str = "1997-01-01",
                         date_to: str = "1998-01-01", disc_lo: int = 5,
                         disc_hi: int = 7, max_qty: int = 24) -> str:
    """relational.forecast_revenue twin (TPC-H Q6): one filtered
    integer sum, discount band on cents."""
    return f"""
SELECT CAST(COALESCE(SUM(
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
         * CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)), 0)
       AS BIGINT) AS revenue6,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
  AND CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT)
      BETWEEN {disc_lo} AND {disc_hi}
  AND CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) < {max_qty * 100}
"""

def span_dedup_stats_sql(table: str = "documents") -> str:
    """textops.span_dedup_stats twin: derive the interleaved spans (same
    CTE arithmetic as ``span_kind_rollup_sql``), keep kind = text, fold
    to DISTINCT (doc, span text), count each span value's doc frequency,
    and roll up per doc.  The oracle counts on the RAW span texts while
    the engine counts on 64-bit polynomial hashes — equal counts prove
    the hashing injective on the observed span-value set."""
    from optimizing_ray.sources.driver_tables import SPAN_MULTS, SPAN_SALT
    toks = "[" + ", ".join(f"'{t}'" for t in SPAN_TOKENS) + "]"
    ntok = len(SPAN_TOKENS)
    skey = "(doc_id * 16 + ord)"
    return f"""
WITH ns AS (SELECT doc_id,
         1 + CAST(floor({frac_sql(f'(doc_id + {SPAN_SALT})', SPAN_MULTS['n'])} * 8) AS BIGINT) AS n_spans
       FROM {table}),
sp AS (SELECT doc_id,
         unnest(generate_series(0, n_spans - 1)) AS ord FROM ns),
fld AS (SELECT doc_id,
         CAST(floor({frac_sql(skey, SPAN_MULTS['kind'])} * 3) AS BIGINT) AS kind_i,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t1'])} * {ntok}) AS BIGINT) AS t1,
         CAST(floor({frac_sql(skey, SPAN_MULTS['t2'])} * {ntok}) AS BIGINT) AS t2
        FROM sp),
d AS (SELECT DISTINCT doc_id, {toks}[t1 + 1] || ' ' || {toks}[t2 + 1] AS txt
      FROM fld WHERE kind_i = 0),
f AS (SELECT txt, count(*) AS df FROM d GROUP BY txt)
SELECT d.doc_id,
  CAST(count(*) AS BIGINT) AS n_text_spans,
  CAST(count(*) FILTER (WHERE f.df >= 2) AS BIGINT) AS n_shared
FROM d JOIN f USING (txt) GROUP BY d.doc_id ORDER BY d.doc_id
"""

def bpe_merges_sql(n_merges: int = 6, table: str = "documents") -> str:
    """pipelines.bpe.bpe_merges twin: word counts once, then one CTE
    block per merge round — pair census from the guard-wrapped streams
    (range-lateral over the '><' split), argmax under (count DESC, pair
    byte-order ASC), merge applied with plain replace() (guards make one
    left-to-right pass exactly the canonical BPE sweep; see bpe.py).
    A green row proves every pair count, tie-break, and merge
    application byte-identical for the whole horizon."""
    blocks = [f"""
WITH wc AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table}) t
       WHERE w <> '' GROUP BY w),
ci AS (SELECT word, cnt,
       unnest(generate_series(0, length(word) - 1)) AS i FROM wc),
ch AS (SELECT word, cnt, i,
       substring(word, CAST(i + 1 AS INT), 1) AS c2 FROM ci),
s0 AS (SELECT word, cnt, string_agg('<' || c2 || '>', '' ORDER BY i) AS s
       FROM ch GROUP BY word, cnt)"""]
    for r in range(n_merges):
        blocks.append(f"""
tk{r} AS (SELECT cnt,
          string_split(substring(s, 2, length(s) - 2), '><') AS l
          FROM s{r}),
ti{r} AS (SELECT cnt, l,
          unnest(generate_series(0, len(l) - 2)) AS i FROM tk{r}),
pc{r} AS (SELECT l[i + 1] AS u, l[i + 2] AS v, SUM(cnt) AS c
          FROM ti{r} GROUP BY u, v),
m{r} AS (SELECT u, v, c FROM pc{r} ORDER BY c DESC, u ASC, v ASC LIMIT 1),
s{r + 1} AS (SELECT cnt,
    replace(s, COALESCE((SELECT '<' || u || '><' || v || '>' FROM m{r}),
                        chr(1)),
               COALESCE((SELECT '<' || u || v || '>' FROM m{r}),
                        chr(1))) AS s
    FROM s{r})""")
    final = "\nUNION ALL\n".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS merge_rank, u AS lhs, v AS rhs,"
        f" CAST(c AS BIGINT) AS pair_count FROM m{r}"
        for r in range(n_merges))
    return ",".join(blocks) + "\n" + final + "\nORDER BY merge_rank"

def bpe_encode_sql(n_merges: int = 6, table: str = "documents") -> str:
    """pipelines.bpe.bpe_encode twin: the bpe_merges_sql chain with
    ``word`` carried through every replace round, then per-word token
    count = count of '>' in the final stream, joined back to the doc's
    non-empty words.  Output (doc_id, n_words, n_tokens) per doc with
    >= 1 word."""
    blocks = [f"""
WITH wc AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table}) t
       WHERE w <> '' GROUP BY w),
ci AS (SELECT word, cnt,
       unnest(generate_series(0, length(word) - 1)) AS i FROM wc),
ch AS (SELECT word, cnt, i,
       substring(word, CAST(i + 1 AS INT), 1) AS c2 FROM ci),
s0 AS (SELECT word, cnt, string_agg('<' || c2 || '>', '' ORDER BY i) AS s
       FROM ch GROUP BY word, cnt)"""]
    for r in range(n_merges):
        blocks.append(f"""
tk{r} AS (SELECT cnt,
          string_split(substring(s, 2, length(s) - 2), '><') AS l
          FROM s{r}),
ti{r} AS (SELECT cnt, l,
          unnest(generate_series(0, len(l) - 2)) AS i FROM tk{r}),
pc{r} AS (SELECT l[i + 1] AS u, l[i + 2] AS v, SUM(cnt) AS c
          FROM ti{r} GROUP BY u, v),
m{r} AS (SELECT u, v, c FROM pc{r} ORDER BY c DESC, u ASC, v ASC LIMIT 1),
s{r + 1} AS (SELECT word, cnt,
    replace(s, COALESCE((SELECT '<' || u || '><' || v || '>' FROM m{r}),
                        chr(1)),
               COALESCE((SELECT '<' || u || v || '>' FROM m{r}),
                        chr(1))) AS s
    FROM s{r})""")
    blocks.append(f"""
wt AS (SELECT word, CAST(length(s) - length(replace(s, '>', ''))
                         AS BIGINT) AS ntok FROM s{n_merges}),
dw AS (SELECT doc_id, w AS word
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             FROM {table}) t WHERE w <> '')""")
    return ",".join(blocks) + f"""
SELECT dw.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(wt.ntok) AS BIGINT) AS n_tokens
FROM dw JOIN wt USING (word)
GROUP BY dw.doc_id ORDER BY dw.doc_id"""


def kmv_overlap_sql(k: int = 64, key_col: str = "event_type",
                    id_col: str = "user_id", table: str = "events") -> str:
    """sketches.kmv_overlap twin: recompute the k-minimum splitmix64
    values per key (row_number window), the merged per-pair sketch, and
    the integer estimators — exact counts while a sketch is not full,
    else floor((k-1)*2^64 / h_k) and the merged-sketch Jaccard, all in
    HUGEINT (approximate BY DESIGN, deterministically verifiable)."""
    gamma = 0x9E3779B97F4A7C15
    km1_64 = (k - 1) << 64
    return f"""
WITH du AS (SELECT DISTINCT {key_col} AS ky,
         CAST(CASE WHEN {id_col} < 0 THEN CAST({id_col} AS HUGEINT) + {_M64}
              ELSE CAST({id_col} AS HUGEINT) END AS HUGEINT) AS u
       FROM {table}),
k0 AS (SELECT ky, ((u + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h FROM du),
{_splitmix_chain('q', 'k0', 'ky')},
rk AS (SELECT ky, h, row_number() OVER (PARTITION BY ky ORDER BY h) AS r
       FROM qf),
sk AS (SELECT ky, h FROM rk WHERE r <= {k}),
tst AS (SELECT ky, count(*) AS n, max(h) AS hk FROM sk GROUP BY ky),
tes AS (SELECT ky, CASE WHEN n < {k} THEN CAST(n AS HUGEINT)
                   ELSE CAST('{km1_64}' AS HUGEINT) // hk END AS est
        FROM tst),
pr AS (SELECT a.ky AS ka, b.ky AS kb FROM tst a, tst b WHERE a.ky < b.ky),
mh AS (SELECT pr.ka, pr.kb, s.h FROM pr
       JOIN sk s ON s.ky = pr.ka OR s.ky = pr.kb
       GROUP BY pr.ka, pr.kb, s.h),
mr AS (SELECT ka, kb, h,
       row_number() OVER (PARTITION BY ka, kb ORDER BY h) AS r FROM mh),
mg AS (SELECT ka, kb, h FROM mr WHERE r <= {k}),
ma AS (SELECT ka, kb, count(*) AS nm, max(h) AS hkm FROM mg
       GROUP BY ka, kb),
xx AS (SELECT mg.ka, mg.kb, count(*) AS x FROM mg
       JOIN sk sa ON sa.ky = mg.ka AND sa.h = mg.h
       JOIN sk sb ON sb.ky = mg.kb AND sb.h = mg.h
       GROUP BY mg.ka, mg.kb),
ue AS (SELECT ka, kb, nm,
       CASE WHEN nm < {k} THEN CAST(nm AS HUGEINT)
            ELSE CAST('{km1_64}' AS HUGEINT) // hkm END AS est_u
       FROM ma)
SELECT ue.ka AS type_a, ue.kb AS type_b,
  CAST(ea.est AS BIGINT) AS est_a, CAST(eb.est AS BIGINT) AS est_b,
  CAST(ue.est_u AS BIGINT) AS est_union,
  CAST(CASE WHEN ue.nm < {k} THEN CAST(COALESCE(xx.x, 0) AS HUGEINT)
       ELSE (CAST(COALESCE(xx.x, 0) AS HUGEINT) * ue.est_u) // {k}
       END AS BIGINT) AS est_inter
FROM ue JOIN tes ea ON ea.ky = ue.ka JOIN tes eb ON eb.ky = ue.kb
LEFT JOIN xx ON xx.ka = ue.ka AND xx.kb = ue.kb
ORDER BY type_a, type_b
"""

def resample_interpolate_sql(step_s: int = 3600,
                             table: str = "events") -> str:
    """windows.resample_interpolate twin: second-truncated timestamps,
    last-writer-wins collapse per (user, second), lead() segments, grid
    instants via generate_series per segment, and the int64 interpolant
    with the mod-adjust FLOOR division (DuckDB // truncates; numpy //
    floors — repo notes)."""
    s = step_s
    return f"""
WITH e0 AS (SELECT user_id, epoch_us(ts) // 1000000 AS t,
            CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS v6, event_id
            FROM {table}),
e1 AS (SELECT user_id, t, v6, row_number() OVER
         (PARTITION BY user_id, t ORDER BY event_id DESC) AS rn FROM e0),
e AS (SELECT user_id, t, v6 FROM e1 WHERE rn = 1),
l AS (SELECT user_id, t, v6,
      lead(t) OVER (PARTITION BY user_id ORDER BY t) AS tn,
      lead(v6) OVER (PARTITION BY user_id ORDER BY t) AS vn FROM e),
s0 AS (SELECT user_id, t, v6, tn, vn,
       ((t + {s - 1}) // {s}) * {s} AS g0 FROM l),
s1 AS (SELECT user_id, t, v6, tn, vn, g0,
       CASE WHEN tn IS NOT NULL THEN ((tn - 1) // {s}) * {s}
            WHEN t % {s} = 0 THEN t ELSE g0 - {s} END AS g1 FROM s0),
gp AS (SELECT user_id, t, v6, tn, vn,
       unnest(generate_series(g0, g1, {s})) AS gts
       FROM s1 WHERE g1 >= g0)
SELECT user_id, gts,
  CAST(v6 + CASE WHEN tn IS NULL THEN 0 ELSE
    ((vn - v6) * (gts - t)
     - ((((vn - v6) * (gts - t)) % (tn - t) + (tn - t)) % (tn - t)))
    // (tn - t) END AS BIGINT) AS v6_interp
FROM gp ORDER BY user_id, gts
"""

def revenue_trend_sql() -> str:
    """relational.revenue_trend twin: yearly revenue cents per nation,
    centered years, HUGEINT OLS sums, exact rational slope."""
    return """
WITH o AS (SELECT o_custkey,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
        CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
cn AS (SELECT c_custkey, n_name FROM customer
       JOIN nation ON n_nationkey = c_nationkey),
j AS (SELECT n_name, yr, pc FROM o JOIN cn ON c_custkey = o_custkey),
a AS (SELECT n_name, yr - (SELECT min(yr) FROM j) AS x, SUM(pc) AS y
      FROM j GROUP BY n_name, yr),
t AS (SELECT n_name, count(*) AS ny, SUM(x) AS sx, SUM(x * x) AS sxx,
      SUM(y) AS sy, SUM(x * y) AS sxy FROM a GROUP BY n_name)
SELECT n_name AS nation, CAST(ny AS BIGINT) AS n_years,
  CAST(ny * sxy - sx * sy AS BIGINT) AS slope_num,
  CAST(ny * sxx - sx * sx AS BIGINT) AS slope_den
FROM t ORDER BY nation
"""

def mad_outliers_sql(k: int = 3, key_col: str = "event_type",
                     table: str = "events") -> str:
    """windows.mad_outliers twin: lower-median and MAD order statistics
    via row_number at rank (n+1)//2, integer filter |v - med| > k*MAD."""
    return f"""
WITH e AS (SELECT event_id, {key_col} AS key,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
           FROM {table}),
mr AS (SELECT key, v, row_number() OVER
         (PARTITION BY key ORDER BY v) AS rn,
         count(*) OVER (PARTITION BY key) AS n FROM e),
m AS (SELECT key, v AS med FROM mr WHERE rn = (n + 1) // 2),
d AS (SELECT e.key, abs(e.v - m.med) AS av FROM e
      JOIN m ON m.key = e.key),
dr AS (SELECT key, av, row_number() OVER
         (PARTITION BY key ORDER BY av) AS rn,
         count(*) OVER (PARTITION BY key) AS n FROM d),
md AS (SELECT key, av AS mad FROM dr WHERE rn = (n + 1) // 2)
SELECT e.event_id, e.key, e.v AS v_cents, m.med AS med_cents,
       md.mad AS mad_cents, abs(e.v - m.med) AS dev
FROM e JOIN m ON m.key = e.key JOIN md ON md.key = e.key
WHERE abs(e.v - m.med) > {k} * md.mad
ORDER BY event_id"""


def typo_pairs_sql(max_dist: int = 2, table: str = "documents") -> str:
    """textops.typo_pairs twin: the unbucketed brute — every distinct
    word pair under DuckDB levenshtein <= max_dist.  A green row
    proves the SymSpell deletion-neighborhood candidates lossless."""
    return f"""
WITH w AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
           FROM {table})
SELECT a.w AS word_a, b.w AS word_b,
       CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
FROM w a JOIN w b ON a.w < b.w
WHERE levenshtein(a.w, b.w) <= {max_dist}
ORDER BY word_a, word_b"""


def priority_sample_sql(k: int = 32, table: str = "documents") -> str:
    """textops.priority_sample twin: splitmix64(doc_id) low 32 bits,
    q = (w * 2^32) // (u + 1), row_number cut under (q DESC, doc_id)."""
    gamma = 0x9E3779B97F4A7C15
    return f"""
WITH w0 AS (SELECT doc_id, CAST(length(text) + 1 AS BIGINT) AS w
            FROM {table}),
k0 AS (SELECT doc_id, w,
       ((CAST(doc_id AS HUGEINT) + CAST('{gamma}' AS HUGEINT)) % {_M64})
         AS h FROM w0),
{_splitmix_chain('p', 'k0', 'doc_id, w')},
q AS (SELECT doc_id, w,
      CAST((w * 4294967296) // CAST((h % 4294967296) + 1 AS BIGINT)
           AS BIGINT) AS priority
      FROM pf),
r AS (SELECT doc_id, w, priority, row_number() OVER
        (ORDER BY priority DESC, doc_id) AS rk FROM q)
SELECT CAST(rk AS BIGINT) AS samp_rank, doc_id, w, priority
FROM r WHERE rk <= {k} ORDER BY samp_rank"""


def rendezvous_sql(n_buckets: int = 16, table: str = "documents") -> str:
    """stages.assign.rendezvous_assign_batch twin: splitmix64 over
    (doc_id * B + b) per bucket, owner = row_number (h DESC, b) = 1."""
    gamma = 0x9E3779B97F4A7C15
    return f"""
WITH bk AS (SELECT doc_id, b.b AS b FROM {table},
            range({n_buckets}) b(b)),
k0 AS (SELECT doc_id, b,
       ((CAST(doc_id AS HUGEINT) * {n_buckets} + b
         + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h FROM bk),
{_splitmix_chain('v', 'k0', 'doc_id, b')},
r AS (SELECT doc_id, b, row_number() OVER
        (PARTITION BY doc_id ORDER BY h DESC, b) AS rk FROM vf)
SELECT doc_id, CAST(b AS BIGINT) AS owner
FROM r WHERE rk = 1 ORDER BY doc_id"""


def theil_sen_sql(L: int = 2520) -> str:
    """relational.theil_sen twin: pairwise yearly slopes made integer
    by the common-denominator trick (every year gap divides L), lower
    median by row_number at (m-1)//2 + 1."""
    return f"""
WITH o AS (SELECT o_custkey,
        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc,
        CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders),
cn AS (SELECT c_custkey, n_name FROM customer
       JOIN nation ON n_nationkey = c_nationkey),
j AS (SELECT n_name, yr, pc FROM o JOIN cn ON c_custkey = o_custkey),
a AS (SELECT n_name, yr, CAST(SUM(pc) AS BIGINT) AS y
      FROM j GROUP BY n_name, yr),
pr AS (SELECT x.n_name, (z.y - x.y) * ({L} // (z.yr - x.yr)) AS s
       FROM a x JOIN a z ON z.n_name = x.n_name AND z.yr > x.yr),
md AS (SELECT n_name, s,
              row_number() OVER (PARTITION BY n_name ORDER BY s) AS rk,
              count(*) OVER (PARTITION BY n_name) AS m FROM pr),
ny AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_years
       FROM a GROUP BY n_name)
SELECT md.n_name AS nation, ny.n_years, CAST(md.m AS BIGINT) AS n_pairs,
       CAST(md.s AS BIGINT) AS slope_scaled
FROM md JOIN ny ON ny.n_name = md.n_name
WHERE md.rk = (md.m - 1) // 2 + 1
ORDER BY nation"""


def random_walks_sql(walk_len: int = 4, k: int = 5, scale: int = 1024,
                     table: str = "embeddings") -> str:
    """cluster.random_walks twin over the exact embedding kNN graph:
    the embedding_knn_graph CTEs build the ranked adjacency, then one
    splitmix64 block per step replays the counter-based neighbor choice
    rank = 1 + (splitmix64(start*16 + s) mod outdeg)."""
    gamma = 0x9E3779B97F4A7C15
    head = f"""
WITH eq AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS q
  FROM {table}),
dd AS (SELECT a.vec_id AS va, b.vec_id AS vb,
             sum((a.q - b.q) * (a.q - b.q)) AS d2
      FROM eq a JOIN eq b ON a.pos = b.pos AND a.vec_id <> b.vec_id
      GROUP BY a.vec_id, b.vec_id),
rr AS (SELECT va, vb,
             row_number() OVER (PARTITION BY va ORDER BY d2, vb) AS rn
      FROM dd),
g AS (SELECT va, vb, rn FROM rr WHERE rn <= {k}),
dg AS (SELECT va, count(*) AS deg FROM g GROUP BY va),
w0 AS (SELECT va AS st, va AS cur FROM dg)"""
    blocks = [head]
    for s in range(walk_len):
        blocks.append(f"""
h{s}0 AS (SELECT st, cur,
  ((CAST(st AS HUGEINT) * 16 + {s} + CAST('{gamma}' AS HUGEINT)) % {_M64})
  AS h FROM w{s}),
{_splitmix_chain(f'z{s}', f'h{s}0', 'st, cur')},
w{s + 1} AS (SELECT z.st, g.vb AS cur
  FROM z{s}f z
  JOIN dg ON dg.va = z.cur
  JOIN g ON g.va = z.cur
   AND g.rn = 1 + CAST(z.h % CAST(dg.deg AS HUGEINT) AS BIGINT))""")
    final = "\nUNION ALL\n".join(
        f"SELECT st AS start_id, CAST({s} AS BIGINT) AS step,"
        f" cur AS node_id FROM w{s}" for s in range(walk_len + 1))
    return ",".join(blocks) + "\n" + final + "\nORDER BY start_id, step"

def ranked_search_sql(queries, k: int = 10, scale: int = 1000,
                      table: str = "documents") -> str:
    """search.ranked_search twin: term-string TF/DF over the single-
    space split, the integer BM25-idf weight
    (scale*(2*(N-df)+1)) // (2*df+1) (positive operands: DuckDB trunc
    // == floor), score sum per (query, doc), row_number cut at k under
    (score DESC, doc_id).  ``queries`` is a list of term lists."""
    vals = ", ".join(f"({qi}, '" + t.replace("'", "''") + "')"
                     for qi, q in enumerate(queries) for t in sorted(set(q)))
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM {table}),
tfm AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfm AS (SELECT term, count(*) AS df FROM tfm GROUP BY term),
nn AS (SELECT count(*) AS n FROM {table}),
w AS (SELECT term,
      ({scale} * (2 * ((SELECT n FROM nn) - df) + 1)) // (2 * df + 1) AS w
      FROM dfm),
sc AS (SELECT q.query_id, t.doc_id, SUM(t.tf * w.w) AS score
       FROM q JOIN tfm t USING (term) JOIN w USING (term)
       GROUP BY q.query_id, t.doc_id),
r AS (SELECT query_id, doc_id, score, row_number() OVER
      (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM sc)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rk AS BIGINT) AS ret_rank,
       doc_id, CAST(score AS BIGINT) AS score
FROM r WHERE rk <= {k} ORDER BY query_id, ret_rank
"""


def copurchase_pairs_sql(min_support: int = 2,
                         table: str = "lineitem") -> str:
    """relational.copurchase_pairs twin: distinct (order, part) rows,
    self-join on orderkey with part_a < part_b, pair counts gated at
    min_support, single-part distinct-order supports attached."""
    return f"""
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM {table}),
pairs AS (SELECT a.pk AS pa, b.pk AS pb, count(*) AS c
          FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
          GROUP BY a.pk, b.pk),
sup AS (SELECT pk, count(*) AS s FROM op GROUP BY pk)
SELECT pairs.pa AS part_a, pairs.pb AS part_b,
       CAST(pairs.c AS BIGINT) AS pair_support,
       CAST(sa.s AS BIGINT) AS support_a,
       CAST(sb.s AS BIGINT) AS support_b
FROM pairs JOIN sup sa ON sa.pk = pairs.pa
           JOIN sup sb ON sb.pk = pairs.pb
WHERE pairs.c >= {min_support}
ORDER BY part_a, part_b
"""


def activity_streaks_sql(table: str = "events") -> str:
    """windows.activity_streaks twin: the row_number-difference
    gap-and-islands grouping, longest run per user with ties toward
    the earliest run end."""
    return f"""
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM {table}),
g AS (SELECT user_id, day,
        (day - DATE '1970-01-01')
        - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d),
s AS (SELECT user_id, count(*) AS len, max(day) AS send
      FROM g GROUP BY user_id, grp),
r AS (SELECT user_id, len, send, row_number() OVER
        (PARTITION BY user_id ORDER BY len DESC, send) AS rk FROM s),
n AS (SELECT user_id, count(*) AS nd FROM d GROUP BY user_id)
SELECT r.user_id, CAST(n.nd AS BIGINT) AS n_active_days,
       CAST(r.len AS BIGINT) AS longest_streak,
       CAST(r.send - DATE '1970-01-01' AS BIGINT) AS streak_end_day
FROM r JOIN n ON n.user_id = r.user_id
WHERE r.rk = 1 ORDER BY r.user_id
"""


def peak_concurrency_sql(base_s: int = 60, span_s: int = 3600,
                         table: str = "events") -> str:
    """windows.peak_concurrency twin: endpoint +1/-1 deltas folded per
    (key, point), window cumulative sum, max + earliest argmax."""
    return f"""
WITH e AS (SELECT event_type AS key,
                  CAST(epoch_us(ts) AS BIGINT) AS s,
                  CAST(epoch_us(ts) AS BIGINT)
                  + ({base_s} + abs(CAST(floor(value * 100.0 + 0.5)
                                         AS BIGINT)) % {span_s})
                    * 1000000 AS t
           FROM {table}),
pts AS (SELECT key, s AS pt, 1 AS delta FROM e
        UNION ALL SELECT key, t, -1 FROM e),
c AS (SELECT key, pt, sum(delta) AS d FROM pts GROUP BY key, pt),
r AS (SELECT key, pt, sum(d) OVER
        (PARTITION BY key ORDER BY pt) AS conc FROM c),
m AS (SELECT key, max(conc) AS mx FROM r GROUP BY key),
n AS (SELECT key, count(*) AS nev FROM e GROUP BY key)
SELECT m.key, CAST(n.nev AS BIGINT) AS n_events,
       CAST(m.mx AS BIGINT) AS peak,
       CAST(min(r.pt) AS BIGINT) AS peak_ts_us
FROM m JOIN r ON r.key = m.key AND r.conc = m.mx
       JOIN n ON n.key = m.key
GROUP BY m.key, n.nev, m.mx
ORDER BY m.key
"""


def phrase_search_sql(phrases, table: str = "documents") -> str:
    """search.phrase_search twin: zipped-unnest token positions, K-way
    self-join on consecutive indices matching token STRINGS (so a green
    row proves the engine's 64-bit token hashing injective here)."""
    def esc(s: str) -> str:
        return s.replace("'", "''")

    legs = []
    for qi, p in enumerate(phrases):
        toks = p.split(" ")
        joins, conds = [], [f"t0.tok = '{esc(toks[0])}'"]
        for j in range(1, len(toks)):
            joins.append(f"JOIN toks t{j} ON t{j}.doc_id = t0.doc_id "
                         f"AND t{j}.i = t0.i + {j}")
            conds.append(f"t{j}.tok = '{esc(toks[j])}'")
        legs.append(
            f"SELECT {qi} AS phrase_id, t0.doc_id, count(*) AS c, "
            f"min(t0.i) AS f FROM toks t0 {' '.join(joins)} "
            f"WHERE {' AND '.join(conds)} GROUP BY t0.doc_id")
    body = " UNION ALL ".join(legs)
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                     unnest(range(1, len(string_split(text, ' ')) + 1))
                     AS i FROM {table})
SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
       CAST(c AS BIGINT) AS n_matches, CAST(f AS BIGINT) AS first_tok
FROM ({body}) ORDER BY phrase_id, doc_id
"""


def link_prediction_sql(k: int = 5, scale: int = 1024,
                        table: str = "embeddings") -> str:
    """cluster.link_prediction twin over the mutual kNN graph:
    undirected wedge self-join, RA weight floor(1e9 / deg(center))
    (positive // == floor in DuckDB), anti-join on the edge set."""
    return f"""
WITH m AS ({mutual_knn_sql(k=k, scale=scale, table=table)}),
und AS (SELECT vec_a AS u, vec_b AS v FROM m
        UNION ALL SELECT vec_b, vec_a FROM m),
deg AS (SELECT u, count(*) AS dg FROM und GROUP BY u),
wed AS (SELECT a.u AS w, a.v AS x, b.v AS y
        FROM und a JOIN und b ON b.u = a.u AND a.v < b.v),
sc AS (SELECT wed.x AS pa, wed.y AS pb, count(*) AS nc,
              sum(1000000000 // deg.dg) AS ra
       FROM wed JOIN deg ON deg.u = wed.w GROUP BY wed.x, wed.y)
SELECT sc.pa AS vec_a, sc.pb AS vec_b,
       CAST(sc.nc AS BIGINT) AS n_common,
       CAST(sc.ra AS BIGINT) AS ra_score
FROM sc LEFT JOIN m ON m.vec_a = sc.pa AND m.vec_b = sc.pb
WHERE m.vec_a IS NULL
ORDER BY vec_a, vec_b
"""


def char_entropy_sql(table: str = "documents") -> str:
    """textops.char_entropy twin: char unnest + per-(doc, char) counts,
    H = ln(n) - sum(k*ln(k))/n, micro-rounded to int64 1e-6 (the
    unigram_logprob float-ln lockstep discipline)."""
    return f"""
WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
            FROM {table} WHERE len(text) > 0),
k AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
agg AS (SELECT doc_id, sum(k) AS n, count(*) AS nd,
               sum(k * ln(CAST(k AS DOUBLE))) AS s
        FROM k GROUP BY doc_id)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_e,
       CAST(nd AS BIGINT) AS n_distinct,
       CAST(floor((ln(CAST(n AS DOUBLE)) - s / n) * 1e6 + 0.5)
            AS BIGINT) AS entropy6
FROM agg ORDER BY doc_id
"""


def bm25_search_sql(queries, k: int = 10, scale: int = 1000,
                    table: str = "documents") -> str:
    """search.bm25_search twin: full BM25 with k1 = 6/5, b = 3/4
    cleared to the exact integer contribution
    (w*22*tf*T) // (10*T*tf + 3*T + 9*dl*N) — DuckDB sums land in
    HUGEINT, positive // == floor, bit-identical to the engine."""
    vals = ", ".join(f"({qi}, '" + t.replace("'", "''") + "')"
                     for qi, q in enumerate(queries)
                     for t in sorted(set(q)))
    return f"""
WITH q(query_id, term) AS (VALUES {vals}),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM {table}),
tfm AS (SELECT doc_id, term, count(*) AS tf FROM tok
        GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
nn AS (SELECT count(*) AS n FROM {table}),
tt AS (SELECT sum(dl) AS t FROM dl),
dfm AS (SELECT term, count(*) AS df FROM tfm GROUP BY term),
w AS (SELECT term,
      ({scale} * (2 * ((SELECT n FROM nn) - df) + 1)) // (2 * df + 1)
      AS w FROM dfm),
sc AS (SELECT q.query_id, t.doc_id,
       SUM((w.w * 22 * t.tf * (SELECT t FROM tt))
           // (10 * (SELECT t FROM tt) * t.tf
               + 3 * (SELECT t FROM tt)
               + 9 * dl.dl * (SELECT n FROM nn))) AS score
       FROM q JOIN tfm t USING (term) JOIN w USING (term)
            JOIN dl ON dl.doc_id = t.doc_id
       GROUP BY q.query_id, t.doc_id),
r AS (SELECT query_id, doc_id, score, row_number() OVER
      (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk FROM sc)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rk AS BIGINT) AS ret_rank, doc_id,
       CAST(score AS BIGINT) AS score
FROM r WHERE rk <= {k} ORDER BY query_id, ret_rank
"""


def trajectory_diameter_sql(world: World = DRIVER_WORLD,
                            table: str = "events") -> str:
    """windows.trajectory_diameter twin: shared-geometry points, brute
    self-join max pairwise squared distance per user (each pair's d2 is
    a fixed IEEE expression; max is order-independent), micro-rounded
    int64; single-point users report 0."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT user_id, event_id, {x} AS x, {y} AS y FROM {table}),
d AS (SELECT a.user_id,
             max((a.x - b.x) * (a.x - b.x)
                 + (a.y - b.y) * (a.y - b.y)) AS d2
      FROM pts a JOIN pts b
        ON b.user_id = a.user_id AND a.event_id < b.event_id
      GROUP BY a.user_id),
n AS (SELECT user_id, count(*) AS np FROM pts GROUP BY user_id)
SELECT n.user_id, CAST(n.np AS BIGINT) AS n_points,
       CAST(floor(coalesce(d.d2, 0.0) * 1e6 + 0.5) AS BIGINT) AS diam2_6
FROM n LEFT JOIN d ON d.user_id = n.user_id
ORDER BY n.user_id
"""


def morans_i_sql(depth: int, world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """raster.morans_i twin: per-cell counts, integer-scaled deviations
    z = N*n - S, rook-pair numerator via the precomputed-offset equi
    join (focal_stats shape), HUGEINT sums CAST back to BIGINT, and the
    fixed three-op double ratio (num/den)*N/W micro-rounded."""
    wx, wy, _ = world.size
    offs = "(1, 0), (-1, 0), (0, 1), (0, -1)"
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n
        FROM cellidx GROUP BY ix, iy),
s AS (SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(COALESCE(sum(n), 0) AS BIGINT) AS tot FROM cnt),
z AS (SELECT ix, iy, s.nc * cnt.n - s.tot AS z FROM cnt, s),
ce AS (SELECT a.z AS za, a.ix + o.dx AS jx, a.iy + o.dy AS jy
       FROM z a, (VALUES {offs}) o(dx, dy)),
pr AS (SELECT CAST(COALESCE(SUM(CAST(ce.za AS HUGEINT) * b.z), 0)
              AS BIGINT) AS num,
              CAST(count(*) AS BIGINT) AS w
       FROM ce JOIN z b ON b.ix = ce.jx AND b.iy = ce.jy),
dn AS (SELECT CAST(COALESCE(SUM(CAST(z AS HUGEINT) * z), 0)
              AS BIGINT) AS den FROM z)
SELECT s.nc AS n_cells, pr.w AS w_pairs, pr.num AS num, dn.den AS den,
       CASE WHEN dn.den = 0 OR pr.w = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(((CAST(pr.num AS DOUBLE) / CAST(dn.den AS DOUBLE))
                             * CAST(s.nc AS DOUBLE) / CAST(pr.w AS DOUBLE))
                            * 1e6 + 0.5) AS BIGINT)
       END AS morans_i_6
FROM s, pr, dn
"""


def grid_bfs_sql(depth: int, world: World = DRIVER_WORLD,
                 table: str = "documents", seed_mod: int = 101,
                 cap: int = 63) -> str:
    """raster.grid_bfs twin: occupied-cell counts with per-cell seed
    presence, then a depth-capped recursive-CTE wave (UNION dedups
    (ix, iy, d) rows; d <= cap bounds rows at occupied*cap), min(d) per
    cell, unreached -> -1, Morton-keyed output.  Neighbor step
    precomputes jx/jy in a derived table (the range-join-assertion-safe
    shape)."""
    wx, wy, _ = world.size
    offs = "(1, 0), (-1, 0), (0, 1), (0, -1)"
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n,
               max(CASE WHEN doc_id % {seed_mod} = 0 THEN 1 ELSE 0 END)
                 AS seeded
        FROM cellidx GROUP BY ix, iy),
reach(ix, iy, d) AS (
    SELECT ix, iy, 0 FROM cnt WHERE seeded = 1
  UNION
    SELECT c.ix, c.iy, e.d + 1
    FROM (SELECT r.ix + o.dx AS jx, r.iy + o.dy AS jy, r.d
          FROM reach r, (VALUES {offs}) o(dx, dy)
          WHERE r.d < {cap}) e
    JOIN cnt c ON c.ix = e.jx AND c.iy = e.jy
),
dist AS (SELECT ix, iy, min(d) AS hops FROM reach GROUP BY ix, iy),
j AS (SELECT cnt.ix, cnt.iy, cnt.n,
             COALESCE(dist.hops, -1) AS hops
      FROM cnt LEFT JOIN dist ON dist.ix = cnt.ix AND dist.iy = cnt.iy),
{morton_ctes('j', depth, carry='n, hops')}
SELECT mkey AS cell_key, CAST(n AS BIGINT) AS n_docs,
       CAST(hops AS BIGINT) AS hops
FROM mz ORDER BY cell_key
"""


def cusum_alarms_sql(h_cents: int = 30_000, table: str = "events") -> str:
    """windows.cusum_alarms twin: cents quantization, integer scaled
    deviations d = n*v - S, then the max(0,...) fold stated as the two
    prefix scans s_t = P_t - LEAST(0, running MIN(P)) in window
    functions — all BIGINT, the alarm compare st >= h*n integer."""
    return f"""
WITH v AS (SELECT user_id, ts, event_id,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM {table}),
a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s
      FROM v GROUP BY user_id),
d AS (SELECT v.user_id, v.ts, v.event_id, a.n, a.n * v.v - a.s AS d
      FROM v JOIN a ON a.user_id = v.user_id),
p AS (SELECT user_id, ts, event_id, n,
             SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS pt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS seq
      FROM d),
s AS (SELECT user_id, n, seq,
             pt - LEAST(0, MIN(pt) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)) AS st
      FROM p)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_events,
       CAST(COALESCE(sum(CASE WHEN st >= {h_cents} * n THEN 1 END), 0)
            AS BIGINT) AS n_alarms,
       CAST(COALESCE(min(CASE WHEN st >= {h_cents} * n THEN seq END), -1)
            AS BIGINT) AS first_alarm_seq,
       CAST(max(st) AS BIGINT) AS max_s
FROM s GROUP BY user_id ORDER BY user_id
"""


def ams_f2_sql(n_registers: int = 32, key: str = "user_id",
               table: str = "events") -> str:
    """sketches.ams_f2 twin: per (row, register) the count_min splitmix
    seeding (u + (j+1)*gamma mod 2^64), sign from hash parity, register
    sums / sum of squares in HUGEINT CAST back to BIGINT, estimate as
    the exact non-negative floor division, exact F2 side-by-side."""
    gamma = 0x9E3779B97F4A7C15
    r = n_registers
    return f"""
WITH js AS (SELECT unnest(generate_series(0, {r - 1})) AS j),
ev AS (SELECT CAST({key} AS HUGEINT) AS u FROM {table}),
e1 AS (SELECT j, ((u + (j + 1) * CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h
       FROM ev, js),
{_splitmix_chain('e', 'e1', 'j')},
regs AS (SELECT j, CAST(COALESCE(SUM(CASE WHEN h % 2 = 0 THEN 1
                                          ELSE -1 END), 0) AS BIGINT) AS s
         FROM ef GROUP BY j),
sq AS (SELECT CAST(COALESCE(SUM(CAST(s AS HUGEINT) * s), 0) AS BIGINT)
              AS sum_sq FROM regs),
nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM {table}),
fx AS (SELECT CAST(COALESCE(SUM(CAST(c AS HUGEINT) * c), 0) AS BIGINT)
              AS f2_exact
       FROM (SELECT count(*) AS c FROM {table} GROUP BY {key}) t)
SELECT nr.n_rows, CAST({r} AS BIGINT) AS n_registers, sq.sum_sq,
       CAST((sq.sum_sq - (sq.sum_sq % {r})) / {r} AS BIGINT) AS f2_est,
       fx.f2_exact
FROM nr, sq, fx
"""


def stay_points_sql(radius: float = 30_000.0, min_points: int = 2,
                    min_dur_us: int = 0, world: World = DRIVER_WORLD,
                    table: str = "events") -> str:
    """windows.stay_points twin: shared-geometry points in (ts, id)
    row_number order; per anchor, the first in-order partner whose
    fixed-IEEE d2 exceeds radius^2 bounds the window (min(seq) over
    violations), else the key's last point; duration in integer
    epoch microseconds."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    r2 = radius * radius
    return f"""
WITH pts AS (
  SELECT user_id, event_id, ts, {x} AS x, {y} AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS seq
  FROM {table}),
fv AS (SELECT a.user_id, a.seq AS i, min(b.seq) AS fvj
       FROM pts a JOIN pts b
         ON b.user_id = a.user_id AND b.seq > a.seq
       WHERE (a.x - b.x) * (a.x - b.x)
             + (a.y - b.y) * (a.y - b.y) > {r2!r}
       GROUP BY a.user_id, a.seq),
mx AS (SELECT user_id, max(seq) AS mseq FROM pts GROUP BY user_id),
w AS (SELECT p.user_id, p.event_id, p.seq, p.ts,
             COALESCE(f.fvj - 1, m.mseq) AS jmax
      FROM pts p
      JOIN mx m ON m.user_id = p.user_id
      LEFT JOIN fv f ON f.user_id = p.user_id AND f.i = p.seq),
res AS (SELECT w.user_id, w.event_id AS anchor_event_id,
               CAST(w.jmax - w.seq + 1 AS BIGINT) AS n_in_window,
               CAST(epoch_us(pj.ts) - epoch_us(w.ts) AS BIGINT) AS dur_us
        FROM w JOIN pts pj
          ON pj.user_id = w.user_id AND pj.seq = w.jmax)
SELECT user_id, anchor_event_id, n_in_window, dur_us
FROM res
WHERE n_in_window >= {min_points} AND dur_us >= {min_dur_us}
ORDER BY user_id, anchor_event_id
"""


def douglas_peucker_sql(eps: float = 20_000.0, world: World = DRIVER_WORLD,
                        table: str = "events") -> str:
    """windows.douglas_peucker twin: recursive-CTE segment closure;
    per segment the interior argmax of the fixed-IEEE cross^2 (ties ->
    lowest seq, stated as NOT EXISTS over the base points), split while
    cross^2 > eps^2 * len2; kept set = closure endpoints union (equals
    the engine's endpoint + split-point marks).  DISTINCT on the final
    select: DuckDB 1.0 drops the dedup of later branches in a >2-way
    UNION chain that follows a recursive CTE (minimal repro in
    CLAUDE.md oracle gotchas)."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    eps2 = eps * eps
    cr = ("((pj.x - pi.x) * ({K}.y - pi.y) "
          "- (pj.y - pi.y) * ({K}.x - pi.x))")
    c2k = f"({cr.format(K='k')} * {cr.format(K='k')})"
    c2k2 = f"({cr.format(K='k2')} * {cr.format(K='k2')})"
    return f"""
WITH RECURSIVE pts AS (
  SELECT user_id, event_id, {x} AS x, {y} AS y,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS seq
  FROM {table}),
mx AS (SELECT user_id, max(seq) AS mseq FROM pts GROUP BY user_id),
segs(user_id, i, j) AS (
    SELECT user_id, 1, mseq FROM mx WHERE mseq >= 2
  UNION
    SELECT s.user_id,
           CASE w.which WHEN 0 THEN s.i ELSE k.seq END,
           CASE w.which WHEN 0 THEN k.seq ELSE s.j END
    FROM segs s
    JOIN pts pi ON pi.user_id = s.user_id AND pi.seq = s.i
    JOIN pts pj ON pj.user_id = s.user_id AND pj.seq = s.j
    JOIN pts k  ON k.user_id = s.user_id
               AND k.seq > s.i AND k.seq < s.j
    CROSS JOIN (VALUES (0), (1)) w(which)
    WHERE {c2k} > {eps2!r} * ((pj.x - pi.x) * (pj.x - pi.x)
                              + (pj.y - pi.y) * (pj.y - pi.y))
      AND NOT EXISTS (
        SELECT 1 FROM pts k2
        WHERE k2.user_id = s.user_id
          AND k2.seq > s.i AND k2.seq < s.j AND k2.seq <> k.seq
          AND ({c2k2} > {c2k}
               OR ({c2k2} = {c2k} AND k2.seq < k.seq)))
),
kept AS (
  SELECT user_id, i AS seq FROM segs
  UNION SELECT user_id, j AS seq FROM segs
  UNION SELECT user_id, 1 AS seq FROM mx
  UNION SELECT user_id, mseq AS seq FROM mx
)
SELECT DISTINCT p.user_id, p.event_id, CAST(p.seq AS BIGINT) AS seq
FROM kept JOIN pts p ON p.user_id = kept.user_id AND p.seq = kept.seq
ORDER BY p.user_id, p.seq
"""


def _d8_flow_ctes(depth: int) -> str:
    """Shared CTE text (``l0``..``fl``) for the D8 terrain: splitmix
    elevation over the dense grid and per-cell flow target (twin of
    ``raster._d8_flow``).  Final CTE ``fl`` = (lin, tgt; -1 = sink);
    ``cells`` = (lin, elev, ix, iy)."""
    gamma = 0x9E3779B97F4A7C15
    n = 1 << depth
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1)
                     for dy in (-1, 0, 1) if (dx, dy) != (0, 0))
    return f"""l0 AS (SELECT i AS lin,
              ((CAST(i AS HUGEINT) + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h
       FROM generate_series(0, {n * n - 1}) t(i)),
{_splitmix_chain('l', 'l0', 'lin')},
cells AS (SELECT lin, CAST(h // 2 AS BIGINT) AS elev,
                 lin // {n} AS ix, lin % {n} AS iy
          FROM lf),
ce AS (SELECT c.lin, c.elev, c.ix + o.dx AS jx, c.iy + o.dy AS jy
       FROM cells c, (VALUES {offs}) o(dx, dy)),
rk AS (SELECT ce.lin, ce.elev, b.elev AS nelev, b.lin AS nlin,
              ROW_NUMBER() OVER (PARTITION BY ce.lin
                                 ORDER BY b.elev, b.lin) AS rn
       FROM ce JOIN cells b ON b.ix = ce.jx AND b.iy = ce.jy),
fl AS (SELECT lin,
              CASE WHEN nelev < elev THEN nlin ELSE -1 END AS tgt
       FROM rk WHERE rn = 1)"""


def flow_accumulation_sql(depth: int, world: World = DRIVER_WORLD,
                          table: str = "documents") -> str:
    """raster.flow_accumulation twin: elevation = splitmix64(lin) >> 1
    over the dense grid (HUGEINT chain, floor-halved into BIGINT), D8
    target = row_number-1 over (nelev, nlin) when strictly lower, rain
    from per-cell doc counts, recursive-CTE downstream closure from
    rain cells, SUM(rain) per reached cell."""
    wx, wy, _ = world.size
    n = 1 << depth
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
rain AS (SELECT ix * {n} + iy AS lin, CAST(count(*) AS BIGINT) AS r
         FROM cellidx GROUP BY ix * {n} + iy),
{_d8_flow_ctes(depth)},
paths(src, cur) AS (
    SELECT lin, lin FROM rain
  UNION
    SELECT p.src, f.tgt FROM paths p JOIN fl f ON f.lin = p.cur
    WHERE f.tgt >= 0
),
acc AS (SELECT p.cur AS lin, CAST(SUM(r.r) AS BIGINT) AS acc
        FROM paths p JOIN rain r ON r.lin = p.src GROUP BY p.cur),
outc AS (SELECT a.lin, COALESCE(r.r, 0) AS n_docs, a.acc,
                CASE WHEN f.tgt < 0 THEN 1 ELSE 0 END AS sink,
                a.lin // {n} AS ix, a.lin % {n} AS iy
         FROM acc a
         LEFT JOIN rain r ON r.lin = a.lin
         JOIN fl f ON f.lin = a.lin),
{morton_ctes('outc', depth, carry='n_docs, acc, sink')}
SELECT mkey AS cell_key, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(acc AS BIGINT) AS acc, CAST(sink AS BIGINT) AS sink
FROM mz ORDER BY cell_key
"""


def clustering_coeff_sql(k: int = 5, scale: int = 1024,
                         table: str = "embeddings") -> str:
    """cluster.clustering_coeff twin over the kNN graph: dedup-oriented
    edges, both-endpoint degrees, min-vertex wedges closed by an edge
    credit all three corners; cc micro-round as the exact integer
    (4*T*1e6 + D) // (2*D)."""
    return f"""
WITH g AS ({embedding_knn_graph_sql(k=k, scale=scale, table=table)}),
e AS (SELECT DISTINCT least(vec_id, neighbor_id) AS a,
                      greatest(vec_id, neighbor_id) AS b
      FROM g WHERE vec_id <> neighbor_id),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
        FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) t
        GROUP BY node),
w AS (SELECT e1.a AS apex, e1.b AS x, e2.b AS y
      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b),
tr AS (SELECT apex, x, y FROM w JOIN e ON e.a = w.x AND e.b = w.y),
tri AS (SELECT node, CAST(count(*) AS BIGINT) AS tri
        FROM (SELECT apex AS node FROM tr
              UNION ALL SELECT x AS node FROM tr
              UNION ALL SELECT y AS node FROM tr) u
        GROUP BY node)
SELECT d.node AS vec_id, d.deg, COALESCE(tri.tri, 0) AS tri,
       CAST(CASE WHEN d.deg >= 2
                 THEN (4 * COALESCE(tri.tri, 0) * 1000000
                       + d.deg * (d.deg - 1)) // (2 * d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS cc_6
FROM deg d LEFT JOIN tri ON tri.node = d.node
ORDER BY vec_id
"""


def ripley_k_sql(radii: tuple = (5_000.0, 10_000.0, 20_000.0),
                 world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """dwithin.ripley_k twin: brute a<b self-join pair counts per
    radius (fixed-IEEE d2 <= r*r), exact HUGEINT floor normalization
    khat = 2*P*A // (n*(n-1)) with the integral world area."""
    wx, wy, _ = world.size
    area = int(round(wx)) * int(round(wy))
    vals = ", ".join(f"({r!r})" for r in radii)
    return f"""
WITH {geo_cte(table, world)},
rs AS (SELECT * FROM (VALUES {vals}) t(r)),
cnt AS (SELECT rs.r, CAST(count(*) AS BIGINT) AS p
        FROM rs, geo a JOIN geo b ON a.doc_id < b.doc_id
        WHERE (a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y) <= rs.r * rs.r
        GROUP BY rs.r),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM geo)
SELECT rs.r, n.n AS n_points,
       COALESCE(cnt.p, 0) AS n_pairs,
       CAST(CASE WHEN n.n >= 2
                 THEN (CAST(COALESCE(cnt.p, 0) AS HUGEINT) * {2 * area})
                      // (n.n * (n.n - 1))
                 ELSE 0 END AS BIGINT) AS khat
FROM rs LEFT JOIN cnt ON cnt.r = rs.r, n
ORDER BY rs.r
"""


def local_morans_sql(depth: int, world: World = DRIVER_WORLD,
                     table: str = "documents") -> str:
    """raster.local_morans twin: the morans_i CTEs kept per cell —
    rook-lag sum via the precomputed-offset LEFT join, zl = z*lag in
    HUGEINT, fixed three-op double ratio micro-rounded."""
    wx, wy, _ = world.size
    offs = "(1, 0), (-1, 0), (0, 1), (0, -1)"
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n
        FROM cellidx GROUP BY ix, iy),
s AS (SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(COALESCE(sum(n), 0) AS BIGINT) AS tot FROM cnt),
z AS (SELECT ix, iy, cnt.n, s.nc * cnt.n - s.tot AS z FROM cnt, s),
ce AS (SELECT a.ix, a.iy, a.ix + o.dx AS jx, a.iy + o.dy AS jy
       FROM z a, (VALUES {offs}) o(dx, dy)),
lg AS (SELECT ce.ix, ce.iy,
              CAST(COALESCE(SUM(b.z), 0) AS BIGINT) AS lag
       FROM ce LEFT JOIN z b ON b.ix = ce.jx AND b.iy = ce.jy
       GROUP BY ce.ix, ce.iy),
dn AS (SELECT CAST(COALESCE(SUM(CAST(z AS HUGEINT) * z), 0)
              AS BIGINT) AS den FROM z),
pc AS (SELECT z.ix, z.iy, z.n, CAST(z.z AS BIGINT) AS z,
              lg.lag,
              CAST(z.z AS HUGEINT) * lg.lag AS zl
       FROM z JOIN lg ON lg.ix = z.ix AND lg.iy = z.iy),
fc AS (SELECT pc.ix, pc.iy, pc.n, pc.z, pc.lag,
              CASE WHEN dn.den = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST(floor(((CAST(pc.zl AS DOUBLE)
                                     / CAST(dn.den AS DOUBLE))
                                    * CAST(s.nc AS DOUBLE))
                                   * 1e6 + 0.5) AS BIGINT)
              END AS lisa
       FROM pc, dn, s),
{morton_ctes('fc', depth, carry='n, z, lag, lisa')}
SELECT mkey AS cell_key, CAST(n AS BIGINT) AS n_docs, z, lag,
       lisa AS lisa_6
FROM mz ORDER BY cell_key
"""


def viewshed_sql(depth: int, world: World = DRIVER_WORLD,
                 table: str = "documents") -> str:
    """raster.viewshed twin: 24-bit splitmix elevation, observer by
    (docs DESC, elev DESC, lin) LIMIT 1, per-target sample unnest with
    the exact integer round-half-up (floor((2a + b) / (2b)) via the
    ((a%b)+b)%b floor-division idiom), strict int blocking test."""
    gamma = 0x9E3779B97F4A7C15
    wx, wy, _ = world.size
    n = 1 << depth

    def fdiv(a: str, b: str) -> str:
        return (f"CAST(({a} - ((({a}) % ({b})) + ({b})) % ({b}))"
                f" / ({b}) AS BIGINT)")

    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
rain AS (SELECT ix * {n} + iy AS lin, CAST(count(*) AS BIGINT) AS r
         FROM cellidx GROUP BY ix * {n} + iy),
l0 AS (SELECT i AS lin,
              ((CAST(i AS HUGEINT) + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h
       FROM generate_series(0, {n * n - 1}) t(i)),
{_splitmix_chain('l', 'l0', 'lin')},
cells AS (SELECT lin, CAST(h // {1 << 40} AS BIGINT) AS elev,
                 lin // {n} AS ix, lin % {n} AS iy
          FROM lf),
vp AS (SELECT c.lin AS vlin, c.ix AS vx, c.iy AS vy, c.elev AS ve
       FROM cells c LEFT JOIN rain r ON r.lin = c.lin
       ORDER BY COALESCE(r.r, 0) DESC, c.elev DESC, c.lin
       LIMIT 1),
tg AS (SELECT c.lin, c.elev AS te,
              c.ix - v.vx AS di, c.iy - v.vy AS dj,
              greatest(abs(c.ix - v.vx), abs(c.iy - v.vy)) AS d,
              v.vlin, v.vx, v.vy, v.ve
       FROM cells c, vp v),
ks AS (SELECT lin, te, di, dj, d, vlin, vx, vy, ve,
              unnest(generate_series(1, d - 1)) AS k
       FROM tg WHERE d >= 2),
sm AS (SELECT lin, te, d, k, vlin, ve,
              (vx + {fdiv('2 * k * di + d', '2 * d')}) * {n}
              + (vy + {fdiv('2 * k * dj + d', '2 * d')}) AS slin
       FROM ks),
blk AS (SELECT sm.lin
        FROM sm JOIN cells sc ON sc.lin = sm.slin
        WHERE sc.lin <> sm.vlin AND sc.lin <> sm.lin
          AND sc.elev * sm.d > sm.ve * (sm.d - sm.k) + sm.te * sm.k
        GROUP BY sm.lin),
outc AS (SELECT c.lin, COALESCE(r.r, 0) AS n_docs, c.elev,
                CASE WHEN b.lin IS NULL THEN 1 ELSE 0 END AS visible,
                c.ix, c.iy
         FROM cells c
         LEFT JOIN rain r ON r.lin = c.lin
         LEFT JOIN blk b ON b.lin = c.lin),
{morton_ctes('outc', depth, carry='n_docs, elev, visible')}
SELECT mkey AS cell_key, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(elev AS BIGINT) AS elev, CAST(visible AS BIGINT) AS visible
FROM mz ORDER BY cell_key
"""


def watershed_basins_sql(depth: int, world: World = DRIVER_WORLD,
                         table: str = "documents") -> str:
    """raster.watershed_basins twin: recursive step walk per cell along
    the shared D8 flow CTEs to the terminal sink, carrying hop count;
    Morton keys joined for both the cell and its basin."""
    wx, wy, _ = world.size
    n = 1 << depth
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
rain AS (SELECT ix * {n} + iy AS lin, CAST(count(*) AS BIGINT) AS r
         FROM cellidx GROUP BY ix * {n} + iy),
{_d8_flow_ctes(depth)},
walk(strt, cur, steps) AS (
    SELECT lin, lin, 0 FROM cells
  UNION
    SELECT w.strt, f.tgt, w.steps + 1
    FROM walk w JOIN fl f ON f.lin = w.cur
    WHERE f.tgt >= 0
),
term AS (SELECT w.strt, w.cur, w.steps
         FROM walk w JOIN fl f ON f.lin = w.cur
         WHERE f.tgt < 0),
cells2 AS (SELECT lin, ix, iy FROM cells),
{morton_ctes('cells2', depth, carry='lin')},
keys AS (SELECT lin, mkey FROM mz)
SELECT k1.mkey AS cell_key,
       COALESCE(rain.r, 0) AS n_docs,
       k2.mkey AS basin_key,
       CAST(term.steps AS BIGINT) AS path_len
FROM term
JOIN keys k1 ON k1.lin = term.strt
JOIN keys k2 ON k2.lin = term.cur
LEFT JOIN rain ON rain.lin = term.strt
ORDER BY cell_key
"""


def slope_aspect_sql(depth: int, world: World = DRIVER_WORLD,
                     table: str = "documents") -> str:
    """raster.slope_aspect twin: 24-bit splitmix elevation, Horn
    gradient via one weighted 8-neighbour join (weights hx = dx*(2-|dy|),
    hy = dy*(2-|dx|)), discrete D8 aspect = ROW_NUMBER over (uphill dot
    gx*dx + gy*dy, k) — first row = steepest-descent octant, ties to
    the lowest lex offset index exactly like numpy first-min."""
    gamma = 0x9E3779B97F4A7C15
    wx, wy, _ = world.size
    n = 1 << depth
    offs = ", ".join(
        f"({k}, {dx}, {dy}, {dx * (2 - abs(dy))}, {dy * (2 - abs(dx))})"
        for k, (dx, dy) in enumerate(
            (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)))
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
rain AS (SELECT ix * {n} + iy AS lin, CAST(count(*) AS BIGINT) AS r
         FROM cellidx GROUP BY ix * {n} + iy),
l0 AS (SELECT i AS lin,
              ((CAST(i AS HUGEINT) + CAST('{gamma}' AS HUGEINT)) % {_M64}) AS h
       FROM generate_series(0, {n * n - 1}) t(i)),
{_splitmix_chain('l', 'l0', 'lin')},
cells AS (SELECT lin, CAST(h // {1 << 40} AS BIGINT) AS elev,
                 lin // {n} AS ix, lin % {n} AS iy
          FROM lf),
hn AS (SELECT c.lin, c.ix, c.iy,
              CAST(SUM(b.elev * o.hx) AS BIGINT) AS gx,
              CAST(SUM(b.elev * o.hy) AS BIGINT) AS gy
       FROM cells c
       CROSS JOIN (VALUES {offs}) o(k, dx, dy, hx, hy)
       JOIN cells b ON b.ix = c.ix + o.dx AND b.iy = c.iy + o.dy
       WHERE c.ix BETWEEN 1 AND {n - 2} AND c.iy BETWEEN 1 AND {n - 2}
       GROUP BY c.lin, c.ix, c.iy),
asp AS (SELECT hn.lin, hn.ix, hn.iy, hn.gx, hn.gy, o.k,
               ROW_NUMBER() OVER (PARTITION BY hn.lin
                                  ORDER BY hn.gx * o.dx + hn.gy * o.dy,
                                           o.k) AS rn
        FROM hn CROSS JOIN (VALUES {offs}) o(k, dx, dy, hx, hy)),
fc AS (SELECT lin, ix, iy, gx, gy, gx * gx + gy * gy AS g2,
              CAST(k AS BIGINT) AS aspect
       FROM asp WHERE rn = 1),
{morton_ctes('fc', depth, carry='lin, gx, gy, g2, aspect')}
SELECT mkey AS cell_key, COALESCE(rain.r, 0) AS n_docs,
       gx, gy, g2, aspect
FROM mz LEFT JOIN rain ON rain.lin = mz.lin
ORDER BY cell_key
"""


def getis_ord_sql(depth: int, world: World = DRIVER_WORLD,
                  table: str = "documents") -> str:
    """raster.getis_ord twin: binary rook+self weights over occupied
    cells, integer numerator num = nc*si - tot*wi in HUGEINT, exact
    HUGEINT inner term cc = (nc*sumsq - tot^2)*wi*(nc-wi), then the
    fixed float chain CAST -> divide -> sqrt -> divide, micro-rounded
    at 1e6 on both sides."""
    wx, wy, _ = world.size
    offs = "(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)"
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo
),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n
        FROM cellidx GROUP BY ix, iy),
s AS (SELECT CAST(count(*) AS BIGINT) AS nc,
             CAST(COALESCE(sum(n), 0) AS BIGINT) AS tot FROM cnt),
sq AS (SELECT CAST(COALESCE(SUM(CAST(n AS HUGEINT) * n), 0) AS HUGEINT)
              AS sumsq FROM cnt),
b AS (SELECT CAST(s.nc AS HUGEINT) * sq.sumsq
             - CAST(s.tot AS HUGEINT) * s.tot AS bb FROM s, sq),
ce AS (SELECT a.ix, a.iy, a.ix + o.dx AS jx, a.iy + o.dy AS jy
       FROM cnt a, (VALUES {offs}) o(dx, dy)),
nb AS (SELECT ce.ix, ce.iy,
              CAST(COUNT(bc.n) AS BIGINT) AS wi,
              CAST(COALESCE(SUM(bc.n), 0) AS BIGINT) AS si
       FROM ce LEFT JOIN cnt bc ON bc.ix = ce.jx AND bc.iy = ce.jy
       GROUP BY ce.ix, ce.iy),
pc AS (SELECT nb.ix, nb.iy, cnt.n, nb.wi, nb.si,
              CAST(s.nc AS HUGEINT) * nb.si
              - CAST(s.tot AS HUGEINT) * nb.wi AS num,
              b.bb * nb.wi * (s.nc - nb.wi) AS cc, s.nc AS nc
       FROM nb JOIN cnt ON cnt.ix = nb.ix AND cnt.iy = nb.iy, s, b),
fc AS (SELECT ix, iy, n, wi, si, CAST(num AS BIGINT) AS num,
              CASE WHEN cc = 0 THEN CAST(0 AS BIGINT)
                   ELSE CAST(floor((CAST(num AS DOUBLE)
                                    / sqrt(CAST(cc AS DOUBLE)
                                           / CAST(nc - 1 AS DOUBLE)))
                                   * 1e6 + 0.5) AS BIGINT)
              END AS gi_6
       FROM pc),
{morton_ctes('fc', depth, carry='n, wi, si, num, gi_6')}
SELECT mkey AS cell_key, CAST(n AS BIGINT) AS n_docs, wi, si, num, gi_6
FROM mz ORDER BY cell_key
"""


def _hull_vertex_ctes(shift: int, table: str) -> str:
    """Shared CTE text (``pts`` .. ``vo``) for the lattice convex-hull
    family: distinct integer lattice points per user, hull VERTICES via
    the supporting-line hull-EDGE test, and ``vo`` = vertices with the
    CCW ``seq`` from the lex-min point (twin of the strict monotone
    chain emission order in ``windows._hull_chain``)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS

    mx, my = GEO_MULTS["x"], GEO_MULTS["y"]
    mod, q = 1 << 32, 1 << shift
    return f"""pts AS (
  SELECT DISTINCT user_id,
         CAST(((event_id * {mx}) % {mod}) // {q} AS BIGINT) AS qx,
         CAST(((event_id * {my}) % {mod}) // {q} AS BIGINT) AS qy
  FROM {table}
),
np AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_pts
       FROM pts GROUP BY user_id),
edges AS (
  SELECT DISTINCT a.user_id, a.qx, a.qy
  FROM pts a JOIN pts b ON b.user_id = a.user_id
       AND (b.qx != a.qx OR b.qy != a.qy)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts r
    WHERE r.user_id = a.user_id
      AND (r.qx != a.qx OR r.qy != a.qy)
      AND (r.qx != b.qx OR r.qy != b.qy)
      AND NOT (
        (b.qx - a.qx) * (r.qy - a.qy)
          - (b.qy - a.qy) * (r.qx - a.qx) > 0
        OR ((b.qx - a.qx) * (r.qy - a.qy)
              - (b.qy - a.qy) * (r.qx - a.qx) = 0
            AND r.qx BETWEEN least(a.qx, b.qx) AND greatest(a.qx, b.qx)
            AND r.qy BETWEEN least(a.qy, b.qy) AND greatest(a.qy, b.qy))
      )
  )
),
verts AS (
  SELECT user_id, qx, qy FROM edges
  UNION
  SELECT p.user_id, p.qx, p.qy FROM pts p
  JOIN np ON np.user_id = p.user_id AND np.n_pts = 1
),
lr AS (
  SELECT user_id,
         FIRST_VALUE(qx) OVER w AS lx, FIRST_VALUE(qy) OVER w AS ly,
         LAST_VALUE(qx) OVER w AS rx, LAST_VALUE(qy) OVER w AS ry,
         qx, qy
  FROM verts
  WINDOW w AS (PARTITION BY user_id ORDER BY qx, qy
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
vo AS (
  SELECT user_id, qx, qy,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY CASE WHEN (rx - lx) * (qy - ly)
                             - (ry - ly) * (qx - lx) <= 0
                         THEN 0 ELSE 1 END,
                    CASE WHEN (rx - lx) * (qy - ly)
                             - (ry - ly) * (qx - lx) <= 0
                         THEN qx ELSE -qx END,
                    CASE WHEN (rx - lx) * (qy - ly)
                             - (ry - ly) * (qx - lx) <= 0
                         THEN qy ELSE -qy END) - 1 AS seq
  FROM lr
)"""


def convex_hull_sql(shift: int = 16, table: str = "events") -> str:
    """windows.convex_hull twin: distinct lattice points per user
    (q = ((event_id * mult) % 2^32) // 2^shift — exact integers), hull
    VERTICES via the supporting-line hull-EDGE test ((a, b) is a CCW
    edge iff every other point is strictly left, or collinear and
    within the segment's bounding box — collinear boundary points are
    thereby not vertices, matching the strict monotone chain), CCW seq
    from the lex-min point (lower half-plane of the L->R diagonal
    (qx, qy) asc, upper half desc), doubled shoelace area over the
    LEAD ring.  O(m^3) per user — oracle scale only."""
    return f"""
WITH {_hull_vertex_ctes(shift, table)},
ring AS (
  SELECT user_id, seq, qx, qy,
         COALESCE(LEAD(qx) OVER u, FIRST_VALUE(qx) OVER uf) AS nqx,
         COALESCE(LEAD(qy) OVER u, FIRST_VALUE(qy) OVER uf) AS nqy,
         CAST(count(*) OVER uf AS BIGINT) AS n_vertices
  FROM vo
  WINDOW u AS (PARTITION BY user_id ORDER BY seq),
         uf AS (PARTITION BY user_id ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
),
ar AS (
  SELECT user_id,
         CASE WHEN max(n_vertices) >= 3
              THEN CAST(SUM(qx * nqy - nqx * qy) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS area2
  FROM ring GROUP BY user_id
)
SELECT r.user_id, r.seq, r.qx, r.qy, np.n_pts, r.n_vertices, ar.area2
FROM ring r
JOIN np ON np.user_id = r.user_id
JOIN ar ON ar.user_id = r.user_id
ORDER BY r.user_id, r.seq
"""


def min_obb_sql(shift: int = 16, table: str = "events") -> str:
    """windows.min_obb twin: over the shared hull-vertex CTEs, per CCW
    hull edge the HUGEINT candidate a = range(proj e) * range(proj
    perp(e)) with l2 = |e|^2; the exact rational argmin a/l2 via the
    pairwise cross-multiplied NOT EXISTS (ties -> lowest edge seq);
    the only float is the final micro-rounded a/l2 division."""
    return f"""
WITH {_hull_vertex_ctes(shift, table)},
he AS (
  SELECT user_id, seq, qx AS ax, qy AS ay,
         COALESCE(LEAD(qx) OVER u, FIRST_VALUE(qx) OVER uf) AS bx,
         COALESCE(LEAD(qy) OVER u, FIRST_VALUE(qy) OVER uf) AS by_,
         CAST(count(*) OVER uf AS BIGINT) AS h
  FROM vo
  WINDOW u AS (PARTITION BY user_id ORDER BY seq),
         uf AS (PARTITION BY user_id ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING)
),
pr AS (SELECT user_id, seq, bx - ax AS ex, by_ - ay AS ey
       FROM he WHERE h >= 2),
proj AS (
  SELECT p.user_id, p.seq, p.ex * p.ex + p.ey * p.ey AS l2,
         CAST(MAX(p.ex * v.qx + p.ey * v.qy)
              - MIN(p.ex * v.qx + p.ey * v.qy) AS HUGEINT)
         * (MAX(-p.ey * v.qx + p.ex * v.qy)
            - MIN(-p.ey * v.qx + p.ex * v.qy)) AS a
  FROM pr p JOIN vo v ON v.user_id = p.user_id
  GROUP BY p.user_id, p.seq, p.ex, p.ey
),
best AS (
  SELECT r.user_id, r.seq, r.l2, r.a FROM proj r
  WHERE NOT EXISTS (
    SELECT 1 FROM proj s
    WHERE s.user_id = r.user_id
      AND (s.a * r.l2 < r.a * s.l2
           OR (s.a * r.l2 = r.a * s.l2 AND s.seq < r.seq)))
),
nv AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_vertices
       FROM vo GROUP BY user_id)
SELECT np.user_id, np.n_pts, nv.n_vertices,
       CAST(COALESCE(best.seq, 0) AS BIGINT) AS edge_seq,
       CAST(COALESCE(best.l2, 0) AS BIGINT) AS len2,
       CASE WHEN best.a IS NULL OR best.a = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(floor(CAST(best.a AS DOUBLE)
                            / CAST(best.l2 AS DOUBLE) * 1e6 + 0.5)
                      AS BIGINT) END AS obb_area_6
FROM np
JOIN nv ON nv.user_id = np.user_id
LEFT JOIN best ON best.user_id = np.user_id
ORDER BY np.user_id
"""


def colocation_sql(radius: float = 20_000.0, tau_us: int = 21_600_000_000,
                   world: World = DRIVER_WORLD,
                   table: str = "events") -> str:
    """dwithin.colocation twin: brute time-range self-join (DuckDB
    IEJoin) on event pairs — fixed-IEEE spatial d2 <= r*r, integer
    |ta - tb| <= tau, distinct users, each unordered event pair once
    via event_id ordering; count per (least, greatest) user pair."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    r2 = radius * radius
    tau = int(tau_us)
    return f"""
WITH ev AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
         {x} AS x, {y} AS y
  FROM {table}),
pr AS (
  SELECT least(a.user_id, b.user_id) AS ua,
         greatest(a.user_id, b.user_id) AS ub
  FROM ev a JOIN ev b
    ON b.event_id > a.event_id
   AND b.user_id != a.user_id
   AND b.tus BETWEEN a.tus - {tau} AND a.tus + {tau}
  WHERE (a.x - b.x) * (a.x - b.x)
        + (a.y - b.y) * (a.y - b.y) <= {r2!r})
SELECT ua AS user_a, ub AS user_b,
       CAST(count(*) AS BIGINT) AS n_contacts
FROM pr GROUP BY ua, ub ORDER BY ua, ub
"""


def clark_evans_sql(sample_mod: int = 8, world: World = DRIVER_WORLD,
                    table: str = "documents") -> str:
    """dwithin.clark_evans twin: brute per-point MIN d2 over the
    deterministic sample self-join, integer milli nn distances
    (IEEE sqrt is correctly rounded), one exact floor division for
    r_obs_6, the same fixed float chains for r_exp_6 / ce_6."""
    wx, wy, _ = world.size
    area = int(round(wx)) * int(round(wy))
    return f"""
WITH {geo_cte(table, world)},
samp AS (SELECT doc_id, x, y FROM geo WHERE doc_id % {sample_mod} = 0),
nn AS (SELECT a.doc_id,
              MIN((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)) AS d2
       FROM samp a JOIN samp b ON b.doc_id != a.doc_id
       GROUP BY a.doc_id),
mil AS (SELECT CAST(floor(sqrt(d2) * 1000 + 0.5) AS BIGINT) AS m
        FROM nn),
ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(COALESCE(SUM(m), 0) AS BIGINT) AS sm FROM mil),
rr AS (SELECT n, sm, (sm * 1000) // n AS r_obs_6,
              CAST(floor(0.5 * sqrt(CAST({area} AS DOUBLE)
                                    / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                   AS BIGINT) AS r_exp_6
       FROM ag WHERE n > 0)
SELECT n AS n_points, sm AS sum_nn_milli,
       CAST(r_obs_6 AS BIGINT) AS r_obs_6, r_exp_6,
       CAST(floor(CAST(r_obs_6 AS DOUBLE) / CAST(r_exp_6 AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) AS ce_6
FROM rr
"""


def dbscan_sql(radius: float, min_pts: int = 3,
               world: World = DRIVER_WORLD,
               table: str = "documents") -> str:
    """``dwithin.dbscan`` twin — DBSCAN proper with the deterministic
    semantics the engine pins: core = >= min_pts - 1 neighbors within
    radius (classic count includes the point itself); clusters =
    recursive-CTE closure of the CORE-CORE band graph, cluster_id = min
    core id; border = non-core joining the MIN cluster over its core
    neighbors; noise = -1.  role 2/1/0."""
    d2 = "((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"
    return f"""
WITH RECURSIVE {geo_cte(table, world)},
p0 AS (
  SELECT a.doc_id AS ea, b.doc_id AS eb
  FROM geo a, geo b
  WHERE a.doc_id < b.doc_id AND {d2} <= {radius * radius!r}),
nbr AS (SELECT ea AS id, eb AS nb FROM p0
        UNION ALL SELECT eb, ea FROM p0),
core AS (SELECT id FROM nbr GROUP BY id
         HAVING COUNT(*) >= {min_pts - 1}),
cp AS (SELECT ea, eb FROM p0
       WHERE ea IN (SELECT id FROM core)
         AND eb IN (SELECT id FROM core)),
cpairs AS (SELECT ea, eb FROM cp UNION ALL SELECT eb, ea FROM cp),
reach(src, dst) AS (
  SELECT id, id FROM core
  UNION
  SELECT r.src, p.eb FROM reach r JOIN cpairs p ON p.ea = r.dst
),
clab AS (SELECT src AS id, MIN(dst) AS cl FROM reach GROUP BY src),
border AS (
  SELECT n.id AS id, MIN(c.cl) AS cl
  FROM nbr n JOIN clab c ON n.nb = c.id
  WHERE n.id NOT IN (SELECT id FROM core)
  GROUP BY n.id)
SELECT g.doc_id,
       CAST(CASE WHEN cl2.cl IS NOT NULL THEN 2
                 WHEN bo.cl IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS role,
       CAST(COALESCE(cl2.cl, bo.cl, -1) AS BIGINT) AS cluster_id
FROM geo g
LEFT JOIN clab cl2 ON cl2.id = g.doc_id
LEFT JOIN border bo ON bo.id = g.doc_id
"""


def decayed_counts_sql(ref_us: int, cap_days: int = 30,
                       table: str = "events") -> str:
    """``windows.decayed_counts`` twin: per-key half-life-decayed count
    and cents at the fixed reference instant, exact int64 (weights are
    powers of two over the 2^cap common denominator; DuckDB sums in
    HUGEINT — CAST back)."""
    return f"""
WITH e AS (
  SELECT user_id,
         LEAST((({ref_us} - epoch_us(ts)) // 86400000000),
               {cap_days}) AS age,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM {table}
  WHERE epoch_us(ts) <= {ref_us})
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(1 AS BIGINT) << ({cap_days} - age)) AS BIGINT)
         AS decayed_n,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << ({cap_days} - age)))
            AS BIGINT) AS decayed_cents
FROM e GROUP BY user_id
"""


def contour_cells_sql(depth: int, threshold: int = 3,
                      world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """``raster.contour_cells`` twin: per-cell counts + four offset
    LEFT JOINs over the (n-1)^2 block lattice, integer case code,
    uniform blocks filtered."""
    wx, wy, _ = world.size
    n = 1 << depth

    def ins(alias):
        return (f"(CASE WHEN COALESCE({alias}.n, 0) >= {threshold} "
                f"THEN 1 ELSE 0 END)")
    case = (f"({ins('c0')} + 2 * {ins('c1')} + 4 * {ins('c2')} "
            f"+ 8 * {ins('c3')})")
    return f"""
WITH {geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo),
cnt AS (SELECT ix, iy, COUNT(*) AS n FROM cellidx GROUP BY ix, iy),
bxs AS (SELECT unnest(generate_series(0, {n - 2})) AS bx),
bys AS (SELECT unnest(generate_series(0, {n - 2})) AS by),
cases AS (
  SELECT b.bx, b.by, {case} AS ms_case
  FROM (SELECT bx, by FROM bxs CROSS JOIN bys) b
  LEFT JOIN cnt c0 ON c0.ix = b.bx     AND c0.iy = b.by
  LEFT JOIN cnt c1 ON c1.ix = b.bx + 1 AND c1.iy = b.by
  LEFT JOIN cnt c2 ON c2.ix = b.bx + 1 AND c2.iy = b.by + 1
  LEFT JOIN cnt c3 ON c3.ix = b.bx     AND c3.iy = b.by + 1)
SELECT CAST(bx AS BIGINT) AS bx, CAST(by AS BIGINT) AS by,
       CAST(ms_case AS BIGINT) AS ms_case
FROM cases WHERE ms_case > 0 AND ms_case < 15
ORDER BY bx, by
"""


def cost_distance_sql(depth: int, seed_mod: int = 101, rounds: int = 12,
                      cost_mod: int = 8, world: World = DRIVER_WORLD,
                      table: str = "documents") -> str:
    """``raster.cost_distance`` twin: splitmix cell costs over the
    dense lattice, then ``rounds`` UNROLLED synchronous Bellman-Ford
    relaxations (the pagerank chained-CTE pattern — one stay/step
    UNION + min-join per round, no recursion); unreached -> -1."""
    gamma = 0x9E3779B97F4A7C15
    wx, wy, _ = world.size
    n = 1 << depth
    offs = "(1, 0), (-1, 0), (0, 1), (0, -1)"
    parts = [f"""{geo_cte(table, world)},
cellidx AS (
  SELECT doc_id,
         {cell_idx_expr('x', world.min_x, wx, depth)} AS ix,
         {cell_idx_expr('y', world.min_y, wy, depth)} AS iy
  FROM geo),
cnt AS (SELECT ix, iy, CAST(count(*) AS BIGINT) AS n,
               max(CASE WHEN doc_id % {seed_mod} = 0 THEN 1 ELSE 0 END)
                 AS seeded
        FROM cellidx GROUP BY ix, iy),
l0 AS (SELECT i AS lin,
              ((CAST(i AS HUGEINT) + CAST('{gamma}' AS HUGEINT))
               % {_M64}) AS h
       FROM generate_series(0, {n * n - 1}) t(i)),
{_splitmix_chain('l', 'l0', 'lin')},
costs AS (SELECT lin, CAST(1 + (h % {cost_mod}) AS BIGINT) AS cost
          FROM lf),
occ AS MATERIALIZED (SELECT cnt.ix, cnt.iy, cnt.n, cnt.seeded,
               costs.cost
        FROM cnt JOIN costs ON costs.lin = cnt.ix * {n} + cnt.iy),
d0 AS (SELECT ix, iy,
              CASE WHEN seeded = 1 THEN CAST(0 AS BIGINT) END AS d
       FROM occ)"""]
    for k in range(1, rounds + 1):
        # MATERIALIZED: DuckDB inlines plain CTEs, so a chained round
        # tree would expand exponentially (measured: 12 rounds hang)
        parts.append(f"""d{k} AS MATERIALIZED (
  SELECT occ.ix, occ.iy,
         MIN(CASE WHEN cand.moved = 1 THEN cand.val + occ.cost
                  ELSE cand.val END) AS d
  FROM occ LEFT JOIN (
      SELECT ix, iy, d AS val, 0 AS moved FROM d{k - 1}
      WHERE d IS NOT NULL
    UNION ALL
      SELECT ix + dx, iy + dy, d, 1
      FROM d{k - 1}, (VALUES {offs}) o(dx, dy)
      WHERE d IS NOT NULL
  ) cand ON cand.ix = occ.ix AND cand.iy = occ.iy
  GROUP BY occ.ix, occ.iy)""")
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes},
j AS (SELECT occ.ix, occ.iy, occ.n, occ.cost,
             COALESCE(d{rounds}.d, -1) AS dist
      FROM occ LEFT JOIN d{rounds}
        ON d{rounds}.ix = occ.ix AND d{rounds}.iy = occ.iy),
{morton_ctes('j', depth, carry='n, cost, dist')}
SELECT mkey AS cell_key, CAST(n AS BIGINT) AS n_docs,
       CAST(cost AS BIGINT) AS cell_cost, CAST(dist AS BIGINT) AS dist
FROM mz ORDER BY cell_key
"""


def containment_join_sql(theta_num: int = 4, theta_den: int = 5,
                         max_token_len: int = 32,
                         probe_mod: int | None = None, probe_rem: int = 0,
                         table: str = "documents") -> str:
    """``dedup.containment_join`` twin: UNFILTERED brute over the same
    polynomial token-hash SETS, directional gate den*inter >= num*na —
    a green row proves the probe-prefix + length filters lossless."""
    base = 1000003
    mod = 1 << 64
    powers = ", ".join(f"({e}, {pow(base, e, mod)})"
                       for e in range(max_token_len))
    return f"""
WITH powers(e, p) AS (VALUES {powers}),
lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM {table}),
toks AS (SELECT doc_id, i AS tpos, l[i] AS tok
         FROM lists,
              LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
chars AS (SELECT doc_id, tpos, length(tok) - ci AS e,
                 ord(substring(tok, ci, 1)) AS byte
          FROM toks,
               LATERAL (SELECT unnest(generate_series(1, length(tok)))
                        AS ci) h),
th AS (SELECT doc_id, tpos,
              CAST(sum(CAST(byte AS HUGEINT) * p) % {mod} AS HUGEINT) AS h
       FROM chars JOIN powers USING (e) GROUP BY doc_id, tpos),
uth AS (SELECT DISTINCT t.doc_id, coalesce(th.h, 0) AS h
        FROM toks t LEFT JOIN th ON th.doc_id = t.doc_id
                                AND th.tpos = t.tpos),
sz AS (SELECT doc_id, count(*) AS n FROM uth GROUP BY doc_id),
ipair AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM uth a JOIN uth b ON a.h = b.h AND a.doc_id <> b.doc_id
          {"WHERE a.doc_id % " + str(probe_mod) + " = " + str(probe_rem)
           if probe_mod is not None else ""}
          GROUP BY a.doc_id, b.doc_id),
gated AS (SELECT doc_a, doc_b, i, sa.n AS na
          FROM ipair JOIN sz sa ON sa.doc_id = doc_a
          WHERE {theta_den} * i >= {theta_num} * sa.n)
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter, CAST(na AS BIGINT) AS na,
       CAST((i * 1000000 - ((i * 1000000) % na)) / na AS BIGINT)
         AS containment6
FROM gated ORDER BY doc_a, doc_b
"""


def emerging_hotspots_sql(depth: int, t0_us: int, n_days: int = 30,
                          s_threshold: int = 60,
                          world: World = DRIVER_WORLD,
                          table: str = "events") -> str:
    """``windows.emerging_hotspots`` twin: dense (tile, day) cube via
    occupied-tile x day-grid LEFT JOIN, pairwise day self-join per tile
    for the Mann-Kendall sign sum."""
    wx, wy, _ = world.size
    us_day = 86_400_000_000
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT event_id,
                    (epoch_us(ts) - {t0_us}) // {us_day} AS day,
                    {x} AS px, {y} AS py
             FROM {table}
             WHERE epoch_us(ts) >= {t0_us}
               AND epoch_us(ts) < {t0_us + n_days * us_day}),
cix AS (SELECT event_id, day,
               {cell_idx_expr('px', world.min_x, wx, depth)} AS ix,
               {cell_idx_expr('py', world.min_y, wy, depth)} AS iy
        FROM pts),
{morton_ctes('cix', depth, carry='event_id, day')},
cnt AS (SELECT mkey AS tile, day, CAST(count(*) AS BIGINT) AS n
        FROM mz GROUP BY mkey, day),
occ AS (SELECT DISTINCT tile FROM cnt),
days AS (SELECT unnest(generate_series(0, {n_days - 1})) AS day),
cube AS (SELECT occ.tile, days.day, COALESCE(cnt.n, 0) AS n
         FROM occ CROSS JOIN days
         LEFT JOIN cnt ON cnt.tile = occ.tile AND cnt.day = days.day),
mk AS (SELECT a.tile,
              CAST(SUM(CASE WHEN b.n > a.n THEN 1
                            WHEN b.n < a.n THEN -1 ELSE 0 END)
                   AS BIGINT) AS s
       FROM cube a JOIN cube b ON b.tile = a.tile AND b.day > a.day
       GROUP BY a.tile),
tot AS (SELECT tile, CAST(SUM(n) AS BIGINT) AS n_events
        FROM cube GROUP BY tile)
SELECT tot.tile, tot.n_events, mk.s AS mk_s,
       CAST(CASE WHEN mk.s >= {s_threshold} THEN 1
                 WHEN mk.s <= -{s_threshold} THEN -1
                 ELSE 0 END AS BIGINT) AS trend
FROM tot JOIN mk ON mk.tile = tot.tile
ORDER BY tot.tile
"""


def label_propagation_sql(k: int = 5, rounds: int = 3, scale: int = 1024,
                          table: str = "embeddings") -> str:
    """``cluster.label_propagation`` twin over the mutual-kNN graph:
    symmetrized reciprocal edges, then ``rounds`` unrolled synchronous
    vote rounds (count DESC, label ASC winner via ROW_NUMBER; isolated
    nodes keep their label through the LEFT JOIN).  MATERIALIZED round
    CTEs — the cost_distance inlining lesson."""
    parts = [f"""g AS ({embedding_knn_graph_sql(k=k, scale=scale,
                                                table=table)}),
dd AS (SELECT DISTINCT vec_id AS a, neighbor_id AS b
       FROM g WHERE vec_id <> neighbor_id),
mu AS (SELECT d1.a, d1.b FROM dd d1
       JOIN dd d2 ON d2.a = d1.b AND d2.b = d1.a
       WHERE d1.a < d1.b),
e AS MATERIALIZED (SELECT a, b FROM mu UNION ALL SELECT b, a FROM mu),
l0 AS (SELECT vec_id AS node, vec_id AS lab FROM {table})"""]
    for r in range(1, rounds + 1):
        parts.append(f"""c{r} AS MATERIALIZED (
  SELECT e.b AS node, l.lab, COUNT(*) AS c
  FROM e JOIN l{r - 1} l ON l.node = e.a
  GROUP BY e.b, l.lab),
w{r} AS (SELECT node, lab FROM (
    SELECT node, lab,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY c DESC, lab) AS rn
    FROM c{r}) WHERE rn = 1),
l{r} AS MATERIALIZED (
  SELECT p.node, COALESCE(w{r}.lab, p.lab) AS lab
  FROM l{r - 1} p LEFT JOIN w{r} ON w{r}.node = p.node)""")
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT CAST(node AS BIGINT) AS vec_id, CAST(lab AS BIGINT) AS community
FROM l{rounds} ORDER BY vec_id
"""


def contact_reach_sql(radius: float = 20_000.0,
                      tau_us: int = 21_600_000_000, seed_mod: int = 50,
                      rounds: int = 4, world: World = DRIVER_WORLD,
                      table: str = "events") -> str:
    """``dwithin.contact_reach`` twin: IEJoin contact edges (both
    directions, t = greatest of the two event times), then ``rounds``
    unrolled MATERIALIZED min-join relaxations from the seed users;
    INF sentinel 2^62, unreached -> -1."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    r2 = radius * radius
    tau = int(tau_us)
    inf = 1 << 62
    parts = [f"""ev AS (
  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS tus,
         {x} AS x, {y} AS y
  FROM {table}),
ed0 AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         greatest(a.tus, b.tus) AS t
  FROM ev a JOIN ev b
    ON b.event_id > a.event_id
   AND b.user_id != a.user_id
   AND b.tus BETWEEN a.tus - {tau} AND a.tus + {tau}
  WHERE (a.x - b.x) * (a.x - b.x)
        + (a.y - b.y) * (a.y - b.y) <= {r2!r}),
edges AS MATERIALIZED (
  SELECT DISTINCT ua AS src, ub AS dst, t FROM ed0
  UNION
  SELECT DISTINCT ub AS src, ua AS dst, t FROM ed0),
i0 AS (SELECT DISTINCT user_id AS u,
              CASE WHEN user_id % {seed_mod} = 0
                   THEN CAST(0 AS BIGINT)
                   ELSE CAST({inf} AS BIGINT) END AS t
       FROM ev)"""]
    for k in range(1, rounds + 1):
        parts.append(f"""c{k} AS MATERIALIZED (
  SELECT e.dst AS u, MIN(e.t) AS t
  FROM edges e JOIN i{k - 1} p ON p.u = e.src
  WHERE p.t < {inf} AND e.t >= p.t
  GROUP BY e.dst),
i{k} AS MATERIALIZED (
  SELECT p.u, LEAST(p.t, COALESCE(c{k}.t, {inf})) AS t
  FROM i{k - 1} p LEFT JOIN c{k} ON c{k}.u = p.u)""")
    ctes = ",\n".join(parts)
    return f"""
WITH {ctes}
SELECT CAST(u AS BIGINT) AS user_id,
       CAST(CASE WHEN t >= {inf} THEN -1 ELSE t END AS BIGINT)
         AS infected_at
FROM i{rounds} ORDER BY user_id
"""


def source_drift_sql(bin_width: int = 64, n_bins: int = 16,
                     table: str = "documents") -> str:
    """``textops.source_drift`` twin: fixed-bin histograms, dense
    source x bin grid for the cumulative fold, integer EMD numerator
    over the n_s * N common denominator (HUGEINT sums, divisible-
    subtraction floor for emd6)."""
    top = n_bins - 1
    return f"""
WITH h AS (SELECT source, LEAST(n_chars // {bin_width}, {top}) AS b,
                  CAST(count(*) AS BIGINT) AS n
           FROM {table} GROUP BY source, b),
s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS ns FROM h GROUP BY source),
g AS (SELECT b, CAST(SUM(n) AS BIGINT) AS ngb FROM h GROUP BY b),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS ng FROM h),
grid AS (SELECT s.source, d.b
         FROM s CROSS JOIN (SELECT unnest(generate_series(0, {top}))
                            AS b) d),
df AS (SELECT grid.source, grid.b,
              CAST(COALESCE(h.n, 0) AS HUGEINT) * tot.ng
              - CAST(COALESCE(g.ngb, 0) AS HUGEINT) * s.ns AS diff
       FROM grid
       LEFT JOIN h ON h.source = grid.source AND h.b = grid.b
       JOIN s ON s.source = grid.source
       LEFT JOIN g ON g.b = grid.b
       CROSS JOIN tot),
c AS (SELECT source, b,
             SUM(diff) OVER (PARTITION BY source ORDER BY b) AS cum
      FROM df),
e AS (SELECT source, SUM(ABS(cum)) AS num FROM c GROUP BY source)
SELECT e.source, s.ns AS n_docs,
       CAST(e.num AS BIGINT) AS emd_num,
       CAST(s.ns * tot.ng AS BIGINT) AS emd_den,
       CAST((e.num * 1000000 - ((e.num * 1000000) % (s.ns * tot.ng)))
            / (s.ns * tot.ng) AS BIGINT) AS emd6
FROM e JOIN s ON s.source = e.source CROSS JOIN tot
ORDER BY e.source
"""


def revenue_gini_sql(table_orders: str = "orders",
                     table_customer: str = "customer") -> str:
    """``relational.revenue_gini`` twin: per-nation ascending
    row_number over order cents, exact rational Gini via HUGEINT sums,
    divisible-subtraction floor for gini6."""
    return f"""
WITH oc AS (SELECT c.c_nationkey AS nat,
                   CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                     AS cents
            FROM {table_orders} o
            JOIN {table_customer} c ON c.c_custkey = o.o_custkey),
rk AS (SELECT nat, cents,
              ROW_NUMBER() OVER (PARTITION BY nat
                                 ORDER BY cents) AS i
       FROM oc),
ag AS (SELECT nat, CAST(count(*) AS HUGEINT) AS n,
              CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
              CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS six
       FROM rk GROUP BY nat),
fin AS (SELECT nat, n, 2 * six - (n + 1) * sx AS num, n * sx AS den
        FROM ag)
SELECT CAST(nat AS BIGINT) AS nationkey, CAST(n AS BIGINT) AS n_orders,
       CAST(num AS BIGINT) AS gini_num, CAST(den AS BIGINT) AS gini_den,
       CAST((num * 1000000 - ((num * 1000000) % den)) / den AS BIGINT)
         AS gini6
FROM fin ORDER BY nationkey
"""


def benford_audit_sql(table: str = "events") -> str:
    """``windows.benford_audit`` twin: string first digit of positive
    cents, per-key digit counts via a dense key x digit grid, the same
    fixed P6 constants, HUGEINT sums cast back."""
    p6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991,
          51152, 45757)
    pvals = ", ".join(f"({d}, {p})" for d, p in enumerate(p6, 1))
    dcols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN g.d = {i} THEN g.n ELSE 0 END) AS BIGINT)"
        f" AS d{i}" for i in range(1, 10))
    return f"""
WITH c AS (SELECT event_type AS k,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
           FROM {table}),
fd AS (SELECT k,
              CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                AS d
       FROM c WHERE cents > 0),
cnt AS (SELECT k, d, CAST(count(*) AS BIGINT) AS n
        FROM fd GROUP BY k, d),
keys AS (SELECT DISTINCT k FROM cnt),
p(d, p6) AS (VALUES {pvals}),
g AS (SELECT keys.k, p.d, p.p6, COALESCE(cnt.n, 0) AS n
      FROM keys CROSS JOIN p
      LEFT JOIN cnt ON cnt.k = keys.k AND cnt.d = p.d),
tot AS (SELECT k, CAST(SUM(n) AS BIGINT) AS nv FROM g GROUP BY k),
sad AS (SELECT g.k,
               CAST(SUM(ABS(CAST(1000000 AS HUGEINT) * g.n
                            - CAST(g.p6 AS HUGEINT) * tot.nv))
                    AS BIGINT) AS sad_num
        FROM g JOIN tot ON tot.k = g.k GROUP BY g.k)
SELECT g.k AS key, tot.nv AS n_values, sad.sad_num,
       CAST((sad.sad_num - (sad.sad_num % GREATEST(tot.nv, 1)))
            / GREATEST(tot.nv, 1) AS BIGINT) AS sad6,
       {dcols}
FROM g JOIN tot ON tot.k = g.k JOIN sad ON sad.k = g.k
GROUP BY g.k, tot.nv, sad.sad_num
ORDER BY g.k
"""


def rolling_stats_sql(window: int = 5, table: str = "events") -> str:
    """``windows.rolling_stats`` twin: the literal ROWS BETWEEN frame
    over integer cents."""
    p = window - 1
    return f"""
WITH e AS (SELECT event_id, user_id,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
           FROM {table})
SELECT event_id, user_id, ts_us,
       CAST(SUM(cents) OVER w AS BIGINT) AS roll_sum_cents,
       CAST(MIN(cents) OVER w AS BIGINT) AS roll_min_cents,
       CAST(MAX(cents) OVER w AS BIGINT) AS roll_max_cents
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN {p} PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts_us, event_id
"""


def cluster_exemplars_sql(k: int = 8, scale: int = 1024,
                          table: str = "embeddings") -> str:
    """``cluster.cluster_exemplars`` twin: the kmeans_sql CTEs plus a
    per-cluster (dist2, vec_id) row_number pick and member counts."""
    return f"""
WITH asg AS ({kmeans_sql(k=k, scale=scale, table=table)}),
pick AS (SELECT cluster, vec_id, dist2,
                row_number() OVER (PARTITION BY cluster
                                   ORDER BY dist2, vec_id) AS rn
         FROM asg),
cnt AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
        FROM asg GROUP BY cluster)
SELECT CAST(p.cluster AS BIGINT) AS cluster,
       CAST(p.vec_id AS BIGINT) AS exemplar_id,
       CAST(p.dist2 AS BIGINT) AS dist2, cnt.n_members
FROM pick p JOIN cnt ON cnt.cluster = p.cluster
WHERE p.rn = 1 ORDER BY p.cluster
"""


def media_dup_groups_sql(min_spans: int = 2, gw: int = 9, gh: int = 8,
                         table: str = "documents") -> str:
    """``media.media_dup_groups`` twin: the image_dhash CTE output
    grouped by hash; representative = the (doc_id, ord)-minimal span
    (row_number), groups under ``min_spans`` dropped."""
    return f"""
WITH dh AS ({image_dhash_sql(gw=gw, gh=gh, table=table)}),
pick AS (SELECT dhash, doc_id, ord,
                row_number() OVER (PARTITION BY dhash
                                   ORDER BY doc_id, ord) AS rn
         FROM dh),
grp AS (SELECT dhash, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM dh GROUP BY dhash)
SELECT g.dhash, g.n_spans, g.n_docs,
       CAST(p.doc_id AS BIGINT) AS keep_doc,
       CAST(p.ord AS BIGINT) AS keep_ord
FROM grp g JOIN pick p ON p.dhash = g.dhash AND p.rn = 1
WHERE g.n_spans >= {min_spans}
ORDER BY g.dhash
"""


def zone_dwell_sql(polygons, world: World = DRIVER_WORLD,
                   table: str = "events") -> str:
    """``windows.zone_dwell`` twin: event points via the shared
    geometry, per-(event, poly) containment by the HAVING min-cross
    test (the pip_join oracle shape), lag window per user, consecutive
    pairs both inside the zone sum their deltas."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    values = []
    for row in polygons.to_pylist():
        ring = row["ring"]
        for i in range(len(ring)):
            v1, v2 = ring[i], ring[(i + 1) % len(ring)]
            values.append(f"('{row['poly_id']}', {v1['x']!r}, {v1['y']!r}, "
                          f"{v2['x']!r}, {v2['y']!r})")
    edges = ",\n  ".join(values)
    return f"""
WITH pts AS (SELECT event_id, user_id,
                    CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                    {x} AS px, {y} AS py
             FROM {table}),
edges(poly_id, x1, y1, x2, y2) AS (VALUES
  {edges}),
ein AS (
  SELECT e.poly_id, p.event_id, p.user_id, p.ts_us
  FROM pts p CROSS JOIN edges e
  GROUP BY e.poly_id, p.event_id, p.user_id, p.ts_us
  HAVING min((e.x2 - e.x1) * (p.py - e.y1)
             - (e.y2 - e.y1) * (p.px - e.x1)) >= 0),
seq AS (SELECT event_id, user_id, ts_us,
               lag(event_id) OVER w AS prev_id,
               lag(ts_us) OVER w AS prev_ts
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
pairs AS (
  SELECT a.poly_id, s.user_id, s.ts_us - s.prev_ts AS dt
  FROM seq s
  JOIN ein a ON a.event_id = s.event_id
  JOIN ein b ON b.event_id = s.prev_id AND b.poly_id = a.poly_id
  WHERE s.prev_id IS NOT NULL)
SELECT user_id, poly_id, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(SUM(dt) AS BIGINT) AS dwell_us
FROM pairs GROUP BY user_id, poly_id
ORDER BY user_id, poly_id
"""


def radius_of_gyration_sql(world: World = DRIVER_WORLD,
                           table: str = "events") -> str:
    """``windows.radius_of_gyration`` twin: floor-quantized integer
    coordinates, HUGEINT moment sums, num = n*ss - sx^2 - sy^2 cast
    BIGINT, rog6 by the identical sqrt -> divide -> scale -> floor
    chain."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT user_id,
                    CAST(floor({x}) AS BIGINT) AS qx,
                    CAST(floor({y}) AS BIGINT) AS qy
             FROM {table}),
a AS (SELECT user_id,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(qx AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(qy AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(qx AS HUGEINT) * qx
                      + CAST(qy AS HUGEINT) * qy) AS HUGEINT) AS ss
      FROM pts GROUP BY user_id),
f AS (SELECT user_id, n, n * ss - sx * sx - sy * sy AS num FROM a)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n AS BIGINT) AS n_points,
       CAST(num AS BIGINT) AS rog_num,
       CAST(floor(sqrt(CAST(CAST(num AS BIGINT) AS DOUBLE))
                  / CAST(n AS BIGINT) * 1000000 + 0.5) AS BIGINT)
         AS rog6
FROM f ORDER BY user_id
"""


def pareto_coverage_sql(pct_num: int = 80, pct_den: int = 100,
                        table_orders: str = "orders",
                        table_customer: str = "customer") -> str:
    """``relational.pareto_coverage`` twin: DESC row_number + window
    cumsum (tie order irrelevant — equal values yield the same cumsum
    sequence), smallest prefix satisfying the exact integer predicate."""
    return f"""
WITH oc AS (SELECT c.c_nationkey AS nat,
                   CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
                     AS cents
            FROM {table_orders} o
            JOIN {table_customer} c ON c.c_custkey = o.o_custkey),
rk AS (SELECT nat, cents,
              ROW_NUMBER() OVER w AS i,
              CAST(SUM(CAST(cents AS HUGEINT)) OVER (
                   PARTITION BY nat ORDER BY cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS HUGEINT) AS cum
       FROM oc
       WINDOW w AS (PARTITION BY nat ORDER BY cents DESC)),
tot AS (SELECT nat, CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT)
                 AS total_cents
        FROM oc GROUP BY nat),
k AS (SELECT rk.nat, MIN(rk.i) AS k_top
      FROM rk JOIN tot ON tot.nat = rk.nat
      WHERE {pct_den} * rk.cum >= {pct_num} * CAST(tot.total_cents
                                                   AS HUGEINT)
      GROUP BY rk.nat)
SELECT CAST(tot.nat AS BIGINT) AS nationkey, tot.n_orders,
       tot.total_cents, CAST(k.k_top AS BIGINT) AS k_top
FROM tot JOIN k ON k.nat = tot.nat
ORDER BY nationkey
"""


def visit_entropy_sql(depth: int, world: World = DRIVER_WORLD,
                      table: str = "events") -> str:
    """``windows.visit_entropy`` twin: Morton tile counts per user,
    H = ln(n) - SUM(c*ln(c))/n, micro-rounded (float-ln lockstep under
    1e-6 — the unigram_logprob/char_entropy argument)."""
    wx, wy, _ = world.size
    x = f"({world.min_x!r} + {frac_sql('event_id', GEO_MULTS['x'])} * {wx!r})"
    y = f"({world.min_y!r} + {frac_sql('event_id', GEO_MULTS['y'])} * {wy!r})"
    return f"""
WITH pts AS (SELECT event_id, user_id, {x} AS px, {y} AS py
             FROM {table}),
cix AS (SELECT event_id, user_id,
               {cell_idx_expr('px', world.min_x, wx, depth)} AS ix,
               {cell_idx_expr('py', world.min_y, wy, depth)} AS iy
        FROM pts),
{morton_ctes('cix', depth, carry='event_id, user_id')},
cnt AS (SELECT user_id, mkey, CAST(count(*) AS BIGINT) AS c
        FROM mz GROUP BY user_id, mkey),
agg AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_tiles,
               SUM(c * ln(c)) AS s
        FROM cnt GROUP BY user_id)
SELECT CAST(user_id AS BIGINT) AS user_id, n AS n_visits, n_tiles,
       CAST(floor((ln(n) - s / n) * 1000000 + 0.5) AS BIGINT)
         AS entropy6
FROM agg ORDER BY user_id
"""


def degree_assortativity_sql(k: int = 5, scale: int = 1024,
                             table: str = "embeddings") -> str:
    """``cluster.degree_assortativity`` twin over the mutual-kNN graph:
    degree counts from the symmetrized reciprocal edges, exact HUGEINT
    Pearson numerator/denominator, round-half-up via the nonneg-mod
    floor idiom."""
    return f"""
WITH g AS ({embedding_knn_graph_sql(k=k, scale=scale, table=table)}),
dd AS (SELECT DISTINCT vec_id AS a, neighbor_id AS b
       FROM g WHERE vec_id <> neighbor_id),
mu AS (SELECT d1.a, d1.b FROM dd d1
       JOIN dd d2 ON d2.a = d1.b AND d2.b = d1.a
       WHERE d1.a < d1.b),
ends AS (SELECT a AS v FROM mu UNION ALL SELECT b FROM mu),
deg AS (SELECT v, CAST(count(*) AS HUGEINT) AS d FROM ends GROUP BY v),
ed AS (SELECT da.d AS j, db.d AS k2
       FROM mu JOIN deg da ON da.v = mu.a JOIN deg db ON db.v = mu.b),
s AS (SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(SUM(j * k2) AS HUGEINT) AS s1,
             CAST(SUM(j + k2) AS HUGEINT) AS s2,
             CAST(SUM(j * j + k2 * k2) AS HUGEINT) AS s3
      FROM ed),
f AS (SELECT m, 4 * m * s1 - s2 * s2 AS num,
             2 * m * s3 - s2 * s2 AS den
      FROM s)
SELECT CAST(m AS BIGINT) AS m_edges, CAST(num AS BIGINT) AS r_num,
       CAST(den AS BIGINT) AS r_den,
       CAST(CASE WHEN den = 0 THEN 0 ELSE
         ((2 * num * 1000000 + den)
          - ((((2 * num * 1000000 + den) % (2 * den)) + (2 * den))
             % (2 * den))) / (2 * den)
       END AS BIGINT) AS r6
FROM f
"""

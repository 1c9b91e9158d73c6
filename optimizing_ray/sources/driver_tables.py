"""Readers for the driver's Parquet star schema (/root/testdata/sf*/).

The driver's ``documents`` table has no geometry (doc_id, text, lang,
source, n_chars), so engine queries over it synthesize positions
deterministically from ``doc_id`` with Knuth-style multiplicative hashes —
plain int64 arithmetic that DuckDB reproduces bit-for-bit, making every
geometric result SQL-expressible for the correctness oracle
(FIXTURES.md F7).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray.config import World, WORLD_2D

# Multiplicative hash constants (public Knuth / xxhash primes). doc_id stays
# far below 2^32 at every sf, so doc_id * mult fits int64 exactly — the same
# expression evaluates identically in numpy int64 and DuckDB BIGINT.
GEO_MULTS = {
    "x": 2_654_435_761,
    "y": 2_246_822_519,
    "w": 668_265_263,
    "h": 374_761_393,
}
_MOD = 1 << 32

# world used for all driver-table geometry (matches the quadtree bench world)
DRIVER_WORLD = WORLD_2D


def _frac(doc_id: np.ndarray, mult: int) -> np.ndarray:
    """((doc_id * mult) % 2^32) / 2^32 — uniform-ish in [0, 1)."""
    return ((doc_id * np.int64(mult)) % np.int64(_MOD)).astype(np.float64) / float(_MOD)


def frac_sql(col: str, mult: int) -> str:
    """The exact SQL twin of ``_frac`` for the DuckDB oracle."""
    return f"((({col} * {mult}) % {_MOD}) / {float(_MOD)!r})"


def derive_geometry_batch(batch: pa.Table, world: World = DRIVER_WORLD) -> pa.Table:
    """Append deterministic x, y, w, h columns derived from doc_id."""
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    wx, wy, _ = world.size
    out = batch
    out = out.append_column("x", pa.array(world.min_x + _frac(doc_id, GEO_MULTS["x"]) * wx))
    out = out.append_column("y", pa.array(world.min_y + _frac(doc_id, GEO_MULTS["y"]) * wy))
    out = out.append_column("w", pa.array(0.1 + _frac(doc_id, GEO_MULTS["w"]) * 9.9))
    out = out.append_column("h", pa.array(0.1 + _frac(doc_id, GEO_MULTS["h"]) * 9.9))
    return out


def geometry_sql(world: World = DRIVER_WORLD) -> dict[str, str]:
    """SQL expressions producing EXACTLY the columns of
    ``derive_geometry_batch`` from a ``doc_id`` column."""
    wx, wy, _ = world.size
    return {
        "x": f"({world.min_x!r} + {frac_sql('doc_id', GEO_MULTS['x'])} * {wx!r})",
        "y": f"({world.min_y!r} + {frac_sql('doc_id', GEO_MULTS['y'])} * {wy!r})",
        "w": f"(0.1 + {frac_sql('doc_id', GEO_MULTS['w'])} * 9.9)",
        "h": f"(0.1 + {frac_sql('doc_id', GEO_MULTS['h'])} * 9.9)",
    }


def documents_with_geometry(sf_dir: str, *, columns: list[str] | None = None,
                            world: World = DRIVER_WORLD) -> rd.Dataset:
    """documents.parquet + derived geometry. Prunes to doc_id (+ requested
    payload columns) at the read."""
    cols = ["doc_id"] + [c for c in (columns or []) if c != "doc_id"]
    ds = read(sf_dir, "documents", columns=cols)
    return ds.map_batches(lambda t: derive_geometry_batch(t, world),
                          batch_format="pyarrow", zero_copy_batch=True)


def _auto_blocks(sf_dir: str, table: str) -> int:
    """Block count sized from the (free) parquet footer row count:
    Ray's auto-split slices a tiny single-file table into ~2x-CPU blocks
    (78 rows/block at sf0.1 documents), so every downstream map leg pays
    ~CPU-count per-block dispatches + tiny-batch kernel overhead — that
    floor, repeated per leg, dominated dwithin/spatial_clusters at
    driver scale (round 4, measured 3.2 s -> see BASELINE.md).  Target
    ~256 rows/block, capped at 64 so large tables keep today's
    parallelism."""
    import pyarrow.parquet as pq
    rows = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows
    return int(np.clip(rows // 256, 1, 64))


def read(sf_dir: str, table: str, *, columns: list[str] | None = None,
         num_blocks: int | None = None) -> rd.Dataset:
    """Driver-table read with row-count-derived block sizing (see
    ``_auto_blocks``); pass num_blocks to override."""
    nb = num_blocks if num_blocks else _auto_blocks(sf_dir, table)
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns,
                           override_num_blocks=nb)


# --- driver-side query workloads (SQL-twinned, FIXTURES.md F2/F3) ---------

QUERY_MULTS = {"cx": 2_654_435_761, "cy": 2_246_822_519,
               "qw": 3_266_489_917, "qh": 668_265_263}
QUERY_SALT = 1_000_003  # offset so query geometry decorrelates from docs
BOX_MIN, BOX_SPAN = 2_000.0, 10_000.0


def driver_queries(nq: int = 48, world: World = DRIVER_WORLD) -> pa.Table:
    """Deterministic box queries over the driver world; int64 query_id so the
    SQL twin (oracle.driver_queries_cte) is plain generate_series arithmetic."""
    qid = np.arange(nq, dtype=np.int64)
    h = qid + np.int64(QUERY_SALT)
    wx, wy, _ = world.size
    cx = world.min_x + _frac(h, QUERY_MULTS["cx"]) * wx
    cy = world.min_y + _frac(h, QUERY_MULTS["cy"]) * wy
    qw = BOX_MIN + _frac(h, QUERY_MULTS["qw"]) * BOX_SPAN
    qh = BOX_MIN + _frac(h, QUERY_MULTS["qh"]) * BOX_SPAN
    return pa.table({
        "query_id": pa.array(qid),
        "min_x": pa.array(cx - qw / 2), "min_y": pa.array(cy - qh / 2),
        "max_x": pa.array(cx + qw / 2), "max_y": pa.array(cy + qh / 2),
    })


def driver_knn_queries(nq: int = 24, world: World = DRIVER_WORLD) -> pa.Table:
    """Deterministic kNN query points; k cycles {1,4,16} by qid % 3."""
    qid = np.arange(nq, dtype=np.int64)
    h = qid + np.int64(QUERY_SALT)
    wx, wy, _ = world.size
    ks = np.asarray([1, 4, 16], dtype=np.int64)[qid % 3]
    return pa.table({
        "query_id": pa.array(qid),
        "x": pa.array(world.min_x + _frac(h, QUERY_MULTS["cx"]) * wx),
        "y": pa.array(world.min_y + _frac(h, QUERY_MULTS["cy"]) * wy),
        "k": pa.array(ks),
    })


# --- deterministic trajectory segments (SQL-twinned) ----------------------
#
# Each doc gets a movement segment from its geometry position to a second
# deterministic endpoint — the trajectory workload for the segment->tile
# supercover operator (stages.assign.segment_cover).

SEG_MULTS = {"x": 3_266_489_917, "y": 374_761_393}
SEG_SALT = 424_243


def derive_segments_batch(batch: pa.Table,
                          world: World = DRIVER_WORLD) -> pa.Table:
    """Append segment endpoint columns (x1, y1); (x, y) from
    ``derive_geometry_batch`` is the start."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        batch = batch.append_column("x1", pa.array([], pa.float64()))
        return batch.append_column("y1", pa.array([], pa.float64()))
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    wx, wy, _ = world.size
    h = doc_id + np.int64(SEG_SALT)
    batch = batch.append_column(
        "x1", pa.array(world.min_x + _frac(h, SEG_MULTS["x"]) * wx))
    return batch.append_column(
        "y1", pa.array(world.min_y + _frac(h, SEG_MULTS["y"]) * wy))


def segment_endpoint_sql(world: World = DRIVER_WORLD) -> dict[str, str]:
    """SQL twin of ``derive_segments_batch`` endpoint columns."""
    wx, wy, _ = world.size
    h = f"(doc_id + {SEG_SALT})"
    return {
        "x1": f"({world.min_x!r} + {frac_sql(h, SEG_MULTS['x'])} * {wx!r})",
        "y1": f"({world.min_y!r} + {frac_sql(h, SEG_MULTS['y'])} * {wy!r})",
    }


# --- deterministic SHORT (local-trip) segments (SQL-twinned) ---------------
#
# The world-spanning SEG segments above make pairwise crossings inherently
# quadratic; the segment-intersection join needs LOCAL segments (bounded
# delta) so crossings stay sparse — the od_matrix-style trip shape.

SEG2_MULTS = {"dx": 2_246_822_519, "dy": 3_432_918_353}
SEG2_SALT = 104_729
SEG2_MAX = 3_000.0


def derive_short_segments_batch(batch: pa.Table,
                                world: World = DRIVER_WORLD) -> pa.Table:
    """Append bounded-delta endpoints (x1, y1) = (x, y) + delta with
    delta in [-SEG2_MAX, SEG2_MAX) per axis (may leave the world; the
    intersection predicate is unbounded and cell covers clamp)."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        batch = batch.append_column("x1", pa.array([], pa.float64()))
        return batch.append_column("y1", pa.array([], pa.float64()))
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    h = doc_id + np.int64(SEG2_SALT)
    span = 2.0 * SEG2_MAX
    x = batch["x"].to_numpy(zero_copy_only=False)
    y = batch["y"].to_numpy(zero_copy_only=False)
    batch = batch.append_column(
        "x1", pa.array(x + (_frac(h, SEG2_MULTS["dx"]) - 0.5) * span))
    return batch.append_column(
        "y1", pa.array(y + (_frac(h, SEG2_MULTS["dy"]) - 0.5) * span))


def short_segment_endpoint_sql() -> dict[str, str]:
    """SQL twin of ``derive_short_segments_batch`` (needs x, y in scope)."""
    h = f"(doc_id + {SEG2_SALT})"
    span = 2.0 * SEG2_MAX
    return {
        "x1": f"(x + ({frac_sql(h, SEG2_MULTS['dx'])} - 0.5) * {span!r})",
        "y1": f"(y + ({frac_sql(h, SEG2_MULTS['dy'])} - 0.5) * {span!r})",
    }


# --- deterministic per-doc convex polygons (SQL-twinned) ------------------
#
# Each doc gets a convex pentagon: a FIXED unit shape (constant vertex
# offsets, CCW) anisotropically scaled by per-doc (sx, sy) and translated
# to the doc position.  Affine scaling keeps convexity; no trig is used
# anywhere (libm cos/sin are not bit-reproducible across engines).

PENT_UX = (1.0, 0.31, -0.81, -0.81, 0.31)
PENT_UY = (0.0, 0.95, 0.59, -0.59, -0.95)
PENT_SCALE_MULTS = {"sx": 2_654_435_761, "sy": 668_265_263}
PENT_SALT = 186_282
PENT_SMIN, PENT_SSPAN = 300.0, 2_200.0


def derive_doc_polygons_batch(batch: pa.Table) -> pa.Table:
    """Append per-doc pentagon scales (sx, sy); vertex j of doc d is
    (x + sx * PENT_UX[j], y + sy * PENT_UY[j])."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        batch = batch.append_column("sx", pa.array([], pa.float64()))
        return batch.append_column("sy", pa.array([], pa.float64()))
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    h = doc_id + np.int64(PENT_SALT)
    batch = batch.append_column("sx", pa.array(
        PENT_SMIN + _frac(h, PENT_SCALE_MULTS["sx"]) * PENT_SSPAN))
    return batch.append_column("sy", pa.array(
        PENT_SMIN + _frac(h, PENT_SCALE_MULTS["sy"]) * PENT_SSPAN))


def doc_polygon_scale_sql() -> dict[str, str]:
    """SQL twin of ``derive_doc_polygons_batch``."""
    h = f"(doc_id + {PENT_SALT})"
    return {
        "sx": (f"({PENT_SMIN!r} + {frac_sql(h, PENT_SCALE_MULTS['sx'])}"
               f" * {PENT_SSPAN!r})"),
        "sy": (f"({PENT_SMIN!r} + {frac_sql(h, PENT_SCALE_MULTS['sy'])}"
               f" * {PENT_SSPAN!r})"),
    }


# --- deterministic interleaved spans for driver docs (SQL-twinned) --------
#
# The driver's documents.parquet has no spans column, so the span-sequence
# invariant (input_hint: list<struct<kind,text,media_ref,offset>>, order
# preserved) is exercised by DERIVING the spans from doc_id with the same
# _frac multiplicative-hash style as the geometry above — plain int64
# arithmetic DuckDB reproduces bit-for-bit (oracle.span_passthrough_sql).
# Constraint: doc_id < 2^28 so the per-span key doc_id*16+ordinal stays
# below 2^32 and key*mult fits int64 (every test sf is far below).

SPAN_MULTS = {"n": 3_432_918_353, "kind": 461_845_907,
              "t1": 2_654_435_761, "t2": 3_266_489_917, "len": 668_265_263}
SPAN_SALT = 7_919
SPAN_TOKENS = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
               "adipiscing", "elit", "sed", "tempor", "labore", "magna",
               "aliqua", "veniam", "nostrud"]
_FP_B = 1_000_003            # byte-fold base (shared with text oracles)
_FP_FNV = 1_099_511_628_211  # span-sequence fold base (FNV-64 prime)
_FP_SEP = 0x1F               # unit separator between struct fields
_SPAN_LIST_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("text", pa.string()),
    ("media_ref", pa.string()), ("offset", pa.int32())]))


def derive_spans_batch(batch: pa.Table) -> pa.Table:
    """Append a deterministic ``spans`` list<struct<kind,text,media_ref,
    offset>> column derived from doc_id (1-8 spans/doc, interleaved
    text/image/audio, strictly increasing offsets)."""
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        # empty blocks can carry an EMPTY schema (repo working notes)
        return batch.append_column("spans", pa.array([], _SPAN_LIST_TYPE))
    doc_id = batch["doc_id"].to_numpy().astype(np.int64)
    n_spans = 1 + (_frac(doc_id + SPAN_SALT, SPAN_MULTS["n"]) * 8).astype(np.int64)
    offsets = np.zeros(len(doc_id) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])
    doc_rep = np.repeat(doc_id, n_spans)
    ordinal = (np.arange(total, dtype=np.int64)
               - np.repeat(offsets[:-1].astype(np.int64), n_spans))
    s = doc_rep * 16 + ordinal
    kind_i = (_frac(s, SPAN_MULTS["kind"]) * 3).astype(np.int64)
    toks = np.asarray(SPAN_TOKENS)
    t1 = (_frac(s, SPAN_MULTS["t1"]) * len(toks)).astype(np.int64)
    t2 = (_frac(s, SPAN_MULTS["t2"]) * len(toks)).astype(np.int64)
    kinds = np.asarray(["text", "image", "audio"])[kind_i]
    texts = np.where(kind_i == 0,
                     np.char.add(np.char.add(toks[t1], " "), toks[t2]), "")
    media = np.where(kind_i != 0,
                     np.char.add(np.char.add("media://doc-",
                                             np.char.mod("%012d", doc_rep)),
                                 np.char.mod("/%d", ordinal)), "")
    span_len = 1 + (_frac(s, SPAN_MULTS["len"]) * 64).astype(np.int64)
    csum = np.cumsum(span_len)
    doc_start = np.repeat(csum[offsets[:-1]] - span_len[offsets[:-1]], n_spans)
    off = (csum - span_len - doc_start).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(kinds, pa.string()), pa.array(texts, pa.string()),
         pa.array(media, pa.string()), pa.array(off, pa.int32())],
        ["kind", "text", "media_ref", "offset"])
    return batch.append_column(
        "spans", pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct))


# --- deterministic planted PII for driver docs (SQL-twinned) ---------------
#
# The synthetic corpus has no PII, so the redaction operator's driver
# query PLANTS it deterministically from doc_id (the planted-duplicates
# discipline of the LSH oracles): docs divisible by the moduli below get
# an email / phone / IPv4 suffix appended.  Both sides build the exact
# same string (plain integer arithmetic + lpad), so counts and redacted
# text are byte-identical.

PII_EMAIL_MOD, PII_PHONE_MOD, PII_IP_MOD = 7, 11, 13


def derive_pii_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Replace ``text`` with the PII-augmented text (arrow-native concat;
    zero Python per row)."""
    import pyarrow.compute as pc
    if batch.num_rows == 0 or "doc_id" not in batch.column_names:
        return batch
    ids = batch["doc_id"].to_numpy().astype(np.int64)
    ids_s = pc.cast(pa.array(ids), pa.string())
    j = pc.binary_join_element_wise
    email = pc.if_else(pa.array(ids % PII_EMAIL_MOD == 0),
                       j(" contact u", ids_s, "@mail.example.com now", ""),
                       "")
    phone = pc.if_else(pa.array(ids % PII_PHONE_MOD == 0),
                       j(" call +1-555-",
                         pc.utf8_lpad(pc.cast(pa.array(ids % 10000),
                                              pa.string()), 4, "0"),
                         " today", ""),
                       "")
    ip = pc.if_else(pa.array(ids % PII_IP_MOD == 0),
                    j(" from 192.168.",
                      pc.cast(pa.array(ids % 256), pa.string()), ".",
                      pc.cast(pa.array((ids // 7) % 256), pa.string()), ""),
                    "")
    ptext = j(batch[text_col], email, phone, ip, "")
    i = batch.column_names.index(text_col)
    return batch.set_column(i, text_col, ptext)


def pii_text_sql(text_col: str = "text") -> str:
    """SQL twin of ``derive_pii_batch`` (one expression producing the
    augmented text)."""
    return (
        f"{text_col} || "
        f"CASE WHEN doc_id % {PII_EMAIL_MOD} = 0 THEN ' contact u' || "
        f"CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END || "
        f"CASE WHEN doc_id % {PII_PHONE_MOD} = 0 THEN ' call +1-555-' || "
        f"lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today' "
        f"ELSE '' END || "
        f"CASE WHEN doc_id % {PII_IP_MOD} = 0 THEN ' from 192.168.' || "
        f"CAST(doc_id % 256 AS VARCHAR) || '.' || "
        f"CAST((doc_id // 7) % 256 AS VARCHAR) ELSE '' END")


def _fold_utf8(arr: pa.Array) -> np.ndarray:
    """Vectorized polynomial byte fold (base ``_FP_B`` mod 2^64) over a
    string array: one pass per CHAR POSITION, never per row."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32,
                         count=len(arr) + 1, offset=arr.offset * 4)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=int(offs[-1]))
    starts, lens = offs[:-1].astype(np.int64), np.diff(offs).astype(np.int64)
    h = np.zeros(len(arr), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max()) if len(lens) else 0):
            active = lens > j
            h[active] = (h[active] * np.uint64(_FP_B)
                         + data[starts[active] + j].astype(np.uint64))
    return h


def span_fingerprint_batch(batch: pa.Table, *, spans_col: str = "spans",
                           out_col: str = "span_fp") -> pa.Table:
    """Replace the nested spans column with its order-sensitive 64-bit
    fingerprint: per span h = bytefold(kind \\x1f text \\x1f media_ref) *
    B + offset; per doc fp = left-fold fp*FNV + h over the span ORDER.
    Hashes the spans the pipeline ACTUALLY carried (never re-derived), so
    fingerprint equality with the SQL twin proves byte- and order-exact
    span preservation through the engine."""
    import pyarrow.compute as pc
    if batch.num_rows == 0 or spans_col not in batch.column_names:
        out = (batch.drop_columns([spans_col])
               if spans_col in batch.column_names else batch)
        return out.append_column(out_col, pa.array([], pa.int64()))
    spans = batch[spans_col]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    flat = spans.flatten()
    sep = pa.scalar("\x1f")
    comb = pc.binary_join_element_wise(
        pc.struct_field(flat, "kind"), pc.struct_field(flat, "text"),
        pc.struct_field(flat, "media_ref"), sep)
    h = _fold_utf8(comb)
    off = pc.struct_field(flat, "offset").to_numpy().astype(np.uint64)
    list_offs = np.asarray(spans.offsets)
    n_spans = np.diff(list_offs).astype(np.int64)
    ordinal = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(list_offs[:-1].astype(np.int64), n_spans))
    with np.errstate(over="ignore"):
        h = h * np.uint64(_FP_B) + off
        # left fold == sum of h * FNV^(n_spans-1-ordinal) mod 2^64
        fnv_pow = np.empty(int(n_spans.max()) + 1 if len(n_spans) else 1,
                           dtype=np.uint64)
        fnv_pow[0] = 1
        for k in range(1, len(fnv_pow)):
            fnv_pow[k] = fnv_pow[k - 1] * np.uint64(_FP_FNV)
        rev = np.repeat(n_spans - 1, n_spans) - ordinal
        # unbuffered scatter-add (wraps mod 2^64); unlike reduceat it is
        # well-defined for EMPTY span lists in any position (their slot
        # simply stays 0)
        fp = np.zeros(len(n_spans), dtype=np.uint64)
        np.add.at(fp, np.repeat(np.arange(len(n_spans)), n_spans),
                  h * fnv_pow[rev])
    out = batch.drop_columns([spans_col])
    return out.append_column(out_col, pa.array(fp.astype(np.int64)))

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
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return ds.map_batches(lambda t: derive_geometry_batch(t, world),
                          batch_format="pyarrow", zero_copy_batch=True)


def read(sf_dir: str, table: str, *, columns: list[str] | None = None,
         num_blocks: int | None = None) -> rd.Dataset:
    """Single-file driver tables read as ONE block by default, which
    serializes every downstream map; pass num_blocks to split."""
    kwargs = {"override_num_blocks": num_blocks} if num_blocks else {}
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kwargs)


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

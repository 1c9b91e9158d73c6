"""Deterministic synthetic fixtures (FIXTURES.md F1-F6) — pure numpy/pyarrow.

All values are derived from the global row index via a counter-based hash
(splitmix64 finalizer), NOT a sequential RNG, so generation is independent
of batch/block boundaries and therefore retry- and parallelism-invariant
(SURVEY.md §4 determinism row).

Workload constants mirror the reference:
* uniform 3D corpus — N objects uniform in the world box, sizes (0,10]
  (``main.cpp:24-33``).
* flat2d corpus — 1M objects in 100,000^2, sizes (0.1,100]
  (``.Test/QuadTree.cpp:351-365``).
* query boxes — 50x10x50 centered on a point (``WorldPartition.hpp:105``);
  flat2d view rects 800x600 (``.Test/QuadTree.cpp:367``).

Every document also carries the interleaved ``spans`` payload of the
target input schema (doc_id, spans: list<struct<kind,text,media_ref,
offset>>) — built vectorized with pyarrow ListArray/StructArray.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from optimizing_ray.config import World, WORLD_2D, WORLD_3D

__all__ = [
    "u01", "documents_batch", "queries_table", "knn_queries_table",
    "polygons_table", "raster_table", "spans_array", "SPAN_TYPE",
]

_U64 = np.uint64
_PHI = _U64(0x9E3779B97F4A7C15)

SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
]))

_KINDS = np.asarray(["text", "image", "audio"])
_TOKENS = np.asarray([
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
])


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain counter-based hash."""
    h = np.asarray(h, dtype=_U64)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> _U64(27))) * _U64(0x94D049BB133111EB)
        h = h ^ (h >> _U64(31))
    return h


def u01(idx, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) from (row index, salt)."""
    i = np.asarray(idx, dtype=_U64)
    with np.errstate(over="ignore"):
        h = _mix((i + _U64(1)) * _PHI + _U64(salt) * _U64(0xD1342543DE82EF95))
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


def _gauss(idx, salt: int) -> np.ndarray:
    """Deterministic standard normal via Box-Muller on two hashed uniforms."""
    u1 = np.clip(u01(idx, salt), 1e-12, 1.0)
    u2 = u01(idx, salt + 7919)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def _doc_ids(idx: np.ndarray) -> pa.Array:
    """Vectorized f"doc-{i:012d}" via Arrow kernels (2.7x np.char.mod)."""
    padded = pc.utf8_lpad(pc.cast(pa.array(np.asarray(idx, dtype=np.int64)), pa.string()),
                          width=12, padding="0")
    return pc.binary_join_element_wise(pa.scalar("doc"), padded, pa.scalar("-"))


def spans_array(idx: np.ndarray, seed: int = 0) -> pa.ListArray:
    """Interleaved text+media spans per doc: 1-8 spans, kind in
    {text,image,audio}, offsets cumulative strictly increasing (FIXTURES.md F1).
    Fully vectorized ListArray construction."""
    idx = np.asarray(idx, dtype=np.int64)
    n_spans = (u01(idx, seed + 101) * 8).astype(np.int64) + 1
    offsets = np.zeros(len(idx) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])
    # flat per-span row index: (doc_idx repeated, span ordinal)
    doc_rep = np.repeat(idx, n_spans)
    ordinal = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1].astype(np.int64), n_spans)
    span_key = doc_rep * 31 + ordinal
    kind_i = (u01(span_key, seed + 211) * 3).astype(np.int64)
    kinds = _KINDS[kind_i]
    tok_i = (u01(span_key, seed + 307) * len(_TOKENS)).astype(np.int64)
    tok2_i = (u01(span_key, seed + 401) * len(_TOKENS)).astype(np.int64)
    texts = np.where(kind_i == 0,
                     np.char.add(np.char.add(_TOKENS[tok_i], " "), _TOKENS[tok2_i]),
                     "")
    doc_ids = np.char.mod("doc-%012d", doc_rep)
    media = np.where(kind_i != 0,
                     np.char.add(np.char.add("media://", doc_ids), np.char.mod("/%d", ordinal)),
                     "")
    span_len = (u01(span_key, seed + 503) * 64).astype(np.int64) + 1
    # offset = cumulative length of prior spans within the doc (strictly increasing)
    csum = np.cumsum(span_len)
    doc_start = np.repeat(csum[offsets[:-1]] - span_len[offsets[:-1]], n_spans)
    off = (csum - span_len - doc_start).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(kinds, pa.string()), pa.array(texts, pa.string()),
         pa.array(media, pa.string()), pa.array(off, pa.int32())],
        ["kind", "text", "media_ref", "offset"])
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def documents_batch(idx: np.ndarray, variant: str = "flat2d",
                    world: World | None = None, seed: int = 0,
                    with_spans: bool = True) -> pa.Table:
    """One batch of the synthetic corpus for global row indices `idx`.

    variants (FIXTURES.md F1a/F1b/F1c):
      * "uniform": 3D, sizes uniform (0,10]  (main.cpp:24-33)
      * "skewed":  80% Gaussian cluster (sigma = 1 coarse cell), 20% uniform
      * "hotspot": "skewed" plus 3% of rows pinned to ONE exact landmark
                   point — the degenerate-key case (every row in the same
                   max_depth cell) that capacity subdivision cannot split
                   and only salting handles
      * "flat2d":  y=z=h=d=0 2D corpus, sizes (0.1,100]
                   (.Test/QuadTree.cpp:354-365)
    """
    idx = np.asarray(idx, dtype=np.int64)
    if world is None:
        world = WORLD_2D if variant == "flat2d" else WORLD_3D
    wx, wy, wz = world.size
    ux, uy, uz = u01(idx, seed + 1), u01(idx, seed + 2), u01(idx, seed + 3)
    if variant in ("skewed", "hotspot"):
        cell_w = wx / 8.0
        hot = u01(idx, seed + 11) < 0.8
        cxr = world.min_x + 0.5 * wx + _gauss(idx, seed + 12) * cell_w
        cyr = world.min_y + 0.5 * wy + _gauss(idx, seed + 13) * cell_w
        x = np.where(hot, np.clip(cxr, world.min_x, world.max_x - 1e-9), world.min_x + ux * wx)
        y = np.where(hot, np.clip(cyr, world.min_y, world.max_y - 1e-9), world.min_y + uy * wy)
        z = np.zeros_like(x) if world.dims == 2 else world.min_z + uz * wz
        if variant == "hotspot":
            pin = u01(idx, seed + 17) < 0.03
            x = np.where(pin, world.min_x + 0.7 * wx, x)
            y = np.where(pin, world.min_y + 0.7 * wy, y)
            if world.dims != 2:
                z = np.where(pin, world.min_z + 0.7 * wz, z)
    else:
        x = world.min_x + ux * wx
        y = world.min_y + uy * wy
        z = np.zeros_like(x) if variant == "flat2d" or wz == 0 else world.min_z + uz * wz
    if variant == "flat2d":
        w = 0.1 + u01(idx, seed + 4) * 99.9
        h = 0.1 + u01(idx, seed + 5) * 99.9
        d = np.zeros_like(w)
    else:
        w = u01(idx, seed + 4) * 10.0
        h = u01(idx, seed + 5) * 10.0
        d = u01(idx, seed + 6) * 10.0
    cols = {
        "doc_id": _doc_ids(idx),
        "x": pa.array(x), "y": pa.array(y), "z": pa.array(z),
        "w": pa.array(w), "h": pa.array(h), "d": pa.array(d),
    }
    if with_spans:
        cols["spans"] = spans_array(idx, seed)
    return pa.table(cols)


def queries_table(nq: int, variant: str = "flat2d", world: World | None = None,
                  seed: int = 1000) -> pa.Table:
    """Query boxes (FIXTURES.md F2): 50x10x50 centered on a seeded point for
    3D (``WorldPartition.hpp:105``); flat2d uses 800x600 view rects
    (``.Test/QuadTree.cpp:367``) plus smaller 10..500 search boxes
    (``.Test/QuadTree.cpp:328,399-406``)."""
    if world is None:
        world = WORLD_2D if variant == "flat2d" else WORLD_3D
    idx = np.arange(nq, dtype=np.int64)
    wx, wy, wz = world.size
    cx = world.min_x + u01(idx, seed + 1) * wx
    cy = world.min_y + u01(idx, seed + 2) * wy
    cz = world.min_z + u01(idx, seed + 3) * (wz if wz else 0.0)
    if variant == "flat2d":
        big = idx % 2 == 0
        qw = np.where(big, 800.0, 10.0 + u01(idx, seed + 4) * 490.0)
        qh = np.where(big, 600.0, 10.0 + u01(idx, seed + 5) * 490.0)
        qd = np.zeros(nq)
    else:
        qw = np.full(nq, 50.0)
        qh = np.full(nq, 50.0)
        qd = np.full(nq, 10.0)
    return pa.table({
        "query_id": pa.array(np.char.mod("q-%06d", idx), pa.string()),
        "min_x": pa.array(cx - qw / 2), "min_y": pa.array(cy - qh / 2),
        "min_z": pa.array(cz - qd / 2),
        "max_x": pa.array(cx + qw / 2), "max_y": pa.array(cy + qh / 2),
        "max_z": pa.array(cz + qd / 2),
    })


def knn_queries_table(nq: int, world: World | None = None, seed: int = 2000) -> pa.Table:
    """kNN lookups (FIXTURES.md F3); k in {1,4,16}."""
    if world is None:
        world = WORLD_2D
    idx = np.arange(nq, dtype=np.int64)
    wx, wy, wz = world.size
    ks = np.asarray([1, 4, 16])[(u01(idx, seed + 4) * 3).astype(np.int64)]
    return pa.table({
        "query_id": pa.array(np.char.mod("kq-%06d", idx), pa.string()),
        "x": pa.array(world.min_x + u01(idx, seed + 1) * wx),
        "y": pa.array(world.min_y + u01(idx, seed + 2) * wy),
        "z": pa.array(world.min_z + u01(idx, seed + 3) * (wz if wz else 0.0)),
        "k": pa.array(ks.astype(np.int32)),
    })


def polygons_table(np_polys: int, world: World | None = None, seed: int = 3000) -> pa.Table:
    """Convex polygon small side (FIXTURES.md F4): seeded convex polygons
    with 4-12 vertices as closed rings list<struct<x,y>>."""
    if world is None:
        world = WORLD_2D
    wx, wy, _ = world.size
    rings_x: list[np.ndarray] = []
    rings_y: list[np.ndarray] = []
    offsets = [0]
    for p in range(np_polys):
        nv = 4 + int(u01(np.asarray([p]), seed + 1)[0] * 9)
        cx = world.min_x + float(u01(np.asarray([p]), seed + 2)[0]) * wx
        cy = world.min_y + float(u01(np.asarray([p]), seed + 3)[0]) * wy
        r = (0.02 + float(u01(np.asarray([p]), seed + 4)[0]) * 0.08) * min(wx, wy)
        js = np.arange(nv, dtype=np.int64)
        ang = 2 * np.pi * js / nv
        # convex by construction: vertices on a rotated ellipse
        ecc = 0.5 + 0.5 * float(u01(np.asarray([p]), seed + 5)[0])
        rot = 2 * np.pi * float(u01(np.asarray([p]), seed + 6)[0])
        ex, ey = r * np.cos(ang), r * ecc * np.sin(ang)
        rings_x.append(cx + ex * np.cos(rot) - ey * np.sin(rot))
        rings_y.append(cy + ex * np.sin(rot) + ey * np.cos(rot))
        offsets.append(offsets[-1] + nv)
    flat_x = np.concatenate(rings_x) if rings_x else np.empty(0)
    flat_y = np.concatenate(rings_y) if rings_y else np.empty(0)
    struct = pa.StructArray.from_arrays(
        [pa.array(flat_x), pa.array(flat_y)], ["x", "y"])
    ring = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    ids = pa.array([f"poly-{i:04d}" for i in range(np_polys)], pa.string())
    return pa.table({"poly_id": ids, "ring": ring})


def raster_table(width: int = 256, height: int = 256,
                 world: World | None = None) -> pa.Table:
    """Pixel grid (FIXTURES.md F5, mirrors ``main.cpp:43-44`` 256x256):
    pixel centers mapped into the world box."""
    if world is None:
        world = WORLD_2D
    wx, wy, _ = world.size
    px, py = np.meshgrid(np.arange(width, dtype=np.int32),
                         np.arange(height, dtype=np.int32), indexing="xy")
    px, py = px.ravel(), py.ravel()
    return pa.table({
        "pixel_id": pa.array(py.astype(np.int64) * width + px),
        "px": pa.array(px), "py": pa.array(py),
        "cx": pa.array(world.min_x + (px + 0.5) / width * wx),
        "cy": pa.array(world.min_y + (py + 0.5) / height * wy),
    })

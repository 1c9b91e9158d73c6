"""Box-query spatial join (J1) — the engine twin of the octree range search.

Reference semantics (``DynamicOctree.hpp:146-171``): candidate pruning by
tile, then an exact residual AABB predicate; "query contains cell" skips
the residual test (full-cover fast path).

Two physical plans:

* **broadcast** (default; query side small — the reference's per-frame
  case): the query table is ``ray.put`` once; each doc batch groups its
  rows by precomputed ``cell_key``, looks up the candidate queries of
  each cell, and runs the vectorized residual predicate.  No shuffle at
  all; scales linearly in the doc count.  Candidate lookup uses query
  covers EXPANDED by the max doc extent, so point-assigned docs (one cell
  per doc, no duplication) still see boundary-spanning matches — the
  engine's replacement for the reference's parking of spanning items at
  interior nodes (``DynamicOctree.hpp:130-143``).
* **shuffle** (both sides large): queries are exploded to their cover
  cells and hash-joined with point-assigned docs on ``cell_key``
  (``Dataset.join``), then the residual predicate filters.  Pairs are
  unique by construction (each doc lives in exactly one cell and each
  (query, cell) is distinct) — no dedup shuffle needed, unlike the
  duplicate-then-dedup variant (``.Test/oldQuadTree.cpp:237-253``,
  ``REPORT.md:4-8``) which ``explode_cover_batch`` + ``distinct`` covers.

Hot cells: a dense region makes one cell's candidate set large; the
residual predicate stays vectorized so the cost is O(docs_in_cell x
queries_on_cell) numpy ops.  The adaptive stage (stages/adaptive.py)
re-keys hot cells deeper, which shrinks per-cell candidate sets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells, geom
from optimizing_ray.config import World
from optimizing_ray.stages.assign import assign_point_cells_batch

__all__ = ["box_join_broadcast", "box_join_shuffle", "explode_query_cover"]


def _query_covers(queries: pa.Table, world: World, depth: int,
                  max_w: float, max_h: float) -> list[np.ndarray]:
    """Per-query sorted cover-cell keys, expanded by the max doc extent (so
    min-corner point assignment finds boundary-spanning docs)."""
    qmin_x = queries["min_x"].to_numpy()
    qmin_y = queries["min_y"].to_numpy()
    qmax_x = queries["max_x"].to_numpy()
    qmax_y = queries["max_y"].to_numpy()
    return [np.sort(cells.cover2(qmin_x[qi] - max_w, qmin_y[qi] - max_h,
                                 qmax_x[qi], qmax_y[qi], world, depth)).astype(np.int64)
            for qi in range(len(qmin_x))]


def _ranges_to_rows(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Expand [lo_i, hi_i) index ranges into one flat index array, fully
    vectorized (no per-range Python loop)."""
    m = hi > lo
    lo, hi = lo[m], hi[m]
    if len(lo) == 0:
        return np.empty(0, dtype=np.int64)
    lens = hi - lo
    total = int(lens.sum())
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return np.repeat(lo, lens) + (np.arange(total, dtype=np.int64) - np.repeat(starts, lens))


class _BroadcastJoiner:
    """Actor-pool stage holding the broadcast query index (T3 pattern:
    small side loaded once per actor, ``Raytracing.hpp:438-443``)."""

    def __init__(self, covers_ref, queries_ref, world: World, depth: int,
                 predicate: str, payload_cols: tuple[str, ...]):
        self.covers = ray.get(covers_ref)  # per-query sorted cover cells
        q = ray.get(queries_ref)
        self.query_id = np.asarray(q["query_id"])
        self.qmin_x = np.asarray(q["min_x"])
        self.qmin_y = np.asarray(q["min_y"])
        self.qmax_x = np.asarray(q["max_x"])
        self.qmax_y = np.asarray(q["max_y"])
        self.world = world
        self.depth = depth
        self.predicate = predicate
        self.payload_cols = payload_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "cell_key" not in batch.column_names:
            batch = assign_point_cells_batch(batch, self.depth, self.world)
        key = batch["cell_key"].to_numpy()
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        doc_min_x, doc_min_y = x, y
        doc_max_x, doc_max_y = x + w, y + h
        out_doc: list[np.ndarray] = []
        out_q: list[np.ndarray] = []
        # sort the batch by cell key ONCE; each query then locates its
        # candidate rows with two vectorized searchsorted calls over its
        # cover cells (the per-batch equivalent of the octree descent)
        order = np.argsort(key, kind="stable")
        skey = key[order]
        for qi, qcells in enumerate(self.covers):
            lo = np.searchsorted(skey, qcells, side="left")
            hi = np.searchsorted(skey, qcells, side="right")
            rows = order[_ranges_to_rows(lo, hi)]
            if len(rows) == 0:
                continue
            if self.predicate == "ref2d":
                m = geom.overlaps2_ref(
                    self.qmin_x[qi], self.qmin_y[qi],
                    self.qmax_x[qi], self.qmax_y[qi],
                    doc_min_x[rows], doc_min_y[rows],
                    doc_max_x[rows], doc_max_y[rows])
            else:  # inclusive (3D family collapsed to 2D)
                m = ((doc_min_x[rows] <= self.qmax_x[qi])
                     & (doc_max_x[rows] >= self.qmin_x[qi])
                     & (doc_min_y[rows] <= self.qmax_y[qi])
                     & (doc_max_y[rows] >= self.qmin_y[qi]))
            hits = rows[m]
            if len(hits):
                out_doc.append(hits)
                out_q.append(np.full(len(hits), qi, dtype=np.int64))
        if not out_doc:
            return pa.table({
                "query_id": pa.array(self.query_id[:0]),
                **{c: batch[c].slice(0, 0) for c in self.payload_cols},
            })
        doc_rows = np.concatenate(out_doc)
        q_rows = np.concatenate(out_q)
        taken = batch.select(list(self.payload_cols)).take(pa.array(doc_rows))
        return taken.add_column(0, "query_id", pa.array(self.query_id[q_rows]))


def box_join_broadcast(docs: rd.Dataset, queries: pa.Table, *, world: World,
                       depth: int, max_extent: tuple[float, float],
                       predicate: str = "inclusive",
                       payload_cols: tuple[str, ...] = ("doc_id",),
                       concurrency=None,  # kept for API compat; stage is stateless
                       batch_size: int | None = None) -> rd.Dataset:
    """Join docs (large, streaming) against a broadcast query table.

    Returns rows (query_id, *payload_cols), one per overlapping pair.
    """
    covers = _query_covers(queries, world, depth, max_extent[0], max_extent[1])
    covers_ref = ray.put(covers)
    qcols = {c: queries[c].to_numpy(zero_copy_only=False)
             for c in ("query_id", "min_x", "min_y", "max_x", "max_y")}
    queries_ref = ray.put(qcols)

    # STATELESS tasks (not an actor pool): parallelism tracks available
    # CPUs instantly; the compiled joiner is cached per worker process
    # (see broadcast.cached) so state still builds at most once per worker.
    from optimizing_ray.broadcast import cached

    def join_batch(batch: pa.Table) -> pa.Table:
        joiner = cached(("box_join", covers_ref.hex(), queries_ref.hex(), predicate),
                        lambda: _BroadcastJoiner(covers_ref, queries_ref, world,
                                                 depth, predicate, payload_cols))
        return joiner(batch)

    return docs.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def explode_query_cover(queries: rd.Dataset | pa.Table, *, world: World, depth: int,
                        expand: tuple[float, float] = (0.0, 0.0)) -> rd.Dataset:
    """Queries -> one row per (query, cover cell): the distributed form of
    the octree descent over the query box. Cover is expanded by the max doc
    extent when the doc side is point-assigned."""

    def cover_batch(t: pa.Table) -> pa.Table:
        qmin_x = t["min_x"].to_numpy()
        qmin_y = t["min_y"].to_numpy()
        qmax_x = t["max_x"].to_numpy()
        qmax_y = t["max_y"].to_numpy()
        rows: list[int] = []
        keys: list[np.ndarray] = []
        for i in range(len(t)):
            ks = cells.cover2(qmin_x[i] - expand[0], qmin_y[i] - expand[1],
                              qmax_x[i], qmax_y[i], world, depth)
            rows.extend([i] * len(ks))
            keys.append(ks)
        out = t.take(pa.array(np.asarray(rows, dtype=np.int64)))
        allk = (np.concatenate(keys).astype(np.int64) if keys
                else np.empty(0, dtype=np.int64))
        return out.append_column("cell_key", pa.array(allk))

    if isinstance(queries, pa.Table):
        queries = rd.from_arrow(queries)
    return queries.map_batches(cover_batch, batch_format="pyarrow", zero_copy_batch=True)


def box_join_shuffle(docs: rd.Dataset, queries: rd.Dataset | pa.Table, *,
                     world: World, depth: int, max_extent: tuple[float, float],
                     payload_cols: tuple[str, ...] = ("doc_id",),
                     num_partitions: int = 32) -> rd.Dataset:
    """Both-sides-large plan: hash-partitioned equi-join on cell_key, then
    the vectorized residual predicate. Scale notes: the shuffle moves only
    slim projected columns (geometry + key + ids) — payload re-join by
    doc_id is the caller's choice (SURVEY.md §7.4 wide-row rule)."""
    qcov = explode_query_cover(queries, world=world, depth=depth, expand=max_extent)
    qcov = qcov.select_columns(["query_id", "min_x", "min_y", "max_x", "max_y", "cell_key"])
    slim_cols = list({"x", "y", "w", "h", "cell_key", *payload_cols})
    docs_keyed = docs.map_batches(
        lambda t: assign_point_cells_batch(t, depth, world).select(slim_cols),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = docs_keyed.join(qcov, join_type="inner", on=("cell_key",),
                             num_partitions=num_partitions)

    def residual(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        keep = ((x <= t["max_x"].to_numpy()) & (x + w >= t["min_x"].to_numpy())
                & (y <= t["max_y"].to_numpy()) & (y + h >= t["min_y"].to_numpy()))
        return t.filter(pa.array(keep)).select(["query_id", *payload_cols])

    return joined.map_batches(residual, batch_format="pyarrow", zero_copy_batch=True)

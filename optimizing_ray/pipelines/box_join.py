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
from optimizing_ray.config import World, resolve_shards
from optimizing_ray.stages.assign import assign_point_cells_batch

__all__ = ["box_join_broadcast", "box_join_broadcast_3d", "box_join_shuffle",
           "box_join_adaptive", "explode_query_cover", "gather_payload"]


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


def _query_covers_adaptive(queries: pa.Table, world: World, plan,
                           max_w: float, max_h: float) -> list[np.ndarray]:
    """Per-query candidate cells against an ADAPTIVE (mixed-depth,
    prefix-free) leaf set from ``stages.adaptive.AdaptivePlan``: the
    query's flat cover at each depth intersected with that depth's leaves.
    Sorted per query so the searchsorted joiner works unchanged."""
    leaves = np.sort(np.asarray(plan.leaves, dtype=np.int64))
    depths = cells.depth_of2(leaves.astype(np.uint64))
    by_depth = {int(d): np.sort(leaves[depths == d])
                for d in np.unique(depths)}
    qmin_x = queries["min_x"].to_numpy()
    qmin_y = queries["min_y"].to_numpy()
    qmax_x = queries["max_x"].to_numpy()
    qmax_y = queries["max_y"].to_numpy()
    out = []
    for qi in range(len(qmin_x)):
        cand = []
        for d, dl in by_depth.items():
            cov = cells.cover2(qmin_x[qi] - max_w, qmin_y[qi] - max_h,
                               qmax_x[qi], qmax_y[qi], world, d).astype(np.int64)
            pos = np.searchsorted(dl, cov)
            pos = np.clip(pos, 0, len(dl) - 1)
            cand.append(cov[dl[pos] == cov])
        out.append(np.sort(np.concatenate(cand)) if cand else
                   np.empty(0, dtype=np.int64))
    return out


def box_join_adaptive(docs_keyed: rd.Dataset, queries: pa.Table, *, world: World,
                      plan, max_extent: tuple[float, float],
                      payload_cols: tuple[str, ...] = ("doc_id",),
                      batch_size: int | None = None) -> rd.Dataset:
    """Box join over an ADAPTIVELY keyed corpus (output of
    ``adaptive_assign``): hot regions carry fine keys, sparse regions
    coarse ones, and each query's candidate set follows the actual leaf
    partition — the full A3 -> J1 path of the reference's
    capacity-subdivided tree."""
    covers = _query_covers_adaptive(queries, world, plan,
                                    max_extent[0], max_extent[1])
    covers_ref = ray.put(covers)
    qcols = {c: queries[c].to_numpy(zero_copy_only=False)
             for c in ("query_id", "min_x", "min_y", "max_x", "max_y")}
    queries_ref = ray.put(qcols)
    from optimizing_ray.broadcast import cached

    def join_batch(batch: pa.Table) -> pa.Table:
        joiner = cached(("box_join_adaptive", covers_ref.hex(), queries_ref.hex()),
                        lambda: _BroadcastJoiner(covers_ref, queries_ref, world,
                                                 0, "inclusive", payload_cols))
        return joiner(batch)

    return docs_keyed.map_batches(join_batch, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=batch_size)


def gather_payload(slim_result: rd.Dataset, docs: rd.Dataset, *,
                   payload_cols: tuple[str, ...], on: str = "doc_id",
                   num_buckets: int | None = None) -> rd.Dataset:
    """Semi-join-then-gather (SURVEY.md §7.4 wide-row rule): joins ship
    only slim (key, id) rows; wide payloads (spans, media bytes) re-attach
    AFTERWARDS by id, touching each payload row once instead of once per
    shuffle hop.

    Implemented as an explicit co-partitioned merge (side-tagged union +
    bucket groupby + vectorized Arrow stitch) because ``Dataset.join``
    (Acero) rejects nested non-key columns like ``spans: list<struct>``.
    """
    import pandas as pd

    num_buckets = resolve_shards(num_buckets)

    pay_schema = docs.schema().base_schema
    pay_types = {c: pay_schema.field(c).type for c in payload_cols}
    slim_schema = slim_result.schema().base_schema
    slim_cols = [c for c in slim_schema.names if c != on]
    slim_types = {c: slim_schema.field(c).type for c in slim_cols}

    def bucket_of(ids) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(ids, dtype=object))
        return (h % np.uint64(num_buckets)).astype(np.int64)

    def tag_slim(t: pa.Table) -> pa.Table:
        ids = t[on].to_numpy(zero_copy_only=False)
        cols = {on: t[on], "_bucket": pa.array(bucket_of(ids)),
                "_side": pa.array(np.zeros(len(t), dtype=np.int8))}
        for c in slim_cols:
            cols[c] = t[c]
        for c, typ in pay_types.items():
            cols[c] = pa.nulls(len(t), typ)
        return pa.table(cols)

    def tag_pay(t: pa.Table) -> pa.Table:
        ids = t[on].to_numpy(zero_copy_only=False)
        cols = {on: t[on], "_bucket": pa.array(bucket_of(ids)),
                "_side": pa.array(np.ones(len(t), dtype=np.int8))}
        for c in slim_cols:
            cols[c] = pa.nulls(len(t), slim_types[c])
        for c in pay_types:
            cols[c] = t[c]
        return pa.table(cols)

    tagged = slim_result.map_batches(tag_slim, batch_format="pyarrow",
                                     zero_copy_batch=True).union(
        docs.select_columns([on, *payload_cols]).map_batches(
            tag_pay, batch_format="pyarrow", zero_copy_batch=True))

    def stitch(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy()
        # to_numpy, not to_pylist: ~15x cheaper for string ids, and int64
        # ids stay a native array (faster argsort/searchsorted)
        ids = t[on].to_numpy(zero_copy_only=False)
        res_rows = np.nonzero(side == 0)[0]
        pay_rows = np.nonzero(side == 1)[0]
        if len(res_rows) == 0 or len(pay_rows) == 0:
            empty = {on: t[on].take(pa.array([], pa.int64()))}
            for c in slim_cols:
                empty[c] = t[c].take(pa.array([], pa.int64()))
            for c in pay_types:
                empty[c] = t[c].take(pa.array([], pa.int64()))
            return pa.table(empty)
        order = np.argsort(ids[pay_rows])
        sorted_pay_ids = ids[pay_rows][order]
        pos = np.searchsorted(sorted_pay_ids, ids[res_rows])
        pos = np.clip(pos, 0, len(sorted_pay_ids) - 1)
        hit = sorted_pay_ids[pos] == ids[res_rows]
        res_sel = res_rows[hit]
        pay_sel = pay_rows[order][pos[hit]]
        cols = {on: t[on].take(pa.array(res_sel))}
        for c in slim_cols:
            cols[c] = t[c].take(pa.array(res_sel))
        for c in pay_types:
            cols[c] = t[c].take(pa.array(pay_sel))
        return pa.table(cols)

    return tagged.groupby("_bucket").map_groups(stitch, batch_format="pyarrow")


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
    # NOT Dataset.join: the native join starts num_partitions aggregator
    # actors per execution (~15 s cold on this VM, measured round 3);
    # hash_shard_join is the union + shard-groupby exchange instead
    from optimizing_ray.pipelines import shard_join
    joined = shard_join.hash_shard_join(docs_keyed, qcov, on="cell_key",
                                        how="inner",
                                        n_shards=min(num_partitions, 32))

    def residual(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        keep = ((x <= t["max_x"].to_numpy()) & (x + w >= t["min_x"].to_numpy())
                & (y <= t["max_y"].to_numpy()) & (y + h >= t["min_y"].to_numpy()))
        return t.filter(pa.array(keep)).select(["query_id", *payload_cols])

    return joined.map_batches(residual, batch_format="pyarrow", zero_copy_batch=True)


def box_join_broadcast_3d(docs: rd.Dataset, queries: pa.Table, *, world: World,
                          depth: int, max_extent: tuple[float, float, float],
                          payload_cols: tuple[str, ...] = ("doc_id",),
                          batch_size: int | None = None) -> rd.Dataset:
    """3D box join — the octree search proper (boundary-inclusive 3D
    predicate, ``BoundaryBox.hpp:47-51``): docs carry (x,y,z,w,h,d), the
    query side carries 6-sided boxes.  Same plan as the 2D broadcast join
    (point assignment + expanded covers + sorted-key candidate gather),
    over linear-OCTREE keys."""
    qmin = {c: queries[c].to_numpy() for c in ("min_x", "min_y", "min_z")}
    qmax = {c: queries[c].to_numpy() for c in ("max_x", "max_y", "max_z")}
    covers = [np.sort(cells.cover3(
        qmin["min_x"][i] - max_extent[0], qmin["min_y"][i] - max_extent[1],
        qmin["min_z"][i] - max_extent[2],
        qmax["max_x"][i], qmax["max_y"][i], qmax["max_z"][i],
        world, depth)).astype(np.int64) for i in range(len(queries))]
    covers_ref = ray.put(covers)
    qcols_ref = ray.put({
        "query_id": queries["query_id"].to_numpy(zero_copy_only=False),
        **qmin, **qmax})

    from optimizing_ray.broadcast import cached

    def build():
        covers_l = ray.get(covers_ref)
        q = ray.get(qcols_ref)
        return covers_l, q

    def join_batch(batch: pa.Table) -> pa.Table:
        covers_l, q = cached(("box_join3", covers_ref.hex(), qcols_ref.hex()), build)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        z = batch["z"].to_numpy(zero_copy_only=False)
        w = batch["w"].to_numpy(zero_copy_only=False)
        h = batch["h"].to_numpy(zero_copy_only=False)
        d = batch["d"].to_numpy(zero_copy_only=False)
        key = cells.point_cell3(x, y, z, world, depth).astype(np.int64)
        order = np.argsort(key, kind="stable")
        skey = key[order]
        out_doc, out_q = [], []
        for qi, qcells in enumerate(covers_l):
            lo = np.searchsorted(skey, qcells, side="left")
            hi = np.searchsorted(skey, qcells, side="right")
            rows = order[_ranges_to_rows(lo, hi)]
            if len(rows) == 0:
                continue
            m = geom.overlaps3(
                q["min_x"][qi], q["min_y"][qi], q["min_z"][qi],
                q["max_x"][qi], q["max_y"][qi], q["max_z"][qi],
                x[rows], y[rows], z[rows],
                x[rows] + w[rows], y[rows] + h[rows], z[rows] + d[rows])
            hits = rows[m]
            if len(hits):
                out_doc.append(hits)
                out_q.append(np.full(len(hits), qi, dtype=np.int64))
        qid = np.asarray(q["query_id"])
        if not out_doc:
            return pa.table({"query_id": pa.array(qid[:0]),
                             **{c: batch[c].slice(0, 0) for c in payload_cols}})
        sel = np.concatenate(out_doc)
        taken = batch.select(list(payload_cols)).take(pa.array(sel))
        return taken.add_column(0, "query_id",
                                pa.array(qid[np.concatenate(out_q)]))

    return docs.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)

"""Actor-held per-partition spatial index — the serving twin of the
reference's frame loop.

The reference builds one octree per loaded grid cell and queries it every
frame (``Partition::load_data`` ``WorldPartition.hpp:78-88``, queried at
``WorldPartition.hpp:105-117``): the index is built ONCE and amortized
over many queries.  A Dataset pipeline cannot express that two-phase
load-then-serve lifetime, so this is the engine's documented raw-actor
component (SURVEY.md §2 note (c)):

* ``SpatialIndexService(n_actors)`` — each actor owns the cells with
  ``hash(cell_key) % n_actors == rank`` (the partitioning assumption:
  cell-hash sharding, same key algebra as every other stage).
* ``load(ds)`` streams a cell-keyed Dataset in via a routing stage that
  ships every row to exactly one owning actor; each actor builds, per
  owned cell, a sorted-Morton array of doc positions (the linear-
  quadtree equivalent of the per-cell octree).
* ``query_boxes(queries)`` fans each query's expanded cell cover out to
  the owning actors only (the ring-load idea of
  ``WorldPartition.hpp:196-204``), residual AABB predicate inside the
  actor, results gathered on the driver.
* ``unload(cells)`` / LRU cap mirror ``unload_data``
  (``WorldPartition.hpp:90-98``): indexes drop, rows stay in the source.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells as cellmod
from optimizing_ray.config import World
from optimizing_ray.pipelines.box_join import _ranges_to_rows

__all__ = ["SpatialIndexService"]


@ray.remote
class _IndexShard:
    """Owns the per-cell indexes of one hash shard of the cell space."""

    def __init__(self, rank: int, n_shards: int, max_cells: int | None = None):
        self.rank = rank
        self.n_shards = n_shards
        self.max_cells = max_cells
        # cell_key -> dict(x, y, w, h, doc_id) numpy arrays; LRU-ordered
        self.cells: OrderedDict[int, dict] = OrderedDict()
        # T4 search cache (the ``SearchCache`` of
        # .Test/cacheQuadTree.cpp:78-81,392-406): last query set + its
        # results, reused while the boxes move within a tolerance and the
        # data has not changed.  _data_version invalidates on any
        # load/unload/eviction.
        self._data_version = 0
        self._qcache: tuple | None = None
        self._cache_hits = 0
        self._cache_misses = 0
        # lazily-built sorted-by-cell master arrays (the shard's linear
        # quadtree): rebuilt on first query after any data change, so the
        # per-query path is ONE searchsorted + ONE vectorized predicate
        # over all candidate rows instead of a fresh Python mask per
        # (query, cell) pair (round-2 VERDICT serving item)
        self._master: dict | None = None
        self._master_version = -1

    def load_block(self, table: pa.Table) -> int:
        """Ingest a cell-keyed Arrow block; keeps only owned cells (a
        no-op filter for pre-routed slices from ``load``, a safety net for
        direct callers).  Idempotent per (cell, same rows): re-ingesting
        rows whose ``doc_id`` a cell already holds is a no-op, so a caller
        that replays blocks after a partial failure does not duplicate
        query hits."""
        key = table["cell_key"].to_numpy()
        own = (key % self.n_shards) == self.rank
        if not own.any():
            return 0
        if not own.all():
            table = table.filter(pa.array(own))
            key = table["cell_key"].to_numpy()
        t = table
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        # to_numpy, not to_pylist: ~15x cheaper for string ids (object
        # array out either way)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        skey = key[order]
        bounds = np.flatnonzero(np.diff(skey)) + 1
        n_new = 0
        n_evicted = 0
        for s, e in zip(np.concatenate([[0], bounds]),
                        np.concatenate([bounds, [len(skey)]])):
            ck = int(skey[s])
            rows = order[s:e]
            # within-block dedupe too (keep first occurrence per id): a
            # block formed by unioning sources may repeat a (cell, id)
            _, first = np.unique(doc[rows], return_index=True)
            if len(first) != len(rows):
                rows = rows[np.sort(first)]
            entry = self.cells.pop(ck, None)
            if entry is None:
                entry = {"x": x[rows], "y": y[rows], "w": w[rows],
                         "h": h[rows], "doc_id": doc[rows],
                         "_ids": set(doc[rows])}
                n_new += len(rows)
            else:  # append only ids the cell does not hold yet (idempotent);
                # the per-cell id SET keeps this O(new rows) — an array
                # membership scan per append was quadratic across pushes
                ids = entry["_ids"]
                fresh = np.fromiter((i not in ids for i in doc[rows]),
                                    dtype=bool, count=len(rows))
                rows = rows[fresh]
                if len(rows):
                    new = {k: np.concatenate([entry[k], v[rows]])
                           for k, v in (("x", x), ("y", y), ("w", w),
                                        ("h", h), ("doc_id", doc))}
                    ids.update(new["doc_id"][-len(rows):])
                    new["_ids"] = ids
                    entry = new
                    n_new += len(rows)
            self.cells[ck] = entry  # moves to MRU position
            if self.max_cells is not None:
                while len(self.cells) > self.max_cells:
                    self.cells.popitem(last=False)  # LRU eviction (T2)
                    n_evicted += 1
        if n_new or n_evicted:
            # either invalidates the search cache AND the master arrays
            # (an eviction with no new rows must still drop the evicted
            # cells' rows from the master)
            self._data_version += 1
        return n_new

    def _ensure_master(self):
        """(Re)build the shard's sorted-by-cell master arrays when stale.
        One concatenate + argsort per data change, amortized over every
        frame served from it (the reference builds its per-cell octrees
        once at load and queries them every frame — same lifetime)."""
        if self._master_version == self._data_version:
            return
        if not self.cells:
            self._master = None
            self._master_version = self._data_version
            return
        keys = np.concatenate([np.full(len(e["x"]), ck, dtype=np.int64)
                               for ck, e in self.cells.items()])
        cols = {c: np.concatenate([e[c] for e in self.cells.values()])
                for c in ("x", "y", "w", "h", "doc_id")}
        order = np.argsort(keys, kind="stable")
        m = {"key": keys[order], **{c: v[order] for c, v in cols.items()}}
        m["x2"] = m["x"] + m["w"]  # precomputed far edges: the predicate
        m["y2"] = m["y"] + m["h"]  # runs without per-query adds
        self._master = m
        self._master_version = self._data_version

    def query(self, qids, qboxes: np.ndarray, cov: np.ndarray,
              qidx: np.ndarray,
              cache_tolerance: float | None = None) -> pa.Table:
        """qboxes (Q,4) min_x,min_y,max_x,max_y; ``cov``/``qidx`` are this
        shard's flattened candidate cells with their owning query index
        (the driver routes by ``key % n_shards`` in one vector pass).

        ``cache_tolerance`` enables the T4 search cache: when the SAME
        query ids come back with every box coordinate moved by at most
        the tolerance (and the shard's data unchanged), the PREVIOUS
        results are returned without re-searching — exactly the
        reference's frame-to-frame reuse rule (re-search only when the
        view moved > 1.0, ``cacheQuadTree.cpp:392-406``).  Stale-within-
        tolerance by design; pass None (default) for always-exact."""
        if cache_tolerance is not None and self._qcache is not None:
            ver, cids, cboxes, cres = self._qcache
            if (ver == self._data_version and list(cids) == list(qids)
                    and cboxes.shape == qboxes.shape
                    and (np.abs(cboxes - qboxes).max(initial=0.0)
                         <= cache_tolerance)):
                self._cache_hits += 1
                return cres
        self._ensure_master()
        mst = self._master
        sel_q: list = []
        sel_d: list = []
        if mst is not None and len(cov):
            # ONE flattened pass over all (query, cover-cell) pairs: a
            # single searchsorted against the sorted master, candidate
            # expansion via _ranges_to_rows, and one vectorized predicate
            # over every (query, candidate-row) pair — no per-query (let
            # alone per-cell) Python loop.  ~50 us/query of loop overhead
            # previously dominated large frames (round-2 VERDICT item).
            skey = mst["key"]
            cov = np.asarray(cov, dtype=np.int64)
            qidx = np.asarray(qidx, dtype=np.int64)
            lo = np.searchsorted(skey, cov, side="left")
            hi = np.searchsorted(skey, cov, side="right")
            rows = _ranges_to_rows(lo, hi)
            if len(rows):
                row_q = np.repeat(qidx, hi - lo)
                mnx, mny = qboxes[:, 0], qboxes[:, 1]
                mxx, mxy = qboxes[:, 2], qboxes[:, 3]
                # chunk the candidate axis: keeps the 9 per-pass
                # temporaries ~2 MB (allocator-recycled) instead of
                # hundreds of MB of fresh pages — this VM is
                # first-touch page-allocation-bound (working notes)
                CH = 1 << 18
                for s in range(0, len(rows), CH):
                    r = rows[s:s + CH]
                    q = row_q[s:s + CH]
                    m = ((mst["x"][r] <= mxx[q])
                         & (mst["x2"][r] >= mnx[q])
                         & (mst["y"][r] <= mxy[q])
                         & (mst["y2"][r] >= mny[q]))
                    sel = np.nonzero(m)[0]
                    if len(sel):
                        sel_q.append(q[sel])
                        sel_d.append(mst["doc_id"][r[sel]])
        if sel_q:
            qarr = np.asarray(list(qids), dtype=object)
            res = pa.table({
                "query_id": pa.array(qarr[np.concatenate(sel_q)], pa.string()),
                "doc_id": pa.array(np.concatenate(sel_d), pa.string())})
        else:
            res = pa.table({"query_id": pa.array([], pa.string()),
                            "doc_id": pa.array([], pa.string())})
        if cache_tolerance is not None:
            self._cache_misses += 1
            self._qcache = (self._data_version, list(qids),
                            np.array(qboxes, copy=True), res)
        return res

    def stats(self) -> dict:
        return {"rank": self.rank, "n_cells": len(self.cells),
                "n_rows": int(sum(len(e["x"]) for e in self.cells.values())),
                "cache_hits": self._cache_hits,
                "cache_misses": self._cache_misses}

    def unload(self, keys) -> int:
        n = 0
        for k in keys:
            if self.cells.pop(int(k), None) is not None:
                n += 1
        if n:
            self._data_version += 1  # search cache no longer valid
        return n


class SpatialIndexService:
    """Driver-side handle over the actor shards."""

    def __init__(self, world: World, depth: int, *, n_actors: int = 4,
                 max_cells_per_actor: int | None = None,
                 max_extent: tuple[float, float] = (0.0, 0.0)):
        self.world = world
        self.depth = depth
        self.n = n_actors
        self.max_extent = max_extent
        self.load_metrics: dict = {}
        self.shards = [_IndexShard.remote(i, n_actors, max_cells_per_actor)
                       for i in range(n_actors)]
        # driver-level T4 search cache — where the reference keeps its
        # SearchCache (the render loop, cacheQuadTree.cpp:292): a hit
        # skips cover computation AND the shard RPCs entirely.  The
        # shard-level cache below it covers direct _IndexShard callers.
        self._data_version = 0
        self._qcache: tuple | None = None
        self.cache_hits = 0
        self.cache_misses = 0

    def load(self, docs: rd.Dataset) -> int:
        """Stream a cell-keyed Dataset into the shards, shipping every row
        to EXACTLY ONE actor: a routing ``map_batches`` stage splits each
        block by owning shard (``cell_key % n``) and pushes each slice to
        its actor.  Object-store traffic is one hop per row — not
        O(n_actors x corpus) as a broadcast load would be.  Per-load
        shipping totals land in ``self.load_metrics`` so callers/tests can
        assert traffic is proportional to the corpus."""
        shards, n = self.shards, self.n
        # invalidate the driver-level T4 cache BEFORE streaming: a load
        # that fails mid-stream has already changed shard contents, and a
        # post-stream bump would leave the cache serving stale pre-load
        # results after such a failure
        self._data_version += 1

        def route(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "cell_key" not in t.column_names:
                # empty blocks can carry an EMPTY schema (working notes)
                return pa.table({"rows_shipped": pa.array([0], pa.int64()),
                                 "rows_loaded": pa.array([0], pa.int64())})
            owner = (t["cell_key"].to_numpy() % n).astype(np.int64)
            futs, shipped = [], 0
            for r in np.unique(owner):
                sub = t.filter(pa.array(owner == r))
                shipped += sub.num_rows
                futs.append(shards[int(r)].load_block.remote(sub))
            loaded = int(sum(ray.get(futs)))
            return pa.table({"rows_shipped": pa.array([shipped], pa.int64()),
                             "rows_loaded": pa.array([loaded], pa.int64())})

        stats = docs.map_batches(route, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
        shipped = loaded = 0
        for row in stats.iter_rows():
            shipped += row["rows_shipped"]
            loaded += row["rows_loaded"]
        self.load_metrics = {"rows_shipped": shipped, "rows_loaded": loaded}
        return loaded

    def query_boxes(self, queries: pa.Table, *,
                    cache_tolerance: float | None = None) -> pa.Table:
        """``cache_tolerance`` turns on the per-shard T4 search cache
        (frame-to-frame result reuse while every box moves <= tolerance;
        the reference uses 1.0).  Default None = always exact."""
        qids = queries["query_id"].to_pylist()
        qb = np.stack([queries[c].to_numpy()
                       for c in ("min_x", "min_y", "max_x", "max_y")], axis=1)
        if cache_tolerance is not None and self._qcache is not None:
            ver, cids, cboxes, cres = self._qcache
            if (ver == self._data_version and cids == qids
                    and cboxes.shape == qb.shape
                    and np.abs(cboxes - qb).max(initial=0.0) <= cache_tolerance):
                self.cache_hits += 1
                return cres
        # one vectorized cover pass over ALL queries + one routing mask
        # per shard: the old per-query cover2 + per-(shard, query) filter
        # comprehension was the frame loop's driver-side hot spot at
        # large Q (8 x Q tiny numpy calls per frame)
        cov_all, q_all = cellmod.cover2_many(
            qb[:, 0] - self.max_extent[0], qb[:, 1] - self.max_extent[1],
            qb[:, 2], qb[:, 3], self.world, self.depth)
        cov_all = cov_all.astype(np.int64)
        owner = cov_all % self.n
        futs = []
        for rank, shard in enumerate(self.shards):
            m = owner == rank
            futs.append(shard.query.remote(qids, qb, cov_all[m], q_all[m],
                                           cache_tolerance))
        parts = [t for t in ray.get(futs) if t.num_rows]
        res = (pa.concat_tables(parts) if parts else
               pa.table({"query_id": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.string())}))
        if cache_tolerance is not None:
            self.cache_misses += 1
            self._qcache = (self._data_version, list(qids),
                            np.array(qb, copy=True), res)
        return res

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def unload(self, keys) -> int:
        keys = np.asarray(keys, dtype=np.int64)
        futs = [s.unload.remote(keys[(keys % self.n) == r].tolist())
                for r, s in enumerate(self.shards)]
        n = sum(ray.get(futs))
        if n:  # a no-op unload keeps a still-valid T4 cache
            self._data_version += 1
        return n

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []

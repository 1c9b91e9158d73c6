"""kNN lookups (J2) — neighbor-ring expansion plus an exact merge.

The reference seeds a 3x3 neighbor load around the query point
(``WorldPartition.hpp:196-204``) and the engine keeps that idea as the
pruning path; exactness comes from the two-phase top-k:

1. per-batch partial top-k (vectorized, row-chunked argpartition) — each
   batch emits at most Q x k rows, so the merge input is tiny regardless
   of corpus size;
2. final per-query top-k merge — driver-side by default (the partials
   are bounded by blocks x Q x k rows), ``merge="shuffle"`` for the
   distributed groupby when Q itself is huge.

``knn_brute`` runs phase 1 over every batch (the linear-scan oracle the
reference toggles with Tab, ``.Test/cacheQuadTree.cpp:425-441``, kept as
a first-class operator because for small Q it IS the right distributed
plan).  ``knn_ring`` first prunes batches to the ring-r cells of each
query and expands r until the k-th distance is provably inside the ring
(exactness bound: ring r guarantees all points within r * cell_width of
the query cell border).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World
from optimizing_ray.pipelines import shard_join

__all__ = ["knn_brute", "knn_ring", "knn_ring_store", "knn_join"]


def _smallest_with_ties(d2: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the kk smallest values PLUS every value tied at the
    k-th — argpartition alone breaks exact-distance ties arbitrarily,
    which silently drops the (d2, doc_id)-ordered winner at a partial
    boundary (the final merges sort composite and cut at k, so emitting
    the tie set keeps them exact; measured tie case: symmetric doc
    geometry at sf0.01, round 3)."""
    if kk >= len(d2):
        return np.arange(len(d2))
    part = np.argpartition(d2, kk - 1)[:kk]
    return np.flatnonzero(d2 <= d2[part].max())


class _PartialTopK:
    """Phase-1 actor: broadcast query points, per-batch partial top-k."""

    def __init__(self, queries_ref, restrict_cells_ref=None):
        q = ray.get(queries_ref)
        self.qid = np.asarray(q["query_id"])
        self.qx = np.asarray(q["x"])
        self.qy = np.asarray(q["y"])
        self.qz = np.asarray(q["z"]) if "z" in q else None  # 3D distances
        self.k = np.asarray(q["k"])
        self.maxk = int(self.k.max()) if len(self.k) else 0
        self.cell_sets = ray.get(restrict_cells_ref) if restrict_cells_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        z = (batch["z"].to_numpy(zero_copy_only=False)
             if self.qz is not None and "z" in batch.column_names else None)
        doc_id = batch["doc_id"]
        if len(x) == 0 or self.maxk == 0:
            return pa.table({"query_id": pa.array(self.qid[:0]),
                             "doc_id": doc_id.slice(0, 0),
                             "dist2": pa.array([], pa.float64())})
        out_q, out_rows, out_d = [], [], []
        key = batch["cell_key"].to_numpy() if "cell_key" in batch.column_names else None
        n = len(x)
        nq = len(self.qid)
        if self.cell_sets is None:
            # row-chunked per-query kernels: a 16k-row chunk of x/y (256 KB)
            # stays L2-resident across ALL queries, so DRAM traffic is one
            # pass over the batch instead of one per query (measured: the
            # unchunked loop saturated memory bandwidth at ~8 cores)
            CH = 16_384
            cand_rows: list[list] = [[] for _ in range(nq)]
            cand_d: list[list] = [[] for _ in range(nq)]
            for s in range(0, n, CH):
                e = min(n, s + CH)
                xs, ys = x[s:e], y[s:e]
                zs = z[s:e] if z is not None else None
                m = e - s
                for qi in range(nq):
                    dx = xs - self.qx[qi]
                    dy = ys - self.qy[qi]
                    d2 = dx * dx + dy * dy
                    if zs is not None:
                        dz = zs - self.qz[qi]
                        d2 = d2 + dz * dz
                    kk = min(int(self.k[qi]), m)
                    part = _smallest_with_ties(d2, kk)
                    cand_rows[qi].append(part + s)
                    cand_d[qi].append(d2[part])
            for qi in range(nq):
                rows = np.concatenate(cand_rows[qi])
                d2 = np.concatenate(cand_d[qi])
                kk = min(int(self.k[qi]), len(rows))
                part = _smallest_with_ties(d2, kk)
                out_q.append(np.full(len(part), qi))
                out_rows.append(rows[part])
                out_d.append(d2[part])
        else:
            # ring-pruned path: sort the batch by cell key ONCE, then each
            # query gathers its candidate rows with two searchsorted calls
            # over its (sorted) ring cells — O(n log n + Q * ring * log n)
            # instead of the O(Q * n) per-query isin scan
            from optimizing_ray.pipelines.box_join import _ranges_to_rows
            if key is not None:
                order = np.argsort(key, kind="stable")
                skey = key[order]
            for qi in range(nq):
                if key is not None:
                    qcells = self.cell_sets[qi]
                    lo = np.searchsorted(skey, qcells, side="left")
                    hi = np.searchsorted(skey, qcells, side="right")
                    rows = order[_ranges_to_rows(lo, hi)]
                    if len(rows) == 0:
                        continue
                else:
                    rows = np.arange(n)
                dx = x[rows] - self.qx[qi]
                dy = y[rows] - self.qy[qi]
                d2 = dx * dx + dy * dy
                if z is not None:
                    dz = z[rows] - self.qz[qi]
                    d2 = d2 + dz * dz
                kk = min(int(self.k[qi]), len(rows))
                part = _smallest_with_ties(d2, kk)
                out_q.append(np.full(len(part), qi))
                out_rows.append(rows[part])
                out_d.append(d2[part])
        if not out_q:
            return pa.table({"query_id": pa.array(self.qid[:0]),
                             "doc_id": doc_id.slice(0, 0),
                             "dist2": pa.array([], pa.float64())})
        qidx = np.concatenate(out_q)
        rowsel = np.concatenate(out_rows)
        return pa.table({
            "query_id": pa.array(self.qid[qidx]),
            "doc_id": doc_id.take(pa.array(rowsel)),
            "dist2": pa.array(np.concatenate(out_d)),
        })


def _merge_topk_driver(allp: pd.DataFrame, queries: pa.Table) -> pd.DataFrame:
    """Vectorized driver-side final top-k merge: ONE lexsort over the
    (<= Q x k x blocks) partial rows + boundary rank selection, replacing
    pandas ``groupby().apply()`` (per-group Python and the suite's
    DeprecationWarning source).  Ordering contract unchanged: rank 1..k
    by (dist2, doc_id) per query — the SQL oracle's tiebreak."""
    if not len(allp):
        return pd.DataFrame(columns=["query_id", "doc_id", "dist", "knn_rank"])
    qid = allp["query_id"].to_numpy()
    d2 = allp["dist2"].to_numpy()
    did = allp["doc_id"].to_numpy()
    order = np.lexsort((did, d2, qid))
    qs, d2s, dids = qid[order], d2[order], did[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    seg_len = np.diff(np.r_[starts, len(qs)])
    rank = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, seg_len)
    kser = pd.Series(queries["k"].to_numpy(zero_copy_only=False),
                     index=queries["query_id"].to_pylist())
    krow = kser.loc[qs].to_numpy()
    keep = rank < krow
    return pd.DataFrame({
        "query_id": qs[keep], "doc_id": dids[keep],
        "dist": np.sqrt(d2s[keep]), "knn_rank": rank[keep] + 1})


def _final_topk(queries: pa.Table):
    kmap = dict(zip(queries["query_id"].to_pylist(),
                    queries["k"].to_numpy(zero_copy_only=False).tolist()))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        k = int(kmap[g["query_id"].iloc[0]])
        g = g.sort_values(["dist2", "doc_id"]).head(k).copy()
        g["knn_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["dist"] = np.sqrt(g["dist2"].to_numpy())
        return g[["query_id", "doc_id", "dist", "knn_rank"]]

    return merge


def knn_brute(docs: rd.Dataset, queries: pa.Table, *,
              batch_size: int | None = None, dims: int = 2,
              merge: str = "driver") -> rd.Dataset | pa.Table:
    """Exact kNN: per-batch partial top-k + per-query merge.

    Output: (query_id, doc_id, dist, knn_rank) with rank 1..k ordered by
    (dist, doc_id) — the tiebreak the SQL oracle uses too.

    merge="driver" (default): partials are at most Q x k rows PER BLOCK,
    so the final merge input is tiny by construction and runs driver-side
    (a groupby all-to-all over many small blocks costs more than it
    parallelizes).  merge="shuffle" keeps the distributed groupby for
    huge query sets.
    """
    qcols = ["query_id", "x", "y", "k"] + (["z"] if "z" in queries.column_names
                                            and dims == 3 else [])
    qref = ray.put({c: queries[c].to_numpy(zero_copy_only=False) for c in qcols})
    from optimizing_ray.broadcast import cached

    def partial_batch(batch):
        st = cached(("knn", qref.hex()), lambda: _PartialTopK(qref))
        return st(batch)

    partial = docs.map_batches(partial_batch, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=batch_size)
    if merge == "shuffle":
        return partial.groupby("query_id").map_groups(_final_topk(queries),
                                                      batch_format="pandas")
    tables = [t for t in ray.get(partial.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({"query_id": queries["query_id"].slice(0, 0),
                         "doc_id": pa.array([], pa.string()),
                         "dist": pa.array([], pa.float64()),
                         "knn_rank": pa.array([], pa.int64())})
    allp = pa.concat_tables(tables).to_pandas()
    out = _merge_topk_driver(allp, queries)
    return pa.Table.from_pandas(out, preserve_index=False)


def _knn_ring_impl(source_fn, brute_ds_fn, queries: pa.Table, *,
                   world: World, depth: int, batch_size: int | None,
                   max_rounds: int) -> pa.Table:
    """Shared ring-expansion loop.  ``source_fn(ring_cells_union)`` yields
    the round's candidate Dataset (the whole keyed corpus for the
    in-memory plan, a pruned tile-store read for the disk plan);
    ``brute_ds_fn()`` yields the straggler-fallback corpus."""
    wx, wy, _ = world.size
    n = 1 << depth
    cell_w = min(wx, wy) / n
    qx = queries["x"].to_numpy()
    qy = queries["y"].to_numpy()
    qk = queries["k"].to_numpy(zero_copy_only=False)
    qid = np.asarray(queries["query_id"].to_pylist())
    qcell = cells.point_cell2(qx, qy, world, depth)

    pending = np.arange(len(qid))
    results: dict[str, pd.DataFrame] = {}
    ring = 1
    for _ in range(max_rounds):
        if len(pending) == 0:
            break
        sub = pa.table({
            "query_id": pa.array(qid[pending]),
            "x": pa.array(qx[pending]), "y": pa.array(qy[pending]),
            "k": pa.array(qk[pending]),
        })
        cell_sets = [np.unique(cells.disk2(qcell[p], ring)).astype(np.int64)
                     for p in pending]
        docs_round = source_fn(np.unique(np.concatenate(cell_sets)))
        qref = ray.put({c: sub[c].to_numpy(zero_copy_only=False)
                        for c in ("query_id", "x", "y", "k")})
        cref = ray.put(cell_sets)
        from optimizing_ray.broadcast import cached

        def partial_batch(batch, qref=qref, cref=cref):
            st = cached(("knn_ring", qref.hex(), cref.hex()),
                        lambda: _PartialTopK(qref, cref))
            return st(batch)

        partial = docs_round.map_batches(
            partial_batch, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
        ptabs = [t for t in ray.get(partial.to_arrow_refs()) if t.num_rows]
        if ptabs:
            merged = _merge_topk_driver(pa.concat_tables(ptabs).to_pandas(), sub)
        else:
            merged = pd.DataFrame(columns=["query_id", "doc_id", "dist", "knn_rank"])
        still = []
        guarantee = ring * cell_w  # conservative: distance covered from the cell border
        for j, p in enumerate(pending):
            g = merged[merged["query_id"] == qid[p]]
            kth = g["dist"].max() if len(g) == int(qk[p]) else np.inf
            # STRICT inequality: an outside point at exactly guarantee
            # distance could displace an equal-distance neighbor under the
            # (dist, doc_id) tiebreak
            if kth < guarantee or ring >= n:
                results[qid[p]] = g
            else:
                still.append(p)
        pending = np.asarray(still, dtype=np.int64)
        ring *= 2
    if len(pending):  # fall back to exact brute merge for stragglers
        sub = pa.table({
            "query_id": pa.array(qid[pending]),
            "x": pa.array(qx[pending]), "y": pa.array(qy[pending]),
            "k": pa.array(qk[pending]),
        })
        merged = knn_brute(brute_ds_fn(), sub).to_pandas()
        for p in pending:
            results[qid[p]] = merged[merged["query_id"] == qid[p]]
    out = pd.concat(results.values(), ignore_index=True) if results else \
        pd.DataFrame(columns=["query_id", "doc_id", "dist", "knn_rank"])
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_ring(docs: rd.Dataset, queries: pa.Table, *, world: World, depth: int,
             concurrency=None,  # unused; stage is stateless
             batch_size: int | None = None,
             max_rounds: int = 8) -> pa.Table:
    """Ring-expansion kNN (the reference's neighborhood-load pattern).

    Iterative driver loop: round r restricts phase 1 to each query's
    Chebyshev disk of radius ring_r cells; a query is DONE when its k-th
    neighbor distance <= ring_r * cell_width (nothing outside the disk can
    be closer).  Unsatisfied queries re-run with a doubled ring.  Each
    round streams the (cell-pruned) corpus once; the result is exact.
    `docs` must carry a ``cell_key`` column (assign_tiles).

    Returns a pyarrow Table (driver-side merge is tiny: Q x k rows).
    """
    return _knn_ring_impl(lambda _cells: docs, lambda: docs, queries,
                          world=world, depth=depth, batch_size=batch_size,
                          max_rounds=max_rounds)


def knn_ring_store(store_dir: str, queries: pa.Table, *, world: World,
                   depth: int, batch_size: int | None = None,
                   max_rounds: int = 8) -> tuple[pa.Table, dict]:
    """Ring-expansion kNN against the ON-DISK tile store: round r READS
    only the tile groups inside the pending queries' ring-r disks
    (``tile_store.pruned_read``) — the disk twin of the reference's
    load-only-the-ring working set (``WorldPartition.hpp:196-204``).  At
    100 TB this is what makes ring rounds cheap: the corpus is never
    re-streamed, only the covered cells leave storage.

    Returns (result table, metrics) where metrics records per-round
    parts_read and the store's parts_total."""
    from optimizing_ray.pipelines import tile_store
    from optimizing_ray.state import manifest

    metrics = {"rounds": [], "parts_total": None}

    def source(ring_cells: np.ndarray) -> rd.Dataset:
        ds, n_read, n_total = tile_store.pruned_read(store_dir, ring_cells)
        metrics["rounds"].append({"parts_read": n_read})
        metrics["parts_total"] = n_total
        return ds

    out = _knn_ring_impl(source, lambda: manifest.read_output(store_dir),
                         queries, world=world, depth=depth,
                         batch_size=batch_size, max_rounds=max_rounds)
    return out, metrics


def _lexsortable(a: np.ndarray) -> np.ndarray:
    """Object arrays (arrow string ids) -> unicode dtype for np.lexsort."""
    return a.astype(str) if a.dtype == object else a


def _knn_join_broadcast(left: rd.Dataset, right: rd.Dataset, *, world: World,
                        depth: int, k: int, left_id_col: str,
                        right_id_col: str, exclude_self: bool) -> rd.Dataset:
    """Broadcast plan for ``knn_join``: the right side (gated to
    <= broadcast_threshold rows BY PLAN CHOICE) ships once via
    ``ray.put`` as cell-sorted arrays; every LEFT batch then computes
    its rows' exact kNN locally with per-cell ring expansion — zero
    shuffles, no rounds, one streaming pass over the left side.  The
    kernel is vectorized per unique left cell (queries sharing a cell
    share their candidate gather), never per row."""
    from optimizing_ray.broadcast import cached

    n = 1 << depth
    wx, wy, _ = world.size
    cell_w = min(wx, wy) / n

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return pa.table({"_rid": pa.array([], pa.string()),
                             "_rx": pa.array([], pa.float64()),
                             "_ry": pa.array([], pa.float64()),
                             "cell_key": pa.array([], pa.int64())})
        key = cells.point_cell2(t["x"].to_numpy(zero_copy_only=False),
                                t["y"].to_numpy(zero_copy_only=False),
                                world, depth).astype(np.int64)
        return pa.table({"_rid": t[right_id_col], "_rx": t["x"],
                         "_ry": t["y"], "cell_key": pa.array(key)})

    parts = [t for t in ray.get(right.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    if parts:
        rt = pa.concat_tables(parts)
        skey_u = rt["cell_key"].to_numpy()
        order = np.argsort(skey_u, kind="stable")
        state = {
            "skey": skey_u[order],
            "rx": rt["_rx"].to_numpy()[order],
            "ry": rt["_ry"].to_numpy()[order],
            # unicode (not object) dtype so np.lexsort can key on ids
            "rid": _lexsortable(rt["_rid"].to_numpy(zero_copy_only=False)[order]),
            "rid_type": rt.schema.field("_rid").type,
            "n_right": rt.num_rows,
        }
    else:
        state = {"skey": np.empty(0, np.int64), "rx": np.empty(0),
                 "ry": np.empty(0), "rid": np.empty(0, object),
                 "rid_type": pa.int64(), "n_right": 0}
    state_ref = ray.put(state)
    nr = state["n_right"]
    ring0 = 1
    if nr > 0:
        r_k = float(np.sqrt((k + 1) / (np.pi * nr) * (wx * wy)))
        ring0 = int(np.clip(np.ceil(r_k / cell_w), 1, max(1, n - 1)))

    from optimizing_ray.pipelines.box_join import _ranges_to_rows
    rtype = state["rid_type"]  # neighbor ids keep the RIGHT side's type

    def join_batch(t: pa.Table) -> pa.Table:
        lid_type = (t[left_id_col].type if left_id_col in t.column_names
                    else pa.int64())
        empty = pa.table({left_id_col: pa.array([], lid_type),
                          "neighbor_id": pa.array([], rtype),
                          "dist": pa.array([], pa.float64()),
                          "knn_rank": pa.array([], pa.int64())})
        if t.num_rows == 0 or left_id_col not in t.column_names:
            return empty
        st = cached(("knn_join_bcast", state_ref.hex()),
                    lambda: ray.get(state_ref))
        skey, rx, ry, rid = st["skey"], st["rx"], st["ry"], st["rid"]
        lx = t["x"].to_numpy(zero_copy_only=False)
        ly = t["y"].to_numpy(zero_copy_only=False)
        lid = t[left_id_col].to_numpy(zero_copy_only=False)
        if st["n_right"] == 0:
            return empty
        lkey = cells.point_cell2(lx, ly, world, depth)
        out_l, out_r, out_d, out_rank = [], [], [], []
        pend = np.arange(len(lx))
        ring = ring0
        while len(pend):
            force = ring >= n
            still: list[np.ndarray] = []
            ucells, inv = np.unique(lkey[pend], return_inverse=True)
            for ci in range(len(ucells)):
                rows_q = pend[inv == ci]
                qcells = np.unique(cells.disk2(
                    np.uint64(ucells[ci]), ring).astype(np.int64))
                lo = np.searchsorted(skey, qcells, side="left")
                hi = np.searchsorted(skey, qcells, side="right")
                cand = _ranges_to_rows(lo, hi)
                if len(cand) == 0:
                    if force:
                        continue  # grid exhausted, no neighbors exist
                    still.append(rows_q)
                    continue
                # query-chunked distance blocks: bound the (q, m) matrix
                qch = max(1, (1 << 22) // max(len(cand), 1))
                for s in range(0, len(rows_q), qch):
                    rq = rows_q[s:s + qch]
                    dx = lx[rq, None] - rx[cand][None, :]
                    dy = ly[rq, None] - ry[cand][None, :]
                    d2 = dx * dx + dy * dy
                    if exclude_self:
                        d2[lid[rq, None] == rid[cand][None, :]] = np.inf
                    kk = min(k, d2.shape[1])
                    idx = (np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                           if kk < d2.shape[1]
                           else np.broadcast_to(np.arange(d2.shape[1]),
                                                (len(rq), d2.shape[1])))
                    dsel = np.take_along_axis(d2, idx, axis=1)
                    nvalid = (dsel < np.inf).sum(axis=1)
                    kth = np.where(nvalid >= 1,
                                   np.max(np.where(dsel < np.inf, dsel, 0.0),
                                          axis=1), np.inf)
                    done = ((nvalid >= min(k, st["n_right"]))
                            & (np.sqrt(kth) < ring * cell_w)) | force
                    if not force and not done.all():
                        still.append(rq[~done])
                    drows = np.flatnonzero(done)
                    if len(drows) == 0:
                        continue
                    # vectorized emit over ALL done rows of the chunk.
                    # argpartition breaks EXACT-d2 ties at the k boundary
                    # arbitrarily, but the oracle's row_number orders by
                    # (d2, rid) — so include every candidate tied at the
                    # k-th distance, ONE lexsort keyed (query, d2, rid),
                    # then cut at rank k
                    d2d = d2[drows]
                    kv = kth[drows]
                    tie = (d2d <= kv[:, None]) & (d2d < np.inf)
                    cnts = tie.sum(axis=1)
                    qrep = np.repeat(np.arange(len(drows)), cnts)
                    dflat = d2d[tie]
                    colidx = np.broadcast_to(np.arange(d2d.shape[1]),
                                             d2d.shape)[tie]
                    rv = cand[colidx]
                    o = np.lexsort((rid[rv], dflat, qrep))
                    starts = np.cumsum(cnts) - cnts
                    ranks = (np.arange(len(o), dtype=np.int64)
                             - np.repeat(starts, cnts) + 1)
                    keep = ranks <= k
                    out_l.append(np.repeat(rq[drows], cnts)[keep])
                    out_r.append(rv[o][keep])
                    out_d.append(dflat[o][keep])
                    out_rank.append(ranks[keep])
            if force:
                break
            pend = (np.concatenate(still) if still
                    else np.empty(0, dtype=np.int64))
            ring = min(ring * 2, n)
        if not out_l:
            return empty
        li = np.concatenate(out_l)
        return pa.table({
            left_id_col: t[left_id_col].take(pa.array(li)),
            "neighbor_id": pa.array(rid[np.concatenate(out_r)]).cast(rtype),
            "dist": pa.array(np.sqrt(np.concatenate(out_d))),
            "knn_rank": pa.array(np.concatenate(out_rank)),
        })

    return left.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def knn_join(left: rd.Dataset, right: rd.Dataset, *, world: World,
             depth: int, k: int, left_id_col: str = "doc_id",
             right_id_col: str = "doc_id", exclude_self: bool = False,
             n_shards: int | None = None, num_partitions: int | None = None,
             max_rounds: int | None = None, nrows: int | None = None,
             tail_threshold: int = 65_536,
             broadcast_threshold: int = 200_000) -> rd.Dataset:
    """Distributed kNN JOIN: for EVERY left row, its k nearest right rows.

    Unlike ``knn_ring`` (driver-held query table), both sides are
    Datasets — the left side never materializes driver-side, so the
    operator scales to a full-corpus self-join (the retrieval-per-record
    primitive of training-data curation).  Plan per ring round r:

    1. explode pending left rows over their Chebyshev ring-r cell disks
       (``cells.disk2``, the reference neighborhood rule
       ``WorldPartition.hpp:196-204``);
    2. LEFT OUTER hash-join with the cell-keyed right side on
       ``cell_key`` (outer so zero-candidate rows stay pending);
    3. in-batch partial top-k per left row (at most k rows per (batch,
       left) leave the stage);
    4. one sharded exchange on ``hash(left_id)`` merges partials, ranks
       by (dist2, right_id) — the SQL oracle's exact tiebreak — and
       splits done/pending with the ring guarantee: the k-th distance
       must be STRICTLY inside ``ring * cell_w`` (``_knn_ring_impl``
       bound); undone rows re-enter with a doubled ring.

    Rounds materialize (iterative-pipeline discipline); results stream
    out as the union of per-round done Datasets.  Output columns:
    ``(left_id_col, neighbor_id, dist, knn_rank)``.

    Round economics: each distributed round is ~2 exchanges of fixed
    cost, so (a) ``nrows`` (the free parquet-metadata right-row count)
    sizes the FIRST ring to the expected k-th-neighbor radius under
    uniform density — most rows finish in round 1; (b) after the first
    round, a pending set at or below ``tail_threshold`` rows finishes
    driver-side via ``knn_brute`` (the working-notes tail rule:
    per-round dispatch dominates below ~65k rows); bigger pending sets
    keep ring-doubling distributed.  ``exclude_self`` tails request
    k+1 (ids are unique, so at most ONE row — the self row — is
    dropped per query; the first k survivors are exactly the true
    top-k).

    Plan choice (the dedup/pip discipline): when ``nrows`` (the free
    parquet-metadata right-row count) is given and at most
    ``broadcast_threshold``, the right side broadcasts once and each
    left batch joins locally with zero shuffles
    (``_knn_join_broadcast``); no hint = assume large = sharded rounds.
    """
    from optimizing_ray.config import resolve_shards
    n_shards = resolve_shards(n_shards)
    if nrows is not None and 0 <= nrows <= broadcast_threshold:
        return _knn_join_broadcast(left, right, world=world, depth=depth,
                                   k=k, left_id_col=left_id_col,
                                   right_id_col=right_id_col,
                                   exclude_self=exclude_self)
    wx, wy, _ = world.size
    n = 1 << depth
    cell_w = min(wx, wy) / n
    if max_rounds is None:
        max_rounds = depth + 2  # ring doubles until >= n covers the grid
    ring0 = 1
    if nrows and nrows > 0:
        # expected k-th NN radius for uniform density, in cell widths
        r_k = float(np.sqrt((k + 1) / (np.pi * nrows) * (wx * wy)))
        ring0 = int(np.clip(np.ceil(r_k / cell_w), 1, max(1, n - 1)))

    # native id types preserved end-to-end: casting ids to string would
    # silently change the (dist2, right_id) tiebreak from numeric to
    # lexicographic and break the SQL oracle's row_number ordering
    lid_type = left.schema().base_schema.field(left_id_col).type
    rid_type = right.schema().base_schema.field(right_id_col).type
    out_schema = pa.schema([
        ("_lid", lid_type), ("_rid", rid_type),
        ("dist", pa.float64()), ("knn_rank", pa.int64()),
        ("x", pa.float64()), ("y", pa.float64()), ("_done", pa.bool_()),
    ])

    def assign_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return pa.table({"_lid": pa.array([], lid_type),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        return pa.table({"_lid": t[left_id_col],
                         "x": t["x"], "y": t["y"]})

    def assign_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return pa.table({"_rid": pa.array([], rid_type),
                             "_rx": pa.array([], pa.float64()),
                             "_ry": pa.array([], pa.float64()),
                             "cell_key": pa.array([], pa.int64())})
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        key = cells.point_cell2(x, y, world, depth).astype(np.int64)
        return pa.table({"_rid": t[right_id_col],
                         "_rx": t["x"], "_ry": t["y"],
                         "cell_key": pa.array(key)})

    right_keyed = right.map_batches(assign_right, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    pending = left.map_batches(assign_left, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()
    done_parts: list[rd.Dataset] = []
    ring = ring0
    for rnd in range(max_rounds):
        force = ring >= n or rnd == max_rounds - 1

        def explode(t: pa.Table, ring=ring) -> pa.Table:
            if t.num_rows == 0 or "_lid" not in t.column_names:
                return pa.table({"_lid": pa.array([], pa.string()),
                                 "x": pa.array([], pa.float64()),
                                 "y": pa.array([], pa.float64()),
                                 "cell_key": pa.array([], pa.int64())})
            x = t["x"].to_numpy(zero_copy_only=False)
            y = t["y"].to_numpy(zero_copy_only=False)
            key = cells.point_cell2(x, y, world, depth)
            disk = cells.disk2(key, ring).astype(np.int64)  # (n, (2r+1)^2)
            m = disk.shape[1]
            df = pd.DataFrame({
                "_lid": np.repeat(t["_lid"].to_numpy(zero_copy_only=False), m),
                "x": np.repeat(x, m), "y": np.repeat(y, m),
                "cell_key": disk.ravel(),
            }).drop_duplicates(["_lid", "cell_key"])  # border clamp dups
            return pa.Table.from_pandas(df, preserve_index=False)

        exploded = pending.map_batches(explode, batch_format="pyarrow",
                                       zero_copy_batch=True)
        # NOT Dataset.join: the native join starts num_partitions
        # aggregator actors per execution (~15 s cold on this VM);
        # hash_shard_join is the repo's union + shard-groupby exchange
        joined = shard_join.hash_shard_join(exploded, right_keyed,
                                            on="cell_key", how="left",
                                            n_shards=n_shards)

        # the left-outer join NaN-upcasts a nullable int id column to
        # float64 under pandas (working-notes gotcha); ids are exact in
        # float64 far beyond any corpus size, and _restore casts them
        # back before rows leave the exchange
        _int_rid = pa.types.is_integer(rid_type)
        _fill = 0 if _int_rid else ""

        def _restore(s: pd.Series) -> pd.Series:
            return s.astype(np.int64) if _int_rid else s

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cols = ["_lid", "x", "y", "_rid", "_d2", "_hasc", "_shard"]
            if len(df) == 0 or "_lid" not in df.columns:
                return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in
                                     zip(cols, [object, float, float,
                                                object, float, bool,
                                                np.int64])})
            real = df[df["_rid"].notna()]
            if exclude_self:
                real = real[real["_lid"] != real["_rid"]]
            dx = real["x"].to_numpy() - real["_rx"].to_numpy()
            dy = real["y"].to_numpy() - real["_ry"].to_numpy()
            real = real.assign(_d2=dx * dx + dy * dy, _hasc=True)
            real = real.sort_values(["_lid", "_d2", "_rid"],
                                    kind="stable").groupby("_lid").head(k)
            # keep zero-candidate left rows visible downstream (sentinel)
            lost = df[~df["_lid"].isin(real["_lid"])].drop_duplicates("_lid")
            keep = ["_lid", "x", "y", "_rid", "_d2", "_hasc"]
            if len(lost):
                lost = lost.assign(_rid=_fill, _d2=np.inf, _hasc=False)
                real = pd.concat([real[keep], lost[keep]])
            else:
                real = real[keep]
            real = real.assign(_rid=_restore(real["_rid"]))
            sh = pd.util.hash_pandas_object(real["_lid"], index=False)
            return real.assign(_shard=(sh % n_shards).astype(np.int64))

        def finalize(g: pd.DataFrame, ring=ring, force=force) -> pd.DataFrame:
            real = g[g["_hasc"]].sort_values(["_lid", "_d2", "_rid"],
                                             kind="stable")
            real = real.assign(knn_rank=real.groupby("_lid").cumcount() + 1)
            topk = real[real["knn_rank"] <= k]
            stats = topk.groupby("_lid")["_d2"].agg(["count", "max"])
            kth = np.sqrt(stats["max"].to_numpy())
            done = (stats["count"].to_numpy() >= k) & (kth < ring * cell_w)
            if force:
                done = np.ones(len(stats), dtype=bool)
            done_ids = set(stats.index[done])
            dres = topk[topk["_lid"].isin(done_ids)]
            dres = pd.DataFrame({
                "_lid": dres["_lid"], "_rid": _restore(dres["_rid"]),
                "dist": np.sqrt(dres["_d2"].to_numpy()),
                "knn_rank": dres["knn_rank"].astype(np.int64),
                "x": 0.0, "y": 0.0, "_done": True,
            })
            pend = g[~g["_lid"].isin(done_ids)].drop_duplicates("_lid")
            pres = pd.DataFrame({
                "_lid": pend["_lid"], "_rid": _restore(pend["_rid"]) if
                len(pend) else _restore(pd.Series([], dtype=object)),
                "dist": 0.0, "knn_rank": np.int64(0),
                "x": pend["x"], "y": pend["y"], "_done": False,
            })
            return pd.concat([dres, pres], ignore_index=True)

        round_out = (joined.map_batches(partial, batch_format="pandas")
                     .groupby("_shard").map_groups(finalize,
                                                   batch_format="pandas")
                     .map_batches(lambda t: t.cast(out_schema),
                                  batch_format="pyarrow")
                     .materialize())
        done_parts.append(round_out.filter(expr="_done == True")
                          .select_columns(["_lid", "_rid", "dist",
                                           "knn_rank"]))
        pending = (round_out.filter(expr="_done == False")
                   .select_columns(["_lid", "x", "y"]).materialize())
        n_pending = pending.count()
        if n_pending == 0:
            break
        if n_pending <= tail_threshold:
            # straggler tail driver-side: below the dispatch knee, more
            # distributed rounds cost more than one brute merge
            blocks = []
            for t in ray.get(pending.to_arrow_refs()):
                if isinstance(t, pd.DataFrame):  # pandas-block lineage
                    t = pa.Table.from_pandas(t, preserve_index=False)
                if t.num_rows:
                    blocks.append(t)
            pt = pa.concat_tables(blocks)
            kk = k + 1 if exclude_self else k
            qtab = pa.table({"query_id": pt["_lid"], "x": pt["x"],
                             "y": pt["y"],
                             "k": pa.array(np.full(pt.num_rows, kk))})
            rds = right_keyed.map_batches(
                lambda t: t.rename_columns(
                    ["doc_id" if c == "_rid" else
                     ("x" if c == "_rx" else ("y" if c == "_ry" else c))
                     for c in t.column_names]),
                batch_format="pyarrow", zero_copy_batch=True)
            tail = knn_brute(rds, qtab).to_pandas()
            if exclude_self:
                tail = tail[tail["query_id"] != tail["doc_id"]]
            tail = tail.sort_values(["query_id", "knn_rank"], kind="stable")
            tail["knn_rank"] = tail.groupby("query_id").cumcount() + 1
            tail = tail[tail["knn_rank"] <= k]
            done_parts.append(rd.from_arrow(pa.Table.from_pandas(
                pd.DataFrame({"_lid": tail["query_id"],
                              "_rid": tail["doc_id"],
                              "dist": tail["dist"],
                              "knn_rank": tail["knn_rank"].astype(np.int64)}),
                preserve_index=False)))
            break
        ring *= 2

    result = done_parts[0]
    for p in done_parts[1:]:
        result = result.union(p)

    def rename(t: pa.Table) -> pa.Table:
        names = [left_id_col if c == "_lid" else
                 ("neighbor_id" if c == "_rid" else c)
                 for c in t.column_names]
        return t.rename_columns(names)

    return result.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)

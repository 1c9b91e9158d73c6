"""Distance-band spatial join (ST_DWithin): every pair within radius R.

The fixed-radius sibling of ``knn.knn_join`` — the classic geospatial
self-join ("all pairs of points closer than R"), and at corpus scale the
spatial analogue of near-duplicate pair generation.  The reference's
view-distance neighborhood rule (``WorldPartition.hpp:196-212``) is the
same pruning idea with r = view distance.

Two plans (the dedup/pip/knn_join plan-choice discipline):

* broadcast (``nrows`` <= threshold): the right side ships ONCE via
  ``ray.put`` as cell-sorted arrays; each left batch gathers ring
  candidates per unique cell and masks ``d2 <= R^2`` — zero shuffles.
* shard (default, no hint = assume large): left explodes over its
  Chebyshev disk of ``ceil(R / cell_w)`` cells, ONE
  ``shard_join.hash_shard_join`` on the right side's own cell, then a
  vectorized residual distance filter.  Every surviving pair appears
  exactly once (the right row has ONE cell; the left explode emits that
  cell once), so no dedup shuffle is needed.

Output: (doc_a, doc_b, dist) with ``doc_a < doc_b`` — each unordered
pair once, ids kept in their native type so the comparison matches the
SQL oracle's (``oracle.dwithin_join_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World, resolve_shards
from optimizing_ray.pipelines import shard_join
from optimizing_ray.pipelines.box_join import _ranges_to_rows

__all__ = ["dwithin_join", "spatial_clusters", "ripley_k", "colocation", "clark_evans", "dbscan", "contact_reach"]


def _keyed(t: pa.Table, world: World, depth: int, id_col: str,
           prefix: str) -> pa.Table:
    if t.num_rows == 0 or "x" not in t.column_names:
        return pa.table({f"{prefix}id": pa.array([], pa.string()),
                         f"{prefix}x": pa.array([], pa.float64()),
                         f"{prefix}y": pa.array([], pa.float64()),
                         "cell_key": pa.array([], pa.int64())})
    key = cells.point_cell2(t["x"].to_numpy(zero_copy_only=False),
                            t["y"].to_numpy(zero_copy_only=False),
                            world, depth).astype(np.int64)
    return pa.table({f"{prefix}id": t[id_col], f"{prefix}x": t["x"],
                     f"{prefix}y": t["y"], "cell_key": pa.array(key)})


def dwithin_join(left: rd.Dataset, right: rd.Dataset, *, world: World,
                 depth: int, radius: float, id_col: str = "doc_id",
                 n_shards: int | None = None, nrows: int | None = None,
                 broadcast_threshold: int = 200_000) -> rd.Dataset:
    """All (left, right) pairs with euclidean distance <= radius and
    ``left_id < right_id`` (each unordered pair once; self pairs never
    emitted).  Both sides must carry (id_col, x, y)."""
    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size
    n = 1 << depth
    cell_w = min(wx, wy) / n
    ring = int(np.clip(np.ceil(radius / cell_w), 1, max(1, n - 1)))
    r2 = radius * radius

    if nrows is not None and 0 <= nrows <= broadcast_threshold:
        return _dwithin_broadcast(left, right, world=world, depth=depth,
                                  ring=ring, r2=r2, id_col=id_col)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x" not in t.column_names:
            return pa.table({"_aid": pa.array([], pa.string()),
                             "_ax": pa.array([], pa.float64()),
                             "_ay": pa.array([], pa.float64()),
                             "cell_key": pa.array([], pa.int64())})
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        key = cells.point_cell2(x, y, world, depth)
        disk = cells.disk2(key, ring).astype(np.int64)
        m = disk.shape[1]
        df = pd.DataFrame({
            "_aid": np.repeat(t[id_col].to_numpy(zero_copy_only=False), m),
            "_ax": np.repeat(x, m), "_ay": np.repeat(y, m),
            "cell_key": disk.ravel(),
        }).drop_duplicates(["_aid", "cell_key"])  # border clamp dups
        return pa.Table.from_pandas(df, preserve_index=False)

    a_side = left.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)
    b_side = right.map_batches(lambda t: _keyed(t, world, depth, id_col, "_b"),
                               batch_format="pyarrow", zero_copy_batch=True)
    joined = shard_join.hash_shard_join(a_side, b_side, on="cell_key",
                                        how="inner", n_shards=n_shards)

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "_aid" not in df.columns:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "dist": []})
        dx = df["_ax"].to_numpy() - df["_bx"].to_numpy()
        dy = df["_ay"].to_numpy() - df["_by"].to_numpy()
        d2 = dx * dx + dy * dy
        keep = (d2 <= r2) & (df["_aid"].to_numpy() < df["_bid"].to_numpy())
        out = df[keep]
        return pd.DataFrame({"doc_a": out["_aid"].to_numpy(),
                             "doc_b": out["_bid"].to_numpy(),
                             "dist": np.sqrt(d2[keep])})

    return joined.map_batches(residual, batch_format="pandas")


def _dwithin_broadcast(left: rd.Dataset, right: rd.Dataset, *, world: World,
                       depth: int, ring: int, r2: float,
                       id_col: str) -> rd.Dataset:
    from optimizing_ray.broadcast import cached

    parts = [t for t in ray.get(right.map_batches(
        lambda t: _keyed(t, world, depth, id_col, "_b"),
        batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    if parts:
        rt = pa.concat_tables(parts)
        k = rt["cell_key"].to_numpy()
        order = np.argsort(k, kind="stable")
        state = {"skey": k[order], "bx": rt["_bx"].to_numpy()[order],
                 "by": rt["_by"].to_numpy()[order],
                 "bid": rt["_bid"].to_numpy(zero_copy_only=False)[order]}
    else:
        state = {"skey": np.empty(0, np.int64), "bx": np.empty(0),
                 "by": np.empty(0), "bid": np.empty(0, object)}
    state_ref = ray.put(state)

    def join_batch(t: pa.Table) -> pa.Table:
        id_type = (t[id_col].type if id_col in t.column_names else pa.int64())
        empty = pa.table({"doc_a": pa.array([], id_type),
                          "doc_b": pa.array([], id_type),
                          "dist": pa.array([], pa.float64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        st = cached(("dwithin_bcast", state_ref.hex()),
                    lambda: ray.get(state_ref))
        skey, bx, by, bid = st["skey"], st["bx"], st["by"], st["bid"]
        if len(skey) == 0:
            return empty
        ax = t["x"].to_numpy(zero_copy_only=False)
        ay = t["y"].to_numpy(zero_copy_only=False)
        aid = t[id_col].to_numpy(zero_copy_only=False)
        akey = cells.point_cell2(ax, ay, world, depth)
        out_a, out_b, out_d = [], [], []
        ucells, inv = np.unique(akey, return_inverse=True)
        for ci in range(len(ucells)):
            rows_q = np.flatnonzero(inv == ci)
            qcells = np.unique(cells.disk2(np.uint64(ucells[ci]),
                                           ring).astype(np.int64))
            lo = np.searchsorted(skey, qcells, side="left")
            hi = np.searchsorted(skey, qcells, side="right")
            cand = _ranges_to_rows(lo, hi)
            if len(cand) == 0:
                continue
            qch = max(1, (1 << 22) // max(len(cand), 1))
            for s in range(0, len(rows_q), qch):
                rq = rows_q[s:s + qch]
                dx = ax[rq, None] - bx[cand][None, :]
                dy = ay[rq, None] - by[cand][None, :]
                d2 = dx * dx + dy * dy
                hit = ((d2 <= r2)
                       & (aid[rq, None] < bid[cand][None, :]))
                qi, mi = np.nonzero(hit)
                if len(qi) == 0:
                    continue
                out_a.append(rq[qi])
                out_b.append(cand[mi])
                out_d.append(np.sqrt(d2[qi, mi]))
        if not out_a:
            return empty
        ai = np.concatenate(out_a)
        return pa.table({
            "doc_a": t[id_col].take(pa.array(ai)),
            "doc_b": pa.array(bid[np.concatenate(out_b)]).cast(id_type),
            "dist": pa.array(np.concatenate(out_d)),
        })

    return left.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def spatial_clusters(docs: rd.Dataset, *, world: World, depth: int,
                     radius: float, id_col: str = "doc_id",
                     nrows: int | None = None, n_shards: int | None = None,
                     broadcast_threshold: int = 200_000) -> rd.Dataset:
    """Density clustering (DBSCAN with minPts=1): connected components
    of the distance-band graph.  cluster_id = the component's minimum
    member id; isolated docs are their own singleton cluster.

    Composition of two at-scale primitives: ``dwithin_join`` (pair
    generation, broadcast or sharded by ``nrows``) and the shared
    pairs->labels tail ``dedup.cluster_reps``, which carries the plan
    gate (driver union-find + broadcast label map below the threshold;
    sharded pointer-halving propagation + side-tagged attach exchange
    above it — the corpus is never collected).
    SQL twin: oracle.spatial_clusters_sql (recursive-CTE closure)."""
    from optimizing_ray.pipelines.dedup import cluster_reps

    pairs = dwithin_join(docs, docs, world=world, depth=depth, radius=radius,
                         id_col=id_col, nrows=nrows, n_shards=n_shards)
    return cluster_reps(docs, pairs, id_col=id_col, rep_col="cluster_id",
                        nrows=nrows, n_shards=n_shards,
                        broadcast_threshold=broadcast_threshold)


def dbscan(docs: rd.Dataset, *, world: World, depth: int, radius: float,
           min_pts: int = 3, id_col: str = "doc_id",
           nrows: int | None = None, n_shards: int | None = None,
           broadcast_threshold: int = 200_000) -> rd.Dataset:
    """DBSCAN proper (Ester et al. 1996) — the minPts >= 2 companion of
    ``spatial_clusters`` (which is the minPts=1 degenerate case), with
    DETERMINISTIC semantics so both engines agree exactly:

    * core: at least ``min_pts`` points within ``radius`` INCLUDING the
      point itself (the classic counting convention), i.e. >= min_pts-1
      neighbors;
    * clusters: connected components of the core-core distance-band
      graph; cluster_id = the component's minimum core id;
    * border: non-core with >= 1 core neighbor — joins the MINIMUM
      cluster_id over its core neighbors (the classic algorithm is
      scan-order-dependent here; the min rule makes the result a pure
      function of the data);
    * noise: everything else, cluster_id = -1.

    Output (id_col, role, cluster_id), role 2=core / 1=border / 0=noise.

    Plan gate (the dedup discipline).  Below the threshold the pair set
    is bounded BY PLAN CHOICE: pairs collect driver-side, degrees /
    union-find / border-min run in numpy, and the (id -> role, cluster)
    map ships once via ``ray.put`` — one labeling map leg, zero
    shuffles.  At scale: ONE hash(endpoint) exchange counts degrees
    into the core set, two ``hash_shard_join`` legs flag both pair
    endpoints, ``cluster_reps`` labels the core graph (pointer-halving
    CC), one hash(core) join attaches labels to one-core pairs, one
    hash(noncore) exchange takes the border min, and one final side-tag
    hash(id) exchange resolves roles — every exchange slim (ids +
    labels), the corpus never collected.
    SQL twin ``oracle.dbscan_sql`` (recursive-CTE closure over the
    core graph)."""
    from optimizing_ray.pipelines import shard_join
    from optimizing_ray.pipelines.dedup import (cluster_reps,
                                                connected_components)

    n_shards = resolve_shards(n_shards)
    pairs = dwithin_join(docs, docs, world=world, depth=depth,
                         radius=radius, id_col=id_col, nrows=nrows,
                         n_shards=n_shards,
                         broadcast_threshold=broadcast_threshold)
    out_schema = pa.schema([(id_col, pa.int64()), ("role", pa.int64()),
                            ("cluster_id", pa.int64())])
    need = min_pts - 1

    if nrows is not None and 0 <= nrows <= broadcast_threshold:
        from optimizing_ray.broadcast import cached

        ptabs = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        if ptabs:
            pt = pa.concat_tables(ptabs)
            pa_ = pt["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            pb_ = pt["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            pa_ = pb_ = np.empty(0, np.int64)
        ends = np.concatenate([pa_, pb_])
        uid, deg = np.unique(ends, return_counts=True)
        core_ids = uid[deg >= need]
        a_core = np.isin(pa_, core_ids)
        b_core = np.isin(pb_, core_ids)
        cc_mask = a_core & b_core
        rep = connected_components(
            pd.DataFrame({"doc_a": pa_[cc_mask], "doc_b": pb_[cc_mask]}),
            a="doc_a", b="doc_b")
        core_sorted = np.sort(core_ids)
        core_lab = np.array([rep.get(int(i), int(i)) for i in core_sorted],
                            dtype=np.int64)
        # border: one-core pairs contribute (noncore, core's label)
        nb = np.concatenate([pb_[a_core & ~b_core], pa_[~a_core & b_core]])
        ncore = np.concatenate([pa_[a_core & ~b_core],
                                pb_[~a_core & b_core]])
        if len(nb):
            pos = np.searchsorted(core_sorted, ncore)
            labs = core_lab[pos]
            order = np.lexsort((labs, nb))
            nb_s, lab_s = nb[order], labs[order]
            starts = np.flatnonzero(np.r_[True, nb_s[1:] != nb_s[:-1]])
            border_ids = nb_s[starts]
            border_lab = lab_s[starts]  # min label = first in lexsort
        else:
            border_ids = np.empty(0, np.int64)
            border_lab = np.empty(0, np.int64)
        state_ref = ray.put((core_sorted, core_lab, border_ids, border_lab))

        def label_batch(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or id_col not in t.column_names:
                return out_schema.empty_table()
            cs, cl, bi, bl = cached(("dbscan_lab", state_ref.hex()),
                                    lambda: ray.get(state_ref))
            did = (t[id_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            role = np.zeros(len(did), np.int64)
            clu = np.full(len(did), -1, np.int64)
            if len(cs):
                pos = np.clip(np.searchsorted(cs, did), 0, len(cs) - 1)
                hit = cs[pos] == did
                role[hit] = 2
                clu[hit] = cl[pos[hit]]
            if len(bi):
                pos = np.clip(np.searchsorted(bi, did), 0, len(bi) - 1)
                hit = (bi[pos] == did) & (role == 0)
                role[hit] = 1
                clu[hit] = bl[pos[hit]]
            return pa.table({id_col: pa.array(did),
                             "role": pa.array(role),
                             "cluster_id": pa.array(clu)})

        return docs.map_batches(label_batch, batch_format="pyarrow",
                                zero_copy_batch=True)

    # ---- sharded at-scale plan ----
    gold = np.uint64(0x9E3779B97F4A7C15)

    def _shard_of(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * gold) >> np.uint64(33)
        return (h % np.uint64(n_shards)).astype(np.int64)

    def emit_ends(t: pa.Table) -> pa.Table:
        empty = pa.table({"id": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return empty
        ids = np.concatenate([
            t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)])
        return pa.table({"id": pa.array(ids),
                         "_shard": pa.array(_shard_of(ids))})

    def core_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"cid": pd.Series([], dtype=np.int64),
                                 "is_core": pd.Series([], dtype=np.int64)})
        ids = g["id"].to_numpy(np.int64)
        uid, deg = np.unique(ids, return_counts=True)
        keep = deg >= need
        return pd.DataFrame({"cid": uid[keep],
                             "is_core": np.ones(int(keep.sum()), np.int64)})

    pairs_m = pairs.materialize()
    core = (pairs_m.map_batches(emit_ends, batch_format="pyarrow",
                                zero_copy_batch=True)
            .groupby("_shard").map_groups(core_of_shard,
                                          batch_format="pandas"))
    core_m = core.materialize()
    pschema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    cschema = pa.schema([("cid", pa.int64()), ("is_core", pa.int64())])
    slim_pairs = pairs_m.map_batches(
        lambda t: (pa.table({"doc_a": t["doc_a"], "doc_b": t["doc_b"]})
                   if t.num_rows and "doc_a" in t.column_names
                   else pschema.empty_table()),
        batch_format="pyarrow", zero_copy_batch=True)
    # flag both endpoints (left joins; missing flag -> non-core)
    fa = shard_join.hash_shard_join(
        slim_pairs.map_batches(lambda t: t.rename_columns(
            ["cid", "doc_b"]) if t.num_rows else pa.schema(
            [("cid", pa.int64()), ("doc_b", pa.int64())]).empty_table(),
            batch_format="pyarrow", zero_copy_batch=True),
        core_m, on="cid", how="left", n_shards=n_shards,
        lschema=pa.schema([("cid", pa.int64()), ("doc_b", pa.int64())]),
        rschema=cschema)

    def retag_a(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "cid" not in df.columns:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "cid": pd.Series([], dtype=np.int64),
                                 "a_core": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "doc_a": df["cid"].to_numpy(np.int64),
            "cid": df["doc_b"].to_numpy(np.int64),
            "a_core": np.where(pd.isna(df["is_core"].to_numpy()), 0, 1)
            .astype(np.int64)})

    fb = shard_join.hash_shard_join(
        fa.map_batches(retag_a, batch_format="pandas"),
        core_m, on="cid", how="left", n_shards=n_shards,
        lschema=pa.schema([("doc_a", pa.int64()), ("cid", pa.int64()),
                           ("a_core", pa.int64())]),
        rschema=cschema)

    def flagged(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_a" not in df.columns:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "a_core": pd.Series([], dtype=np.int64),
                                 "b_core": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "doc_a": df["doc_a"].to_numpy(np.int64),
            "doc_b": df["cid"].to_numpy(np.int64),
            "a_core": df["a_core"].to_numpy(np.int64),
            "b_core": np.where(pd.isna(df["is_core"].to_numpy()), 0, 1)
            .astype(np.int64)})

    fp = fb.map_batches(flagged, batch_format="pandas").materialize()
    core_pairs = fp.map_batches(
        lambda t: (t.filter(pa.compute.and_(
            pa.compute.equal(t["a_core"], 1),
            pa.compute.equal(t["b_core"], 1))).select(["doc_a", "doc_b"])
            if t.num_rows and "doc_a" in t.column_names
            else pschema.empty_table()),
        batch_format="pyarrow", zero_copy_batch=True)
    core_items = core_m.map_batches(
        lambda t: (pa.table({id_col: t["cid"]})
                   if t.num_rows and "cid" in t.column_names
                   else pa.table({id_col: pa.array([], pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True)
    core_labels = cluster_reps(core_items, core_pairs, id_col=id_col,
                               rep_col="cluster_id", nrows=None,
                               n_shards=n_shards).materialize()

    # border candidates: one-core pairs -> (noncore, core); attach the
    # core's label (hash(core) join), then min per noncore
    def one_core(t: pa.Table) -> pa.Table:
        empty = pa.table({"cid": pa.array([], pa.int64()),
                          "ncid": pa.array([], pa.int64())})
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return empty
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        ac = t["a_core"].to_numpy(zero_copy_only=False) == 1
        bc = t["b_core"].to_numpy(zero_copy_only=False) == 1
        core_side = np.concatenate([a[ac & ~bc], b[bc & ~ac]])
        non_side = np.concatenate([b[ac & ~bc], a[bc & ~ac]])
        return pa.table({"cid": pa.array(core_side.astype(np.int64)),
                         "ncid": pa.array(non_side.astype(np.int64))})

    lab_keyed = core_labels.map_batches(
        lambda t: (pa.table({"cid": t[id_col],
                             "cluster_id": t["cluster_id"]})
                   if t.num_rows and id_col in t.column_names
                   else pa.table({"cid": pa.array([], pa.int64()),
                                  "cluster_id": pa.array([], pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True)
    bj = shard_join.hash_shard_join(
        fp.map_batches(one_core, batch_format="pyarrow",
                       zero_copy_batch=True),
        lab_keyed, on="cid", how="inner", n_shards=n_shards,
        lschema=pa.schema([("cid", pa.int64()), ("ncid", pa.int64())]),
        rschema=pa.schema([("cid", pa.int64()),
                           ("cluster_id", pa.int64())]))

    def border_emit(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "ncid" not in df.columns:
            return pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                                 "lab": pd.Series([], dtype=np.int64),
                                 "_shard": pd.Series([], dtype=np.int64)})
        ids = df["ncid"].to_numpy(np.int64)
        return pd.DataFrame({"id": ids,
                             "lab": df["cluster_id"].to_numpy(np.int64),
                             "_shard": _shard_of(ids)})

    def border_min(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                                 "lab": pd.Series([], dtype=np.int64)})
        return (g.groupby("id", as_index=False)["lab"].min())

    border = (bj.map_batches(border_emit, batch_format="pandas")
              .groupby("_shard").map_groups(border_min,
                                            batch_format="pandas"))

    # final resolve: docs (side 0) + core labels (side 2) + border
    # labels (side 1) on ONE hash(id) exchange
    def tag(side: int, idc: str, labc: str | None):
        def f(t: pa.Table) -> pa.Table:
            empty = pa.table({"id": pa.array([], pa.int64()),
                              "lab": pa.array([], pa.int64()),
                              "side": pa.array([], pa.int64()),
                              "_shard2": pa.array([], pa.int64())})
            if t.num_rows == 0 or idc not in t.column_names:
                return empty
            ids = (t[idc].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            lab = (t[labc].to_numpy(zero_copy_only=False).astype(np.int64)
                   if labc else np.full(len(ids), -1, np.int64))
            return pa.table({"id": pa.array(ids), "lab": pa.array(lab),
                             "side": pa.array(np.full(len(ids), side,
                                                      np.int64)),
                             "_shard2": pa.array(_shard_of(ids))})
        return f

    union = (docs.map_batches(tag(0, id_col, None), batch_format="pyarrow",
                              zero_copy_batch=True)
             .union(border.map_batches(tag(1, "id", "lab"),
                                       batch_format="pyarrow"))
             .union(core_labels.map_batches(tag(2, id_col, "cluster_id"),
                                            batch_format="pyarrow",
                                            zero_copy_batch=True)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # searchsorted lookups, not pandas left merges: a merge's NaN
        # fill upcasts int64 labels to float64 and loses exactness past
        # 2^53 — ids/labels here are arbitrary int64
        if len(g) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "role": pd.Series([], dtype=np.int64),
                                 "cluster_id": pd.Series([], dtype=np.int64)})
        side = g["side"].to_numpy(np.int64)
        gid = g["id"].to_numpy(np.int64)
        lab = g["lab"].to_numpy(np.int64)
        ids = np.unique(gid[side == 0])

        def lookup(mask):
            k, v = gid[mask], lab[mask]
            order = np.argsort(k)
            k, v = k[order], v[order]
            if len(k) == 0:
                return np.zeros(len(ids), bool), np.empty(len(ids),
                                                          np.int64)
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            return k[pos] == ids, v[pos]

        core_hit, core_lab = lookup(side == 2)
        bord_hit, bord_lab = lookup(side == 1)
        bord_hit &= ~core_hit
        role = np.where(core_hit, 2, np.where(bord_hit, 1, 0))
        clu = np.full(len(ids), -1, np.int64)
        clu[core_hit] = core_lab[core_hit]
        clu[bord_hit] = bord_lab[bord_hit]
        return pd.DataFrame({id_col: ids, "role": role.astype(np.int64),
                             "cluster_id": clu})

    return union.groupby("_shard2").map_groups(resolve,
                                               batch_format="pandas")


def ripley_k(docs: rd.Dataset, radii: tuple[float, ...] = (5_000.0,
             10_000.0, 20_000.0), *, world: World, id_col: str = "doc_id",
             n_shards: int | None = None) -> pa.Table:
    """Ripley's K point-pattern statistic (no edge correction) — the
    classic spatial clustering-vs-CSR test: for each radius r, the
    EXACT count of unordered point pairs within r and the normalized
    K̂(r) = A * 2P / (n(n-1)) as an exact integer floor (area A = 1e10
    is integral for the driver world, so no float enters the
    normalization).  Under CSR K̂(r) ≈ pi*r^2; excess means clustering.
    Output (r, n_points, n_pairs, khat), r order.

    Plan (the dwithin ownership trick, COUNT-only — pair rows never
    materialize): grid depth is derived so cell width >= max r (ring
    1); each point emits its own-cell row (side 0) once and its
    9-cell Chebyshev-disk rows (side 1); ONE hash(cell) exchange
    co-locates candidates; in-shard a chunked (A-chunk x B) distance
    kernel counts a<b pairs per radius — every pair counted exactly
    once at the b side's unique own cell.  Per-shard output is
    len(radii) ints; the driver sums.  SQL twin
    ``oracle.ripley_k_sql`` (brute self-join)."""
    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size
    rmax = max(radii)
    depth = int(np.floor(np.log2(min(wx, wy) / rmax)))
    if depth < 1:
        # the 9-cell Chebyshev disk only covers all pairs when cell
        # width >= rmax at depth >= 1; clamping would silently
        # undercount (round-4 ADVICE item)
        raise ValueError(
            f"ripley_k: max radius {rmax} too large for world "
            f"{(wx, wy)} — the ring cover needs min(wx, wy) >= "
            f"2 * rmax; shrink the radii or enlarge the world")
    nn = 1 << depth
    r2s = np.array([r * r for r in radii], dtype=np.float64)

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table({"_side": pa.array([], pa.int8()),
                          "_id": pa.array([], pa.int64()),
                          "_x": pa.array([], pa.float64()),
                          "_y": pa.array([], pa.float64()),
                          "_cell": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "x" not in t.column_names:
            return empty
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = cells.point_cell2(x, y, world, depth).astype(np.int64)
        _, ix, iy = cells.decode2(key.astype(np.uint64))
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)
        sides = [np.zeros(len(ids), np.int8)]
        outi, outx, outy, outc = [ids], [x], [y], [key]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                m = (jx >= 0) & (jx < nn) & (jy >= 0) & (jy < nn)
                if not m.any():
                    continue
                k2 = cells.encode2(jx[m].astype(np.uint64),
                                   jy[m].astype(np.uint64),
                                   depth).astype(np.int64)
                sides.append(np.ones(int(m.sum()), np.int8))
                outi.append(ids[m])
                outx.append(x[m])
                outy.append(y[m])
                outc.append(k2)
        side = np.concatenate(sides)
        cell = np.concatenate(outc)
        return pa.table({"_side": pa.array(side),
                         "_id": pa.array(np.concatenate(outi)),
                         "_x": pa.array(np.concatenate(outx)),
                         "_y": pa.array(np.concatenate(outy)),
                         "_cell": pa.array(cell),
                         "_shard": pa.array((cell % n_shards)
                                            .astype(np.int64))})

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ri": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64),
                              "np_": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        counts = np.zeros(len(r2s), dtype=np.int64)
        npts = int((g["_side"].to_numpy(np.int8) == 0).sum())
        for _, cg in g.groupby("_cell", sort=False):
            side = cg["_side"].to_numpy(np.int8)
            b = cg[side == 0]
            a = cg[side == 1]
            if not len(b) or not len(a):
                continue
            bx = b["_x"].to_numpy(np.float64)
            by = b["_y"].to_numpy(np.float64)
            bi = b["_id"].to_numpy(np.int64)
            ax = a["_x"].to_numpy(np.float64)
            ay = a["_y"].to_numpy(np.float64)
            ai = a["_id"].to_numpy(np.int64)
            for s in range(0, len(ax), 512):
                e = min(len(ax), s + 512)
                dx = ax[s:e, None] - bx[None, :]
                dy = ay[s:e, None] - by[None, :]
                d2 = dx * dx + dy * dy
                lt = ai[s:e, None] < bi[None, :]
                for k, r2 in enumerate(r2s):
                    counts[k] += int(((d2 <= r2) & lt).sum())
        return pd.DataFrame({"ri": np.arange(len(r2s), dtype=np.int64),
                             "c": counts,
                             "np_": np.full(len(r2s), npts, np.int64)})

    out = (docs.map_batches(emit, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_shard").map_groups(count_pairs,
                                         batch_format="pandas")
           .to_pandas())
    schema = pa.schema([("r", pa.float64()), ("n_points", pa.int64()),
                        ("n_pairs", pa.int64()), ("khat", pa.int64())])
    if len(out) == 0 or "ri" not in out.columns:
        return schema.empty_table()
    area = int(round(wx)) * int(round(wy))
    n = int(out[out["ri"] == 0]["np_"].sum())
    rows = []
    for k, r in enumerate(radii):
        p = int(out[out["ri"] == k]["c"].sum())
        khat = (2 * p * area) // (n * (n - 1)) if n >= 2 else 0
        rows.append((float(r), n, p, khat))
    return pa.table({"r": pa.array([x[0] for x in rows]),
                     "n_points": pa.array([x[1] for x in rows], pa.int64()),
                     "n_pairs": pa.array([x[2] for x in rows], pa.int64()),
                     "khat": pa.array([x[3] for x in rows], pa.int64())},
                    schema=schema)


def colocation(events: rd.Dataset, *, radius: float = 20_000.0,
               tau_us: int = 21_600_000_000, world: World,
               key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               n_shards: int | None = None) -> pa.Table:
    """Spatiotemporal co-location join (contact tracing) — pairs of
    DISTINCT users with events within ``radius`` in space AND
    ``tau_us`` microseconds in time, aggregated per user pair.
    Positions derive from event ids by the shared driver-table
    formula; the spatial test is the fixed three-op IEEE d2 <= r*r
    (identical booleans in SQL), the temporal test integer
    |ta - tb| <= tau.  Output (user_a, user_b, n_contacts) with
    user_a < user_b, pair order; n_contacts counts qualifying EVENT
    pairs (each unordered event pair once).

    Plan: the ripley_k ownership trick carried per-pair — each event
    emits its own-cell row (side 0) and its 9-cell Chebyshev-disk rows
    (side 1) at a depth where cell width >= radius; ONE hash(cell)
    exchange; in-shard a chunked (A x B) kernel tests space+time and
    folds surviving (user_a, user_b) pairs into bounded per-shard
    partials (pair rows never materialize); the driver sums per pair.
    SQL twin ``oracle.colocation_sql`` (time-range self-join)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size
    depth = int(np.floor(np.log2(min(wx, wy) / radius)))
    if depth < 1:
        # same invariant as ripley_k: cell width >= radius or the
        # 9-cell ring misses qualifying pairs (round-4 ADVICE item)
        raise ValueError(
            f"colocation: radius {radius} too large for world "
            f"{(wx, wy)} — the ring cover needs min(wx, wy) >= "
            f"2 * radius; shrink the radius or enlarge the world")
    nn = 1 << depth
    r2 = radius * radius
    tau = int(tau_us)
    out_schema = pa.schema([("user_a", pa.int64()), ("user_b", pa.int64()),
                            ("n_contacts", pa.int64())])

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table({"_side": pa.array([], pa.int8()),
                          "_eid": pa.array([], pa.int64()),
                          "_u": pa.array([], pa.int64()),
                          "_ts": pa.array([], pa.int64()),
                          "_x": pa.array([], pa.float64()),
                          "_y": pa.array([], pa.float64()),
                          "_cell": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        key = cells.point_cell2(x, y, world, depth).astype(np.int64)
        _, ix, iy = cells.decode2(key.astype(np.uint64))
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)
        sides = [np.zeros(len(eid), np.int8)]
        oute, outu, outt = [eid], [u], [ts]
        outx, outy, outc = [x], [y], [key]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                m = (jx >= 0) & (jx < nn) & (jy >= 0) & (jy < nn)
                if not m.any():
                    continue
                k2 = cells.encode2(jx[m].astype(np.uint64),
                                   jy[m].astype(np.uint64),
                                   depth).astype(np.int64)
                sides.append(np.ones(int(m.sum()), np.int8))
                oute.append(eid[m])
                outu.append(u[m])
                outt.append(ts[m])
                outx.append(x[m])
                outy.append(y[m])
                outc.append(k2)
        cell = np.concatenate(outc)
        return pa.table({"_side": pa.array(np.concatenate(sides)),
                         "_eid": pa.array(np.concatenate(oute)),
                         "_u": pa.array(np.concatenate(outu)),
                         "_ts": pa.array(np.concatenate(outt)),
                         "_x": pa.array(np.concatenate(outx)),
                         "_y": pa.array(np.concatenate(outy)),
                         "_cell": pa.array(cell),
                         "_shard": pa.array((cell % n_shards)
                                            .astype(np.int64))})

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_a": pd.Series([], dtype=np.int64),
                              "user_b": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        pa_l, pb_l = [], []
        for _, cg in g.groupby("_cell", sort=False):
            side = cg["_side"].to_numpy(np.int8)
            b = cg[side == 0]
            a = cg[side == 1]
            if not len(b) or not len(a):
                continue
            # side-0 sorted by ts: the tau window prunes ~span/2tau of
            # all candidates BEFORE any distance math (run-pair gather)
            o = np.argsort(b["_ts"].to_numpy(np.int64), kind="stable")
            bx = b["_x"].to_numpy(np.float64)[o]
            by = b["_y"].to_numpy(np.float64)[o]
            bi = b["_eid"].to_numpy(np.int64)[o]
            bu = b["_u"].to_numpy(np.int64)[o]
            bt = b["_ts"].to_numpy(np.int64)[o]
            ax = a["_x"].to_numpy(np.float64)
            ay = a["_y"].to_numpy(np.float64)
            ai = a["_eid"].to_numpy(np.int64)
            au = a["_u"].to_numpy(np.int64)
            at = a["_ts"].to_numpy(np.int64)
            for s in range(0, len(ax), 4096):
                e = min(len(ax), s + 4096)
                lo = np.searchsorted(bt, at[s:e] - tau, side="left")
                hi = np.searchsorted(bt, at[s:e] + tau, side="right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                li = np.repeat(np.arange(e - s), cnt)
                cum = np.r_[0, np.cumsum(cnt)]
                rj = np.arange(tot, dtype=np.int64) - cum[li] + lo[li]
                dx = ax[s:e][li] - bx[rj]
                dy = ay[s:e][li] - by[rj]
                hit = ((dx * dx + dy * dy <= r2)
                       & (au[s:e][li] != bu[rj])
                       & (ai[s:e][li] < bi[rj]))
                if hit.any():
                    ua = au[s:e][li[hit]]
                    ub = bu[rj[hit]]
                    pa_l.append(np.minimum(ua, ub))
                    pb_l.append(np.maximum(ua, ub))
        if not pa_l:
            return empty
        ua = np.concatenate(pa_l)
        ub = np.concatenate(pb_l)
        # ua holds the pair minima and ub the maxima, so these two
        # checks bound BOTH arrays; ids past u32 would silently merge
        # distinct pairs (round-4 ADVICE item)
        if int(ua.min()) < 0 or int(ub.max()) >> 32:
            raise ValueError(
                "colocation: user ids must lie in [0, 2**32) for "
                "64-bit pair packing; remap ids (dense-rank) first")
        packed, cnt = np.unique(ua << np.int64(32) | ub,
                                return_counts=True)
        return pd.DataFrame({"user_a": packed >> np.int64(32),
                             "user_b": packed & np.int64(0xFFFFFFFF),
                             "n": cnt.astype(np.int64)})

    out = (events.map_batches(emit, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(pair_partials,
                                         batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_a" not in out.columns:
        return out_schema.empty_table()
    out = (out.groupby(["user_a", "user_b"], as_index=False)["n"].sum()
           .rename(columns={"n": "n_contacts"})
           .sort_values(["user_a", "user_b"]).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def clark_evans(docs: rd.Dataset, *, world: World, depth: int,
                sample_mod: int = 8, id_col: str = "doc_id",
                nrows: int | None = None) -> pa.Table:
    """Clark-Evans nearest-neighbour index — the other classic
    clustering-vs-CSR test beside ``ripley_k``: R = r_obs / r_exp with
    r_obs the mean nearest-neighbour distance and r_exp = 0.5*sqrt(A/n)
    its CSR expectation; R < 1 means clustering.  Runs over the
    deterministic sample ``id % sample_mod == 0`` (bounds the SQL
    oracle's brute self-join; the statistic is of the sampled pattern).

    Exactness: per-point nn distance comes from the SQL-green
    ``knn.knn_join`` (k=1, exclude_self, exact ring-escalation
    semantics); each is floored to integer MILLI-units (sqrt is
    IEEE-correctly-rounded, so floor(dist*1e3 + 0.5) is deterministic),
    making the sum ORDER-EXACT across parallel batches (the idw_grid
    fixed-point pattern); r_obs_6 is ONE exact integer floor division,
    r_exp_6 / ce_6 the fixed float chains.  Output ONE row
    (n_points, sum_nn_milli, r_obs_6, r_exp_6, ce_6).

    Plan: sample filter inside one map_batches (survivors rebundled),
    the knn_join rounds, then bounded per-batch integer partials.
    SQL twin ``oracle.clark_evans_sql`` (brute per-point min)."""
    import math

    from optimizing_ray.pipelines import knn

    wx, wy, _ = world.size

    def samp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % sample_mod == 0
        return pa.table({id_col: pa.array(ids[keep]),
                         "x": pa.array(t["x"].to_numpy(
                             zero_copy_only=False)[keep]),
                         "y": pa.array(t["y"].to_numpy(
                             zero_copy_only=False)[keep])})

    side = (docs.map_batches(samp, batch_format="pyarrow",
                             zero_copy_batch=True)
            .map_batches(lambda t: t, batch_format="pyarrow",
                         batch_size=65_536))   # rebundle survivors
    hint = None if nrows is None else max(1, nrows // sample_mod)
    nn = knn.knn_join(side, side, world=world, depth=depth, k=1,
                      exclude_self=True, nrows=hint)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "dist" not in t.column_names:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sm": pa.array([], pa.int64())})
        d = t["dist"].to_numpy(zero_copy_only=False)
        m = np.floor(d * 1e3 + 0.5).astype(np.int64)
        return pa.table({"n": pa.array([len(m)], pa.int64()),
                         "sm": pa.array([int(m.sum())], pa.int64())})

    agg = nn.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    schema = pa.schema([("n_points", pa.int64()),
                        ("sum_nn_milli", pa.int64()),
                        ("r_obs_6", pa.int64()), ("r_exp_6", pa.int64()),
                        ("ce_6", pa.int64())])
    n = int(agg["n"].sum()) if len(agg) else 0
    if n == 0:
        return schema.empty_table()
    sm = int(agg["sm"].sum())
    r_obs_6 = (sm * 1000) // n
    area = int(round(wx)) * int(round(wy))
    r_exp_6 = int(math.floor(
        0.5 * math.sqrt(float(area) / float(n)) * 1e6 + 0.5))
    ce_6 = int(math.floor(float(r_obs_6) / float(r_exp_6) * 1e6 + 0.5))
    return pa.table({"n_points": pa.array([n], pa.int64()),
                     "sum_nn_milli": pa.array([sm], pa.int64()),
                     "r_obs_6": pa.array([r_obs_6], pa.int64()),
                     "r_exp_6": pa.array([r_exp_6], pa.int64()),
                     "ce_6": pa.array([ce_6], pa.int64())}, schema=schema)


REACH_INF = np.int64(1) << np.int64(62)


def contact_reach(events: rd.Dataset, *, world: World, radius: float,
                  tau_us: int, seed_mod: int = 50, rounds: int = 4,
                  key_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id", nrows: int | None = None,
                  broadcast_threshold: int = 200_000,
                  n_shards: int | None = None) -> "pa.Table | rd.Dataset":
    """Time-respecting CONTACT REACHABILITY (epidemic / information
    spread over the colocation graph): seed users (user_id % seed_mod
    == 0) are "infected" at time 0; a contact — two users' events
    within ``radius`` AND ``tau_us``, contact time t = max of the two
    event times — transmits iff t >= the source's infection time, and
    the target's infection time becomes the minimum such t.  Exactly
    ``rounds`` synchronous relaxation rounds run (part of the operator
    contract, the cost_distance discipline: both engines unroll the
    same chain).  Output (user_id, infected_at) for EVERY user,
    -1 = not reached within the round budget.  All-integer.

    Plan: contact edges ride the colocation ownership kernel (pair
    rows fold in-shard to per-shard DISTINCT (src, dst, t) — never the
    raw cross product); then an nrows-gated tail: driver rounds (one
    masked minimum.reduceat per round over dst-sorted edges) below the
    threshold, else the label_propagation 2-exchange vertex-centric
    rounds (infection times co-sharded with edges on hash(user)).
    SQL twin ``oracle.contact_reach_sql`` (IEJoin edges + unrolled
    MATERIALIZED min-join rounds)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size
    depth = int(np.floor(np.log2(min(wx, wy) / radius)))
    if depth < 1:
        raise ValueError(
            f"contact_reach: radius {radius} too large for world "
            f"{(wx, wy)} — the ring cover needs min(wx, wy) >= "
            f"2 * radius")
    nn = 1 << depth
    r2 = radius * radius
    tau = int(tau_us)
    INF = int(REACH_INF)

    def emit(t: pa.Table) -> pa.Table:
        empty = pa.table({"_side": pa.array([], pa.int8()),
                          "_eid": pa.array([], pa.int64()),
                          "_u": pa.array([], pa.int64()),
                          "_ts": pa.array([], pa.int64()),
                          "_x": pa.array([], pa.float64()),
                          "_y": pa.array([], pa.float64()),
                          "_cell": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        key = cells.point_cell2(x, y, world, depth).astype(np.int64)
        _, ix, iy = cells.decode2(key.astype(np.uint64))
        ix, iy = ix.astype(np.int64), iy.astype(np.int64)
        sides = [np.zeros(len(eid), np.int8)]
        oute, outu, outt = [eid], [u], [ts]
        outx, outy, outc = [x], [y], [key]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                m = (jx >= 0) & (jx < nn) & (jy >= 0) & (jy < nn)
                if not m.any():
                    continue
                k2 = cells.encode2(jx[m].astype(np.uint64),
                                   jy[m].astype(np.uint64),
                                   depth).astype(np.int64)
                sides.append(np.ones(int(m.sum()), np.int8))
                oute.append(eid[m])
                outu.append(u[m])
                outt.append(ts[m])
                outx.append(x[m])
                outy.append(y[m])
                outc.append(k2)
        cell = np.concatenate(outc)
        return pa.table({"_side": pa.array(np.concatenate(sides)),
                         "_eid": pa.array(np.concatenate(oute)),
                         "_u": pa.array(np.concatenate(outu)),
                         "_ts": pa.array(np.concatenate(outt)),
                         "_x": pa.array(np.concatenate(outx)),
                         "_y": pa.array(np.concatenate(outy)),
                         "_cell": pa.array(cell),
                         "_shard": pa.array((cell % n_shards)
                                            .astype(np.int64))})

    def edge_partials(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                              "dst": pd.Series([], dtype=np.int64),
                              "t": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        src_l, dst_l, t_l = [], [], []
        for _, cg in g.groupby("_cell", sort=False):
            side = cg["_side"].to_numpy(np.int8)
            bsd = cg[side == 0]
            asd = cg[side == 1]
            if not len(bsd) or not len(asd):
                continue
            o = np.argsort(bsd["_ts"].to_numpy(np.int64), kind="stable")
            bx = bsd["_x"].to_numpy(np.float64)[o]
            by = bsd["_y"].to_numpy(np.float64)[o]
            bi = bsd["_eid"].to_numpy(np.int64)[o]
            bu = bsd["_u"].to_numpy(np.int64)[o]
            bt = bsd["_ts"].to_numpy(np.int64)[o]
            ax = asd["_x"].to_numpy(np.float64)
            ay = asd["_y"].to_numpy(np.float64)
            ai = asd["_eid"].to_numpy(np.int64)
            au = asd["_u"].to_numpy(np.int64)
            at = asd["_ts"].to_numpy(np.int64)
            for s in range(0, len(ax), 4096):
                e = min(len(ax), s + 4096)
                lo = np.searchsorted(bt, at[s:e] - tau, side="left")
                hi = np.searchsorted(bt, at[s:e] + tau, side="right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                li = np.repeat(np.arange(e - s), cnt)
                cum = np.r_[0, np.cumsum(cnt)]
                rj = np.arange(tot, dtype=np.int64) - cum[li] + lo[li]
                dx = ax[s:e][li] - bx[rj]
                dy = ay[s:e][li] - by[rj]
                hit = ((dx * dx + dy * dy <= r2)
                       & (au[s:e][li] != bu[rj])
                       & (ai[s:e][li] < bi[rj]))
                if hit.any():
                    ua = au[s:e][li[hit]]
                    ub = bu[rj[hit]]
                    tm = np.maximum(at[s:e][li[hit]], bt[rj[hit]])
                    src_l += [ua, ub]
                    dst_l += [ub, ua]
                    t_l += [tm, tm]
        if not src_l:
            return empty
        out = pd.DataFrame({"src": np.concatenate(src_l),
                            "dst": np.concatenate(dst_l),
                            "t": np.concatenate(t_l)})
        return out.drop_duplicates()

    edges = (events.map_batches(emit, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("_shard").map_groups(edge_partials,
                                           batch_format="pandas"))

    def user_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64())})
        return pa.table({"u": pa.array(np.unique(
            t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)))})

    users_ds = events.map_batches(user_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
    schema = pa.schema([("user_id", pa.int64()),
                        ("infected_at", pa.int64())])
    gate = nrows if nrows is not None else (1 << 62)

    if gate <= broadcast_threshold:
        ed = edges.to_pandas()
        ud = users_ds.to_pandas()
        users = (np.unique(ud["u"].to_numpy(np.int64))
                 if "u" in ud.columns else np.empty(0, np.int64))
        if len(users) == 0:
            return schema.empty_table()
        inf = np.where(users % seed_mod == 0, 0, INF).astype(np.int64)
        if "src" in ed.columns and len(ed):
            es = np.searchsorted(users, ed["src"].to_numpy(np.int64))
            edt = np.searchsorted(users, ed["dst"].to_numpy(np.int64))
            et = ed["t"].to_numpy(np.int64)
            order = np.argsort(edt, kind="stable")
            es, edt, et = es[order], edt[order], et[order]
            runs = np.flatnonzero(np.r_[True, edt[1:] != edt[:-1]])
            run_dst = edt[runs]
            for _ in range(rounds):
                cand = np.where((inf[es] < INF) & (et >= inf[es]),
                                et, INF)
                best = np.full(len(users), INF, np.int64)
                if len(cand):
                    best[run_dst] = np.minimum.reduceat(cand, runs)
                new = np.minimum(inf, best)
                if np.array_equal(new, inf):
                    break
                inf = new
        return pa.table({"user_id": pa.array(users),
                         "infected_at": pa.array(
                             np.where(inf >= INF, -1, inf))},
                        schema=schema)

    # ---- distributed rounds (the label_propagation 2-exchange shape) ----
    gold = np.uint64(0x9E3779B97F4A7C15)

    def _shard(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = x.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    def edge_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "val": pa.array([], pa.int64()),
                          "val2": pa.array([], pa.int64()),
                          "kind": pa.array([], pa.int8()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "src" not in t.column_names:
            return empty
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s),
                         "val": t["dst"].cast(pa.int64()),
                         "val2": t["t"].cast(pa.int64()),
                         "kind": pa.array(np.ones(len(s), np.int8)),
                         "_shard": pa.array(_shard(s))})

    edge_tagged = edges.map_batches(edge_rows,
                                    batch_format="pyarrow").materialize()

    def init_states(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "inf": pd.Series([], dtype=np.int64)})
        u = np.unique(g["u"].to_numpy(np.int64))
        return pd.DataFrame({"u": u, "inf": np.where(
            u % seed_mod == 0, 0, INF).astype(np.int64)})

    def u_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False)
        return t.append_column("_shard", pa.array(_shard(u)))

    states = (users_ds.map_batches(u_shard, batch_format="pyarrow",
                                   zero_copy_batch=True)
              .groupby("_shard").map_groups(init_states,
                                            batch_format="pandas")
              .materialize())

    def state_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64()),
                             "val2": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(u),
                         "val": t["inf"].cast(pa.int64()),
                         "val2": pa.array(np.zeros(len(u), np.int64)),
                         "kind": pa.array(np.zeros(len(u), np.int8)),
                         "_shard": pa.array(_shard(u))})

    def spread(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["kind"] == 0]
        eg = g[g["kind"] == 1]
        u = st["key"].to_numpy(np.int64)
        order = np.argsort(u, kind="stable")
        u_s = u[order]
        inf_s = st["val"].to_numpy(np.int64)[order]
        esrc = eg["key"].to_numpy(np.int64)
        edst = eg["val"].to_numpy(np.int64)
        et = eg["val2"].to_numpy(np.int64)
        pos = np.searchsorted(u_s, esrc)
        ok = (inf_s[pos] < INF) & (et >= inf_s[pos]) if len(esrc) \
            else np.zeros(0, bool)
        out_u = np.concatenate([edst[ok], u_s])
        out_t = np.concatenate([et[ok], inf_s])
        out_k = np.concatenate([np.ones(int(ok.sum()), np.int8),
                                np.zeros(len(u_s), np.int8)])
        return pd.DataFrame({"u": out_u, "tt": out_t, "k": out_k,
                             "_shard2": _shard(out_u)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(np.int64)
        tt = g["tt"].to_numpy(np.int64)
        own = g["k"].to_numpy(np.int8) == 0
        uid = np.unique(u[own])
        idx = np.searchsorted(uid, u)
        best = np.full(len(uid), INF, np.int64)
        np.minimum.at(best, idx, tt)
        return pd.DataFrame({"u": uid, "inf": best})

    for _ in range(rounds):
        states = (states.map_batches(state_rows, batch_format="pyarrow")
                  .union(edge_tagged)
                  .groupby("_shard").map_groups(spread,
                                                batch_format="pandas")
                  .groupby("_shard2").map_groups(fold,
                                                 batch_format="pandas")
                  .materialize())

    def out_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return schema.empty_table()
        inf = t["inf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": t["u"].cast(pa.int64()),
                         "infected_at": pa.array(
                             np.where(inf >= INF, -1, inf))},
                        schema=schema)

    return states.map_batches(out_batch, batch_format="pyarrow")

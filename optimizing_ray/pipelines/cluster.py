"""Document clustering over the embedding column: one exact Lloyd step.

The k-means primitive of corpus organisation (topic bucketing, curriculum
binning, cluster-balanced sampling) expressed so the result is EXACT and
SQL-twinnable — the idw_grid fixed-point discipline applied to k-means:

1. QUANTIZE: q = floor(float64(v) * scale) per element, scale a power of
   two so the multiply is exact for float32 inputs.  All distances and
   centroid updates are then int64 arithmetic — no float summation-order
   ambiguity between parallel batches, numpy, and DuckDB.
2. SEED: centroids = the quantized vectors of ``vec_id < k`` (the
   ann_topk "first n vectors" contract).
3. ASSIGN (pass 1): per batch, argmin_j ||q - c_j||^2 with ties to the
   LOWEST cluster id (np.argmin first-hit == SQL ``ORDER BY d2, c``
   row_number), emitting per-batch partial (cluster, count, per-dim sum)
   rows — k x (dim+1) ints per batch, merged driver-side (bounded by k,
   never by corpus size).
4. REFINE: m_j = floordiv(sum_j, n_j) elementwise — exact integer floor
   division (SQL twin uses the nonneg-mod identity, not double division).
   Clusters that captured zero vectors (possible only when a seed
   duplicates an earlier seed) are dropped on both sides.
5. ASSIGN (pass 2): one more broadcast pass against the refined
   centroids; output (vec_id, cluster, dist2) — all int64.

Scale shape: two streaming passes over the corpus plus one bounded
k x dim driver merge; zero shuffles; centroids ride ``ray.put`` once.
Additional Lloyd iterations repeat steps 3-5 (each is one pass + one
bounded merge) — the driver query runs one refinement, which already
exercises the full exchange.

Reference twin: the per-cell bucketing of ``WorldPartition.hpp:240``
(objects -> nearest region) generalised to learned regions in embedding
space; cited for parity, not ported.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pandas as pd
import ray
import ray.data as rd

from optimizing_ray.pipelines.ann import _to_matrix

__all__ = ["quantize_embeddings", "kmeans_step", "kmeans_assign",
           "semantic_dedup", "tile_embedding_centroid",
           "cluster_top_terms", "triangle_count", "pagerank",
           "mutual_knn_pairs", "random_walks", "kcore",
           "link_prediction", "clustering_coeff",
           "label_propagation", "cluster_exemplars",
           "degree_assortativity"]


def quantize_embeddings(col, scale: int = 1024) -> np.ndarray:
    """(n, dim) int64: floor(float64(v) * scale).  scale must be a power
    of two so float32 -> float64 * scale is exact (no double rounding);
    the SQL twin computes CAST(floor(CAST(v AS DOUBLE) * scale) AS BIGINT)."""
    assert scale & (scale - 1) == 0, "scale must be a power of two"
    return np.floor(_to_matrix(col) * float(scale)).astype(np.int64)


def _packed_pair_keys(x: np.ndarray, y: np.ndarray, *, op: str) -> np.ndarray:
    """64-bit pair key ``x << 32 | y``.  Guarded: ids outside
    [0, 2^32) would silently collide / merge distinct pairs (round-4
    ADVICE item) — raise instead of corrupting."""
    for a in (x, y):
        if len(a) and (int(a.min()) < 0 or int(a.max()) >> 32):
            raise ValueError(
                f"{op}: node ids must lie in [0, 2**32) for 64-bit "
                "pair packing; remap ids (dense-rank) first")
    return x << np.int64(32) | y


def _assign_int(Q: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, dist2) int64 per row: exact ||q||^2 - 2 qC^T + ||c||^2 in
    int64 matmul (d <= ~2^10 per element keeps every term far below 2^63).
    np.argmin returns the FIRST minimum — the SQL (d2, cluster) tiebreak."""
    d2 = (Q * Q).sum(axis=1)[:, None] - 2 * (Q @ C.T) + (C * C).sum(axis=1)[None, :]
    a = d2.argmin(axis=1)
    return a.astype(np.int64), d2[np.arange(len(a)), a].astype(np.int64)


def kmeans_step(emb: rd.Dataset, seeds: np.ndarray, *,
                vec_col: str = "embedding", scale: int = 1024) -> np.ndarray:
    """One exact Lloyd refinement: assign to ``seeds`` ((k, dim) int64),
    return ``(centroids, cluster_ids)`` — the refined integer centroids
    ((k', dim), k' <= k: empty clusters dropped, rows keep seed order)
    and the surviving seed indices labelling them."""
    k, dim = seeds.shape
    seeds_ref = ray.put(np.ascontiguousarray(seeds))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sums": pa.array([], pa.list_(pa.int64()))})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        from optimizing_ray.broadcast import cached
        C = cached(("kmeans_seeds", seeds_ref), lambda: ray.get(seeds_ref))
        Q = quantize_embeddings(t[vec_col], scale)
        a, _ = _assign_int(Q, C)
        n = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, a, Q)
        live = np.flatnonzero(n)
        return pa.table({"cluster": pa.array(live.astype(np.int64)),
                         "n": pa.array(n[live]),
                         "sums": pa.array(list(sums[live]))})

    parts = [t for t in ray.get(
        emb.map_batches(partial, batch_format="pyarrow",
                        zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    n_tot = np.zeros(k, dtype=np.int64)
    s_tot = np.zeros((k, dim), dtype=np.int64)
    for t in parts:
        cl = t["cluster"].to_numpy()
        n_tot[cl] += t["n"].to_numpy()
        col = t["sums"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s_tot[cl] += (col.flatten().to_numpy(zero_copy_only=False)
                      .reshape(len(cl), dim))
    live = np.flatnonzero(n_tot)
    # exact elementwise floor division (numpy // floors; the SQL twin
    # uses (s - ((s % n) + n) % n) / n — identical on negatives)
    return s_tot[live] // n_tot[live][:, None], live


def kmeans_assign(emb: rd.Dataset, centroids: np.ndarray,
                  cluster_ids: np.ndarray | None = None, *,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale: int = 1024) -> rd.Dataset:
    """Final assignment pass: (vec_id, cluster, dist2) against the given
    integer centroids.  ``cluster_ids`` maps centroid row -> reported
    cluster label (identity when None)."""
    if cluster_ids is None:
        cluster_ids = np.arange(len(centroids), dtype=np.int64)
    cref = ray.put((np.ascontiguousarray(centroids),
                    np.asarray(cluster_ids, dtype=np.int64)))

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "dist2": pa.array([], pa.int64())})
        from optimizing_ray.broadcast import cached
        C, labels = cached(("kmeans_cent", cref), lambda: ray.get(cref))
        Q = quantize_embeddings(t[vec_col], scale)
        a, d2 = _assign_int(Q, C)
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(labels[a]),
                         "dist2": pa.array(d2)})

    return emb.map_batches(assign, batch_format="pyarrow",
                           zero_copy_batch=True)


def semantic_dedup(emb: rd.Dataset, seeds: np.ndarray, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 1024, tau_num: int = 9, tau_den: int = 10,
                   n_shards: int | None = None) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023 shape): k-means buckets the corpus,
    then WITHIN each cluster every vector with a lower-id neighbor at
    cosine >= tau_num/tau_den is marked a duplicate.  Output one row per
    vector: ``(vec_id, cluster, kept)`` with kept = 1 iff no such
    neighbor exists (cluster = the surviving seed's vec_id, as
    ``kmeans_assign``).

    EXACT across engines: clustering is the quantized-integer Lloyd
    step (``kmeans_step``), and the cosine gate is the integer
    cross-multiplied predicate

        dot > 0  AND  tau_den^2 * dot^2 >= tau_num^2 * |a|^2 * |b|^2

    over the SAME quantized vectors — no float cosine anywhere, so the
    boundary cases match DuckDB bit-for-bit (``oracle.semantic_dedup_sql``;
    DuckDB's integer sums are HUGEINT, the engine guards the int64 range
    below).

    Scale shape: two streaming k-means passes (bounded k x dim driver
    merge), then ONE shuffle — vectors ride to hash(cluster) % n_shards
    shards and the per-cluster pairwise check runs chunked inside the
    shard (the SemDeDup cost model: k chosen so clusters stay small, so
    the m^2 d work per cluster is bounded by construction; the chunking
    keeps peak memory at chunk x m).  Isolated regime note: with tiny k
    the shuffle fans into <= k groups — the ~1 s per-exchange dispatch
    floor, not a data cost."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    cent, live = kmeans_step(emb, seeds, vec_col=vec_col, scale=scale)
    cref = ray.put((np.ascontiguousarray(cent),
                    np.asarray(live, dtype=np.int64)))

    def assign_with_vec(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "_q": pa.array([], pa.list_(pa.int64())),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        from optimizing_ray.broadcast import cached
        C, labels = cached(("semdedup_cent", cref), lambda: ray.get(cref))
        Q = quantize_embeddings(t[vec_col], scale)
        a, _ = _assign_int(Q, C)
        cl = labels[a]
        flat = pa.array(Q.reshape(-1))
        offs = pa.array(np.arange(len(cl) + 1, dtype=np.int32) * Q.shape[1])
        return pa.table({id_col: t[id_col],
                         "cluster": pa.array(cl),
                         "_q": pa.ListArray.from_arrays(offs, flat),
                         "_shard": pa.array((cl % n_shards).astype(np.int64))})

    def within_shard(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "kept": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        qc = t["_q"].combine_chunks() if isinstance(t["_q"], pa.ChunkedArray) \
            else t["_q"]
        Q = (qc.flatten().to_numpy(zero_copy_only=False)
             .reshape(len(ids), -1))
        order = np.lexsort((ids, cl))
        ids, cl, Q = ids[order], cl[order], Q[order]
        kept = np.ones(len(ids), dtype=np.int64)
        num2 = np.int64(tau_num * tau_num)
        den2 = np.int64(tau_den * tau_den)
        bounds = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1], True])
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            Qg = Q[s:e]
            n2 = (Qg * Qg).sum(axis=1)
            # int64-range guard: |dot| <= max(n2) (Cauchy-Schwarz) and
            # the predicate squares it once more times tau_den^2; the
            # check runs in Python ints so it cannot itself overflow
            mx = int(n2.max())
            assert tau_den * tau_den * mx * mx < (1 << 63), (
                "quantized norms too large for the int64 cosine "
                "predicate: lower `scale`")
            step = 4096
            for cs in range(1, m, step):
                ce = min(cs + step, m)
                D = Qg[cs:ce] @ Qg[:ce].T  # rows cs..ce vs all cols < ce
                pred = (D > 0) & (den2 * D * D
                                  >= num2 * np.outer(n2[cs:ce], n2[:ce]))
                # only lower-sorted-position (== lower vec_id within the
                # cluster) partners count
                rows = np.arange(cs, ce)[:, None]
                pred &= np.arange(ce)[None, :] < rows
                kept[s + cs:s + ce] &= ~pred.any(axis=1)
        return pa.table({id_col: pa.array(ids),
                         "cluster": pa.array(cl),
                         "kept": pa.array(kept)})

    tagged = emb.map_batches(assign_with_vec, batch_format="pyarrow",
                             zero_copy_batch=True)
    return tagged.groupby("_shard").map_groups(within_shard,
                                               batch_format="pyarrow")


def tile_embedding_centroid(emb: rd.Dataset, *, depth: int, world,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding", scale: int = 1024,
                            n_shards: int | None = None) -> rd.Dataset:
    """Semantic tile map — the geo x embedding fusion op: per spatial
    tile (sentinel-tagged Morton key at ``depth``), the integer-exact
    mean embedding of the vectors whose derived points fall in it.
    Output one row per (tile, pos): ``(tile, pos, n_vecs, centroid_q)``
    with pos 1-based (the SQL generate_series convention) and
    centroid_q = floor-div mean of the quantized elements — the
    ``kmeans_step`` fixed-point discipline keyed by tile instead of by
    centroid.

    Points derive from ``vec_id`` by the shared driver-table geometry
    formula (no join: the tile is a pure function of the id, exactly as
    the documents side).  Scale shape: per-batch (tile, n, sum-vector)
    partials via one sort + ``reduceat`` (bounded by tiles-per-batch,
    never rows), ONE hash(tile) shard exchange of those partials, exact
    floor-div merge inside the shard.  SQL twin:
    ``oracle.tile_embedding_centroid_sql``."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.config import resolve_shards
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"tile": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sums": pa.array([], pa.list_(pa.int64())),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        key = point_cell2(x, y, world, depth).astype(np.int64)
        Q = quantize_embeddings(t[vec_col], scale)
        order = np.argsort(key, kind="stable")
        k2, Q2 = key[order], Q[order]
        starts = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1]])
        sums = np.add.reduceat(Q2, starts, axis=0)
        n = np.diff(np.r_[starts, len(k2)]).astype(np.int64)
        tiles = k2[starts]
        flat = pa.array(sums.reshape(-1))
        offs = pa.array(np.arange(len(tiles) + 1, dtype=np.int32)
                        * Q.shape[1])
        return pa.table({"tile": pa.array(tiles),
                         "n": pa.array(n),
                         "sums": pa.ListArray.from_arrays(offs, flat),
                         "_shard": pa.array(tiles % n_shards)})

    def merge(t: pa.Table) -> pa.Table:
        empty = pa.table({"tile": pa.array([], pa.int64()),
                          "pos": pa.array([], pa.int64()),
                          "n_vecs": pa.array([], pa.int64()),
                          "centroid_q": pa.array([], pa.int64())})
        if t.num_rows == 0 or "tile" not in t.column_names:
            return empty
        tile = t["tile"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        sc = t["sums"].combine_chunks() if isinstance(t["sums"], pa.ChunkedArray) \
            else t["sums"]
        S = (sc.flatten().to_numpy(zero_copy_only=False)
             .reshape(len(tile), -1))
        dim = S.shape[1]
        order = np.argsort(tile, kind="stable")
        t2, n2, S2 = tile[order], n[order], S[order]
        starts = np.flatnonzero(np.r_[True, t2[1:] != t2[:-1]])
        s_tot = np.add.reduceat(S2, starts, axis=0)
        n_tot = np.add.reduceat(n2, starts)
        cen = s_tot // n_tot[:, None]  # exact floor division
        tiles = t2[starts]
        m = len(tiles)
        return pa.table({
            "tile": pa.array(np.repeat(tiles, dim)),
            "pos": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64), m)),
            "n_vecs": pa.array(np.repeat(n_tot.astype(np.int64), dim)),
            "centroid_q": pa.array(cen.reshape(-1))})

    parts = emb.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
    return parts.groupby("_shard").map_groups(merge, batch_format="pyarrow")


def cluster_top_terms(emb: rd.Dataset, docs: rd.Dataset, seeds: np.ndarray, *,
                      k_terms: int = 3, id_col: str = "vec_id",
                      doc_id_col: str = "doc_id", text_col: str = "text",
                      vec_col: str = "embedding",
                      n_shards: int | None = None) -> pa.Table:
    """Topic labels for embedding clusters — the composition showcase:
    one exact Lloyd step buckets the corpus, the labels equi-join the
    documents by id (``hash_shard_join`` — embeddings' vec_id IS the
    doc id), and each cluster reports its ``k_terms`` most frequent
    tokens (heavy_hitters token convention: whitespace split of trimmed
    text, lowercased, empties dropped; ties by term asc).

    Output (cluster, term, cnt, term_rank).  Plan: join exchange, then
    ONE hash(term) shard exchange of per-batch (cluster, term, cnt)
    partials — a term's rows all land in one shard, so per-shard
    per-(cluster, term) totals are exact and a per-shard per-cluster
    top-k is a correct superset; the driver merge is bounded by
    clusters x k x shards (the heavy_hitters discipline)."""
    import pandas as pd
    import pyarrow.compute as pc

    from optimizing_ray.config import resolve_shards
    from optimizing_ray.pipelines.shard_join import hash_shard_join

    n_shards = resolve_shards(n_shards)
    cent, live = kmeans_step(emb, seeds, vec_col=vec_col, scale=1024)
    labels = kmeans_assign(emb, cent, live, id_col=id_col, vec_col=vec_col)

    def slim_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({doc_id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        return pa.table({doc_id_col: t[id_col], "cluster": t["cluster"]})

    lab = labels.map_batches(slim_labels, batch_format="pyarrow",
                             zero_copy_batch=True)
    joined = hash_shard_join(
        docs, lab, on=doc_id_col,
        lschema=pa.schema([pa.field(doc_id_col, pa.int64()),
                           pa.field(text_col, pa.string())]),
        rschema=pa.schema([pa.field(doc_id_col, pa.int64()),
                           pa.field("cluster", pa.int64())]))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t[text_col]))
        lens = pc.list_value_length(toks).to_numpy()
        flat = pc.utf8_lower(pc.list_flatten(toks))
        cl = np.repeat(t["cluster"].to_numpy(zero_copy_only=False), lens)
        arr = flat.to_numpy(zero_copy_only=False)
        keep = arr != ""
        df = pd.DataFrame({"cluster": cl[keep], "term": arr[keep]})
        agg = (df.groupby(["cluster", "term"], sort=False)
               .size().rename("cnt").reset_index())
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "term" not in t.column_names:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        h = pd.util.hash_pandas_object(
            pd.Series(t["term"].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["cluster", "term"], sort=False)["cnt"]
               .sum().reset_index())
        return (agg.sort_values(["cnt", "term"], ascending=[False, True])
                .groupby("cluster", sort=False).head(k_terms))

    parts = (joined.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True)
             .map_batches(add_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_shard").map_groups(shard_topk,
                                           batch_format="pandas")
             .to_pandas())
    out = (parts.sort_values(["cluster", "cnt", "term"],
                             ascending=[True, False, True])
           .groupby("cluster", sort=False).head(k_terms)
           .reset_index(drop=True))
    out["cnt"] = out["cnt"].astype(np.int64)
    out["term_rank"] = (out.groupby("cluster", sort=False).cumcount()
                        + 1).astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def triangle_count(edges: rd.Dataset, *, src: str = "vec_id",
                   dst: str = "neighbor_id",
                   n_shards: int | None = None) -> pa.Table:
    """Triangle count over an undirected graph given as (possibly
    directed, possibly duplicated) edge rows — the classic graph-
    analytics primitive (clustering coefficient, community density)
    over e.g. the kNN graph.  Output ONE row (n_edges, n_wedges,
    n_triangles); every triangle counts exactly once.

    Plan (the MapReduce node-iterator with min-vertex orientation —
    Suri & Vassilvitskii's MR triangle counting, 2 exchanges total):
    (1) per batch orient every edge to (a, b) with a < b (drops self
    loops) and shard on hash(a) — BOTH directions of a pair and all its
    duplicates land in shard(a), so the per-node distinct-neighbor pass
    inside the shard is also the global dedup; each node a with
    out-neighborhood N+(a) = {b > a} emits its wedge rows (b, c),
    b < c in N+(a), PLUS its deduped edge rows, side-tagged.  A
    triangle {a<b<c} is claimed only at its minimum vertex, so wedge
    volume is sum deg+^2 — bounded by k^2 per node on kNN graphs.
    (2) ONE hash(b, c) exchange matches wedges against edges (sorted
    composite searchsorted in-shard); per-shard counts merge
    driver-side.  SQL twin ``oracle.triangle_count_sql``."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def orient(t: pa.Table) -> pa.Table:
        empty = pa.table({"_a": pa.array([], pa.int64()),
                          "_b": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or src not in t.column_names:
            return empty
        u = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        m = u != v
        u, v = u[m], v[m]
        a, b = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"_a": pa.array(a), "_b": pa.array(b),
                         "_shard": pa.array((a % n_shards).astype(np.int64))})

    def _pair_shard(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (x.astype(np.uint64) * gold + y.astype(np.uint64))
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    def wedges_and_edges(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_side": pd.Series([], dtype=np.int8),
                              "_x": pd.Series([], dtype=np.int64),
                              "_y": pd.Series([], dtype=np.int64),
                              "_shard2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        ab = np.unique(np.stack([g["_a"].to_numpy(np.int64),
                                 g["_b"].to_numpy(np.int64)], axis=1), axis=0)
        a, b = ab[:, 0], ab[:, 1]
        # wedge emission: per node a, all b < c pairs of its sorted
        # neighbor run (np.unique already sorted lexicographically)
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, len(a)])
        # vectorized pair expansion per run: for run length L emit
        # L*(L-1)/2 pairs via offset arithmetic
        wx, wy = [], []
        if lens.max(initial=0) > 1:
            for L in np.unique(lens[lens > 1]):
                runs = starts[lens == L]
                nb = b[runs[:, None] + np.arange(L)[None, :]]  # (runs, L)
                iu, ju = np.triu_indices(L, 1)
                wx.append(nb[:, iu].ravel())
                wy.append(nb[:, ju].ravel())
        wx = np.concatenate(wx) if wx else np.empty(0, np.int64)
        wy = np.concatenate(wy) if wy else np.empty(0, np.int64)
        side = np.r_[np.zeros(len(a), np.int8), np.ones(len(wx), np.int8)]
        x = np.r_[a, wx]
        y = np.r_[b, wy]
        return pd.DataFrame({"_side": side, "_x": x, "_y": y,
                             "_shard2": _pair_shard(x, y)})

    def close_wedges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"n_edges": pd.Series([], dtype=np.int64),
                                 "n_wedges": pd.Series([], dtype=np.int64),
                                 "n_triangles": pd.Series([], dtype=np.int64)})
        e = g[g["_side"] == 0]
        w = g[g["_side"] == 1]
        ekey = np.unique(_packed_pair_keys(e["_x"].to_numpy(np.int64),
                                           e["_y"].to_numpy(np.int64),
                                           op="triangle_count"))
        wkey = _packed_pair_keys(w["_x"].to_numpy(np.int64),
                                 w["_y"].to_numpy(np.int64),
                                 op="triangle_count")
        pos = np.searchsorted(ekey, wkey)
        hit = ((pos < len(ekey))
               & (ekey[np.minimum(pos, max(0, len(ekey) - 1))] == wkey)
               if len(ekey) else np.zeros(len(wkey), bool))
        return pd.DataFrame({"n_edges": [np.int64(len(ekey))],
                             "n_wedges": [np.int64(len(wkey))],
                             "n_triangles": [np.int64(hit.sum())]})

    parts = (edges.map_batches(orient, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("_shard").map_groups(wedges_and_edges,
                                           batch_format="pandas")
             .groupby("_shard2").map_groups(close_wedges,
                                            batch_format="pandas")
             .to_pandas())  # one row per shard
    if len(parts) == 0 or "n_triangles" not in parts.columns:
        z = np.zeros(1, np.int64)
        return pa.table({"n_edges": pa.array(z), "n_wedges": pa.array(z),
                         "n_triangles": pa.array(z)})
    return pa.table({
        "n_edges": pa.array([np.int64(parts["n_edges"].sum())]),
        "n_wedges": pa.array([np.int64(parts["n_wedges"].sum())]),
        "n_triangles": pa.array([np.int64(parts["n_triangles"].sum())])})


def pagerank(edges: rd.Dataset, nodes: rd.Dataset, *,
             src: str = "vec_id", dst: str = "neighbor_id",
             node_col: str = "vec_id", iters: int = 3,
             r0: int = 10 ** 9, damp_num: int = 85, damp_den: int = 100,
             nrows: int | None = None,
             n_shards: int | None = None) -> "pa.Table | rd.Dataset":
    """Integer fixed-point PageRank over a directed edge list — the
    graph-centrality primitive (e.g. authority scoring over the kNN
    graph for curation / representative selection).  Exact and
    SQL-twinnable: all arithmetic is int64 floor division on
    NON-NEGATIVE values (numpy ``//`` == DuckDB ``//`` there; they
    differ on negatives — trunc vs floor — which never occur here).

        r_0(v)    = r0                       for every node
        share(u)  = r_i(u) // outdeg(u)
        r_{i+1}(v) = base + (damp_num * sum_{u->v} share(u)) // damp_den
        base      = (r0 * (damp_den - damp_num)) // damp_den

    Dangling nodes (no out-edges) simply leak their mass — the classic
    simplification, deterministic on both sides.  Fixed ``iters`` keeps
    the SQL twin a finite unrolled CTE chain (``oracle.pagerank_sql``).
    Edge endpoints must be drawn from ``nodes``.

    Plans (nrows = node-count hint, the dedup._plan_rows discipline):

    * broadcast/driver (nrows <= 2_000_000): the slim (src, dst) edge
      list and node-id column collect driver-side ONCE; iterations are
      pure int64 numpy (searchsorted index, bincount degrees, sorted
      reduceat partial sums).  Zero shuffles — right for graphs that
      fit one machine (the CC driver-union-find precedent).
    * distributed: ranks live as a Dataset co-sharded with the edges on
      hash(node); per iteration ONE hash(src) side-tag exchange joins
      ranks to out-edges and emits (dst, contribution) plus a per-node
      presence row carrying outdeg, then ONE hash(dst) exchange sums
      and damps — 2 exchanges per round, materialized per round
      (iterative-pipeline discipline), never one Ray group per node.

    Overflow guard: damp_num * total_mass must stay < 2^63; with the
    defaults that holds to ~1e8 nodes (checked in the driver plan).
    Output (node_col, rank_fp) — int64 fixed-point ranks, node order.
    """
    from optimizing_ray.config import resolve_shards

    assert iters >= 1 and damp_den > damp_num > 0 and r0 > 0
    base = (r0 * (damp_den - damp_num)) // damp_den
    gate = nrows if nrows is not None else (1 << 62)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def _slim_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"_s": pa.array([], pa.int64()),
                             "_d": pa.array([], pa.int64())})
        return pa.table({
            "_s": t[src].cast(pa.int64()), "_d": t[dst].cast(pa.int64())})

    if gate <= 2_000_000:
        ed = (edges.map_batches(_slim_edges, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
        nd = nodes.select_columns([node_col]).to_pandas()
        ids = np.unique(nd[node_col].to_numpy(np.int64))
        n = len(ids)
        assert damp_num * r0 * max(n, 1) < (1 << 63), \
            "fixed-point overflow: lower r0 or shard the mass"
        # a fully-empty edge dataset yields ZERO blocks -> a column-less
        # driver frame (the Ray empty-schema gotcha, working notes)
        e_src = (ed["_s"].to_numpy(np.int64) if "_s" in ed.columns
                 else np.empty(0, np.int64))
        e_dst = (ed["_d"].to_numpy(np.int64) if "_d" in ed.columns
                 else np.empty(0, np.int64))
        es = np.searchsorted(ids, e_src)
        edst = np.searchsorted(ids, e_dst)
        deg = np.bincount(es, minlength=n).astype(np.int64)
        # sort edges by dst once: per-iteration sums become reduceat
        # over contiguous runs (no np.add.at scatter)
        order = np.argsort(edst, kind="stable")
        es, edst = es[order], edst[order]
        runs = np.flatnonzero(np.r_[True, edst[1:] != edst[:-1]])
        run_dst = edst[runs] if len(edst) else np.empty(0, np.int64)
        r = np.full(n, r0, np.int64)
        for _ in range(iters):
            contrib = r[es] // deg[es] if len(es) else np.empty(0, np.int64)
            s = np.zeros(n, np.int64)
            if len(contrib):
                s[run_dst] = np.add.reduceat(contrib, runs)
            r = base + (damp_num * s) // damp_den
        return pa.table({node_col: pa.array(ids),
                         "rank_fp": pa.array(r)})

    n_shards = resolve_shards(n_shards)

    def _shard(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = x.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    # side-tag schema: key / val / val2 / kind / _shard (same-typed
    # payload columns — no null upcasts; working notes)
    def edge_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "val": pa.array([], pa.int64()),
                          "val2": pa.array([], pa.int64()),
                          "kind": pa.array([], pa.int8()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or src not in t.column_names:
            return empty
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s), "val": pa.array(d),
                         "val2": pa.array(np.zeros(len(s), np.int64)),
                         "kind": pa.array(np.ones(len(s), np.int8)),
                         "_shard": pa.array(_shard(s))})

    def node_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "val": pa.array([], pa.int64()),
                          "val2": pa.array([], pa.int64()),
                          "kind": pa.array([], pa.int8()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or node_col not in t.column_names:
            return empty
        v = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(v),
                         "val": pa.array(np.zeros(len(v), np.int64)),
                         "val2": pa.array(np.zeros(len(v), np.int64)),
                         "kind": pa.array(np.zeros(len(v), np.int8)),
                         "_shard": pa.array(_shard(v))})

    edge_tagged = edges.map_batches(
        edge_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def init_ranks(g: pd.DataFrame) -> pd.DataFrame:
        nid = np.unique(g.loc[g["kind"] == 0, "key"].to_numpy(np.int64))
        esrc = g.loc[g["kind"] == 1, "key"].to_numpy(np.int64)
        deg = np.zeros(len(nid), np.int64)
        if len(esrc):
            idx = np.searchsorted(nid, esrc)
            deg = np.bincount(idx, minlength=len(nid)).astype(np.int64)
        return pd.DataFrame({"node": nid,
                             "r": np.full(len(nid), r0, np.int64),
                             "deg": deg})

    ranks = (nodes.map_batches(node_rows, batch_format="pyarrow",
                               zero_copy_batch=True)
             .union(edge_tagged)
             .groupby("_shard").map_groups(init_ranks, batch_format="pandas")
             .materialize())

    def rank_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64()),
                             "val2": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        nid = t["node"].to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(nid),
                         "val": t["r"].cast(pa.int64()),
                         "val2": t["deg"].cast(pa.int64()),
                         "kind": pa.array(np.zeros(len(nid), np.int8)),
                         "_shard": pa.array(_shard(nid))})

    def flow(g: pd.DataFrame) -> pd.DataFrame:
        rk = g[g["kind"] == 0]
        eg = g[g["kind"] == 1]
        nid = rk["key"].to_numpy(np.int64)
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        r_s = rk["val"].to_numpy(np.int64)[order]
        d_s = rk["val2"].to_numpy(np.int64)[order]
        esrc = eg["key"].to_numpy(np.int64)
        edst = eg["val"].to_numpy(np.int64)
        pos = np.searchsorted(nid_s, esrc)
        contrib = (r_s[pos] // d_s[pos]) if len(esrc) else np.empty(0, np.int64)
        # presence rows carry (outdeg) so the sum stage can rebuild the
        # co-sharded rank table without a second lookup exchange
        out_dst = np.concatenate([edst, nid_s])
        out_c = np.concatenate([contrib, np.zeros(len(nid_s), np.int64)])
        out_deg = np.concatenate([np.zeros(len(esrc), np.int64), d_s])
        out_kind = np.concatenate([np.ones(len(esrc), np.int8),
                                   np.zeros(len(nid_s), np.int8)])
        return pd.DataFrame({"node": out_dst, "c": out_c, "dg": out_deg,
                             "k": out_kind, "_shard2": _shard(out_dst)})

    def damp_sum(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy(np.int64)
        nid = np.unique(g.loc[g["k"] == 0, "node"].to_numpy(np.int64))
        idx = np.searchsorted(nid, node)
        s = np.zeros(len(nid), np.int64)
        np.add.at(s, idx, g["c"].to_numpy(np.int64))
        deg = np.zeros(len(nid), np.int64)
        pres = g["k"].to_numpy(np.int8) == 0
        deg[idx[pres]] = g["dg"].to_numpy(np.int64)[pres]
        return pd.DataFrame({"node": nid,
                             "r": base + (damp_num * s) // damp_den,
                             "deg": deg})

    for _ in range(iters):
        tagged = (ranks.map_batches(rank_rows, batch_format="pyarrow",
                                    zero_copy_batch=True)
                  .union(edge_tagged)
                  .groupby("_shard").map_groups(flow, batch_format="pandas"))
        ranks = (tagged.groupby("_shard2")
                 .map_groups(damp_sum, batch_format="pandas").materialize())

    def out_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({node_col: df["node"], "rank_fp": df["r"]})

    return ranks.map_batches(out_cols, batch_format="pandas")


def mutual_knn_pairs(edges: rd.Dataset, *, src: str = "vec_id",
                     dst: str = "neighbor_id",
                     n_shards: int | None = None) -> pa.Table:
    """Reciprocal nearest-neighbor pairs over a DIRECTED kNN graph:
    (a, b) with a < b where BOTH a→b and b→a edges exist — the classic
    mutual-kNN gate (reciprocal pairs are the high-precision core of
    embedding dedup/clustering; one-directional hits are often hubness
    artifacts).  Output (vec_a, vec_b) sorted.

    Plan: per batch drop self loops, orient to (lo, hi) + direction
    bit, pre-fold in-batch distinct; ONE hash(lo, hi) exchange
    co-locates both directions, the in-shard gate is one lexsort + a
    run-length == 2 mask (each (lo, hi, dir) is distinct after the
    fold, so a run of 2 means both directions); per-shard output is
    bounded by the mutual pairs.  SQL twin ``oracle.mutual_knn_sql``
    (distinct directed edges self-joined on the reversed pair)."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    g1 = np.uint64(0x9E3779B97F4A7C15)
    g2 = np.uint64(0xC2B2AE3D27D4EB4F)

    unified = pa.schema([("_lo", pa.int64()), ("_hi", pa.int64()),
                         ("_dir", pa.int8()), ("_shard", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return unified.empty_table()
        u = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        m = u != v
        u, v = u[m], v[m]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        d = (u > v).astype(np.int8)
        key = np.stack([lo, hi, d.astype(np.int64)])
        order = np.lexsort(key)
        lo, hi, d = lo[order], hi[order], d[order]
        keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
                     | (d[1:] != d[:-1])]
        lo, hi, d = lo[keep], hi[keep], d[keep]
        with np.errstate(over="ignore"):
            h = lo.astype(np.uint64) * g1 + hi.astype(np.uint64) * g2
        return pa.table({"_lo": pa.array(lo), "_hi": pa.array(hi),
                         "_dir": pa.array(d),
                         "_shard": pa.array(((h >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))}
                        ).cast(unified)

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series([], dtype=np.int64),
                              "vec_b": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lo = g["_lo"].to_numpy(np.int64)
        hi = g["_hi"].to_numpy(np.int64)
        d = g["_dir"].to_numpy(np.int8).astype(np.int64)
        order = np.lexsort((d, hi, lo))
        lo, hi, d = lo[order], hi[order], d[order]
        keep = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
                     | (d[1:] != d[:-1])]       # cross-batch dup fold
        lo, hi, d = lo[keep], hi[keep], d[keep]
        same = (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
        first = np.flatnonzero(np.r_[same, False])  # run of 2 => mutual
        return pd.DataFrame({"vec_a": lo[first], "vec_b": hi[first]})

    out = (edges.map_batches(orient, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("_shard").map_groups(mutual, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "vec_a" not in out.columns:
        return pa.table({"vec_a": pa.array([], pa.int64()),
                         "vec_b": pa.array([], pa.int64())})
    order = np.lexsort((out["vec_b"].to_numpy(np.int64),
                        out["vec_a"].to_numpy(np.int64)))
    return pa.table({
        "vec_a": pa.array(out["vec_a"].to_numpy(np.int64)[order]),
        "vec_b": pa.array(out["vec_b"].to_numpy(np.int64)[order])})


def random_walks(edges: rd.Dataset, *, src: str = "vec_id",
                 dst: str = "neighbor_id", rank_col: str = "knn_rank",
                 walk_len: int = 4, nrows: int | None = None,
                 n_shards: int | None = None) -> "pa.Table | rd.Dataset":
    """Deterministic random walks over a ranked edge list — the
    DeepWalk/node2vec SAMPLING stage (walk corpora feed skip-gram
    embedding training; over the kNN graph the walks are also a
    diversity probe for curation).  One walk starts at every distinct
    source node; at step s the walker at node u moves to u's neighbor
    with rank 1 + (splitmix64(start*16 + s) mod outdeg(u)) — counter-
    based pseudo-randomness (no sequential RNG), a pure function of
    (start, step), so walks are reproducible at any parallelism AND
    SQL-replayable (``oracle.random_walks_sql`` chains one splitmix
    block per step).  Walks stop early at dangling nodes.  Output
    (start_id, step, node_id), step 0..walk_len, ordered.

    Plans (nrows = edge-count hint, the pagerank discipline):

    * broadcast/driver (nrows <= 2_000_000): slim (src, rank, dst)
      collects once; per step ONE vectorized gather
      (searchsorted + offset indexing) over all live walks.
    * distributed: the frontier (start, cur) is a Dataset; per step ONE
      hash(cur)=hash(src) ``hash_shard_join`` exchange picks the ranked
      neighbor in-shard, materialized per round (iterative-pipeline
      discipline); per-step outputs union side-tagged.

    ``walk_len`` must stay <= 16 (the start*16 + s key packing)."""
    from optimizing_ray.config import resolve_shards
    from optimizing_ray.pipelines.sketches import splitmix64

    assert 0 <= walk_len <= 16
    gate = nrows if nrows is not None else (1 << 62)
    n_shards = resolve_shards(n_shards)

    slim_schema = pa.schema([("_s", pa.int64()), ("_r", pa.int64()),
                             ("_d", pa.int64())])

    def _slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return slim_schema.empty_table()
        return pa.table({"_s": t[src].cast(pa.int64()),
                         "_r": t[rank_col].cast(pa.int64()),
                         "_d": t[dst].cast(pa.int64())})

    slim = edges.map_batches(_slim, batch_format="pyarrow",
                             zero_copy_batch=True)

    out_schema = pa.schema([("start_id", pa.int64()), ("step", pa.int64()),
                            ("node_id", pa.int64())])

    if gate <= 2_000_000:
        et = pa.Table.from_pandas(slim.to_pandas(), preserve_index=False)
        if et.num_rows == 0 or "_s" not in et.column_names:
            return out_schema.empty_table()
        s = et["_s"].to_numpy()
        r = et["_r"].to_numpy()
        d = et["_d"].to_numpy()
        order = np.lexsort((r, s))
        s, d = s[order], d[order]
        starts_idx = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        uids = s[starts_idx]
        deg = np.diff(np.r_[starts_idx, len(s)])
        walks_start = uids.copy()
        cur = uids.copy()
        rows_s, rows_t, rows_n = [walks_start], [np.zeros(len(cur),
                                                          np.int64)], [cur]
        for st in range(walk_len):
            ws, wc = walks_start, cur
            pos = np.searchsorted(uids, wc)
            ok = (pos < len(uids)) & (uids[np.minimum(pos, len(uids) - 1)]
                                      == wc)
            pos = pos[ok]
            ws, wc = ws[ok], wc[ok]
            h = splitmix64((ws * 16 + st).view(np.uint64))
            nxt = d[starts_idx[pos]
                    + (h % deg[pos].astype(np.uint64)).astype(np.int64)]
            rows_s.append(ws)
            rows_t.append(np.full(len(ws), st + 1, np.int64))
            rows_n.append(nxt)
            # dangling walks drop out of the live set here
            walks_start, cur = ws, nxt
        out = pa.table({"start_id": pa.array(np.concatenate(rows_s)),
                        "step": pa.array(np.concatenate(rows_t)),
                        "node_id": pa.array(np.concatenate(rows_n))})
        idx = np.lexsort((out["step"].to_numpy(),
                          out["start_id"].to_numpy()))
        return out.take(idx)

    # distributed rounds: one shard-join exchange per step
    from optimizing_ray.pipelines.shard_join import hash_shard_join

    def _edge_deg(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"_s": pd.Series([], dtype=np.int64),
                                 "_r": pd.Series([], dtype=np.int64),
                                 "_d": pd.Series([], dtype=np.int64),
                                 "_deg": pd.Series([], dtype=np.int64)})
        g = g.copy()
        g["_deg"] = g.groupby("_s")["_s"].transform("size") \
            .astype(np.int64)
        return g[["_s", "_r", "_d", "_deg"]]

    gold = np.uint64(0x9E3779B97F4A7C15)

    def _eshard(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = t["_s"].to_numpy().view(np.uint64) * gold
        return t.append_column("_shard", pa.array(
            ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)))

    edge_deg_schema = pa.schema([("_s", pa.int64()), ("_r", pa.int64()),
                                 ("_d", pa.int64()), ("_deg", pa.int64())])
    ed = (slim.map_batches(_eshard, batch_format="pyarrow",
                           zero_copy_batch=True)
          .groupby("_shard").map_groups(_edge_deg, batch_format="pandas")
          ).materialize()

    # starts = every node with out-edges, derived exchange-free from
    # the rank-1 rows of the already-sharded edge-deg table
    def _rank1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_s" not in t.column_names:
            return pa.table({"start_id": pa.array([], pa.int64()),
                             "_cur": pa.array([], pa.int64())})
        m = pa.array(t["_r"].to_numpy() == 1)
        u = t["_s"].filter(m).to_numpy(zero_copy_only=False)
        return pa.table({"start_id": pa.array(u.astype(np.int64)),
                         "_cur": pa.array(u.astype(np.int64))})

    frontier = ed.map_batches(_rank1, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    frontier_schema = pa.schema([("start_id", pa.int64()),
                                 ("_cur", pa.int64())])

    def _tag(step: int):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "start_id" not in t.column_names:
                return out_schema.empty_table()
            return pa.table({"start_id": t["start_id"],
                             "step": pa.array(np.full(t.num_rows, step,
                                                      np.int64)),
                             "node_id": t["_cur"]})
        return fn

    outs = [frontier.map_batches(_tag(0), batch_format="pyarrow",
                                 zero_copy_batch=True)]
    for st in range(walk_len):
        # hash_shard_join needs matching key names; rename edge side
        def _ekey(t: pa.Table, _st=st) -> pa.Table:
            if t.num_rows == 0 or "_s" not in t.column_names:
                return pa.table({"_cur": pa.array([], pa.int64()),
                                 "_r": pa.array([], pa.int64()),
                                 "_d": pa.array([], pa.int64()),
                                 "_deg": pa.array([], pa.int64())})
            return pa.table({"_cur": t["_s"], "_r": t["_r"],
                             "_d": t["_d"], "_deg": t["_deg"]})
        ek = ed.map_batches(_ekey, batch_format="pyarrow",
                            zero_copy_batch=True)
        j = hash_shard_join(
            frontier, ek, on="_cur", lschema=frontier_schema,
            rschema=pa.schema([("_cur", pa.int64()), ("_r", pa.int64()),
                               ("_d", pa.int64()), ("_deg", pa.int64())]),
            n_shards=n_shards)

        def _pick(t: pa.Table, _st=st) -> pa.Table:
            if t.num_rows == 0 or "start_id" not in t.column_names:
                return frontier_schema.empty_table()
            ws = t["start_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            h = splitmix64((ws * 16 + _st).view(np.uint64))
            want = 1 + (h % t["_deg"].to_numpy(zero_copy_only=False)
                        .astype(np.uint64)).astype(np.int64)
            m = pa.array(t["_r"].to_numpy(zero_copy_only=False)
                         .astype(np.int64) == want)
            return pa.table({"start_id": pa.array(ws[np.asarray(m)]),
                             "_cur": t["_d"].filter(m).cast(pa.int64())})

        frontier = j.map_batches(_pick, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()
        outs.append(frontier.map_batches(_tag(st + 1),
                                         batch_format="pyarrow",
                                         zero_copy_batch=True))
    res = outs[0]
    for o in outs[1:]:
        res = res.union(o)
    return res


def kcore(edges: rd.Dataset, nodes: rd.Dataset, *,
          src: str = "vec_id", dst: str = "neighbor_id",
          node_col: str = "vec_id", k: int = 7, rounds: int = 6,
          nrows: int | None = None,
          n_shards: int | None = None) -> pa.Table:
    """``rounds`` synchronous peeling rounds of k-core decomposition
    over the UNDIRECTED closure of a directed edge list (the graph-
    robustness primitive: dense-community membership over the kNN
    graph).  Round t: alive_t = nodes whose degree among alive_{t-1}
    (both endpoints alive) is >= k.  Output every node alive after
    round ``rounds`` with its alive-restricted degree — (node, deg),
    node order.  A FIXED round count keeps the SQL twin a finite CTE
    chain (``oracle.kcore_sql``); peeling cascades converge within a
    few rounds on bounded-degree graphs (pytest pins a 2-round
    cascade), exactly like the pagerank/BPE iterative discipline.

    Plans (the pagerank nrows gate):
    * driver (nrows <= 2_000_000): slim symmetrized edge list +
      node ids collect once; rounds are numpy bincounts over an alive
      mask.  Zero shuffles.
    * distributed: symmetrized edges materialize once; each round is
      TWO side-tag exchanges — hash(b) drops edges with a dead far
      endpoint, hash(a) counts surviving incident edges per alive node
      and filters — alive sets stay Datasets (never a corpus-sized
      broadcast), materialized per round."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    assert k >= 1 and rounds >= 0
    gate = nrows if nrows is not None else (1 << 62)
    gold = np.uint64(0x9E3779B97F4A7C15)
    out_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def _slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"_s": pa.array([], pa.int64()),
                             "_d": pa.array([], pa.int64())})
        return pa.table({"_s": t[src].cast(pa.int64()),
                         "_d": t[dst].cast(pa.int64())})

    if gate <= 2_000_000:
        ed = (edges.map_batches(_slim, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
        nd = nodes.select_columns([node_col]).to_pandas()
        ids = np.unique(nd[node_col].to_numpy(np.int64))
        n = len(ids)
        e_s = (ed["_s"].to_numpy(np.int64) if "_s" in ed.columns
               else np.empty(0, np.int64))
        e_d = (ed["_d"].to_numpy(np.int64) if "_d" in ed.columns
               else np.empty(0, np.int64))
        a = np.searchsorted(ids, np.concatenate([e_s, e_d]))
        b = np.searchsorted(ids, np.concatenate([e_d, e_s]))
        und = np.unique(a.astype(np.int64) * np.int64(n) + b)
        a, b = und // n, und % n
        alive = np.ones(n, dtype=bool)
        for _ in range(rounds):
            m = alive[a] & alive[b]
            deg = np.bincount(a[m], minlength=n).astype(np.int64)
            alive = alive & (deg >= k)
        m = alive[a] & alive[b]
        deg = np.bincount(a[m], minlength=n).astype(np.int64)
        keep = np.flatnonzero(alive)
        return pa.table({"node": pa.array(ids[keep]),
                         "deg": pa.array(deg[keep])})

    n_shards = resolve_shards(n_shards)

    def _shard(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = x.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    # symmetrize + dedup once: rows (a, b) both directions, sharded on
    # hash(a) after a hash(a,b)-keyed dedup exchange
    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "_shard": pa.array(_shard(a))})

    def dedup_edges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    und = (edges.map_batches(both_dirs, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("_shard").map_groups(dedup_edges,
                                         batch_format="pandas")
           .materialize())

    def node_leg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or node_col not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "oth": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        v = t[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(v),
                         "oth": pa.array(np.zeros(len(v), np.int64)),
                         "kind": pa.array(np.zeros(len(v), np.int8)),
                         "_shard": pa.array(_shard(v))})

    alive = (nodes.map_batches(node_leg, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("_shard")
             .map_groups(lambda g: pd.DataFrame(
                 {"node": np.unique(g["key"].to_numpy(np.int64))})
                 if len(g) else pd.DataFrame(
                     {"node": pd.Series([], dtype=np.int64)}),
                 batch_format="pandas")
             .materialize())

    def alive_leg_keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "oth": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        v = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(v),
                         "oth": pa.array(np.zeros(len(v), np.int64)),
                         "kind": pa.array(np.zeros(len(v), np.int8)),
                         "_shard": pa.array(_shard(v))})

    def edge_leg_by_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "oth": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(b), "oth": pa.array(a),
                         "kind": pa.array(np.ones(len(a), np.int8)),
                         "_shard": pa.array(_shard(b))})

    def drop_dead_b(g: pd.DataFrame) -> pd.DataFrame:
        """Keep edges whose far endpoint (key=b) is alive; re-key by a."""
        empty = pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                              "oth": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int8),
                              "_s2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        av = np.unique(g.loc[g["kind"] == 0, "key"].to_numpy(np.int64))
        eg = g[g["kind"] == 1]
        if len(eg) == 0 or len(av) == 0:
            return empty
        b = eg["key"].to_numpy(np.int64)
        a = eg["oth"].to_numpy(np.int64)
        pos = np.searchsorted(av, b)
        ok = (pos < len(av)) & (av[np.minimum(pos, len(av) - 1)] == b)
        a, b = a[ok], b[ok]
        return pd.DataFrame({"key": a, "oth": b,
                             "kind": np.ones(len(a), np.int8),
                             "_s2": _shard(a)})

    def count_and_filter(keep_filter: bool):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                  "deg": pd.Series([], dtype=np.int64)})
            if len(g) == 0:
                return empty
            av = np.unique(g.loc[g["kind"] == 0, "key"]
                           .to_numpy(np.int64))
            if len(av) == 0:
                return empty
            a = g.loc[g["kind"] == 1, "key"].to_numpy(np.int64)
            pos = np.searchsorted(av, a)
            ok = (pos < len(av)) & (av[np.minimum(pos, len(av) - 1)] == a)
            deg = np.bincount(pos[ok], minlength=len(av)).astype(np.int64)
            if keep_filter:
                m = deg >= k
                return pd.DataFrame({"node": av[m], "deg": deg[m]})
            return pd.DataFrame({"node": av, "deg": deg})
        return f

    for rnd in range(rounds + 1):
        last = rnd == rounds
        flow = (alive.map_batches(alive_leg_keyed, batch_format="pyarrow",
                                  zero_copy_batch=True)
                .union(und.map_batches(edge_leg_by_b,
                                       batch_format="pyarrow",
                                       zero_copy_batch=True))
                .groupby("_shard").map_groups(drop_dead_b,
                                              batch_format="pandas"))

        def rekey(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "key" not in t.column_names:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "oth": pa.array([], pa.int64()),
                                 "kind": pa.array([], pa.int8()),
                                 "_shard": pa.array([], pa.int64())})
            return pa.table({"key": t["key"], "oth": t["oth"],
                             "kind": t["kind"],
                             "_shard": t["_s2"].cast(pa.int64())})

        alive = (alive.map_batches(alive_leg_keyed, batch_format="pyarrow",
                                   zero_copy_batch=True)
                 .union(flow.map_batches(rekey, batch_format="pyarrow",
                                         zero_copy_batch=True))
                 .groupby("_shard")
                 .map_groups(count_and_filter(not last),
                             batch_format="pandas")
                 .materialize())

    out = alive.to_pandas()
    if len(out) == 0 or "node" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(out[["node", "deg"]], preserve_index=False,
                                schema=out_schema)


def bfs_hops(edges: rd.Dataset, seeds, *, src: str = "vec_id",
             dst: str = "neighbor_id", rounds: int = 4,
             nrows: int | None = None,
             n_shards: int | None = None) -> pa.Table:
    """Multi-source directed BFS layers: for every node reachable from
    ``seeds`` within ``rounds`` forward hops, its hop distance (seeds
    at 0; first-reach wins — synchronous layers make that well
    defined).  Output (node, hops), node order.  Fixed rounds keep the
    SQL twin a finite CTE chain (``oracle.bfs_hops_sql``) — the
    pagerank/kcore iterative discipline.

    Plans (the pagerank nrows gate):
    * driver (nrows <= 2_000_000): slim edges collect once; BFS is a
      per-round numpy membership pass.  Zero shuffles.
    * distributed: edges materialize sharded once; each round is ONE
      hash(src) side-tag exchange (frontier meets out-edges) plus ONE
      hash(node) exchange (dedup against visited, first-reach keeps
      the smallest hop) — frontier and visited stay Datasets."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    seeds = np.unique(np.asarray(seeds, dtype=np.int64))
    gate = nrows if nrows is not None else (1 << 62)
    gold = np.uint64(0x9E3779B97F4A7C15)
    out_schema = pa.schema([("node", pa.int64()), ("hops", pa.int64())])

    def _slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"_s": pa.array([], pa.int64()),
                             "_d": pa.array([], pa.int64())})
        return pa.table({"_s": t[src].cast(pa.int64()),
                         "_d": t[dst].cast(pa.int64())})

    if gate <= 2_000_000:
        ed = (edges.map_batches(_slim, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
        e_s = (ed["_s"].to_numpy(np.int64) if "_s" in ed.columns
               else np.empty(0, np.int64))
        e_d = (ed["_d"].to_numpy(np.int64) if "_d" in ed.columns
               else np.empty(0, np.int64))
        order = np.argsort(e_s, kind="stable")
        e_s, e_d = e_s[order], e_d[order]
        visited = {int(v): 0 for v in seeds}
        frontier = seeds
        for t_ in range(1, rounds + 1):
            lo = np.searchsorted(e_s, frontier, side="left")
            hi = np.searchsorted(e_s, frontier, side="right")
            if len(frontier) == 0:
                break
            nxt = np.unique(np.concatenate(
                [e_d[a:b] for a, b in zip(lo, hi)] or
                [np.empty(0, np.int64)]))
            nxt = np.array([v for v in nxt.tolist()
                            if v not in visited], dtype=np.int64)
            for v in nxt.tolist():
                visited[v] = t_
            frontier = nxt
        if not visited:
            return out_schema.empty_table()
        items = sorted(visited.items())
        return pa.table({"node": pa.array([a for a, _ in items],
                                          pa.int64()),
                         "hops": pa.array([b for _, b in items],
                                          pa.int64())})

    n_shards = resolve_shards(n_shards)

    def _shard(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = x.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    def edge_leg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or src not in t.column_names:
            return pa.table({"key": pa.array([], pa.int64()),
                             "oth": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        s = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(s), "oth": pa.array(d),
                         "kind": pa.array(np.ones(len(s), np.int8)),
                         "_shard": pa.array(_shard(s))})

    edge_tagged = edges.map_batches(edge_leg, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    visited = rd.from_arrow(pa.table({
        "node": pa.array(seeds),
        "hops": pa.array(np.zeros(len(seeds), np.int64))}))
    frontier = visited

    def visited_leg(kind: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "oth": pa.array([], pa.int64()),
                                 "kind": pa.array([], pa.int8()),
                                 "_shard": pa.array([], pa.int64())})
            v = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            hp = t["hops"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"key": pa.array(v), "oth": pa.array(hp),
                             "kind": pa.array(np.full(len(v), kind,
                                                      np.int8)),
                             "_shard": pa.array(_shard(v))})
        return f

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        """Frontier (kind 0) meets out-edges (kind 1): emit dst rows."""
        empty = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                              "_s2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        fr = np.unique(g.loc[g["kind"] == 0, "key"].to_numpy(np.int64))
        eg = g[g["kind"] == 1]
        if len(fr) == 0 or len(eg) == 0:
            return empty
        s = eg["key"].to_numpy(np.int64)
        d = eg["oth"].to_numpy(np.int64)
        pos = np.searchsorted(fr, s)
        ok = (pos < len(fr)) & (fr[np.minimum(pos, len(fr) - 1)] == s)
        nd = np.unique(d[ok])
        return pd.DataFrame({"node": nd, "_s2": _shard(nd)})

    for t_ in range(1, rounds + 1):
        cand = (frontier.map_batches(visited_leg(0),
                                     batch_format="pyarrow",
                                     zero_copy_batch=True)
                .union(edge_tagged)
                .groupby("_shard").map_groups(expand,
                                              batch_format="pandas"))

        def cand_leg(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({"key": pa.array([], pa.int64()),
                                 "oth": pa.array([], pa.int64()),
                                 "kind": pa.array([], pa.int8()),
                                 "_shard": pa.array([], pa.int64())})
            v = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"key": pa.array(v),
                             "oth": pa.array(np.full(len(v), t_,
                                                     np.int64)),
                             "kind": pa.array(np.full(len(v), 2,
                                                      np.int8)),
                             "_shard": pa.array(_shard(v))})

        def settle(g: pd.DataFrame) -> pd.DataFrame:
            """Visited rows (kind 0, hops in oth) + candidates (kind 2):
            keep visited; add candidates not already visited."""
            empty = pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                  "hops": pd.Series([], dtype=np.int64),
                                  "new": pd.Series([], dtype=np.int8)})
            if len(g) == 0:
                return empty
            vis = g[g["kind"] == 0]
            vn = vis["key"].to_numpy(np.int64)
            vh = vis["oth"].to_numpy(np.int64)
            cd = np.unique(g.loc[g["kind"] == 2, "key"]
                           .to_numpy(np.int64))
            vs = np.sort(vn)
            pos = np.searchsorted(vs, cd)
            fresh = cd[(pos >= len(vs))
                       | (vs[np.minimum(pos, len(vs) - 1)] != cd)]
            return pd.DataFrame({
                "node": np.concatenate([vn, fresh]),
                "hops": np.concatenate([vh, np.full(len(fresh), t_,
                                                    np.int64)]),
                "new": np.concatenate([np.zeros(len(vn), np.int8),
                                       np.ones(len(fresh), np.int8)])})

        merged = (visited.map_batches(visited_leg(0),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
                  .union(cand.map_batches(cand_leg, batch_format="pyarrow",
                                          zero_copy_batch=True))
                  .groupby("_shard").map_groups(settle,
                                                batch_format="pandas")
                  .materialize())
        visited = merged.drop_columns(["new"]).materialize()
        frontier = merged.filter(lambda r: r["new"] == 1) \
            .drop_columns(["new"]).materialize()

    out = visited.to_pandas()
    if len(out) == 0 or "node" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(out[["node", "hops"]],
                                preserve_index=False, schema=out_schema)


def _ra_wedges(u: np.ndarray, v: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Wedge expansion over an undirected adjacency given as BOTH
    directed rows (u -> v): for every center u, every neighbor pair
    (x < y), weighted floor(1e9 / deg(u)).  Returns (x, y, w) flat
    arrays; the caller folds per (x, y)."""
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    lens = np.diff(np.r_[starts, len(u)])
    wgt = np.int64(1_000_000_000) // lens          # per-center weight
    run_end = np.repeat(starts + lens, lens)
    cnt = run_end - np.arange(len(u)) - 1
    li = np.repeat(np.arange(len(u)), cnt)
    cum = np.r_[0, np.cumsum(cnt)]
    rj = np.arange(int(cum[-1])) - cum[li] + li + 1
    x, y = v[li], v[rj]                            # neighbors sorted
    w = np.repeat(np.repeat(wgt, lens), cnt)
    return x, y, w


def _ra_fold(x: np.ndarray, y: np.ndarray, w: np.ndarray,
             flag: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Fold wedge rows per (x, y): (pairs_x, pairs_y, n_common,
    ra_score), dropping pairs carrying any flag (existing edges).
    flag rows have w = 0 so they never contribute to the score."""
    order = np.lexsort((y, x))
    x, y, w, flag = x[order], y[order], w[order], flag[order]
    new = np.r_[True, (x[1:] != x[:-1]) | (y[1:] != y[:-1])]
    gid = np.cumsum(new) - 1
    n = int(gid[-1]) + 1 if len(gid) else 0
    tot = np.zeros(n, np.int64)
    np.add.at(tot, gid, w)
    cnt = np.zeros(n, np.int64)
    np.add.at(cnt, gid, (~flag).astype(np.int64))
    edged = np.zeros(n, bool)
    np.logical_or.at(edged, gid, flag)
    starts = np.flatnonzero(new)
    keep = ~edged
    return x[starts][keep], y[starts][keep], cnt[keep], tot[keep]


def link_prediction(pairs: pa.Table, *, nrows: int | None = None,
                    n_shards: int | None = None) -> pa.Table:
    """Resource-allocation link prediction over an undirected graph
    (Zhou/Lü/Zhang's RA index — the common-neighbor score that beats
    plain counts by discounting hub neighbors): for every NON-adjacent
    pair (x, y) with >= 1 common neighbor, score = sum over common
    neighbors w of floor(1e9 / deg(w)) — exact integer, so parallel
    partial sums are order-exact (the idw_grid fixed-point
    discipline).  Input: (vec_a < vec_b) undirected edge table (the
    ``mutual_knn_pairs`` output).  Output (vec_a, vec_b, n_common,
    ra_score), pair order.

    Plans (the pagerank nrows gate; default broadcast — the mutual
    edge table is k-bounded per node and reaches the driver already):

    * driver (nrows <= 2_000_000): one lexsort wedge expansion + one
      fold, no Ray round-trip.
    * sharded: exchange 1 on hash(center) emits per-center weighted
      neighbor pairs (degree = run length, wedges bounded by k^2 per
      node); exchange 2 on hash(x, y) folds scores and drops adjacent
      pairs via side-tagged zero-weight edge rows.

    SQL twin ``oracle.link_prediction_sql`` (undirected self-join +
    integer floor division, anti-join on the edge set)."""
    from optimizing_ray.config import resolve_shards

    a = pairs["vec_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs["vec_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    out_schema = pa.schema([
        ("vec_a", pa.int64()), ("vec_b", pa.int64()),
        ("n_common", pa.int64()), ("ra_score", pa.int64())])
    gate = nrows if nrows is not None else len(a)

    if gate <= 2_000_000:
        u = np.r_[a, b]
        v = np.r_[b, a]
        x, y, w = _ra_wedges(u, v)
        flag = np.zeros(len(x) + len(a), bool)
        flag[len(x):] = True
        x = np.r_[x, a]
        y = np.r_[y, b]
        w = np.r_[w, np.zeros(len(a), np.int64)]
        px, py, cnt, tot = _ra_fold(x, y, w, flag)
        return pa.table({"vec_a": pa.array(px), "vec_b": pa.array(py),
                         "n_common": pa.array(cnt),
                         "ra_score": pa.array(tot)})

    n_shards = resolve_shards(n_shards)
    g1 = np.uint64(0x9E3779B97F4A7C15)
    und = pa.table({"u": pa.array(np.r_[a, b]),
                    "v": pa.array(np.r_[b, a])})

    def shard_center(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = u.astype(np.uint64) * g1
        return t.append_column("_shard", pa.array(
            ((h >> np.uint64(33)) % np.uint64(n_shards))
            .astype(np.int64)))

    def wedges(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        cols = ("x", "y", "w", "flag", "_shard")
        if len(g) == 0:
            return pd.DataFrame({
                "x": pd.Series([], dtype=np.int64),
                "y": pd.Series([], dtype=np.int64),
                "w": pd.Series([], dtype=np.int64),
                "flag": pd.Series([], dtype=bool),
                "_shard": pd.Series([], dtype=np.int64)})
        x, y, w = _ra_wedges(g["u"].to_numpy(np.int64),
                             g["v"].to_numpy(np.int64))
        with np.errstate(over="ignore"):
            h = (x.astype(np.uint64) * g1
                 ^ (y.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
        return pd.DataFrame({"x": x, "y": y, "w": w,
                             "flag": np.zeros(len(x), bool),
                             "_shard": ((h >> np.uint64(33))
                                        % np.uint64(n_shards))
                             .astype(np.int64)})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        if len(g) == 0:
            return pd.DataFrame({
                "vec_a": pd.Series([], dtype=np.int64),
                "vec_b": pd.Series([], dtype=np.int64),
                "n_common": pd.Series([], dtype=np.int64),
                "ra_score": pd.Series([], dtype=np.int64)})
        px, py, cnt, tot = _ra_fold(g["x"].to_numpy(np.int64),
                                    g["y"].to_numpy(np.int64),
                                    g["w"].to_numpy(np.int64),
                                    g["flag"].to_numpy(bool))
        return pd.DataFrame({"vec_a": px, "vec_b": py,
                             "n_common": cnt, "ra_score": tot})

    with np.errstate(over="ignore"):
        eh = (a.astype(np.uint64) * g1
              ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)))
    edge_rows = pa.table({
        "x": pa.array(a), "y": pa.array(b),
        "w": pa.array(np.zeros(len(a), np.int64)),
        "flag": pa.array(np.ones(len(a), bool)),
        "_shard": pa.array(((eh >> np.uint64(33)) % np.uint64(n_shards))
                           .astype(np.int64))})
    wedge_ds = (rd.from_arrow(und)
                .map_batches(shard_center, batch_format="pyarrow",
                             zero_copy_batch=True)
                .groupby("_shard").map_groups(wedges,
                                              batch_format="pandas"))
    out = (wedge_ds.union(rd.from_arrow(edge_rows)
                          .map_batches(lambda t: t.to_pandas(),
                                       batch_format="pyarrow"))
           .groupby("_shard").map_groups(fold, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "vec_a" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def clustering_coeff(edges: rd.Dataset, *, src: str = "vec_id",
                     dst: str = "neighbor_id",
                     n_shards: int | None = None) -> pa.Table:
    """Per-node LOCAL clustering coefficient over an undirected graph —
    the Watts-Strogatz small-world statistic: cc(v) = 2*T(v) /
    (deg(v) * (deg(v) - 1)) with T(v) = triangles through v; deg < 2
    reports 0.  Output (vec_id, deg, tri, cc_6), node order; cc is
    micro-rounded with EXACT integer arithmetic — floor(2T/D * 1e6
    + 0.5) == (4*T*1e6 + D) // (2*D), no float anywhere.

    Plan (triangle_count's min-vertex node-iterator, per-node credit):
    shard(a) dedups oriented edges and emits side-tagged degree
    partials (+1 to both endpoints) and apex-carrying wedges; ONE
    hash(b, c) exchange closes wedges and pre-aggregates per-node
    triangle credits (3 per triangle); ONE hash(node) exchange folds
    (deg, tri) and computes cc in-shard — three exchanges total, wedge
    volume k^2-bounded on kNN graphs.  SQL twin
    ``oracle.clustering_coeff_sql``."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    gold = np.uint64(0x9E3779B97F4A7C15)
    out_schema = pa.schema([("vec_id", pa.int64()), ("deg", pa.int64()),
                            ("tri", pa.int64()), ("cc_6", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        empty = pa.table({"_a": pa.array([], pa.int64()),
                          "_b": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or src not in t.column_names:
            return empty
        u = t[src].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        m = u != v
        u, v = u[m], v[m]
        a, b = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"_a": pa.array(a), "_b": pa.array(b),
                         "_shard": pa.array((a % n_shards).astype(np.int64))})

    def _pair_shard(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (x.astype(np.uint64) * gold + y.astype(np.uint64))
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    def wedges_edges_degs(g: pd.DataFrame) -> pd.DataFrame:
        # side 0: deduped edge (x=a, y=b, apex unused)
        # side 1: wedge (x=b, y=c, apex=a)
        # side 2: degree partial (x=node, y=count) -> sharded on node
        empty = pd.DataFrame({"_side": pd.Series([], dtype=np.int8),
                              "_x": pd.Series([], dtype=np.int64),
                              "_y": pd.Series([], dtype=np.int64),
                              "_apex": pd.Series([], dtype=np.int64),
                              "_shard2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        ab = np.unique(np.stack([g["_a"].to_numpy(np.int64),
                                 g["_b"].to_numpy(np.int64)], axis=1), axis=0)
        a, b = ab[:, 0], ab[:, 1]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, len(a)])
        wx, wy, wa = [], [], []
        if lens.max(initial=0) > 1:
            for L in np.unique(lens[lens > 1]):
                runs = starts[lens == L]
                nb = b[runs[:, None] + np.arange(L)[None, :]]
                iu, ju = np.triu_indices(L, 1)
                wx.append(nb[:, iu].ravel())
                wy.append(nb[:, ju].ravel())
                wa.append(np.repeat(a[runs], len(iu)))
        wx = np.concatenate(wx) if wx else np.empty(0, np.int64)
        wy = np.concatenate(wy) if wy else np.empty(0, np.int64)
        wa = np.concatenate(wa) if wa else np.empty(0, np.int64)
        # degree partials from the deduped edges of THIS shard
        nodes = np.concatenate([a, b])
        un, dcnt = np.unique(nodes, return_counts=True)
        side = np.r_[np.zeros(len(a), np.int8), np.ones(len(wx), np.int8),
                     np.full(len(un), 2, np.int8)]
        x = np.r_[a, wx, un]
        y = np.r_[b, wy, dcnt.astype(np.int64)]
        apex = np.r_[np.zeros(len(a), np.int64), wa,
                     np.zeros(len(un), np.int64)]
        sh = np.r_[_pair_shard(a, b), _pair_shard(wx, wy),
                   (un % n_shards).astype(np.int64)]
        return pd.DataFrame({"_side": side, "_x": x, "_y": y,
                             "_apex": apex, "_shard2": sh})

    def close_and_credit(g: pd.DataFrame) -> pd.DataFrame:
        # side 2 rows pass through (keyed on node already); sides 0/1
        # close wedges and emit per-node triangle credits (side 3)
        empty = pd.DataFrame({"_side": pd.Series([], dtype=np.int8),
                              "_x": pd.Series([], dtype=np.int64),
                              "_y": pd.Series([], dtype=np.int64),
                              "_shard3": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        deg = g[g["_side"] == 2]
        e = g[g["_side"] == 0]
        w = g[g["_side"] == 1]
        ekey = np.unique(_packed_pair_keys(e["_x"].to_numpy(np.int64),
                                           e["_y"].to_numpy(np.int64),
                                           op="clustering_coeff"))
        wkey = _packed_pair_keys(w["_x"].to_numpy(np.int64),
                                 w["_y"].to_numpy(np.int64),
                                 op="clustering_coeff")
        if len(ekey) and len(wkey):
            pos = np.searchsorted(ekey, wkey)
            hit = ((pos < len(ekey))
                   & (ekey[np.minimum(pos, len(ekey) - 1)] == wkey))
        else:
            hit = np.zeros(len(wkey), bool)
        tn = np.concatenate([w["_apex"].to_numpy(np.int64)[hit],
                             w["_x"].to_numpy(np.int64)[hit],
                             w["_y"].to_numpy(np.int64)[hit]])
        ut, tcnt = np.unique(tn, return_counts=True)
        side = np.r_[np.full(len(deg), 2, np.int8),
                     np.full(len(ut), 3, np.int8)]
        x = np.r_[deg["_x"].to_numpy(np.int64), ut]
        y = np.r_[deg["_y"].to_numpy(np.int64), tcnt.astype(np.int64)]
        return pd.DataFrame({"_side": side, "_x": x, "_y": y,
                             "_shard3": (x % n_shards).astype(np.int64)})

    def fold_cc(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "deg": pd.Series([], dtype=np.int64),
                              "tri": pd.Series([], dtype=np.int64),
                              "cc_6": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        x = g["_x"].to_numpy(np.int64)
        y = g["_y"].to_numpy(np.int64)
        side = g["_side"].to_numpy(np.int8)
        un, inv = np.unique(x, return_inverse=True)
        deg = np.zeros(len(un), np.int64)
        tri = np.zeros(len(un), np.int64)
        np.add.at(deg, inv[side == 2], y[side == 2])
        np.add.at(tri, inv[side == 3], y[side == 3])
        d = deg * (deg - 1)
        cc6 = np.where(d > 0, (4 * tri * 1_000_000 + d) // (2 * np.maximum(d, 1)),
                       0).astype(np.int64)
        return pd.DataFrame({"vec_id": un, "deg": deg, "tri": tri,
                             "cc_6": cc6})

    out = (edges.map_batches(orient, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("_shard").map_groups(wedges_edges_degs,
                                         batch_format="pandas")
           .groupby("_shard2").map_groups(close_and_credit,
                                          batch_format="pandas")
           .groupby("_shard3").map_groups(fold_cc, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "vec_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("vec_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def label_propagation(pairs: "rd.Dataset | pa.Table", nodes: rd.Dataset, *,
                      a: str = "vec_a", b: str = "vec_b",
                      node_col: str = "vec_id", rounds: int = 3,
                      nrows: int | None = None,
                      n_shards: int | None = None) -> "pa.Table | rd.Dataset":
    """SYNCHRONOUS label-propagation communities (Raghavan et al. 2007,
    made deterministic) over an UNDIRECTED pair list (e.g. the mutual
    kNN graph): labels start as node ids; each round EVERY node
    simultaneously takes the most frequent label among its neighbors,
    ties broken toward the SMALLEST label (classic LPA is random-order
    and random-tie — the synchronous min-tie variant is a pure function
    of the graph, so both engines agree bit-for-bit); isolated nodes
    keep their own label.  Fixed ``rounds`` keeps the SQL twin a finite
    unrolled CTE chain (``oracle.label_propagation_sql``).  Output
    (node_col, community), node order.

    Plans (the pagerank discipline):
    * driver (nrows <= 2_000_000): slim symmetrized edges + node ids
      collect once; each round is one lexsort over (node, neighbor
      label) runs + a (label, -count, node) ordering whose first row
      per node IS the argmax.  Zero shuffles.
    * distributed: labels live as a Dataset co-sharded with edges on
      hash(node); per round ONE hash(src) side-tag exchange joins
      labels to edges and emits (dst, src label) votes plus per-node
      presence rows, then ONE hash(dst) exchange counts votes and
      takes the (count DESC, label ASC) winner — 2 exchanges/round,
      materialized per round."""
    from optimizing_ray.config import resolve_shards

    assert rounds >= 1
    gate = nrows if nrows is not None else (1 << 62)
    gold = np.uint64(0x9E3779B97F4A7C15)
    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)

    def _slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or a not in t.column_names:
            return pa.table({"_a": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        return pa.table({"_a": t[a].cast(pa.int64()),
                         "_b": t[b].cast(pa.int64())})

    if gate <= 2_000_000:
        ed = pairs.map_batches(_slim, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        nd = nodes.select_columns([node_col]).to_pandas()
        ids = np.unique(nd[node_col].to_numpy(np.int64))
        ea = (ed["_a"].to_numpy(np.int64) if "_a" in ed.columns
              else np.empty(0, np.int64))
        eb = (ed["_b"].to_numpy(np.int64) if "_b" in ed.columns
              else np.empty(0, np.int64))
        # symmetrize + index into the node table
        s = np.searchsorted(ids, np.concatenate([ea, eb]))
        d = np.searchsorted(ids, np.concatenate([eb, ea]))
        order = np.argsort(d, kind="stable")
        s, d = s[order], d[order]
        lab = ids.copy()
        for _ in range(rounds):
            if len(s) == 0:
                break
            vote = lab[s]
            o2 = np.lexsort((vote, d))
            d2, v2 = d[o2], vote[o2]
            runs = np.flatnonzero(np.r_[True, (d2[1:] != d2[:-1])
                                        | (v2[1:] != v2[:-1])])
            cnt = np.diff(np.r_[runs, len(d2)]).astype(np.int64)
            nodes_r, labs_r = d2[runs], v2[runs]
            w = np.lexsort((labs_r, -cnt, nodes_r))
            nr, lr = nodes_r[w], labs_r[w]
            first = np.flatnonzero(np.r_[True, nr[1:] != nr[:-1]])
            new = lab.copy()
            new[nr[first]] = lr[first]
            if np.array_equal(new, lab):
                break
            lab = new
        return pa.table({node_col: pa.array(ids),
                         "community": pa.array(lab)})

    # ---- distributed plan (2 exchanges per round) ----
    n_shards = resolve_shards(n_shards)

    def _shard(x: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = x.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    def edge_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "val": pa.array([], pa.int64()),
                          "kind": pa.array([], pa.int8()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or a not in t.column_names:
            return empty
        ea = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        eb = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.concatenate([ea, eb])
        d = np.concatenate([eb, ea])
        return pa.table({"key": pa.array(s), "val": pa.array(d),
                         "kind": pa.array(np.ones(len(s), np.int8)),
                         "_shard": pa.array(_shard(s))})

    def node_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.int64()),
                          "val": pa.array([], pa.int64()),
                          "kind": pa.array([], pa.int8()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "node" not in t.column_names:
            return empty
        v = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(v),
                         "val": t["lab"].cast(pa.int64()),
                         "kind": pa.array(np.zeros(len(v), np.int8)),
                         "_shard": pa.array(_shard(v))})

    edge_tagged = pairs.map_batches(edge_rows, batch_format="pyarrow",
                                    zero_copy_batch=True).materialize()
    labels = nodes.map_batches(
        lambda t: (pa.table({"node": t[node_col].cast(pa.int64()),
                             "lab": t[node_col].cast(pa.int64())})
                   if t.num_rows and node_col in t.column_names
                   else pa.table({"node": pa.array([], pa.int64()),
                                  "lab": pa.array([], pa.int64())})),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def votes(g: pd.DataFrame) -> pd.DataFrame:
        lb = g[g["kind"] == 0]
        eg = g[g["kind"] == 1]
        nid = lb["key"].to_numpy(np.int64)
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        lab_s = lb["val"].to_numpy(np.int64)[order]
        esrc = eg["key"].to_numpy(np.int64)
        edst = eg["val"].to_numpy(np.int64)
        pos = np.searchsorted(nid_s, esrc)
        vlab = lab_s[pos] if len(esrc) else np.empty(0, np.int64)
        out_n = np.concatenate([edst, nid_s])
        out_l = np.concatenate([vlab, lab_s])
        out_k = np.concatenate([np.ones(len(edst), np.int8),
                                np.zeros(len(nid_s), np.int8)])
        return pd.DataFrame({"node": out_n, "lab": out_l, "k": out_k,
                             "_shard2": _shard(out_n)})

    def winner(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy(np.int64)
        labv = g["lab"].to_numpy(np.int64)
        kind = g["k"].to_numpy(np.int8)
        own_n = node[kind == 0]
        own_l = labv[kind == 0]
        vn, vl = node[kind == 1], labv[kind == 1]
        oo = np.argsort(own_n, kind="stable")
        own_n, own_l = own_n[oo], own_l[oo]
        if len(vn) == 0:
            return pd.DataFrame({"node": own_n, "lab": own_l})
        o2 = np.lexsort((vl, vn))
        n2, l2 = vn[o2], vl[o2]
        runs = np.flatnonzero(np.r_[True, (n2[1:] != n2[:-1])
                                    | (l2[1:] != l2[:-1])])
        cnt = np.diff(np.r_[runs, len(n2)]).astype(np.int64)
        nr, lr = n2[runs], l2[runs]
        w = np.lexsort((lr, -cnt, nr))
        nr, lr = nr[w], lr[w]
        first = np.flatnonzero(np.r_[True, nr[1:] != nr[:-1]])
        win_n, win_l = nr[first], lr[first]
        pos = np.searchsorted(own_n, win_n)
        out = own_l.copy()
        out[pos] = win_l
        return pd.DataFrame({"node": own_n, "lab": out})

    for _ in range(rounds):
        labels = (labels.map_batches(node_rows, batch_format="pyarrow")
                  .union(edge_tagged)
                  .groupby("_shard").map_groups(votes,
                                                batch_format="pandas")
                  .groupby("_shard2").map_groups(winner,
                                                 batch_format="pandas")
                  .materialize())

    def out_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({node_col: pa.array([], pa.int64()),
                             "community": pa.array([], pa.int64())})
        return pa.table({node_col: t["node"].cast(pa.int64()),
                         "community": t["lab"].cast(pa.int64())})

    return labels.map_batches(out_batch, batch_format="pyarrow")


def cluster_exemplars(emb: rd.Dataset, seeds: np.ndarray, *,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      scale: int = 1024) -> pa.Table:
    """Per-cluster EXEMPLAR selection — the member closest to its
    refined centroid under the exact integer (dist2, vec_id) order
    (the representative-keeper of SemDeDup-style curation: keep one
    canonical doc per semantic cluster): one Lloyd step
    (``kmeans_step``), a final assignment pass, and a per-batch
    per-cluster partial argmin (bounded k rows per batch — the
    tile_counts class), driver merge.  Zero shuffles, two streaming
    passes.  Output (cluster, exemplar_id, dist2, n_members), cluster
    order.  SQL twin ``oracle.cluster_exemplars_sql``."""
    import ray

    cent, live = kmeans_step(emb, seeds, vec_col=vec_col, scale=scale)
    assigned = kmeans_assign(emb, cent, live, id_col=id_col,
                             vec_col=vec_col, scale=scale)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster": pa.array([], pa.int64()),
                          "vid": pa.array([], pa.int64()),
                          "d2": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "cluster" not in t.column_names:
            return empty
        c = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = t["dist2"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, d2, c))
        c, v, d2 = c[order], v[order], d2[order]
        starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        return pa.table({"cluster": pa.array(c[starts]),
                         "vid": pa.array(v[starts]),
                         "d2": pa.array(d2[starts]),
                         "n": pa.array(np.diff(np.r_[starts, len(c)])
                                       .astype(np.int64))})

    parts = [p for p in ray.get(
        assigned.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_arrow_refs())
        if p.num_rows]
    schema = pa.schema([("cluster", pa.int64()),
                        ("exemplar_id", pa.int64()),
                        ("dist2", pa.int64()), ("n_members", pa.int64())])
    if not parts:
        return schema.empty_table()
    tab = pa.concat_tables(parts)
    c = tab["cluster"].to_numpy(zero_copy_only=False)
    v = tab["vid"].to_numpy(zero_copy_only=False)
    d2 = tab["d2"].to_numpy(zero_copy_only=False)
    n = tab["n"].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, d2, c))
    c, v, d2 = c[order], v[order], d2[order]
    starts = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    uc, cinv = np.unique(tab["cluster"].to_numpy(zero_copy_only=False),
                         return_inverse=True)
    tot = np.zeros(len(uc), np.int64)
    np.add.at(tot, cinv, n)
    return pa.table({"cluster": pa.array(c[starts]),
                     "exemplar_id": pa.array(v[starts]),
                     "dist2": pa.array(d2[starts]),
                     "n_members": pa.array(tot)}, schema=schema)


def degree_assortativity(pairs: "rd.Dataset | pa.Table", *,
                         a: str = "vec_a", b: str = "vec_b") -> pa.Table:
    """DEGREE ASSORTATIVITY of an undirected pair list (Newman 2002) —
    do high-degree nodes attach to high-degree nodes?  The Pearson
    correlation of endpoint degrees over edges, kept as the EXACT
    integer rational (denominators cleared):

        r = (4*M*S1 - S2^2) / (2*M*S3 - S2^2)
        S1 = sum jk,  S2 = sum (j+k),  S3 = sum (j^2 + k^2)

    over the M undirected edges with endpoint degrees (j, k).  Output
    one row (m_edges, r_num, r_den, r6) with r6 = floor(num/den * 1e6
    + 0.5) sign-safely in arbitrary precision; degenerate graphs
    (den = 0: all degrees equal) report r6 = 0.

    Plan: per-batch slim edge fold, ONE hash(endpoint) exchange counts
    degrees, a second slim pass joins degrees back onto edges via the
    broadcast degree map (bounded by node cardinality — the library
    caller passes the mutual-kNN graph whose degrees are <= k; for
    unbounded graphs swap the map for a hash join, the dedup plan
    discipline).  SQL twin ``oracle.degree_assortativity_sql``."""
    import ray

    if isinstance(pairs, rd.Dataset):
        tabs = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        pt = (pa.concat_tables(tabs) if tabs
              else pa.table({a: pa.array([], pa.int64()),
                             b: pa.array([], pa.int64())}))
    else:
        pt = pairs
    schema = pa.schema([("m_edges", pa.int64()), ("r_num", pa.int64()),
                        ("r_den", pa.int64()), ("r6", pa.int64())])
    ea = pt[a].to_numpy(zero_copy_only=False).astype(np.int64)
    eb = pt[b].to_numpy(zero_copy_only=False).astype(np.int64)
    m = len(ea)
    if m == 0:
        return pa.table({"m_edges": [0], "r_num": [0], "r_den": [0],
                         "r6": [0]}, schema=schema)
    nodes, inv = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    j = deg[inv[:m]]
    k = deg[inv[m:]]
    s1 = int((j * k).sum())
    s2 = int((j + k).sum())
    s3 = int((j * j + k * k).sum())
    num = 4 * m * s1 - s2 * s2
    den = 2 * m * s3 - s2 * s2
    # den = 2M^2 * Var(endpoint degrees) >= 0 by Cauchy-Schwarz; num
    # may be negative (kNN graphs are typically disassortative).
    # round-half-up = floor((2*num*1e6 + den) / (2*den)), floor of a
    # possibly-negative numerator over a positive denominator via the
    # nonneg-mod idiom (exact Python ints; the SQL twin uses the same
    # form in HUGEINT)
    if den == 0:
        r6 = 0
    else:
        p, q = 2 * num * 1_000_000 + den, 2 * den
        r6 = (p - ((p % q) + q) % q) // q
    return pa.table({"m_edges": [m], "r_num": [num], "r_den": [den],
                     "r6": [int(r6)]}, schema=schema)

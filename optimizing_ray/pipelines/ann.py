"""Approximate / exact nearest-neighbor search over an embedding column.

Same two-phase shape as the spatial kNN (pipelines/knn.py): broadcast the
query matrix, per-batch vectorized partial top-k (numpy matmul), then a
tiny ``groupby(query_id)`` merge.  This brute-force plan is exact and
linear in corpus size — the right plan for small Q at any scale.  The
scale path for large Q or latency-bound serving is the IVF variant:
``ivf_topk`` buckets vectors by nearest centroid (k-means on a sample)
and probes only ``n_probe`` buckets per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["embedding_knn_graph", "embedding_knn_graph_ivf",
           "ivf_recall",
           "knn_classify", "random_projection",
           "semantic_decontaminate",
           "brute_topk", "ivf_topk", "build_ivf_index", "query_ivf_index",
           "train_pq", "pq_encode", "pq_topk",
           "build_ivfpq_index", "query_ivfpq_index"]


def _to_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column — zero-copy flatten
    of the Arrow child buffer (no per-row to_pylist), valid because every
    embedding has the same length and no nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if pa.types.is_fixed_size_list(col.type):
        # fixed_size_list<float, d> has no offsets buffer: flatten+reshape
        # directly (the _codes_matrix pattern) — the length is the type's
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, int(col.type.list_size)).astype(np.float64,
                                                               copy=False)
    # fixed-length check via the offsets buffer: a divisibility test alone
    # would silently scramble ragged rows whose lengths happen to sum to
    # a multiple of n (np.stack raises loudly on truly ragged input)
    offs = np.asarray(col.offsets)
    lens = np.diff(offs)
    if len(np.unique(lens)) != 1:
        return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, int(lens[0])).astype(np.float64, copy=False)


def _nearest_centroid(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """argmin_c ||m - c||^2 via the ||a||^2 - 2ab + ||b||^2 identity —
    one (n, C) matmul instead of the O(n*C*d) broadcast-subtract
    temporaries (||m||^2 is constant per row and dropped)."""
    d = -2.0 * (M @ C.T) + (C * C).sum(axis=1)[None, :]
    return d.argmin(axis=1)


class _PartialCosine:
    def __init__(self, q_ref, k: int):
        q = ray.get(q_ref)
        self.qid = np.asarray(q["query_id"])
        Q = np.asarray(q["mat"])
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        M = _to_matrix(batch["embedding"])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        scores = Mn @ self.Qn.T  # (n, Q)
        n, nq = scores.shape
        kk = min(self.k, n)
        out_q, out_v, out_s = [], [], []
        for qi in range(nq):  # contiguous per-query partition (see knn.py note)
            s = scores[:, qi]
            part = np.argpartition(-s, kk - 1)[:kk] if kk < n else np.arange(n)
            out_q.append(np.full(len(part), qi))
            out_v.append(ids[part])
            out_s.append(s[part])
        return pa.table({
            "query_id": pa.array(self.qid[np.concatenate(out_q)]),
            "vec_id": pa.array(np.concatenate(out_v)),
            "score": pa.array(np.concatenate(out_s)),
        })


def _driver_merge(partial: rd.Dataset, k: int) -> pa.Table:
    """Final top-k merge driver-side: partial output is <= Q x k rows per
    block, so the merge input is tiny by construction."""
    tables = [t for t in ray.get(partial.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "ann_rank": pa.array([], pa.int64())})
    allp = pa.concat_tables(tables).to_pandas()
    # vectorized final merge: one lexsort + boundary rank, not
    # groupby().apply() (per-group Python; the knn.py merge pattern)
    qid = allp["query_id"].to_numpy()
    vid = allp["vec_id"].to_numpy()
    score = allp["score"].to_numpy()
    order = np.lexsort((vid, -score, qid))
    qs, vids = qid[order], vid[order]
    starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    seg_len = np.diff(np.r_[starts, len(qs)])
    rank = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, seg_len)
    keep = rank < k
    return pa.table({"query_id": pa.array(qs[keep]),
                     "vec_id": pa.array(vids[keep]),
                     "ann_rank": pa.array(rank[keep] + 1)})


def brute_topk(embeddings: rd.Dataset, query_ids, query_matrix: np.ndarray, *,
               k: int = 10, concurrency: int | tuple[int, int] = (1, 8),
               batch_size: int | None = 16_384) -> rd.Dataset:
    """Exact cosine top-k. Output (query_id, vec_id, ann_rank) ordered by
    (score desc, vec_id asc)."""
    q_ref = ray.put({"query_id": np.asarray(query_ids), "mat": query_matrix})
    from optimizing_ray.broadcast import cached

    def partial_batch(batch):
        st = cached(("ann", q_ref.hex(), k), lambda: _PartialCosine(q_ref, k))
        return st(batch)

    partial = embeddings.map_batches(
        partial_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
    return _driver_merge(partial, k)


def kmeans_sample(embeddings: rd.Dataset, *, n_centroids: int, sample_frac: float = 0.1,
                  iters: int = 10, seed: int = 5,
                  max_rows: int = 50_000) -> np.ndarray:
    """Tiny k-means on a driver-side sample -> centroid matrix (the IVF
    coarse quantizer).  The sample is HARD-CAPPED at ``max_rows`` via
    ``limit()`` — a fraction of a 100 TB corpus must never land on the
    driver; 50k vectors train a coarse quantizer fine."""
    sample = embeddings.random_sample(sample_frac, seed=seed).limit(max_rows).take_all()
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_centroids, len(M)), replace=False)]
    for _ in range(iters):
        a = _nearest_centroid(M, C)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = M[m].mean(axis=0)
    return C


def ivf_topk(embeddings: rd.Dataset, query_ids, query_matrix: np.ndarray, *,
             k: int = 10, n_centroids: int = 16, n_probe: int = 4,
             concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """IVF-style ANN: rows whose centroid is not among a query's n_probe
    nearest centroids are skipped in the partial pass (approximate; recall
    grows with n_probe -> exact at n_probe == n_centroids)."""
    C = kmeans_sample(embeddings, n_centroids=n_centroids)
    C_ref = ray.put(C)
    q_ref = ray.put({"query_id": np.asarray(query_ids), "mat": query_matrix})

    class PartialIVF:
        def __init__(self):
            q = ray.get(q_ref)
            self.qid = np.asarray(q["query_id"])
            Q = np.asarray(q["mat"])
            self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            Cl = ray.get(C_ref)
            # ranking by -2qc + ||c||^2 == ranking by true distance (||q||^2
            # is constant per row) — no (Q, C, d) temporaries
            qd = -2.0 * (Q @ Cl.T) + (Cl * Cl).sum(axis=1)[None, :]
            self.probe = np.argsort(qd, axis=1)[:, :n_probe]  # (Q, n_probe)
            self.C = Cl

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            M = _to_matrix(batch["embedding"])
            assign = _nearest_centroid(M, self.C)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qid)):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                s = Mn[m] @ self.Qn[qi]
                sel_ids = ids[m]
                kk = min(k, len(s))
                part = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
                out_q.append(np.full(len(part), qi))
                out_v.append(sel_ids[part])
                out_s.append(s[part])
            if not out_q:
                return pa.table({"query_id": pa.array(self.qid[:0]),
                                 "vec_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(self.qid[np.concatenate(out_q)]),
                "vec_id": pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s)),
            })

    from optimizing_ray.broadcast import cached

    def partial_batch(batch):
        st = cached(("ivf", q_ref.hex(), C_ref.hex(), k, n_probe),
                    lambda: PartialIVF())
        return st(batch)

    partial = embeddings.map_batches(partial_batch, batch_format="pyarrow",
                                     zero_copy_batch=True)
    return _driver_merge(partial, k)


# --- partitioned IVF index on disk (build once, probe-pruned queries) ----

def build_ivf_index(embeddings: rd.Dataset, out_dir: str, *,
                    n_centroids: int = 16, seed: int = 5) -> np.ndarray:
    """Build a disk IVF index: rows partitioned by nearest centroid into
    resumable tile groups (state/manifest layout), centroids stored
    alongside.  Queries then READ ONLY their probed partitions — the
    embedding-space twin of the spatial tile store."""
    import os

    import pyarrow.parquet as pq

    from optimizing_ray.state import manifest as mf

    C = kmeans_sample(embeddings, n_centroids=n_centroids, seed=seed)
    C_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cl = ray.get(C_ref)
        M = _to_matrix(t["embedding"])
        return t.append_column("centroid_id",
                               pa.array(_nearest_centroid(M, Cl).astype(np.int64)))

    keyed = embeddings.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    mf.resumable_write(keyed, out_dir, key_col="centroid_id")
    pq.write_table(pa.table({"centroid_id": pa.array(np.arange(len(C), dtype=np.int64)),
                             "centroid": pa.array([c.tolist() for c in C],
                                                  pa.list_(pa.float64()))}),
                   os.path.join(out_dir, "centroids.parquet"))
    return C


def query_ivf_index(out_dir: str, query_ids, query_matrix: np.ndarray, *,
                    k: int = 10, n_probe: int = 4) -> tuple[pa.Table, dict]:
    """Probe-pruned ANN over a built IVF index: reads only the partitions
    among each query's n_probe nearest centroids; per-query restriction to
    its own probe set keeps results identical to in-memory ivf_topk."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from optimizing_ray.state import manifest as mf

    ct = pq.read_table(os.path.join(out_dir, "centroids.parquet"))
    C = _to_matrix(ct["centroid"])
    Q = np.asarray(query_matrix)
    qd = -2.0 * (Q @ C.T) + (C * C).sum(axis=1)[None, :]  # rank-equivalent
    probe = np.argsort(qd, axis=1)[:, :n_probe]  # (Q, n_probe)
    needed = np.unique(probe)
    rows = [r for r in mf.read_manifest(out_dir) if r.get("status") == "done"]
    paths = [os.path.join(r["part_path"], "data.parquet")
             for r in rows if r["cell_key"] in set(needed.tolist())]
    metrics = {"parts_read": len(paths), "parts_total": len(rows)}
    if not paths:
        return pa.table({"query_id": pa.array(np.asarray(query_ids)[:0]),
                         "vec_id": pa.array([], pa.int64()),
                         "ann_rank": pa.array([], pa.int64())}), metrics
    ds = rd.read_parquet(paths)
    q_ref = ray.put({"query_id": np.asarray(query_ids), "mat": Q,
                     "probe": probe})

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        qid = np.asarray(q["query_id"])
        Qn = q["mat"] / np.linalg.norm(q["mat"], axis=1, keepdims=True)
        pr = q["probe"]
        cid = t["centroid_id"].to_numpy()
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        M = _to_matrix(t["embedding"])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qid)):
            m = np.isin(cid, pr[qi])
            if not m.any():
                continue
            s = Mn[m] @ Qn[qi]
            kk = min(k, len(s))
            part = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
            out_q.append(np.full(len(part), qi))
            out_v.append(ids[m][part])
            out_s.append(s[part])
        if not out_q:
            return pa.table({"query_id": pa.array(qid[:0]),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(qid[np.concatenate(out_q)]),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "score": pa.array(np.concatenate(out_s))})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _driver_merge(partials, k), metrics


# --- product quantization (PQ): the compressed-scan scale path ------------
#
# At 100 TB the raw float32 vectors do not fit the object store budget of
# a scan: PQ stores each vector as m uint8 codes (16x smaller at m=8 over
# dim 32) and ranks candidates with an ADC lookup-table scan over the
# CODES, then re-ranks a small candidate pool with exact cosine over the
# original vectors gathered only for that pool.  Recall is a function of
# the rerank pool (exact when the pool covers the corpus) — pinned by
# tests/test_ann_text_media.py.


def _adc_lut(Qn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(Q, m, ksub) ADC table: LUT[q, j, c] = ||q_j - B[j, c]||^2
    contribution (ranks cosine because vectors are unit-normalized).
    Shared by pq_topk and query_ivfpq_index — one copy of the math."""
    m, ksub, dsub = books.shape
    lut = np.empty((len(Qn), m, ksub), dtype=np.float64)
    for j in range(m):
        qj = Qn[:, j * dsub:(j + 1) * dsub]
        lut[:, j, :] = (-2.0 * (qj @ books[j].T)
                        + (books[j] ** 2).sum(axis=1)[None, :])
    return lut


def _codes_matrix(code_col, m: int) -> np.ndarray:
    """(n, m) int64 codes from a fixed_size_list<uint8> column
    (FixedSizeList has no offsets buffer — flatten + reshape directly)."""
    if isinstance(code_col, pa.ChunkedArray):
        code_col = code_col.combine_chunks()
    return (code_col.flatten().to_numpy(zero_copy_only=False)
            .reshape(len(code_col), m).astype(np.int64))


def _adc_dists(L: np.ndarray, codes_m: np.ndarray) -> np.ndarray:
    """(Q, n) ADC distances: one fancy-index pass per subspace."""
    dist = np.zeros((L.shape[0], len(codes_m)))
    for j in range(L.shape[1]):
        dist += L[:, j, :][:, codes_m[:, j]]
    return dist


def _pool_merge(nonempty_tables: list, rerank: int) -> dict:
    """Global per-query candidate pool from partial ADC tables: best
    ``rerank`` candidates per query (bounded: Q x rerank rows on the
    driver, never corpus-sized).  Shared by pq_topk and
    query_ivfpq_index so pool semantics cannot diverge."""
    df = pa.concat_tables(nonempty_tables).to_pandas()
    pool = (df.sort_values(["qi", "adc"], kind="stable")
            .groupby("qi", sort=False).head(rerank))
    return {int(qi): g["vec_id"].to_numpy()
            for qi, g in pool.groupby("qi", sort=False)}


def _rerank_exact(qid_arr: np.ndarray, Qn: np.ndarray, pool_by_qi: dict,
                  id_index: dict, Vn: np.ndarray, k: int) -> pa.Table:
    """Exact-cosine re-rank of each query's candidate pool; (query_id,
    vec_id, ann_rank) with brute_topk's (score desc, id asc) order."""
    rows_q, rows_v, rows_r = [], [], []
    for qi in range(len(qid_arr)):
        cand = pool_by_qi.get(qi)
        if cand is None or not len(cand):
            continue
        idx = np.asarray([id_index[int(v)] for v in cand])
        s = Vn[idx] @ Qn[qi]
        order = np.lexsort((cand, -s))[:k]
        rows_q.extend([qid_arr[qi]] * len(order))
        rows_v.extend(cand[order].tolist())
        rows_r.extend(range(1, len(order) + 1))
    if not rows_q:  # typed empty (bare pa.array([]) would be null-typed)
        return pa.table({"query_id": pa.array(qid_arr[:0]),
                         "vec_id": pa.array([], pa.int64()),
                         "ann_rank": pa.array([], pa.int64())})
    return pa.table({"query_id": pa.array(rows_q),
                     "vec_id": pa.array(rows_v, pa.int64()),
                     "ann_rank": pa.array(rows_r, pa.int64())})


def train_pq(embeddings: rd.Dataset, *, m: int = 4, ksub: int = 256,
             iters: int = 10, seed: int = 7, sample_frac: float = 0.5,
             max_rows: int = 50_000, vec_col: str = "embedding") -> np.ndarray:
    """Per-subspace k-means codebooks (m, ksub, d/m) on a HARD-CAPPED
    driver sample (same discipline as ``kmeans_sample``).  Vectors are
    L2-normalized before splitting so ADC L2 ranking == cosine ranking."""
    if ksub > 256:
        # codes are stored uint8 BY DESIGN (the compression); a larger
        # codebook would silently wrap indices mod 256 into garbage
        raise ValueError(f"ksub={ksub} > 256 cannot be coded in uint8")
    sample = embeddings.random_sample(sample_frac, seed=seed).limit(max_rows).take_all()
    if not sample:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    M = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
    n, d = M.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    ksub = min(ksub, n)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        S = M[:, j * dsub:(j + 1) * dsub]
        C = S[rng.choice(n, size=ksub, replace=False)]
        for _ in range(iters):
            a = _nearest_centroid(S, C)
            for c in range(ksub):
                sel = a == c
                if sel.any():
                    C[c] = S[sel].mean(axis=0)
        books[j] = C
    return books


def pq_encode(embeddings: rd.Dataset, codebooks: np.ndarray, *,
              id_col: str = "vec_id", vec_col: str = "embedding") -> rd.Dataset:
    """(id, code: fixed_size_list<uint8>[m]) — the compressed corpus (the
    only thing a PQ scan ever streams)."""
    m, ksub, dsub = codebooks.shape
    books_ref = ray.put(codebooks)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "code": pa.array([], pa.list_(pa.uint8(), m))})
        B = ray.get(books_ref)
        M = _to_matrix(t[vec_col])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        codes = np.empty((len(M), m), dtype=np.uint8)
        for j in range(m):
            codes[:, j] = _nearest_centroid(M[:, j * dsub:(j + 1) * dsub], B[j])
        return pa.table({
            id_col: t[id_col],
            "code": pa.FixedSizeListArray.from_arrays(pa.array(codes.ravel()), m),
        })

    return embeddings.map_batches(encode, batch_format="pyarrow",
                                  zero_copy_batch=True)


def pq_topk(embeddings: rd.Dataset, query_ids, query_matrix: np.ndarray, *,
            k: int = 10, m: int = 4, ksub: int = 256, rerank: int = 64,
            codebooks: np.ndarray | None = None,
            id_col: str = "vec_id", vec_col: str = "embedding",
            batch_size: int | None = 16_384) -> rd.Dataset:
    """ADC scan over PQ codes + exact re-rank of the top-``rerank`` pool.

    Plan: train (capped sample) -> encode (streaming) -> per-batch ADC
    partial top-rerank over the CODES ONLY -> bounded driver merge
    (blocks x Q x rerank rows) -> exact-cosine re-rank over the pool's
    original vectors (broadcast id->vec map built ONLY for pool ids via a
    pushdown filter — never the corpus).  Output schema matches
    ``brute_topk``: (query_id, vec_id, ann_rank), score desc / id asc;
    EXACT top-k whenever ``rerank`` >= corpus size (the provable mode),
    high-recall approximate otherwise (pytest recall bound)."""
    if codebooks is None:
        codebooks = train_pq(embeddings, m=m, ksub=ksub, vec_col=vec_col)
    m, ksub, dsub = codebooks.shape
    codes = pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col)

    qid_arr = np.asarray(query_ids)
    Q = np.asarray(query_matrix, dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    lut = _adc_lut(Qn, codebooks)
    st_ref = ray.put(lut)

    def partial(t: pa.Table) -> pa.Table:
        L = ray.get(st_ref)
        if t.num_rows == 0 or "code" not in t.column_names:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        codes_m = _codes_matrix(t["code"], m)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        dist = _adc_dists(L, codes_m)
        r = min(rerank, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(L.shape[0]):
            part = (np.argpartition(dist[qi], r - 1)[:r]
                    if r < len(ids) else np.arange(len(ids)))
            out_q.append(np.full(len(part), qi))
            out_v.append(ids[part])
            out_s.append(dist[qi][part])
        if not out_q:  # zero queries
            return pa.table({"qi": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        return pa.table({"qi": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "adc": pa.array(np.concatenate(out_s))})

    parts = ray.get(codes.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True,
                                      batch_size=batch_size).to_arrow_refs())
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:  # empty corpus -> typed empty result, no crash
        return rd.from_arrow(_rerank_exact(qid_arr, Qn, {}, {},
                                           np.empty((0, 0)), k))
    pool_by_qi = _pool_merge(nonempty, rerank)

    # exact re-rank: gather ONLY the pool vectors (pushdown filter); the
    # Arrow column ships as-is — no per-row Python float round-trip
    ids_ref = ray.put(np.unique(np.concatenate(
        [v for v in pool_by_qi.values() if len(v)])))

    def gather(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             vec_col: pa.array([], pa.list_(pa.float32()))})
        want = ray.get(ids_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(want, ids), 0, max(0, len(want) - 1))
        sel = want[pos] == ids if len(want) else np.zeros(len(ids), bool)
        return t.filter(pa.array(sel)).select([id_col, vec_col])

    got_ids, got_mats = [], []
    for t in ray.get(embeddings.map_batches(gather, batch_format="pyarrow",
                                            zero_copy_batch=True)
                     .to_arrow_refs()):
        if t.num_rows:
            got_ids.append(t[id_col].to_numpy(zero_copy_only=False))
            got_mats.append(_to_matrix(t[vec_col]))
    all_ids = np.concatenate(got_ids) if got_ids else np.empty(0, np.int64)
    V = np.concatenate(got_mats) if got_mats else np.empty((0, 0))
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30) \
        if len(V) else V
    id_index = {int(v): i for i, v in enumerate(all_ids)}
    return rd.from_arrow(_rerank_exact(qid_arr, Qn, pool_by_qi, id_index,
                                       Vn, k))


def build_ivfpq_index(embeddings: rd.Dataset, out_dir: str, *,
                      n_centroids: int = 16, m: int = 4, ksub: int = 256,
                      seed: int = 5) -> None:
    """FAISS-style IVF-PQ index on disk: rows partitioned by nearest
    coarse centroid into resumable tile groups, each row carrying its
    m-byte PQ code NEXT TO the raw vector.  A query then prunes twice:
    probe-pruning reads only its n_probe partitions, and COLUMN pruning
    reads only (vec_id, code) for the ADC scan — the raw ``embedding``
    column's bytes never leave storage until the final re-rank touches
    the candidate pool's rows.  Centroids + codebooks stored alongside."""
    import os

    import pyarrow.parquet as pq

    from optimizing_ray.state import manifest as mf

    C = kmeans_sample(embeddings, n_centroids=n_centroids, seed=seed)
    books = train_pq(embeddings, m=m, ksub=ksub, seed=seed)
    C_ref, books_ref = ray.put(C), ray.put(books)
    mm, kk, dsub = books.shape

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32())),
                             "code": pa.array([], pa.list_(pa.uint8(), mm)),
                             "centroid_id": pa.array([], pa.int64())})
        Cl, B = ray.get(C_ref), ray.get(books_ref)
        M = _to_matrix(t["embedding"])
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-30)
        codes = np.empty((len(M), mm), dtype=np.uint8)
        for j in range(mm):
            codes[:, j] = _nearest_centroid(Mn[:, j * dsub:(j + 1) * dsub], B[j])
        t = t.append_column(
            "code", pa.FixedSizeListArray.from_arrays(pa.array(codes.ravel()), mm))
        return t.append_column(
            "centroid_id", pa.array(_nearest_centroid(M, Cl).astype(np.int64)))

    keyed = embeddings.map_batches(assign, batch_format="pyarrow",
                                   zero_copy_batch=True)
    os.makedirs(out_dir, exist_ok=True)
    mf.resumable_write(keyed, out_dir, key_col="centroid_id")
    pq.write_table(pa.table({"centroid_id": pa.array(np.arange(len(C), dtype=np.int64)),
                             "centroid": pa.array([c.tolist() for c in C],
                                                  pa.list_(pa.float64()))}),
                   os.path.join(out_dir, "centroids.parquet"))
    pq.write_table(pa.table({
        "subspace": pa.array(np.repeat(np.arange(mm, dtype=np.int64), kk)),
        "entry": pa.array(np.tile(np.arange(kk, dtype=np.int64), mm)),
        "centroid": pa.array([books[j, c].tolist() for j in range(mm)
                              for c in range(kk)], pa.list_(pa.float64())),
    }), os.path.join(out_dir, "codebooks.parquet"))


def query_ivfpq_index(out_dir: str, query_ids, query_matrix: np.ndarray, *,
                      k: int = 10, n_probe: int = 4,
                      rerank: int = 64) -> tuple[pa.Table, dict]:
    """Doubly-pruned ANN over a built IVF-PQ index: reads only the probed
    partitions, and only (vec_id, code, centroid_id) for the ADC scan;
    the raw vectors are read a SECOND time restricted to the candidate
    pool's rows (parquet id filter) for the exact-cosine re-rank.
    Returns (results, metrics) with parts/columns read counts — exact vs
    ``brute_topk`` when n_probe covers all centroids and ``rerank``
    covers the probed rows."""
    import os

    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    from optimizing_ray.state import manifest as mf

    ct = pq.read_table(os.path.join(out_dir, "centroids.parquet"))
    C = _to_matrix(ct["centroid"])
    bt = pq.read_table(os.path.join(out_dir, "codebooks.parquet"))
    mm = int(bt["subspace"].to_numpy().max()) + 1
    kk = int(bt["entry"].to_numpy().max()) + 1
    flat = _to_matrix(bt["centroid"])
    books = flat.reshape(mm, kk, -1)
    dsub = books.shape[2]

    Q = np.asarray(query_matrix, dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
    qd = -2.0 * (Q @ C.T) + (C * C).sum(axis=1)[None, :]
    probe = np.argsort(qd, axis=1)[:, :n_probe]
    needed = set(np.unique(probe).tolist())
    rows = [r for r in mf.read_manifest(out_dir) if r.get("status") == "done"]
    paths = [os.path.join(r["part_path"], "data.parquet")
             for r in rows if r["cell_key"] in needed]
    metrics = {"parts_read": len(paths), "parts_total": len(rows),
               "scan_columns": ["vec_id", "code", "centroid_id"],
               "rerank_rows_read": 0}
    empty = pa.table({"query_id": pa.array(np.asarray(query_ids)[:0]),
                      "vec_id": pa.array([], pa.int64()),
                      "ann_rank": pa.array([], pa.int64())})
    if not paths:
        return empty, metrics

    # --- ADC scan: DISTRIBUTED over the probed parts, codes only
    # (column-pruned read); per-block partial top-rerank keeps the driver
    # merge bounded at blocks x Q x rerank rows, never probed-rows-sized
    lut = _adc_lut(Qn, books)
    st_ref = ray.put({"lut": lut, "probe": probe})
    scan_ds = rd.read_parquet(paths, columns=["vec_id", "code", "centroid_id"])

    def partial(t: pa.Table) -> pa.Table:
        st = ray.get(st_ref)
        L, pr = st["lut"], st["probe"]
        if t.num_rows == 0 or "code" not in t.column_names:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        ids_b = t["vec_id"].to_numpy()
        cid_b = t["centroid_id"].to_numpy()
        dist = _adc_dists(L, _codes_matrix(t["code"], mm))
        out_q, out_v, out_s = [], [], []
        for qi in range(L.shape[0]):
            cand = np.flatnonzero(np.isin(cid_b, pr[qi]))
            if not len(cand):
                continue
            r = min(rerank, len(cand))
            best = cand[np.argpartition(dist[qi][cand], r - 1)[:r]] \
                if r < len(cand) else cand
            out_q.append(np.full(len(best), qi))
            out_v.append(ids_b[best])
            out_s.append(dist[qi][best])
        if not out_q:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc": pa.array([], pa.float64())})
        return pa.table({"qi": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "adc": pa.array(np.concatenate(out_s))})

    parts_out = ray.get(scan_ds.map_batches(partial, batch_format="pyarrow",
                                            zero_copy_batch=True)
                        .to_arrow_refs())
    nonempty = [p for p in parts_out if p.num_rows]
    if not nonempty:
        return empty, metrics
    pool_ids = _pool_merge(nonempty, rerank)
    all_pool = [v for v in pool_ids.values() if len(v)]
    if not all_pool:
        return empty, metrics

    # --- re-rank: raw vectors ONLY for the pool's rows (id filter) ---
    want = np.unique(np.concatenate(all_pool))
    dset = pads.dataset(paths)
    vt = dset.to_table(columns=["vec_id", "embedding"],
                       filter=pads.field("vec_id").isin(want.tolist()))
    metrics["rerank_rows_read"] = vt.num_rows
    V = _to_matrix(vt["embedding"])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    id_index = {int(v): i for i, v in enumerate(vt["vec_id"].to_numpy())}
    return _rerank_exact(np.asarray(query_ids), Qn, pool_ids, id_index,
                         Vn, k), metrics


def embedding_knn_graph(emb: rd.Dataset, *, k: int = 5,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        scale: int = 1024,
                        corpus_chunk: int = 8192,
                        nrows: int | None = None,
                        broadcast_threshold: int = 200_000,
                        plan: str | None = None,
                        seeds: np.ndarray | None = None,
                        n_seeds: int = 64, n_probe: int = 2,
                        n_shards: int | None = None) -> rd.Dataset:
    """kNN GRAPH over the embedding column — the embedding-space twin
    of the spatial ``knn.knn_join`` self-join: for EVERY vector its
    ``k`` nearest others by quantized-integer L2 (floor(v*scale), the
    kmeans discipline), ties broken by neighbor id — the (d2, id) exact
    ordering, so the result is bit-identical to the SQL row_number twin.
    Output (vec_id, neighbor_id, dist2, knn_rank).

    PLAN CHOICE (the dedup ``_plan_rows`` discipline, round-5 verdict
    item): ``plan="broadcast"`` is the exact brute baseline — the
    quantized corpus (ids, Q) rides ``ray.put`` once; each batch
    computes distances against the corpus in ``corpus_chunk`` column
    blocks via one int64 matmul per block, takes a vectorized per-row
    partial top-k INCLUDING the k-th-distance tie set (the
    ``_smallest_with_ties`` rule, axis-vectorized), and only the final
    per-row selection sorts the small candidate pool.  That plan
    materializes the corpus matrix on the driver AND on every worker,
    so it is gated: callers who don't pin a plan get broadcast only
    when ``_plan_rows(nrows) <= broadcast_threshold``; above it (or
    with no ``nrows`` hint at all — conservative "large") the call
    falls into the IVF-bucketed sharded plan
    (``embedding_knn_graph_ivf``: two hash(cell)/hash(vec) exchanges,
    no driver materialization), with ``seeds`` auto-drawn from
    ``emb.limit(n_seeds)`` when not supplied.  NOTE the gate trades
    exactness for scale exactly like the ANN family it joins: at
    ``n_probe < n_cells`` the IVF graph is approximate (identical
    vectors always share a cell, so planted-duplicate recall stays
    certain); ``n_probe >= n_cells`` is provably equal to brute.
    Self pairs drop by id (d2 = 0 with ids unique)."""
    from optimizing_ray.pipelines.dedup import _plan_rows

    if plan is None:
        plan = ("broadcast" if _plan_rows(nrows) <= broadcast_threshold
                else "ivf")
    assert plan in ("broadcast", "ivf")
    if plan == "ivf":
        if seeds is None:
            head = emb.limit(n_seeds).take_all()
            if not head:
                return rd.from_arrow(pa.table({
                    id_col: pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.int64()),
                    "knn_rank": pa.array([], pa.int64())}))
            from optimizing_ray.pipelines.cluster import quantize_embeddings
            vecs = pa.array([r[vec_col] for r in head])
            seeds = np.unique(quantize_embeddings(vecs, scale), axis=0)
        return embedding_knn_graph_ivf(emb, seeds, k=k, n_probe=n_probe,
                                       id_col=id_col, vec_col=vec_col,
                                       scale=scale, n_shards=n_shards)
    chunks = [t for t in ray.get(emb.to_arrow_refs()) if t.num_rows]
    if not chunks:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "dist2": pa.array([], pa.int64()),
            "knn_rank": pa.array([], pa.int64())}))
    corpus = pa.concat_tables(chunks)
    cids = corpus[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    C = np.floor(_to_matrix(corpus[vec_col]) * float(scale)).astype(np.int64)
    cref = ray.put((cids, np.ascontiguousarray(C)))

    def knn_batch(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist2": pa.array([], pa.int64()),
                          "knn_rank": pa.array([], pa.int64())})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        from optimizing_ray.broadcast import cached
        ids_c, Cm = cached(("eknn_corpus", cref), lambda: ray.get(cref))
        qids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.floor(_to_matrix(t[vec_col]) * float(scale)).astype(np.int64)
        m = len(qids)
        qn = (Q * Q).sum(axis=1)
        cand_r = []
        cand_c = []
        cand_d = []
        for s in range(0, len(ids_c), corpus_chunk):
            e = min(s + corpus_chunk, len(ids_c))
            Cc = Cm[s:e]
            D = (qn[:, None] - 2 * (Q @ Cc.T)
                 + (Cc * Cc).sum(axis=1)[None, :])
            # mask self pairs to +inf-equivalent (ids unique)
            self_m = qids[:, None] == ids_c[None, s:e]
            D[self_m] = np.iinfo(np.int64).max
            kk = min(k, D.shape[1])
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            thr = np.take_along_axis(D, part, axis=1).max(axis=1)
            mask = D <= thr[:, None]  # partial top-k PLUS the k-th ties
            r, c = np.nonzero(mask)
            cand_r.append(r)
            cand_c.append(c + s)
            cand_d.append(D[r, c])
        r = np.concatenate(cand_r)
        nid = ids_c[np.concatenate(cand_c)]
        d2 = np.concatenate(cand_d)
        # exact final selection: (query, d2, neighbor_id) lexsort, cut k
        order = np.lexsort((nid, d2, r))
        r, nid, d2 = r[order], nid[order], d2[order]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        rank = np.arange(len(r)) - np.repeat(starts, np.diff(
            np.r_[starts, len(r)])) + 1
        keep = rank <= k
        return pa.table({id_col: pa.array(qids[r[keep]]),
                         "neighbor_id": pa.array(nid[keep]),
                         "dist2": pa.array(d2[keep]),
                         "knn_rank": pa.array(rank[keep])})

    return emb.map_batches(knn_batch, batch_format="pyarrow",
                           zero_copy_batch=True)


def semantic_decontaminate(emb: rd.Dataset, bench_ids, *, id_col: str = "vec_id",
                           vec_col: str = "embedding", scale: int = 1024,
                           tau_num: int = 9, tau_den: int = 10) -> rd.Dataset:
    """Semantic benchmark decontamination — the embedding-space twin of
    the n-gram ``textops.decontaminate``: drop every corpus vector whose
    cosine to ANY benchmark vector reaches tau_num/tau_den, via the
    exact integer cross-multiplied predicate (dot > 0 AND
    tau_den^2*dot^2 >= tau_num^2*|a|^2*|b|^2) over quantized vectors —
    bit-identical to the SQL twin.  Benchmark members themselves are
    dropped too (they ARE the contamination set).

    Output: the surviving rows as (vec_id, kept=1)-shaped id list
    (one column, ``vec_id``).  Plan: the benchmark matrix (bounded — a
    benchmark suite, not a corpus) rides ``ray.put`` once; one
    streaming pass computes chunked int64 matmuls per batch.  Zero
    shuffles at any corpus size."""
    bench_ids = np.asarray(bench_ids, dtype=np.int64)
    bset_ref = None

    def collect_bench(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "_q": pa.array([], pa.list_(pa.int64()))})
        ids = t[id_col].to_numpy(zero_copy_only=False)
        m = np.isin(ids, bench_ids)
        sel = t.filter(pa.array(m))
        if sel.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "_q": pa.array([], pa.list_(pa.int64()))})
        Q = np.floor(_to_matrix(sel[vec_col]) * float(scale)).astype(np.int64)
        flat = pa.array(Q.reshape(-1))
        offs = pa.array(np.arange(sel.num_rows + 1, dtype=np.int32)
                        * Q.shape[1])
        return pa.table({id_col: sel[id_col],
                         "_q": pa.ListArray.from_arrays(offs, flat)})

    btabs = [t for t in ray.get(
        emb.map_batches(collect_bench, batch_format="pyarrow",
                        zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    if btabs:
        bt = pa.concat_tables(btabs)
        qc = bt["_q"].combine_chunks() if isinstance(bt["_q"], pa.ChunkedArray) \
            else bt["_q"]
        B = (qc.flatten().to_numpy(zero_copy_only=False)
             .reshape(bt.num_rows, -1))
    else:
        B = np.zeros((0, 1), dtype=np.int64)
    bset_ref = ray.put(np.ascontiguousarray(B))
    num2 = np.int64(tau_num * tau_num)
    den2 = np.int64(tau_den * tau_den)

    def survivors(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or vec_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64())})
        from optimizing_ray.broadcast import cached
        Bm = cached(("semdecon_bench", bset_ref), lambda: ray.get(bset_ref))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, bench_ids)
        if len(Bm) and keep.any():
            Q = np.floor(_to_matrix(t[vec_col]) * float(scale)).astype(np.int64)
            n2 = (Q * Q).sum(axis=1)
            bn2 = (Bm * Bm).sum(axis=1)
            # int64-range guard (the semantic_dedup rule): |dot| <=
            # sqrt(max n2 * max bn2), squared once more times tau_den^2
            mx = max(int(n2.max()), int(bn2.max()))
            assert tau_den * tau_den * mx * mx < (1 << 63), (
                "quantized norms too large for the int64 cosine "
                "predicate: lower `scale`")
            step = 4096
            for s in range(0, len(Bm), step):
                Bc = Bm[s:s + step]
                D = Q @ Bc.T
                pred = (D > 0) & (den2 * D * D
                                  >= num2 * np.outer(n2, bn2[s:s + step]))
                keep &= ~pred.any(axis=1)
        return pa.table({id_col: pa.array(ids[keep])})

    return emb.map_batches(survivors, batch_format="pyarrow",
                           zero_copy_batch=True)


def embedding_knn_graph_ivf(emb: rd.Dataset, seeds: np.ndarray, *,
                            k: int = 5, n_probe: int = 2,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding", scale: int = 1024,
                            n_shards: int | None = None) -> rd.Dataset:
    """IVF-bucketed kNN graph — the SCALE path the brute
    ``embedding_knn_graph`` names: vectors post into their k-means cell,
    every vector probes its ``n_probe`` nearest cells, and the exact
    integer-L2 top-k runs only within probed cells.  With
    ``n_probe >= len(seeds)`` every cell is probed and the result
    PROVABLY equals the brute graph (the full-probe oracle-certainty
    rule); smaller n_probe trades recall for candidate volume
    (identical vectors always share a cell, so planted-duplicate recall
    is certain even at n_probe=1).

    Plan (two sharded exchanges, the tfidf shape): postings and probe
    rows union-exchange on hash(cell) — a cell's members and probers
    co-locate, the per-cell chunked int64 matmul emits at most
    k-plus-ties rows per (prober, cell) — then a hash(vec_id) exchange
    merges partials and ranks (d2, neighbor_id).  Vector payloads ride
    the exchange once as list<int64> columns; no driver materialization
    of the corpus."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards
    from optimizing_ray.pipelines.cluster import (kmeans_step,
                                                  quantize_embeddings)

    n_shards = resolve_shards(n_shards)
    cent, live = kmeans_step(emb, seeds, vec_col=vec_col, scale=scale)
    n_cells = len(cent)
    n_probe = min(n_probe, n_cells)
    cref = ray.put(np.ascontiguousarray(cent))

    def legs(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "_cell": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int8()),
                          "_q": pa.array([], pa.list_(pa.int64())),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        from optimizing_ray.broadcast import cached
        C = cached(("eknn_ivf_cent", cref), lambda: ray.get(cref))
        Q = quantize_embeddings(t[vec_col], scale)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m, dim = Q.shape
        # distances to every centroid; own cell = argmin, probe cells =
        # the n_probe smallest (ties by centroid row — deterministic)
        d2 = ((Q * Q).sum(axis=1)[:, None] - 2 * (Q @ C.T)
              + (C * C).sum(axis=1)[None, :])
        own = d2.argmin(axis=1).astype(np.int64)
        probe = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
        rep_ids = np.concatenate([ids, np.repeat(ids, n_probe)])
        rep_cell = np.concatenate([own, probe.reshape(-1)])
        rep_side = np.concatenate([
            np.zeros(m, dtype=np.int8), np.ones(m * n_probe, dtype=np.int8)])
        rows = np.concatenate([np.arange(m), np.repeat(np.arange(m), n_probe)])
        flat = pa.array(Q[rows].reshape(-1))
        offs = pa.array(np.arange(len(rows) + 1, dtype=np.int32) * dim)
        return pa.table({id_col: pa.array(rep_ids),
                         "_cell": pa.array(rep_cell),
                         "_side": pa.array(rep_side),
                         "_q": pa.ListArray.from_arrays(offs, flat),
                         "_shard": pa.array(rep_cell % n_shards)})

    def per_cell(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist2": pa.array([], pa.int64()),
                          "_shard2": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        cell = t["_cell"].to_numpy(zero_copy_only=False)
        side = t["_side"].to_numpy(zero_copy_only=False)
        qc = t["_q"].combine_chunks() if isinstance(t["_q"], pa.ChunkedArray) \
            else t["_q"]
        Q = (qc.flatten().to_numpy(zero_copy_only=False)
             .reshape(len(ids), -1))
        out_r, out_n, out_d = [], [], []
        for c in np.unique(cell):
            cm = cell == c
            mem = cm & (side == 0)
            prb = cm & (side == 1)
            if not mem.any() or not prb.any():
                continue
            Mi, Pi = np.flatnonzero(mem), np.flatnonzero(prb)
            Qm, Qp = Q[Mi], Q[Pi]
            D = ((Qp * Qp).sum(axis=1)[:, None] - 2 * (Qp @ Qm.T)
                 + (Qm * Qm).sum(axis=1)[None, :])
            self_m = ids[Pi][:, None] == ids[Mi][None, :]
            D[self_m] = np.iinfo(np.int64).max
            kk = min(k, D.shape[1])
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            thr = np.take_along_axis(D, part, axis=1).max(axis=1)
            mask = D <= thr[:, None]
            r, cix = np.nonzero(mask)
            out_r.append(ids[Pi][r])
            out_n.append(ids[Mi][cix])
            out_d.append(D[r, cix])
        if not out_r:
            return empty
        rid = np.concatenate(out_r)
        return pa.table({id_col: pa.array(rid),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "dist2": pa.array(np.concatenate(out_d)),
                         "_shard2": pa.array((rid % n_shards).astype(np.int64))})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        r = g[id_col].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        d2 = g["dist2"].to_numpy()
        order = np.lexsort((nid, d2, r))
        r, nid, d2 = r[order], nid[order], d2[order]
        # a neighbor can arrive via several probed cells — dedup exact
        # duplicates before ranking
        keep = np.r_[True, (r[1:] != r[:-1]) | (nid[1:] != nid[:-1])]
        r, nid, d2 = r[keep], nid[keep], d2[keep]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        rank = np.arange(len(r)) - np.repeat(starts, np.diff(
            np.r_[starts, len(r)])) + 1
        sel = rank <= k
        return pd.DataFrame({id_col: r[sel], "neighbor_id": nid[sel],
                             "dist2": d2[sel],
                             "knn_rank": rank[sel].astype(np.int64)})

    cand = (emb.map_batches(legs, batch_format="pyarrow",
                            zero_copy_batch=True)
            .groupby("_shard").map_groups(per_cell, batch_format="pyarrow"))
    return cand.groupby("_shard2").map_groups(final, batch_format="pandas")


def knn_classify(emb: rd.Dataset, *, k: int = 5, holdout_mod: int = 5,
                 holdout_rem: int = 0, id_col: str = "vec_id",
                 vec_col: str = "embedding", label_col: str = "label",
                 scale: int = 1024,
                 corpus_chunk: int = 8192) -> rd.Dataset:
    """kNN majority-vote classification over the embedding column — the
    similarity-search stand-in for a fastText-style quality / domain
    classifier in a curation pipeline: vectors with
    ``id % holdout_mod == holdout_rem`` are the held-out QUERY set, the
    rest the labeled TRAIN set; each query takes the majority label of
    its ``k`` nearest train vectors under quantized-int64 L2 with the
    exact (d2, train_id) total order (the embedding_knn_graph
    discipline); vote ties break to the SMALLEST label, so the result
    is bit-identical to the SQL row_number twin
    (``oracle.knn_classify_sql``).  Output (vec_id, label, pred_label,
    n_votes) — true label kept for accuracy / confusion analysis.

    Plan: the quantized TRAIN matrix rides ``ray.put`` once; queries
    stream in one pass of chunked int64 matmuls with tie-retaining
    partial top-k per chunk (exact final lexsort cut), then a
    vectorized per-query vote — zero shuffles.  This is the brute
    BASELINE (the embedding_knn_graph shape); the scale path buckets
    train vectors with the IVF index exactly as
    ``embedding_knn_graph_ivf`` does."""
    chunks = [t for t in ray.get(emb.to_arrow_refs()) if t.num_rows]
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64()),
                      "pred_label": pa.array([], pa.int64()),
                      "n_votes": pa.array([], pa.int64())})
    if not chunks:
        return rd.from_arrow(empty)
    corpus = pa.concat_tables(chunks)
    ids_all = corpus[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    is_train = (ids_all % holdout_mod) != holdout_rem
    tids = ids_all[is_train]
    tlab = (corpus[label_col].to_numpy(zero_copy_only=False)
            .astype(np.int64)[is_train])
    T = np.floor(_to_matrix(corpus[vec_col]) * float(scale)).astype(
        np.int64)[is_train]
    tref = ray.put((tids, tlab, np.ascontiguousarray(T)))

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or vec_col not in t.column_names:
            return empty
        from optimizing_ray.broadcast import cached
        ids_t, lab_t, Tm = cached(("knn_classify_train", tref),
                                  lambda: ray.get(tref))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qm = (ids % holdout_mod) == holdout_rem
        if not qm.any():
            return empty
        qids = ids[qm]
        qlab = t[label_col].to_numpy(zero_copy_only=False).astype(
            np.int64)[qm]
        Q = np.floor(_to_matrix(t[vec_col]) * float(scale)).astype(
            np.int64)[qm]
        qn = (Q * Q).sum(axis=1)
        cand_r, cand_c, cand_d = [], [], []
        for s in range(0, len(ids_t), corpus_chunk):
            e = min(s + corpus_chunk, len(ids_t))
            Cc = Tm[s:e]
            D = (qn[:, None] - 2 * (Q @ Cc.T)
                 + (Cc * Cc).sum(axis=1)[None, :])
            kk = min(k, D.shape[1])
            part = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            thr = np.take_along_axis(D, part, axis=1).max(axis=1)
            mask = D <= thr[:, None]  # partial top-k PLUS k-th ties
            r, c = np.nonzero(mask)
            cand_r.append(r)
            cand_c.append(c + s)
            cand_d.append(D[r, c])
        r = np.concatenate(cand_r)
        cidx = np.concatenate(cand_c)
        d2 = np.concatenate(cand_d)
        nid = ids_t[cidx]
        order = np.lexsort((nid, d2, r))
        r, cidx = r[order], cidx[order]
        starts = np.flatnonzero(np.r_[True, r[1:] != r[:-1]])
        rank = np.arange(len(r)) - np.repeat(
            starts, np.diff(np.r_[starts, len(r)])) + 1
        keep = rank <= k
        r, lab = r[keep], lab_t[cidx[keep]]
        # vectorized vote: counts per (query, label) segment, then the
        # (count DESC, label ASC) winner per query
        o2 = np.lexsort((lab, r))
        r2, l2 = r[o2], lab[o2]
        seg = np.flatnonzero(np.r_[True, (r2[1:] != r2[:-1])
                                   | (l2[1:] != l2[:-1])])
        cnt = np.diff(np.r_[seg, len(r2)]).astype(np.int64)
        rq, rl = r2[seg], l2[seg]
        o3 = np.lexsort((rl, -cnt, rq))
        rq, rl, cnt = rq[o3], rl[o3], cnt[o3]
        first = np.flatnonzero(np.r_[True, rq[1:] != rq[:-1]])
        return pa.table({id_col: pa.array(qids[rq[first]]),
                         "label": pa.array(qlab[rq[first]]),
                         "pred_label": pa.array(rl[first]),
                         "n_votes": pa.array(cnt[first])})

    return emb.map_batches(classify, batch_format="pyarrow",
                           zero_copy_batch=True)


def random_projection(emb: rd.Dataset, *, out_dim: int = 16,
                      scale: int = 1024) -> rd.Dataset:
    """Signed random projection — the dimensionality-reduction stage in
    front of ANN at scale (Achlioptas ±1 projections preserve distances
    within the JL bound at 1/sqrt(out_dim) distortion): y = Q @ S where
    Q = floor(v * scale) (power-of-two scale — exact for float32) and
    S[pos, j] = ±1 from splitmix64(pos * 4096 + j) parity, pos 1-based.
    All-integer, so engine and SQL twin (``oracle.random_projection_sql``)
    agree bit-for-bit; output long-format (vec_id, out_dim, y_q).

    Scale shape: one streaming map_batches pass — the sign matrix is a
    pure function of (in_dim, out_dim) recomputed from (in_dim * out_dim)
    hashes per batch (microseconds; nothing to broadcast), the matmul is
    one int64 GEMM per batch, zero shuffles at any corpus size."""
    from optimizing_ray.pipelines.sketches import splitmix64

    def project(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "out_dim": pa.array([], pa.int64()),
                          "y_q": pa.array([], pa.int64())})
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return empty
        M = _to_matrix(t["embedding"])
        if M.size == 0:
            return empty
        q = np.floor(M * scale).astype(np.int64)
        d_in = M.shape[1]
        pos = np.arange(1, d_in + 1, dtype=np.uint64)
        key = (pos[:, None] * np.uint64(4096)
               + np.arange(out_dim, dtype=np.uint64)[None, :])
        sgn = np.where(splitmix64(key) % np.uint64(2) == 0, 1, -1).astype(np.int64)
        y = q @ sgn  # (n, out_dim) int64, exact
        vid = t["vec_id"].to_numpy()
        n = len(vid)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, out_dim)),
            "out_dim": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n)),
            "y_q": pa.array(y.ravel())})

    return emb.map_batches(project, batch_format="pyarrow",
                           zero_copy_batch=True)


def ivf_recall(emb: rd.Dataset, seeds: np.ndarray, *, k: int = 5,
               n_probe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", scale: int = 1024,
               n_shards: int | None = None) -> pa.Table:
    """Recall@k audit of the pruned-probe IVF kNN graph against the
    exact graph — the ANN quality gate a similarity-search deployment
    runs before trusting an index: per vector, how many of its k TRUE
    nearest neighbors (``embedding_knn_graph``) the approximate
    ``embedding_knn_graph_ivf`` at ``n_probe`` probes recovered.
    Output the bounded histogram (n_hits, n_vectors), n_hits in
    [0, k], ordered by n_hits — only occurring values emitted.

    Both graphs use the quantized-int64 (d2, neighbor_id) total order,
    so the rank <= k cut sets are deterministic and the histogram is
    bit-identical to the SQL twin ``oracle.ann_recall_sql`` (which
    replays the kmeans_step centroids, the (d2, cell) own/probe
    selection, and both row_number cuts).  Plan: side-tag the two
    graphs' (vec, neighbor) edges onto ONE hash(vec) exchange (a
    vector's exact and approximate edge sets co-locate), fold the
    per-shard intersection counts into k+1-row partial histograms,
    and sum <= shards x (k+1) rows driver-side."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    # the audit's ground-truth leg is the exact brute graph by
    # definition — pinned past the round-5 plan gate.  A recall audit
    # runs over an eval-scale sample (standard ANN practice), not the
    # full corpus; for an at-scale exact leg use full-probe IVF
    # (n_probe = n_cells), which provably equals brute.
    exact = embedding_knn_graph(emb, k=k, id_col=id_col, vec_col=vec_col,
                                scale=scale, plan="broadcast")
    approx = embedding_knn_graph_ivf(emb, seeds, k=k, n_probe=n_probe,
                                     id_col=id_col, vec_col=vec_col,
                                     scale=scale)
    leg_schema = pa.schema([("v", pa.int64()), ("nb", pa.int64()),
                            ("side", pa.int8()), ("_shard", pa.int64())])
    gold = np.uint64(0x9E3779B97F4A7C15)

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or id_col not in t.column_names:
                return leg_schema.empty_table()
            v = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            nb = t["neighbor_id"].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                sh = (v.astype(np.uint64) * gold) >> np.uint64(33)
            return pa.table({
                "v": pa.array(v), "nb": pa.array(nb.astype(np.int64)),
                "side": pa.array(np.full(len(v), side, np.int8)),
                "_shard": pa.array((sh % np.uint64(n_shards))
                                   .astype(np.int64))})
        return f

    def shard_hist(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"n_hits": pd.Series([], dtype=np.int64),
                              "n_vectors": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        v = g["v"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        order = np.lexsort((side, nb, v))
        v, nb, side = v[order], nb[order], side[order]
        # edge sets are duplicate-free per side, so an intersected pair
        # is exactly two adjacent rows with sides (0, 1)
        hit = (v[:-1] == v[1:]) & (nb[:-1] == nb[1:]) \
            & (side[:-1] == 0) & (side[1:] == 1)
        uv = np.unique(v[side == 0])
        hits_per = np.zeros(len(uv), dtype=np.int64)
        if hit.any():
            hv, hc = np.unique(v[:-1][hit], return_counts=True)
            hits_per[np.searchsorted(uv, hv)] = hc
        counts = np.bincount(hits_per, minlength=k + 1)
        occ = np.flatnonzero(counts)
        return pd.DataFrame({"n_hits": occ.astype(np.int64),
                             "n_vectors": counts[occ].astype(np.int64)})

    parts = (exact.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True)
             .union(approx.map_batches(tag(1), batch_format="pyarrow",
                                       zero_copy_batch=True))
             .groupby("_shard").map_groups(shard_hist,
                                           batch_format="pandas")
             .to_pandas())
    out_schema = pa.schema([("n_hits", pa.int64()),
                            ("n_vectors", pa.int64())])
    if len(parts) == 0 or "n_hits" not in parts.columns:
        return out_schema.empty_table()
    agg = (parts.groupby("n_hits", sort=True)["n_vectors"].sum()
           .reset_index())
    return pa.table({"n_hits": pa.array(agg["n_hits"].to_numpy(np.int64)),
                     "n_vectors": pa.array(
                         agg["n_vectors"].to_numpy(np.int64))})

"""Deduplication operators for the large-scale training-data pipeline.

These extend the reference (which has no dedup beyond the render-once
flag, ``REPORT.md:4-8``) with the standard corpus-dedup family, each
built from the engine's shuffle primitives:

* exact          — content hash in ``map_batches`` -> groupby(hash) ->
                   keep min doc_id (hash-partitioned "per-group first")
* minhash_lsh    — shingle -> minhash signature -> (band, band_hash,
                   doc_id) explosion -> groupby band bucket -> candidate
                   pairs -> exact Jaccard verify
* simhash        — 64-bit token simhash; candidates by 16-bit chunk
                   banding (pigeonhole: hamming <= 3 guarantees one of 4
                   chunks equal) -> verify true hamming
* embedding near-dup — random-hyperplane signatures over the embedding
                   column -> band buckets -> exact cosine verify

Scale discipline (SURVEY.md §7.4 wide-row rule): every shuffle in this
module carries only (hash/bucket, id) rows; payloads (texts, vectors)
re-attach by id through the streaming bucket merge
(box_join.gather_payload) — the corpus is never collected driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.config import resolve_shards
from optimizing_ray.functions.text import (jaccard_pairs_grouped,
                                           shingle_hashes,
                                           shingle_hashes_batch,
                                           shingle_window_hashes_batch)

__all__ = ["exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
           "simhash_pairs", "embedding_near_dup_pairs", "connected_components",
           "connected_components_distributed", "cluster_reps",
           "near_dedup_keep", "build_fingerprint_store",
           "filter_new_against_store", "append_to_fingerprint_store",
           "set_similarity_join", "winnow_overlap_stats",
           "exact_set_join_sets", "containment_join"]


def _plan_rows(nrows: int | None) -> int:
    """Row count used ONLY to pick the broadcast-vs-join verify plan.

    Callers that know the corpus size (parquet metadata, prior count)
    pass ``nrows`` so plan selection costs nothing; with no hint the
    conservative answer is "large" — the streaming join path is correct
    at every scale, the broadcast path is just fewer shuffles when the
    (id, payload) table comfortably fits in memory.  Never runs
    ``ds.count()`` (on a transformed dataset that is a full extra pass
    over the input).

    BEHAVIOR NOTE (round 2+): library callers of exact_dedup /
    minhash_lsh_pairs / embedding_near_dup_pairs who previously got
    auto-broadcast via an implicit docs.count() now take the multi-
    shuffle join plan by default when they pass no ``nrows`` — correct
    at every scale, just more exchanges on a tiny corpus.  Small known
    corpora: pass ``nrows=`` (free from parquet metadata) or
    ``verify="broadcast"`` explicitly."""
    return nrows if nrows is not None else (1 << 62)


def _content_hash128(texts) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit content-hash lanes (128 bits joint) over a
    string column — vectorized polars xxh3 (one Rust pass per lane, two
    seeds) instead of the old per-row ``hashlib.md5`` loop (round-2
    VERDICT hot-path item; measured 21x / 3.8 M rows/s on 100-500 B
    docs, BASELINE.md micro-bench).  Deterministic across processes
    (fixed seeds); joint-128-bit collision probability is negligible at
    any corpus size.  The winner SET is hash-independent anyway (min id
    per distinct text, modulo collisions), and the SQL oracle groups by
    the raw text (``oracle.dedup_exact_sql``) — content-exact, not
    hash-exact.  Nulls hash to one fixed value (their own group), which
    matches DuckDB's GROUP BY null semantics; the old None -> "" fold
    merged null and empty texts.

    Accepts a pyarrow Array/ChunkedArray (zero-copy into polars) or any
    sequence of strings."""
    import polars as pl
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(texts)
    else:
        s = pl.Series(list(texts), dtype=pl.Utf8)
    h1 = s.hash(seed=1).to_numpy()
    h2 = s.hash(seed=2).to_numpy()
    return h1.view(np.int64), h2.view(np.int64)


def exact_dedup(docs: rd.Dataset, *, text_col: str = "text",
                id_col: str = "doc_id",
                broadcast_threshold: int = 200_000,
                nrows: int | None = None) -> rd.Dataset:
    """Keep one representative (min id) per distinct text.

    Scale shape: the exchange carries ONLY (hash128, id) rows — wide text
    bytes never shuffle.  Winners (min id per 128-bit content hash; md5
    collision probability is negligible at any corpus size) are then
    re-joined with their payload via the streaming bucket merge.
    Shuffle key = ``hash % 32`` shards, not the raw hash (one Ray group
    per distinct doc would be dispatch-bound; 32 keeps Ray's per-group
    task count under the measured fixed-cost knee while still exceeding
    a node's cores).

    Without ``nrows`` the shuffle plan is taken even on tiny corpora
    (correct, just more exchanges) — pass the free parquet-metadata row
    count to enable the broadcast fast path (see ``_plan_rows``)."""
    n_shards = resolve_shards(None)

    def slim_hash(t: pa.Table) -> pa.Table:
        # the arrow column goes zero-copy into the polars hash kernel
        h1, h2 = _content_hash128(t[text_col])
        out = pa.table({
            id_col: t[id_col],
            "_h1": pa.array(h1), "_h2": pa.array(h2),
            "_shard": pa.array((h1 % n_shards).astype(np.int64)),
        })
        # in-batch pre-dedup (keep min id per hash): the shuffle then moves
        # at most one row per (batch, distinct text) — the partial/final
        # combiner split applied to dedup
        df = out.to_pandas().sort_values(id_col)
        df = df.drop_duplicates(subset=["_h1", "_h2"], keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(id_col).drop_duplicates(subset=["_h1", "_h2"],
                                                     keep="first")
        return keep[[id_col]]

    slim_parts = docs.map_batches(slim_hash, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if _plan_rows(nrows) <= broadcast_threshold:
        # small corpus: the winner set is driver-materialized for the
        # broadcast anyway, so skip the shard shuffle entirely — merge the
        # per-batch pre-deduped partials driver-side (bounded by
        # broadcast_threshold rows BY PLAN CHOICE), then semi-join filter
        parts = [p for p in (ray.get(r) for r in slim_parts.to_arrow_refs())
                 if p.num_rows]
        if not parts:
            return docs  # empty corpus: nothing to dedup
        allp = pa.concat_tables(parts).to_pandas()
        keep_ids = winners(allp)[id_col].to_numpy()
        keep = np.sort(np.asarray(keep_ids, dtype=object))
        keep_ref = ray.put(keep)

        def semi(t: pa.Table) -> pa.Table:
            ks = ray.get(keep_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(ks, ids), 0, max(0, len(ks) - 1))
            return t.filter(pa.array(ks[pos] == ids if len(ks) else
                                     np.zeros(len(ids), bool)))

        return docs.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
    slim = slim_parts.groupby("_shard").map_groups(winners, batch_format="pandas")
    payload_cols = tuple(c for c in docs.schema().base_schema.names if c != id_col)
    from optimizing_ray.pipelines.box_join import gather_payload
    return gather_payload(slim, docs, payload_cols=payload_cols, on=id_col)


def _minhash_salts(num_perm: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63 - 1, size=num_perm,
                        dtype=np.int64).astype(np.uint64)


def minhash_from_windows(flat: np.ndarray, offs: np.ndarray, *,
                         num_perm: int = 64, seed: int = 1,
                         chunk_windows: int = 1024) -> np.ndarray:
    """(n_docs, num_perm) minhash signatures from batch window hashes
    (``text.shingle_window_hashes_batch`` output; duplicates are fine —
    min over the multiset equals min over the set).  Processes runs of
    whole docs totalling <= chunk_windows window hashes into ONE reused
    mix buffer: chunk 1024 keeps the (chunk, num_perm) matrix ~512 KB
    (L2-ish; swept 512..16384 — 16 k measured 2.3x slower, DRAM-bound)
    and reuse avoids the page-allocation wall on fresh mmap'd matrices
    (round-4, VERDICT item 3)."""
    n_docs = len(offs) - 1
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0 or n_docs == 0:
        return sig
    salts = _minhash_salts(num_perm, seed)
    # ONE reusable mix buffer: a fresh (chunk, num_perm) matrix per chunk
    # would be mmap'd and first-touched every iteration (this VM's
    # page-allocation wall, ~0.5 GB/s — measured 2.7x slower end-to-end)
    buf = np.empty((min(chunk_windows, len(flat)) + 64, num_perm),
                   dtype=np.uint64)
    tmp = np.empty_like(buf)
    i = 0
    with np.errstate(over="ignore"):
        while i < n_docs:
            j = int(np.searchsorted(offs, offs[i] + chunk_windows,
                                    side="right")) - 1
            j = max(j, i + 1)  # a single doc larger than the chunk
            m = int(offs[j] - offs[i])
            if m > len(buf):  # lone oversized doc
                buf = np.empty((m, num_perm), dtype=np.uint64)
                tmp = np.empty_like(buf)
            v, s = buf[:m], tmp[:m]
            # permuted hash = splitmix-style mix of (shingle ^ salt)
            np.bitwise_xor(flat[offs[i]:offs[j], None], salts[None, :], out=v)
            np.right_shift(v, np.uint64(33), out=s)
            v ^= s
            v *= np.uint64(0xFF51AFD7ED558CCD)
            np.right_shift(v, np.uint64(33), out=s)
            v ^= s
            sig[i:j] = np.minimum.reduceat(v, offs[i:j] - offs[i], axis=0)
            i = j
    return sig


def minhash_signatures(texts, *, num_perm: int = 64, k_shingle: int = 5,
                       seed: int = 1) -> np.ndarray:
    """(n_docs, num_perm) minhash signature matrix via the xor-permute
    trick over shingle hashes — batch-blob shingling
    (``shingle_window_hashes_batch``: one rolling-hash pass over the
    whole batch) + chunked mix/segmented-min, no per-doc Python."""
    flat, offs = shingle_window_hashes_batch(texts, k_shingle)
    return minhash_from_windows(flat, offs, num_perm=num_perm, seed=seed)


def _banded_table(ids, hs_i64: np.ndarray, *, with_bh: bool) -> pa.Table:
    """Explode a (n, bands) int64 bucket-hash matrix into LSH band rows.

    ``with_bh=True`` additionally carries the doc's full bucket-hash
    vector (``bh``, bands x int64) on every row, which lets the pair
    stage emit each candidate pair EXACTLY ONCE in one shuffle
    (first-agreeing-band ownership, see ``_pairs_from_buckets``).  The
    vector costs O(bands^2) bytes per doc through the bucket shuffle —
    the right trade only at SMALL band counts: at bands=16 (minhash) it
    measured ~1.5 s/1M-docs MORE expensive than the classic two-shuffle
    plan, whose second exchange moves only candidate PAIRS (<< corpus
    rows), and at bands=32 (embedding) the vector would be 256 B/row.
    Both production callers currently ship with_bh=False; the
    one-shuffle plan stays available (and equivalence-tested in
    test_dedup) for small-band configurations."""
    n, bands = hs_i64.shape
    cols = {
        "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
        "bucket": pa.array(hs_i64.T.ravel()),
        "doc_id": pa.array(np.tile(np.asarray(ids), bands)),
    }
    if with_bh:
        cols["bh"] = pa.FixedSizeListArray.from_arrays(
            pa.array(np.tile(hs_i64, (bands, 1)).ravel()), bands)
    return pa.table(cols)


def _empty_band_table() -> pa.Table:
    """Schema-stable empty band-row table for EMPTY-SCHEMA input blocks
    (Ray Data passes those through; the id type defaults to int64 — every
    engine corpus uses int64 ids)."""
    return pa.table({"band": pa.array([], pa.int32()),
                     "bucket": pa.array([], pa.int64()),
                     "doc_id": pa.array([], pa.int64())})


def _band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) int64 stable per-band bucket hashes (FNV fold over the
    band's signature lanes)."""
    n, num_perm = sig.shape
    rows_per_band = num_perm // bands
    hs = np.empty((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            chunk = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) ^ chunk[:, c]
            hs[:, b] = h
    return hs.astype(np.int64)


def _band_rows(ids, sig: np.ndarray, bands: int) -> pa.Table:
    """Minhash signatures -> LSH band rows (no bh: at bands=16 the
    ownership vector would cost 2 KB/doc of shuffle payload — the
    pairs-only second shuffle is cheaper, see ``_banded_table``)."""
    return _banded_table(ids, _band_hashes(sig, bands), with_bh=False)


def _pairs_from_buckets(bucketed: rd.Dataset, n_shards: int | None = None, *,
                        with_bh: bool) -> rd.Dataset:
    """(band, bucket, doc_id[, bh]) rows -> candidate pairs (a < b), deduped.

    Shuffle key = ``hash(band, bucket) % n_shards`` so Ray materializes 32
    groups, not one per bucket (per-group dispatch would dominate).
    Inside a shard, pair generation is ONE pandas self-merge on
    (band, bucket) — a hash join in C — never a Python loop over the
    (many, tiny) bucket groups, which measures ~30x slower.

    Two dedup plans (a pair sharing buckets in several bands would
    otherwise be emitted once per agreeing band); ``with_bh`` is an
    explicit flag — sniffing the schema here would trigger a partial
    execution of the upstream pipeline just to read column names:

    * with_bh: rows carry the doc's full bucket-hash vector and a group
      emits a pair only when ITS band is the FIRST band where the two
      vectors agree — a deterministic owner, so the pair appears exactly
      once globally in ONE shuffle (right when bands is small, see
      ``_banded_table``).
    * without: within-shard drop_duplicates, then a second exchange keyed
      on hash(pair) — it moves only candidate pairs (<< corpus rows), the
      right trade at large band counts."""
    n_shards = resolve_shards(n_shards)

    def add_shard(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["bucket"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + t["band"].to_numpy().astype(np.uint64))
        return t.append_column("_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=g["doc_id"].dtype),
                              "doc_b": pd.Series([], dtype=g["doc_id"].dtype)})
        cols = ["band", "bucket", "doc_id"] + (["bh"] if with_bh else [])
        left = g.drop_duplicates(["band", "bucket", "doc_id"])[cols]
        right = left if not with_bh else left[["band", "bucket", "doc_id"]]
        m = left.merge(right, on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return empty
        if with_bh:
            # vectorized first-agreeing-band ownership over ALL pairs: the
            # pair's bh vectors agree at a band iff doc_a's band-hash equals
            # doc_b's; doc_b's vector need not ship through the merge — it
            # agrees with doc_a's wherever it matters, so compare a-to-a
            # after aligning b's vector via a doc-level lookup
            uniq = left.drop_duplicates("doc_id")
            lut = pd.Series(uniq["bh"].to_numpy(), index=uniq["doc_id"])
            bha = np.stack(m["bh"].to_numpy())                    # (p, bands)
            bhb = np.stack(lut.loc[m["doc_id_b"]].to_numpy())     # (p, bands)
            own = (bha == bhb).argmax(axis=1) == m["band"].to_numpy()
            m = m[own]
            if not len(m):
                return empty
        out = pd.DataFrame({"doc_a": m["doc_id_a"].to_numpy(),
                            "doc_b": m["doc_id_b"].to_numpy()})
        return out if with_bh else out.drop_duplicates()  # within-shard dedup

    cand = (bucketed.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(pairs, batch_format="pandas"))
    if with_bh:
        return cand

    def add_pair_shard(t: pa.Table) -> pa.Table:
        # shard on doc_a ONLY (not the pair hash): duplicates of (a, b)
        # still co-locate for the dedup, and the downstream verify's
        # grouped-jaccard kernel (jaccard_pairs_grouped) needs all of a
        # doc's partners in one batch to amortize its per-left-doc
        # searchsorted — pair-hash sharding scatters them, leaving the
        # kernel's grouping degenerate (measured 2x SLOWER than per-pair
        # intersect1d).  Skew bound: a doc's candidate count is capped by
        # its bucket cardinality x band count, not the corpus size.
        a = pd.util.hash_pandas_object(
            pd.Series(t["doc_a"].to_numpy(zero_copy_only=False)), index=False).to_numpy()
        return t.append_column("_pshard", pa.array((a % np.uint64(n_shards)).astype(np.int64)))

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["_pshard"])

    # cross-shard duplicates (same pair found via different bands) removed
    # by a second pairs-only sharded pass
    return (cand.map_batches(add_pair_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_pshard").map_groups(dedup_pairs, batch_format="pandas"))


def _attach_payload(pairs: rd.Dataset, docs: rd.Dataset, *, id_col: str,
                    pair_col: str, src_col: str, out_col: str,
                    num_buckets: int | None = None) -> rd.Dataset:
    """Attach docs[src_col] to pair rows by pairs[pair_col] == docs[id_col]
    using the streaming bucket-merge (box_join.gather_payload) — no
    driver-side materialization of the corpus, works for nested types."""
    from optimizing_ray.pipelines.box_join import gather_payload

    def to_key(t: pa.Table) -> pa.Table:
        names = [("_gk" if c == pair_col else c) for c in t.column_names]
        return t.rename_columns(names)

    def doc_side(t: pa.Table) -> pa.Table:
        t = t.select([id_col, src_col])
        return t.rename_columns(["_gk", out_col])

    keyed = pairs.map_batches(to_key, batch_format="pyarrow", zero_copy_batch=True)
    payload = docs.map_batches(doc_side, batch_format="pyarrow", zero_copy_batch=True)
    merged = gather_payload(keyed, payload, payload_cols=(out_col,), on="_gk",
                            num_buckets=num_buckets)

    def back(t: pa.Table) -> pa.Table:
        names = [(pair_col if c == "_gk" else c) for c in t.column_names]
        return t.rename_columns(names)

    return merged.map_batches(back, batch_format="pyarrow", zero_copy_batch=True)


def minhash_lsh_pairs(docs: rd.Dataset, *, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64,
                      bands: int = 16, k_shingle: int = 5,
                      jaccard_threshold: float = 0.5,
                      verify: str = "auto",
                      broadcast_threshold: int = 200_000,
                      nrows: int | None = None) -> rd.Dataset:
    """Near-duplicate pairs with exact-Jaccard verification.

    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.

    verify plans: "join" re-attaches each pair side's text via streaming
    bucket merges (the at-scale path — the corpus is never collected);
    "broadcast" ships the (id, text) table once via ray.put (right when
    the corpus fits comfortably in memory — two fewer shuffles);
    "auto" picks broadcast below `broadcast_threshold` rows — but only
    when ``nrows`` is given (no hint = assume large, see ``_plan_rows``);
    small known corpora should pass nrows or verify="broadcast"."""

    if verify == "auto":
        verify = "broadcast" if _plan_rows(nrows) <= broadcast_threshold else "join"

    if verify == "broadcast":
        return _minhash_pairs_broadcast(
            docs, text_col=text_col, id_col=id_col, num_perm=num_perm,
            bands=bands, k_shingle=k_shingle,
            jaccard_threshold=jaccard_threshold)

    def sigs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and text_col not in t.column_names:
            return _empty_band_table()  # empty-schema block (working notes)
        return _band_rows(t[id_col].to_numpy(zero_copy_only=False),
                          minhash_signatures(t[text_col], num_perm=num_perm,
                                             k_shingle=k_shingle), bands)

    bucketed = docs.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
    cand = _pairs_from_buckets(bucketed, with_bh=False)

    if verify == "join":
        cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_a",
                               src_col=text_col, out_col="_text_a")
        cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_b",
                               src_col=text_col, out_col="_text_b")

        def check_joined(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and "doc_a" not in t.column_names:
                return pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "jaccard": pa.array([], pa.float64())})
            # shingle each DISTINCT doc in the batch exactly once via the
            # batch blob kernel (a doc appears in ~75 pairs at sf0.1 —
            # per-pair shingling would redo that work per side)
            ids_a = t["doc_a"].to_numpy(zero_copy_only=False)
            ids_b = t["doc_b"].to_numpy(zero_copy_only=False)
            texts = dict(zip(ids_a, t["_text_a"].to_numpy(zero_copy_only=False)))
            texts.update(zip(ids_b, t["_text_b"].to_numpy(zero_copy_only=False)))
            uids = list(texts)
            flat, offs = shingle_hashes_batch(
                [texts[u] or "" for u in uids], k_shingle)
            shmap = {u: flat[offs[i]:offs[i + 1]] for i, u in enumerate(uids)}
            _none = np.empty(0, dtype=np.uint64)
            ja = jaccard_pairs_grouped(ids_a, ids_b,
                                       lambda k: shmap.get(k, _none))
            t = t.append_column("jaccard", pa.array(ja, pa.float64()))
            t = t.filter(pa.array(ja >= jaccard_threshold))
            return t.select(["doc_a", "doc_b", "jaccard"])

        return cand.map_batches(check_joined, batch_format="pyarrow",
                                zero_copy_batch=True)

    raise ValueError(f"unknown verify plan {verify!r}")


def _band_candidates(bh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Positional candidate pairs (ia < ib) from an (n, bands) band-hash
    matrix: one pandas self-merge on (band, bucket) + composite-key
    unique.  Driver-side by design — callers are the nrows-gated
    broadcast plans, where the corpus state is already collected.
    Callers must order rows by ascending id so positional < means
    id <.  Output is sorted by (ia, ib): dense per-left-doc groups for
    the grouped verify kernels."""
    n, bands = bh.shape
    df = pd.DataFrame({
        "band": np.repeat(np.arange(bands, dtype=np.int32), n),
        "bucket": bh.T.ravel(),
        "i": np.tile(np.arange(n, dtype=np.int64), bands)})
    m = df.merge(df, on=["band", "bucket"])
    key = m["i_x"].to_numpy() * np.int64(n) + m["i_y"].to_numpy()
    key = key[m["i_x"].to_numpy() < m["i_y"].to_numpy()]
    uk = np.unique(key)
    return uk // n, uk % n


def _minhash_pairs_broadcast(docs: rd.Dataset, *, text_col: str, id_col: str,
                             num_perm: int, bands: int, k_shingle: int,
                             jaccard_threshold: float,
                             verify_chunks: int = 32) -> rd.Dataset:
    """Small-corpus minhash plan (gated upstream by nrows <=
    broadcast_threshold): ZERO shuffles.

    ONE corpus leg computes per-doc band hashes + sorted-unique shingles
    (the shingles the verify needs anyway — and minhash over the unique
    set equals minhash over all windows, so the signature reuses them);
    the driver generates candidate pairs with one pandas self-merge over
    band rows (the corpus state materializes driver-side in this plan
    regardless — round-2 exact_dedup precedent: skip the exchange when
    the plan collects anyway); ONE parallel verify leg computes exact
    Jaccard against the broadcast shingle map.  Replaces the round-3
    two-exchange + separate-shingle-leg plan (measured 6-10 s at sf0.1,
    almost all Ray dispatch floor: 5 pipeline legs + 2 groupby
    exchanges).  Memory: ~8 B x shingles/doc driver-side (~5x the text
    bytes), bounded by broadcast_threshold BY PLAN CHOICE; the at-scale
    path is verify="join"."""

    def doc_state(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "_bh": pa.array([], pa.list_(pa.int64(), bands)),
                "_sh": pa.array([], pa.list_(pa.int64()))})
        flat, offs = shingle_hashes_batch(t[text_col], k_shingle)
        sig = minhash_from_windows(flat, offs, num_perm=num_perm)
        bh = _band_hashes(sig, bands)
        return pa.table({
            id_col: t[id_col],
            "_bh": pa.FixedSizeListArray.from_arrays(
                pa.array(bh.ravel()), bands),
            "_sh": pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32)),
                pa.array(flat.view(np.int64))),
        })

    # batch_size: auto-split single-file reads arrive as ~2x-CPUs tiny
    # blocks (78 rows/block at sf0.1) — per-batch kernel overhead would
    # dominate; rebundle so each doc_state call gets a real batch
    parts = [p for p in ray.get(
        docs.select_columns([id_col, text_col])
        .map_batches(doc_state, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=2048)
        .to_arrow_refs()) if p.num_rows]
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not parts:
        return rd.from_arrow(empty)
    tab = pa.concat_tables(parts).combine_chunks()
    ids = tab[id_col].to_numpy(zero_copy_only=False)
    n = len(ids)
    # positional < must mean id <: reindex docs by ascending id
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    bh_col = tab["_bh"].chunk(0)   # single chunk after combine_chunks
    bh = (bh_col.flatten().to_numpy(zero_copy_only=False)
          .reshape(n, bands))[order]
    sh_col = tab["_sh"].chunk(0)
    sh_flat = sh_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    sh_offs = np.asarray(sh_col.offsets, dtype=np.int64)

    ia, ib = _band_candidates(bh)
    if not len(ia):
        return rd.from_arrow(empty)

    # broadcast the shingle map as THREE flat arrays (ids, offsets, blob):
    # big arrays ride plasma zero-copy; each worker re-slices views once
    # (broadcast.cached), avoiding per-object pickle on 5k+ tiny arrays
    sm_ref = ray.put((ids, sh_offs[1:][order], sh_offs[:-1][order], sh_flat))
    _no_sh = np.empty(0, dtype=np.uint64)

    def _build_sh_map():
        mids, ends, starts, flat = ray.get(sm_ref)
        return {mids[i]: flat[starts[i]:ends[i]] for i in range(len(mids))}

    def check_broadcast(t: pa.Table) -> pa.Table:
        from optimizing_ray.broadcast import cached
        sm = cached(("minhash_sh", sm_ref.hex()), _build_sh_map)
        ja = jaccard_pairs_grouped(t["doc_a"].to_numpy(zero_copy_only=False),
                                   t["doc_b"].to_numpy(zero_copy_only=False),
                                   lambda k: sm.get(k, _no_sh))
        t = t.append_column("jaccard", pa.array(ja, pa.float64()))
        return t.filter(pa.array(ja >= jaccard_threshold))

    ptab = pa.table({"doc_a": pa.array(ids[ia]), "doc_b": pa.array(ids[ib])})
    step = max(1, -(-len(ia) // verify_chunks))
    chunks = [ptab.slice(s, step) for s in range(0, len(ia), step)]
    return rd.from_arrow(chunks).map_batches(
        check_broadcast, batch_format="pyarrow", zero_copy_batch=True)


SIMHASH_POLY_B = 1000003          # polynomial base over UTF-8 bytes
FMIX_C1 = 0xFF51AFD7ED558CCD      # murmur3 fmix64 finalizer constants
FMIX_C2 = 0xC4CEB9FE1A85EC53


def token_hash64(tokens: list[str]) -> np.ndarray:
    """Vectorized 64-bit token hashes: polynomial fold over UTF-8 bytes
    (base ``SIMHASH_POLY_B``, mod 2^64) + murmur3 fmix64 finalizer.

    Deterministic across processes AND SQL-expressible (the DuckDB oracle
    reproduces it bit-for-bit over ASCII text via a recursive CTE +
    split-multiply mod-2^64 arithmetic — ``oracle.simhash_ctes``).  The
    Python loop is only over DISTINCT TOKEN LENGTHS: tokens of equal
    length hash as one (n, L) uint8 matrix column fold."""
    n = len(tokens)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    blob = np.frombuffer("".join(tokens).encode("utf-8"), dtype=np.uint8)
    lens = np.fromiter((len(t.encode("utf-8")) if not t.isascii() else len(t)
                        for t in tokens), dtype=np.int64, count=n)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    B = np.uint64(SIMHASH_POLY_B)
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            sel = np.nonzero(lens == L)[0]
            if L == 0:
                out[sel] = 0
                continue
            idx = starts[sel][:, None] + np.arange(L)[None, :]
            mat = blob[idx].astype(np.uint64)      # (nL, L)
            h = np.zeros(len(sel), dtype=np.uint64)
            for c in range(int(L)):
                h = h * B + mat[:, c]
            # fmix64
            h ^= h >> np.uint64(33)
            h *= np.uint64(FMIX_C1)
            h ^= h >> np.uint64(33)
            h *= np.uint64(FMIX_C2)
            h ^= h >> np.uint64(33)
            out[sel] = h
    return out


def simhash64(texts) -> np.ndarray:
    """64-bit simhash over whitespace tokens (weight 1 each), fully
    vectorized: one token-hash pass over the batch (``token_hash64``),
    bit matrix + per-doc segment sums (``np.add.reduceat``), majority
    vote per bit.  Bit b set iff 2 * (#tokens with bit b) > #tokens —
    the same strict-majority rule the SQL oracle evaluates."""
    n_docs = len(texts)
    tok_lists = [(t or "").split() for t in texts]
    n_tok = np.fromiter((len(ts) for ts in tok_lists), dtype=np.int64,
                        count=n_docs)
    flat = [w for ts in tok_lists for w in ts]
    out = np.zeros(n_docs, dtype=np.uint64)
    if not flat:
        return out
    hs = token_hash64(flat)
    # (n_tokens, 64) bit matrix via C-speed byte unpack (little-endian
    # uint64 view -> unpackbits), not a 64-lane broadcast shift
    # int16 keeps the (n_tokens, 64) matrix small (this VM is page-
    # allocation-bound on big fresh arrays); sums are safe below 32k
    # tokens/doc, with an int64 fallback above (16k: 2*votes must fit too)
    vote_t = np.int16 if int(n_tok.max()) < 16_000 else np.int64
    bits = np.unpackbits(hs.view(np.uint8).reshape(len(hs), 8), axis=1,
                         bitorder="little").astype(vote_t)
    # (upcast BEFORE reduceat: its dtype= upcast path is ~10x slower)
    nonempty = np.nonzero(n_tok > 0)[0]
    bounds = np.concatenate([[0], np.cumsum(n_tok[nonempty])[:-1]])
    votes = np.add.reduceat(bits, bounds, axis=0)  # (n_nonempty, 64)
    maj = (2 * votes) > n_tok[nonempty][:, None]
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    with np.errstate(over="ignore"):
        out[nonempty] = (maj.astype(np.uint64) * weights).sum(axis=1,
                                                              dtype=np.uint64)
    return out


def simhash_pairs(docs: rd.Dataset, *, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> rd.Dataset:
    """Near-dup pairs by simhash: 4x16-bit chunk banding (pigeonhole
    complete for hamming <= 3), verified by true hamming distance.

    Deterministic across runs AND SQL-oracled: the banding is COMPLETE
    (not probabilistic) for hamming <= 3, so the output is exactly the
    set of pairs with hamming(simhash_a, simhash_b) <= max_hamming, and
    the DuckDB twin (``oracle.simhash_pairs_sql``) recomputes the token
    hashes + bit votes + cross-join hamming from the raw text."""

    def sigs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and text_col not in t.column_names:
            return _empty_band_table().append_column(
                "sim", pa.array([], pa.int64()))  # empty-schema block
        sh = simhash64(t[text_col].to_numpy(zero_copy_only=False))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        bands, buckets, dids, hashes = [], [], [], []
        for b in range(4):
            chunk = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.append(np.full(len(ids), b, dtype=np.int32))
            buckets.append(chunk)
            dids.append(ids)
            hashes.append(sh.astype(np.int64))
        return pa.table({"band": pa.array(np.concatenate(bands)),
                         "bucket": pa.array(np.concatenate(buckets)),
                         "doc_id": pa.array(np.concatenate(dids)),
                         "sim": pa.array(np.concatenate(hashes))})

    n_shards = resolve_shards(None)
    bucketed = docs.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)

    def add_shard(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t["bucket"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + t["band"].to_numpy().astype(np.uint64))
        return t.append_column("_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # One-pass dedup, same ownership rule as _pairs_from_buckets: the
        # 16-bit band chunks ARE slices of `sim`, so the first-agreeing
        # band is recomputed from the pair's xor — a (band, bucket) group
        # emits a pair only when its band is that first band.  Pair
        # generation is ONE pandas self-merge on (band, bucket) and the
        # xor/popcount/ownership math runs vectorized over ALL pairs —
        # never a Python loop over the (many, tiny) bucket groups.
        uniq = g.drop_duplicates(["band", "bucket", "doc_id"])
        left = uniq[["band", "bucket", "doc_id", "sim"]]
        m = left.merge(uniq[["band", "bucket", "doc_id", "sim"]],
                       on=["band", "bucket"], suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            return pd.DataFrame({"doc_a": pd.Series([], dtype=g["doc_id"].dtype),
                                 "doc_b": pd.Series([], dtype=g["doc_id"].dtype),
                                 "hamming": pd.Series([], dtype=np.int64)})
        x = (m["sim_a"].to_numpy().astype(np.uint64)
             ^ m["sim_b"].to_numpy().astype(np.uint64))
        agree = np.stack([(x >> np.uint64(16 * b)) & np.uint64(0xFFFF) == 0
                          for b in range(4)], axis=1)
        first = agree.argmax(axis=1)
        ham = np.unpackbits(np.ascontiguousarray(x).view(np.uint8)
                            .reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
        own = (first == m["band"].to_numpy()) & (ham <= max_hamming)
        return pd.DataFrame({"doc_a": m["doc_id_a"].to_numpy()[own],
                             "doc_b": m["doc_id_b"].to_numpy()[own],
                             "hamming": ham[own]})

    return (bucketed.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(pairs, batch_format="pandas"))


def embedding_near_dup_pairs(embeddings: rd.Dataset, *, vec_col: str = "embedding",
                             id_col: str = "vec_id", threshold: float = 0.95,
                             n_planes: int = 384, bands: int = 32,
                             seed: int = 11, verify: str = "auto",
                             broadcast_threshold: int = 200_000,
                             nrows: int | None = None,
                             dim: int | None = None) -> rd.Dataset:
    """Cosine near-dup pairs: random-hyperplane LSH buckets + exact verify.

    BANDING: 384 sign bits in 32 tables of 12 bits.  A 12-bit band
    collides for near-ORTHOGONAL pairs (the bulk of any corpus) with
    prob 2^-12, so the candidate floor is ~32/4096 = 0.8% of all pairs
    (the previous 4-bit bands collided for 1/16 of ALL pairs — measured
    540k candidates from 2k vectors).  RECALL: a cosine-s pair agrees
    per bit with prob 1-arccos(s)/pi, so recall = 1-(1-p_bit^12)^32 —
    0.996 at s=0.9, ~1.0 at s>=0.95, and EXACT duplicates always
    (identical vectors give identical signatures).  32 bands means the
    bh ownership vector would cost 256 B x 32 rows/doc through the
    bucket shuffle — the pairs-only second exchange is far cheaper
    (candidates << corpus at this collision floor).

    verify="auto" without ``nrows`` assumes large (join plan; see
    ``_plan_rows``) — pass nrows or verify="broadcast" on small known
    corpora."""
    rng = np.random.default_rng(seed)
    # dimensionality from a single row — never collect the corpus
    # dim hint avoids a whole upstream execution just to peek one row
    if dim is None:
        dim = len(embeddings.take(1)[0][vec_col])
    planes = rng.normal(size=(dim, n_planes))
    planes_ref = ray.put(planes)
    from optimizing_ray.pipelines.ann import _to_matrix

    def _cos_table(t: pa.Table, A: np.ndarray, B: np.ndarray) -> pa.Table:
        # vectorized exact cosine over all pairs in the batch
        if len(A):
            num = np.einsum("ij,ij->i", A, B)
            den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            cos = np.where(den > 0, num / np.maximum(den, 1e-300), 0.0)
        else:
            cos = np.zeros(0, dtype=np.float64)
        # emit AND threshold the floor-rounded value (the shared
        # engine<->SQL rounding formula): filtering the raw double would
        # make the row SET order-dependent for cosines within float dust
        # of the threshold (numpy BLAS vs DuckDB summation order)
        rounded = np.floor(cos * 1e6 + 0.5) / 1e6
        t = t.append_column("cosine", pa.array(rounded, pa.float64()))
        t = t.filter(pa.array(rounded >= threshold))
        return t.select(["doc_a", "doc_b", "cosine"])

    def sigs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # incl. empty-schema blocks (working notes);
            return _empty_band_table()  # (0,0) @ planes would also raise
        P = ray.get(planes_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bits = (_to_matrix(t[vec_col]) @ P) > 0  # (n, n_planes), zero-copy in
        per_band = n_planes // bands
        # pack each band's bits via matmul against powers of two —
        # no per-bit Python loop
        pows = (1 << np.arange(per_band, dtype=np.int64))[::-1]
        hs = np.ascontiguousarray(
            bits.reshape(len(ids), bands, per_band).astype(np.int64) @ pows)
        return _banded_table(ids, hs, with_bh=False)

    if verify == "auto":
        verify = "broadcast" if _plan_rows(nrows) <= broadcast_threshold else "join"

    if verify == "broadcast":
        # round-4 zero-shuffle small-corpus plan (the minhash/exact_dedup
        # precedent): ONE corpus leg emits (id, band hashes, vector),
        # driver self-merge generates candidates, ONE parallel exact-
        # cosine verify leg against the broadcast vector matrix.
        # Bounded driver-side by broadcast_threshold BY PLAN CHOICE.
        def vec_state(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], pa.int64()),
                    "_bh": pa.array([], pa.list_(pa.int64(), bands)),
                    "_vec": pa.array([], pa.list_(pa.float64()))})
            P = ray.get(planes_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            M = _to_matrix(t[vec_col])
            bits = (M @ P) > 0
            per_band = n_planes // bands
            pows = (1 << np.arange(per_band, dtype=np.int64))[::-1]
            hs = np.ascontiguousarray(
                bits.reshape(len(ids), bands, per_band).astype(np.int64) @ pows)
            flat = M.astype(np.float64).ravel()
            offs = np.arange(len(ids) + 1, dtype=np.int32) * M.shape[1]
            return pa.table({
                id_col: pa.array(ids),
                "_bh": pa.FixedSizeListArray.from_arrays(
                    pa.array(hs.ravel()), bands),
                "_vec": pa.ListArray.from_arrays(pa.array(offs),
                                                 pa.array(flat)),
            })

        parts = [p for p in ray.get(
            embeddings.select_columns([id_col, vec_col])
            .map_batches(vec_state, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=2048)
            .to_arrow_refs()) if p.num_rows]
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if not parts:
            return rd.from_arrow(empty)
        tab = pa.concat_tables(parts).combine_chunks()
        ids = tab[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        bh = (tab["_bh"].chunk(0).flatten().to_numpy(zero_copy_only=False)
              .reshape(n, bands))[order]
        vc = tab["_vec"].chunk(0)
        V = (vc.flatten().to_numpy(zero_copy_only=False)
             .reshape(n, -1))[order]
        ia, ib = _band_candidates(bh)
        if not len(ia):
            return rd.from_arrow(empty)
        v_ref = ray.put(np.ascontiguousarray(V))

        def check_bcast(t: pa.Table) -> pa.Table:
            from optimizing_ray.broadcast import cached
            Vm = cached(("emb_vecs", v_ref.hex()), lambda: ray.get(v_ref))
            pa_idx = t["_pa"].to_numpy()
            pb_idx = t["_pb"].to_numpy()
            out = _cos_table(t, Vm[pa_idx], Vm[pb_idx])
            return out

        ptab = pa.table({"doc_a": pa.array(ids[ia]),
                         "doc_b": pa.array(ids[ib]),
                         "_pa": pa.array(ia), "_pb": pa.array(ib)})
        step = max(1, -(-len(ia) // 32))
        chunks = [ptab.slice(s, step) for s in range(0, len(ia), step)]
        return rd.from_arrow(chunks).map_batches(
            check_bcast, batch_format="pyarrow", zero_copy_batch=True)

    bucketed = embeddings.map_batches(sigs, batch_format="pyarrow", zero_copy_batch=True)
    cand = _pairs_from_buckets(bucketed, with_bh=False)

    if verify == "join":
        # streaming bucket merges — handles the nested list<float> payload,
        # no driver materialization (the at-scale path)
        cand = _attach_payload(cand, embeddings, id_col=id_col, pair_col="doc_a",
                               src_col=vec_col, out_col="_vec_a")
        cand = _attach_payload(cand, embeddings, id_col=id_col, pair_col="doc_b",
                               src_col=vec_col, out_col="_vec_b")
        def check_join(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 and "doc_a" not in t.column_names:
                return pa.table({"doc_a": pa.array([], pa.int64()),
                                 "doc_b": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return _cos_table(t, _to_matrix(t["_vec_a"]), _to_matrix(t["_vec_b"]))

        return cand.map_batches(check_join, batch_format="pyarrow",
                                zero_copy_batch=True)

    raise ValueError(f"unknown verify plan {verify!r}")


def connected_components(pairs: pd.DataFrame, *, a: str = "doc_a",
                         b: str = "doc_b") -> dict:
    """Union-find over the (small, verified) candidate-pair set: id ->
    cluster representative (min member under the ids' NATIVE ordering —
    int ids compare numerically, so {2, 10} -> 2).  Driver-side ON
    PURPOSE — the verified pair set is orders of magnitude smaller than
    the corpus; when even the pair set outgrows one machine, use
    ``connected_components_distributed`` (the sharded min-label
    propagation below, same representative convention for int ids)."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(pairs[a], pairs[b]):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            try:
                lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            except TypeError:  # mixed-type ids: fall back to string order
                lo, hi = (rx, ry) if str(rx) <= str(ry) else (ry, rx)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components_distributed(pairs: rd.Dataset, *, a: str = "doc_a",
                                     b: str = "doc_b", n_shards: int | None = None,
                                     max_iters: int = 64,
                                     stats: dict | None = None) -> rd.Dataset:
    """Distributed min-label propagation over the verified-pair graph —
    the at-scale path the driver-side ``connected_components`` union-find
    names as its fallback (for when even the verified pair set outgrows
    one machine).  Returns a Dataset (id, rep) with rep = the component's
    minimum member.

    Per iteration (2 sharded exchanges, never one Ray group per node):
    candidate labels flow across edges (side-tagged union of edge rows and
    label rows sharded by hash(src); the kind tag keeps all payloads the
    id type — no null columns, which pandas would upcast to float), then
    each node takes the min of its candidates (shard by hash(node)).

    POINTER HALVING: each node also posts a request row keyed by its
    CURRENT label, answered in the same exchange with that label's label
    — the label graph shortcuts toward the minimum exponentially, so
    convergence is O(log diameter) rounds instead of O(diameter) (a
    512-node chain converges in ~10 rounds, not 511).  Fixpoint detected
    by a per-iteration changed count (labels materialize each round —
    bounded: one row per node); ``stats['rounds']`` reports the count."""
    n_shards = resolve_shards(n_shards)

    def shard_of(vals) -> np.ndarray:
        h = pd.util.hash_pandas_object(pd.Series(list(vals)), index=False).to_numpy()
        return (h % np.uint64(n_shards)).astype(np.int64)

    def sym(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty (possibly empty-schema) block: typed empty output —
            # an empty object array would become a NULL-typed column,
            # which pandas upcasts to float downstream (working notes)
            kt = t[a].type if a in t.column_names else pa.int64()
            return pa.table({"key": pa.array([], kt), "val": pa.array([], kt),
                             "kind": pa.array([], pa.int8()),
                             "_shard": pa.array([], pa.int64())})
        ca = t[a].to_numpy(zero_copy_only=False)
        cb = t[b].to_numpy(zero_copy_only=False)
        src = np.concatenate([ca, cb])
        dst = np.concatenate([cb, ca])
        return pa.table({"key": pa.array(src), "val": pa.array(dst),
                         "kind": pa.array(np.ones(len(src), np.int8)),
                         "_shard": pa.array(shard_of(src))})

    edges = pairs.map_batches(sym, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def init_labels(g: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(g["key"])
        return pd.DataFrame({"node": nodes, "label": nodes,
                             "changed": np.zeros(len(nodes), dtype=np.int64)})

    labels = (edges.groupby("_shard")
              .map_groups(init_labels, batch_format="pandas").materialize())

    def tag_label(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        # kind 0: node -> label fact; kind 2: request for label(label),
        # keyed by the label so the answer joins in the SAME exchange
        key = np.concatenate([node, lab])
        val = np.concatenate([lab, node])
        kind = np.concatenate([np.zeros(len(node), np.int8),
                               np.full(len(node), 2, np.int8)])
        return pa.table({"key": pa.array(key), "val": pa.array(val),
                         "kind": pa.array(kind),
                         "_shard": pa.array(shard_of(key))})

    def flow(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["kind"] == 0][["key", "val"]]
        edg = g[g["kind"] == 1][["key", "val"]]
        req = g[g["kind"] == 2][["key", "val"]]
        m = edg.merge(lab, on="key", how="inner", suffixes=("", "_lab"))
        # pointer halving: answer label(label) requests from the same
        # shard's label facts (request key IS the label id)
        m2 = req.merge(lab, on="key", how="inner", suffixes=("", "_lab"))
        # candidates: labels crossing edges (to the edge dst) + shortcut
        # labels (to the requester) + self labels (self rows marked so
        # take_min can emit the changed flag without an extra exchange)
        cand = pd.concat([
            pd.DataFrame({"dst": m["val"].to_numpy(),
                          "label": m["val_lab"].to_numpy(),
                          "is_self": np.zeros(len(m), bool)}),
            pd.DataFrame({"dst": m2["val"].to_numpy(),
                          "label": m2["val_lab"].to_numpy(),
                          "is_self": np.zeros(len(m2), bool)}),
            pd.DataFrame({"dst": lab["key"].to_numpy(),
                          "label": lab["val"].to_numpy(),
                          "is_self": np.ones(len(lab), bool)}),
        ])
        cand["_shard2"] = shard_of(cand["dst"])
        return cand

    def take_min(g: pd.DataFrame) -> pd.DataFrame:
        srt = g.sort_values(["dst", "label"], kind="stable")
        first = srt.drop_duplicates("dst", keep="first")
        olds = g[g["is_self"]][["dst", "label"]].rename(columns={"label": "_old"})
        out = first.merge(olds, on="dst", how="left")
        return pd.DataFrame({
            "node": out["dst"].to_numpy(),
            "label": out["label"].to_numpy(),
            "changed": (out["label"].to_numpy() != out["_old"].to_numpy())
            .astype(np.int64),
        })

    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        tagged = labels.map_batches(tag_label, batch_format="pyarrow",
                                    zero_copy_batch=True).union(edges)
        cand = tagged.groupby("_shard").map_groups(flow, batch_format="pandas")
        labels = cand.groupby("_shard2").map_groups(
            take_min, batch_format="pandas").materialize()
        # Dataset.sum on an EMPTY dataset returns None, not 0 — an empty
        # pair set must terminate after one round, not spin max_iters
        if not labels.sum("changed"):
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        # exhaustion would silently return NON-minimal representatives
        # (min-label moves one hop per round; a path component of
        # diameter > max_iters is still propagating) — fail loudly
        raise RuntimeError(
            f"connected_components_distributed did not converge in "
            f"{max_iters} iterations (component diameter exceeds it); "
            f"raise max_iters")

    def out_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": df["node"], "rep": df["label"]})

    return labels.map_batches(out_cols, batch_format="pandas")


def cluster_reps(items: rd.Dataset, pairs: rd.Dataset, *,
                 id_col: str = "doc_id", rep_col: str = "rep",
                 pair_a: str = "doc_a", pair_b: str = "doc_b",
                 nrows: int | None = None, n_shards: int | None = None,
                 broadcast_threshold: int = 200_000) -> rd.Dataset:
    """(id_col, rep_col) for EVERY item: rep = the minimum member of the
    item's connected component in the ``pairs`` graph; items in no pair
    are their own singleton representative.

    The shared labelling tail of every pairs->clusters operator
    (near-dup keep lists, spatial density clusters).  Plan gate (the
    dedup discipline): with ``nrows`` at or below the threshold the pair
    set is bounded BY PLAN CHOICE — driver union-find labels it in one
    pass and the (id -> rep) map ships once via ``ray.put`` (items take
    ONE lookup map leg, zero shuffles).  Above it, the sharded
    pointer-halving propagation runs and labels re-attach through a
    side-tagged shard exchange — the corpus is never collected."""
    n_shards = resolve_shards(n_shards)

    if nrows is not None and 0 <= nrows <= broadcast_threshold:
        from optimizing_ray.broadcast import cached

        ptabs = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        pdf = (pa.concat_tables(ptabs).to_pandas() if ptabs
               else pd.DataFrame({pair_a: [], pair_b: []}))
        rep = connected_components(pdf, a=pair_a, b=pair_b)
        ids = np.asarray(sorted(rep.keys()), dtype=np.int64)
        reps = (np.asarray([rep[i] for i in ids], dtype=np.int64)
                if len(ids) else np.empty(0, np.int64))
        lab_ref = ray.put((ids, reps))

        def label_batch(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or id_col not in t.column_names:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 rep_col: pa.array([], pa.int64())})
            ks, vs = cached(("cluster_reps_lab", lab_ref.hex()),
                            lambda: ray.get(lab_ref))
            did = (t[id_col].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            if len(ks):
                pos = np.clip(np.searchsorted(ks, did), 0, len(ks) - 1)
                out = np.where(ks[pos] == did, vs[pos], did)  # isolated = self
            else:
                out = did
            return pa.table({id_col: pa.array(did), rep_col: pa.array(out)})

        return items.map_batches(label_batch, batch_format="pyarrow",
                                 zero_copy_batch=True)

    labels = connected_components_distributed(pairs, a=pair_a, b=pair_b,
                                              n_shards=n_shards)

    def tag_items(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64()),
                             "is_lab": pa.array([], pa.bool_())})
        return pa.table({"id": t[id_col], "rep": t[id_col],
                         "is_lab": pa.array(np.zeros(t.num_rows, bool))})

    def tag_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id" not in t.column_names:
            return pa.table({"id": pa.array([], pa.int64()),
                             "rep": pa.array([], pa.int64()),
                             "is_lab": pa.array([], pa.bool_())})
        return pa.table({"id": t["id"], "rep": t["rep"],
                         "is_lab": pa.array(np.ones(t.num_rows, bool))})

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "id" not in t.column_names:
            return t.append_column("_shard", pa.array([], pa.int64()))
        h = pd.util.hash_pandas_object(
            pd.Series(t["id"].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    union = (items.map_batches(tag_items, batch_format="pyarrow",
                               zero_copy_batch=True)
             .union(labels.map_batches(tag_labels, batch_format="pyarrow",
                                       zero_copy_batch=True))
             .map_batches(add_shard, batch_format="pyarrow",
                          zero_copy_batch=True))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        base = g[~g["is_lab"]][["id"]]
        lab = g[g["is_lab"]][["id", "rep"]]
        out = base.merge(lab, on="id", how="left")
        rep = out["rep"].to_numpy()
        ids = out["id"].to_numpy()
        rep = np.where(pd.isna(rep), ids, rep)
        return pd.DataFrame({id_col: ids.astype(np.int64),
                             rep_col: rep.astype(np.int64)})

    return union.groupby("_shard").map_groups(attach, batch_format="pandas")


def near_dedup_keep(docs: rd.Dataset, *, text_col: str = "text",
                    id_col: str = "doc_id", num_perm: int = 64,
                    bands: int = 16, k_shingle: int = 5,
                    jaccard_threshold: float = 0.5,
                    nrows: int | None = None, n_shards: int | None = None,
                    broadcast_threshold: int = 200_000) -> rd.Dataset:
    """End-to-end near-deduplication keep list — the operator a training
    pipeline actually runs (pairs are an intermediate): MinHash+LSH
    candidate pairs -> exact-Jaccard verify -> connected components ->
    per-doc row ``(doc_id, rep_id, kept)`` where rep_id is the duplicate
    cluster's minimum member and kept = 1 iff this doc IS the
    representative (exactly one survivor per cluster; singletons keep
    themselves).

    Composition of ``minhash_lsh_pairs`` and ``cluster_reps`` — both
    stages share the ``nrows`` plan gate, so a small known corpus runs
    zero-shuffle end to end while the at-scale path stays fully
    sharded.  SQL twin: ``oracle.near_dedup_keep_sql`` (exact-Jaccard
    pair graph + recursive-CTE closure)."""
    pairs = minhash_lsh_pairs(docs, text_col=text_col, id_col=id_col,
                              num_perm=num_perm, bands=bands,
                              k_shingle=k_shingle,
                              jaccard_threshold=jaccard_threshold,
                              nrows=nrows,
                              broadcast_threshold=broadcast_threshold)
    labs = cluster_reps(docs, pairs, id_col=id_col, rep_col="rep_id",
                        nrows=nrows, n_shards=n_shards,
                        broadcast_threshold=broadcast_threshold)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "rep_id": pa.array([], pa.int64()),
                             "kept": pa.array([], pa.int64())})
        did = t[id_col].to_numpy(zero_copy_only=False)
        rep = t["rep_id"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: t[id_col], "rep_id": t["rep_id"],
                         "kept": pa.array((did == rep).astype(np.int64))})

    return labs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def build_fingerprint_store(docs: rd.Dataset, store_dir: str, *,
                            text_col: str = "text", id_col: str = "doc_id",
                            n_parts: int = 64) -> dict:
    """Persist the corpus's content fingerprints as a hash-prefix-
    partitioned parquet store — the state half of INCREMENTAL dedup
    (yesterday's corpus on disk, today's crawl streaming against it).
    Each part holds the SORTED h1 lane (plus h2 for the joint-128-bit
    check) of every doc whose ``h1 >> (64 - log2(n_parts))`` prefix
    lands there, so a new batch touches only the parts its own prefixes
    name.  The build is SHARDED (one hash-prefix exchange, each part
    sorts + writes inside its group — the manifest write_group shape;
    the corpus's hash table never collects driver-side).  Writes ride
    the tmp + os.replace atomic-rename discipline; rebuilding is
    idempotent.  Returns {"parts": n, "rows": n}."""
    import os

    shift = np.uint64(64 - int(np.log2(n_parts)))
    assert 1 << (64 - int(shift)) == n_parts, "n_parts must be a power of 2"

    def fp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int64())})
        h1, h2 = _content_hash128(t[text_col])
        part = (h1.view(np.uint64) >> shift).astype(np.int64)
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                         "_part": pa.array(part)})

    os.makedirs(store_dir, exist_ok=True)

    # SHARDED write (the manifest write_group shape): fingerprints ride
    # one hash-prefix exchange and each part sorts + writes inside its
    # group — the corpus's hash table is never collected driver-side
    # (16 bytes/doc is still terabytes at 10^12 docs)
    def write_part(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        if t.num_rows == 0 or "h1" not in t.column_names:
            return pa.table({"part": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        p = int(t["_part"][0].as_py())
        h1 = t["h1"].to_numpy(zero_copy_only=False)
        h2 = t["h2"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        path = os.path.join(store_dir, f"part={p:04d}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(pa.table({"h1": pa.array(h1[order]),
                                 "h2": pa.array(h2[order])}), tmp)
        os.replace(tmp, path)
        return pa.table({"part": pa.array([p], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    res = (docs.map_batches(fp, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_part").map_groups(write_part,
                                        batch_format="pyarrow")
           .to_pandas())
    n_rows = int(res["n"].sum()) if len(res) else 0
    return {"parts": len([f for f in os.listdir(store_dir)
                          if f.startswith("part=")
                          and f.endswith(".parquet")]), "rows": n_rows}


def filter_new_against_store(new_docs: rd.Dataset, store_dir: str, *,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             n_parts: int = 64,
                             stats: dict | None = None) -> rd.Dataset:
    """Incremental exact dedup: stream a new corpus and keep only docs
    whose content fingerprint is NOT in the on-disk store (plus the
    usual in-batch first-wins dedup of the new corpus itself is NOT
    applied — compose with ``exact_dedup`` when the increment can
    self-duplicate).  Each batch reads ONLY the store parts its own
    hash prefixes name, through the per-worker broadcast cache (a part
    loads once per worker, sorted arrays + searchsorted membership).
    ``stats['parts_total']`` reports the store width; the pruned-read
    property (a batch loads only the parts its prefixes name) is
    asserted by the store tests, which count the parts a skewed
    increment touches."""
    import os

    shift = np.uint64(64 - int(np.log2(n_parts)))
    assert 1 << (64 - int(shift)) == n_parts, "n_parts must be a power of 2"
    present = sorted(int(f[5:9]) for f in os.listdir(store_dir)
                     if f.startswith("part="))
    present_set = frozenset(present)

    def drop_known(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return t
        from optimizing_ray.broadcast import cached
        h1, h2 = _content_hash128(t[text_col])
        parts = (h1.view(np.uint64) >> shift).astype(np.int64)
        keep = np.ones(len(h1), dtype=bool)
        for p in np.unique(parts):
            if int(p) not in present_set:
                continue

            def _load(p=int(p)):
                import pyarrow.parquet as pq
                pt = pq.read_table(
                    os.path.join(store_dir, f"part={p:04d}.parquet"))
                return (pt["h1"].to_numpy(), pt["h2"].to_numpy())

            sh1, sh2 = cached(("fp_store", store_dir, int(p)), _load)
            m = parts == p
            h1m, h2m = h1[m], h2[m]
            pos = np.searchsorted(sh1, h1m)  # leftmost index of the run
            safe = np.clip(pos, 0, len(sh1) - 1)
            hit = (pos < len(sh1)) & (sh1[safe] == h1m)
            # joint-128-bit confirmation on the h1 matches: forward
            # probe within the (rare, short) equal-h1 run
            for i in np.flatnonzero(hit):
                j = pos[i]
                ok = False
                while j < len(sh1) and sh1[j] == h1m[i]:
                    if sh2[j] == h2m[i]:
                        ok = True
                        break
                    j += 1
                hit[i] = ok
            km = keep[m]
            km[hit] = False
            keep[m] = km
        return t.filter(pa.array(keep))

    if stats is not None:
        stats["parts_total"] = len(present)
    return new_docs.map_batches(drop_known, batch_format="pyarrow",
                                zero_copy_batch=True)


def append_to_fingerprint_store(new_docs: rd.Dataset, store_dir: str, *,
                                text_col: str = "text",
                                n_parts: int = 64) -> dict:
    """Fold an increment's fingerprints INTO the store — the nightly
    merge that follows ``filter_new_against_store``: per TOUCHED part,
    read + merge-sort + atomic replace; untouched parts are never
    rewritten (the tile-store compaction discipline applied to the
    dedup state).  Returns {"parts_touched": n, "rows_added": n}."""
    import os

    shift = np.uint64(64 - int(np.log2(n_parts)))
    assert 1 << (64 - int(shift)) == n_parts, "n_parts must be a power of 2"

    def fp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64())})
        h1, h2 = _content_hash128(t[text_col])
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    tabs = [t for t in ray.get(
        new_docs.map_batches(fp, batch_format="pyarrow",
                             zero_copy_batch=True).to_arrow_refs())
            if t.num_rows]
    if not tabs:
        return {"parts_touched": 0, "rows_added": 0}
    import pyarrow.parquet as pq
    allt = pa.concat_tables(tabs)
    h1 = allt["h1"].to_numpy()
    h2 = allt["h2"].to_numpy()
    part = (h1.view(np.uint64) >> shift).astype(np.int64)
    os.makedirs(store_dir, exist_ok=True)
    touched = 0
    for p in np.unique(part):
        m = part == p
        nh1, nh2 = h1[m], h2[m]
        path = os.path.join(store_dir, f"part={p:04d}.parquet")
        if os.path.exists(path):
            old = pq.read_table(path)
            nh1 = np.concatenate([old["h1"].to_numpy(), nh1])
            nh2 = np.concatenate([old["h2"].to_numpy(), nh2])
        order = np.lexsort((nh2, nh1))
        tmp = path + ".tmp"
        pq.write_table(pa.table({"h1": pa.array(nh1[order]),
                                 "h2": pa.array(nh2[order])}), tmp)
        os.replace(tmp, path)
        touched += 1
    return {"parts_touched": touched, "rows_added": int(len(h1))}


# --- exact set-similarity self-join (prefix filtering, PPJoin family) ---------

def exact_set_join_sets(ids: np.ndarray, starts: np.ndarray,
                        ends: np.ndarray, flat: np.ndarray, *,
                        theta_num: int, theta_den: int,
                        out_a: str = "doc_a", out_b: str = "doc_b",
                        verify_chunks: int = 32) -> rd.Dataset:
    """Exact Jaccard-threshold self-join over ALREADY-BUILT sorted-unique
    uint64 sets (ids ascending; set i = flat[starts[i]:ends[i]]) — the
    generic broadcast-plan core shared by ``set_similarity_join`` (token
    sets) and ``windows.trajectory_similarity`` (visited-tile sets).

    Candidates ride the prefix filter + per-element BAND SEARCH under
    the PPJoin length filter (den*min >= num*max is necessary for
    J >= θ, so both filters are lossless; the unfiltered hot-element
    pair explosion is never materialized); the verify is a parallel leg
    probing the broadcast set map with integer intersection counts.
    Output (out_a, out_b, inter, union_n, jaccard6)."""
    from optimizing_ray.broadcast import cached
    from optimizing_ray.functions.text import inter_pairs_grouped

    num, den = int(theta_num), int(theta_den)
    empty = pa.table({out_a: pa.array([], pa.int64()),
                      out_b: pa.array([], pa.int64()),
                      "inter": pa.array([], pa.int64()),
                      "union_n": pa.array([], pa.int64()),
                      "jaccard6": pa.array([], pa.int64())})
    if len(ids) == 0:
        return rd.from_arrow(empty)
    n_tok = ends - starts

    # prefix rows: first n - ceil(θn) + 1 sorted-unique hashes per set
    t_req = (num * n_tok + den - 1) // den  # ceil, nonneg ints
    plen = np.maximum(n_tok - t_req + 1, 0)
    doc_pos = np.repeat(np.arange(len(ids), dtype=np.int64), plen)
    tok_idx = (np.arange(int(plen.sum()), dtype=np.int64)
               + np.repeat(starts - np.r_[np.int64(0),
                                          np.cumsum(plen)[:-1]], plen))
    eh, ei = flat[tok_idx], doc_pos
    en = n_tok[ei]
    eorder = np.lexsort((ei, en, eh))   # runs of h, sizes ascending
    eh, ei, en = eh[eorder], ei[eorder], en[eorder]
    gid = np.cumsum(np.r_[0, eh[1:] != eh[:-1]]).astype(np.int64)
    span = np.int64(int(en.max()) + 2) if len(en) else np.int64(1)
    big = gid * span + en
    thr = np.minimum((en * den) // num, span - 2)
    hi = np.searchsorted(big, gid * span + thr, side="right")
    cnt = np.maximum(hi - np.arange(len(eh), dtype=np.int64) - 1, 0)
    lidx = np.repeat(np.arange(len(eh), dtype=np.int64), cnt)
    ridx = (np.arange(int(cnt.sum()), dtype=np.int64)
            + np.repeat(np.arange(len(eh), dtype=np.int64) + 1
                        - np.r_[np.int64(0), np.cumsum(cnt)[:-1]], cnt))
    pa_, pb_ = ei[lidx], ei[ridx]
    lo, hi_ = np.minimum(pa_, pb_), np.maximum(pa_, pb_)
    key = np.unique(lo * np.int64(len(ids)) + hi_)
    if not len(key):
        return rd.from_arrow(empty)
    ia, ib = key // len(ids), key % len(ids)

    sm_ref = ray.put((ids, starts, ends, flat))
    _no = np.empty(0, dtype=np.uint64)

    def _build_map():
        mids, s, e, f = ray.get(sm_ref)
        return {mids[i]: f[s[i]:e[i]] for i in range(len(mids))}

    def check(t: pa.Table) -> pa.Table:
        sm = cached(("setjoin_sh", sm_ref.hex()), _build_map)
        sh = lambda k: sm.get(k, _no)  # noqa: E731
        ids_a = t[out_a].to_numpy(zero_copy_only=False)
        ids_b = t[out_b].to_numpy(zero_copy_only=False)
        inter = inter_pairs_grouped(ids_a, ids_b, sh)
        na = np.fromiter((len(sh(x)) for x in ids_a), np.int64,
                         count=len(ids_a))
        nb = np.fromiter((len(sh(x)) for x in ids_b), np.int64,
                         count=len(ids_b))
        union = na + nb - inter
        keep = (den * inter >= num * union) & (union > 0)
        it, un = inter[keep], union[keep]
        return pa.table({out_a: pa.array(ids_a[keep].astype(np.int64)),
                         out_b: pa.array(ids_b[keep].astype(np.int64)),
                         "inter": pa.array(it),
                         "union_n": pa.array(un),
                         "jaccard6": pa.array(it * 1_000_000 // un)})

    ptab = pa.table({out_a: pa.array(ids[ia]), out_b: pa.array(ids[ib])})
    step = max(1, -(-len(ia) // verify_chunks))
    chunks = [ptab.slice(s, step) for s in range(0, len(ia), step)]
    return rd.from_arrow(chunks).map_batches(
        check, batch_format="pyarrow", zero_copy_batch=True)


def set_similarity_join(docs: rd.Dataset, *, text_col: str = "text",
                        id_col: str = "doc_id", theta_num: int = 19,
                        theta_den: int = 20, plan: str = "auto",
                        broadcast_threshold: int = 200_000,
                        nrows: int | None = None,
                        n_shards: int | None = None,
                        verify_chunks: int = 32) -> rd.Dataset:
    """EXACT Jaccard-threshold self-join over single-space token SETS —
    the exact-answer sibling of ``minhash_lsh_pairs`` (no probabilistic
    recall): every pair with J(a, b) >= theta_num/theta_den, verified by
    integer intersection counts.  Output (doc_a, doc_b, inter, union_n,
    jaccard6) with doc_a < doc_b and jaccard6 = inter*1e6 // union.

    Candidate generation is the PREFIX FILTER (Chaudhuri et al. SSJoin /
    Xiao et al. PPJoin): under any global token order, two sets with
    |∩| >= t must share a token among each set's first n - t + 1 tokens;
    J >= θ implies |∩| >= ceil(θ·max(na, nb)) >= ceil(θ·n) per side, so
    emitting only each doc's first n - ceil(θ·n) + 1 SORTED-UNIQUE token
    hashes (the hash order IS the global order — no frequency pass
    needed for correctness) loses no qualifying pair.  The verify gate
    is the division-free cross-multiply den*inter >= num*(na+nb-inter).

    Plans (the minhash_lsh_pairs discipline):

    * broadcast (nrows <= broadcast_threshold): ONE corpus leg computes
      per-doc sorted-unique token sets; the driver self-merges prefix
      rows into candidates (the corpus state collects driver-side in
      this plan regardless) and a parallel verify leg probes the
      broadcast token map — zero shuffles.
    * sharded (default without an nrows hint): prefix rows ride
      ``_pairs_from_buckets`` (hash(token)-sharded pandas self-merge +
      pairs-only dedup exchange), texts re-attach via
      ``_attach_payload`` bucket merges, verify re-tokenizes each
      DISTINCT doc per batch — the corpus is never collected.

    SQL twin ``oracle.set_similarity_join_sql`` is the UNFILTERED brute
    self-join on the same polynomial token hashes, so the oracle check
    proves the prefix filter lossless end-to-end."""
    from optimizing_ray.broadcast import cached
    from optimizing_ray.functions.text import (inter_pairs_grouped,
                                               unique_token_hashes_batch)

    num, den = int(theta_num), int(theta_den)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "inter": pa.array([], pa.int64()),
                      "union_n": pa.array([], pa.int64()),
                      "jaccard6": pa.array([], pa.int64())})

    def _verify_table(ids_a, ids_b, sh) -> pa.Table:
        inter = inter_pairs_grouped(ids_a, ids_b, sh)
        na = np.fromiter((len(sh(x)) for x in ids_a), np.int64,
                         count=len(ids_a))
        nb = np.fromiter((len(sh(x)) for x in ids_b), np.int64,
                         count=len(ids_b))
        union = na + nb - inter
        keep = (den * inter >= num * union) & (union > 0)
        ia, ib = ids_a[keep], ids_b[keep]
        it, un = inter[keep], union[keep]
        return pa.table({"doc_a": pa.array(ia.astype(np.int64)),
                         "doc_b": pa.array(ib.astype(np.int64)),
                         "inter": pa.array(it),
                         "union_n": pa.array(un),
                         "jaccard6": pa.array(it * 1_000_000 // un)})

    if plan == "auto":
        plan = ("broadcast" if _plan_rows(nrows) <= broadcast_threshold
                else "sharded")

    if plan == "broadcast":
        def doc_state(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or text_col not in t.column_names:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "_sh": pa.array([], pa.list_(pa.int64()))})
            flat, offs = unique_token_hashes_batch(t[text_col])
            return pa.table({
                id_col: t[id_col],
                "_sh": pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32)),
                    pa.array(flat.view(np.int64)))})

        parts = [p for p in ray.get(
            docs.select_columns([id_col, text_col])
            .map_batches(doc_state, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=2048)
            .to_arrow_refs()) if p.num_rows]
        if not parts:
            return rd.from_arrow(empty)
        tab = pa.concat_tables(parts).combine_chunks()
        ids = tab[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sh_col = tab["_sh"].chunk(0)
        flat = sh_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
        offs = np.asarray(sh_col.offsets, dtype=np.int64)
        starts, ends = offs[:-1][order], offs[1:][order]
        return exact_set_join_sets(ids, starts, ends, flat,
                                   theta_num=num, theta_den=den,
                                   verify_chunks=verify_chunks)

    # sharded plan: prefix rows -> bucket pair machinery -> joined verify
    def prefix_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return _empty_band_table()
        flat, offs = unique_token_hashes_batch(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n_tok = np.diff(offs)
        t_req = (num * n_tok + den - 1) // den
        plen = np.maximum(n_tok - t_req + 1, 0)
        tok_idx = (np.arange(int(plen.sum()), dtype=np.int64)
                   + np.repeat(offs[:-1] - np.r_[np.int64(0),
                                                 np.cumsum(plen)[:-1]], plen))
        return pa.table({
            "band": pa.array(np.zeros(len(tok_idx), np.int32)),
            "bucket": pa.array(flat[tok_idx].view(np.int64)),
            "doc_id": pa.array(np.repeat(ids, plen).astype(np.int64))})

    bucketed = docs.map_batches(prefix_rows, batch_format="pyarrow",
                                zero_copy_batch=True)
    cand = _pairs_from_buckets(bucketed, n_shards, with_bh=False)
    cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_a",
                           src_col=text_col, out_col="_text_a")
    cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_b",
                           src_col=text_col, out_col="_text_b")

    def check_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return empty
        ids_a = t["doc_a"].to_numpy(zero_copy_only=False)
        ids_b = t["doc_b"].to_numpy(zero_copy_only=False)
        texts = dict(zip(ids_a, t["_text_a"].to_numpy(zero_copy_only=False)))
        texts.update(zip(ids_b, t["_text_b"].to_numpy(zero_copy_only=False)))
        uids = list(texts)
        flat, offs = unique_token_hashes_batch(
            [texts[u] or "" for u in uids])
        shmap = {u: flat[offs[i]:offs[i + 1]] for i, u in enumerate(uids)}
        _no = np.empty(0, dtype=np.uint64)
        return _verify_table(ids_a, ids_b, lambda k: shmap.get(k, _no))

    return cand.map_batches(check_joined, batch_format="pyarrow",
                            zero_copy_batch=True)


def winnow_overlap_stats(docs: rd.Dataset, *, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 8, w: int = 4,
                         min_shared: int = 8, max_df: int = 64,
                         n_shards: int | None = None) -> pa.Table:
    """MOSS-style overlap detection over winnowed fingerprints: per doc,
    how many partner docs share >= ``min_shared`` DISTINCT selected
    fingerprints, and the maximum shared count — the winnowing covering
    property makes this a guaranteed detector for copied passages of
    length >= k + w - 1 (each shared passage contributes its selected
    grams).  Output (id_col, n_partners, max_shared) for docs with at
    least one partner, sorted by id.

    Plan (3 exchanges, all pair-bounded after the first):
    Fingerprints appearing in more than ``max_df`` docs are DROPPED
    before pairing (the MOSS common-substring mask: a gram shared by
    hundreds of docs is boilerplate, not evidence of copying — and its
    pair expansion is quadratic in df).  df is decided exactly and
    locally: all rows of an fp land in one fp-shard, so the cap costs
    no extra exchange; the SQL twin applies the identical HAVING gate.

    (1) winnow per batch (``functions.text.winnow_batch``), fold to
    DISTINCT (doc, fp) in-batch, exchange on hash(fp); per-fp df gate +
    pandas self-merge emits per-shard PARTIAL pair counts (a pair's fps
    span fp-shards).  (2) exchange on hash(doc_a) sums pair counts, gates
    >= min_shared, and emits both side rows pre-sharded by hash(doc).
    (3) exchange on hash(doc) folds per-doc partner count + max —
    one row per doc with partners, tiny driver merge.  SQL twin
    ``oracle.winnow_overlap_stats_sql`` (the unfiltered fps self-join
    brute)."""
    from optimizing_ray.config import resolve_shards
    from optimizing_ray.functions.text import winnow_batch

    n_shards = resolve_shards(n_shards)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def _shard_of(v: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = v.astype(np.uint64) * gold
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    fp_schema = pa.schema([("_doc", pa.int64()), ("_fp", pa.int64()),
                           ("_shard", pa.int64())])

    def fps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return fp_schema.empty_table()
        d, _, fp = winnow_batch(t[text_col], k=k, w=w)
        ids = (t[id_col].to_numpy(zero_copy_only=False)
               .astype(np.int64)[d])
        order = np.lexsort((fp, ids))
        ids, fp = ids[order], fp[order]
        keep = np.r_[True, (ids[1:] != ids[:-1]) | (fp[1:] != fp[:-1])]
        ids, fp = ids[keep], fp[keep]
        return pa.table({"_doc": pa.array(ids), "_fp": pa.array(fp),
                         "_shard": pa.array(_shard_of(fp))}).cast(fp_schema)

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_a": pd.Series([], dtype=np.int64),
                              "_b": pd.Series([], dtype=np.int64),
                              "_s": pd.Series([], dtype=np.int64),
                              "_shard2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        f = g[["_fp", "_doc"]]
        df = f.groupby("_fp", sort=False)["_doc"].transform("size")
        f = f[df.to_numpy() <= max_df]      # boilerplate-fp mask (exact:
        if not len(f):                      # an fp lives in ONE shard)
            return empty
        m = f.merge(f, on="_fp")
        m = m[m["_doc_x"].to_numpy() < m["_doc_y"].to_numpy()]
        if not len(m):
            return empty
        s = (m.groupby(["_doc_x", "_doc_y"], sort=False).size()
             .reset_index(name="_s"))
        a = s["_doc_x"].to_numpy(np.int64)
        return pd.DataFrame({"_a": a, "_b": s["_doc_y"].to_numpy(np.int64),
                             "_s": s["_s"].to_numpy(np.int64),
                             "_shard2": _shard_of(a)})

    def gate_sides(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_doc": pd.Series([], dtype=np.int64),
                              "_s": pd.Series([], dtype=np.int64),
                              "_shard3": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        s = (g.groupby(["_a", "_b"], sort=False)["_s"].sum()
             .reset_index())
        s = s[s["_s"].to_numpy() >= min_shared]
        if not len(s):
            return empty
        doc = np.r_[s["_a"].to_numpy(np.int64), s["_b"].to_numpy(np.int64)]
        sh = np.r_[s["_s"].to_numpy(np.int64), s["_s"].to_numpy(np.int64)]
        return pd.DataFrame({"_doc": doc, "_s": sh,
                             "_shard3": _shard_of(doc)})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                              "n_partners": pd.Series([], dtype=np.int64),
                              "max_shared": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        gg = g.groupby("_doc", sort=True)["_s"]
        return pd.DataFrame({id_col: gg.size().index.to_numpy(np.int64),
                             "n_partners": gg.size().to_numpy(np.int64),
                             "max_shared": gg.max().to_numpy(np.int64)})

    out = (docs.map_batches(fps, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_shard").map_groups(pair_partials,
                                         batch_format="pandas")
           .groupby("_shard2").map_groups(gate_sides,
                                          batch_format="pandas")
           .groupby("_shard3").map_groups(per_doc, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or id_col not in out.columns:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_partners": pa.array([], pa.int64()),
                         "max_shared": pa.array([], pa.int64())})
    out = out.sort_values(id_col)
    return pa.table({id_col: pa.array(out[id_col].to_numpy(np.int64)),
                     "n_partners": pa.array(out["n_partners"]
                                            .to_numpy(np.int64)),
                     "max_shared": pa.array(out["max_shared"]
                                            .to_numpy(np.int64))})


def containment_join(docs: rd.Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id", theta_num: int = 4,
                     theta_den: int = 5, plan: str = "auto",
                     probe_mod: int | None = None, probe_rem: int = 0,
                     broadcast_threshold: int = 200_000,
                     nrows: int | None = None,
                     n_shards: int | None = None) -> rd.Dataset:
    """EXACT containment-threshold join over single-space token SETS —
    the ASYMMETRIC sibling of ``set_similarity_join`` (SSJoin family):
    every ORDERED pair (a, b), a != b, with

        C(a -> b) = |A ∩ B| / |A| >= theta    (A mostly inside B)

    — the subset / quote / boilerplate-inclusion detector Jaccard
    can't express (a tiny doc fully inside a huge one has J ~ 0 but
    C = 1).  Output (doc_a, doc_b, inter, na, containment6) with
    doc_a the CONTAINED side, containment6 = inter*1e6 // na; both
    directions of a pair may qualify independently.

    Prefix filter (containment variant): |∩| >= t = ceil(θ·|A|)
    constrains only the PROBE side — A must share a token among its
    first |A| - t + 1 sorted-unique hashes — while the container side
    indexes ALL its tokens (no length upper bound exists: any
    sufficiently large B can contain A).  The length filter
    den*|B| >= num*|A| (|B| >= |∩| >= t) prunes candidates; the verify
    gate is the division-free den*inter >= num*na.  Both filters are
    lossless — the SQL twin ``oracle.containment_join_sql`` is the
    UNFILTERED brute, so a green row proves it end-to-end.

    ``probe_mod``/``probe_rem`` restrict the PROBE side to docs with
    id % probe_mod == probe_rem (the quote-detection framing: a
    deterministic probe set scanned against the whole corpus as
    containers) — on corpora drawn from a small shared vocabulary full
    containment is common, so an unrestricted self-join's output is
    O(n^2)-ish; the container side is never filtered.

    Plans (the set_similarity_join discipline): broadcast (nrows <=
    threshold) collects per-doc sets once, probes a driver token index
    and verifies against the broadcast set map — zero shuffles;
    sharded (default, no hint) side-tags PROBE-prefix rows and
    INDEX-all-token rows onto ONE hash(token) exchange (per-shard
    pandas P x I merge), dedups on a hash(pair) exchange, re-attaches
    texts via the bucket merge, and verifies per batch — the corpus is
    never collected."""
    from optimizing_ray.broadcast import cached
    from optimizing_ray.functions.text import (inter_pairs_grouped,
                                               unique_token_hashes_batch)

    num, den = int(theta_num), int(theta_den)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "inter": pa.array([], pa.int64()),
                      "na": pa.array([], pa.int64()),
                      "containment6": pa.array([], pa.int64())})

    def _verify_table(ids_a, ids_b, sh) -> pa.Table:
        inter = inter_pairs_grouped(ids_a, ids_b, sh)
        na = np.fromiter((len(sh(x)) for x in ids_a), np.int64,
                         count=len(ids_a))
        keep = (den * inter >= num * na) & (na > 0)
        ia, ib = ids_a[keep], ids_b[keep]
        it, nn = inter[keep], na[keep]
        return pa.table({"doc_a": pa.array(ia.astype(np.int64)),
                         "doc_b": pa.array(ib.astype(np.int64)),
                         "inter": pa.array(it),
                         "na": pa.array(nn),
                         "containment6": pa.array(it * 1_000_000 // nn)})

    if plan == "auto":
        plan = ("broadcast" if _plan_rows(nrows) <= broadcast_threshold
                else "sharded")

    if plan == "broadcast":
        def doc_state(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or text_col not in t.column_names:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "_sh": pa.array([], pa.list_(pa.int64()))})
            flat, offs = unique_token_hashes_batch(t[text_col])
            return pa.table({
                id_col: t[id_col],
                "_sh": pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32)),
                    pa.array(flat.view(np.int64)))})

        parts = [p for p in ray.get(
            docs.select_columns([id_col, text_col])
            .map_batches(doc_state, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=2048)
            .to_arrow_refs()) if p.num_rows]
        if not parts:
            return rd.from_arrow(empty)
        tab = pa.concat_tables(parts).combine_chunks()
        ids = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sh_col = tab["_sh"].chunk(0)
        flat = sh_col.flatten().to_numpy(zero_copy_only=False).view(
            np.uint64)
        offs = np.asarray(sh_col.offsets, dtype=np.int64)
        starts, ends = offs[:-1], offs[1:]
        n_tok = ends - starts
        # token index over ALL tokens (container side)
        owner = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
        tsort = np.argsort(flat, kind="stable")
        tok_s, own_s = flat[tsort], owner[tsort]
        # probe prefix rows under the (df, hash) global order — ANY
        # fixed order is lossless for the prefix filter; rarest-first
        # (classic PPJoin frequency order, free here since the corpus
        # is collected) keeps hot-token candidate volume minimal
        uniq_tok, df_cnt = np.unique(flat, return_counts=True)
        df_all = df_cnt[np.searchsorted(uniq_tok, flat)]
        t_req = (num * n_tok + den - 1) // den
        plen = np.maximum(n_tok - t_req + 1, 0)
        if probe_mod is not None:
            plen = np.where(ids % probe_mod == probe_rem, plen, 0)
        probe = np.repeat(np.arange(len(ids), dtype=np.int64), plen)
        by_rarity = np.lexsort((flat, df_all, owner))
        tok_idx = (np.arange(int(plen.sum()), dtype=np.int64)
                   + np.repeat(starts - np.r_[np.int64(0),
                                              np.cumsum(plen)[:-1]], plen))
        ph = flat[by_rarity][tok_idx]
        lo = np.searchsorted(tok_s, ph, side="left")
        hi = np.searchsorted(tok_s, ph, side="right")
        cnt = hi - lo
        pa_i = np.repeat(probe, cnt)
        gather = (np.arange(int(cnt.sum()), dtype=np.int64)
                  + np.repeat(lo - np.r_[np.int64(0),
                                         np.cumsum(cnt)[:-1]], cnt))
        pb_i = own_s[gather]
        keep = (pa_i != pb_i) & (den * n_tok[pb_i] >= num * n_tok[pa_i])
        pair = np.unique(pa_i[keep] * np.int64(len(ids)) + pb_i[keep])
        cand_a, cand_b = pair // len(ids), pair % len(ids)
        if len(cand_a) == 0:
            return rd.from_arrow(empty)
        sets = {int(ids[i]): flat[starts[i]:ends[i]]
                for i in np.unique(np.r_[cand_a, cand_b])}
        state_ref = ray.put((ids[cand_a], ids[cand_b], sets))
        cand = rd.range(len(cand_a)).map_batches(
            lambda t: _containment_verify_batch(t, state_ref, _verify_table),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=max(1, len(cand_a) // 32 + 1))
        return cand

    # ---- sharded plan ----
    n_shards = resolve_shards(n_shards)

    def token_rows(t: pa.Table) -> pa.Table:
        empty_r = pa.table({"bucket": pa.array([], pa.int64()),
                            "doc": pa.array([], pa.int64()),
                            "p": pa.array([], pa.int8()),
                            "nt": pa.array([], pa.int64()),
                            "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty_r
        flat, offs = unique_token_hashes_batch(t[text_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.diff(offs)
        # index leg: every token
        i_doc = np.repeat(ids, n_tok)
        i_nt = np.repeat(n_tok, n_tok)
        # probe leg: prefix tokens only
        t_req = (num * n_tok + den - 1) // den
        plen = np.maximum(n_tok - t_req + 1, 0)
        if probe_mod is not None:
            plen = np.where(ids % probe_mod == probe_rem, plen, 0)
        p_doc = np.repeat(ids, plen)
        p_nt = np.repeat(n_tok, plen)
        tok_idx = (np.arange(int(plen.sum()), dtype=np.int64)
                   + np.repeat(offs[:-1] - np.r_[np.int64(0),
                                                 np.cumsum(plen)[:-1]],
                               plen))
        bucket = np.r_[flat.view(np.int64), flat[tok_idx].view(np.int64)]
        doc = np.r_[i_doc, p_doc]
        side = np.r_[np.zeros(len(i_doc), np.int8),
                     np.ones(len(p_doc), np.int8)]
        nt = np.r_[i_nt, p_nt]
        with np.errstate(over="ignore"):
            sh = ((bucket.view(np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33))
        return pa.table({"bucket": pa.array(bucket), "doc": pa.array(doc),
                         "p": pa.array(side), "nt": pa.array(nt),
                         "_shard": pa.array((sh % np.uint64(n_shards))
                                            .astype(np.int64))})

    def pairs_of_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "_pshard": pd.Series([], dtype=np.int64)})
        pr = g[g["p"] == 1][["bucket", "doc", "nt"]]
        ix = g[g["p"] == 0][["bucket", "doc", "nt"]]
        m = pr.merge(ix, on="bucket", suffixes=("_a", "_b"))
        m = m[(m["doc_a"] != m["doc_b"])
              & (den * m["nt_b"] >= num * m["nt_a"])]
        m = m[["doc_a", "doc_b"]].drop_duplicates()
        a = m["doc_a"].to_numpy(np.int64)
        b = m["doc_b"].to_numpy(np.int64)
        with np.errstate(over="ignore"):
            h = (((a.astype(np.uint64) << np.uint64(32)) ^
                  b.astype(np.uint64))
                 * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return pd.DataFrame({"doc_a": a, "doc_b": b,
                             "_pshard": (h % np.uint64(n_shards))
                             .astype(np.int64)})

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return g[["doc_a", "doc_b"]].drop_duplicates()

    cand = (docs.map_batches(token_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("_shard").map_groups(pairs_of_shard,
                                          batch_format="pandas")
            .groupby("_pshard").map_groups(dedup_pairs,
                                           batch_format="pandas"))
    cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_a",
                           src_col=text_col, out_col="_text_a")
    cand = _attach_payload(cand, docs, id_col=id_col, pair_col="doc_b",
                           src_col=text_col, out_col="_text_b")

    def check_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_a" not in t.column_names:
            return empty
        ids_a = t["doc_a"].to_numpy(zero_copy_only=False)
        ids_b = t["doc_b"].to_numpy(zero_copy_only=False)
        texts = dict(zip(ids_a, t["_text_a"].to_numpy(zero_copy_only=False)))
        texts.update(zip(ids_b,
                         t["_text_b"].to_numpy(zero_copy_only=False)))
        uids = list(texts)
        flat, offs = unique_token_hashes_batch(
            [texts[u] or "" for u in uids])
        shmap = {u: flat[offs[i]:offs[i + 1]] for i, u in enumerate(uids)}
        _no = np.empty(0, dtype=np.uint64)
        return _verify_table(ids_a, ids_b, lambda k: shmap.get(k, _no))

    return cand.map_batches(check_joined, batch_format="pyarrow",
                            zero_copy_batch=True)


def _containment_verify_batch(t: pa.Table, state_ref, verify_fn) -> pa.Table:
    """Broadcast-plan verify leg for ``containment_join``: the candidate
    arrays + set map ride ray.put once; each worker verifies its index
    slice (the per-worker cache keeps re-gets free)."""
    from optimizing_ray.broadcast import cached
    ia, ib, sets = cached(("containment_cand", state_ref.hex()),
                          lambda: ray.get(state_ref))
    if t.num_rows == 0:
        return verify_fn(np.empty(0, np.int64), np.empty(0, np.int64),
                         lambda k: np.empty(0, np.uint64))
    idx = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    _no = np.empty(0, dtype=np.uint64)
    return verify_fn(ia[idx], ib[idx],
                     lambda k: sets.get(int(k), _no))

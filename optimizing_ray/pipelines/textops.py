"""Text-analysis pipeline stages over the documents table.

Actor-pool stages (compiled state per actor, T1/T3 pattern): language-ID,
quality scoring, token counting, document fingerprinting.  SQL-twinnable
outputs (token counts, char stats) carry exact integer semantics; the
heuristic scores are pytest-verified (non-SQL ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray.config import resolve_shards

from optimizing_ray.functions.text import TextAnalyzer, fingerprint64, token_count

__all__ = ["pack_sequences", "unigram_logprob", "bigram_logprob",
           "chunk_docs", "mix_corpus", "char_entropy",
           "dsir_sample", "source_quality_gate",
           "build_vocab", "importance_weights", "lang_confusion",
           "analyze_text", "doc_stats", "fingerprints", "heavy_hitters",
           "decontaminate", "repetition_stats", "pii_redact",
           "tfidf_top_terms", "dup_ngram_stats", "strip_dup_ngrams",
           "span_kind_rollup",
           "source_cap", "top_k_per_group", "train_split",
           "stratified_sample", "skyline_docs", "robust_quality_stats",
           "winnow_fingerprints", "span_dedup_stats", "collocations",
           "priority_sample", "typo_pairs", "source_drift"]


def analyze_text(docs: rd.Dataset, *, text_col: str = "text",
                 batch_size: int | None = 4096,
                 concurrency=None) -> rd.Dataset:  # kept for API compat;
    # stage is stateless tasks (parallelism tracks CPUs automatically)
    """lang_pred / lang_conf / quality / n_tokens columns appended.

    Stateless tasks + per-worker-process compiled-state cache
    (broadcast.cached) instead of an actor pool: the TextAnalyzer state
    is just compiled regexes/stopword sets, and autoscaling pools start
    at 1 actor and never ramp inside short stages (measured round 1 —
    the same fix as the join/raster stages)."""
    from optimizing_ray.broadcast import cached

    def analyze(batch: pa.Table) -> pa.Table:
        an = cached(("text_analyzer",), TextAnalyzer)
        res = an.analyze_batch(batch[text_col])
        for name, arr in res.items():
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return docs.map_batches(analyze, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def doc_stats(docs: rd.Dataset, *, text_col: str = "text") -> rd.Dataset:
    """SQL-twinnable per-doc stats: n_chars_calc (UTF-8 aware length),
    n_ws_tokens (whitespace token count)."""

    def stats(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.append_column("n_chars_calc", pc.cast(pc.utf8_length(t[text_col]), pa.int64()))
        t = t.append_column("n_ws_tokens", pa.array(token_count(t[text_col])))
        return t

    return docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(docs: rd.Dataset, *, text_col: str = "text",
                 window: int = 8) -> rd.Dataset:
    """Append a rolling-hash document fingerprint column (int64 view of
    the uint64 hash, parquet/SQL-friendly)."""

    def fp(t: pa.Table) -> pa.Table:
        f = fingerprint64(t[text_col], window=window)
        return t.append_column("fingerprint", pa.array(f.astype(np.int64)))

    return docs.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)


def distinct_values(docs: rd.Dataset, col: str) -> rd.Dataset:
    """Distinct values of one column with in-batch pre-dedup (the shuffle
    moves at most one row per (batch, value))."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        u = pc.unique(t[col])
        return pa.table({col: u})

    parts = docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _distinct_final(parts, col)


def _distinct_final(parts: rd.Dataset, col: str) -> rd.Dataset:
    import pandas as pd

    def add_shard(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t[col].to_numpy(zero_copy_only=False)), index=False).to_numpy()
        return t.append_column("_shard", pa.array((h % np.uint64(16)).astype(np.int64)))

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([col])[[col]]

    return (parts.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(dedup, batch_format="pandas"))


def top_k_per_group(docs: rd.Dataset, *, group_col: str, order_col: str,
                    id_col: str, k: int = 3, rank_name: str = "rank",
                    ascending: bool = False,
                    n_shards: int | None = None) -> rd.Dataset:
    """Top-k rows per group by (order_col desc, id_col asc) with in-batch
    partial top-k (each batch forwards at most k rows per group).
    ``ascending=True`` flips the order_col direction (bottom-k)."""
    import pandas as pd

    n_shards = resolve_shards(n_shards, floor=16)
    cols = list(dict.fromkeys([group_col, order_col, id_col]))

    def partial(g_t: pa.Table) -> pa.Table:
        df = g_t.select(cols).to_pandas()
        out = (df.sort_values([order_col, id_col], ascending=[ascending, True])
               .groupby(group_col, sort=False).head(k))
        return pa.Table.from_pandas(out, preserve_index=False)

    def add_shard(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t[group_col].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column("_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values([order_col, id_col], ascending=[ascending, True])
               .groupby(group_col, sort=False).head(k).copy())
        out[rank_name] = out.groupby(group_col, sort=False).cumcount() + 1
        return out.drop(columns=["_shard"])

    return (docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(final, batch_format="pandas"))


def source_cap(docs: rd.Dataset, *, group_col: str = "source",
               id_col: str = "doc_id", k: int = 20,
               rank_name: str = "src_rank",
               n_shards: int | None = None) -> rd.Dataset:
    """Per-source document cap — the per-domain cap of a training-data
    curation funnel: keep at most ``k`` docs per source, deterministically
    the k with the SMALLEST id (crawl order), with their 1-based rank.

    Scale shape: each batch forwards at most k rows per source seen in it
    (in-batch partial bottom-k), so the single hash(source) exchange moves
    O(k x sources) rows, never the corpus; the result is stable across
    block layout and resumes (pure function of the key set)."""
    return top_k_per_group(docs, group_col=group_col, order_col=id_col,
                           id_col=id_col, k=k, rank_name=rank_name,
                           ascending=True, n_shards=n_shards)


SAMPLE_MULT = 3_267_000_013  # odd, independent of the train_split family


def sample_per_group(docs: rd.Dataset, *, group_col: str = "source",
                     id_col: str = "doc_id", n: int = 5,
                     n_shards: int | None = None) -> rd.Dataset:
    """Deterministic n-per-group sample: exactly min(n, |group|) rows per
    group, chosen by ranking ids under an independent 2^32-wrap hash
    (h = (id * SAMPLE_MULT) mod 2^32 — the train_split permutation
    family; a plain odd multiply mod 2^64 would NOT permute small ids).
    Unlike stratified_sample's per-row keep-rate (binomial counts), this
    is the fixed-quota flavor a curation funnel uses for "take 5 docs
    from every domain for the eval set".

    Scale shape = source_cap: each batch forwards at most n rows per
    group it sees (in-batch partial bottom-n on the hash), so the single
    hash(group) exchange moves O(n x groups) rows.  Stable across block
    layout and resumes (pure function of the id set).  Guard: ids must
    stay below ~2^31 so id * SAMPLE_MULT fits int64 (driver ids do; at
    larger id spaces swap in the splitmix64 lane).
    """
    def add_h(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({group_col: pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "smp_h": pa.array([], pa.int64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (ids * np.int64(SAMPLE_MULT)) % np.int64(1 << 32)
        return t.append_column("smp_h", pa.array(h))

    withh = docs.map_batches(add_h, batch_format="pyarrow",
                             zero_copy_batch=True)
    return top_k_per_group(withh, group_col=group_col, order_col="smp_h",
                           id_col=id_col, k=n, rank_name="smp_rank",
                           ascending=True, n_shards=n_shards)


def train_split(docs: rd.Dataset, *, id_col: str = "doc_id",
                train_frac: float = 0.9, mult: int = 2_885_564_557) -> rd.Dataset:
    """Deterministic train/val assignment by id hash — stable across runs,
    resumable, and exactly reproducible in SQL (the driver-oracle frac
    arithmetic): split = 'train' iff ((id * mult) % 2^32) / 2^32 < frac."""

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = ((ids * np.int64(mult)) % np.int64(1 << 32)).astype(np.float64) / float(1 << 32)
        split = np.where(frac < train_frac, "train", "val")
        return t.append_column("split", pa.array(split.tolist(), pa.string()))

    return docs.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def heavy_hitters(docs: rd.Dataset, *, k: int = 50, text_col: str = "text",
                  n_shards: int | None = None) -> pa.Table:
    """Corpus-wide top-k tokens by count, ties by token asc — the heavy-
    hitters primitive of corpus analysis.  Plan: per-batch arrow-native
    tokenize (utf8_split_whitespace, zero Python per row) + in-batch
    unique/count partials, hash-of-token shard exchange (a token\'s
    partials all land in one shard, so per-shard counts are TOTAL and a
    per-shard top-k is a correct superset), then a 32 x k driver merge.
    Token semantics == oracle.heavy_hitters_sql (and the text_analysis
    tatoks CTE): whitespace split of trimmed text, lowercased, empties
    dropped."""
    import pandas as pd

    n_shards = resolve_shards(n_shards)
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.utf8_trim_whitespace(t[text_col])))
        toks = pc.utf8_lower(toks)
        toks = toks.filter(pc.not_equal(toks, ""))
        arr = toks.to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(arr, return_counts=True)
        return pa.table({"token": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "token" not in t.column_names:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        h = pd.util.hash_pandas_object(
            pd.Series(t["token"].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("token", sort=False)["n"].sum().reset_index()
        agg = agg.sort_values(["n", "token"],
                              ascending=[False, True]).head(k)
        return agg

    parts = (docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .map_batches(add_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_shard").map_groups(shard_topk, batch_format="pandas")
             .to_pandas())
    out = (parts.sort_values(["n", "token"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


STRAT_MULT = 2_885_564_557  # the train_split multiplier family


def stratified_sample(docs: rd.Dataset, *, rates: dict, id_col: str = "doc_id",
                      stratum_col: str = "lang", default_rate: float = 0.0,
                      mult: int = STRAT_MULT) -> rd.Dataset:
    """Deterministic per-stratum sampling (corpus rebalancing): keep a
    row iff ((id * mult) % 2^32) / 2^32 < rates[stratum] — the
    train_split hash discipline per group, so the sample is stable
    across runs/resumes and exactly reproducible in SQL
    (``oracle.stratified_sample_sql``).  Zero shuffles."""

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = ((ids * np.int64(mult)) % np.int64(1 << 32)
                ).astype(np.float64) / float(1 << 32)
        strata = t[stratum_col].to_numpy(zero_copy_only=False)
        rate = np.full(len(ids), default_rate)
        for k, v in rates.items():
            rate[strata == k] = v
        return t.filter(pa.array(frac < rate))

    return docs.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def decontaminate(docs: rd.Dataset, *, benchmark_mod: int = 97, n: int = 4,
                  id_col: str = "doc_id", text_col: str = "text",
                  emit: str = "hits") -> rd.Dataset:
    """Benchmark n-gram decontamination — the training-data hygiene op:
    flag every corpus doc sharing a word n-gram with the held-out
    benchmark suite (here derived deterministically as the docs with
    ``doc_id % benchmark_mod == 0``; in production a separate small
    table).  ``emit='hits'`` returns (doc_id, n_hits) for contaminated
    NON-benchmark docs, where n_hits counts the doc's n-gram POSITIONS
    that appear in the benchmark set (``oracle.decontaminate_sql``
    twin); ``emit='clean'`` returns the KEPT corpus instead — all input
    columns, benchmark docs and contaminated docs dropped (the curation
    funnel stage).

    Plan (zero shuffles): one column-pruned corpus leg projects the
    benchmark docs' distinct n-gram hashes (driver-side union is bounded
    by the BENCHMARK SUITE size — fixed, small, and independent of corpus
    scale, the canonical broadcast side at 100 TB); the sorted blocklist
    ships once via ray.put; one probe leg scans the corpus with a
    searchsorted membership test per batch.  Tokens/n-grams ride 64-bit
    polynomial hashes (collision caveat: functions/text.py module note).
    """
    import ray

    from optimizing_ray.functions.text import token_ngram_hashes_batch

    if emit not in ("hits", "clean"):
        raise ValueError(f"emit must be 'hits' or 'clean', got {emit!r}")

    def bench_grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({"gh": pa.array([], pa.uint64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % benchmark_mod == 0))
        if t.num_rows == 0:
            return pa.table({"gh": pa.array([], pa.uint64())})
        hv, _ = token_ngram_hashes_batch(t[text_col], n)
        return pa.table({"gh": pa.array(np.unique(hv))})

    parts = (docs.select_columns([id_col, text_col])
             .map_batches(bench_grams, batch_format="pyarrow",
                          zero_copy_batch=True)
             .take_all())  # bounded by the benchmark suite's n-gram count
    bl = np.unique(np.array([r["gh"] for r in parts], dtype=np.uint64))
    bl_ref = ray.put(bl)

    def probe(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % benchmark_mod != 0
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return empty
        ids = ids[keep]
        blk = ray.get(bl_ref)
        hv, voffs = token_ngram_hashes_batch(t[text_col], n)
        if len(hv) == 0 or len(blk) == 0:
            return empty
        pos = np.searchsorted(blk, hv)
        hit = (pos < len(blk)) & (blk[np.minimum(pos, len(blk) - 1)] == hv)
        seg = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        np.diff(voffs))
        hits = np.bincount(seg[hit], minlength=t.num_rows)
        flag = hits > 0
        return pa.table({"doc_id": pa.array(ids[flag]),
                         "n_hits": pa.array(hits[flag].astype(np.int64))})

    def probe_clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return t
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % benchmark_mod != 0
        t = t.filter(pa.array(keep))
        if t.num_rows == 0:
            return t
        blk = ray.get(bl_ref)
        hv, voffs = token_ngram_hashes_batch(t[text_col], n)
        if len(hv) == 0 or len(blk) == 0:
            return t
        pos = np.searchsorted(blk, hv)
        hit = (pos < len(blk)) & (blk[np.minimum(pos, len(blk) - 1)] == hv)
        seg = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        np.diff(voffs))
        hits = np.bincount(seg[hit], minlength=t.num_rows)
        return t.filter(pa.array(hits == 0))

    if emit == "clean":
        return docs.map_batches(probe_clean, batch_format="pyarrow",
                                zero_copy_batch=True)
    return (docs.select_columns([id_col, text_col])
            .map_batches(probe, batch_format="pyarrow", zero_copy_batch=True))


def repetition_stats(docs: rd.Dataset, *, id_col: str = "doc_id",
                     text_col: str = "text") -> rd.Dataset:
    """Gopher-style repetition quality signals per doc (single-space
    token semantics, ``oracle.repetition_stats_sql`` twin): token count,
    unique-token fraction, top-token fraction, duplicate-bigram fraction.
    Fractions are floor(x * 1e6 + 0.5) / 1e6-rounded on BOTH sides
    (Python/DuckDB round() disagree at halves).  One map leg, zero
    shuffles, all-vectorized (functions.text.repetition_profile_batch)."""
    from optimizing_ray.functions.text import repetition_profile_batch

    def stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "uniq_frac": pa.array([], pa.float64()),
                             "top_frac": pa.array([], pa.float64()),
                             "dup_bigram_frac": pa.array([], pa.float64())})
        p = repetition_profile_batch(t[text_col])
        nt = p["n_tokens"].astype(np.float64)
        uniq = np.floor(p["n_distinct"] / nt * 1e6 + 0.5) / 1e6
        top = np.floor(p["top_count"] / nt * 1e6 + 0.5) / 1e6
        nb = p["n_bigrams"]
        dup = np.zeros(len(nb))
        nz = nb > 0
        dup[nz] = np.floor((1.0 - p["n_distinct_bigrams"][nz] / nb[nz].astype(np.float64))
                           * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": t[id_col],
                         "n_tokens": pa.array(p["n_tokens"]),
                         "uniq_frac": pa.array(uniq),
                         "top_frac": pa.array(top),
                         "dup_bigram_frac": pa.array(dup)})

    return (docs.select_columns([id_col, text_col])
            .map_batches(stats, batch_format="pyarrow", zero_copy_batch=True))


# RE2 patterns shared by the engine (pyarrow.compute, RE2) and the oracle
# (DuckDB regexp_*, also RE2) — same dialect on both sides by construction.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-555-[0-9]{4}", "<PHONE>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
)


def pii_redact(docs: rd.Dataset, *, id_col: str = "doc_id",
               text_col: str = "text") -> rd.Dataset:
    """PII scrubbing for training corpora: count and redact email /
    phone / IPv4 matches per doc (``oracle.pii_redact_sql`` twin).  All
    regex work is RE2 inside arrow kernels (count_substring_regex +
    replace_substring_regex) — zero Python per row, one map leg, zero
    shuffles.  Counts are taken on the ORIGINAL text; replacements apply
    in PII_PATTERNS order (the patterns are mutually non-overlapping on
    any text: emails contain '@', phones contain '-', IPs are dotted
    digit runs)."""
    import pyarrow.compute as pc

    def redact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_emails": pa.array([], pa.int64()),
                             "n_phones": pa.array([], pa.int64()),
                             "n_ips": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string())})
        txt = t[text_col]
        counts = {name: pc.cast(pc.count_substring_regex(txt, pat),
                                pa.int64())
                  for name, pat, _ in PII_PATTERNS}
        clean = txt
        for _, pat, repl in PII_PATTERNS:
            clean = pc.replace_substring_regex(clean, pat, repl)
        return pa.table({"doc_id": t[id_col],
                         "n_emails": counts["email"],
                         "n_phones": counts["phone"],
                         "n_ips": counts["ip"],
                         "clean_text": clean})

    return docs.select_columns([id_col, text_col]).map_batches(
        redact, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms(docs: rd.Dataset, *, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id",
                    n_shards: int | None = None) -> rd.Dataset:
    """Per-doc top-k TF-IDF terms over the corpus — the canonical
    big-to-big token join: document frequencies are corpus-wide state
    that (at 100 TB vocab sizes) can neither broadcast nor sit on the
    driver.  The score is log-free EXACT integer arithmetic
    (``score = tf * 1_000_000 // df`` — monotone in tf and 1/df like
    tf-idf, and bit-identical in DuckDB; libm ln/log are not
    reproducible across engines), ties broken by token asc
    (``oracle.tfidf_top_terms_sql``).

    Plan (two sharded exchanges, both bounded):
    1. per-batch exact (doc, token, tf) partials (docs are rows, so tf
       is total within one batch) -> token-hash shard: each token's full
       posting set co-locates, DF totals in-shard, scores finalize
       there, and a per-(doc, shard) partial top-k caps the next
       exchange at k rows per doc per shard;
    2. doc-hash shard merges partials to the global per-doc top-k.
    Tokenization = the heavy_hitters/tatoks convention (whitespace split
    of trimmed text, lowercased, empties dropped)."""
    import pandas as pd
    import pyarrow.compute as pc

    n_shards = resolve_shards(n_shards)

    def tf_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "tf": pa.array([], pa.int64())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        lst = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t[text_col]))
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        counts = pc.list_value_length(lst).to_numpy().astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_rep = np.repeat(ids, counts)
        flat = pc.utf8_lower(pc.list_flatten(lst)).to_numpy(
            zero_copy_only=False)
        keep = flat != ""
        if not keep.any():
            return empty
        g = (pd.DataFrame({"doc_id": doc_rep[keep], "token": flat[keep]})
             .groupby(["doc_id", "token"], sort=False).size()
             .rename("tf").reset_index())
        g["tf"] = g["tf"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_tok_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "token" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        h = pd.util.hash_pandas_object(
            pd.Series(t["token"].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        df_tok = g.groupby("token", sort=False)["doc_id"].size()
        dfv = g["token"].map(df_tok).to_numpy().astype(np.int64)
        g = g[["doc_id", "token", "tf"]].copy()
        g["score"] = (g["tf"].to_numpy().astype(np.int64)
                      * np.int64(1_000_000)) // dfv
        return (g.sort_values(["score", "token"], ascending=[False, True],
                              kind="stable")
                .groupby("doc_id", sort=False).head(k))

    def add_doc_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_shard", pa.array((ids % n_shards).astype(np.int64)))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.sort_values(["score", "token"], ascending=[False, True],
                             kind="stable")
               .groupby("doc_id", sort=False).head(k).copy())
        out["rank"] = (out.groupby("doc_id", sort=False).cumcount()
                       + 1).astype(np.int64)
        return out[["doc_id", "token", "score", "rank"]]

    return (docs.select_columns([id_col, text_col])
            .map_batches(tf_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(add_tok_shard, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_shard").map_groups(shard_score, batch_format="pandas")
            .map_batches(add_doc_shard, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_shard").map_groups(final_topk, batch_format="pandas"))


def dup_ngram_stats(docs: rd.Dataset, *, n: int = 4, id_col: str = "doc_id",
                    text_col: str = "text",
                    n_shards: int | None = None) -> rd.Dataset:
    """Cross-document duplicated-substring signal (the distributed
    approximation of suffix-array exact-substring dedup): for every doc,
    how many of its word n-gram positions carry a gram that appears in
    >= 2 DISTINCT docs corpus-wide, plus the duplicated fraction
    (``oracle.dup_ngram_stats_sql`` twin; single-space token semantics).

    Plan (two sharded exchanges, both slim):
    1. per-batch (gram hash, doc_id) position rows -> gram-hash shard:
       each gram's full posting multiset co-locates, so its distinct-doc
       count is total in-shard; per-(doc, shard) partial (n_dup, n_grams)
       counts collapse the exchange to one row per doc per shard;
    2. doc-hash shard sums partials and emits the per-doc stats."""
    import pandas as pd

    from optimizing_ray.functions.text import token_ngram_hashes_batch

    n_shards = resolve_shards(n_shards)

    def grams(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "gh": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        hv, voffs = token_ngram_hashes_batch(t[text_col], n)
        if len(hv) == 0:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(ids, np.diff(voffs))
        gh = hv.view(np.int64)
        return pa.table({"doc_id": pa.array(doc), "gh": pa.array(gh),
                         "_shard": pa.array(
                             (hv % np.uint64(n_shards)).astype(np.int64))})

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("gh", sort=False)["doc_id"].nunique()
        dup = g["gh"].map(nd).to_numpy() >= 2
        out = (pd.DataFrame({"doc_id": g["doc_id"].to_numpy(), "dup": dup})
               .groupby("doc_id", sort=False)
               .agg(n_dup=("dup", "sum"), n_grams=("dup", "size"))
               .reset_index())
        out["n_dup"] = out["n_dup"].astype(np.int64)
        out["n_grams"] = out["n_grams"].astype(np.int64)
        return out

    def add_doc_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "_shard", pa.array((ids % n_shards).astype(np.int64)))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc_id", sort=False)
               .agg(n_dup=("n_dup", "sum"), n_grams=("n_grams", "sum"))
               .reset_index())
        nd = out["n_dup"].to_numpy().astype(np.int64)
        ng = out["n_grams"].to_numpy().astype(np.int64)
        out["n_dup"] = nd
        out["n_grams"] = ng
        out["dup_frac"] = np.floor(nd / ng * 1e6 + 0.5) / 1e6
        return out

    return (docs.select_columns([id_col, text_col])
            .map_batches(grams, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(shard_counts,
                                          batch_format="pandas")
            .map_batches(add_doc_shard, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("_shard").map_groups(final, batch_format="pandas"))


def span_kind_rollup(docs_with_spans: rd.Dataset, *,
                     spans_col: str = "spans") -> pa.Table:
    """Per-kind corpus rollup over the interleaved span column
    (list<struct<kind,text,media_ref,offset>> — the input_hint payload):
    span count, total text chars, media-ref count, max offset.  One map
    leg of per-batch partials (bounded by kind cardinality), driver
    combine — zero shuffles (``oracle.span_kind_rollup_sql`` twin)."""
    import pandas as pd
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.string()),
                          "n_spans": pa.array([], pa.int64()),
                          "text_chars": pa.array([], pa.int64()),
                          "n_media": pa.array([], pa.int64()),
                          "max_offset": pa.array([], pa.int64())})
        if t.num_rows == 0 or spans_col not in t.column_names:
            return empty
        ls = t[spans_col]
        if isinstance(ls, pa.ChunkedArray):
            ls = ls.combine_chunks()
        flat = pc.list_flatten(ls)
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(flat.field("text")).to_numpy().astype(np.int64)
        med = pc.not_equal(flat.field("media_ref"), "").to_numpy(
            zero_copy_only=False)
        off = flat.field("offset").to_numpy().astype(np.int64)
        rows = []
        for k in np.unique(kind):
            m = kind == k
            rows.append((str(k), int(m.sum()), int(tlen[m].sum()),
                         int(med[m].sum()), int(off[m].max())))
        ks, ns, tc, nm, mo = zip(*rows)
        return pa.table({"kind": pa.array(list(ks), pa.string()),
                         "n_spans": pa.array(list(ns), pa.int64()),
                         "text_chars": pa.array(list(tc), pa.int64()),
                         "n_media": pa.array(list(nm), pa.int64()),
                         "max_offset": pa.array(list(mo), pa.int64())})

    parts = (docs_with_spans.map_batches(partial, batch_format="pyarrow",
                                         zero_copy_batch=True).to_pandas())
    if parts.empty:
        return pa.table({"kind": pa.array([], pa.string()),
                         "n_spans": pa.array([], pa.int64()),
                         "text_chars": pa.array([], pa.int64()),
                         "n_media": pa.array([], pa.int64()),
                         "max_offset": pa.array([], pa.int64())})
    out = (parts.groupby("kind", sort=True)
           .agg(n_spans=("n_spans", "sum"), text_chars=("text_chars", "sum"),
                n_media=("n_media", "sum"), max_offset=("max_offset", "max"))
           .reset_index())
    for c in ("n_spans", "text_chars", "n_media", "max_offset"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def pack_sequences(docs: rd.Dataset, *, budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_parts: int | None = None) -> rd.Dataset:
    """Training-shard sequence packing: docs concatenated in ``id_col``
    order into one token stream, chunked into fixed ``budget``-token
    packs; each doc reports (n_tokens, pack_start, pack_id) where
    pack_start is its global token offset and pack_id the pack holding
    its first token — the GPT-style pack-and-chunk layout, as metadata.

    Token count = single-space split length (the decontaminate-family
    lockstep; SQL twin ``len(string_split(text, ' '))``).

    Scale shape: tokenization runs ONCE into a materialized slim
    (id, n_tokens) projection (16 B/row — the TeraSort trade: without it
    every prefix-sum pass would re-read the full text), then
    ``sort.global_running_offset`` does sample + per-partition sums +
    ONE range-partitioned exchange.  All arithmetic int64-exact, so the
    result is stable across block layouts and resumes."""
    import pyarrow.compute as pc
    from optimizing_ray.pipelines.sort import global_running_offset

    def ntok(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        n = pc.list_value_length(pc.split_pattern(t[text_col], " "))
        return pa.table({id_col: t[id_col],
                         "n_tokens": pc.cast(n, pa.int64())})

    slim = docs.map_batches(ntok, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    packed = global_running_offset(slim, key_col=id_col, val_col="n_tokens",
                                   offset_name="pack_start", n_parts=n_parts)

    def add_pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "pack_start" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "pack_start": pa.array([], pa.int64()),
                             "pack_id": pa.array([], pa.int64())})
        ps = t["pack_start"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("pack_id", pa.array(ps // budget))

    return packed.map_batches(add_pack, batch_format="pyarrow",
                              zero_copy_batch=True)


def unigram_logprob(docs: rd.Dataset, *, id_col: str = "doc_id",
                    text_col: str = "text",
                    broadcast_threshold: int = 200_000,
                    nrows: int | None = None,
                    n_shards: int | None = None) -> rd.Dataset:
    """Unigram language-model quality score — the cheap perplexity proxy
    of a training-data funnel: per doc, mean ln(corpus count of token)
    minus ln(total corpus tokens), i.e. the average token log-probability
    under the corpus's own unigram distribution.  Rare-token-heavy
    (low-quality / wrong-language / binary-ish) docs score low.

    Token identity = single-space split, 64-bit polynomial hash (the
    decontaminate collision caveat); the SQL twin counts token STRINGS.
    Scores are floor(x*1e6+0.5)/1e6-rounded at the END on both sides —
    per-doc float sums are order-ambiguous at ~1e-13, far inside the
    guard.

    Plans (the dedup nrows-gate discipline):
    * BROADCAST (nrows <= broadcast_threshold): per-batch (hash, count)
      partials merge driver-side into the vocab (bounded by distinct
      tokens), ln(count) rides ray.put, one scoring pass. Zero shuffles.
    * SHARDED (default with no hint): token rows and count partials
      union-exchange on hash(token) shards (counts are total per shard),
      per-shard join yields per-(doc, shard) partial ln-sums, ONE more
      doc-sharded exchange merges them; ln(T) folds in at the end from
      the count partials' own total. Wide text bytes never shuffle.
    """
    from optimizing_ray.functions.text import token_hashes_batch
    from optimizing_ray.pipelines.dedup import _plan_rows

    n_shards_r = resolve_shards(n_shards)

    def vocab_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"th": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        th, _ = token_hashes_batch(t[text_col])
        uk, cnt = np.unique(th.view(np.int64), return_counts=True)
        return pa.table({"th": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = docs.map_batches(vocab_partial, batch_format="pyarrow",
                             zero_copy_batch=True)

    if _plan_rows(nrows) <= broadcast_threshold:
        import ray
        tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return rd.from_arrow(pa.table({
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "logprob": pa.array([], pa.float64())}))
        th_all = np.concatenate([t["th"].to_numpy() for t in tabs])
        n_all = np.concatenate([t["n"].to_numpy() for t in tabs])
        uk, inv = np.unique(th_all, return_inverse=True)
        cnt = np.zeros(len(uk), dtype=np.int64)
        np.add.at(cnt, inv, n_all)
        total = int(cnt.sum())
        vocab_ref = ray.put((uk, np.log(cnt.astype(np.float64))))
        ln_t = float(np.log(float(total)))

        def score(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or text_col not in t.column_names:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64()),
                                 "logprob": pa.array([], pa.float64())})
            from optimizing_ray.broadcast import cached
            vk, vln = cached(("unigram_vocab", vocab_ref),
                             lambda: ray.get(vocab_ref))
            th, doffs = token_hashes_batch(t[text_col])
            ln = vln[np.searchsorted(vk, th.view(np.int64))]
            # every doc has >= 1 token (split of '' is ['']), so reduceat
            # segments are never empty
            s = np.add.reduceat(ln, doffs[:-1]) if len(ln) else np.zeros(0)
            ntok = np.diff(doffs).astype(np.float64)
            lp = np.floor((s / ntok - ln_t) * 1e6 + 0.5) / 1e6
            return pa.table({id_col: t[id_col],
                             "n_tokens": pa.array(np.diff(doffs)),
                             "logprob": pa.array(lp)})

        return docs.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)

    # --- sharded plan: two bounded exchanges, no driver vocab ---
    import pandas as pd

    def tok_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "th": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_side": pa.array([], pa.int64())})
        th, doffs = token_hashes_batch(t[text_col])
        ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False),
                        np.diff(doffs))
        return pa.table({id_col: pa.array(ids.astype(np.int64)),
                         "th": pa.array(th.view(np.int64)),
                         "n": pa.array(np.zeros(len(th), dtype=np.int64)),
                         "_side": pa.array(np.zeros(len(th), dtype=np.int64))})

    def cnt_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "th" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "th": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_side": pa.array([], pa.int64())})
        z = np.zeros(t.num_rows, dtype=np.int64)
        return pa.table({id_col: pa.array(z),
                         "th": t["th"],
                         "n": t["n"],
                         "_side": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "th" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "th": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "_side": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        th = t["th"].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            h = th * np.uint64(0x9E3779B97F4A7C15)
        sh = ((h >> np.uint64(33)) % np.uint64(n_shards_r)).astype(np.int64)
        return t.append_column("_shard", pa.array(sh))

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        cn = g[g["_side"] == 1].groupby("th", sort=False)["n"].sum()
        tk = g[g["_side"] == 0]
        if len(tk) == 0:
            return pd.DataFrame({id_col: np.zeros(0, dtype=np.int64),
                                 "s": np.zeros(0),
                                 "nt": np.zeros(0, dtype=np.int64),
                                 "_shard": np.zeros(0, dtype=np.int64),
                                 "t": np.zeros(0, dtype=np.int64)})
        ln = np.log(cn.loc[tk["th"].to_numpy()].to_numpy().astype(np.float64))
        df = pd.DataFrame({id_col: tk[id_col].to_numpy(), "_ln": ln})
        out = df.groupby(id_col, sort=False).agg(
            s=("_ln", "sum"), nt=("_ln", "size")).reset_index()
        out["nt"] = out["nt"].astype(np.int64)
        out["_shard"] = np.int64(g["_shard"].iloc[0])
        out["t"] = np.int64(cn.sum())  # this shard's token total
        return out

    union = (docs.map_batches(tok_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
             .union(parts.map_batches(cnt_rows, batch_format="pyarrow",
                                      zero_copy_batch=True)))
    # materialized: consumed twice (per-shard totals -> T, then the doc
    # exchange); O(docs x shards-touched) slim rows, never the corpus
    per_shard = (union.map_batches(add_shard, batch_format="pyarrow",
                                   zero_copy_batch=True)
                 .groupby("_shard").map_groups(shard_score,
                                               batch_format="pandas")
                 .materialize())

    # T = sum of per-shard token totals (each token counted in exactly
    # one shard); each map_groups output block is one shard, so the
    # per-batch unique below is one row per shard
    def shard_tot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "_shard" not in t.column_names:
            return pa.table({"_shard": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        sh = t["_shard"].to_numpy(zero_copy_only=False)
        tt = t["t"].to_numpy(zero_copy_only=False)
        uk, first = np.unique(sh, return_index=True)
        return pa.table({"_shard": pa.array(uk.astype(np.int64)),
                         "t": pa.array(tt[first].astype(np.int64))})

    st = (per_shard.map_batches(shard_tot, batch_format="pyarrow",
                                zero_copy_batch=True)
          .to_pandas().drop_duplicates("_shard"))
    total = int(st["t"].sum())
    ln_t = float(np.log(float(total))) if total else 0.0

    def add_dshard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "nt": pa.array([], pa.int64()),
                             "_dsh": pa.array([], pa.int64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * np.uint64(0x9E3779B97F4A7C15)
        sh = ((h >> np.uint64(33)) % np.uint64(n_shards_r)).astype(np.int64)
        return t.select([id_col, "s", "nt"]).append_column("_dsh", pa.array(sh))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(id_col, sort=False).agg(
            s=("s", "sum"), n_tokens=("nt", "sum")).reset_index()
        lp = np.floor((agg["s"].to_numpy() / agg["n_tokens"].to_numpy()
                       - ln_t) * 1e6 + 0.5) / 1e6
        return pd.DataFrame({id_col: agg[id_col].to_numpy(),
                             "n_tokens": agg["n_tokens"].to_numpy().astype(np.int64),
                             "logprob": lp})

    return (per_shard.map_batches(add_dshard, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("_dsh").map_groups(finalize, batch_format="pandas"))


def chunk_docs(docs: rd.Dataset, *, chunk_tokens: int = 64, stride: int = 48,
               id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Sliding-window document chunking — the RAG / context-window
    splitter: each doc becomes chunks of ``chunk_tokens`` single-space
    tokens starting every ``stride`` tokens (overlap = chunk - stride),
    one output row per chunk with its 0-based id, token start offset,
    token count, and the chunk TEXT (byte-exact ``' '.join(tokens[s:e])``,
    which for a single-space split is a contiguous byte slice of the
    original doc — no re-join allocation per token).

    Fully vectorized per batch: arrow split offsets give every token's
    byte position, chunk blobs are one fancy-indexed gather from the
    batch text blob.  Zero shuffles — a pure flat-map; output rows are a
    deterministic function of the doc, so the stage is resume-stable.
    SQL twin ``oracle.chunk_docs_sql`` (list_slice + array_to_string)."""
    C, S = int(chunk_tokens), int(stride)
    assert C >= 1 and S >= 1

    def chunk(t: pa.Table) -> pa.Table:
        return chunk_batch(t, C, S, id_col=id_col, text_col=text_col)

    return docs.map_batches(chunk, batch_format="pyarrow",
                            zero_copy_batch=True)


def chunk_batch(t: pa.Table, C: int, S: int, *, id_col: str = "doc_id",
                text_col: str = "text") -> pa.Table:
    """The chunk_docs per-batch kernel (module-level so the property
    suite can drive it without a Ray session)."""
    import pyarrow.compute as pc
    from optimizing_ray.functions.text import _as_string_array, _utf8_blob

    if True:  # (kept indentation of the original closure body)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "chunk_id": pa.array([], pa.int64()),
                          "chunk_start": pa.array([], pa.int64()),
                          "n_chunk_tokens": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        arr = _as_string_array(t[text_col])
        data, doc_offs = _utf8_blob(arr)
        lists = pc.split_pattern(arr, " ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        ntok = pc.list_value_length(lists).to_numpy().astype(np.int64)
        toks = pc.list_flatten(lists)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        _, tok_offs = _utf8_blob(toks)
        tl = np.diff(tok_offs)                      # token byte lengths
        # token k's byte START inside its doc: cumsum of (len+1) rebased
        # per doc (the +1 per separator; rebasing cancels the per-doc
        # overcount)
        ccs = np.concatenate([[0], np.cumsum(tl + 1)])
        doc_first = np.concatenate([[0], np.cumsum(ntok)])  # flat index
        tok_start_in_doc = ccs[:-1] - np.repeat(ccs[doc_first[:-1]], ntok)
        tok_end_in_doc = tok_start_in_doc + tl      # byte END (excl)

        n_chunks = (ntok - 1) // S + 1              # ntok >= 1 always
        total = int(n_chunks.sum())
        if total == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(ntok), dtype=np.int64), n_chunks)
        cstarts = np.concatenate([[0], np.cumsum(n_chunks)])
        chunk_id = np.arange(total, dtype=np.int64) - np.repeat(
            cstarts[:-1], n_chunks)
        s_tok = chunk_id * S
        e_tok = np.minimum(s_tok + C, ntok[doc_idx])
        # flat token indices -> byte range inside the batch text blob
        first_flat = doc_first[doc_idx]
        b_start = (doc_offs[doc_idx]
                   + tok_start_in_doc[first_flat + s_tok])
        b_end = (doc_offs[doc_idx]
                 + tok_end_in_doc[first_flat + e_tok - 1])
        L = (b_end - b_start).astype(np.int64)
        out_offs = np.concatenate([[0], np.cumsum(L)]).astype(np.int32)
        idx = (np.arange(int(out_offs[-1]), dtype=np.int64)
               - np.repeat(out_offs[:-1].astype(np.int64), L)
               + np.repeat(b_start, L))
        blob = data[idx]
        chunk_text = pa.StringArray.from_buffers(
            total, pa.py_buffer(out_offs.tobytes()),
            pa.py_buffer(blob.tobytes()))
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[doc_idx].astype(np.int64)),
                         "chunk_id": pa.array(chunk_id),
                         "chunk_start": pa.array(s_tok),
                         "n_chunk_tokens": pa.array(e_tok - s_tok),
                         "chunk_text": chunk_text})


def mix_corpus(docs: rd.Dataset, *, targets: dict, budget_tokens: int,
               id_col: str = "doc_id", lang_col: str = "lang",
               text_col: str = "text", mult: int = STRAT_MULT) -> rd.Dataset:
    """Corpus mixing — rebalance per-language token mass toward target
    fractions under a total token budget (the static data-mixing step of
    training-set assembly): per language, keep rate
    ``min(1, budget * targets[lang] / lang_tokens)``; docs kept by the
    deterministic train_split id-hash, so the sample is stable across
    runs / resumes and exactly reproducible in SQL.  Languages outside
    ``targets`` get rate 0.

    Scale shape: tokenization runs ONCE into a materialized slim
    (id, lang, n_tokens) projection; per-language totals are per-batch
    partials merged driver-side (bounded by the language set); the
    filter pass is zero-shuffle.  Output: kept (doc_id, lang, n_tokens).
    """
    import pyarrow.compute as pc
    import ray

    def slim_f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             lang_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        n = pc.list_value_length(pc.split_pattern(t[text_col], " "))
        return pa.table({id_col: t[id_col], lang_col: t[lang_col],
                         "n_tokens": pc.cast(n, pa.int64())})

    slim = docs.map_batches(slim_f, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def lang_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lang_col not in t.column_names:
            return pa.table({lang_col: pa.array([], pa.string()),
                             "tl": pa.array([], pa.int64())})
        df = t.select([lang_col, "n_tokens"]).to_pandas()
        agg = df.groupby(lang_col, sort=False)["n_tokens"].sum().reset_index()
        return pa.table({lang_col: pa.array(agg[lang_col].astype(str)),
                         "tl": pa.array(agg["n_tokens"].to_numpy().astype(np.int64))})

    parts = (slim.map_batches(lang_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
    totals = parts.groupby(lang_col)["tl"].sum()
    # rate = min(1, (budget * frac) / T_l) — ONE multiply then ONE divide,
    # the exact IEEE op order the SQL twin uses
    rates = {lang: min(1.0, (float(budget_tokens) * float(frac)) / float(totals[lang]))
             for lang, frac in targets.items() if lang in totals.index}
    rates_ref = ray.put(rates)

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             lang_col: pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        from optimizing_ray.broadcast import cached
        r = cached(("mix_rates", rates_ref), lambda: ray.get(rates_ref))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = ((ids * np.int64(mult)) % np.int64(1 << 32)
                ).astype(np.float64) / float(1 << 32)
        langs = t[lang_col].to_numpy(zero_copy_only=False)
        rate = np.zeros(len(ids))
        for k, v in r.items():
            rate[langs == k] = v
        return t.filter(pa.array(frac < rate))

    return slim.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)


def build_vocab(docs: rd.Dataset, *, text_col: str = "text",
                min_count: int = 5, n_shards: int | None = None) -> pa.Table:
    """Tokenizer vocabulary: global single-space token counts with a
    min-count cutoff and a deterministic global rank — the vocabulary-
    prep step of tokenizer training.  Output (term, cnt, term_rank),
    term_rank = row number under (cnt DESC, term byte-order ASC).

    Token semantics: ``string_split(text, ' ')`` with empties dropped —
    the decontaminate/pack_sequences single-space lockstep family (NOT
    heavy_hitters' lowercased whitespace family).  Plan: per-batch
    arrow-native split + in-batch unique/count partials, hash(term)
    shard exchange (a term's partials all land in one shard, so the
    min-count cutoff per shard is exact), then a driver-side rank over
    the SURVIVING vocabulary — bounded by the key space after the
    cutoff, orders of magnitude smaller than the corpus (the
    heavy_hitters discipline).  SQL twin: ``oracle.build_vocab_sql``."""
    import pandas as pd
    import pyarrow.compute as pc

    n_shards = resolve_shards(n_shards)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        arr = toks.to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(arr, return_counts=True)
        return pa.table({"term": pa.array(uk),
                         "cnt": pa.array(cnt.astype(np.int64))})

    def add_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "term" not in t.column_names:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        h = pd.util.hash_pandas_object(
            pd.Series(t["term"].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def shard_merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("term", sort=False)["cnt"].sum().reset_index()
        return agg[agg["cnt"] >= min_count]

    parts = (docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .map_batches(add_shard, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("_shard").map_groups(shard_merge,
                                           batch_format="pandas")
             .to_pandas())
    out = (parts.sort_values(["cnt", "term"], ascending=[False, True])
           .reset_index(drop=True))
    out["cnt"] = out["cnt"].astype(np.int64)
    out["term_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def importance_weights(docs: rd.Dataset, *, target_lang: str = "en",
                       id_col: str = "doc_id", text_col: str = "text",
                       lang_col: str = "lang",
                       n_buckets: int = 4096) -> rd.Dataset:
    """DSIR-shaped importance weights (Xie et al. 2023 shape): score each
    document by how much more likely its tokens are under the TARGET
    distribution (docs with ``lang_col == target_lang``) than under the
    RAW corpus distribution, over ``n_buckets`` hashed unigram buckets
    with add-1 smoothing:

        weight(doc) = sum_tok [ ln((tc[b]+1)/(T+B)) - ln((rc[b]+1)/(R+B)) ]
                    = sum_tok (ln(tc[b]+1) - ln(rc[b]+1))
                      + n_tokens * (ln(R+B) - ln(T+B))

    with b = token_hash64 % B.  High-weight docs look like the target —
    the importance-resampling signal of a data-mixture pipeline.

    Scale shape: hashing into B buckets makes the statistics pass
    B-BOUNDED BY CONSTRUCTION (the DSIR design choice) — per-batch dense
    (bucket, rc, tc) partials merge driver-side into two length-B
    arrays, the per-bucket log-ratio table rides ``ray.put``, and one
    scoring pass streams the corpus.  Zero shuffles at any corpus size.

    Output (doc_id, n_tokens, weight), weight floor(x*1e6+0.5)/1e6 at
    the END (per-doc float sums are order-ambiguous at ~1e-13).  SQL
    twin ``oracle.importance_weights_sql`` computes the SAME polynomial
    token hash via a powers-of-base table (exact for ASCII corpora —
    ``ord`` is the UTF-8 byte for ASCII; the engine hashes raw bytes)."""
    import ray
    from optimizing_ray.functions.text import token_hashes_batch

    B = n_buckets

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"b": pa.array([], pa.int64()),
                             "rc": pa.array([], pa.int64()),
                             "tc": pa.array([], pa.int64())})
        th, doffs = token_hashes_batch(t[text_col])
        b = (th % np.uint64(B)).astype(np.int64)
        is_tgt = np.asarray(t[lang_col].to_numpy(zero_copy_only=False)
                            == target_lang)
        tok_tgt = np.repeat(is_tgt, np.diff(doffs))
        rc = np.bincount(b, minlength=B)
        tc = np.bincount(b[tok_tgt], minlength=B)
        return pa.table({"b": pa.array(np.arange(B, dtype=np.int64)),
                         "rc": pa.array(rc.astype(np.int64)),
                         "tc": pa.array(tc.astype(np.int64))})

    tabs = [t for t in ray.get(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    rc = np.zeros(B, dtype=np.int64)
    tc = np.zeros(B, dtype=np.int64)
    for t in tabs:
        bb = t["b"].to_numpy()
        rc[bb] += t["rc"].to_numpy()
        tc[bb] += t["tc"].to_numpy()
    w = np.log(tc.astype(np.float64) + 1.0) - np.log(rc.astype(np.float64) + 1.0)
    const = float(np.log(float(rc.sum()) + B) - np.log(float(tc.sum()) + B))
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64())})
        from optimizing_ray.broadcast import cached
        wv = cached(("dsir_w", w_ref), lambda: ray.get(w_ref))
        th, doffs = token_hashes_batch(t[text_col])
        b = (th % np.uint64(B)).astype(np.int64)
        tw = wv[b]
        s = np.add.reduceat(tw, doffs[:-1]) if len(tw) else np.zeros(0)
        n = np.diff(doffs)
        wt = np.floor((s + n * const) * 1e6 + 0.5) / 1e6
        return pa.table({id_col: t[id_col],
                         "n_tokens": pa.array(n.astype(np.int64)),
                         "weight": pa.array(wt)})

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def lang_confusion(docs: rd.Dataset, *, lang_col: str = "lang",
                   text_col: str = "text") -> pa.Table:
    """Language-ID confusion matrix — the evaluation view of the
    TextAnalyzer gate: counts per (declared lang, predicted lang).
    Per-batch partial counts (bounded by langs^2), driver merge (the
    tile_counts discipline).  Output (lang, lang_pred, n) sorted."""
    import pandas as pd

    ds = analyze_text(docs, text_col=text_col)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or lang_col not in t.column_names:
            return pa.table({"lang": pa.array([], pa.string()),
                             "lang_pred": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"lang": t[lang_col].to_numpy(zero_copy_only=False),
                           "lang_pred": t["lang_pred"]
                           .to_numpy(zero_copy_only=False)})
        agg = (df.groupby(["lang", "lang_pred"], sort=False)
               .size().rename("n").reset_index())
        agg["n"] = agg["n"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    import ray
    tabs = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"lang": pa.array([], pa.string()),
                         "lang_pred": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = pa.concat_tables(tabs).to_pandas()
    out = (df.groupby(["lang", "lang_pred"], sort=True)["n"].sum()
           .reset_index())
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _strip_rebuild(texts, ids: np.ndarray, dup_doc: np.ndarray,
                   dup_pos: np.ndarray, n: int) -> dict:
    """The strip_dup_ngrams per-shard rewrite kernel (module-level so the
    property suite can drive it without a Ray session): given the shard's
    doc texts, their ids, and the (doc, gram-start) rows of duplicated
    n-grams, cut every covered token and re-join survivors with single
    spaces.  Fully vectorized: coverage is one diff/cumsum pass over flat
    token positions; the output text is ONE fancy-indexed gather over the
    token byte blob (chunk_batch gather discipline) — no per-doc Python.

    Returns {"clean_text": StringArray, "n_tokens": int64[], "n_removed":
    int64[]} aligned with ``ids``."""
    import pyarrow.compute as pc

    from optimizing_ray.functions.text import _as_string_array, _utf8_blob

    arr = _as_string_array(texts)
    lists = pc.split_pattern(arr, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    ntok = pc.list_value_length(lists).to_numpy().astype(np.int64)
    toks = pc.list_flatten(lists)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    tdata, toffs = _utf8_blob(toks)
    n_docs = len(ntok)
    total = int(ntok.sum())
    doc_first = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(ntok, out=doc_first[1:])

    # duplicated gram starts -> flat token index; cover [p, p+n) per gram
    # (gram starts satisfy p + n <= ntok, so the -1 lands at most on the
    # doc boundary and never bleeds into the next doc)
    order = np.argsort(ids, kind="stable")
    row = order[np.searchsorted(ids[order], dup_doc)]
    flat_lo = doc_first[row] + dup_pos
    delta = np.zeros(total + 1, dtype=np.int64)
    np.add.at(delta, flat_lo, 1)
    np.add.at(delta, flat_lo + n, -1)
    cover = np.cumsum(delta[:total]) > 0
    kept = np.flatnonzero(~cover)

    # one gather builds every surviving token + a trailing-space byte per
    # token (sentinel byte appended to the blob); per-doc final spaces
    # drop via one boolean compress
    tl = np.diff(toffs).astype(np.int64)
    starts = toffs[:-1].astype(np.int64)
    out_len = tl[kept] + 1
    off = np.zeros(len(kept) + 1, dtype=np.int64)
    np.cumsum(out_len, out=off[1:])
    src = np.empty(len(tdata) + 1, dtype=np.uint8)
    src[:len(tdata)] = tdata
    src[len(tdata)] = 0x20
    idx = (np.arange(int(off[-1]), dtype=np.int64)
           - np.repeat(off[:-1], out_len) + np.repeat(starts[kept], out_len))
    if len(kept):
        idx[off[1:] - 1] = len(tdata)
    blob = src[idx]

    kd = np.searchsorted(doc_first, kept, side="right") - 1
    cnt = np.zeros(n_docs, dtype=np.int64)
    np.add.at(cnt, kd, 1)
    doc_out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(doc_out, kd, out_len)
    keep_byte = np.ones(len(blob), dtype=bool)
    doc_end = np.cumsum(doc_out)
    nz = cnt > 0
    keep_byte[doc_end[nz] - 1] = False
    final = blob[keep_byte]
    out_offs = np.zeros(n_docs + 1, dtype=np.int32)
    np.cumsum(doc_out - nz, out=out_offs[1:])
    clean = pa.StringArray.from_buffers(
        n_docs, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(final.tobytes()))
    return {"clean_text": clean, "n_tokens": ntok,
            "n_removed": ntok - cnt}


def strip_dup_ngrams(docs: rd.Dataset, *, n: int = 4, id_col: str = "doc_id",
                     text_col: str = "text",
                     n_shards: int | None = None) -> rd.Dataset:
    """Exact-substring dedup REMOVAL — the rewrite stage behind the
    `dup_ngram_stats` signal (the distributed word-token approximation of
    suffix-array substring dedup a training corpus runs corpus-wide):
    every token position covered by a word n-gram that appears in >= 2
    DISTINCT docs is cut; survivors re-join with single spaces
    (single-space token semantics, ``oracle.strip_dup_ngrams_sql`` twin).
    Output: (doc_id, clean_text, n_tokens, n_removed) per input doc.

    Plan (two sharded exchanges, no driver materialization):
    1. slim (gram hash, doc, pos) rows -> gram-hash shard; grams whose
       posting set spans >= 2 distinct docs emit their (doc, pos) start
       rows (bounded by the duplicated-gram volume);
    2. dup positions side-tag-union the docs on hash(doc) shards — the
       text bytes ride this exchange exactly once (they ARE the output);
       inside the shard the `_strip_rebuild` kernel cuts covered tokens
       with one coverage cumsum + one blob gather.
    """
    import pandas as pd

    from optimizing_ray.functions.text import token_ngram_hashes_batch

    n_shards = resolve_shards(n_shards)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _doc_shard(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * MIX
        return ((h >> np.uint64(33)) % np.uint64(n_shards)).astype(np.int64)

    g_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                        "pos": pa.array([], pa.int64()),
                        "gh": pa.array([], pa.int64()),
                        "_shard": pa.array([], pa.int64())})

    def grams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return g_empty
        hv, voffs = token_ngram_hashes_batch(t[text_col], n)
        if len(hv) == 0:
            return g_empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.diff(voffs)
        doc = np.repeat(ids, cnt)
        pos = (np.arange(len(hv), dtype=np.int64)
               - np.repeat(voffs[:-1].astype(np.int64), cnt))
        return pa.table({"doc_id": pa.array(doc), "pos": pa.array(pos),
                         "gh": pa.array(hv.view(np.int64)),
                         "_shard": pa.array(
                             (hv % np.uint64(n_shards)).astype(np.int64))})

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("gh", sort=False)["doc_id"].nunique()
        dup = g["gh"].map(nd).to_numpy() >= 2
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy()[dup],
                             "pos": g["pos"].to_numpy()[dup]})

    u_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                        "pos": pa.array([], pa.int64()),
                        "text": pa.array([], pa.string()),
                        "_shard": pa.array([], pa.int64())})

    def dup_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return u_empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "pos": t["pos"],
                         "text": pa.array([""] * len(ids), pa.string()),
                         "_shard": pa.array(_doc_shard(ids))})

    def text_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return u_empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "pos": pa.array(np.full(len(ids), -1, np.int64)),
                         "text": t[text_col],
                         "_shard": pa.array(_doc_shard(ids))})

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["pos"].to_numpy() == -1
        ids = g["doc_id"].to_numpy()[is_doc].astype(np.int64)
        if len(ids) == 0:
            return pd.DataFrame({"doc_id": np.zeros(0, np.int64),
                                 "clean_text": np.zeros(0, object),
                                 "n_tokens": np.zeros(0, np.int64),
                                 "n_removed": np.zeros(0, np.int64)})
        out = _strip_rebuild(g["text"].to_numpy()[is_doc], ids,
                             g["doc_id"].to_numpy()[~is_doc].astype(np.int64),
                             g["pos"].to_numpy()[~is_doc].astype(np.int64), n)
        return pd.DataFrame({"doc_id": ids,
                             "clean_text": out["clean_text"].to_pandas(),
                             "n_tokens": out["n_tokens"],
                             "n_removed": out["n_removed"]})

    base = docs.select_columns([id_col, text_col])
    dup = (base.map_batches(grams, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_shard").map_groups(dup_positions,
                                         batch_format="pandas")
           .map_batches(dup_rows, batch_format="pyarrow",
                        zero_copy_batch=True))
    texts = base.map_batches(text_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (texts.union(dup)
            .groupby("_shard").map_groups(rebuild, batch_format="pandas"))


def dsir_sample(docs: rd.Dataset, *, target_lang: str = "en",
                scale: int = 2, offset6: int = 500_000,
                id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang", n_buckets: int = 4096,
                mult: int = 2_654_435_761) -> rd.Dataset:
    """DSIR importance RESAMPLING — the selection stage downstream of
    ``importance_weights`` (Xie et al. 2023: sample toward the target
    distribution): deterministic integer-exact acceptance sampling.
    Per doc, the per-token mean log-ratio in micro-nats
    w6pt = floor(weight / n_tokens * 1e6 + 0.5) maps monotonically to an
    acceptance rate rate6 = clamp(scale * w6pt + offset6, 0, 1e6); the
    doc survives iff uniform(doc_id) < rate6 where uniform is the
    train_split 2^32-wrap multiply hash (a DIFFERENT odd multiplier, so
    the split and sample gates are independent) compared all-integer:
    ((id * mult) % 2^32) * 1e6 < rate6 * 2^32.  Every step is exact in
    BIGINT, so the SQL twin ``oracle.dsir_sample_sql`` reproduces the
    kept set bit-for-bit (ids must stay below 2^63/mult — the train_split
    discipline).

    Scale shape: composes importance_weights' B-bounded zero-shuffle plan
    with one more stateless filter map — zero shuffles at any corpus
    size.  Output: surviving (doc_id, n_tokens, weight, rate6)."""
    iw = importance_weights(docs, target_lang=target_lang, id_col=id_col,
                            text_col=text_col, lang_col=lang_col,
                            n_buckets=n_buckets)
    M32 = np.int64(1) << np.int64(32)

    def gate(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "weight": pa.array([], pa.float64()),
                          "rate6": pa.array([], pa.int64())})
        if t.num_rows == 0 or "weight" not in t.column_names:
            return empty
        w = t["weight"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        w6pt = np.floor(w / n * 1e6 + 0.5).astype(np.int64)
        rate6 = np.clip(np.int64(scale) * w6pt + np.int64(offset6),
                        0, 1_000_000)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = (ids * np.int64(mult)) % M32
        keep = u * np.int64(1_000_000) < (rate6 << np.int64(32))
        out = t.append_column("rate6", pa.array(rate6))
        return out.filter(pa.array(keep))

    return iw.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def source_quality_gate(docs: rd.Dataset, *, tau: float = 0.7,
                        id_col: str = "doc_id", source_col: str = "source",
                        text_col: str = "text",
                        n_shards: int | None = None) -> rd.Dataset:
    """Per-DOMAIN curation gate (the C4 / Gopher source-level filter):
    keep every document whose SOURCE's mean quality score >= ``tau`` —
    a low-quality domain drops wholesale even when an individual page
    scores well, and vice versa.  Quality is the exact ``analyze_text``
    composite (already floor(x*1e6+0.5)/1e6, so q6 = round(q*1e6) is an
    integer both engines agree on); the mean test is the integer
    cross-multiply sum(q6) >= tau6 * n — no float division anywhere.
    Output: surviving (doc_id, source, quality) rows.

    Plan: ONE hash(source)-shard exchange of slim (doc, source, q6)
    rows — a source's docs all co-locate, so its mean test is total
    in-shard and kept docs emit directly (no survivor broadcast, no
    join; domains >> shards keeps shards balanced).  SQL twin
    ``oracle.source_quality_gate_sql``."""
    import pandas as pd

    tau6 = int(np.floor(tau * 1e6 + 0.5))
    n_shards = resolve_shards(n_shards)
    scored = analyze_text(docs.select_columns([id_col, source_col, text_col]))

    s_empty = pa.table({id_col: pa.array([], pa.int64()),
                        "source": pa.array([], pa.string()),
                        "q6": pa.array([], pa.int64()),
                        "_shard": pa.array([], pa.int64())})

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "quality" not in t.column_names:
            return s_empty
        q6 = np.floor(t["quality"].to_numpy(zero_copy_only=False) * 1e6
                      + 0.5).astype(np.int64)
        src = t[source_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(src), index=False).to_numpy()
        return pa.table({id_col: t[id_col],
                         "source": t[source_col],
                         "q6": pa.array(q6),
                         "_shard": pa.array(
                             (h % np.uint64(n_shards)).astype(np.int64))})

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("source", sort=False)["q6"].agg(["sum", "size"])
        ok = tot.index[tot["sum"] >= tau6 * tot["size"]]
        out = g[g["source"].isin(set(ok))]
        return pd.DataFrame({id_col: out[id_col].to_numpy().astype(np.int64),
                             "source": out["source"].to_numpy(),
                             "quality": out["q6"].to_numpy() / 1e6})

    return (scored.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(gate, batch_format="pandas"))


def _bigram_rows(t: pa.Table, id_col: str, text_col: str):
    """Per-batch bigram machinery shared by both bigram_logprob plans:
    returns (doc ids per pair, prev-token hash, pair hash, ids of docs
    with zero pairs, n_tokens per doc).  Pair identity = 64-bit mix of
    the two token hashes (decontaminate collision caveat); token
    semantics = single-space split (token_hashes_batch lockstep)."""
    from optimizing_ray.functions.text import token_hashes_batch

    th, doffs = token_hashes_batch(t[text_col])
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ntok = np.diff(doffs)
    total = int(doffs[-1])
    is_start = np.zeros(total, dtype=bool)
    if total:
        is_start[doffs[:-1][ntok > 0]] = True
    pos = np.flatnonzero(~is_start)
    prev = th[pos - 1]
    cur = th[pos]
    with np.errstate(over="ignore"):
        ph = prev * np.uint64(0x9E3779B97F4A7C15) + cur
    doc = np.repeat(ids, ntok)[pos]
    zero_ids = ids[ntok < 2]
    return doc, prev, ph, zero_ids, ntok


def bigram_logprob(docs: rd.Dataset, *, id_col: str = "doc_id",
                   text_col: str = "text", vocab_size: int = 4096,
                   broadcast_threshold: int = 200_000,
                   nrows: int | None = None,
                   n_shards: int | None = None) -> rd.Dataset:
    """Bigram language-model quality score — the CCNet-style perplexity
    proxy one rung above ``unigram_logprob``: per doc, the mean add-1 /
    add-V smoothed conditional log-probability of its token bigrams
    under the corpus's own bigram distribution,

        score = mean_i [ ln(c(prev_i, cur_i) + 1)
                         - ln(c_prefix(prev_i) + V) ]

    with c_prefix(w) = number of corpus bigrams starting with w and V =
    ``vocab_size`` a CONSTANT smoothing vocabulary (the fixed-tokenizer
    convention, which keeps the sharded plan decomposable).  Docs with
    fewer than 2 tokens score 0.0 with n_pairs 0.  Output (doc_id,
    n_pairs, logprob), floor(x*1e6+0.5)/1e6 at the END both sides.

    Plans (the unigram_logprob nrows-gate discipline):
    * BROADCAST (nrows <= threshold): per-batch (pair, n) partials merge
      driver-side (bounded by distinct pairs), the two count maps ride
      ray.put, one scoring pass — zero shuffles.
    * SHARDED (default, no hint): pair rows and count partials exchange
      on hash(PREV) shards — a prev's whole pair family co-locates, so
      BOTH the pair counts and the prefix counts are total in-shard and
      one leg computes the full per-(doc, shard) partial sums; ONE more
      doc-hash exchange merges (zero-pair docs ride it as (doc, 0, 0)
      rows).  Wide text bytes never shuffle.  A hot prefix token skews
      one shard; shards >> nodes keeps workers busy."""
    import pandas as pd

    from optimizing_ray.pipelines.dedup import _plan_rows

    V = float(vocab_size)
    n_shards_r = resolve_shards(n_shards)
    MIX = np.uint64(0x9E3779B97F4A7C15)

    if _plan_rows(nrows) <= broadcast_threshold:
        import ray

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or text_col not in t.column_names:
                return pa.table({"ph": pa.array([], pa.int64()),
                                 "pv": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            _, prev, ph, _, _ = _bigram_rows(t, id_col, text_col)
            key = np.stack([ph.view(np.int64), prev.view(np.int64)], axis=1)
            uk, cnt = np.unique(key, axis=0, return_counts=True)
            return pa.table({"ph": pa.array(uk[:, 0]),
                             "pv": pa.array(uk[:, 1]),
                             "n": pa.array(cnt.astype(np.int64))})

        tabs = [t for t in ray.get(
            docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_arrow_refs())
                if t.num_rows]
        if tabs:
            allt = pa.concat_tables(tabs)
            ph_all = allt["ph"].to_numpy(zero_copy_only=False)
            pv_all = allt["pv"].to_numpy(zero_copy_only=False)
            n_all = allt["n"].to_numpy(zero_copy_only=False)
            pk, inv = np.unique(ph_all, return_inverse=True)
            pc = np.zeros(len(pk), dtype=np.int64)
            np.add.at(pc, inv, n_all)
            vk, vinv = np.unique(pv_all, return_inverse=True)
            vc = np.zeros(len(vk), dtype=np.int64)
            np.add.at(vc, vinv, n_all)
        else:
            pk = pc = vk = vc = np.zeros(0, dtype=np.int64)
        state = ray.put((pk, np.log(pc + 1.0), vk, np.log(vc + V)))

        def score(t: pa.Table) -> pa.Table:
            empty = pa.table({id_col: pa.array([], pa.int64()),
                              "n_pairs": pa.array([], pa.int64()),
                              "logprob": pa.array([], pa.float64())})
            if t.num_rows == 0 or text_col not in t.column_names:
                return empty
            from optimizing_ray.broadcast import cached
            pk_, lp_, vk_, lv_ = cached(("bigram_lm", state),
                                        lambda: ray.get(state))
            doc, prev, ph, zero_ids, ntok = _bigram_rows(t, id_col, text_col)
            s = (lp_[np.searchsorted(pk_, ph.view(np.int64))]
                 - lv_[np.searchsorted(vk_, prev.view(np.int64))])
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            npairs = np.maximum(ntok - 1, 0)
            starts = np.zeros(len(ids), dtype=np.int64)
            np.cumsum(npairs[:-1], out=starts[1:])
            ssum = np.zeros(len(ids))
            nz = npairs > 0
            if s.size:
                ssum[nz] = np.add.reduceat(s, starts[nz])
            lp = np.zeros(len(ids))
            lp[nz] = np.floor(ssum[nz] / npairs[nz] * 1e6 + 0.5) / 1e6
            return pa.table({id_col: pa.array(ids),
                             "n_pairs": pa.array(npairs.astype(np.int64)),
                             "logprob": pa.array(lp)})

        return docs.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)

    # ---- sharded plan ----
    u_empty = pa.table({id_col: pa.array([], pa.int64()),
                        "pv": pa.array([], pa.int64()),
                        "ph": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "_side": pa.array([], pa.int64()),
                        "_shard": pa.array([], pa.int64())})

    def _pv_shard(pv_i64: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = pv_i64.view(np.uint64) * MIX
        return ((h >> np.uint64(33)) % np.uint64(n_shards_r)).astype(np.int64)

    def occ_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return u_empty
        doc, prev, ph, _, _ = _bigram_rows(t, id_col, text_col)
        key = np.stack([doc, prev.view(np.int64), ph.view(np.int64)], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        pv = uk[:, 1]
        return pa.table({id_col: pa.array(uk[:, 0]),
                         "pv": pa.array(pv), "ph": pa.array(uk[:, 2]),
                         "n": pa.array(cnt.astype(np.int64)),
                         "_side": pa.array(np.zeros(len(uk), np.int64)),
                         "_shard": pa.array(_pv_shard(pv))})

    def cnt_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return u_empty
        _, prev, ph, _, _ = _bigram_rows(t, id_col, text_col)
        key = np.stack([ph.view(np.int64), prev.view(np.int64)], axis=1)
        uk, cnt = np.unique(key, axis=0, return_counts=True)
        pv = uk[:, 1]
        return pa.table({id_col: pa.array(np.zeros(len(uk), np.int64)),
                         "pv": pa.array(pv), "ph": pa.array(uk[:, 0]),
                         "n": pa.array(cnt.astype(np.int64)),
                         "_side": pa.array(np.ones(len(uk), np.int64)),
                         "_shard": pa.array(_pv_shard(pv))})

    def shard_score(g: pd.DataFrame) -> pd.DataFrame:
        cnts = g[g["_side"] == 1]
        occ = g[g["_side"] == 0]
        out_empty = pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                  "s": pd.Series([], dtype=np.float64),
                                  "np_": pd.Series([], dtype=np.int64)})
        if len(occ) == 0:
            return out_empty
        cp = cnts.groupby("ph", sort=False)["n"].sum()
        cpre = cnts.groupby("pv", sort=False)["n"].sum()
        term = (np.log(cp.loc[occ["ph"].to_numpy()].to_numpy() + 1.0)
                - np.log(cpre.loc[occ["pv"].to_numpy()].to_numpy() + V))
        nocc = occ["n"].to_numpy().astype(np.int64)
        df = pd.DataFrame({id_col: occ[id_col].to_numpy(),
                           "s": term * nocc, "np_": nocc})
        agg = df.groupby(id_col, sort=False).agg(
            s=("s", "sum"), np_=("np_", "sum")).reset_index()
        agg["np_"] = agg["np_"].astype(np.int64)
        return agg

    def zero_rows(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64()),
                          "np_": pa.array([], pa.int64())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        _, _, _, zero_ids, _ = _bigram_rows(t, id_col, text_col)
        return pa.table({id_col: pa.array(zero_ids),
                         "s": pa.array(np.zeros(len(zero_ids))),
                         "np_": pa.array(np.zeros(len(zero_ids), np.int64))})

    def add_dshard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "np_": pa.array([], pa.int64()),
                             "_dsh": pa.array([], pa.int64())})
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * MIX
        sh = ((h >> np.uint64(33)) % np.uint64(n_shards_r)).astype(np.int64)
        return t.select([id_col, "s", "np_"]).append_column(
            "_dsh", pa.array(sh))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(id_col, sort=False).agg(
            s=("s", "sum"), n_pairs=("np_", "sum")).reset_index()
        npp = agg["n_pairs"].to_numpy().astype(np.int64)
        lp = np.zeros(len(agg))
        nz = npp > 0
        lp[nz] = np.floor(agg["s"].to_numpy()[nz] / npp[nz] * 1e6 + 0.5) / 1e6
        return pd.DataFrame({id_col: agg[id_col].to_numpy(),
                             "n_pairs": npp, "logprob": lp})

    base = docs.select_columns([id_col, text_col])
    union = (base.map_batches(occ_rows, batch_format="pyarrow",
                              zero_copy_batch=True)
             .union(base.map_batches(cnt_rows, batch_format="pyarrow",
                                     zero_copy_batch=True)))
    partials = (union.groupby("_shard").map_groups(shard_score,
                                                   batch_format="pandas")
                .union(base.map_batches(zero_rows, batch_format="pyarrow",
                                        zero_copy_batch=True)))
    return (partials.map_batches(add_dshard, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("_dsh").map_groups(finalize, batch_format="pandas"))


def _skyline_sweep(q6: np.ndarray, nt: np.ndarray) -> np.ndarray:
    """Boolean survivors mask of the (q6, nt) maximal (skyline) set:
    one lexsort, per-q-level max n vs the running best of strictly
    higher q levels.  Ties at the level max all survive (equal points
    never dominate each other)."""
    order = np.lexsort((-nt, -q6))
    qs, ns = q6[order], nt[order]
    gstart = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    gmax = ns[gstart]  # n sorted desc within a q level
    # running best n over STRICTLY higher q levels (exclusive)
    prev_best = np.r_[np.int64(np.iinfo(np.int64).min),
                      np.maximum.accumulate(gmax)[:-1]]
    glive = gmax > prev_best
    gid = np.cumsum(np.r_[0, np.diff(qs) != 0])
    live = glive[gid] & (ns == gmax[gid])
    mask = np.zeros(len(q6), bool)
    mask[order[live]] = True
    return mask


def skyline_docs(docs: rd.Dataset, *, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """Pareto-front (skyline) curation selection: the documents not
    DOMINATED on the (quality, n_tokens) plane — doc A dominates B iff
    q6_A >= q6_B and n_A >= n_B with at least one strict; equal points
    survive together.  The multi-objective "keep the frontier" selector
    of a curation pipeline.  Output (doc_id, q6, n_tokens), frontier
    order (q6 DESC, n_tokens DESC, doc_id).

    Plan (the canonical distributed skyline): each batch reduces to its
    LOCAL skyline — a point dominated within a batch is dominated
    globally, so the filter is lossless — via one lexsort sweep (group
    max per quality level vs the running best of strictly-higher
    levels); the driver merges the union of local fronts with the same
    sweep.  2-D fronts are tiny relative to the corpus (every survivor
    must strictly improve n_tokens as q6 decreases), so the driver
    merge is bounded; at adversarial front sizes shard the merge by q6
    range.  SQL twin ``oracle.skyline_docs_sql`` (NOT EXISTS
    dominance)."""
    scored = analyze_text(docs.select_columns([id_col, text_col]))

    def local_front(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "q6": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64())})
        if t.num_rows == 0 or "quality" not in t.column_names:
            return empty
        q6 = np.floor(t["quality"].to_numpy(zero_copy_only=False) * 1e6
                      + 0.5).astype(np.int64)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _skyline_sweep(q6, nt)
        return pa.table({id_col: pa.array(ids[keep]),
                         "q6": pa.array(q6[keep]),
                         "n_tokens": pa.array(nt[keep])})

    fronts = (scored.map_batches(local_front, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas())
    if len(fronts) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "q6": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    ids = fronts[id_col].to_numpy(np.int64)
    q6 = fronts["q6"].to_numpy(np.int64)
    nt = fronts["n_tokens"].to_numpy(np.int64)
    keep = _skyline_sweep(q6, nt)
    ids, q6, nt = ids[keep], q6[keep], nt[keep]
    order = np.lexsort((ids, -nt, -q6))
    return pa.table({id_col: pa.array(ids[order]),
                     "q6": pa.array(q6[order]),
                     "n_tokens": pa.array(nt[order])})


def robust_quality_stats(docs: rd.Dataset, *, id_col: str = "doc_id",
                         source_col: str = "source", text_col: str = "text",
                         trim_denom: int = 10,
                         n_shards: int | None = None) -> pa.Table:
    """Robust per-source quality statistics over the integer q6 plane —
    the outlier-resistant twin of the mean-based ``source_quality_gate``
    (one spam page cannot drag a domain's mean; the median/MAD/trimmed
    views are what a curation dashboard actually wants):

    * ``med_q6``  — the LOWER median (order statistic at 1-based rank
      (n+1)//2), integer, never averaged, so both engines agree on ties
      and even group sizes;
    * ``mad_q6``  — lower median of |q6 - med_q6| (median absolute
      deviation, the robust spread);
    * ``trim_n`` / ``trim_sum_q6`` — count and sum of the central slice
      after dropping n // trim_denom values from EACH end (the trimmed
      mean's exact numerator/denominator — no division on either side).
      Boundary ties are value-identical, so the kept multiset (hence
      the sum) is tie-order invariant.

    Plan: ONE hash(source) exchange of slim (source, q6) rows; a
    source's docs co-locate, so every statistic is one in-shard lexsort
    + run-offset arithmetic (meds by index, trimmed sums by cumsum
    diffs, MAD by a second lexsort on deviations) — per-group output is
    ONE row, driver merge bounded by the source count.  SQL twin
    ``oracle.robust_quality_stats_sql`` (row_number order statistics).
    """
    import pandas as pd

    n_shards = resolve_shards(n_shards)
    scored = analyze_text(docs.select_columns([id_col, source_col, text_col]))

    s_empty = pa.table({"source": pa.array([], pa.string()),
                        "q6": pa.array([], pa.int64()),
                        "_shard": pa.array([], pa.int64())})

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "quality" not in t.column_names:
            return s_empty
        q6 = np.floor(t["quality"].to_numpy(zero_copy_only=False) * 1e6
                      + 0.5).astype(np.int64)
        src = t[source_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(src), index=False).to_numpy()
        return pa.table({"source": t[source_col], "q6": pa.array(q6),
                         "_shard": pa.array(
                             (h % np.uint64(n_shards)).astype(np.int64))})

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "med_q6": pd.Series([], dtype=np.int64),
            "mad_q6": pd.Series([], dtype=np.int64),
            "trim_n": pd.Series([], dtype=np.int64),
            "trim_sum_q6": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        codes, uniques = pd.factorize(g["source"], sort=True)
        q6 = g["q6"].to_numpy(np.int64)
        order = np.lexsort((q6, codes))
        qs, cs = q6[order], codes[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        lens = np.diff(np.r_[starts, len(cs)])
        med = qs[starts + (lens - 1) // 2]
        lo = lens // trim_denom
        cum = np.r_[np.int64(0), np.cumsum(qs)]
        trim_sum = cum[starts + lens - lo] - cum[starts + lo]
        trim_n = lens - 2 * lo
        gid = np.cumsum(np.r_[0, np.diff(cs) != 0])
        dev = np.abs(qs - med[gid])
        dorder = np.lexsort((dev, cs))
        mad = dev[dorder][starts + (lens - 1) // 2]
        return pd.DataFrame({
            "source": uniques.to_numpy(object)[cs[starts]],
            "n": lens.astype(np.int64),
            "med_q6": med.astype(np.int64),
            "mad_q6": mad.astype(np.int64),
            "trim_n": trim_n.astype(np.int64),
            "trim_sum_q6": trim_sum.astype(np.int64)})

    out = (scored.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(stats, batch_format="pandas")
           .to_pandas())  # one row per source
    if len(out) == 0 or "source" not in out.columns:
        return pa.table({"source": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "med_q6": pa.array([], pa.int64()),
                         "mad_q6": pa.array([], pa.int64()),
                         "trim_n": pa.array([], pa.int64()),
                         "trim_sum_q6": pa.array([], pa.int64())})
    out = out.sort_values("source", kind="stable")
    return pa.table({
        "source": pa.array(out["source"].to_numpy(object), pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64)),
        "med_q6": pa.array(out["med_q6"].to_numpy(np.int64)),
        "mad_q6": pa.array(out["mad_q6"].to_numpy(np.int64)),
        "trim_n": pa.array(out["trim_n"].to_numpy(np.int64)),
        "trim_sum_q6": pa.array(out["trim_sum_q6"].to_numpy(np.int64))})


def winnow_fingerprints(docs: rd.Dataset, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8,
                        w: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints (the MOSS plagiarism-detection
    scheme): per doc, the rightmost minimal k-gram hash of every window
    of ``w`` consecutive k-grams — a LOCAL fingerprint set with the
    covering guarantee that any shared substring of length >= k + w - 1
    shares a selected fingerprint.  The standard sparse fingerprint for
    overlap detection at corpus scale (density ~2/(w+1)).

    Output rows (id_col, pos, fp): 0-based k-gram byte offset and the
    uint64 hash's signed-int64 bit pattern.

    Plan: a PURE per-batch transform (``functions.text.winnow_batch`` —
    one blob rolling hash + one reversed sliding-window argmin, no
    per-doc Python), zero shuffles; downstream overlap joins shard on
    hash(fp) exactly like the minhash band exchange.  SQL twin
    ``oracle.winnow_fingerprints_sql`` (window-min + rightmost-max join
    over Horner mod-2^64 position hashes; exact for the ASCII driver
    corpus)."""
    from optimizing_ray.functions.text import winnow_batch

    out_schema = pa.schema([(id_col, pa.int64()), ("pos", pa.int64()),
                            ("fp", pa.int64())])

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return out_schema.empty_table()
        d, pos, fp = winnow_batch(t[text_col], k=k, w=w)
        ids = t[id_col].to_numpy(zero_copy_only=False)[d]
        return pa.table({id_col: pa.array(ids.astype(np.int64)),
                         "pos": pa.array(pos), "fp": pa.array(fp)})

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def span_dedup_stats(docs_with_spans: rd.Dataset, *,
                     id_col: str = "doc_id", spans_col: str = "spans",
                     n_shards: int | None = None) -> pa.Table:
    """Span-level cross-document dedup over the interleaved span column
    (list<struct<kind,text,media_ref,offset>>): per doc, how many of
    its DISTINCT text-span values also appear verbatim in at least one
    OTHER doc — the span-granular exact-dup signal a multimodal
    curation pass gates on (a doc built from recycled spans is
    boilerplate even when no whole-doc duplicate exists).  Output
    (id_col, n_text_spans, n_shared) sorted by id; docs with no text
    spans are absent.

    Plan: per batch flatten the list column, keep kind == 'text',
    polynomial-hash the span texts off one UTF-8 blob
    (``functions.text._segment_hashes``), fold to DISTINCT (hash, doc);
    exchange 1 on hash(span) decides each span value's doc frequency
    exactly in-shard and emits one (doc, is_shared) row per distinct
    (doc, span); exchange 2 on hash(doc) folds the two per-doc counts —
    rows are bounded by distinct spans per doc (<= 8 on the driver
    tables).  SQL twin ``oracle.span_dedup_stats_sql`` counts on the
    raw span TEXTS (no hashing): equality of counts proves the engine's
    64-bit hashing injective on the observed span-value set."""
    import pandas as pd
    import pyarrow.compute as pc

    from optimizing_ray.functions.text import _segment_hashes, _utf8_blob

    n_shards = resolve_shards(n_shards)
    gold = np.uint64(0x9E3779B97F4A7C15)

    slim_schema = pa.schema([("_doc", pa.int64()), ("_h", pa.int64()),
                             ("_shard", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or spans_col not in t.column_names:
            return slim_schema.empty_table()
        ls = t[spans_col]
        if isinstance(ls, pa.ChunkedArray):
            ls = ls.combine_chunks()
        flat = pc.list_flatten(ls)
        counts = pc.list_value_length(ls).to_numpy().astype(np.int64)
        doc = np.repeat(t[id_col].to_numpy(zero_copy_only=False)
                        .astype(np.int64), counts)
        is_text = (flat.field("kind").to_numpy(zero_copy_only=False)
                   == "text")
        if not is_text.any():
            return slim_schema.empty_table()
        txt = flat.field("text").filter(pa.array(is_text))
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        data, offs = _utf8_blob(txt)
        h = _segment_hashes(data, offs).view(np.int64)
        doc = doc[is_text]
        order = np.lexsort((h, doc))
        doc, h = doc[order], h[order]
        keep = np.r_[True, (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])]
        doc, h = doc[keep], h[keep]
        with np.errstate(over="ignore"):
            sh = h.astype(np.uint64) * gold
        return pa.table({"_doc": pa.array(doc), "_h": pa.array(h),
                         "_shard": pa.array(((sh >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))})

    def df_gate(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_doc": pd.Series([], dtype=np.int64),
                              "_sh2": pd.Series([], dtype=np.int64),
                              "_shared": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        u = g.drop_duplicates(["_doc", "_h"])    # cross-batch fold
        df = u.groupby("_h", sort=False)["_doc"].transform("size")
        doc = u["_doc"].to_numpy(np.int64)
        with np.errstate(over="ignore"):
            sh = doc.astype(np.uint64) * gold
        return pd.DataFrame({
            "_doc": doc,
            "_sh2": ((sh >> np.uint64(33)) % np.uint64(n_shards))
            .astype(np.int64),
            "_shared": (df.to_numpy() >= 2).astype(np.int64)})

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n_text_spans": pd.Series([], dtype=np.int64),
                              "n_shared": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        gg = g.groupby("_doc", sort=True)
        return pd.DataFrame({
            "doc_id": gg.size().index.to_numpy(np.int64),
            "n_text_spans": gg.size().to_numpy(np.int64),
            "n_shared": gg["_shared"].sum().to_numpy(np.int64)})

    out = (docs_with_spans.map_batches(slim, batch_format="pyarrow",
                                       zero_copy_batch=True)
           .groupby("_shard").map_groups(df_gate, batch_format="pandas")
           .groupby("_sh2").map_groups(per_doc, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "doc_id" not in out.columns:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "n_text_spans": pa.array([], pa.int64()),
                         "n_shared": pa.array([], pa.int64())})
    out = out.sort_values("doc_id")
    return pa.table({
        id_col: pa.array(out["doc_id"].to_numpy(np.int64)),
        "n_text_spans": pa.array(out["n_text_spans"].to_numpy(np.int64)),
        "n_shared": pa.array(out["n_shared"].to_numpy(np.int64))})


def collocations(docs: rd.Dataset, *, text_col: str = "text", k: int = 20,
                 min_count: int = 2, scale: int = 1_000_000,
                 n_shards: int | None = None) -> pa.Table:
    """Collocation (phrase) mining over adjacent word pairs — the
    tokenizer-prep companion of ``build_vocab``/``bpe_merges``: the
    top-``k`` bigrams by the integer Dice score

        score_micro = (2 * c_uv * scale) // (c_u + c_v)

    with c_uv the corpus count of the ADJACENT pair and c_u/c_v the
    corpus unigram counts (token identity = the raw single-space split,
    the bigram_logprob lockstep).  Rank order (score DESC, c_uv DESC,
    u ASC, v ASC); pairs below ``min_count`` pruned.  All-integer, so
    bit-identical to ``oracle.collocations_sql``.

    Plan (two attach exchanges + bounded driver merge): per-batch polars
    pair partials and numpy unigram partials; exchange 1 on hash(u)
    totals both and attaches c_u (a pair and its left unigram co-locate)
    with the min_count prune IN-SHARD; exchange 2 on hash(v) attaches
    c_v, scores, and cuts a per-shard top-k (any global winner is in
    its shard's top-k); the driver merges <= shards * k rows.  Raw text
    never leaves the first pass — only (string pair, counts) rows
    shuffle, pruned by min_count before the second exchange."""
    import pandas as pd
    import polars as pl
    import pyarrow.compute as pc

    n_shards = resolve_shards(n_shards)
    leg1 = pa.schema([("u", pa.string()), ("v", pa.string()),
                      ("c", pa.int64()), ("side", pa.int8()),
                      ("_shard", pa.int64())])

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return leg1.empty_table()
        ls = pc.split_pattern(t[text_col], " ")
        ls = ls.combine_chunks() if isinstance(ls, pa.ChunkedArray) else ls
        flat = pc.list_flatten(ls).to_numpy(zero_copy_only=False)
        offs = np.asarray(ls.offsets, dtype=np.int64)
        # unigram partials (all tokens, incl. '' — the raw-split family)
        uw, ucnt = np.unique(flat, return_counts=True)
        # adjacent pairs: positions whose successor is in the same doc
        n_tok = np.diff(offs)
        keep = np.ones(len(flat), dtype=bool)
        if len(flat):
            keep[offs[1:] - 1] = False  # last token of each doc
        li = np.flatnonzero(keep)
        us, vs = flat[li], flat[li + 1]
        parts = [pa.table({"u": pa.array(uw.astype(str)),
                           "v": pa.array(np.full(len(uw), "", object)
                                         .astype(str)),
                           "c": pa.array(ucnt.astype(np.int64)),
                           "side": pa.array(np.ones(len(uw), np.int8)),
                           "_shard": pa.array(
                               pd.util.hash_pandas_object(
                                   pd.Series(uw), index=False).to_numpy()
                               % np.uint64(n_shards))})]
        if len(us):
            agg = (pl.DataFrame({"u": us.astype(str), "v": vs.astype(str)})
                   .group_by(["u", "v"]).agg(pl.len().alias("c")))
            ua = agg["u"].to_numpy().astype(str)
            parts.append(pa.table({
                "u": pa.array(ua),
                "v": pa.array(agg["v"].to_numpy().astype(str)),
                "c": pa.array(agg["c"].to_numpy().astype(np.int64)),
                "side": pa.array(np.zeros(len(ua), np.int8)),
                "_shard": pa.array(
                    pd.util.hash_pandas_object(
                        pd.Series(ua), index=False).to_numpy()
                    % np.uint64(n_shards))}))
        out = pa.concat_tables(parts)
        return out.set_column(
            4, "_shard", pa.array(out["_shard"].to_numpy(
                zero_copy_only=False).astype(np.int64)))

    def attach_u(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "u": pd.Series([], dtype=str), "v": pd.Series([], dtype=str),
            "c_uv": pd.Series([], dtype=np.int64),
            "c_u": pd.Series([], dtype=np.int64),
            "side": pd.Series([], dtype=np.int8),
            "_s2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        uni = (g[g["side"] == 1].groupby("u", sort=False)["c"].sum())
        pr = g[g["side"] == 0]
        outs = []
        if len(pr):
            agg = (pr.groupby(["u", "v"], sort=False)["c"].sum()
                   .reset_index())
            agg = agg[agg["c"] >= min_count]
            if len(agg):
                cu = uni.reindex(agg["u"]).to_numpy(np.int64)
                h = pd.util.hash_pandas_object(agg["v"],
                                               index=False).to_numpy()
                outs.append(pd.DataFrame({
                    "u": agg["u"].to_numpy(), "v": agg["v"].to_numpy(),
                    "c_uv": agg["c"].to_numpy(np.int64), "c_u": cu,
                    "side": np.zeros(len(agg), np.int8),
                    "_s2": (h % np.uint64(n_shards)).astype(np.int64)}))
        if len(uni):
            # re-emit the unigram totals keyed for the v-attach
            h = pd.util.hash_pandas_object(pd.Series(uni.index),
                                           index=False).to_numpy()
            outs.append(pd.DataFrame({
                "u": uni.index.to_numpy(), "v": np.full(len(uni), ""),
                "c_uv": uni.to_numpy(np.int64),
                "c_u": np.zeros(len(uni), np.int64),
                "side": np.ones(len(uni), np.int8),
                "_s2": (h % np.uint64(n_shards)).astype(np.int64)}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    def attach_v(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "u": pd.Series([], dtype=str), "v": pd.Series([], dtype=str),
            "c_uv": pd.Series([], dtype=np.int64),
            "c_u": pd.Series([], dtype=np.int64),
            "c_v": pd.Series([], dtype=np.int64),
            "score_micro": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        uni = g[g["side"] == 1].set_index("u")["c_uv"]
        pr = g[g["side"] == 0]
        if len(pr) == 0 or len(uni) == 0:
            return empty
        cv = uni.reindex(pr["v"]).to_numpy(np.int64)
        c_uv = pr["c_uv"].to_numpy(np.int64)
        c_u = pr["c_u"].to_numpy(np.int64)
        score = (2 * c_uv * np.int64(scale)) // (c_u + cv)
        out = pd.DataFrame({"u": pr["u"].to_numpy(),
                            "v": pr["v"].to_numpy(),
                            "c_uv": c_uv, "c_u": c_u, "c_v": cv,
                            "score_micro": score})
        out = out.sort_values(["score_micro", "c_uv", "u", "v"],
                              ascending=[False, False, True, True],
                              kind="stable").head(k)
        return out.reset_index(drop=True)

    hits = (docs.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("_shard").map_groups(attach_u, batch_format="pandas")
            .groupby("_s2").map_groups(attach_v, batch_format="pandas")
            .to_pandas())
    schema = pa.schema([("coll_rank", pa.int64()), ("u", pa.string()),
                        ("v", pa.string()), ("c_uv", pa.int64()),
                        ("c_u", pa.int64()), ("c_v", pa.int64()),
                        ("score_micro", pa.int64())])
    if len(hits) == 0 or "u" not in hits.columns:
        return schema.empty_table()
    hits = hits.sort_values(["score_micro", "c_uv", "u", "v"],
                            ascending=[False, False, True, True],
                            kind="stable").head(k).reset_index(drop=True)
    return pa.table({"coll_rank": pa.array(
                         np.arange(1, len(hits) + 1, dtype=np.int64)),
                     "u": pa.array(hits["u"].astype(str)),
                     "v": pa.array(hits["v"].astype(str)),
                     "c_uv": pa.array(hits["c_uv"].to_numpy(np.int64)),
                     "c_u": pa.array(hits["c_u"].to_numpy(np.int64)),
                     "c_v": pa.array(hits["c_v"].to_numpy(np.int64)),
                     "score_micro": pa.array(
                         hits["score_micro"].to_numpy(np.int64))})


def priority_sample(docs: rd.Dataset, *, k: int = 32,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield–Lund–Thorup): weight w = length(text) + 1, the
    doc's priority is the exact integer

        q = (w << 32) // (splitmix64(doc_id) % 2^32 + 1)

    and the sample is the top-``k`` under (q DESC, doc_id ASC) — the
    length-weighted corpus subsample with a mergeable, hash-verifiable
    selection rule (every arithmetic step mod-2^64/int64, so the SQL
    twin ``oracle.priority_sample_sql`` is bit-identical).  Output
    (samp_rank, doc_id, w, priority).

    Plan: each batch keeps only its own top-k under the total order
    (the ann partial-top-k shape — (q, id) is tie-free), the driver
    merges <= blocks x k rows.  Zero shuffles."""
    from optimizing_ray.pipelines.sketches import splitmix64

    out_schema = pa.schema([("samp_rank", pa.int64()),
                            ("doc_id", pa.int64()), ("w", pa.int64()),
                            ("priority", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64()),
                          "priority": pa.array([], pa.int64())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (pc.utf8_length(t[text_col]).to_numpy(zero_copy_only=False)
             .astype(np.int64) + 1)
        u = (splitmix64(ids.astype(np.uint64))
             % np.uint64(1 << 32)).astype(np.int64)
        q = (w << np.int64(32)) // (u + 1)
        order = np.lexsort((ids, -q))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "w": pa.array(w[order]),
                         "priority": pa.array(q[order])})

    parts = (docs.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
    if len(parts) == 0 or "doc_id" not in parts.columns:
        return out_schema.empty_table()
    ids = parts["doc_id"].to_numpy(np.int64)
    w = parts["w"].to_numpy(np.int64)
    q = parts["priority"].to_numpy(np.int64)
    order = np.lexsort((ids, -q))[:k]
    return pa.table({"samp_rank": pa.array(
                         np.arange(1, len(order) + 1, dtype=np.int64)),
                     "doc_id": pa.array(ids[order]),
                     "w": pa.array(w[order]),
                     "priority": pa.array(q[order])})


def typo_pairs(docs: rd.Dataset, *, text_col: str = "text",
               max_dist: int = 2, n_shards: int | None = None) -> pa.Table:
    """SymSpell-style typo/variant detection over the corpus
    vocabulary: every DISTINCT word pair within Levenshtein distance
    ``max_dist`` (unit insert/delete/substitute — DuckDB
    ``levenshtein`` semantics).  Output (word_a, word_b, dist),
    a < b byte order, sorted.

    Plan (the SymSpell deletion-neighborhood theorem: ed(u, v) <= d
    implies u and v share a variant reachable by <= d deletions from
    each): one hash(word) exchange builds the distinct vocabulary;
    each vocab word emits its <= d-deletion variants (vocab-bounded —
    the bpe driver-loop budget class); candidates meet on ONE
    hash(variant) exchange (pairs within a variant bucket, a < b);
    a hash(pair) exchange dedups multi-variant collisions and runs
    the exact DP verify VECTORIZED across pairs grouped by the
    (len_u, len_v) shape.  The corpus is touched once; everything
    after is vocabulary-sized.  SQL twin ``oracle.typo_pairs_sql`` is
    the unbucketed levenshtein brute — a green row proves the
    deletion-neighborhood candidates lossless."""
    import pandas as pd
    import pyarrow.compute as pc

    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([("word_a", pa.string()),
                            ("word_b", pa.string()),
                            ("dist", pa.int64())])

    # --- stage 1: distinct vocabulary (one hash(word) exchange) -----
    def word_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or text_col not in t.column_names:
            return empty
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        uw = np.unique(toks.to_numpy(zero_copy_only=False))
        h = pd.util.hash_pandas_object(pd.Series(uw), index=False).to_numpy()
        return pa.table({"word": pa.array(uw.astype(str)),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    def vocab_fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"word": pd.Series([], dtype=str)})
        return pd.DataFrame({"word": np.unique(g["word"].to_numpy())})

    vocab = (docs.map_batches(word_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
             .groupby("_shard").map_groups(vocab_fold,
                                           batch_format="pandas"))

    # --- stage 2: deletion variants -> hash(variant) exchange -------
    def variants(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"var": pd.Series([], dtype=str),
                              "word": pd.Series([], dtype=str),
                              "_sv": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        vs, ws = [], []
        for w in g["word"].to_numpy():
            seen = {w}
            frontier = {w}
            for _ in range(max_dist):
                nxt = set()
                for s in frontier:
                    for i in range(len(s)):
                        nxt.add(s[:i] + s[i + 1:])
                frontier = nxt - seen
                seen |= nxt
            vs.extend(seen)
            ws.extend([w] * len(seen))
        h = pd.util.hash_pandas_object(pd.Series(vs), index=False).to_numpy()
        return pd.DataFrame({"var": vs, "word": ws,
                             "_sv": (h % np.uint64(n_shards))
                             .astype(np.int64)})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=str),
                              "b": pd.Series([], dtype=str),
                              "_sp": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        df = g[["var", "word"]].drop_duplicates()
        df = df.sort_values(["var", "word"], kind="stable")
        v = df["var"].to_numpy()
        w = df["word"].to_numpy()
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        ends = np.r_[starts[1:], len(v)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            iu, iv = np.triu_indices(m, 1)
            out_a.append(w[s + iu])
            out_b.append(w[s + iv])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        key = pd.Series(a) + "\x00" + pd.Series(b)
        keep = ~key.duplicated()
        a, b, key = a[keep.to_numpy()], b[keep.to_numpy()], key[keep]
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        return pd.DataFrame({"a": a, "b": b,
                             "_sp": (h % np.uint64(n_shards))
                             .astype(np.int64)})

    # --- stage 3: dedup + vectorized DP verify -----------------------
    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"word_a": pd.Series([], dtype=str),
                              "word_b": pd.Series([], dtype=str),
                              "dist": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        df = g[["a", "b"]].drop_duplicates()
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        la = np.array([len(x) for x in a])
        lb = np.array([len(x) for x in b])
        band = np.abs(la - lb) <= max_dist
        a, b, la, lb = a[band], b[band], la[band], lb[band]
        # ASCII fast path below reshapes on byte == char length; route
        # multibyte pairs through a scalar DP (corpus is ASCII — this
        # is the non-ASCII fallback of the batch text kernels)
        wide = np.array([len(x.encode()) != len(x)
                         or len(y.encode()) != len(y)
                         for x, y in zip(a, b)])
        out_a, out_b, out_d = [], [], []
        if wide.any():
            for x, y in zip(a[wide], b[wide]):
                pv = list(range(len(y) + 1))
                for i in range(1, len(x) + 1):
                    cu = [i] + [0] * len(y)
                    for j in range(1, len(y) + 1):
                        cu[j] = min(pv[j] + 1, cu[j - 1] + 1,
                                    pv[j - 1] + (x[i - 1] != y[j - 1]))
                    pv = cu
                if pv[len(y)] <= max_dist:
                    out_a.append(np.array([x], dtype=object))
                    out_b.append(np.array([y], dtype=object))
                    out_d.append(np.array([pv[len(y)]], dtype=np.int64))
            a, b, la, lb = a[~wide], b[~wide], la[~wide], lb[~wide]
        for (lu, lv) in set(zip(la.tolist(), lb.tolist())):
            m = (la == lu) & (lb == lv)
            au = a[m]
            bu = b[m]
            n = len(au)
            A = (np.frombuffer("".join(au).encode("utf-8"), np.uint8)
                 .reshape(n, lu) if lu else np.zeros((n, 0), np.uint8))
            B = (np.frombuffer("".join(bu).encode("utf-8"), np.uint8)
                 .reshape(n, lv) if lv else np.zeros((n, 0), np.uint8))
            prev = np.tile(np.arange(lv + 1, dtype=np.int64), (n, 1))
            for i in range(1, lu + 1):
                cur = np.empty_like(prev)
                cur[:, 0] = i
                for j in range(1, lv + 1):
                    sub = prev[:, j - 1] + (A[:, i - 1] != B[:, j - 1])
                    cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                                      cur[:, j - 1] + 1),
                                           sub)
                prev = cur
            d = prev[:, lv]
            hit = d <= max_dist
            out_a.append(au[hit])
            out_b.append(bu[hit])
            out_d.append(d[hit])
        if not out_a:
            return empty
        return pd.DataFrame({"word_a": np.concatenate(out_a),
                             "word_b": np.concatenate(out_b),
                             "dist": np.concatenate(out_d)
                             .astype(np.int64)})

    out = (vocab.map_batches(variants, batch_format="pandas")
           .groupby("_sv").map_groups(bucket_pairs, batch_format="pandas")
           .groupby("_sp").map_groups(verify, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "word_a" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["word_a", "word_b"]).reset_index(drop=True)
    return pa.table({"word_a": pa.array(out["word_a"].astype(str)),
                     "word_b": pa.array(out["word_b"].astype(str)),
                     "dist": pa.array(out["dist"].to_numpy(np.int64))})


def char_entropy(docs: rd.Dataset, *, id_col: str = "doc_id",
                 text_col: str = "text") -> rd.Dataset:
    """Per-doc character-distribution Shannon entropy (nats, micro-
    rounded to int64 1e-6) — the classic gibberish/boilerplate quality
    gate: near-zero entropy = one repeated symbol, high = uniform
    noise; natural text sits in a narrow band.  BYTE entropy — equal to
    character entropy on the (pure-ASCII) driver corpus, documented as
    the multibyte approximation otherwise.  Output columns (doc_id,
    n_chars_e, n_distinct, entropy6); empty docs are dropped (SQL twin
    has no char rows for them).

    Pure streaming map, zero shuffles: per batch ONE blob pass — a
    (doc, byte) combined-key bincount gives every doc's histogram at
    once, k*ln(k) folds per doc with one scatter-add; H = ln(n) - s/n.
    SQL twin ``oracle.char_entropy_sql`` (char unnest + group counts;
    float ln lockstep under 1e-6 rounding, the unigram_logprob
    discipline)."""
    from optimizing_ray.functions.text import _as_string_array, _utf8_blob

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_chars_e", pa.int64()),
        ("n_distinct", pa.int64()), ("entropy6", pa.int64())])

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return out_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = _as_string_array(t[text_col])
        data, offs = _utf8_blob(arr)
        lens = np.diff(offs)
        n_docs = len(lens)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        combined = doc_of * 256 + data
        counts = np.bincount(combined, minlength=n_docs * 256)
        nz = np.flatnonzero(counts)
        k = counts[nz].astype(np.float64)
        dz = nz >> 8
        s = np.zeros(n_docs, np.float64)
        np.add.at(s, dz, k * np.log(k))
        nd = np.bincount(dz, minlength=n_docs)
        keep = lens > 0
        n = lens[keep].astype(np.float64)
        ent = np.log(n) - s[keep] / n
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "n_chars_e": pa.array(lens[keep].astype(np.int64)),
            "n_distinct": pa.array(nd[keep].astype(np.int64)),
            "entropy6": pa.array(np.floor(ent * 1e6 + 0.5)
                                 .astype(np.int64))})

    return docs.map_batches(per_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def source_drift(docs: "rd.Dataset", *, bin_width: int = 64,
                 n_bins: int = 16, source_col: str = "source",
                 val_col: str = "n_chars") -> pa.Table:
    """Per-source DISTRIBUTION DRIFT vs the whole corpus — the 1-D
    earth-mover's distance between each source's doc-length histogram
    and the global one (the dataset-shift / ingestion-regression
    detector a curation pipeline runs per crawl): over the fixed bins
    b = min(val // bin_width, n_bins - 1),

        EMD(s) = sum_b | cum_b( n_sb * N - N_b * n_s ) |   (x 1/(n_s*N))

    — the normalized-CDF difference cleared to ONE integer numerator
    over the common denominator n_s * N, so the statistic is exact
    int64 end to end and both engines agree bit-for-bit; emd6 =
    floor(num * 1e6 / den) computed in arbitrary precision driver-side
    (the bounded per-source rows make that free).  Output (source,
    n_docs, emd_num, emd_den, emd6), source order.

    Plan: per-batch (source, bin) count partials (one lexsort), driver
    merge bounded by sources x n_bins (the tile_counts class); the
    cumulative fold is a tiny dense matrix op.  Overflow guard:
    n_s * N < 2^63 holds to ~3e9 docs; asserted."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"src": pa.array([], pa.string()),
                          "b": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or source_col not in t.column_names:
            return empty
        src = t[source_col].to_numpy(zero_copy_only=False)
        v = t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(v // bin_width, n_bins - 1)
        usrc, sinv = np.unique(src, return_inverse=True)
        key = sinv * n_bins + b
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"src": pa.array(usrc[uk // n_bins]),
                         "b": pa.array((uk % n_bins).astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = [p for p in ray.get(
        docs.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_arrow_refs())
        if p.num_rows]
    schema = pa.schema([("source", pa.string()), ("n_docs", pa.int64()),
                        ("emd_num", pa.int64()), ("emd_den", pa.int64()),
                        ("emd6", pa.int64())])
    if not parts:
        return schema.empty_table()
    tab = pa.concat_tables(parts)
    src = tab["src"].to_numpy(zero_copy_only=False)
    b = tab["b"].to_numpy(zero_copy_only=False)
    n = tab["n"].to_numpy(zero_copy_only=False)
    usrc, sinv = np.unique(src, return_inverse=True)
    H = np.zeros((len(usrc), n_bins), np.int64)
    np.add.at(H, (sinv, b), n)
    ns = H.sum(axis=1)
    G = H.sum(axis=0)
    N = int(G.sum())
    assert int(ns.max(initial=0)) * N < (1 << 63), \
        "source_drift: n_s * N overflows int64 — shard the statistic"
    diff = H * N - G[None, :] * ns[:, None]
    cum = np.cumsum(diff, axis=1)
    num = np.abs(cum).sum(axis=1)
    den = ns * N
    emd6 = np.array([int(nm) * 1_000_000 // int(dn) if dn else 0
                     for nm, dn in zip(num, den)], np.int64)
    return pa.table({"source": pa.array(usrc),
                     "n_docs": pa.array(ns),
                     "emd_num": pa.array(num),
                     "emd_den": pa.array(den),
                     "emd6": pa.array(emd6)}, schema=schema)

"""BPE tokenizer training: learn the merge table from corpus word counts.

The core tokenizer-prep step of a training-data pipeline (Sennrich et al.
2016, the GPT-2/HF `tokenizers` trainer shape): pre-tokenize on the single
space (the repo's decontaminate/pack_sequences lockstep family), count
distinct words once, then iteratively (a) count adjacent symbol pairs
weighted by word frequency, (b) pick the most frequent pair (tie: byte-order
smallest), (c) merge it everywhere, for ``n_merges`` rounds.

Stream representation: every symbol is wrapped in guards, ``<sym>``, so a
word's symbol sequence is one string ``<s1><s2>...<sn>``.  Merging pair
(u, v) is then a PLAIN substring replace of ``<u><v>`` with ``<uv>``:
matches can never share characters, so one left-to-right non-overlapping
replace pass (pyarrow ``replace_substring`` == DuckDB ``replace``) is
EXACTLY the canonical BPE merge sweep (merge at i consumes both tokens and
the scan resumes at i+2 — runs like 'aaaaa' give [aa, aa, a]).  Guards make
false matches impossible: ``<u>`` can only match a whole token.
Precondition: text contains neither '<' nor '>' (the driver corpus is
plain ASCII words; the ASCII fast path asserts nothing — callers with
angle brackets must pre-escape).

Plans (the repo's nrows-gated discipline):
- word counts are ALWAYS one sharded exchange over the corpus (a word's
  partials land in one shard, the build_vocab pattern);
- the merge loop runs over the DISTINCT-WORD table — broadcast plan
  (driver-side vectorized loop) when the vocabulary fits
  ``broadcast_threshold``, else distributed rounds: per-batch polars pair
  partials, one hash(pair) exchange with per-shard exact top-1 (a pair's
  total lands in one shard, so the global argmax over <= n_shards shard
  winners is exact), driver picks the winner, one broadcast replace map,
  materialize per round (iterative-pipeline discipline).

Reference parity: the reference has no tokenizer trainer; this is part of
the beyond-reference LLM-data operator set (SURVEY §2 addenda).  SQL twin
``oracle.bpe_merges_sql`` chains one CTE block per round, so a green row
proves every pair count, every tie-break, and every merge application
byte-identical for the whole horizon.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from optimizing_ray.config import resolve_shards

__all__ = ["bpe_merges", "bpe_encode"]

_MERGE_SCHEMA = pa.schema([
    ("merge_rank", pa.int64()), ("lhs", pa.string()),
    ("rhs", pa.string()), ("pair_count", pa.int64())])


def _empty_merges() -> pa.Table:
    return _MERGE_SCHEMA.empty_table()


def _streams_from_words(words: pa.Array) -> pa.Array:
    """'<c1><c2>...<cn>' guard-wrapped char stream per word, built with
    one vectorized byte expansion over the UTF-8 blob (ASCII fast path;
    multibyte falls back to a per-word join)."""
    from optimizing_ray.functions.text import _utf8_blob

    words = (words.combine_chunks()
             if isinstance(words, pa.ChunkedArray) else words)
    if len(words) == 0:
        return pa.array([], pa.string())
    data, offs = _utf8_blob(words)
    if len(data) and data.max() > 127:
        return pa.array(["<" + "><".join(w) + ">" if w else ""
                         for w in words.to_pylist()], pa.string())
    out = np.empty(3 * len(data), dtype=np.uint8)
    out[0::3] = ord("<")
    out[1::3] = data
    out[2::3] = ord(">")
    new_offs = (3 * offs).astype(np.int32)
    return pa.Array.from_buffers(
        pa.string(), len(words),
        [None, pa.py_buffer(new_offs.tobytes()),
         pa.py_buffer(out.tobytes())])


def _pairs_of(streams: pa.Array, cnts: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(u, v, weight) of every ADJACENT token pair across the batch
    (overlapping occurrences counted, the canonical BPE pair census).
    One split over the whole column; pair indices by offset arithmetic."""
    ls = pc.split_pattern(streams, ">")      # ['<t1', '<t2', ..., '']
    flat = pc.list_flatten(ls)
    toks = pc.utf8_slice_codeunits(flat, 1).to_numpy(zero_copy_only=False)
    offs = np.asarray(ls.offsets, dtype=np.int64)
    n_tok = np.diff(offs) - 1                # drop the trailing '' piece
    n_pair = np.maximum(n_tok - 1, 0)
    total = int(n_pair.sum())
    if total == 0:
        e = np.array([], dtype=object)
        return e, e, np.array([], dtype=np.int64)
    starts = np.repeat(offs[:-1], n_pair)
    local = (np.arange(total, dtype=np.int64)
             - np.repeat(np.cumsum(n_pair) - n_pair, n_pair))
    pi = starts + local
    w = np.repeat(cnts.astype(np.int64), n_pair)
    return toks[pi], toks[pi + 1], w


def _top_pair(u: np.ndarray, v: np.ndarray, w: np.ndarray,
              ) -> tuple[str, str, int] | None:
    """Weighted pair argmax under (count DESC, u ASC, v ASC)."""
    import polars as pl
    if len(u) == 0:
        return None
    agg = (pl.DataFrame({"u": u.astype(str), "v": v.astype(str), "c": w})
           .group_by(["u", "v"]).agg(pl.col("c").sum())
           .sort(["c", "u", "v"], descending=[True, False, False])
           .head(1))
    return (agg["u"][0], agg["v"][0], int(agg["c"][0]))


def _word_count_ds(docs: rd.Dataset, text_col: str,
                   n_shards: int) -> rd.Dataset:
    """(word, cnt) distinct word counts — per-batch arrow split +
    in-batch fold, one hash(word) exchange (build_vocab pattern,
    no cutoff, stays a Dataset for the distributed merge loop)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or text_col not in t.column_names:
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        toks = pc.list_flatten(pc.split_pattern(t[text_col], " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        arr = toks.to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(arr, return_counts=True)
        h = pd.util.hash_pandas_object(pd.Series(uk), index=False).to_numpy()
        return pa.table({"word": pa.array(uk.astype(str)),
                         "cnt": pa.array(cnt.astype(np.int64)),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    def shard_merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"word": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        agg = g.groupby("word", sort=False)["cnt"].sum().reset_index()
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return agg

    return (docs.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("_shard").map_groups(shard_merge,
                                          batch_format="pandas"))


def _merge_loop_local(words: pa.Array, cnts: np.ndarray,
                      n_merges: int) -> tuple[pa.Table, pa.Array]:
    """Returns (merge table, final per-word streams) — the learning
    sweep's last replace pass already encodes the vocabulary."""
    streams = _streams_from_words(words)
    ranks, lhs, rhs, pcnt = [], [], [], []
    for r in range(n_merges):
        top = _top_pair(*_pairs_of(streams, cnts))
        if top is None:
            break
        u, v, c = top
        ranks.append(r + 1)
        lhs.append(u)
        rhs.append(v)
        pcnt.append(c)
        streams = pc.replace_substring(
            streams, pattern=f"<{u}><{v}>", replacement=f"<{u}{v}>")
        if isinstance(streams, pa.ChunkedArray):
            streams = streams.combine_chunks()
    table = pa.table({"merge_rank": pa.array(ranks, pa.int64()),
                      "lhs": pa.array(lhs, pa.string()),
                      "rhs": pa.array(rhs, pa.string()),
                      "pair_count": pa.array(pcnt, pa.int64())})
    return table, streams


def _merge_loop_distributed(vocab: rd.Dataset, n_merges: int,
                            n_shards: int) -> tuple[pa.Table, rd.Dataset]:
    """Returns (merge table, final (word, s, cnt) streams Dataset) —
    the per-round broadcast replace leaves the encoded vocabulary
    materialized for free."""
    stream_schema = pa.schema([("word", pa.string()), ("s", pa.string()),
                               ("cnt", pa.int64())])

    def to_streams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "word" not in t.column_names:
            return stream_schema.empty_table()
        return pa.table({"word": t["word"],
                         "s": _streams_from_words(t["word"]),
                         "cnt": t["cnt"]})

    streams = vocab.map_batches(to_streams, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    pair_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                             ("c", pa.int64()), ("_shard", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        import polars as pl
        if t.num_rows == 0 or "s" not in t.column_names:
            return pair_schema.empty_table()
        s = t["s"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        u, v, w = _pairs_of(s, t["cnt"].to_numpy())
        if len(u) == 0:
            return pair_schema.empty_table()
        agg = (pl.DataFrame({"u": u.astype(str), "v": v.astype(str),
                             "c": w})
               .group_by(["u", "v"]).agg(pl.col("c").sum()))
        key = agg["u"] + "\x00" + agg["v"]
        h = pd.util.hash_pandas_object(key.to_pandas(),
                                       index=False).to_numpy()
        return pa.table({"u": pa.array(agg["u"].to_numpy().astype(str)),
                         "v": pa.array(agg["v"].to_numpy().astype(str)),
                         "c": pa.array(agg["c"].to_numpy()
                                       .astype(np.int64)),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    def shard_top(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"u": pd.Series([], dtype=str),
                              "v": pd.Series([], dtype=str),
                              "c": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        agg = g.groupby(["u", "v"], sort=False)["c"].sum().reset_index()
        agg = agg.sort_values(["c", "u", "v"],
                              ascending=[False, True, True]).head(1)
        agg["c"] = agg["c"].astype(np.int64)
        return agg[["u", "v", "c"]]

    ranks, lhs, rhs, pcnt = [], [], [], []
    for r in range(n_merges):
        winners = (streams.map_batches(pair_partial, batch_format="pyarrow",
                                       zero_copy_batch=True)
                   .groupby("_shard").map_groups(shard_top,
                                                 batch_format="pandas")
                   .to_pandas())
        if len(winners) == 0 or "u" not in winners.columns:
            break
        winners = winners.sort_values(["c", "u", "v"],
                                      ascending=[False, True, True])
        u, v, c = (winners["u"].iloc[0], winners["v"].iloc[0],
                   int(winners["c"].iloc[0]))
        ranks.append(r + 1)
        lhs.append(u)
        rhs.append(v)
        pcnt.append(c)
        pat, rep = f"<{u}><{v}>", f"<{u}{v}>"

        def apply_merge(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            if t.num_rows == 0 or "s" not in t.column_names:
                return stream_schema.empty_table()
            s = pc.replace_substring(t["s"], pattern=pat, replacement=rep)
            return pa.table({"word": t["word"], "s": s, "cnt": t["cnt"]})

        streams = streams.map_batches(apply_merge, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
    table = pa.table({"merge_rank": pa.array(ranks, pa.int64()),
                      "lhs": pa.array(lhs, pa.string()),
                      "rhs": pa.array(rhs, pa.string()),
                      "pair_count": pa.array(pcnt, pa.int64())})
    return table, streams


def bpe_merges(docs: rd.Dataset, *, text_col: str = "text",
               n_merges: int = 6, n_shards: int | None = None,
               broadcast_threshold: int = 2_000_000) -> pa.Table:
    """Learn the first ``n_merges`` BPE merges from the corpus.  Output
    (merge_rank, lhs, rhs, pair_count) in learn order; pair_count is the
    frequency-weighted adjacent-pair count at selection time.  Stops
    early when no pair remains.  SQL twin: ``oracle.bpe_merges_sql``
    (same round count, same tie-break, same replace semantics)."""
    n_shards = resolve_shards(n_shards)
    vocab = _word_count_ds(docs, text_col, n_shards).materialize()
    if vocab.count() <= broadcast_threshold:
        vt = pa.Table.from_pandas(vocab.to_pandas(), preserve_index=False)
        if vt.num_rows == 0 or "word" not in vt.column_names:
            return _empty_merges()
        words = vt["word"]
        words = (words.combine_chunks()
                 if isinstance(words, pa.ChunkedArray) else words)
        return _merge_loop_local(words.cast(pa.string()),
                                 vt["cnt"].to_numpy(), n_merges)[0]
    return _merge_loop_distributed(vocab, n_merges, n_shards)[0]


def _stream_tok_counts(streams: pa.Array) -> np.ndarray:
    """Tokens per guard-wrapped stream = count of '>' (0 for '')."""
    return pc.count_substring(streams, ">").to_numpy(
        zero_copy_only=False).astype(np.int64)


_ENC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                         ("n_tokens", pa.int64())])


def bpe_encode(docs: rd.Dataset, *, text_col: str = "text",
               id_col: str = "doc_id", n_merges: int = 6,
               n_shards: int | None = None,
               broadcast_threshold: int = 2_000_000) -> pa.Table:
    """Train-then-apply: learn ``n_merges`` BPE merges from the corpus
    (exactly ``bpe_merges``), then tokenize every document with the
    learned table.  Output per doc with >= 1 non-empty word:
    (doc_id, n_words, n_tokens) where n_tokens is the post-merge token
    count — the real-tokenizer sequence-length estimator of a
    pack/mix/curriculum pipeline.

    The encode pass never re-touches corpus bytes: merges apply to the
    DISTINCT-WORD streams the learning sweep already encoded, and docs
    need only a word -> token-count lookup.  Plans: vocabulary within
    ``broadcast_threshold`` -> broadcast a sorted (word, ntok) map and
    fold per doc in one corpus pass (zero extra exchanges); above it ->
    (doc, word) occurrence partials meet the encoded vocab on ONE
    hash(word) exchange, then ONE hash(doc) exchange sums.  SQL twin
    ``oracle.bpe_encode_sql`` replays the merge chain per distinct word
    and joins docs back on the word string."""
    n_shards = resolve_shards(n_shards)
    vocab = _word_count_ds(docs, text_col, n_shards).materialize()
    occ_schema = pa.schema([("word", pa.string()), ("doc", pa.int64()),
                            ("occ", pa.int64()), ("_shard", pa.int64())])

    def doc_word_occ(t: pa.Table) -> pa.Table:
        """(word, doc, occurrence count) in-batch fold (postings shape)."""
        if t.num_rows == 0 or text_col not in t.column_names:
            return occ_schema.empty_table()
        ls = pc.split_pattern(t[text_col], " ")
        ls = ls.combine_chunks() if isinstance(ls, pa.ChunkedArray) else ls
        flat = pc.list_flatten(ls)
        words = flat.to_numpy(zero_copy_only=False)
        offs = np.asarray(ls.offsets, dtype=np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = np.repeat(np.arange(len(ids), dtype=np.int64),
                        np.diff(offs))
        keep = words != ""
        words, seg = words[keep], seg[keep]
        if len(words) == 0:
            return occ_schema.empty_table()
        order = np.lexsort((words, seg))
        ws, ss = words[order], seg[order]
        runs = np.flatnonzero(np.r_[True, (ws[1:] != ws[:-1])
                                    | (ss[1:] != ss[:-1])])
        occ = np.diff(np.r_[runs, len(ws)]).astype(np.int64)
        uw = ws[runs]
        h = pd.util.hash_pandas_object(pd.Series(uw), index=False).to_numpy()
        return pa.table({"word": pa.array(uw.astype(str)),
                         "doc": pa.array(ids[ss[runs]]),
                         "occ": pa.array(occ),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    if vocab.count() <= broadcast_threshold:
        vt = pa.Table.from_pandas(vocab.to_pandas(), preserve_index=False)
        if vt.num_rows == 0 or "word" not in vt.column_names:
            return _ENC_SCHEMA.empty_table()
        words = vt["word"]
        words = (words.combine_chunks()
                 if isinstance(words, pa.ChunkedArray) else words)
        words = words.cast(pa.string())
        _, streams = _merge_loop_local(words, vt["cnt"].to_numpy(),
                                       n_merges)
        warr = words.to_numpy(zero_copy_only=False)
        order = np.argsort(warr)
        wsorted = warr[order]
        ntok = _stream_tok_counts(streams)[order]
        import ray

        ref = ray.put((wsorted, ntok))

        def fold_docs(t: pa.Table) -> pa.Table:
            from optimizing_ray.broadcast import cached
            if t.num_rows == 0 or text_col not in t.column_names:
                return _ENC_SCHEMA.empty_table()
            ws, nt = cached(("bpe_enc", ref.hex()), lambda: ray.get(ref))
            lt = doc_word_occ(t)
            if lt.num_rows == 0:
                return _ENC_SCHEMA.empty_table()
            w = lt["word"].to_numpy(zero_copy_only=False)
            doc = lt["doc"].to_numpy(zero_copy_only=False)
            occ = lt["occ"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ws, w)  # every corpus word is in vocab
            toks = occ * nt[pos]
            runs = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
            return pa.table({
                "doc_id": pa.array(doc[runs]),
                "n_words": pa.array(np.add.reduceat(occ, runs)),
                "n_tokens": pa.array(np.add.reduceat(toks, runs))})

        out = (docs.map_batches(fold_docs, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas())
        if len(out) == 0:
            return _ENC_SCHEMA.empty_table()
        out = out.sort_values("doc_id").reset_index(drop=True)
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=_ENC_SCHEMA)

    _, streams = _merge_loop_distributed(vocab, n_merges, n_shards)
    side_schema = pa.schema([("word", pa.string()), ("doc", pa.int64()),
                             ("occ", pa.int64()), ("ntok", pa.int64()),
                             ("_shard", pa.int64())])

    def occ_leg(t: pa.Table) -> pa.Table:
        lt = doc_word_occ(t)
        return pa.table({"word": lt["word"], "doc": lt["doc"],
                         "occ": lt["occ"],
                         "ntok": pa.array(
                             np.full(lt.num_rows, -1, np.int64)),
                         "_shard": lt["_shard"]})

    def vocab_leg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "word" not in t.column_names:
            return side_schema.empty_table()
        s = t["s"]
        s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
        ntok = _stream_tok_counts(s)
        w = t["word"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_pandas_object(pd.Series(w), index=False).to_numpy()
        return pa.table({"word": t["word"],
                         "doc": pa.array(np.full(len(w), -1, np.int64)),
                         "occ": pa.array(np.zeros(len(w), np.int64)),
                         "ntok": pa.array(ntok),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    def join_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc": pd.Series([], dtype=np.int64),
            "w": pd.Series([], dtype=np.int64),
            "tk": pd.Series([], dtype=np.int64),
            "_s2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        vm = g[g["ntok"] >= 0]
        oc = g[g["ntok"] < 0]
        if len(vm) == 0 or len(oc) == 0:
            return empty
        m = oc.merge(vm[["word", "ntok"]], on="word", how="inner",
                     suffixes=("", "_v"))
        if len(m) == 0:
            return empty
        doc = m["doc"].to_numpy(np.int64)
        occ = m["occ"].to_numpy(np.int64)
        toks = occ * m["ntok_v"].to_numpy(np.int64)
        agg = pd.DataFrame({"doc": doc, "w": occ, "tk": toks}).groupby(
            "doc", sort=False).sum().reset_index()
        gold = np.uint64(0x9E3779B97F4A7C15)
        with np.errstate(over="ignore"):
            sh = (agg["doc"].to_numpy(np.int64).astype(np.uint64)
                  * gold) >> np.uint64(33)
        agg["_s2"] = (sh % np.uint64(n_shards)).astype(np.int64)
        return agg

    def doc_fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "n_words": pd.Series([], dtype=np.int64),
            "n_tokens": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        agg = g.groupby("doc", sort=False)[["w", "tk"]].sum().reset_index()
        return pd.DataFrame({"doc_id": agg["doc"].astype(np.int64),
                             "n_words": agg["w"].astype(np.int64),
                             "n_tokens": agg["tk"].astype(np.int64)})

    occ_ds = docs.map_batches(occ_leg, batch_format="pyarrow",
                              zero_copy_batch=True)
    voc_ds = streams.map_batches(vocab_leg, batch_format="pyarrow",
                                 zero_copy_batch=True)
    out = (occ_ds.union(voc_ds)
           .groupby("_shard").map_groups(join_shard, batch_format="pandas")
           .groupby("_s2").map_groups(doc_fold, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "doc_id" not in out.columns:
        return _ENC_SCHEMA.empty_table()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=_ENC_SCHEMA)

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

__all__ = ["bpe_merges"]

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
                      n_merges: int) -> pa.Table:
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
    return pa.table({"merge_rank": pa.array(ranks, pa.int64()),
                     "lhs": pa.array(lhs, pa.string()),
                     "rhs": pa.array(rhs, pa.string()),
                     "pair_count": pa.array(pcnt, pa.int64())})


def _merge_loop_distributed(vocab: rd.Dataset, n_merges: int,
                            n_shards: int) -> pa.Table:
    stream_schema = pa.schema([("s", pa.string()), ("cnt", pa.int64())])

    def to_streams(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "word" not in t.column_names:
            return stream_schema.empty_table()
        return pa.table({"s": _streams_from_words(t["word"]),
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
            return pa.table({"s": s, "cnt": t["cnt"]})

        streams = streams.map_batches(apply_merge, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
    return pa.table({"merge_rank": pa.array(ranks, pa.int64()),
                     "lhs": pa.array(lhs, pa.string()),
                     "rhs": pa.array(rhs, pa.string()),
                     "pair_count": pa.array(pcnt, pa.int64())})


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
                                 vt["cnt"].to_numpy(), n_merges)
    return _merge_loop_distributed(vocab, n_merges, n_shards)

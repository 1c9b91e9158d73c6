"""BPE merge learning vs a pure-Python reference trainer (canonical
sweep semantics: merge consumes both tokens, scan resumes after), plus
local-vs-distributed plan equality."""

import os
import sys
from collections import Counter

import pyarrow as pa
import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optimizing_ray.pipelines.bpe import bpe_encode, bpe_merges


def brute_bpe(texts, n_merges):
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    tok = {w: list(w) for w in wc}
    out = []
    for r in range(n_merges):
        pairs = Counter()
        for w, c in wc.items():
            t = tok[w]
            for i in range(len(t) - 1):
                pairs[(t[i], t[i + 1])] += c
        if not pairs:
            break
        (u, v), c = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((r + 1, u, v, c))
        for w in tok:
            t, nt, i = tok[w], [], 0
            while i < len(t):
                if i < len(t) - 1 and t[i] == u and t[i + 1] == v:
                    nt.append(u + v)
                    i += 2
                else:
                    nt.append(t[i])
                    i += 1
            tok[w] = nt
    return out


CASES = [
    # odd self-pair runs (the sweep-semantics trap) + repeats
    ["abab abab aaa", "aaaaa abab ra"],
    # the classic Sennrich example
    ["low low low low low lower lower newest newest newest newest "
     "newest newest widest widest widest"],
    # single-char words (no pairs contributed) + ties
    ["a b c", "ab ba"],
    # one word family, exhausts quickly
    ["zzzzzz zz zzz"],
]


def test_bpe_matches_brute(ray_session):
    for texts in CASES:
        t = pa.table({"text": pa.array(texts)})
        got = list(bpe_merges(rd.from_arrow(t), n_merges=6).to_pandas()
                   .itertuples(index=False, name=None))
        assert got == brute_bpe(texts, 6), texts


def test_bpe_early_stop_and_empty(ray_session):
    # all words fully merged before the horizon -> fewer rows
    t = pa.table({"text": pa.array(["ab ab ab"])})
    out = bpe_merges(rd.from_arrow(t), n_merges=6).to_pandas()
    assert list(out.itertuples(index=False, name=None)) == [(1, "a", "b", 3)]
    # single-char words only -> no merges at all, typed empty table
    t2 = pa.table({"text": pa.array(["a b a", "c"])})
    out2 = bpe_merges(rd.from_arrow(t2), n_merges=3).to_pandas()
    assert len(out2) == 0
    assert list(out2.columns) == ["merge_rank", "lhs", "rhs", "pair_count"]


def test_bpe_plans_agree(ray_session):
    texts = ["abab abab aaa xyz xy", "aaaaa abab ra low lower"] * 40
    t = pa.table({"text": pa.array(texts)})
    loc = bpe_merges(rd.from_arrow(t), n_merges=5).to_pandas()
    dist = bpe_merges(rd.from_arrow(t), n_merges=5,
                      broadcast_threshold=0).to_pandas()
    assert loc.equals(dist)
    assert list(loc.itertuples(index=False, name=None)) == \
        brute_bpe(texts, 5)


def brute_encode(texts, n_merges):
    """Apply brute_bpe's learned merges: per doc (doc_id, n_words,
    n_tokens) over non-empty words; docs with no words absent."""
    merges = brute_bpe(texts, n_merges)
    out = []
    for doc_id, text in enumerate(texts):
        words = [w for w in text.split(" ") if w]
        if not words:
            continue
        n_tok = 0
        for w in words:
            t = list(w)
            for _, u, v, _c in merges:
                nt, i = [], 0
                while i < len(t):
                    if i < len(t) - 1 and t[i] == u and t[i + 1] == v:
                        nt.append(u + v)
                        i += 2
                    else:
                        nt.append(t[i])
                        i += 1
                t = nt
            n_tok += len(t)
        out.append((doc_id, len(words), n_tok))
    return out


def test_bpe_encode_matches_brute(ray_session):
    for texts in CASES + [["", "ab ab", ""]]:
        t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
        got = list(bpe_encode(rd.from_arrow(t), n_merges=6).to_pandas()
                   .itertuples(index=False, name=None))
        assert got == brute_encode(texts, 6), texts


def test_bpe_encode_plans_agree(ray_session):
    texts = ["abab abab aaa xyz xy", "aaaaa abab ra low lower",
             "low low newest widest"] * 30
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}).combine_chunks()
    ds = rd.from_arrow(t).repartition(3)
    loc = bpe_encode(ds, n_merges=5).to_pandas()
    dist = bpe_encode(ds, n_merges=5, broadcast_threshold=0).to_pandas()
    assert loc.equals(dist)
    assert list(loc.itertuples(index=False, name=None)) == \
        brute_encode(texts, 5)


def test_bpe_encode_empty_corpus(ray_session):
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([""])})
    out = bpe_encode(rd.from_arrow(t), n_merges=3).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_words", "n_tokens"]

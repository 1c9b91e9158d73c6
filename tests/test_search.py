"""Inverted index + boolean search: brute equivalence, pruned reads,
degenerate queries, idempotent rebuild."""

import collections
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from optimizing_ray.pipelines import search

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick fox"),
    (2, "lazy dog sleeps"),
    (3, "fox and dog and fox"),
    (4, ""),  # empty doc: one '' token
    (5, "the the the"),
    (6, "quick dog"),
    (7, "brown fox quick dog quick"),
]


def _brute(terms):
    uniq = sorted(set(terms))
    out = []
    for doc_id, text in DOCS:
        toks = text.split(" ")
        c = collections.Counter(toks)
        if all(c[t] > 0 for t in uniq):
            out.append((doc_id, sum(c[t] for t in uniq)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("inv") / "idx")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })).repartition(3)
    info = search.build_inverted_index(docs, d, n_parts=16)
    assert info["parts"] >= 1
    # posting rows = sum of per-doc distinct token counts
    want_rows = sum(len(set(t.split(" "))) for _, t in DOCS)
    assert info["rows"] == want_rows
    return d


def test_conjunctive_matches_brute(store):
    for terms in (["fox"], ["quick", "dog"], ["the"],
                  ["quick", "fox", "brown"], ["dog", "dog"]):
        stats = {}
        got = search.boolean_search(store, terms, n_parts=16,
                                    stats=stats).to_pandas()
        want = _brute(terms)
        assert list(zip(got["doc_id"], got["tf_total"])) == want, terms
        assert stats["parts_read"] <= len(set(terms))
        assert stats["parts_total"] >= stats["parts_read"]


def test_reads_are_pruned_to_query_parts(store):
    stats = {}
    search.boolean_search(store, ["fox"], n_parts=16, stats=stats)
    assert stats["parts_read"] == 1
    assert stats["parts_total"] > 1


def test_unknown_term_returns_empty(store):
    stats = {}
    got = search.boolean_search(store, ["fox", "zzz_not_a_token"],
                                n_parts=16, stats=stats).to_pandas()
    assert len(got) == 0
    got2 = search.boolean_search(store, [], n_parts=16).to_pandas()
    assert len(got2) == 0


def test_empty_token_is_searchable(store):
    # '' (hash 0) is a real token of the empty doc — string_split
    # semantics keep it on both sides
    got = search.boolean_search(store, [""], n_parts=16).to_pandas()
    assert got["doc_id"].tolist() == [4]


def _brute_ranked(queries, k=10, scale=1000):
    n = len(DOCS)
    dfm = collections.Counter()
    tfs = {}
    for doc_id, text in DOCS:
        c = collections.Counter(text.split(" "))
        tfs[doc_id] = c
        for t in c:
            dfm[t] += 1
    out = []
    for qi, q in enumerate(queries):
        scores = collections.Counter()
        for t in sorted(set(q)):
            if dfm[t] == 0:
                continue
            w = (scale * (2 * (n - dfm[t]) + 1)) // (2 * dfm[t] + 1)
            for doc_id, c in tfs.items():
                if c[t] > 0:
                    scores[doc_id] += c[t] * w
        ranked = sorted(scores.items(), key=lambda r: (-r[1], r[0]))[:k]
        out += [(qi, rk + 1, d, s) for rk, (d, s) in enumerate(ranked)]
    return out


def test_ranked_matches_brute(store):
    queries = [["fox"], ["quick", "dog"], ["the", "fox", "zzz_not_a_tok"],
               ["dog", "dog", "lazy"], []]
    stats = {}
    got = search.ranked_search(store, queries, n_docs=len(DOCS), k=3,
                               n_parts=16, stats=stats).to_pandas()
    want = _brute_ranked(queries, k=3)
    assert list(zip(got["query_id"], got["ret_rank"], got["doc_id"],
                    got["score"])) == want
    assert stats["parts_read"] <= len(
        {t for q in queries for t in q})
    assert stats["parts_total"] >= stats["parts_read"]


def test_ranked_no_hits_and_empty(store):
    got = search.ranked_search(store, [["zzz"], []], n_docs=len(DOCS),
                               n_parts=16).to_pandas()
    assert len(got) == 0
    assert list(got.columns) == ["query_id", "ret_rank", "doc_id", "score"]


def test_ranked_k_cuts_with_doc_id_ties(store):
    # 'the' appears in docs 0 and 5 with different tf; 'fox' in 0,1,3,7
    got = search.ranked_search(store, [["fox", "the"]], n_docs=len(DOCS),
                               k=2, n_parts=16).to_pandas()
    want = _brute_ranked([["fox", "the"]], k=2)
    assert list(zip(got["query_id"], got["ret_rank"], got["doc_id"],
                    got["score"])) == want
    assert len(got) == 2


def test_rebuild_is_idempotent(store, ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    }))
    before = sorted(os.listdir(store))
    info = search.build_inverted_index(docs, store, n_parts=16)
    assert sorted(os.listdir(store)) == before
    got = search.boolean_search(store, ["quick", "dog"],
                                n_parts=16).to_pandas()
    assert list(zip(got["doc_id"], got["tf_total"])) == _brute(
        ["quick", "dog"])
    assert info["rows"] == sum(len(set(t.split(" "))) for _, t in DOCS)


def test_phrase_search_matches_brute(ray_session):
    """Consecutive-token phrase matches vs a python brute: overlapping
    occurrences count ('x x x' holds TWO 'x x' matches), boundary
    tokens don't match substrings ('scan' != 'scanner'), doc-edge
    windows, multi-phrase over one shared tokenize pass."""
    texts = [
        "x x x y",                  # two overlapping "x x", one "x y"
        "scanner scan a scan b",    # "scan a scan" once; no substring hit
        "y x",                      # no "x x"
        "x x",                      # exact doc == phrase
        "solo",
    ]
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)]).repartition(3)
    phrases = ["x x", "scan a scan", "x", "missing phrase"]
    got = search.phrase_search(docs, phrases).to_pandas()

    def brute(p, t):
        pt, wt = p.split(" "), t.split(" ")
        hits = [i for i in range(len(wt) - len(pt) + 1)
                if wt[i:i + len(pt)] == pt]
        return (len(hits), hits[0] + 1) if hits else None

    want = []
    for qi, p in enumerate(phrases):
        for di, t in enumerate(texts):
            r = brute(p, t)
            if r:
                want.append((qi, di, r[0], r[1]))
    assert list(map(tuple, got.to_numpy())) == sorted(want)
    assert (0, 0, 2, 1) in want          # overlap counted
    assert not any(q == 3 for q, *_ in want)   # missing phrase empty


def test_bm25_matches_float_reference(ray_session, tmp_path):
    """Integer BM25 vs the textbook float formula (same idf weight):
    identical ranking on the fixture corpus, exact per-term integer
    contributions, and length normalization actually demotes the long
    doc relative to raw tf scoring."""
    import math

    d = str(tmp_path / "bm")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })).repartition(3)
    info = search.build_inverted_index(docs, d, n_parts=16)
    queries = [["quick", "dog"], ["fox"]]
    got = search.bm25_search(d, queries, k=8, n_parts=16)
    got = got.to_pandas()

    dl = {i: len(t.split(" ")) for i, t in DOCS}
    # the store itself carries everything BM25 needs: corpus scalars in
    # _meta.json and per-doc lengths denormalized onto the posting rows
    # (no corpus pass / broadcast at query time — round-4 verdict fix)
    assert info["n_docs"] == len(DOCS)
    assert info["total_tokens"] == sum(dl.values())
    assert info["dl_max"] == max(dl.values())
    import json
    import pyarrow.parquet as pq
    meta = json.load(open(os.path.join(d, "_meta.json")))
    assert (meta["n_docs"], meta["total_tokens"], meta["dl_max"]) == (
        len(DOCS), sum(dl.values()), max(dl.values()))
    for f in os.listdir(d):
        if f.startswith("part=") and f.endswith(".parquet"):
            part = pq.read_table(os.path.join(d, f))
            assert "dl" in part.column_names
            docs_np = part["doc"].to_numpy()
            dls = part["dl"].to_numpy()
            assert all(dls[j] == dl[docs_np[j]] for j in range(len(dls)))
    T = sum(dl.values())
    N = len(DOCS)
    tf = {i: collections.Counter(t.split(" ")) for i, t in DOCS}
    df = collections.Counter(t for _, x in DOCS for t in set(x.split(" ")))

    def w(t):
        return (1000 * (2 * (N - df[t]) + 1)) // (2 * df[t] + 1)

    for qi, q in enumerate(queries):
        # exact integer scores
        want = {}
        for i, _ in DOCS:
            s = sum((w(t) * 22 * tf[i][t] * T)
                    // (10 * T * tf[i][t] + 3 * T + 9 * dl[i] * N)
                    for t in set(q) if tf[i][t] > 0)
            if s > 0:
                want[i] = s
        rows = got[got["query_id"] == qi]
        assert {r.doc_id: r.score for r in rows.itertuples()} == want
        # ranking == float BM25 ranking with the same integer idf
        def fscore(i):
            s = 0.0
            for t in set(q):
                if tf[i][t] == 0:
                    continue
                norm = tf[i][t] * 2.2 / (tf[i][t] + 1.2 *
                                         (0.25 + 0.75 * dl[i] / (T / N)))
                s += w(t) * norm
            return s
        frank = sorted(want, key=lambda i: (-fscore(i), i))
        assert list(rows.sort_values("ret_rank")["doc_id"]) == frank


def test_boolean_search_limit_cap(store):
    """limit caps the driver collect with globally-safe per-shard cuts:
    the capped result equals the head of the uncapped ranking."""
    full = search.boolean_search(store, ["dog"], n_parts=16).to_pandas()
    assert len(full) >= 3
    for lim in (1, 2, len(full), len(full) + 5):
        capped = search.boolean_search(store, ["dog"], n_parts=16,
                                       limit=lim).to_pandas()
        assert capped.equals(full.head(min(lim, len(full)))
                             .reset_index(drop=True))

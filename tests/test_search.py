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

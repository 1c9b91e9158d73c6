"""kNN pipelines vs. exact brute-force numpy oracle."""

import numpy as np
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import knn
from optimizing_ray.stages.assign import assign_tiles


@pytest.fixture(scope="module")
def corpus():
    return synth.documents_batch(np.arange(3000), variant="flat2d", with_spans=False)


@pytest.fixture(scope="module")
def queries():
    return synth.knn_queries_table(12)


def oracle_knn(corpus, queries):
    x, y = corpus["x"].to_numpy(), corpus["y"].to_numpy()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    out = {}
    for row in queries.to_pylist():
        d2 = (x - row["x"]) ** 2 + (y - row["y"]) ** 2
        order = np.lexsort((ids, d2))[: row["k"]]
        out[row["query_id"]] = list(zip(ids[order], np.sqrt(d2[order])))
    return out


def check(df, want):
    got = {}
    for qid, g in df.groupby("query_id"):
        g = g.sort_values("knn_rank")
        got[qid] = list(zip(g["doc_id"], g["dist"]))
    assert set(got) == set(want)
    for qid in want:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]], qid
        np.testing.assert_allclose([v for _, v in got[qid]],
                                   [v for _, v in want[qid]], rtol=1e-12)


def test_knn_brute_matches_oracle(ray_session, corpus, queries):
    import ray.data as rd
    docs = rd.from_arrow(corpus)
    res = knn.knn_brute(docs, queries).to_pandas()
    check(res, oracle_knn(corpus, queries))


def test_knn_ring_matches_oracle(ray_session, corpus, queries):
    import ray.data as rd
    docs = assign_tiles(rd.from_arrow(corpus), 3, WORLD_2D)
    res = knn.knn_ring(docs, queries, world=WORLD_2D, depth=3).to_pandas()
    check(res, oracle_knn(corpus, queries))


def test_knn_k_larger_than_corpus(ray_session):
    import pyarrow as pa
    import ray.data as rd
    tiny = synth.documents_batch(np.arange(3), variant="flat2d", with_spans=False)
    q = pa.table({"query_id": ["q0"], "x": [50.0], "y": [50.0], "k": pa.array([16], pa.int32())})
    res = knn.knn_brute(rd.from_arrow(tiny), q).to_pandas()
    assert len(res) == 3  # returns what exists


def test_knn_3d_matches_oracle(ray_session):
    import pyarrow as pa
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(2500), variant="uniform", with_spans=False)
    qi = np.arange(8, dtype=np.int64)
    q = pa.table({
        "query_id": pa.array([f"q3-{i}" for i in qi]),
        "x": pa.array(synth.u01(qi, 61) * 800.0),
        "y": pa.array(synth.u01(qi, 62) * 600.0),
        "z": pa.array(synth.u01(qi, 63) * 50.0),
        "k": pa.array(np.full(8, 5), pa.int32()),
    })
    res = knn.knn_brute(rd.from_arrow(corpus), q, dims=3).to_pandas()
    x, y, z = (corpus[c].to_numpy() for c in ("x", "y", "z"))
    ids = np.asarray(corpus["doc_id"].to_pylist())
    for row in q.to_pylist():
        d2 = (x - row["x"]) ** 2 + (y - row["y"]) ** 2 + (z - row["z"]) ** 2
        want = ids[np.lexsort((ids, d2))[:5]]
        g = res[res.query_id == row["query_id"]].sort_values("knn_rank")
        np.testing.assert_array_equal(g["doc_id"].to_numpy(), want)


def _knn_join_oracle(ids, x, y, k, exclude_self=True):
    rows = []
    for i in range(len(ids)):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        order = np.lexsort((ids, d2))
        if exclude_self:
            order = order[ids[order] != ids[i]]
        for r, j in enumerate(order[:k]):
            rows.append((ids[i], ids[j], np.sqrt(d2[j]), r + 1))
    return rows


def test_knn_join_self_matches_oracle(ray_session, corpus):
    """Distributed kNN self-join == per-row brute top-k, incl. the
    (dist, id) tiebreak and self-exclusion."""
    import ray.data as rd

    sub = corpus.slice(0, 500).select(["doc_id", "x", "y"])
    ds = rd.from_arrow(sub).repartition(4)
    got = (knn.knn_join(ds, ds, world=WORLD_2D, depth=4, k=3,
                        exclude_self=True, num_partitions=4)
           .to_pandas().sort_values(["doc_id", "knn_rank"])
           .reset_index(drop=True))
    ids = sub["doc_id"].to_numpy()
    want = _knn_join_oracle(ids, sub["x"].to_numpy(), sub["y"].to_numpy(), 3)
    assert len(got) == len(want)
    for (gi, gn, gd, gr), (wi, wn, wd, wr) in zip(
            got.itertuples(index=False),
            sorted(want, key=lambda r: (r[0], r[3]))):
        assert (gi, gn, gr) == (wi, wn, wr)
        assert abs(gd - wd) < 1e-12


def test_knn_join_sparse_left_ring_expansion(ray_session):
    """Left rows in EMPTY regions (zero candidates in early rings) stay
    pending through the left-outer join and resolve in later rounds."""
    import pyarrow as pa
    import ray.data as rd

    # right side clustered in one corner; left probe in the far corner
    rx = np.linspace(1.0, 5.0, 20)
    right = pa.table({"doc_id": pa.array(np.arange(20)),
                      "x": pa.array(rx), "y": pa.array(rx)})
    left = pa.table({"doc_id": pa.array([1000]),
                     "x": pa.array([99_000.0]), "y": pa.array([99_000.0])})
    got = (knn.knn_join(rd.from_arrow(left), rd.from_arrow(right),
                        world=WORLD_2D, depth=4, k=2, num_partitions=2)
           .to_pandas().sort_values("knn_rank"))
    # nearest two right rows by euclidean distance from (99000, 99000)
    d2 = (rx - 99_000.0) ** 2 * 2
    want = np.arange(20)[np.argsort(d2)][:2]
    assert list(got["neighbor_id"]) == list(want)
    assert len(got) == 2


def test_knn_join_fewer_than_k(ray_session):
    """Corpus smaller than k: every left row gets all candidates, ranked,
    once the ring covers the world (forced-done path)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1, 2]),
                  "x": pa.array([10.0, 20.0, 90_000.0]),
                  "y": pa.array([10.0, 20.0, 90_000.0])})
    ds = rd.from_arrow(t)
    got = (knn.knn_join(ds, ds, world=WORLD_2D, depth=4, k=5,
                        exclude_self=True, num_partitions=2)
           .to_pandas())
    assert len(got) == 6  # 3 left rows x 2 other docs each
    assert set(got.groupby("doc_id")["knn_rank"].max()) == {2}


def test_knn_join_broadcast_plan_equivalent(ray_session, corpus):
    """The nrows-gated broadcast plan (zero shuffles) returns EXACTLY the
    distributed plan's rows — same ids, ranks, and (dist, id) tiebreaks."""
    import ray.data as rd

    sub = corpus.slice(0, 500).select(["doc_id", "x", "y"])
    ds = rd.from_arrow(sub).repartition(4)
    got = (knn.knn_join(ds, ds, world=WORLD_2D, depth=4, k=3,
                        exclude_self=True, nrows=500)
           .to_pandas().sort_values(["doc_id", "knn_rank"])
           .reset_index(drop=True))
    ids = sub["doc_id"].to_numpy()
    want = _knn_join_oracle(ids, sub["x"].to_numpy(), sub["y"].to_numpy(), 3)
    assert len(got) == len(want)
    for (gi, gn, gd, gr), (wi, wn, wd, wr) in zip(
            got.itertuples(index=False),
            sorted(want, key=lambda r: (r[0], r[3]))):
        assert (gi, gn, gr) == (wi, wn, wr)
        assert abs(gd - wd) < 1e-12


def test_knn_join_broadcast_string_ids_and_fewer_than_k(ray_session):
    """Broadcast plan with STRING ids (lexsortable unicode path) and a
    corpus smaller than k (forced-done once the ring covers the grid)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(["a", "b", "c"]),
                  "x": pa.array([10.0, 20.0, 90_000.0]),
                  "y": pa.array([10.0, 20.0, 90_000.0])})
    ds = rd.from_arrow(t)
    got = (knn.knn_join(ds, ds, world=WORLD_2D, depth=4, k=5,
                        exclude_self=True, nrows=3)
           .to_pandas())
    assert len(got) == 6
    assert set(got.groupby("doc_id")["knn_rank"].max()) == {2}
    assert got["neighbor_id"].dtype == object  # ids stay strings


def test_knn_join_broadcast_sparse_left(ray_session):
    """Broadcast plan: a left probe far from all right rows expands its
    ring locally until candidates appear."""
    import pyarrow as pa
    import ray.data as rd

    rx = np.linspace(1.0, 5.0, 20)
    right = pa.table({"doc_id": pa.array(np.arange(20)),
                      "x": pa.array(rx), "y": pa.array(rx)})
    left = pa.table({"doc_id": pa.array([1000]),
                     "x": pa.array([99_000.0]), "y": pa.array([99_000.0])})
    got = (knn.knn_join(rd.from_arrow(left), rd.from_arrow(right),
                        world=WORLD_2D, depth=4, k=2, nrows=20)
           .to_pandas().sort_values("knn_rank"))
    d2 = (rx - 99_000.0) ** 2 * 2
    want = np.arange(20)[np.argsort(d2)][:2]
    assert list(got["neighbor_id"]) == list(want)


def test_knn_join_broadcast_mixed_id_types(ray_session):
    """Left string ids vs right INT ids: neighbor_id keeps the right
    side's type (regression: it was cast to the left type)."""
    import pyarrow as pa
    import ray.data as rd

    left = pa.table({"doc_id": pa.array(["q1", "q2"]),
                     "x": pa.array([10.0, 50_000.0]),
                     "y": pa.array([10.0, 50_000.0])})
    right = pa.table({"doc_id": pa.array(np.arange(50, dtype=np.int64)),
                      "x": pa.array(np.linspace(0, 99_000, 50)),
                      "y": pa.array(np.linspace(0, 99_000, 50))})
    got = (knn.knn_join(rd.from_arrow(left), rd.from_arrow(right),
                        world=WORLD_2D, depth=4, k=2, nrows=50)
           .to_pandas())
    assert len(got) == 4
    assert got["neighbor_id"].dtype == np.int64
    assert set(got["doc_id"]) == {"q1", "q2"}

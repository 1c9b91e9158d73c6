"""Spatial box join vs. brute-force oracle and the reference quadtree rule."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray import refsim, synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import box_join
from optimizing_ray.stages.assign import assign_point_cells_batch

N_DOCS = 4000
N_QUERIES = 25


@pytest.fixture(scope="module")
def corpus():
    return synth.documents_batch(np.arange(N_DOCS), variant="flat2d", with_spans=False)


@pytest.fixture(scope="module")
def queries():
    return synth.queries_table(N_QUERIES, variant="flat2d")


def brute_pairs(corpus, queries, predicate="inclusive"):
    x, y = corpus["x"].to_numpy(), corpus["y"].to_numpy()
    w, h = corpus["w"].to_numpy(), corpus["h"].to_numpy()
    doc_id = np.asarray(corpus["doc_id"].to_pylist())
    pairs = set()
    for row in queries.to_pylist():
        if predicate == "ref2d":
            m = ((row["min_x"] < x + w) & (row["max_x"] >= x)
                 & (row["min_y"] < y + h) & (row["max_y"] >= y))
        else:
            m = ((x <= row["max_x"]) & (x + w >= row["min_x"])
                 & (y <= row["max_y"]) & (y + h >= row["min_y"]))
        for d in doc_id[m]:
            pairs.add((row["query_id"], d))
    return pairs


def result_pairs(res) -> set:
    t = res.to_pandas() if hasattr(res, "to_pandas") else res
    return set(zip(t["query_id"], t["doc_id"]))


def test_broadcast_join_matches_brute(ray_session, corpus, queries):
    import ray.data as rd
    docs = rd.from_arrow(corpus)
    res = box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=4, max_extent=(100.0, 100.0))
    assert result_pairs(res) == brute_pairs(corpus, queries)


def test_broadcast_join_ref2d_matches_reference_quadtree(ray_session, corpus, queries):
    import ray.data as rd
    docs = rd.from_arrow(corpus)
    res = box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=4, max_extent=(100.0, 100.0),
        predicate="ref2d")
    got = result_pairs(res)
    # oracle 1: brute force with the reference 2D predicate
    assert got == brute_pairs(corpus, queries, predicate="ref2d")
    # oracle 2: the reference quadtree simulator (search == index semantics)
    qt = refsim.StaticQuadTree2D(0, 0, 100_000, 100_000, max_depth=5)
    rects = np.stack([corpus["x"].to_numpy(), corpus["y"].to_numpy(),
                      corpus["x"].to_numpy() + corpus["w"].to_numpy(),
                      corpus["y"].to_numpy() + corpus["h"].to_numpy()], axis=1)
    ids = np.asarray(corpus["doc_id"].to_pylist())
    for i in range(N_DOCS):
        qt.insert(i, tuple(rects[i]))
    want = set()
    for row in queries.to_pylist():
        for hit in qt.search((row["min_x"], row["min_y"], row["max_x"], row["max_y"])):
            want.add((row["query_id"], ids[hit]))
    assert got == want


def test_shuffle_join_matches_broadcast(ray_session, corpus, queries):
    import ray.data as rd
    docs = rd.from_arrow(corpus)
    res = box_join.box_join_shuffle(
        docs, queries, world=WORLD_2D, depth=3, max_extent=(100.0, 100.0),
        num_partitions=4)
    assert result_pairs(res) == brute_pairs(corpus, queries)


def test_join_emits_each_pair_exactly_once(ray_session, corpus, queries):
    import ray.data as rd
    docs = rd.from_arrow(corpus)
    res = box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=4, max_extent=(100.0, 100.0))
    t = res.to_pandas()
    assert not t.duplicated(["query_id", "doc_id"]).any()


def test_join_passthrough_preserves_spans(ray_session):
    """Span-sequence invariant: payload columns flow through the join
    byte-identical and in order (input_hint invariant)."""
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(500), variant="flat2d", with_spans=True)
    docs = rd.from_arrow(corpus)
    queries = pa.table({
        "query_id": ["q-big"],
        "min_x": [0.0], "min_y": [0.0],
        "max_x": [60_000.0], "max_y": [60_000.0],
    })
    res = box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=3, max_extent=(100.0, 100.0),
        payload_cols=("doc_id", "spans"))
    out = res.to_arrow_refs()
    import ray
    tables = [ray.get(r) for r in out]
    got = pa.concat_tables([t for t in tables if t.num_rows], promote_options="default")
    want_by_doc = {d: s for d, s in zip(corpus["doc_id"].to_pylist(),
                                        corpus["spans"].to_pylist())}
    for row in got.to_pylist():
        assert row["spans"] == want_by_doc[row["doc_id"]]


def test_explode_cover_then_distinct_strategy(ray_session, corpus, queries):
    """J4/D6: duplicate-emitting cover explosion + distinct gives the same
    pair set (the old-quadtree strategy with the REPORT.md fix)."""
    import ray.data as rd
    from optimizing_ray.stages.assign import explode_cover_batch

    boxes = corpus.append_column("min_x", corpus["x"]) \
        .append_column("min_y", corpus["y"]) \
        .append_column("max_x", pa.array(corpus["x"].to_numpy() + corpus["w"].to_numpy())) \
        .append_column("max_y", pa.array(corpus["y"].to_numpy() + corpus["h"].to_numpy()))
    exploded = explode_cover_batch(boxes, 3, WORLD_2D)
    assert exploded.num_rows >= corpus.num_rows  # spanning rows duplicated
    # join each (query cover cell) x (doc cover cell) on equal key, residual, dedup
    docs = rd.from_arrow(exploded)
    qcov = box_join.explode_query_cover(queries, world=WORLD_2D, depth=3)
    joined = docs.select_columns(["doc_id", "x", "y", "w", "h", "cell_key"]).join(
        qcov, join_type="inner", num_partitions=4, on=("cell_key",))
    df = joined.to_pandas()
    keep = ((df.x <= df.max_x) & (df.x + df.w >= df.min_x)
            & (df.y <= df.max_y) & (df.y + df.h >= df.min_y))
    pairs = set(map(tuple, df.loc[keep, ["query_id", "doc_id"]].drop_duplicates().values))
    assert pairs == brute_pairs(corpus, queries)


def test_box_join_3d_matches_brute_and_octree_sim(ray_session):
    """3D octree-keyed join == brute force == the DynamicOctree simulator
    on the reference 3D workload (world 800x600x50, query boxes 50x10x50)."""
    import ray.data as rd
    from optimizing_ray import refsim
    from optimizing_ray.config import World

    world3 = World(0.0, 0.0, 0.0, 800.0, 600.0, 50.0, dims=3)
    t = synth.documents_batch(np.arange(4000), variant="uniform", with_spans=False)
    q = synth.queries_table(15, variant="uniform")
    res = box_join.box_join_broadcast_3d(
        rd.from_arrow(t), q, world=world3, depth=3,
        max_extent=(10.0, 10.0, 10.0)).to_pandas()
    got = set(zip(res["query_id"], res["doc_id"]))

    x, y, z = t["x"].to_numpy(), t["y"].to_numpy(), t["z"].to_numpy()
    w, h, d = t["w"].to_numpy(), t["h"].to_numpy(), t["d"].to_numpy()
    ids = np.asarray(t["doc_id"].to_pylist())
    want = set()
    for row in q.to_pylist():
        m = ((x <= row["max_x"]) & (x + w >= row["min_x"])
             & (y <= row["max_y"]) & (y + h >= row["min_y"])
             & (z <= row["max_z"]) & (z + d >= row["min_z"]))
        want.update((row["query_id"], doc) for doc in ids[m])
    assert got == want

    # octree-simulator parity on a subset of queries
    boxes = np.stack([x, y, z, x + w, y + h, z + d], axis=1)
    oc = refsim.DynamicOctree3D((0, 0, 0, 800, 600, 50), capacity=4, max_depth=5)
    for i in range(len(boxes)):
        oc.insert(i, tuple(boxes[i]))
    for row in q.to_pylist()[:5]:
        sim = {ids[i] for i in oc.search((row["min_x"], row["min_y"], row["min_z"],
                                          row["max_x"], row["max_y"], row["max_z"]))}
        eng = {doc for (qq, doc) in got if qq == row["query_id"]}
        assert eng == sim


def test_cells3_roundtrip():
    from optimizing_ray import cells
    rng = np.random.default_rng(31)
    for depth in (0, 2, 5, 10):
        n = 1 << depth
        ix = rng.integers(0, n, 40).astype(np.uint64)
        iy = rng.integers(0, n, 40).astype(np.uint64)
        iz = rng.integers(0, n, 40).astype(np.uint64)
        keys = cells.encode3(ix, iy, iz, depth)
        dd, rx, ry, rz = cells.decode3(keys)
        np.testing.assert_array_equal(dd, depth)
        np.testing.assert_array_equal(rx, ix)
        np.testing.assert_array_equal(ry, iy)
        np.testing.assert_array_equal(rz, iz)

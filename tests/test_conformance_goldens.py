"""Pinned conformance goldens: the reference tree rules on the F1c/F1a
fixture corpora must reproduce these EXACT node / occupancy / traversal /
hit counts (north-star: "matching ... quadtree insert/query/subdivision
unit tests and its node-traversal benchmark counts exactly"), and the
engine's tile cover + predicate must return the same hit sets.

The golden numbers were computed once from the simulators (whose search
results are themselves property-tested against brute force in
test_refsim.py) and frozen here: any semantic drift in the insert rule,
the strict/inclusive predicate family, the child order, or the corpus
generator breaks this file loudly.
"""

import numpy as np
import pytest

from optimizing_ray import refsim, synth

GOLD_FLAT2D_20K = {
    "n_nodes": 341,
    "items_per_depth": {0: 35, 1: 36, 2: 83, 3: 166, 4: 19680},
    "big_query": ((10_000.0, 10_000.0, 60_000.0, 50_000.0), 4065, 70),
    "view_query": ((0.0, 0.0, 800.0, 600.0), 0, 5),
}
GOLD_OCTREE_5K = {"n_nodes": 578, "n_items": 5000, "max_occupancy": 1131}


@pytest.fixture(scope="module")
def quadtree_20k():
    t = synth.documents_batch(np.arange(20_000), variant="flat2d", with_spans=False)
    x, y, w, h = (t[c].to_numpy() for c in ("x", "y", "w", "h"))
    qt = refsim.StaticQuadTree2D(0, 0, 100_000, 100_000, max_depth=5)
    for i in range(20_000):
        qt.insert(i, (x[i], y[i], x[i] + w[i], y[i] + h[i]))
    return qt, t


def test_insert_subdivision_counts_exact(quadtree_20k):
    qt, _ = quadtree_20k
    n_nodes, per_depth, _occ = qt.node_stats()
    assert n_nodes == GOLD_FLAT2D_20K["n_nodes"]
    assert dict(sorted(per_depth.items())) == GOLD_FLAT2D_20K["items_per_depth"]


@pytest.mark.parametrize("gold_key", ["big_query", "view_query"])
def test_traversal_and_hit_counts_exact(quadtree_20k, gold_key):
    qt, _ = quadtree_20k
    q, want_hits, want_visited = GOLD_FLAT2D_20K[gold_key]
    ids, visited = qt.search(q, count_traversals=True)
    assert len(ids) == want_hits
    assert visited == want_visited


def test_engine_join_reproduces_golden_hits(ray_session, quadtree_20k):
    """The distributed cell-cover join returns the exact golden hit set of
    the reference quadtree on the pinned query."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import box_join

    qt, t = quadtree_20k
    q, want_hits, _ = GOLD_FLAT2D_20K["big_query"]
    queries = pa.table({"query_id": ["g"], "min_x": [q[0]], "min_y": [q[1]],
                        "max_x": [q[2]], "max_y": [q[3]]})
    res = box_join.box_join_broadcast(
        rd.from_arrow(t), queries, world=WORLD_2D, depth=5,
        max_extent=(100.0, 100.0), predicate="ref2d").to_pandas()
    assert len(res) == want_hits
    ids = np.asarray(t["doc_id"].to_pylist())
    want_set = {ids[i] for i in qt.search(q)}
    assert set(res["doc_id"]) == want_set


def test_octree_occupancy_exact():
    t3 = synth.documents_batch(np.arange(5000), variant="uniform", with_spans=False)
    b = np.stack([t3["x"].to_numpy(), t3["y"].to_numpy(), t3["z"].to_numpy()], axis=1)
    s3 = np.stack([t3["w"].to_numpy(), t3["h"].to_numpy(), t3["d"].to_numpy()], axis=1)
    bb = np.concatenate([b, b + s3], axis=1)
    oc = refsim.DynamicOctree3D((0, 0, 0, 800, 600, 50), capacity=4, max_depth=5)
    for i in range(5000):
        oc.insert(i, tuple(bb[i]))
    n_nodes, n_items, max_occ = oc.node_stats()
    assert (n_nodes, n_items, max_occ) == (
        GOLD_OCTREE_5K["n_nodes"], GOLD_OCTREE_5K["n_items"],
        GOLD_OCTREE_5K["max_occupancy"])

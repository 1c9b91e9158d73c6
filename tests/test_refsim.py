"""Conformance of the reference-rule simulators: index search == brute scan
(the reference's own Tab-toggle oracle, .Test/cacheQuadTree.cpp:425-441)."""

import numpy as np
import pytest

from optimizing_ray import refsim, synth
from optimizing_ray.config import WORLD_2D, WORLD_3D


@pytest.fixture(scope="module")
def flat_corpus():
    t = synth.documents_batch(np.arange(3000), variant="flat2d", with_spans=False)
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    w, h = t["w"].to_numpy(), t["h"].to_numpy()
    return np.stack([x, y, x + w, y + h], axis=1)


def test_static_quadtree_search_equals_brute(flat_corpus):
    qt = refsim.StaticQuadTree2D(0, 0, 100_000, 100_000, max_depth=5)
    for i, r in enumerate(flat_corpus):
        qt.insert(i, tuple(r))
    assert qt.n_items == len(flat_corpus)
    qtab = synth.queries_table(20, variant="flat2d")
    for row in qtab.to_pylist():
        q = (row["min_x"], row["min_y"], row["max_x"], row["max_y"])
        got = sorted(qt.search(q))
        want = sorted(refsim.brute_search2(q, flat_corpus).tolist())
        assert got == want


def test_static_quadtree_depth_bound(flat_corpus):
    qt = refsim.StaticQuadTree2D(0, 0, 100_000, 100_000, max_depth=5)
    for i, r in enumerate(flat_corpus):
        qt.insert(i, tuple(r))
    n_nodes, per_depth, occ = qt.node_stats()
    assert max(per_depth) <= 4  # _depth+1 < MAX_DEPTH=5 => deepest node depth 4
    assert sum(per_depth.values()) == len(flat_corpus)


def test_dynamic_octree_search_equals_brute():
    t = synth.documents_batch(np.arange(2000), variant="uniform", with_spans=False)
    boxes = np.stack([t["x"].to_numpy(), t["y"].to_numpy(), t["z"].to_numpy()], axis=1)
    sizes = np.stack([t["w"].to_numpy(), t["h"].to_numpy(), t["d"].to_numpy()], axis=1)
    b = np.concatenate([boxes, boxes + sizes], axis=1)
    # world here is the raw reference 3D box 800x50x600 (main.cpp:16-19)
    oc = refsim.DynamicOctree3D((0, 0, 0, 800, 600, 50), capacity=4, max_depth=5)
    for i in range(len(b)):
        oc.insert(i, tuple(b[i]))
    n_nodes, n_items, max_occ = oc.node_stats()
    assert n_items == len(b)
    qtab = synth.queries_table(15, variant="uniform")
    for row in qtab.to_pylist():
        q = (row["min_x"], row["min_y"], row["min_z"],
             row["max_x"], row["max_y"], row["max_z"])
        got = sorted(oc.search(q))
        want = sorted(refsim.brute_search3(q, b).tolist())
        assert got == want


def test_dynamic_octree_capacity_rule():
    """Items park at the root until capacity is reached; the 5th small item
    descends (DynamicOctree.hpp:130: break while size < capacity)."""
    oc = refsim.DynamicOctree3D((0, 0, 0, 8, 8, 8), capacity=4, max_depth=5)
    small = (0.1, 0.1, 0.1, 0.2, 0.2, 0.2)  # fits in SWD child
    for i in range(4):
        oc.insert(i, small)
    assert len(oc.root.items) == 4
    oc.insert(4, small)
    assert len(oc.root.items) == 4
    assert oc.root.children[0] is not None
    assert len(oc.root.children[0].items) == 1
    # a spanning item parks at the root even when full
    oc.insert(5, (3.9, 3.9, 3.9, 4.1, 4.1, 4.1))
    assert len(oc.root.items) == 5

"""Actor-held per-cell index service: load once, query many (frame-loop
semantics), LRU unload."""

import numpy as np
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.stages.assign import assign_tiles
from optimizing_ray.state.serving import SpatialIndexService

DEPTH = 4


@pytest.fixture(scope="module")
def service(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(5000), variant="flat2d", with_spans=False)
    docs = assign_tiles(rd.from_arrow(t), DEPTH, WORLD_2D)
    svc = SpatialIndexService(WORLD_2D, DEPTH, n_actors=3,
                              max_extent=(100.0, 100.0))
    n = svc.load(docs)
    assert n == 5000
    yield svc, t
    svc.shutdown()


def brute(t, queries):
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    w, h = t["w"].to_numpy(), t["h"].to_numpy()
    ids = np.asarray(t["doc_id"].to_pylist())
    pairs = set()
    for row in queries.to_pylist():
        m = ((x <= row["max_x"]) & (x + w >= row["min_x"])
             & (y <= row["max_y"]) & (y + h >= row["min_y"]))
        pairs.update((row["query_id"], d) for d in ids[m])
    return pairs


def test_query_matches_brute_repeatedly(service):
    svc, t = service
    for seed in (1000, 2000):  # many "frames" against the same loaded index
        queries = synth.queries_table(15, variant="flat2d", seed=seed)
        res = svc.query_boxes(queries).to_pandas()
        assert set(zip(res["query_id"], res["doc_id"])) == brute(t, queries)


def test_stats_and_sharding(service):
    svc, t = service
    st = svc.stats()
    assert len(st) == 3
    assert sum(s["n_rows"] for s in st) == 5000
    assert all(s["n_cells"] > 0 for s in st)


def test_load_ships_each_row_once(service):
    """The routed load's object-store traffic is proportional to the
    corpus (one hop per row), NOT n_actors x corpus."""
    svc, t = service
    assert svc.load_metrics["rows_shipped"] == 5000
    assert svc.load_metrics["rows_loaded"] == 5000


def test_reload_is_idempotent(ray_session):
    """Replaying the same blocks after a partial failure must not
    duplicate rows (load_data idempotency, WorldPartition.hpp:80-82)."""
    import ray.data as rd
    t = synth.documents_batch(np.arange(800), variant="flat2d", with_spans=False)
    docs = assign_tiles(rd.from_arrow(t), DEPTH, WORLD_2D)
    svc = SpatialIndexService(WORLD_2D, DEPTH, n_actors=2)
    assert svc.load(docs) == 800
    assert svc.load(docs) == 0  # full replay: nothing new
    st = svc.stats()
    assert sum(s["n_rows"] for s in st) == 800
    svc.shutdown()


def test_unload_drops_cells(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(1000), variant="flat2d", with_spans=False)
    docs = assign_tiles(rd.from_arrow(t), DEPTH, WORLD_2D)
    svc = SpatialIndexService(WORLD_2D, DEPTH, n_actors=2)
    svc.load(docs)
    keys = np.unique(docs.to_pandas()["cell_key"].to_numpy())
    dropped = svc.unload(keys[: len(keys) // 2])
    assert dropped == len(keys) // 2
    st = svc.stats()
    assert sum(s["n_cells"] for s in st) == len(keys) - dropped
    svc.shutdown()


def test_lru_cap(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(2000), variant="flat2d", with_spans=False)
    docs = assign_tiles(rd.from_arrow(t), DEPTH, WORLD_2D)
    svc = SpatialIndexService(WORLD_2D, DEPTH, n_actors=2, max_cells_per_actor=5)
    svc.load(docs)
    st = svc.stats()
    assert all(s["n_cells"] <= 5 for s in st)
    svc.shutdown()


def test_search_cache_frame_reuse(service):
    """T4 search cache (cacheQuadTree.cpp:78-81,392-406): identical or
    sub-tolerance-moved frames reuse the previous results without
    re-searching; a bigger move or a data change re-searches.

    NOTE: mutates the shared module fixture (loads 50 extra docs) — keep
    this the LAST test in the module."""
    import pyarrow.compute as pc

    svc, t = service
    queries = synth.queries_table(10, variant="flat2d", seed=77)
    exact = svc.query_boxes(queries).to_pandas()
    r1 = svc.query_boxes(queries, cache_tolerance=1.0).to_pandas()
    r2 = svc.query_boxes(queries, cache_tolerance=1.0).to_pandas()  # hit
    # sub-tolerance nudge: STALE reuse by design (reference semantics)
    nudged = queries.set_column(
        queries.schema.get_field_index("min_x"), "min_x",
        pc.add(queries["min_x"], 0.5))
    r3 = svc.query_boxes(nudged, cache_tolerance=1.0).to_pandas()
    key = lambda d: sorted(zip(d["query_id"], d["doc_id"]))
    assert key(r1) == key(exact) == key(r2) == key(r3)
    # r2 and r3 were served from the DRIVER-level cache (zero RPC)
    assert svc.cache_hits >= 2 and svc.cache_misses >= 1

    # over-tolerance move -> fresh search, results match brute force
    moved = queries.set_column(
        queries.schema.get_field_index("min_x"), "min_x",
        pc.add(queries["min_x"], 500.0))
    moved = moved.set_column(
        moved.schema.get_field_index("max_x"), "max_x",
        pc.add(moved["max_x"], 500.0))
    r4 = svc.query_boxes(moved, cache_tolerance=1.0).to_pandas()
    assert set(zip(r4["query_id"], r4["doc_id"])) == brute(t, moved)

    # data change invalidates even an identical repeat
    import ray.data as rd
    extra = synth.documents_batch(np.arange(5000, 5050), variant="flat2d",
                                  with_spans=False)
    svc.load(assign_tiles(rd.from_arrow(extra), DEPTH, WORLD_2D))
    r5 = svc.query_boxes(moved, cache_tolerance=1.0).to_pandas()
    import pyarrow as pa
    both = pa.concat_tables([t, extra])
    assert set(zip(r5["query_id"], r5["doc_id"])) == brute(both, moved)

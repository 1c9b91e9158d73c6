"""A3 -> J1 integration: join over an adaptively keyed (mixed-depth)
corpus, and the semi-join-then-gather payload pattern."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_3D
from optimizing_ray.pipelines import box_join
from optimizing_ray.stages import adaptive


@pytest.fixture(scope="module")
def adaptive_corpus(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(6000), variant="skewed", with_spans=False)
    keyed, plan = adaptive.adaptive_assign(
        rd.from_arrow(t), WORLD_3D, capacity=50, coarse_depth=2, max_depth=6)
    return t, keyed.materialize(), plan


def test_adaptive_join_matches_brute(adaptive_corpus):
    t, keyed, plan = adaptive_corpus
    # queries over the hot region AND the sparse background
    qi = np.arange(12, dtype=np.int64)
    cx = 100.0 + synth.u01(qi, 71) * 600.0
    cy = 75.0 + synth.u01(qi, 72) * 450.0
    qs = 30.0 + synth.u01(qi, 73) * 120.0
    queries = pa.table({
        "query_id": pa.array([f"aq-{i}" for i in qi]),
        "min_x": pa.array(cx - qs), "min_y": pa.array(cy - qs),
        "max_x": pa.array(cx + qs), "max_y": pa.array(cy + qs),
    })
    res = box_join.box_join_adaptive(
        keyed, queries, world=WORLD_3D, plan=plan,
        max_extent=(10.0, 10.0)).to_pandas()
    got = set(zip(res["query_id"], res["doc_id"]))
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    w, h = t["w"].to_numpy(), t["h"].to_numpy()
    ids = np.asarray(t["doc_id"].to_pylist())
    want = set()
    for row in queries.to_pylist():
        m = ((x <= row["max_x"]) & (x + w >= row["min_x"])
             & (y <= row["max_y"]) & (y + h >= row["min_y"]))
        want.update((row["query_id"], d) for d in ids[m])
    assert got == want
    assert len(want) > 0


def test_gather_payload_reattaches_spans(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(1500), variant="flat2d", with_spans=True)
    from optimizing_ray.config import WORLD_2D
    docs = rd.from_arrow(t)
    queries = pa.table({"query_id": ["g"], "min_x": [0.0], "min_y": [0.0],
                        "max_x": [50_000.0], "max_y": [50_000.0]})
    slim = box_join.box_join_broadcast(
        docs, queries, world=WORLD_2D, depth=3, max_extent=(100.0, 100.0),
        payload_cols=("doc_id",))
    full = box_join.gather_payload(slim, docs, payload_cols=("spans",),
                                   num_buckets=4).to_pandas()
    want_by_doc = dict(zip(t["doc_id"].to_pylist(), t["spans"].to_pylist()))
    assert len(full) > 0
    for _, row in full.iterrows():
        spans = row["spans"]
        spans = spans.tolist() if hasattr(spans, "tolist") else spans
        want = want_by_doc[row["doc_id"]]
        assert [tuple(sorted(s.items())) for s in spans] == \
            [tuple(sorted(s.items())) for s in want]

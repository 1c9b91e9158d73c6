"""Property-based tests (hypothesis) for the core algebra and join
semantics — the SURVEY §5 property plan."""

import numpy as np
from hypothesis import given, settings, strategies as st

from optimizing_ray import cells, geom, refsim
from optimizing_ray.config import WORLD_2D


@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_morton2_roundtrip_prop(x, y):
    rx, ry = cells.demorton2(cells.morton2(np.uint64(x), np.uint64(y)))
    assert int(rx) == x and int(ry) == y


@given(st.integers(0, 2**20 - 1), st.integers(0, 2**20 - 1),
       st.integers(0, 2**20 - 1))
@settings(max_examples=100, deadline=None)
def test_morton3_roundtrip_prop(x, y, z):
    rx, ry, rz = cells.demorton3(cells.morton3(np.uint64(x), np.uint64(y), np.uint64(z)))
    assert (int(rx), int(ry), int(rz)) == (x, y, z)


@given(st.integers(1, 8),
       st.floats(0, 99_000), st.floats(0, 99_000),
       st.floats(1, 30_000), st.floats(1, 30_000))
@settings(max_examples=100, deadline=None)
def test_cover2_contains_point_cells_prop(depth, mnx, mny, w, h):
    """Any point inside the box quantizes to a cell inside the box cover."""
    mxx, mxy = min(100_000.0, mnx + w), min(100_000.0, mny + h)
    cover = set(cells.cover2(mnx, mny, mxx, mxy, WORLD_2D, depth).tolist())
    for fx, fy in ((0.0, 0.0), (0.5, 0.5), (1.0, 1.0), (0.25, 0.9)):
        px, py = mnx + fx * (mxx - mnx), mny + fy * (mxy - mny)
        k = int(cells.point_cell2(np.asarray([px]), np.asarray([py]), WORLD_2D, depth)[0])
        assert k in cover


@given(st.lists(st.tuples(st.floats(0, 99_000), st.floats(0, 99_000),
                          st.floats(0.1, 900), st.floats(0.1, 900)),
                min_size=1, max_size=60),
       st.tuples(st.floats(0, 90_000), st.floats(0, 90_000),
                 st.floats(10, 40_000), st.floats(10, 40_000)))
@settings(max_examples=40, deadline=None)
def test_quadtree_search_equals_brute_prop(items, qdef):
    """index search == linear scan for arbitrary corpora and queries
    (the reference's Tab-toggle oracle as a property)."""
    qt = refsim.StaticQuadTree2D(0, 0, 100_000, 100_000, max_depth=5)
    rects = np.asarray([(x, y, x + w, y + h) for x, y, w, h in items])
    for i, r in enumerate(rects):
        qt.insert(i, tuple(r))
    q = (qdef[0], qdef[1], qdef[0] + qdef[2], qdef[1] + qdef[3])
    got = sorted(qt.search(q))
    want = sorted(refsim.brute_search2(q, rects).tolist())
    assert got == want


@given(st.floats(-100, 100), st.floats(-100, 100), st.floats(0, 50),
       st.floats(0, 50), st.floats(-100, 100), st.floats(-100, 100),
       st.floats(0, 50), st.floats(0, 50))
@settings(max_examples=200, deadline=None)
def test_overlaps3_symmetric_prop(ax, ay, aw, ah, bx, by, bw, bh):
    """The 3D inclusive overlap is symmetric (the 2D reference one is NOT,
    by design — .Test/QuadTree.cpp:56-68)."""
    a = geom.overlaps3(ax, ay, 0, ax + aw, ay + ah, 1,
                       bx, by, 0, bx + bw, by + bh, 1)
    b = geom.overlaps3(bx, by, 0, bx + bw, by + bh, 1,
                       ax, ay, 0, ax + aw, ay + ah, 1)
    assert bool(a) == bool(b)


import pytest as _pytest


@_pytest.mark.parametrize("slim_ids,doc_ids", [
    ([1, 2, 2, 3, 7, 7, 7], [1, 2, 3, 4]),     # dups on the slim side
    ([], [1, 2, 3]),                            # empty slim
    ([5, 6, 7], [1, 2, 3]),                     # no overlap
])
def test_gather_payload_matches_pandas_merge(ray_session, slim_ids, doc_ids):
    """The custom bucket-merge gather == an inner pandas merge."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.box_join import gather_payload

    slim = pa.table({"doc_id": pa.array([f"d{i}" for i in slim_ids], pa.string()),
                     "tag": pa.array(list(range(len(slim_ids))), pa.int64())})
    docs = pa.table({"doc_id": pa.array([f"d{i}" for i in doc_ids], pa.string()),
                     "payload": pa.array([i * 7 for i in doc_ids], pa.int64())})
    out = gather_payload(rd.from_arrow(slim), rd.from_arrow(docs),
                         payload_cols=("payload",), num_buckets=4).to_pandas()
    want = (slim.to_pandas().merge(docs.to_pandas(), on="doc_id", how="inner")
            .sort_values(["doc_id", "tag"]).reset_index(drop=True))
    assert len(out) == len(want)
    if len(want):
        got = out.sort_values(["doc_id", "tag"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["doc_id", "tag", "payload"]],
                                      want[["doc_id", "tag", "payload"]])


@given(st.lists(st.integers(0, 2**28 - 1), min_size=1, max_size=40,
                unique=True))
@settings(max_examples=60, deadline=None)
def test_driver_span_derivation_prop(doc_ids):
    """Span derivation + fingerprint hold over the whole documented
    doc_id domain (< 2^28, the s = doc_id*16 + ordinal int64-overflow
    bound): structural invariants plus fingerprint == slow reference."""
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    t = dt.derive_spans_batch(
        pa.table({"doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64))}))
    rows = t["spans"].to_pylist()
    M64 = 1 << 64
    for did, r in zip(doc_ids, rows):
        assert 1 <= len(r) <= 8
        offs = [s["offset"] for s in r]
        assert offs[0] == 0 and offs == sorted(set(offs))
        for j, s in enumerate(r):
            if s["kind"] == "text":
                assert s["media_ref"] == "" and " " in s["text"]
            else:
                assert s["text"] == ""
                assert s["media_ref"] == f"media://doc-{did:012d}/{j}"

    def ref_fp(span_list):
        fp = 0
        for sp in span_list:
            h = 0
            for b in (sp["kind"] + "\x1f" + sp["text"] + "\x1f"
                      + sp["media_ref"]).encode():
                h = (h * 1000003 + b) % M64
            h = (h * 1000003 + sp["offset"]) % M64
            fp = (fp * 1099511628211 + h) % M64
        return fp - M64 if fp >= 1 << 63 else fp

    got = dt.span_fingerprint_batch(t)["span_fp"].to_numpy()
    assert np.array_equal(got, np.array([ref_fp(r) for r in rows],
                                        dtype=np.int64))


@given(st.floats(-200_000, 300_000), st.floats(-200_000, 300_000),
       st.floats(100.0, 10_000.0))
@settings(max_examples=200, deadline=None)
def test_hex_axial_nearest_center_prop(x, y, size):
    """Cube rounding = nearest hex center for ANY point and size (ties
    within float tolerance allowed either way)."""
    q, r = cells.hex_axial(np.asarray([x]), np.asarray([y]), size)
    cx, cy = cells.hex_center(q, r, size)
    d0 = (x - cx[0]) ** 2 + (y - cy[0]) ** 2
    nq, nr = cells.hex_neighbors(q, r)
    nx, ny = cells.hex_center(nq, nr, size)
    dn = ((x - nx) ** 2 + (y - ny) ** 2).min()
    assert d0 <= dn + 1e-6 * size * size


@given(st.floats(0, 99_999), st.floats(0, 99_999),
       st.floats(0, 99_999), st.floats(0, 99_999),
       st.integers(2, 6))
@settings(max_examples=150, deadline=None)
def test_segment_cover_samples_prop(x0, y0, x1, y1, depth):
    """Dense sampling along any segment never visits a cell outside the
    emitted cover."""
    import pyarrow as pa
    from optimizing_ray.stages import assign

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "x": pa.array([x0]), "y": pa.array([y0]),
                  "x1": pa.array([x1]), "y1": pa.array([y1])})
    out = assign.segment_cover_batch(t, depth, WORLD_2D)
    got = set(zip(out["cell_ix"].to_numpy(), out["cell_iy"].to_numpy()))
    g = 1 << depth
    cw = 100_000.0 / g
    ts = np.linspace(0, 1, 800)
    sx = x0 + (x1 - x0) * ts
    sy = y0 + (y1 - y0) * ts
    ix = np.clip((sx / cw).astype(np.int64), 0, g - 1)
    iy = np.clip((sy / cw).astype(np.int64), 0, g - 1)
    assert set(zip(ix.tolist(), iy.tolist())) <= got


@given(st.integers(0, 2**28 - 1))
@settings(max_examples=200, deadline=None)
def test_geohash_matches_morton_bits_prop(doc_id):
    """geohash bits == the quantized (ix, iy) interleave for any doc
    position derived over the full doc_id domain."""
    from optimizing_ray.sources.driver_tables import derive_geometry_batch
    import pyarrow as pa

    t = derive_geometry_batch(pa.table({"doc_id": pa.array([doc_id], pa.int64())}))
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    g = cells.geohash(x, y, WORLD_2D, 8)[0]
    n = 1 << 20
    ix = int(np.clip(int((x[0] - 0.0) / 100_000.0 * n), 0, n - 1))
    iy = int(np.clip(int((y[0] - 0.0) / 100_000.0 * n), 0, n - 1))
    code = 0
    for b in range(19, -1, -1):
        code = (code << 1) | ((ix >> b) & 1)
        code = (code << 1) | ((iy >> b) & 1)
    want = "".join(cells.GEOHASH_ALPHABET[(code >> (40 - 5 * (k + 1))) & 31]
                   for k in range(8))
    assert g == want


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                max_size=40),
       st.integers(0, 24))
@settings(max_examples=80, deadline=None)
def test_union_find_reps_are_component_minima_prop(edges, n_items):
    """connected_components returns, for every touched node, the MINIMUM
    member of its connected component (checked against a BFS closure)."""
    import pandas as pd

    from optimizing_ray.pipelines.dedup import connected_components

    pdf = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    rep = connected_components(pdf)
    # BFS reference
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for start in adj:
        seen = {start}
        stack = [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        assert rep[start] == min(seen)


@given(st.lists(st.lists(st.integers(-600, 600), min_size=4, max_size=4),
                min_size=2, max_size=24, unique_by=tuple))
@settings(max_examples=80, deadline=None)
def test_integer_cosine_predicate_equals_float_prop(vecs):
    """The cross-multiplied integer gate den^2*dot^2 >= num^2*n2a*n2b
    (dot > 0) agrees with float cosine >= 0.9 whenever the float cosine
    is not razor-close to the boundary (the predicate IS the exact
    arithmetic; floats are the approximation)."""
    Q = np.asarray(vecs, dtype=np.int64)
    n2 = (Q * Q).sum(axis=1)
    for i in range(len(Q)):
        for j in range(i + 1, len(Q)):
            if n2[i] == 0 or n2[j] == 0:
                continue
            dot = int(Q[i] @ Q[j])
            exact = dot > 0 and 100 * dot * dot >= 81 * int(n2[i]) * int(n2[j])
            fc = dot / np.sqrt(float(n2[i]) * float(n2[j]))
            if abs(fc - 0.9) > 1e-9:
                assert exact == (fc >= 0.9)

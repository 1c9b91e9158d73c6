"""Point-in-polygon join vs brute-force kernels; box-degenerate parity."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import pip


def test_pip_kernels_agree_on_convex(rng):
    t = synth.polygons_table(8)
    px = rng.uniform(0, 100_000, 5000)
    py = rng.uniform(0, 100_000, 5000)
    for row, i in zip(t.to_pylist(), range(8)):
        vx = np.asarray([v["x"] for v in row["ring"]])
        vy = np.asarray([v["y"] for v in row["ring"]])
        a = pip.pip_ray_cast(px, py, vx, vy)
        b = pip.pip_convex(px, py, vx, vy)
        # agreement except possibly exact-boundary points (measure zero)
        assert (a == b).mean() > 0.999


def test_pip_axis_aligned_square_matches_box():
    vx = np.asarray([10.0, 20.0, 20.0, 10.0])
    vy = np.asarray([10.0, 10.0, 20.0, 20.0])
    px = np.asarray([15.0, 5.0, 10.5, 19.99, 25.0])
    py = np.asarray([15.0, 15.0, 10.5, 19.99, 15.0])
    want = (px >= 10) & (px <= 20) & (py >= 10) & (py <= 20)
    got = pip.pip_convex(px, py, vx, vy)
    np.testing.assert_array_equal(got, want)


def test_pip_join_matches_brute(ray_session):
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(4000), variant="flat2d", with_spans=False)
    polys = synth.polygons_table(10)
    docs = rd.from_arrow(corpus)
    res = pip.pip_join_broadcast(docs, polys, world=WORLD_2D, depth=4).to_pandas()
    got = set(zip(res["poly_id"], res["doc_id"]))
    x, y = corpus["x"].to_numpy(), corpus["y"].to_numpy()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    want = set()
    for row in polys.to_pylist():
        vx = np.asarray([v["x"] for v in row["ring"]])
        vy = np.asarray([v["y"] for v in row["ring"]])
        m = pip.pip_ray_cast(x, y, vx, vy)
        for d in ids[m]:
            want.add((row["poly_id"], d))
    assert got == want
    assert len(got) > 0  # fixture actually exercises hits


def test_pip_join_convex_kernel(ray_session):
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(2000), variant="flat2d", with_spans=False)
    polys = synth.polygons_table(6)
    docs = rd.from_arrow(corpus)
    a = pip.pip_join_broadcast(docs, polys, world=WORLD_2D, depth=4,
                               kernel="convex").to_pandas()
    b = pip.pip_join_broadcast(docs, polys, world=WORLD_2D, depth=4,
                               kernel="ray_cast").to_pandas()
    assert set(zip(a["poly_id"], a["doc_id"])) == set(zip(b["poly_id"], b["doc_id"]))


def test_pip_shuffle_matches_broadcast(ray_session):
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(3000), variant="flat2d", with_spans=False)
    polys = synth.polygons_table(8)
    docs = rd.from_arrow(corpus)
    a = pip.pip_join_broadcast(docs, polys, world=WORLD_2D, depth=4).to_pandas()
    b = pip.pip_join_shuffle(rd.from_arrow(corpus), polys, world=WORLD_2D,
                             depth=4, n_shards=8).to_pandas()
    assert set(zip(a["poly_id"], a["doc_id"])) == set(zip(b["poly_id"], b["doc_id"]))
    assert len(b) == len(b.drop_duplicates())


def test_zonal_stats_square_zones(ray_session):
    """Hand-checkable axis-aligned square zones: counts, exact integer
    sums, and the shared-division mean; empty zones absent."""
    import ray.data as rd

    def square(pid, x0, y0, s):
        return {"poly_id": pid,
                "ring": [{"x": x0, "y": y0}, {"x": x0 + s, "y": y0},
                         {"x": x0 + s, "y": y0 + s}, {"x": x0, "y": y0 + s}]}

    polys = pa.Table.from_pylist(
        [square("A", 0.0, 0.0, 100.0), square("B", 1000.0, 1000.0, 50.0),
         square("EMPTY", 90_000.0, 90_000.0, 1.0)])
    docs = pa.table({
        "doc_id": pa.array(np.arange(6)),
        "x": pa.array([10.0, 20.0, 99.0, 1010.0, 1049.0, 5000.0]),
        "y": pa.array([10.0, 20.0, 99.0, 1010.0, 1049.0, 5000.0]),
        "val": pa.array(np.array([7, 11, 13, 100, 200, 999], dtype=np.int64)),
    })
    out = pip.zonal_stats(rd.from_arrow(docs), polys, world=WORLD_2D,
                          depth=4, kernel="convex", value_col="val")
    df = out.to_pandas().set_index("poly_id")
    assert set(df.index) == {"A", "B"}  # EMPTY zone absent
    assert df.loc["A", "n_docs"] == 3 and df.loc["A", "sum_val"] == 31
    assert df.loc["B", "n_docs"] == 2 and df.loc["B", "sum_val"] == 300
    assert df.loc["A", "mean_val"] == np.floor((31 / 3) * 1e6 + 0.5) / 1e6
    assert df.loc["B", "mean_val"] == 150.0


def test_pip_anti_join_is_complement(ray_session):
    """anti(docs) union hit-doc-ids == all docs; intersection == empty."""
    import numpy as np
    import ray.data as rd
    from optimizing_ray import synth
    from optimizing_ray.pipelines import pip as pipmod

    corpus = synth.documents_batch(np.arange(2000), variant="flat2d", with_spans=False)
    polys = synth.polygons_table(8, world=WORLD_2D)
    ds = rd.from_arrow(corpus.select(["doc_id", "x", "y"]))
    hits = set(pipmod.pip_join_broadcast(ds, polys, world=WORLD_2D, depth=4,
                                         kernel="convex")
               .to_pandas()["doc_id"])
    anti = set(pipmod.pip_anti_join(ds, polys, kernel="convex")
               .to_pandas()["doc_id"])
    allids = set(corpus["doc_id"].to_pylist())
    assert hits | anti == allids
    assert hits & anti == set()


def test_nearest_zone_matches_brute(ray_session):
    import numpy as np
    import ray.data as rd
    from optimizing_ray import synth
    from optimizing_ray.pipelines import pip as pipmod

    corpus = synth.documents_batch(np.arange(1000), variant="flat2d", with_spans=False)
    polys = synth.polygons_table(8, world=WORLD_2D)
    ds = rd.from_arrow(corpus.select(["doc_id", "x", "y"]))
    got = (pipmod.nearest_zone(ds, polys).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pids, cx, cy = pipmod.zone_centroids(polys)
    x = corpus["x"].to_numpy()
    y = corpus["y"].to_numpy()
    d2 = (x[:, None] - cx) ** 2 + (y[:, None] - cy) ** 2
    win = np.argmin(d2, axis=1)
    assert list(got["poly_id"]) == list(pids[win])
    np.testing.assert_allclose(
        got["dist"].to_numpy(),
        np.floor(np.sqrt(d2[np.arange(len(x)), win]) * 1e6 + 0.5) / 1e6,
        rtol=0, atol=0)

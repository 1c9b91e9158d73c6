"""Polygon-polygon SAT join: scalar re-implementation + geometric checks."""

import numpy as np
import pyarrow as pa

from optimizing_ray.config import WORLD_2D
from optimizing_ray import synth
from optimizing_ray.pipelines import poly_join
from optimizing_ray.pipelines.pip import compile_polygons
from optimizing_ray.sources.driver_tables import PENT_UX, PENT_UY


def test_unit_pentagon_is_convex_ccw():
    ux, uy = np.asarray(PENT_UX), np.asarray(PENT_UY)
    for i in range(5):
        j, k = (i + 1) % 5, (i + 2) % 5
        cross = ((ux[j] - ux[i]) * (uy[k] - uy[j])
                 - (uy[j] - uy[i]) * (ux[k] - ux[j]))
        assert cross > 0  # strictly convex, CCW


def _sat_scalar(vx, vy, zx, zy):
    """Independent scalar SAT (python loops) for one pentagon/zone pair."""
    def axes(xs, ys):
        n = len(xs)
        return [(-(ys[(i + 1) % n] - ys[i]), xs[(i + 1) % n] - xs[i])
                for i in range(n)]
    for nx, ny in axes(zx, zy) + axes(vx, vy):
        pa_ = [nx * a + ny * b for a, b in zip(vx, vy)]
        pz = [nx * a + ny * b for a, b in zip(zx, zy)]
        if max(pa_) < min(pz) or max(pz) < min(pa_):
            return False
    return True


def test_sat_join_matches_scalar(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 400
    zones = synth.polygons_table(8, world=WORLD_2D)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(rng.uniform(0, 100_000, n)),
                  "y": pa.array(rng.uniform(0, 100_000, n)),
                  "sx": pa.array(rng.uniform(300, 9_000, n)),
                  "sy": pa.array(rng.uniform(300, 9_000, n))})
    got = set(map(tuple, poly_join.poly_overlap_join(
        rd.from_arrow(t), zones).to_pandas().values))
    ux, uy = np.asarray(PENT_UX), np.asarray(PENT_UY)
    want = set()
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    sx, sy = t["sx"].to_numpy(), t["sy"].to_numpy()
    for pid, zx, zy in compile_polygons(zones):
        for d in range(n):
            vx = (x[d] + sx[d] * ux).tolist()
            vy = (y[d] + sy[d] * uy).tolist()
            if _sat_scalar(vx, vy, zx.tolist(), zy.tolist()):
                want.add((pid, d))
    assert got == want
    assert len(want) > 20  # the fixture actually exercises the predicate


def test_sat_join_containment_is_hit(ray_session):
    """A pentagon entirely inside a zone must be reported (intersection
    includes containment)."""
    import ray.data as rd

    zones = synth.polygons_table(8, world=WORLD_2D)
    pid, zx, zy = compile_polygons(zones)[0]
    cx, cy = float(zx.mean()), float(zy.mean())
    t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                  "x": pa.array([cx]), "y": pa.array([cy]),
                  "sx": pa.array([1.0]), "sy": pa.array([1.0])})
    got = poly_join.poly_overlap_join(rd.from_arrow(t), zones).to_pandas()
    assert (pid, 7) in set(map(tuple, got.values))


def test_polygon_stats_area_and_centroid(ray_session):
    """Shoelace math: area2 of the affinely scaled pentagon equals
    sx*sy*unit_area2 (mathematical identity, checked at tolerance);
    the centroid lies strictly inside the convex pentagon; integer
    outputs replicate a fixed-order pure-Python float replay exactly."""
    import math

    import ray.data as rd

    from optimizing_ray.pipelines.poly_join import polygon_stats
    from optimizing_ray.sources.driver_tables import (
        PENT_UX, PENT_UY, derive_doc_polygons_batch)

    rng = np.random.default_rng(11)
    n = 64
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(rng.uniform(0, 100_000, n)),
                  "y": pa.array(rng.uniform(0, 100_000, n))})
    t = derive_doc_polygons_batch(t)
    got = (polygon_stats(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    ua2 = sum(PENT_UX[j] * PENT_UY[(j + 1) % 5]
              - PENT_UX[(j + 1) % 5] * PENT_UY[j] for j in range(5))
    assert ua2 > 0  # unit pentagon is CCW
    sx = t["sx"].to_numpy()
    sy = t["sy"].to_numpy()
    x = t["x"].to_numpy()
    y = t["y"].to_numpy()
    np.testing.assert_allclose(got["area2_micro"].to_numpy() / 1e6,
                               sx * sy * ua2, rtol=1e-9)

    # pure-Python fixed-order replay must match the integers exactly
    for i in (0, 7, 63):
        vx = [x[i] + sx[i] * u for u in PENT_UX]
        vy = [y[i] + sy[i] * u for u in PENT_UY]
        cr = [vx[j] * vy[(j + 1) % 5] - vx[(j + 1) % 5] * vy[j]
              for j in range(5)]
        a2 = ((((cr[0] + cr[1]) + cr[2]) + cr[3]) + cr[4])
        tx = [(vx[j] + vx[(j + 1) % 5]) * cr[j] for j in range(5)]
        ty = [(vy[j] + vy[(j + 1) % 5]) * cr[j] for j in range(5)]
        nx = ((((tx[0] + tx[1]) + tx[2]) + tx[3]) + tx[4])
        ny = ((((ty[0] + ty[1]) + ty[2]) + ty[3]) + ty[4])
        assert got["area2_micro"][i] == math.floor(a2 * 1e6 + 0.5)
        assert got["cx_micro"][i] == math.floor(nx / (3.0 * a2) * 1e6 + 0.5)
        assert got["cy_micro"][i] == math.floor(ny / (3.0 * a2) * 1e6 + 0.5)
        # centroid strictly inside the convex polygon: on the inner
        # side of every CCW edge
        cx, cy = nx / (3.0 * a2), ny / (3.0 * a2)
        for j in range(5):
            jx, jy = vx[j], vy[j]
            kx, ky = vx[(j + 1) % 5], vy[(j + 1) % 5]
            assert (kx - jx) * (cy - jy) - (ky - jy) * (cx - jx) > 0


def test_segment_intersections_matches_brute(ray_session):
    """Bucketed plan vs a brute all-pairs replay of the quantized
    strict-crossing predicate: proper crossings found, endpoint
    touching and collinear overlap excluded, cross-cell pairs dedup."""
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.poly_join import segment_intersection_join

    rng = np.random.default_rng(13)
    n = 120
    xs = rng.uniform(0, 100_000, n)
    ys = rng.uniform(0, 100_000, n)
    x1 = xs + rng.uniform(-3_000, 3_000, n)
    y1 = ys + rng.uniform(-3_000, 3_000, n)
    # planted: 100/101 proper X-crossing; 102/103 touch at an endpoint
    # (excluded); 104/105 collinear overlap (excluded); plant a crossing
    # pair spanning a cell boundary (6250 at depth 4)
    xs[100], ys[100], x1[100], y1[100] = 50_000, 50_000, 51_000, 51_000
    xs[101], ys[101], x1[101], y1[101] = 50_000, 51_000, 51_000, 50_000
    xs[102], ys[102], x1[102], y1[102] = 10_000, 10_000, 11_000, 10_000
    xs[103], ys[103], x1[103], y1[103] = 11_000, 10_000, 11_000, 12_000
    xs[104], ys[104], x1[104], y1[104] = 20_000, 20_000, 22_000, 20_000
    xs[105], ys[105], x1[105], y1[105] = 21_000, 20_000, 23_000, 20_000
    xs[106], ys[106], x1[106], y1[106] = 6_200, 6_200, 6_300, 6_300
    xs[107], ys[107], x1[107], y1[107] = 6_200, 6_300, 6_300, 6_200

    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(xs), "y": pa.array(ys),
                  "x1": pa.array(x1), "y1": pa.array(y1)})
    got = segment_intersection_join(rd.from_arrow(t).repartition(4),
                                    depth=4, world=WORLD_2D).to_pandas()

    q = {c: np.floor(arr * 16.0).astype(np.int64)
         for c, arr in (("ax0", xs), ("ay0", ys), ("ax1", x1), ("ay1", y1))}

    def d(i, j):
        bx = q["ax1"][j] - q["ax0"][j]
        by = q["ay1"][j] - q["ay0"][j]
        d1 = bx * (q["ay0"][i] - q["ay0"][j]) - by * (q["ax0"][i] - q["ax0"][j])
        d2 = bx * (q["ay1"][i] - q["ay0"][j]) - by * (q["ax1"][i] - q["ax0"][j])
        ax = q["ax1"][i] - q["ax0"][i]
        ay = q["ay1"][i] - q["ay0"][i]
        d3 = ax * (q["ay0"][j] - q["ay0"][i]) - ay * (q["ax0"][j] - q["ax0"][i])
        d4 = ax * (q["ay1"][j] - q["ay0"][i]) - ay * (q["ax1"][j] - q["ax0"][i])
        return (((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0))
                and ((d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)))

    want = [(i, j) for i in range(n) for j in range(i + 1, n) if d(i, j)]
    assert list(zip(got["doc_a"], got["doc_b"])) == want
    assert (100, 101) in want and (106, 107) in want
    assert (102, 103) not in want and (104, 105) not in want

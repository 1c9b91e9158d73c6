"""polygon_cover: adaptive mixed-depth cell cover of convex polygons
(the S2 RegionCoverer twin — engine kernel invariants; the SQL closure
equivalence runs in test_driver_contract)."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray.config import WORLD_2D, World
from optimizing_ray.pipelines.poly_join import (polygon_cover,
                                                polygon_cover_arrays)
from optimizing_ray.sources.driver_tables import PENT_UX, PENT_UY

WORLD = World(0.0, 0.0, 0.0, 1024.0, 1024.0, 0.0)


def _pent(x, y, sx, sy):
    ux, uy = np.asarray(PENT_UX), np.asarray(PENT_UY)
    return (np.asarray(x)[:, None] + np.asarray(sx)[:, None] * ux[None, :],
            np.asarray(y)[:, None] + np.asarray(sy)[:, None] * uy[None, :])


def _point_in_poly(px, py, vx, vy):
    nx = -(np.roll(vy, -1) - vy)
    ny = np.roll(vx, -1) - vx
    c = nx * vx + ny * vy
    return bool(((nx * px + ny * py) >= c).all())


def test_cover_is_an_antichain_and_classifies_exactly():
    rng = np.random.default_rng(7)
    n = 40
    x = rng.uniform(100, 900, n); y = rng.uniform(100, 900, n)
    sx = rng.uniform(20, 90, n); sy = rng.uniform(20, 90, n)
    vx, vy = _pent(x, y, sx, sy)
    row, d, ix, iy, full = polygon_cover_arrays(vx, vy, WORLD, 6)
    assert len(row) > 0 and full.any() and (~full).any()
    # (1) antichain: no emitted cell is an ancestor of another (same doc)
    keyset = {}
    for r_, d_, i_, j_ in zip(row, d, ix, iy):
        keyset.setdefault(int(r_), []).append((int(d_), int(i_), int(j_)))
    for r_, cells in keyset.items():
        s = set(cells)
        assert len(s) == len(cells)
        for (dd, ii, jj) in cells:
            for up in range(1, dd + 1):
                assert (dd - up, ii >> up, jj >> up) not in s
    # (2) full cells: all four corners inside the polygon
    wx = WORLD.max_x - WORLD.min_x
    wy = WORLD.max_y - WORLD.min_y
    for r_, d_, i_, j_ in zip(row[full], d[full], ix[full], iy[full]):
        cw, ch = wx / (1 << d_), wy / (1 << d_)
        x0, y0 = WORLD.min_x + i_ * cw, WORLD.min_y + j_ * ch
        for px, py in ((x0, y0), (x0 + cw, y0), (x0, y0 + ch),
                       (x0 + cw, y0 + ch)):
            assert _point_in_poly(px, py, vx[r_], vy[r_])
    # (3) the polygon centroid (x, y) lies in exactly ONE emitted cell
    for r_ in range(n):
        m = row == r_
        hits = 0
        for d_, i_, j_ in zip(d[m], ix[m], iy[m]):
            cw, ch = wx / (1 << d_), wy / (1 << d_)
            if (WORLD.min_x + i_ * cw <= x[r_] < WORLD.min_x + (i_ + 1) * cw
                    and WORLD.min_y + j_ * ch <= y[r_]
                    < WORLD.min_y + (j_ + 1) * ch):
                hits += 1
        assert hits == 1


def test_tiny_polygon_emits_partial_leaves_only():
    vx, vy = _pent([512.0], [512.0], [0.5], [0.5])
    row, d, ix, iy, full = polygon_cover_arrays(vx, vy, WORLD, 5)
    assert (d == 5).all() and (~full).all() and len(row) >= 1


def test_pipeline_stage_emits_schema(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "x": pa.array([5000.0, 60000.0]),
                  "y": pa.array([5000.0, 60000.0]),
                  "sx": pa.array([500.0, 900.0]),
                  "sy": pa.array([700.0, 400.0])})
    out = polygon_cover(rd.from_arrow(t), max_depth=6,
                        world=WORLD_2D).to_pandas()
    assert sorted(out.columns.tolist()) == [
        "cell_ix", "cell_iy", "depth", "doc_id", "full_cover"]
    assert set(out.doc_id) == {1, 2} and len(out) > 4

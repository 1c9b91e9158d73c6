"""Raster<->vector pipelines and the ray kernels (scalar oracles)."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.functions import rays
from optimizing_ray.pipelines import raster


def test_ray_aabb_scalar_cases():
    # straight-on hit from outside: entry at t=1
    t = rays.ray_aabb(0, 0, 0, 1, 0, 0, 1, -1, -1, 2, 1, 1)
    assert t == pytest.approx(1.0)
    # starting inside: exit distance
    t = rays.ray_aabb(1.5, 0, 0, 1, 0, 0, 1, -1, -1, 2, 1, 1)
    assert t == pytest.approx(0.5)
    # miss
    assert rays.ray_aabb(0, 5, 0, 1, 0, 0, 1, -1, -1, 2, 1, 1) == 0.0


def test_ray_sphere_scalar_cases():
    assert rays.ray_sphere(0, 0, 0, 1, 0, 0, 5, 0, 0, 1) == pytest.approx(4.0)
    # inside the sphere -> far root
    assert rays.ray_sphere(5, 0, 0, 1, 0, 0, 5, 0, 0, 1) == pytest.approx(1.0)
    assert rays.ray_sphere(0, 5, 0, 1, 0, 0, 5, 0, 0, 1) == 0.0


def test_gamma_u8_matches_reference_formula():
    v = np.asarray([0.0, 0.5, 1.0, 2.0, -1.0])
    got = rays.gamma_u8(v)
    want = np.asarray([int(pow(min(max(x, 0.0), 1.0), 1 / 2.2) * 255 + 0.5)
                       for x in v], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_nearest_doc_per_pixel_matches_brute(ray_session):
    corpus = synth.documents_batch(np.arange(800), variant="flat2d", with_spans=False)
    pixels = synth.raster_table(16, 16)
    res = raster.nearest_doc_per_pixel(pixels, corpus).to_pandas()
    assert len(res) == 256
    x, y = corpus["x"].to_numpy(), corpus["y"].to_numpy()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    cx, cy = pixels["cx"].to_numpy(), pixels["cy"].to_numpy()
    for i in [0, 17, 100, 255]:
        d2 = (x - cx[i]) ** 2 + (y - cy[i]) ** 2
        want = ids[np.argmin(d2)]
        got = res.loc[res.pixel_id == pixels["pixel_id"][i].as_py(), "doc_id"].iloc[0]
        assert got == want


def test_covering_pixels_matches_brute(ray_session):
    import ray.data as rd
    corpus = synth.documents_batch(np.arange(300), variant="flat2d", with_spans=False)
    res = raster.covering_pixels(rd.from_arrow(corpus), world=WORLD_2D,
                                 width=32, height=32).to_pandas()
    got = set(zip(res["doc_id"], res["px"], res["py"]))
    pw = 100_000 / 32
    want = set()
    for row in corpus.to_pylist():
        x0 = max(0, min(31, int(row["x"] // pw)))
        x1 = max(0, min(31, int((row["x"] + row["w"]) // pw)))
        y0 = max(0, min(31, int(row["y"] // pw)))
        y1 = max(0, min(31, int((row["y"] + row["h"]) // pw)))
        for px in range(x0, x1 + 1):
            for py in range(y0, y1 + 1):
                want.add((row["doc_id"], px, py))
    assert got == want


def test_raycast_scene_matches_scalar_oracle(ray_session):
    rng = np.random.default_rng(7)
    scene = {
        "obj_id": [f"obj-{i}" for i in range(20)],
        "kind": ["sphere" if i % 2 == 0 else "box" for i in range(20)],
        "a": [],
    }
    for i in range(20):
        if i % 2 == 0:
            scene["a"].append(tuple(rng.uniform(0, 100, 3)) + (rng.uniform(1, 10),))
        else:
            mn = rng.uniform(0, 90, 3)
            scene["a"].append(tuple(mn) + tuple(mn + rng.uniform(1, 10, 3)))
    n_rays = 200
    origins = rng.uniform(-50, 150, (n_rays, 3))
    dirs = rng.normal(size=(n_rays, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    prays = pa.table({
        "pixel_id": pa.array(np.arange(n_rays)),
        "ox": origins[:, 0], "oy": origins[:, 1], "oz": origins[:, 2],
        "dx": dirs[:, 0], "dy": dirs[:, 1], "dz": dirs[:, 2],
    })
    res = raster.raycast_scene(prays, scene).to_pandas().set_index("pixel_id")
    for r in range(0, n_rays, 17):
        best_t, best = np.inf, "<miss>"
        for i in range(20):
            a = scene["a"][i]
            if scene["kind"][i] == "sphere":
                t = float(rays.ray_sphere(*origins[r], *dirs[r], *a))
            else:
                t = float(rays.ray_aabb(*origins[r], *dirs[r], *a))
            if t > 0 and t < best_t:
                best_t, best = t, scene["obj_id"][i]
        assert res.loc[r, "obj_id"] == best
        if best != "<miss>":
            assert res.loc[r, "t_hit"] == pytest.approx(best_t)


def test_shade_mean_over_samples(ray_session):
    scene = {"obj_id": ["s0"], "kind": ["sphere"], "a": [(50.0, 0.0, 0.0, 10.0)]}
    n = 64
    prays = pa.table({
        "pixel_id": pa.array(np.arange(n, dtype=np.int64)),
        "ox": np.zeros(n), "oy": np.zeros(n), "oz": np.zeros(n),
        "dx": np.ones(n), "dy": np.zeros(n), "dz": np.zeros(n),
    })
    out = raster.shade(prays, scene, samples_per_pixel=8).to_pandas()
    assert len(out) == n
    # rays point straight at the sphere: every jittered sample still hits,
    # mean distance near 40
    assert (out["hit_frac"] == 1.0).all()
    assert np.allclose(out["mean_t_hit"], 40.0, atol=1.0)
    # determinism
    out2 = raster.shade(prays, scene, samples_per_pixel=8).to_pandas()
    np.testing.assert_array_equal(out.sort_values("pixel_id")["mean_t_hit"].to_numpy(),
                                  out2.sort_values("pixel_id")["mean_t_hit"].to_numpy())


def test_shade_miss_gives_zero(ray_session):
    scene = {"obj_id": ["s0"], "kind": ["sphere"], "a": [(50.0, 0.0, 0.0, 1.0)]}
    prays = pa.table({
        "pixel_id": pa.array([0]),
        "ox": [0.0], "oy": [0.0], "oz": [0.0],
        "dx": [-1.0], "dy": [0.0], "dz": [0.0],
    })
    out = raster.shade(prays, scene, samples_per_pixel=4).to_pandas()
    assert out["hit_frac"].iloc[0] == 0.0
    assert out["mean_t_hit"].iloc[0] == 0.0


def test_idw_grid_matches_brute(ray_session):
    """Partial-scatter IDW == single-pass brute over (pixel x doc), and
    the integer-weight sums are block-count invariant (order-exact)."""
    import ray.data as rd
    from optimizing_ray import synth
    from optimizing_ray.pipelines.raster import idw_grid

    corpus = synth.documents_batch(np.arange(3000), variant="flat2d",
                                   with_spans=False)
    t = corpus.select(["doc_id", "x", "y"]).append_column(
        "n_chars", pa.array((np.arange(3000) % 977).astype(np.int64)))
    W, R = 8, 9000.0
    wx, wy, _ = WORLD_2D.size
    got = idw_grid(rd.from_arrow(t).repartition(5), world=WORLD_2D,
                   width=W, height=W, radius=R).to_pandas()
    got1 = idw_grid(rd.from_arrow(t), world=WORLD_2D,
                    width=W, height=W, radius=R).to_pandas()
    # block-count invariance (integer partials)
    pd_sorted = lambda df: df.sort_values(["px", "py"]).reset_index(drop=True)
    assert pd_sorted(got).equals(pd_sorted(got1))
    # brute oracle
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    v = t["n_chars"].to_numpy()
    rows = {}
    for py in range(W):
        for px in range(W):
            cx = WORLD_2D.min_x + (px + 0.5) / W * wx
            cy = WORLD_2D.min_y + (py + 0.5) / W * wy
            d2 = (x - cx) ** 2 + (y - cy) ** 2
            m = d2 <= R * R
            if not m.any():
                continue
            w = np.floor(1e9 / (1.0 + d2[m])).astype(np.int64)
            rows[(px, py)] = (int(m.sum()), int(w.sum()),
                              np.floor(float((w * v[m]).sum()) / w.sum()
                                       * 1e6 + 0.5) / 1e6)
    assert len(got) == len(rows)
    for r in got.itertuples(index=False):
        n, ws, idw = rows[(r.px, r.py)]
        assert (r.n_docs, r.wsum) == (n, ws)
        assert r.idw == idw


def test_focal_stats_matches_brute(ray_session):
    """Stencil sums, border neighborhood sizes, occupied-only output —
    against a direct numpy grid replay."""
    import ray.data as rd

    from optimizing_ray.cells import decode2

    rng = np.random.default_rng(7)
    depth = 3
    n = 1 << depth
    # cluster points into a few cells incl. corners and edges
    xs = np.concatenate([rng.uniform(0, 100_000, 300),
                         np.full(20, 10.0),            # corner (0, 0)
                         np.full(15, 99_999.0)])       # corner (n-1, n-1)
    ys = np.concatenate([rng.uniform(0, 100_000, 300),
                         np.full(20, 10.0),
                         np.full(15, 99_999.0)])
    t = pa.table({"x": pa.array(xs), "y": pa.array(ys)})
    got = raster.focal_stats(rd.from_arrow(t).repartition(4),
                             depth=depth, world=WORLD_2D).to_pandas()

    ix = np.clip((xs / 100_000.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip((ys / 100_000.0 * n).astype(np.int64), 0, n - 1)
    grid = np.zeros((n, n), dtype=np.int64)
    np.add.at(grid, (ix, iy), 1)
    _, gix, giy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    for row, cx, cy in zip(got.itertuples(index=False),
                           gix.astype(np.int64).tolist(),
                           giy.astype(np.int64).tolist()):
        assert grid[cx, cy] == row.n_docs > 0
        x0, x1 = max(0, cx - 1), min(n - 1, cx + 1)
        y0, y1 = max(0, cy - 1), min(n - 1, cy + 1)
        assert row.focal_docs == grid[x0:x1 + 1, y0:y1 + 1].sum()
        assert row.n_cells == (x1 - x0 + 1) * (y1 - y0 + 1)
    # every occupied cell is present
    assert len(got) == (grid > 0).sum()
    assert got["n_docs"].sum() == len(xs)


def test_morans_i_matches_brute(ray_session):
    """Integer numerator/denominator and the micro-rounded ratio vs a
    direct dense-grid replay; checkerboard -> strongly negative,
    half/half split -> positive."""
    import ray.data as rd

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n

    def run(ix, iy):
        xs = (ix + 0.5) * cw
        ys = (iy + 0.5) * cw
        t = pa.table({"x": pa.array(xs), "y": pa.array(ys)})
        return raster.morans_i(rd.from_arrow(t).repartition(3),
                               depth=depth, world=WORLD_2D).to_pandas()

    # checkerboard counts 1/3 alternating over the full grid
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    reps = np.where((gx + gy) % 2 == 0, 1, 3).ravel()
    ix = np.repeat(gx.ravel(), reps).astype(np.float64)
    iy = np.repeat(gy.ravel(), reps).astype(np.float64)
    got = run(ix, iy)
    nc = n * n
    tot = int(reps.sum())
    z = (nc * reps - tot).reshape(n, n)
    num = int((z[1:, :] * z[:-1, :]).sum() * 2
              + (z[:, 1:] * z[:, :-1]).sum() * 2)
    den = int((z * z).sum())
    w = 2 * (2 * n * (n - 1))
    assert got["n_cells"].iloc[0] == nc
    assert got["w_pairs"].iloc[0] == w
    assert got["num"].iloc[0] == num
    assert got["den"].iloc[0] == den
    r = (np.float64(num) / np.float64(den)) * np.float64(nc) / np.float64(w)
    assert got["morans_i_6"].iloc[0] == int(np.floor(r * 1e6 + 0.5))
    assert got["morans_i_6"].iloc[0] < -500_000  # strongly negative

    # left-half heavy, right-half light -> positive autocorrelation
    reps2 = np.where(gx < n // 2, 5, 1).ravel()
    got2 = run(np.repeat(gx.ravel(), reps2).astype(np.float64),
               np.repeat(gy.ravel(), reps2).astype(np.float64))
    assert got2["morans_i_6"].iloc[0] > 500_000

    # uniform counts -> den == 0 -> defined 0
    got3 = run(gx.ravel().astype(np.float64), gy.ravel().astype(np.float64))
    assert got3["den"].iloc[0] == 0
    assert got3["morans_i_6"].iloc[0] == 0


def test_grid_bfs_matches_brute(ray_session):
    """Hop distances vs a driver BFS replay on an obstacle course:
    occupied corridor, isolated island (-1), seed at one end."""
    from collections import deque

    import ray.data as rd

    from optimizing_ray.cells import decode2

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    # L-shaped corridor cells + a 2-cell island; ids chosen so exactly
    # cell (0,0) holds a seed (doc_id 101 % 101 == 0)
    corridor = [(0, k) for k in range(n)] + [(k, n - 1) for k in range(1, n)]
    island = [(4, 2), (5, 2)]
    cells = corridor + island
    xs = np.array([(cx + 0.5) * cw for cx, _ in cells])
    ys = np.array([(cy + 0.5) * cw for _, cy in cells])
    ids = np.arange(1, len(cells) + 1, dtype=np.int64) * 103 + 5
    ids[0] = 101  # seed doc in cell (0, 0)
    assert not np.any(ids[1:] % 101 == 0)
    t = pa.table({"doc_id": pa.array(ids), "x": pa.array(xs),
                  "y": pa.array(ys)})
    got = raster.grid_bfs(rd.from_arrow(t).repartition(3),
                          depth=depth, world=WORLD_2D).to_pandas()

    occ = set(cells)
    dist = {(0, 0): 0}
    dq = deque([(0, 0)])
    while dq:
        cx, cy = dq.popleft()
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb in occ and nb not in dist:
                dist[nb] = dist[(cx, cy)] + 1
                dq.append(nb)
    _, gix, giy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    assert len(got) == len(occ)
    for row, cx, cy in zip(got.itertuples(index=False),
                           gix.astype(np.int64).tolist(),
                           giy.astype(np.int64).tolist()):
        assert row.hops == dist.get((cx, cy), -1)
        assert row.n_docs == 1
    assert (got["hops"] == -1).sum() == 2  # the island
    assert got["hops"].max() == 2 * (n - 1)  # corridor far end

    # cap clamps: same course with cap 3 -> farther cells report -1
    capped = raster.grid_bfs(rd.from_arrow(t), depth=depth,
                             world=WORLD_2D, cap=3).to_pandas()
    _, cxs, cys = decode2(capped["cell_key"].to_numpy().astype(np.uint64))
    for row, cx, cy in zip(capped.itertuples(index=False),
                           cxs.astype(np.int64).tolist(),
                           cys.astype(np.int64).tolist()):
        d = dist.get((cx, cy), -1)
        assert row.hops == (d if 0 <= d <= 3 else -1)


def test_flow_accumulation_matches_walk_brute(ray_session):
    """Routing and accumulation vs a literal per-cell downstream walk
    (strictly-lower min 8-neighbour, lowest-linear-index tie) on a
    depth-3 grid; mass conservation into sinks."""
    import ray.data as rd

    from optimizing_ray.cells import decode2
    from optimizing_ray.pipelines.sketches import splitmix64

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    rng = np.random.default_rng(11)
    ix = rng.integers(0, n, 400)
    iy = rng.integers(0, n, 400)
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.flow_accumulation(rd.from_arrow(t).repartition(4),
                                   depth=depth, world=WORLD_2D).to_pandas()

    lin = np.arange(n * n, dtype=np.int64)
    elev = (splitmix64(lin.view(np.uint64)) >> np.uint64(1)).astype(np.int64)
    rain = np.zeros(n * n, dtype=np.int64)
    np.add.at(rain, ix * n + iy, 1)

    def target(c):
        ci, cj = divmod(int(c), n)
        best = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == dj == 0:
                    continue
                ni, nj = ci + di, cj + dj
                if 0 <= ni < n and 0 <= nj < n:
                    nl = ni * n + nj
                    k = (int(elev[nl]), nl)
                    if best is None or k < best:
                        best = k
        return best[1] if best and best[0] < int(elev[c]) else -1

    acc = np.zeros(n * n, dtype=np.int64)
    for c in np.flatnonzero(rain):
        cur = int(c)
        while cur >= 0:
            acc[cur] += rain[c]
            cur = target(cur)
    _, gix, giy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    gl = gix.astype(np.int64) * n + giy.astype(np.int64)
    assert len(got) == int((acc > 0).sum())
    assert (got["acc"].to_numpy() == acc[gl]).all()
    assert (got["n_docs"].to_numpy() == rain[gl]).all()
    assert (got["sink"].to_numpy()
            == np.array([target(c) < 0 for c in gl], np.int64)).all()
    # mass conservation: every unit of rain lands in exactly one sink
    sinks = got[got["sink"] == 1]
    assert int(sinks["acc"].sum()) == int(rain.sum()) == 400


def test_local_morans_matches_brute(ray_session):
    """Per-cell z, rook lag and micro-rounded lisa vs a dense replay;
    hot blob center is strongly positive, its cold ring negative;
    identity sum(lisa numerators) == morans_i numerator."""
    import ray.data as rd

    from optimizing_ray.cells import decode2

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    gx, gy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    # hot 2x2 blob at (3..4, 3..4) on a count-1 background
    reps = np.where((np.abs(gx - 3.5) <= 0.5) & (np.abs(gy - 3.5) <= 0.5),
                    9, 1).ravel()
    ix = np.repeat(gx.ravel(), reps)
    iy = np.repeat(gy.ravel(), reps)
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.local_morans(rd.from_arrow(t).repartition(3),
                              depth=depth, world=WORLD_2D).to_pandas()

    nc = n * n
    grid = reps.reshape(n, n)
    tot = int(reps.sum())
    z = nc * grid.astype(np.int64) - tot
    den = int((z * z).sum())
    _, cix, ciy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    lag_sum = 0
    for row, cx, cy in zip(got.itertuples(index=False),
                           cix.astype(np.int64).tolist(),
                           ciy.astype(np.int64).tolist()):
        lag = sum(int(z[cx + dx, cy + dy])
                  for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1))
                  if 0 <= cx + dx < n and 0 <= cy + dy < n)
        assert row.z == z[cx, cy]
        assert row.lag == lag
        r = (float(row.z * lag) / float(den)) * float(nc)
        assert row.lisa_6 == int(np.floor(r * 1e6 + 0.5))
        lag_sum += row.z * lag
    # blob interior: hot cell next to hot cells -> strongly positive
    hot = got[(cix == 3) & (ciy == 3)]["lisa_6"].iloc[0]
    assert hot > 1_000_000
    # cells adjacent to the blob (cold next to hot) -> negative
    ring = got[(cix == 2) & (ciy == 3)]["lisa_6"].iloc[0]
    assert ring < 0
    # sum of local numerators equals the global morans_i numerator
    gi = raster.morans_i(rd.from_arrow(t), depth=depth,
                         world=WORLD_2D).to_pandas()
    assert lag_sum == gi["num"].iloc[0]


def test_viewshed_matches_scalar_brute(ray_session):
    """Vectorized ragged line walk vs a literal per-target scalar LOS
    replay of the same spec (round-half-up sampling, strict blocking,
    endpoint exclusion); observer tie-break; observer always visible."""
    import ray.data as rd

    from optimizing_ray.cells import decode2
    from optimizing_ray.pipelines.sketches import splitmix64

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    rng = np.random.default_rng(3)
    ix = rng.integers(0, n, 300)
    iy = rng.integers(0, n, 300)
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.viewshed(rd.from_arrow(t).repartition(4),
                          depth=depth, world=WORLD_2D).to_pandas()
    assert len(got) == n * n

    lin = np.arange(n * n, dtype=np.int64)
    elev = (splitmix64(lin.view(np.uint64)) >> np.uint64(40)).astype(np.int64)
    rain = np.zeros(n * n, dtype=np.int64)
    np.add.at(rain, ix * n + iy, 1)
    v = min(range(n * n), key=lambda c: (-rain[c], -elev[c], c))
    vx, vy = divmod(v, n)

    def visible(c):
        if c == v:
            return 1
        tx, ty = divmod(c, n)
        di, dj = tx - vx, ty - vy
        d = max(abs(di), abs(dj))
        for k in range(1, d):
            sx = vx + (2 * k * di + d) // (2 * d)
            sy = vy + (2 * k * dj + d) // (2 * d)
            s = sx * n + sy
            if s in (v, c):
                continue
            if elev[s] * d > elev[v] * (d - k) + elev[c] * k:
                return 0
        return 1

    _, gx, gy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    gl = gx.astype(np.int64) * n + gy.astype(np.int64)
    want = np.array([visible(int(c)) for c in gl], np.int64)
    assert (got["visible"].to_numpy() == want).all()
    assert (got["n_docs"].to_numpy() == rain[gl]).all()
    assert got["visible"].to_numpy()[gl == v][0] == 1
    again = raster.viewshed(rd.from_arrow(t), depth=depth,
                            world=WORLD_2D).to_pandas()
    assert got.equals(again)


def test_watershed_basins_matches_walk(ray_session):
    """Pointer-doubling terminals vs literal per-cell chasing; basins
    are consistent with flow_accumulation sinks; basin of a sink is
    itself with path_len 0."""
    import ray.data as rd

    from optimizing_ray.cells import decode2
    from optimizing_ray.pipelines.raster import _d8_flow

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    rng = np.random.default_rng(13)
    ix = rng.integers(0, n, 200)
    iy = rng.integers(0, n, 200)
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.watershed_basins(rd.from_arrow(t).repartition(3),
                                  depth=depth, world=WORLD_2D).to_pandas()
    assert len(got) == n * n

    _, flow = _d8_flow(n)
    _, gx, gy = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    gl = gx.astype(np.int64) * n + gy.astype(np.int64)
    _, bx, by = decode2(got["basin_key"].to_numpy().astype(np.uint64))
    bl = bx.astype(np.int64) * n + by.astype(np.int64)
    for c, b, pl in zip(gl.tolist(), bl.tolist(),
                        got["path_len"].tolist()):
        cur, steps = c, 0
        while flow[cur] >= 0:
            cur = int(flow[cur])
            steps += 1
        assert (b, pl) == (cur, steps)
    sinks = got[got["path_len"] == 0]
    assert (sinks["basin_key"] == sinks["cell_key"]).all()
    assert (flow[gl[got["path_len"].to_numpy() == 0]] == -1).all()


def test_slope_aspect_matches_scalar_horn(ray_session):
    """Horn gradient replayed per interior cell from the raw elevation
    grid; aspect = brute argmin over the 8 lex-ordered offsets."""
    import ray.data as rd

    from optimizing_ray.cells import decode2
    from optimizing_ray.pipelines.sketches import splitmix64

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    rng = np.random.default_rng(7)
    ix = rng.integers(0, n, 150)
    iy = rng.integers(0, n, 150)
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.slope_aspect(rd.from_arrow(t).repartition(3),
                              depth=depth, world=WORLD_2D).to_pandas()
    assert len(got) == (n - 2) * (n - 2)

    e = (splitmix64(np.arange(n * n, dtype=np.int64).view(np.uint64))
         >> np.uint64(40)).astype(np.int64).reshape(n, n)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    _, gx_, gy_ = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    for cx, cy, gx, gy, g2, asp in zip(
            gx_.tolist(), gy_.tolist(), got["gx"].tolist(),
            got["gy"].tolist(), got["g2"].tolist(),
            got["aspect"].tolist()):
        wgx = ((e[cx + 1, cy - 1] + 2 * e[cx + 1, cy] + e[cx + 1, cy + 1])
               - (e[cx - 1, cy - 1] + 2 * e[cx - 1, cy]
                  + e[cx - 1, cy + 1]))
        wgy = ((e[cx - 1, cy + 1] + 2 * e[cx, cy + 1] + e[cx + 1, cy + 1])
               - (e[cx - 1, cy - 1] + 2 * e[cx, cy - 1]
                  + e[cx + 1, cy - 1]))
        assert (gx, gy, g2) == (wgx, wgy, wgx * wgx + wgy * wgy)
        dots = [gx * dx + gy * dy for dx, dy in offs]
        assert asp == dots.index(min(dots))

    # doc counts land on the right interior cells
    dense = np.zeros((n, n), dtype=np.int64)
    np.add.at(dense, (ix, iy), 1)
    assert got["n_docs"].sum() == dense[1:-1, 1:-1].sum()
    again = raster.slope_aspect(rd.from_arrow(t), depth=depth,
                                world=WORLD_2D).to_pandas()
    assert got.equals(again)


def test_getis_ord_matches_scalar(ray_session):
    """Gi* replayed per occupied cell: rook+self sums, exact integer
    numerator, float tail; hot blob scores positive, far empty-ish
    region negative."""
    import math

    import ray.data as rd

    from optimizing_ray.cells import decode2

    depth = 3
    n = 1 << depth
    cw = 100_000.0 / n
    rng = np.random.default_rng(5)
    # hot 2x2 blob at (1..2, 1..2) + light scatter everywhere
    bx = rng.integers(1, 3, 400)
    by = rng.integers(1, 3, 400)
    sx = rng.integers(0, n, 120)
    sy = rng.integers(0, n, 120)
    ix = np.r_[bx, sx]
    iy = np.r_[by, sy]
    t = pa.table({"x": pa.array((ix + 0.5) * cw),
                  "y": pa.array((iy + 0.5) * cw)})
    got = raster.getis_ord(rd.from_arrow(t).repartition(3),
                           depth=depth, world=WORLD_2D).to_pandas()

    dense = np.zeros((n, n), dtype=np.int64)
    np.add.at(dense, (ix, iy), 1)
    occ = dense > 0
    nc = int(occ.sum())
    tot = int(dense.sum())
    sumsq = int((dense[occ].astype(object) ** 2).sum())
    bb = nc * sumsq - tot * tot
    assert len(got) == nc
    _, cx_, cy_ = decode2(got["cell_key"].to_numpy().astype(np.uint64))
    for cx, cy, nd, wi, si, num, gi in zip(
            cx_.tolist(), cy_.tolist(), got["n_docs"].tolist(),
            got["wi"].tolist(), got["si"].tolist(), got["num"].tolist(),
            got["gi_6"].tolist()):
        assert nd == dense[cx, cy]
        ws, ss = 1, int(dense[cx, cy])
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            jx, jy = cx + dx, cy + dy
            if 0 <= jx < n and 0 <= jy < n and occ[jx, jy]:
                ws += 1
                ss += int(dense[jx, jy])
        assert (wi, si) == (ws, ss)
        assert num == nc * ss - tot * ws
        c = bb * ws * (nc - ws)
        want = 0 if c == 0 else int(math.floor(
            float(num) / math.sqrt(float(c) / float(nc - 1)) * 1e6 + 0.5))
        assert gi == want

    df = got.set_index(["cell_key"])
    from optimizing_ray.cells import encode2
    hot = int(encode2(np.array([1], np.uint64), np.array([1], np.uint64),
                      depth)[0])
    assert df.loc[hot, "gi_6"] > 0
    assert (got["gi_6"] < 0).any()
    again = raster.getis_ord(rd.from_arrow(t), depth=depth,
                             world=WORLD_2D).to_pandas()
    assert got.equals(again)


def test_contour_cells_matches_dense_replay(ray_session):
    """Marching-squares cases vs a literal dense-grid replay on planted
    density (one hot blob over sparse scatter): only mixed blocks emit,
    codes follow the fixed corner order, layout invariance."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.raster import contour_cells

    rng = np.random.default_rng(11)
    wx, wy, _ = WORLD_2D.size
    blob = rng.uniform(0.2, 0.3, (300, 2)) * np.array([wx, wy])
    scat = rng.uniform(0, 1, (80, 2)) * np.array([wx, wy])
    pts = np.vstack([blob, scat])
    t = pa.table({"doc_id": pa.array(np.arange(len(pts), dtype=np.int64)),
                  "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    depth, thr = 4, 3
    got = contour_cells(rd.from_arrow(t).repartition(4), depth=depth,
                        world=WORLD_2D, threshold=thr).to_pandas()
    again = contour_cells(rd.from_arrow(t), depth=depth, world=WORLD_2D,
                          threshold=thr).to_pandas()
    assert got.equals(again)

    n = 1 << depth
    ix = np.clip(((pts[:, 0] - WORLD_2D.min_x) / (wx / n)).astype(int),
                 0, n - 1)
    iy = np.clip(((pts[:, 1] - WORLD_2D.min_y) / (wy / n)).astype(int),
                 0, n - 1)
    grid = np.zeros((n, n), int)
    np.add.at(grid, (ix, iy), 1)
    want = []
    for bx in range(n - 1):
        for by in range(n - 1):
            c = (int(grid[bx, by] >= thr)
                 + 2 * int(grid[bx + 1, by] >= thr)
                 + 4 * int(grid[bx + 1, by + 1] >= thr)
                 + 8 * int(grid[bx, by + 1] >= thr))
            if 0 < c < 15:
                want.append((bx, by, c))
    assert list(map(tuple, got.to_numpy())) == want
    assert len(want) > 0


def test_cost_distance_matches_dijkstra_replay(ray_session):
    """Bellman-Ford rounds vs a literal Dijkstra over the same occupied
    grid + splitmix costs: with enough rounds every reachable cell gets
    its true shortest cost; a short round budget leaves far cells at -1
    (the contract's bounded-rounds semantics); layout invariance."""
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.raster import cost_distance
    from optimizing_ray.pipelines.sketches import splitmix64
    from optimizing_ray.cells import decode2

    rng = np.random.default_rng(5)
    wx, wy, _ = WORLD_2D.size
    pts = rng.uniform(0, 1, (500, 2)) * np.array([wx, wy])
    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    depth, seed_mod, cost_mod = 4, 101, 8
    n = 1 << depth

    got = cost_distance(rd.from_arrow(t).repartition(4), depth=depth,
                        world=WORLD_2D, seed_mod=seed_mod, rounds=64,
                        cost_mod=cost_mod).to_pandas()
    again = cost_distance(rd.from_arrow(t), depth=depth, world=WORLD_2D,
                          seed_mod=seed_mod, rounds=64,
                          cost_mod=cost_mod).to_pandas()
    assert got.equals(again)

    ix = np.clip(((pts[:, 0] - WORLD_2D.min_x) / (wx / n)).astype(int),
                 0, n - 1)
    iy = np.clip(((pts[:, 1] - WORLD_2D.min_y) / (wy / n)).astype(int),
                 0, n - 1)
    occ = set(zip(ix, iy))
    seeds = {(a, b) for a, b, i in zip(ix, iy, ids) if i % seed_mod == 0}
    lin = np.arange(n * n, dtype=np.uint64)
    cost = (1 + (splitmix64(lin) % np.uint64(cost_mod))).astype(int)

    dist = {c: 0 for c in seeds}
    pq = [(0, c) for c in seeds]
    heapq.heapify(pq)
    while pq:
        d, (cx, cy) = heapq.heappop(pq)
        if dist.get((cx, cy), 1 << 60) < d:
            continue
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb not in occ:
                continue
            nd = d + int(cost[nb[0] * n + nb[1]])
            if nd < dist.get(nb, 1 << 60):
                dist[nb] = nd
                heapq.heappush(pq, (nd, nb))
    for r in got.itertuples():
        _, cix, ciy = decode2(np.array([r.cell_key], dtype=np.uint64))
        key = (int(cix[0]), int(ciy[0]))
        assert r.dist == dist.get(key, -1), key
        assert r.cell_cost == int(cost[key[0] * n + key[1]])

    # a tiny round budget leaves genuinely reachable cells at -1
    short = cost_distance(rd.from_arrow(t), depth=depth, world=WORLD_2D,
                          seed_mod=seed_mod, rounds=1,
                          cost_mod=cost_mod).to_pandas()
    assert (short["dist"] < 0).sum() > (got["dist"] < 0).sum()

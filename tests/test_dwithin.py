"""Distance-band join: broadcast and sharded plans vs a brute oracle."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import dwithin


def _brute(ids, x, y, r):
    pairs = set()
    for i in range(len(ids)):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        for j in np.flatnonzero(d2 <= r * r):
            if ids[i] < ids[j]:
                pairs.add((ids[i], ids[j]))
    return pairs


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(42)
    n = 800
    # clustered so the band actually produces pairs
    cx = rng.uniform(0, 100_000, 40)
    cy = rng.uniform(0, 100_000, 40)
    pick = rng.integers(0, 40, n)
    x = np.clip(cx[pick] + rng.normal(0, 1500, n), 0, 99_999)
    y = np.clip(cy[pick] + rng.normal(0, 1500, n), 0, 99_999)
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "x": pa.array(x), "y": pa.array(y)})


@pytest.mark.parametrize("nrows", [None, 800])
def test_dwithin_plans_match_brute(ray_session, cloud, nrows):
    import ray.data as rd

    ds = rd.from_arrow(cloud).repartition(4)
    got = dwithin.dwithin_join(ds, ds, world=WORLD_2D, depth=4,
                               radius=2000.0, nrows=nrows).to_pandas()
    ids = cloud["doc_id"].to_numpy()
    want = _brute(ids, cloud["x"].to_numpy(), cloud["y"].to_numpy(), 2000.0)
    assert set(zip(got["doc_a"], got["doc_b"])) == want
    assert len(got) == len(want)  # each pair exactly once
    # distances exact
    x, y = cloud["x"].to_numpy(), cloud["y"].to_numpy()
    d = np.sqrt((x[got["doc_a"]] - x[got["doc_b"]]) ** 2
                + (y[got["doc_a"]] - y[got["doc_b"]]) ** 2)
    np.testing.assert_allclose(got["dist"].to_numpy(), d, rtol=0, atol=0)


def test_dwithin_string_ids_broadcast(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(["a", "b", "c", "d"]),
                  "x": pa.array([0.0, 100.0, 200.0, 50_000.0]),
                  "y": pa.array([0.0, 0.0, 0.0, 50_000.0])})
    ds = rd.from_arrow(t)
    got = dwithin.dwithin_join(ds, ds, world=WORLD_2D, depth=4,
                               radius=250.0, nrows=4).to_pandas()
    assert set(zip(got["doc_a"], got["doc_b"])) == {
        ("a", "b"), ("a", "c"), ("b", "c")}


def test_dwithin_radius_spans_cells(ray_session):
    """Radius larger than a cell: ring cover > 1 still finds far pairs."""
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "x": pa.array([100.0, 12_000.0]),
                  "y": pa.array([100.0, 100.0])})
    ds = rd.from_arrow(t)
    for nrows in (None, 2):
        got = dwithin.dwithin_join(ds, ds, world=WORLD_2D, depth=4,
                                   radius=12_000.0, nrows=nrows).to_pandas()
        assert list(zip(got["doc_a"], got["doc_b"])) == [(0, 1)]


def test_spatial_clusters_plans_match(ray_session, cloud):
    """Driver union-find plan == distributed min-label propagation ==
    a local reference clustering; singletons label themselves."""
    import ray.data as rd

    ds = rd.from_arrow(cloud).repartition(4)
    kw = dict(world=WORLD_2D, depth=4, radius=2000.0)
    got_b = (dwithin.spatial_clusters(ds, nrows=800, **kw)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got_d = (dwithin.spatial_clusters(ds, nrows=None, **kw)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got_b.equals(got_d)
    # local reference: union-find over brute pairs + singleton fill
    ids = cloud["doc_id"].to_numpy()
    pairs = _brute(ids, cloud["x"].to_numpy(), cloud["y"].to_numpy(), 2000.0)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {i: find(int(i)) for i in ids}
    got_map = dict(zip(got_b["doc_id"], got_b["cluster_id"]))
    assert got_map == want
    assert len(got_b) == len(ids)


def test_ripley_k_matches_brute(ray_session):
    """Count-only cell-ownership kernel vs the O(n^2) brute on clustered
    synthetic points (two tight blobs + scatter); exact normalization;
    layout invariance; blob clustering pushes khat far above CSR."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.dwithin import ripley_k

    rng = np.random.default_rng(5)
    blob1 = rng.normal((20_000, 20_000), 1_500, (150, 2))
    blob2 = rng.normal((70_000, 60_000), 2_000, (120, 2))
    scat = rng.uniform(0, 100_000, (130, 2))
    pts = np.clip(np.vstack([blob1, blob2, scat]), 0.0, 99_999.0)
    t = pa.table({"doc_id": pa.array(np.arange(len(pts), dtype=np.int64)),
                  "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    radii = (5_000.0, 10_000.0, 20_000.0)
    got = ripley_k(rd.from_arrow(t).repartition(4), radii,
                   world=WORLD_2D).to_pandas()
    again = ripley_k(rd.from_arrow(t), radii, world=WORLD_2D).to_pandas()
    assert got.equals(again)

    n = len(pts)
    dx = pts[:, 0][:, None] - pts[:, 0][None, :]
    dy = pts[:, 1][:, None] - pts[:, 1][None, :]
    d2 = dx * dx + dy * dy
    iu = np.triu_indices(n, 1)
    for k, r in enumerate(radii):
        p = int((d2[iu] <= r * r).sum())
        assert got["n_pairs"].iloc[k] == p
        assert got["n_points"].iloc[k] == n
        assert got["khat"].iloc[k] == (2 * p * 10_000_000_000) // (n * (n - 1))
    # the blobs make the pattern strongly clustered vs CSR at r=5000
    assert got["khat"].iloc[0] > 5 * 3.14159 * 5_000 ** 2


def test_colocation_matches_brute(ray_session):
    """Contact pairs vs a literal per-event-pair brute force using the
    same id-derived geometry; layout invariance; no same-user pairs."""
    import ray.data as rd

    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    rng = np.random.default_rng(17)
    n = 1200
    eid = rng.choice(80_000, n, replace=False).astype(np.int64)
    uid = rng.integers(0, 40, n).astype(np.int64)
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 50 * 3_600_000_000, n)
    t = pa.table({"user_id": pa.array(uid), "event_id": pa.array(eid),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    radius, tau = 20_000.0, 21_600_000_000
    got = dwithin.colocation(rd.from_arrow(t).repartition(4),
                             radius=radius, tau_us=tau,
                             world=WORLD_2D).to_pandas()

    wx, wy, _ = WORLD_2D.size
    x = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    from collections import Counter
    want = Counter()
    for i in range(n):
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        ok = ((d2 <= radius * radius) & (np.abs(ts - ts[i]) <= tau)
              & (uid != uid[i]) & (eid[i] < eid))
        for j in np.flatnonzero(ok):
            want[(min(uid[i], uid[j]), max(uid[i], uid[j]))] += 1
    got_c = {(a, b): c for a, b, c in
             zip(got["user_a"], got["user_b"], got["n_contacts"])}
    assert got_c == dict(want)
    assert (got["user_a"] < got["user_b"]).all()
    again = dwithin.colocation(rd.from_arrow(t), radius=radius,
                               tau_us=tau, world=WORLD_2D).to_pandas()
    assert got.equals(again)


def test_clark_evans_matches_brute(ray_session):
    """CE replayed against a literal per-point nearest-neighbour brute
    on a planted two-blob pattern (clustered => ce_6 well below 1e6);
    layout invariance."""
    import math

    import ray.data as rd

    rng = np.random.default_rng(23)
    nb = 320
    ids = np.arange(0, 8 * nb, 1, dtype=np.int64)
    x = np.where(ids % 2 == 0,
                 rng.normal(20_000, 800, len(ids)),
                 rng.normal(80_000, 800, len(ids)))
    y = np.where(ids % 2 == 0,
                 rng.normal(30_000, 800, len(ids)),
                 rng.normal(70_000, 800, len(ids)))
    x = np.clip(x, 0, 99_999.0)
    y = np.clip(y, 0, 99_999.0)
    t = pa.table({"doc_id": pa.array(ids), "x": pa.array(x),
                  "y": pa.array(y)})
    got = dwithin.clark_evans(rd.from_arrow(t).repartition(3),
                              world=WORLD_2D, depth=4,
                              nrows=len(ids)).to_pandas()

    keep = ids % 8 == 0
    sx, sy = x[keep], y[keep]
    n = int(keep.sum())
    sm = 0
    for i in range(n):
        d2 = (sx - sx[i]) ** 2 + (sy - sy[i]) ** 2
        d2[i] = np.inf
        sm += int(math.floor(math.sqrt(float(d2.min())) * 1e3 + 0.5))
    area = 100_000 * 100_000
    r_obs_6 = (sm * 1000) // n
    r_exp_6 = int(math.floor(0.5 * math.sqrt(float(area) / float(n))
                             * 1e6 + 0.5))
    ce_6 = int(math.floor(float(r_obs_6) / float(r_exp_6) * 1e6 + 0.5))
    assert got.to_dict("records") == [{
        "n_points": n, "sum_nn_milli": sm, "r_obs_6": r_obs_6,
        "r_exp_6": r_exp_6, "ce_6": ce_6}]
    assert ce_6 < 700_000          # planted clustering
    again = dwithin.clark_evans(rd.from_arrow(t), world=WORLD_2D,
                                depth=4, nrows=len(ids)).to_pandas()
    assert got.equals(again)


def test_ring_cover_invariant_raises_instead_of_undercounting(ray_session):
    """Round-4 ADVICE items: (1) a radius too large for the world must
    raise (a clamped depth silently misses qualifying pairs); (2) ids
    past u32 must raise at the pair-pack sites rather than merging
    distinct pairs."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.cluster import _packed_pair_keys
    from optimizing_ray.pipelines.dwithin import colocation, ripley_k

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "x": pa.array([1.0, 2.0]), "y": pa.array([1.0, 2.0])})
    wmin = min(WORLD_2D.size[:2])
    with pytest.raises(ValueError, match="too large for world"):
        ripley_k(rd.from_arrow(t), (wmin * 0.75,), world=WORLD_2D)
    ev = pa.table({"event_id": pa.array([0, 1], pa.int64()),
                   "user_id": pa.array([0, 1], pa.int64()),
                   "ts": pa.array([0, 1], pa.int64())})
    with pytest.raises(ValueError, match="too large for world"):
        colocation(rd.from_arrow(ev), radius=wmin * 0.75, world=WORLD_2D)

    with pytest.raises(ValueError, match="pair packing"):
        _packed_pair_keys(np.array([1, 1 << 33], np.int64),
                          np.array([2, 3], np.int64), op="triangle_count")
    with pytest.raises(ValueError, match="pair packing"):
        _packed_pair_keys(np.array([-1], np.int64),
                          np.array([2], np.int64), op="clustering_coeff")
    ok = _packed_pair_keys(np.array([1], np.int64),
                           np.array([2], np.int64), op="x")
    assert ok.tolist() == [(1 << 32) | 2]


def test_dbscan_matches_brute_and_plans_agree(ray_session):
    """DBSCAN proper vs a literal O(n^2) brute (degree count, core CC,
    min-label border, noise), both plans bit-equal; the planted tight
    blobs come out as two clusters with scatter noise."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.dwithin import dbscan

    rng = np.random.default_rng(7)
    blob1 = rng.normal((20_000, 20_000), 800, (40, 2))
    blob2 = rng.normal((70_000, 60_000), 900, (35, 2))
    scat = rng.uniform(0, 100_000, (40, 2))
    pts = np.clip(np.vstack([blob1, blob2, scat]), 0.0, 99_999.0)
    n = len(pts)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1])})
    r, min_pts = 3000.0, 4
    kw = dict(world=WORLD_2D, depth=4, radius=r, min_pts=min_pts)

    got = (dbscan(rd.from_arrow(t).repartition(3), nrows=n, **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    sharded = (dbscan(rd.from_arrow(t).repartition(3), nrows=None, **kw)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sharded)

    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nbr = (d2 <= r * r) & ~np.eye(n, dtype=bool)
    core = nbr.sum(1) >= min_pts - 1
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(nbr)):
        if i < j and core[i] and core[j]:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    lab = {i: min(k for k in range(n) if core[k] and find(k) == find(i))
           for i in range(n) if core[i]}
    role = np.zeros(n, np.int64)
    clu = np.full(n, -1, np.int64)
    for i in range(n):
        if core[i]:
            role[i], clu[i] = 2, lab[i]
        else:
            cn = [lab[j] for j in np.nonzero(nbr[i])[0] if core[j]]
            if cn:
                role[i], clu[i] = 1, min(cn)
    assert (got["role"].to_numpy() == role).all()
    assert (got["cluster_id"].to_numpy() == clu).all()
    # the planted structure: two clusters, real noise, all three roles
    assert len(set(clu[clu >= 0])) == 2
    assert (role == 0).sum() > 0 and (role == 2).sum() > 0


def test_contact_reach_time_respecting_semantics(ray_session):
    """Reachability spreads only FORWARD in time: a planted chain
    seed -> u1 -> u2 with the u1-u2 contact BEFORE the seed-u1 contact
    must NOT infect u2; with the order fixed it must.  Both plans
    bit-equal; round budget limits hops."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.dwithin import contact_reach
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    wx, wy, _ = WORLD_2D.size
    # find event ids mapping to nearby points (same cell family): scan
    # for ids whose derived points are pairwise within 2000
    ids = np.arange(200_000, dtype=np.int64)
    x = WORLD_2D.min_x + _frac(ids, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(ids, GEO_MULTS["y"]) * wy
    # find a dense 500-unit bucket (>= 4 derived points co-located)
    bx = (x // 500).astype(np.int64) * 1_000_000 + (y // 500).astype(
        np.int64)
    ub, binv, bcnt = np.unique(bx, return_inverse=True,
                               return_counts=True)
    dense = np.flatnonzero(bcnt >= 4)[0]
    near = ids[binv == dense]
    assert len(near) >= 4
    e_s, e_u1a, e_u1b, e_u2 = (int(near[0]), int(near[1]),
                               int(near[2]), int(near[3]))
    hour = 3_600_000_000
    seed_mod = 1000  # user 0 is the only seed

    def run(ts_map, rounds):
        t = pa.table({
            "event_id": pa.array(np.array(list(ts_map.keys()), np.int64)),
            "user_id": pa.array(np.array(
                [v[0] for v in ts_map.values()], np.int64)),
            "ts": pa.array(np.array([v[1] for v in ts_map.values()],
                                    np.int64).astype("datetime64[us]"))})
        ds = rd.from_arrow(t)
        a = contact_reach(ds, world=WORLD_2D, radius=2000.0,
                          tau_us=hour // 2, seed_mod=seed_mod,
                          rounds=rounds, nrows=len(ts_map)).to_pandas()
        b = contact_reach(rd.from_arrow(t).repartition(2), world=WORLD_2D,
                          radius=2000.0, tau_us=hour // 2,
                          seed_mod=seed_mod, rounds=rounds,
                          nrows=None).to_pandas()
        a = a.sort_values("user_id").reset_index(drop=True)
        b = b.sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        return dict(zip(a["user_id"], a["infected_at"]))

    # forward chain: seed(u0) meets u1 at hour 1; u1 meets u2 at hour 3
    fwd = {e_s: (0, 1 * hour), e_u1a: (1, 1 * hour),
           e_u1b: (1, 3 * hour), e_u2: (2, 3 * hour)}
    m = run(fwd, rounds=3)
    assert m[0] == 0 and m[1] == 1 * hour and m[2] == 3 * hour

    # only one round: u2 not reached yet
    m1 = run(fwd, rounds=1)
    assert m1[1] == 1 * hour and m1[2] == -1

    # reversed: u1-u2 contact happens BEFORE u1 is infected
    back = {e_s: (0, 3 * hour), e_u1a: (1, 3 * hour),
            e_u1b: (1, 1 * hour), e_u2: (2, 1 * hour)}
    m2 = run(back, rounds=3)
    assert m2[1] == 3 * hour and m2[2] == -1

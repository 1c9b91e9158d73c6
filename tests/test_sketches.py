"""Percentile aggregate and HLL sketch."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray.pipelines import sketches


def test_percentile_disc_matches_numpy(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(13)
    n = 20_000
    t = pa.table({"k": pa.array(rng.integers(0, 5, n), pa.int64()),
                  "v": pa.array(rng.uniform(0, 100, n))})
    out = sketches.percentile_disc(rd.from_arrow(t), key_col="k",
                                   value_col="v", q=0.5).to_pandas()
    df = t.to_pandas()
    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        want = v[int(np.ceil(0.5 * len(v))) - 1]
        got = out.loc[out.k == k, "p50"].iloc[0]
        assert got == want  # exact element, bit-for-bit


def test_hll_distinct_accuracy(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(17)
    true_n = 30_000
    vals = rng.choice(10_000_000, size=true_n, replace=False)
    # duplicate rows: cardinality unchanged
    col = np.concatenate([vals, vals[: true_n // 2]])
    t = pa.table({"v": pa.array(col, pa.int64())})
    est = sketches.hll_distinct(rd.from_arrow(t).repartition(8), "v")
    assert abs(est - true_n) / true_n < 0.05


def test_hll_small_cardinality_linear_counting(ray_session):
    import ray.data as rd
    t = pa.table({"v": pa.array(list(range(100)) * 50, pa.int64())})
    est = sketches.hll_distinct(rd.from_arrow(t), "v")
    assert abs(est - 100) / 100 < 0.05


def test_quantile_sketch_error_bound(ray_session):
    """Rank error of the mergeable summary stays within the documented
    bound on a skewed (lognormal) distribution."""
    import ray.data as rd
    rng = np.random.default_rng(31)
    vals = rng.lognormal(mean=0.0, sigma=2.0, size=60_000)
    t = pa.table({"v": pa.array(vals)})
    out = sketches.quantile_sketch(rd.from_arrow(t).repartition(16), "v",
                                   qs=(0.1, 0.5, 0.9, 0.99), k=512)
    sv = np.sort(vals)
    for q, est in zip(out["q"].to_pylist(), out["value"].to_pylist()):
        true_rank = np.searchsorted(sv, est, side="right") / len(sv)
        assert abs(true_rank - q) < 0.01, (q, est, true_rank)


def test_quantile_sketch_exact_in_unit_weight_regime(ray_session):
    """With every batch below k values the sketch IS the exact discrete
    quantile (quantile_disc convention) — the regime the SQL oracle pins."""
    import ray.data as rd
    rng = np.random.default_rng(32)
    vals = rng.uniform(0, 1, 400)
    t = pa.table({"v": pa.array(vals)})
    out = sketches.quantile_sketch(rd.from_arrow(t).repartition(4), "v",
                                   qs=(0.5,), k=512)
    sv = np.sort(vals)
    want = sv[int(np.ceil(0.5 * len(sv))) - 1]
    assert out["value"][0].as_py() == want


def test_grouped_quantile_sketch_exact_small_groups(ray_session):
    """High-cardinality per-key quantiles: exact (== percentile_disc)
    when per-(batch, key) groups stay under k."""
    import ray.data as rd
    rng = np.random.default_rng(33)
    n = 30_000
    t = pa.table({"k": pa.array(rng.integers(0, 2000, n), pa.int64()),
                  "v": pa.array(rng.uniform(0, 100, n))})
    out = sketches.grouped_quantile_sketch(
        rd.from_arrow(t).repartition(8), key_col="k", value_col="v",
        q=0.5).to_pandas().sort_values("k").reset_index(drop=True)
    df = t.to_pandas()
    assert len(out) == df["k"].nunique()
    for key, g in list(df.groupby("k"))[:50]:
        v = np.sort(g["v"].to_numpy())
        want = v[int(np.ceil(0.5 * len(v))) - 1]
        assert out.loc[out.k == key, "p50"].iloc[0] == want


def test_count_min_overestimates_and_merges(ray_session):
    """CMS estimates >= true counts always; exact for keys with no
    collisions in some row; partition layout cannot change the sketch
    (counter matrices merge by addition)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.sketches import count_min

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 300, 20000).astype(np.int64)
    t = pa.table({"k": pa.array(keys)})
    probes = np.arange(0, 300, 7)
    a = count_min(rd.from_arrow(t).repartition(6), key_col="k",
                  probe_keys=probes, d=4, w=512).to_pandas()
    b = count_min(rd.from_arrow(t), key_col="k",
                  probe_keys=probes, d=4, w=512).to_pandas()
    assert (a["cms_count"].to_numpy() == b["cms_count"].to_numpy()).all()
    true = np.array([(keys == p).sum() for p in probes])
    est = a["cms_count"].to_numpy()
    assert (est >= true).all()
    # wide matrix, 300 keys in 512 buckets x 4 rows: most probes exact
    assert (est == true).mean() > 0.5
    # absent keys report their collision floor, never negative
    absent = count_min(rd.from_arrow(t), key_col="k",
                       probe_keys=np.array([10_000, 10_001]),
                       d=4, w=512).to_pandas()
    assert (absent["cms_count"].to_numpy() >= 0).all()


def test_count_min_empty_input(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.sketches import count_min

    t = pa.table({"k": pa.array([], pa.int64())})
    out = count_min(rd.from_arrow(t), key_col="k",
                    probe_keys=np.array([1, 2, 3])).to_pandas()
    assert list(out["cms_count"]) == [0, 0, 0]


def test_kmv_overlap_exact_when_not_full(ray_session):
    """Sketches below k hold every hash -> counts are EXACT set sizes."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.sketches import kmv_overlap

    # a: users 0..19; b: users 10..29 (overlap 10); c: disjoint 100..104
    rows = ([("a", u) for u in range(20)] + [("b", u) for u in range(10, 30)]
            + [("c", u) for u in range(100, 105)]) * 3   # repeats collapse
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "user_id": pa.array([r[1] for r in rows], pa.int64())})
    out = (kmv_overlap(rd.from_arrow(t), k=64).to_pandas()
           .set_index(["type_a", "type_b"]))
    ab = out.loc[("a", "b")]
    assert (ab.est_a, ab.est_b, ab.est_union, ab.est_inter) == (20, 20, 30, 10)
    ac = out.loc[("a", "c")]
    assert (ac.est_union, ac.est_inter) == (25, 0)


def test_kmv_overlap_full_sketch_estimates(ray_session):
    """Above k the estimator kicks in: within ~25% of truth at k=64 and
    identical across batch layouts (mergeable partials)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.sketches import kmv_overlap

    na, shared = 1200, 600
    a = [("a", u) for u in range(na)]
    b = [("b", u) for u in range(na - shared, 2 * na - shared)]
    rows = a + b
    t = pa.table({"event_type": pa.array([r[0] for r in rows]),
                  "user_id": pa.array([r[1] for r in rows], pa.int64())})
    out = kmv_overlap(rd.from_arrow(t), k=64).to_pandas().iloc[0]
    assert abs(out.est_a - na) / na < 0.25
    assert abs(out.est_union - (2 * na - shared)) / (2 * na - shared) < 0.25
    assert abs(out.est_inter - shared) / shared < 0.5
    # layout invariance: one block vs many small blocks
    out2 = kmv_overlap(rd.from_arrow(t).repartition(7), k=64).to_pandas()
    assert out2.iloc[0].equals(out)


def test_ams_f2_registers_match_replay(ray_session):
    """Register sums, squared-sum estimate and exact F2 vs a direct
    numpy replay over real sf events; layout invariance; the estimator
    lands within the 3-sigma AMS band on this data."""
    import numpy as np
    import pandas as pd

    from optimizing_ray.pipelines.sketches import _SM_GAMMA, ams_f2, splitmix64
    from optimizing_ray.sources import driver_tables

    sfd = "/root/testdata/sf0.001"
    ev = driver_tables.read(sfd, "events", columns=["user_id"])
    got = ams_f2(ev).to_pandas().iloc[0]
    again = ams_f2(ev.repartition(7)).to_pandas().iloc[0]
    assert got.equals(again)

    u = pd.read_parquet(f"{sfd}/events.parquet",
                        columns=["user_id"])["user_id"].to_numpy(np.int64)
    R = 32
    sum_sq = 0
    for j in range(R):
        h = splitmix64(u.view(np.uint64) + np.uint64(j) * _SM_GAMMA)
        s = int((1 - 2 * (h & np.uint64(1)).astype(np.int64)).sum())
        sum_sq += s * s
    counts = pd.Series(u).value_counts().to_numpy(np.int64)
    f2 = int(np.dot(counts, counts))
    assert got["n_rows"] == len(u)
    assert got["sum_sq"] == sum_sq
    assert got["f2_est"] == sum_sq // R
    assert got["f2_exact"] == f2
    # E[est] = F2, std = sqrt(2/R)*F2: deterministic hash, but assert
    # the realized draw sits inside the 3-sigma design band
    assert abs(got["f2_est"] - f2) <= 3 * (2.0 / R) ** 0.5 * f2

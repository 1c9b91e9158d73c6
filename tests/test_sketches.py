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

"""global_rank (distributed sample-sort) invariants; SQL equivalence
runs in test_driver_contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from optimizing_ray.pipelines.sort import global_rank


def _oracle_rank(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["k", "i"]).reset_index(drop=True)
    out["global_rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out.sort_values("i").reset_index(drop=True)


def test_global_rank_exact_with_skewed_duplicate_keys(ray_session):
    """Zipf-ish duplicate-heavy keys: ranks are the exact total order by
    (key, id), invariant to block layout and to the sample size (boundary
    choice tunes balance, never correctness)."""
    rng = np.random.default_rng(7)
    k = (rng.zipf(1.5, 5000) % 97).astype(np.int64)   # heavy ties
    i = np.arange(5000, dtype=np.int64)
    t = pa.table({"k": pa.array(k), "i": pa.array(i)})
    want = _oracle_rank(pd.DataFrame({"k": k, "i": i}))
    for nb, spb in ((1, 64), (13, 4)):
        got = (global_rank(rd.from_arrow(t).repartition(nb),
                           key_col="k", id_col="i", sample_per_block=spb)
               .to_pandas().sort_values("i").reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "i", "global_rank"]],
                                      want[["k", "i", "global_rank"]])


def test_global_rank_partitions_are_balanced_on_uniform_keys(ray_session):
    """The sample pass produces usable cut points: with uniform keys no
    range partition holds more than ~3x its fair share."""
    rng = np.random.default_rng(11)
    k = rng.integers(0, 1 << 40, 20000).astype(np.int64)
    t = pa.table({"k": pa.array(k), "i": pa.array(np.arange(20000, dtype=np.int64))})
    from optimizing_ray.pipelines.sort import _sample_boundaries
    bounds = _sample_boundaries(rd.from_arrow(t).repartition(8), "k", 16, 64)
    assert len(bounds) >= 8
    parts = np.searchsorted(bounds, k, side="right")
    share = np.bincount(parts, minlength=len(bounds) + 1)
    assert share.max() <= 3 * (len(k) // (len(bounds) + 1))

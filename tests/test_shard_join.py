"""Direct unit tests for the sharded union-groupby hash join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from optimizing_ray.pipelines import shard_join


def _mk(n, prefix, keys):
    return pa.table({f"{prefix}id": pa.array(np.arange(n, dtype=np.int64)),
                     f"{prefix}v": pa.array([f"{prefix}{i}" for i in range(n)]),
                     "k": pa.array(np.asarray(keys, dtype=np.int64))})


def test_inner_and_left_match_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    lt = _mk(300, "a", rng.integers(0, 40, 300))
    rt = _mk(200, "b", rng.integers(0, 40, 200))
    ldf = lt.to_pandas()
    rdf = rt.to_pandas()
    for how in ("inner", "left"):
        got = (shard_join.hash_shard_join(
            rd.from_arrow(lt).repartition(3), rd.from_arrow(rt).repartition(2),
            on="k", how=how, n_shards=8).to_pandas())
        want = ldf.merge(rdf, on="k", how=how)
        key = ["aid", "k", "bid"]
        g = got.sort_values(key, na_position="last").reset_index(drop=True)
        w = want.sort_values(key, na_position="last").reset_index(drop=True)
        assert len(g) == len(w)
        for c in ("aid", "k", "av"):
            assert list(g[c]) == list(w[c])
        # right values align (NaN-safe compare for the left join)
        assert g["bv"].fillna("~").tolist() == w["bv"].fillna("~").tolist()
        if how == "inner":
            assert g["bid"].dtype == np.int64  # NaN-upcast restored


def test_overlapping_columns_rejected(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array([1]), "x": pa.array([1.0])})
    with pytest.raises(ValueError, match="overlap"):
        shard_join.hash_shard_join(rd.from_arrow(t), rd.from_arrow(t), on="k")

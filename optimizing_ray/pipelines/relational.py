"""Generic relational helpers over the driver star schema.

Broadcast dimension joins (the ray_guide small-side pattern): dimension
tables ship once via ray.put; fact batches look keys up with vectorized
searchsorted — no shuffle.  Demonstrates that the engine's join toolbox
covers plain equi-joins, not just spatial ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

__all__ = ["broadcast_lookup", "sales_by_nation"]


def broadcast_lookup(facts: rd.Dataset, dim: pa.Table, *, fact_key: str,
                     dim_key: str, value_cols: tuple[str, ...]) -> rd.Dataset:
    """Append dim[value_cols] to fact rows by key (inner join semantics:
    unmatched fact rows are dropped)."""
    order = np.argsort(dim[dim_key].to_numpy(zero_copy_only=False))
    dim_ref = ray.put({
        "key": dim[dim_key].to_numpy(zero_copy_only=False)[order],
        **{c: dim[c].to_numpy(zero_copy_only=False)[order] for c in value_cols},
    })

    def lookup(t: pa.Table) -> pa.Table:
        d = ray.get(dim_ref)
        keys = t[fact_key].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(d["key"], keys), 0, max(0, len(d["key"]) - 1))
        hit = d["key"][pos] == keys if len(d["key"]) else np.zeros(len(keys), bool)
        t = t.filter(pa.array(hit))
        pos = pos[hit]
        for c in value_cols:
            t = t.append_column(c, pa.array(d[c][pos]))
        return t

    return facts.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def sales_by_nation(sf_dir: str) -> rd.Dataset:
    """Order revenue per customer nation: two broadcast dimension joins +
    in-batch partial aggregation + tiny final groupby."""
    import pyarrow.parquet as pq

    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    j = broadcast_lookup(orders, customer, fact_key="o_custkey",
                         dim_key="c_custkey", value_cols=("c_nationkey",))
    j = broadcast_lookup(j, nation, fact_key="c_nationkey",
                         dim_key="n_nationkey", value_cols=("n_name",))

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"nation": t["n_name"].to_pylist(),
                           "v": t["o_totalprice"].to_numpy()})
        agg = df.groupby("nation", sort=True).agg(n=("v", "size"), s=("v", "sum")).reset_index()
        return pa.table({"nation": pa.array(agg["nation"]),
                         "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
                         "s": pa.array(agg["s"].to_numpy())})

    parts = j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = parts.groupby("nation").sum(["n", "s"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"nation": t["nation"],
                         "n_orders": t["sum(n)"],
                         "revenue": pa.array(np.round(t["sum(s)"].to_numpy(), 4))})

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

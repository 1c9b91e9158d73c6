"""Sharded hash equi-join without ``Dataset.join``.

Ray Data's native ``Dataset.join`` launches ``num_partitions`` dedicated
hash-aggregator ACTORS per execution (~0.5 s each to start, serially),
so a fresh process pays ~15+ s before the first joined row — measured on
this VM for a 4.5 k x 500 row join (round-3 profiling).  Every other
exchange in this repo already uses the side-tagged-union + hash-shard
``groupby().map_groups()`` pattern (~1 s fixed cost at <=32 shards,
working notes), so this module gives the same pattern a reusable shape:

1. pad each side to ONE unified arrow schema (typed nulls for the other
   side's columns — ``Dataset.union`` refuses mixed schemas, and typed
   nulls keep the arrow->pandas dtype sane);
2. union + ``groupby(_cshard)`` where ``_cshard = phi64(key) % n_shards``
   (multiplicative hash so Morton-adjacent cells spread);
3. inside each shard ONE vectorized ``pandas.merge`` — C hash join.

Joined output column order is [left columns..., right columns...] minus
the duplicated key.  Int64 columns that cannot be NULL after the merge
(left side under ``how='left'``, both under ``'inner'``) are restored
from pandas' NaN-upcast float64 before the frame leaves the shard.

The reference analogue is the same as ``box_join_shuffle``'s: pairing a
query stream against per-cell buckets (``WorldPartition.hpp:196-212``),
expressed as a relational equi-join on the cell key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from optimizing_ray.config import resolve_shards

__all__ = ["hash_shard_join"]

_PHI64 = np.uint64(0x9E3779B97F4A7C15)


def _shard_of(key: np.ndarray, n_shards: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = key.astype(np.uint64) * _PHI64
    return (h >> np.uint64(33)).astype(np.int64) % n_shards


def hash_shard_join(left: rd.Dataset, right: rd.Dataset, *, on: str,
                    how: str = "inner", n_shards: int | None = None,
                    lschema: pa.Schema | None = None,
                    rschema: pa.Schema | None = None) -> rd.Dataset:
    """Equi-join two Datasets on integer column ``on``.

    ``how`` is ``'inner'`` or ``'left'`` (left-outer: unmatched left rows
    survive with nulls in the right columns).  Column names of the two
    sides must be disjoint apart from ``on``.

    ``lschema``/``rschema``: pass the known Arrow schemas when a side is
    a derived pipeline — ``Dataset.schema()`` on a map chain EXECUTES
    the upstream pipeline to peek one block (measured seconds per probe
    on multi-leg sides), so callers that already know the shape should
    say so.
    """
    n_shards = resolve_shards(n_shards)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if lschema is None:
        lschema = left.schema().base_schema
    if rschema is None:
        rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column names overlap beyond the key: {overlap}")
    unified = pa.schema(
        [("_side", pa.int8())]
        + [(c, lschema.field(c).type) for c in lcols]
        + [(c, rschema.field(c).type) for c in rcols]
        + [("_cshard", pa.int64())])

    def _pad(t: pa.Table, side: int) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return unified.empty_table()
        n = t.num_rows
        arrs = [pa.array(np.full(n, side, dtype=np.int8))]
        for f in unified:
            if f.name in ("_side", "_cshard"):
                continue
            arrs.append(t[f.name] if f.name in t.column_names
                        else pa.nulls(n, f.type))
        key = t[on].to_numpy(zero_copy_only=False)
        arrs.append(pa.array(_shard_of(key, n_shards)))
        return pa.table(dict(zip(unified.names, arrs))).cast(unified)

    tagged = (left.map_batches(lambda t: _pad(t, 0), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right.map_batches(lambda t: _pad(t, 1),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)))

    # columns safe to restore from float64 NaN-upcast after the merge
    restore = [c for c in (lcols if how == "left" else lcols + rcols)
               if pa.types.is_integer((lschema if c in lcols else
                                       rschema).field(c).type)]

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        lf = lf[lcols]
        rf = rf[[on] + rcols]
        out = lf.merge(rf, on=on, how=how)
        for c in restore:
            if c in out.columns and out[c].dtype != object:
                out[c] = out[c].astype(np.int64)
        return out

    return tagged.groupby("_cshard").map_groups(merge_shard,
                                                batch_format="pandas")

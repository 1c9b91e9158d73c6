"""Distributed global sort / rank via sample-based range partitioning.

The TeraSort shape (the only sort that works at 100 TB):

1. SAMPLE pass — column-pruned scan of the sort key emitting a bounded,
   deterministic per-batch sample; the driver folds the samples into
   ``n_parts - 1`` range boundaries.  Sampling is evenly-spaced order
   statistics per batch, so skewed keys still yield balanced cuts.
2. COUNT pass — column-pruned scan bincounting rows per range partition;
   the driver prefix-sums the (tiny, ``n_parts``-long) vector into
   global rank offsets, broadcast via ``ray.put``.
3. RANK pass — the one real shuffle: rows exchange on their range-
   partition id (``groupby(part).map_groups``), each partition sorts
   locally by (key, id) and adds its global offset.

Ranks are exact and total (ties broken by ``id_col``), matching the SQL
``row_number() OVER (ORDER BY key, id)`` twin bit-for-bit.  Correctness
never depends on the boundaries — any cut point set yields the same
ranks — so the sample size only tunes balance.  Unlike
``Dataset.sort``, the output carries the global rank as a COLUMN, which
is what downstream percentile filters / balanced splits actually need.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.config import resolve_shards

__all__ = ["global_rank", "global_running_offset", "curriculum_bins"]


def _sample_boundaries(ds: rd.Dataset, key_col: str, n_parts: int,
                       sample_per_block: int) -> np.ndarray:
    """Evenly-spaced per-batch order statistics -> global cut points."""

    def sample(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.int64())})
        k = np.sort(t[key_col].to_numpy(zero_copy_only=False))
        take = min(sample_per_block, len(k))
        idx = ((np.arange(take, dtype=np.int64) * len(k)) // take)
        return pa.table({key_col: pa.array(k[idx])})

    samples = np.sort(ds.map_batches(
        sample, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()[key_col].to_numpy())
    if len(samples) == 0:
        return np.asarray([], dtype=np.int64)
    cuts = ((np.arange(1, n_parts, dtype=np.int64) * len(samples)) // n_parts)
    return np.unique(samples[cuts])


def global_rank(ds: rd.Dataset, *, key_col: str, id_col: str,
                rank_name: str = "global_rank",
                n_parts: int | None = None,
                sample_per_block: int = 64) -> rd.Dataset:
    """Append the exact global rank (1-based) by (key_col asc, id_col asc).

    ``ds`` should already be pruned to the columns the caller wants
    ranked; the sample and count passes re-execute only its (lazy,
    column-pruned) plan, the rank pass is the single all-to-all.
    """
    n_parts = resolve_shards(n_parts)
    bounds = _sample_boundaries(ds, key_col, n_parts, sample_per_block)

    def part_of(t: pa.Table) -> np.ndarray:
        k = t[key_col].to_numpy(zero_copy_only=False)
        return np.searchsorted(bounds, k, side="right").astype(np.int64)

    # COUNT pass: per-batch bincount -> driver prefix sums
    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"part": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        c = np.bincount(part_of(t), minlength=len(bounds) + 1)
        nz = np.flatnonzero(c)
        return pa.table({"part": pa.array(nz.astype(np.int64)),
                         "n": pa.array(c[nz].astype(np.int64))})

    cdf = (ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas().groupby("part")["n"].sum())
    full = np.zeros(len(bounds) + 1, dtype=np.int64)
    full[cdf.index.to_numpy()] = cdf.to_numpy()
    offsets_ref = ray.put(np.concatenate([[0], np.cumsum(full)[:-1]]))

    # RANK pass: exchange on the range partition, sort locally, add offset
    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int64())})
        return t.append_column("_part", pa.array(part_of(t)))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values([key_col, id_col])
        part = int(g["_part"].iloc[0])
        g = g.assign(**{rank_name: offs[part] + 1
                        + np.arange(len(g), dtype=np.int64)})
        return g.drop(columns=["_part"])

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_part").map_groups(rank, batch_format="pandas"))


def global_running_offset(ds: rd.Dataset, *, key_col: str, val_col: str,
                          offset_name: str = "offset",
                          n_parts: int | None = None,
                          sample_per_block: int = 64) -> rd.Dataset:
    """Append the exact EXCLUSIVE prefix sum of ``val_col`` in ``key_col``
    order (unique int64 keys): row i gets sum of val over all rows with a
    strictly smaller key.  Same TeraSort shape as ``global_rank`` — the
    COUNT pass becomes a per-partition SUM pass (int64, order-exact), the
    driver exclusive-scans the tiny partition-total vector, and the one
    shuffle adds within-partition exclusive cumsums.  The SQL twin is
    ``sum(val) OVER (ORDER BY key) - val``.

    ``ds`` should be the slim (key, val) projection, pre-materialized by
    the caller if deriving it is expensive (each pass re-executes the
    lazy plan otherwise)."""
    n_parts = resolve_shards(n_parts)
    bounds = _sample_boundaries(ds, key_col, n_parts, sample_per_block)

    def part_of(t: pa.Table) -> np.ndarray:
        k = t[key_col].to_numpy(zero_copy_only=False)
        return np.searchsorted(bounds, k, side="right").astype(np.int64)

    def sums(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"part": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        acc = np.zeros(len(bounds) + 1, dtype=np.int64)
        np.add.at(acc, part_of(t),
                  t[val_col].to_numpy(zero_copy_only=False).astype(np.int64))
        nz = np.flatnonzero(acc)
        return pa.table({"part": pa.array(nz.astype(np.int64)),
                         "s": pa.array(acc[nz])})

    cdf = (ds.map_batches(sums, batch_format="pyarrow", zero_copy_batch=True)
           .to_pandas().groupby("part")["s"].sum())
    full = np.zeros(len(bounds) + 1, dtype=np.int64)
    if len(cdf):
        full[cdf.index.to_numpy()] = cdf.to_numpy()
    offsets_ref = ray.put(np.concatenate([[0], np.cumsum(full)[:-1]]))

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             val_col: pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int64())})
        return t.append_column("_part", pa.array(part_of(t)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values(key_col)
        v = g[val_col].to_numpy().astype(np.int64)
        part = int(g["_part"].iloc[0])
        excl = np.concatenate([[0], np.cumsum(v)[:-1]])
        g = g.assign(**{offset_name: offs[part] + excl})
        return g.drop(columns=["_part"])

    return (ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_part").map_groups(scan, batch_format="pandas"))


def curriculum_bins(ds: rd.Dataset, *, key_col: str, id_col: str,
                    total_rows: int, n_bins: int = 10,
                    n_parts: int | None = None) -> rd.Dataset:
    """Curriculum binning — equal-population score buckets for staged
    training: exact global rank by (key_col, id_col) (the sample-sort
    machinery), then ``bin = (rank-1) * n_bins // total_rows`` — the
    exact-integer ntile-by-formula, identical in SQL via the
    divisible-subtraction floor division.  ``total_rows`` comes free
    from parquet metadata (never a count() pass).  Output
    (id_col, key_col, global_rank, bin)."""
    ranked = global_rank(ds, key_col=key_col, id_col=id_col,
                         n_parts=n_parts)
    B = np.int64(n_bins)
    N = np.int64(total_rows)

    def add_bin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "global_rank" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64()),
                             "global_rank": pa.array([], pa.int64()),
                             "bin": pa.array([], pa.int64())})
        r = t["global_rank"].to_numpy(zero_copy_only=False) - 1
        return t.append_column("bin", pa.array((r * B) // N))

    return ranked.map_batches(add_bin, batch_format="pyarrow",
                              zero_copy_batch=True)

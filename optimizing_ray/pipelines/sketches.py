"""Aggregate extensions: exact discrete percentiles and mergeable sketches.

* ``percentile_disc`` — exact discrete quantile per group (returns an
  actual element, so the DuckDB ``quantile_disc`` oracle matches
  bit-for-bit).  Per-group exact medians need the group's values in one
  task — right for low-cardinality keys (an approximate mergeable quantile
  sketch is the unbounded-cardinality path; the HLL below demonstrates
  the engine's mergeable-sketch plumbing).
* ``hll_distinct`` — HyperLogLog distinct-count: each batch emits ONE
  4096-register sketch row, merged by elementwise max (the mergeable-
  sketch partial/final pattern from the Ray guide); estimate within a
  few % of exact at any scale with constant memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["percentile_disc", "hll_distinct"]


def percentile_disc(ds: rd.Dataset, *, key_col: str, value_col: str,
                    q: float = 0.5, out_col: str | None = None) -> rd.Dataset:
    """Exact discrete q-quantile of value_col per key (DuckDB
    quantile_disc semantics: the element at index ceil(q*n)-1 of the
    sorted values, q in (0,1])."""
    out_col = out_col or f"p{int(q * 100)}"

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy())
        idx = max(0, int(np.ceil(q * len(v))) - 1)
        return pd.DataFrame({key_col: [g[key_col].iloc[0]], out_col: [v[idx]]})

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


_HLL_P = 12  # 4096 registers; standard error ~1.04/sqrt(4096) = 1.6%
_HLL_M = 1 << _HLL_P

# splitmix64 mixing constants (public domain, Steele et al.)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over a uint64 array — the HLL value hash.
    Plain mod-2^64 arithmetic, so the DuckDB oracle reproduces it
    bit-for-bit (``oracle.hll_distinct_sql``)."""
    with np.errstate(over="ignore"):
        z = x + _SM_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM_C1
        z = (z ^ (z >> np.uint64(27))) * _SM_C2
        return z ^ (z >> np.uint64(31))


def _hll_registers(values) -> np.ndarray:
    """One HLL register array from a value array (hash -> bucket/rank).

    Integer values hash with splitmix64 (deterministic + SQL-twinnable);
    anything else falls back to the pandas object hash (deterministic
    within a run, no SQL twin)."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        h = splitmix64(arr.astype(np.int64).view(np.uint64))
    else:
        h = pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)
    bucket = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = h << np.uint64(_HLL_P)
    # rank = leading zeros of the remaining bits + 1 (cap 64-P+1)
    rank = np.full(len(h), 64 - _HLL_P + 1, dtype=np.int64)
    nz = rest != 0
    # leading zero count via float64 exponent trick is lossy; use bit scan
    r = rest[nz]
    lz = np.zeros(len(r), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = r < (np.uint64(1) << np.uint64(64 - shift))
        lz = lz + np.where(m, shift, 0)
        r = np.where(m, r << np.uint64(shift), r)
    rank[nz] = lz + 1
    regs = np.zeros(_HLL_M, dtype=np.int8)
    np.maximum.at(regs, bucket, rank.astype(np.int8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Estimate from registers.  The harmonic sum is computed EXACTLY as
    the integer S = sum(2^(64-reg)) (sum(2^-reg) == S / 2^64): float
    summation order would otherwise make the estimate depend on register
    iteration order, and the SQL oracle could never match bit-for-bit."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    S = sum(1 << (64 - int(r)) for r in regs)  # exact Python int
    est = alpha * m * m / (S / 2.0 ** 64)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small cardinalities
    return float(est)


def hll_distinct(ds: rd.Dataset, col: str) -> float:
    """Approximate distinct count of `col`: one sketch per batch, merged
    driver-side by elementwise max (sketches are tiny and mergeable —
    4 KB each regardless of corpus size)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _hll_registers(t[col].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    import ray
    merged = np.zeros(_HLL_M, dtype=np.int8)
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for b in t["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.int8))
    return _hll_estimate(merged)

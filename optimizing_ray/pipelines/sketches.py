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
* ``quantile_sketch`` / ``grouped_quantile_sketch`` — THE
  unbounded-cardinality quantile path: mergeable equal-weight summaries
  (<= k weighted data elements per batch/key), sharded merge, rank
  select; exact in the unit-weight regime, bounded rank error beyond.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from optimizing_ray.config import resolve_shards

__all__ = ["percentile_disc", "hll_distinct", "splitmix64", "kmv_overlap",
           "quantile_sketch", "grouped_quantile_sketch", "count_min",
           "ams_f2"]


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
        if t.num_rows == 0 or col not in t.column_names:  # empty-schema blocks
            return pa.table({"regs": pa.array([], pa.binary())})
        regs = _hll_registers(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    import ray
    merged = np.zeros(_HLL_M, dtype=np.int8)
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for b in t["regs"].to_pylist():
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.int8))
    return _hll_estimate(merged)


# --- mergeable quantile sketch (the unbounded-cardinality path) -----------

def _summary_points(values: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Equal-weight quantile summary of one value array: at most k actual
    ELEMENTS (never interpolated means, so unit-weight summaries stay
    bit-exact), each carrying weight n/k.  Rank error of the summary is
    <= n/(2k)."""
    v = np.sort(np.asarray(values))
    n = len(v)
    if n <= k:
        return v, np.ones(n, dtype=np.float64)
    idx = np.minimum(((np.arange(k) + 0.5) * n / k).astype(np.int64), n - 1)
    return v[idx], np.full(k, n / k, dtype=np.float64)


def _rank_select(values: np.ndarray, weights: np.ndarray, q: float):
    """First element whose cumulative weight reaches ceil(q * W) — the
    ``quantile_disc`` convention, exact when all weights are 1."""
    order = np.argsort(values, kind="stable")
    cw = np.cumsum(weights[order])
    target = np.ceil(q * cw[-1])
    i = int(np.searchsorted(cw, target - 1e-9))
    return values[order[min(i, len(order) - 1)]]


def quantile_sketch(ds: rd.Dataset, value_col: str, qs=(0.5,), *,
                    k: int = 512, merge_cap: int = 8192) -> pa.Table:
    """Approximate quantiles of one column via mergeable equal-weight
    summaries: each batch emits <= k weighted points (4 KB-ish), the
    driver merges and rank-selects.  Rank error <= 1/(2k) per batch
    summary + 1/(2*merge_cap) for the merge compression — constant
    memory at any corpus size (the percentile_disc docstring's promised
    unbounded-cardinality path).

    Returns a table (q, value)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or value_col not in t.column_names:
            return pa.table({"v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        v, w = _summary_points(t[value_col].to_numpy(zero_copy_only=False), k)
        return pa.table({"v": pa.array(v.astype(np.float64)), "w": pa.array(w)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    vs, ws = [], []
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            vs.append(t["v"].to_numpy())
            ws.append(t["w"].to_numpy())
    if not vs:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    v = np.concatenate(vs)
    w = np.concatenate(ws)
    if len(v) > merge_cap:  # re-compress the merged summary
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cw = np.cumsum(w)
        targets = (np.arange(merge_cap) + 0.5) * cw[-1] / merge_cap
        sel = np.minimum(np.searchsorted(cw, targets), len(v) - 1)
        grp_w = np.diff(np.concatenate([[0.0], cw[sel]]))
        v, w = v[sel], grp_w
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value": pa.array([_rank_select(v, w, q) for q in qs], pa.float64()),
    })


def grouped_quantile_sketch(ds: rd.Dataset, *, key_col: str, value_col: str,
                            q: float = 0.5, k: int = 512,
                            n_shards: int | None = None,
                            out_col: str | None = None) -> rd.Dataset:
    """Per-key quantiles at UNBOUNDED key cardinality: per-batch per-key
    summaries (<= k weighted points each) shuffle on ``hash(key) %
    n_shards`` — never one Ray group per key — and each shard rank-selects
    all its keys in one vectorized pandas pass.

    EXACT (quantile_disc convention, SQL-oracle-able) whenever no single
    (batch, key) group exceeds k values — weights stay 1 and rank-select
    degenerates to the discrete quantile; beyond that it degrades
    gracefully to the summary's bounded rank error."""
    n_shards = resolve_shards(n_shards)
    out_col = out_col or f"p{int(q * 100)}"

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            # empty blocks can arrive with an EMPTY schema (repo working notes)
            return pa.table({key_col: pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        df = t.select([key_col, value_col]).to_pandas()
        keys_out, v_out, w_out = [], [], []
        for key, g in df.groupby(key_col, sort=False):
            v, w = _summary_points(g[value_col].to_numpy(), k)
            keys_out.append(np.full(len(v), key))
            v_out.append(v)
            w_out.append(w)
        return pa.table({
            key_col: pa.array(np.concatenate(keys_out)),
            "v": pa.array(np.concatenate(v_out).astype(np.float64)),
            "w": pa.array(np.concatenate(w_out)),
        })

    def add_shard(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(t[key_col].to_numpy(zero_copy_only=False)),
            index=False).to_numpy()
        return t.append_column("_shard", pa.array(
            (h % np.uint64(n_shards)).astype(np.int64)))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-key rank select: sort by (key, v), cumulative
        # weights per key, first row reaching ceil(q * W)
        g = g.sort_values([key_col, "v"], kind="stable")
        cw = g.groupby(key_col, sort=False)["w"].cumsum()
        W = g.groupby(key_col, sort=False)["w"].transform("sum")
        reach = cw.to_numpy() >= np.ceil(q * W.to_numpy()) - 1e-9
        first = pd.DataFrame({key_col: g[key_col].to_numpy()[reach],
                              out_col: g["v"].to_numpy()[reach]})
        return first.drop_duplicates(key_col, keep="first")

    return (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(finalize, batch_format="pandas"))


def count_min(ds: rd.Dataset, *, key_col: str,
              probe_keys: np.ndarray, d: int = 4, w: int = 256) -> pa.Table:
    """Count-min sketch — frequency estimates under CONSTANT memory: a
    d x w int64 counter matrix; key u increments cell (j, h_j(u)) for
    each of the d rows; the estimate for u is the MIN over its d cells
    (always >= the true count; collisions only inflate).  Row hashes are
    splitmix64((u + j * gamma) mod 2^64) mod w — deterministic and
    SQL-twinnable (``oracle.count_min_sql``).

    Scale shape: the canonical mergeable-sketch plan (the hll_distinct
    pattern): every batch emits ONE d*w-int64 blob row regardless of
    batch size, the driver SUMS the blobs (counter matrices merge by
    addition), and the probe evaluation is a vectorized lookup over the
    caller's bounded ``probe_keys``.  Zero shuffles at any corpus size.
    Output (key, cms_count) per probe key — absent keys report their
    collision floor, exactly like a real CMS."""
    d, w = int(d), int(w)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"cms": pa.array([], pa.binary())})
        u = (t[key_col].to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64))
        m = np.zeros((d, w), np.int64)
        with np.errstate(over="ignore"):
            for j in range(d):
                b = (splitmix64(u + np.uint64(j) * _SM_GAMMA)
                     % np.uint64(w)).astype(np.int64)
                np.add.at(m[j], b, 1)
        return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    m = np.zeros((d, w), np.int64)
    for r in parts:
        m += np.frombuffer(r["cms"], dtype=np.int64).reshape(d, w)

    probes = np.asarray(probe_keys, np.int64)
    est = np.full(len(probes), np.iinfo(np.int64).max)
    with np.errstate(over="ignore"):
        for j in range(d):
            b = (splitmix64(probes.view(np.uint64) + np.uint64(j) * _SM_GAMMA)
                 % np.uint64(w)).astype(np.int64)
            est = np.minimum(est, m[j, b])
    return pa.table({key_col: pa.array(probes),
                     "cms_count": pa.array(est.astype(np.int64))})


def _kmv_fold(keys: np.ndarray, hs: np.ndarray, k: int
              ) -> tuple[np.ndarray, np.ndarray]:
    """Per key: k smallest DISTINCT uint64 hashes (one lexsort +
    adjacent-unique + rank mask; no per-key loop)."""
    codes, uniq = pd.factorize(keys)
    order = np.lexsort((hs, codes))
    c, h = codes[order], hs[order]
    keep = np.r_[True, (c[1:] != c[:-1]) | (h[1:] != h[:-1])]
    c, h = c[keep], h[keep]
    starts = np.r_[True, c[1:] != c[:-1]]
    grp = np.cumsum(starts) - 1
    rank = np.arange(len(c)) - np.repeat(np.flatnonzero(starts),
                                         np.diff(np.r_[np.flatnonzero(starts),
                                                       len(c)]))
    m = rank < k
    return uniq[c[m]], h[m]


def _kmv_est(n: int, hk: int, k: int) -> int:
    """KMV cardinality estimate: exact count while the sketch is not
    full, else floor((k-1) * 2^64 / h_k) — plain integer math (Python
    ints; the SQL twin uses HUGEINT // )."""
    if n < k:
        return n
    return ((k - 1) << 64) // hk


def kmv_overlap(ds: rd.Dataset, *, key_col: str = "event_type",
                id_col: str = "user_id", k: int = 64,
                n_shards: int | None = None) -> pa.Table:
    """Theta/KMV-sketch distinct set operations: per key, the k
    minimum splitmix64 values of the id column; per key PAIR, the
    estimated distinct-id cardinalities, union, and intersection —
    the "how many distinct users do two sources share" question at
    100 TB without ever shuffling raw ids (Beyer et al. 2007, the
    DataSketches theta family).  Output (type_a, type_b, est_a,
    est_b, est_union, est_inter), pairs a < b in byte order.

    Exactness discipline: a not-full sketch holds EVERY hash of its
    key, so counts are exact; full sketches use the (k-1)/h_k
    estimator and the merged-sketch Jaccard, all in integer
    arithmetic (Python int / HUGEINT), so the SQL twin
    ``oracle.kmv_overlap_sql`` is bit-identical — approximate BY
    DESIGN yet deterministically verifiable.

    Plan: per-batch distinct (key, id) -> splitmix64 -> per-key
    k-smallest partial (mergeable), ONE hash(key) exchange folds
    partials, driver combines the <= n_keys * k survivors pairwise
    (keys are assumed sketch-table-small; pairs are O(n_keys^2))."""
    n_shards = resolve_shards(n_shards)
    part_schema = pa.schema([("_ky", pa.string()), ("_h", pa.uint64()),
                             ("_shard", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if (t.num_rows == 0 or key_col not in t.column_names
                or id_col not in t.column_names):
            return part_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(str)
        ids = t[id_col].to_numpy().astype(np.int64).view(np.uint64)
        ky, h = _kmv_fold(keys, splitmix64(ids), k)
        sh = pd.util.hash_pandas_object(pd.Series(ky),
                                        index=False).to_numpy()
        return pa.table({"_ky": pa.array(ky.astype(str)),
                         "_h": pa.array(h),
                         "_shard": pa.array((sh % np.uint64(n_shards))
                                            .astype(np.int64))})

    def shard_fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"_ky": pd.Series([], dtype=str),
                                 "_h": pd.Series([], dtype=np.uint64)})
        ky, h = _kmv_fold(g["_ky"].to_numpy(), g["_h"].to_numpy(), k)
        return pd.DataFrame({"_ky": ky.astype(str), "_h": h})

    rows = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_shard").map_groups(shard_fold,
                                          batch_format="pandas")
            .to_pandas())
    out = {"type_a": [], "type_b": [], "est_a": [], "est_b": [],
           "est_union": [], "est_inter": []}
    if len(rows) and "_ky" in rows.columns:
        sk = {ky: sorted(int(v) for v in g["_h"].to_numpy())
              for ky, g in rows.groupby("_ky", sort=True)}
        names = sorted(sk)
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                sa, sb = sk[a], sk[b]
                merged = sorted(set(sa) | set(sb))[:k]
                nm = len(merged)
                est_u = _kmv_est(nm, merged[-1] if merged else 1, k)
                both = set(sa) & set(sb)
                x = sum(1 for h in merged if h in both)
                est_i = x if nm < k else (x * est_u) // k
                out["type_a"].append(a)
                out["type_b"].append(b)
                out["est_a"].append(_kmv_est(len(sa), sa[-1] if sa else 1, k))
                out["est_b"].append(_kmv_est(len(sb), sb[-1] if sb else 1, k))
                out["est_union"].append(est_u)
                out["est_inter"].append(est_i)
    return pa.table({"type_a": pa.array(out["type_a"], pa.string()),
                     "type_b": pa.array(out["type_b"], pa.string()),
                     "est_a": pa.array(out["est_a"], pa.int64()),
                     "est_b": pa.array(out["est_b"], pa.int64()),
                     "est_union": pa.array(out["est_union"], pa.int64()),
                     "est_inter": pa.array(out["est_inter"], pa.int64())})


def ams_f2(ds: rd.Dataset, *, key_col: str = "user_id",
           n_registers: int = 32, n_shards: int | None = None) -> pa.Table:
    """AMS tug-of-war sketch of the second frequency moment F2 =
    sum_u f_u^2 (Alon-Matias-Szegedy 1996) over the key column, plus
    the exact F2 for side-by-side error audit.  Register j holds
    S_j = sum over ROWS of sign_j(key), sign_j from the parity of
    splitmix64((key + (j+1)*gamma) mod 2^64) — the count_min seeding
    scheme, so the SQL twin (``oracle.ams_f2_sql``) reproduces every
    register bit-for-bit; E[S_j^2] = F2.  The estimate is the exact
    integer floor mean sum(S_j^2) // R — approximate BY DESIGN,
    deterministically verifiable (the HLL/KMV discipline).

    Output ONE row: (n_rows, n_registers, sum_sq, f2_est, f2_exact).

    Plan: sketch leg is shuffle-FREE — each batch folds unique keys
    once, mixes R seeded hashes per unique key (vectorized over the
    key axis), and emits R partial-register rows; the driver sums
    blocks x R ints.  The exact-F2 leg is ONE hash(key) exchange of
    per-batch (key, count) partials; each shard emits a single
    sum-of-squares over its complete keys, the driver adds n_shards
    ints — no unbounded collect anywhere."""
    from optimizing_ray.pipelines.windows import _shard_of_keys

    n_shards = resolve_shards(n_shards)
    R = n_registers
    out_schema = pa.schema([
        ("n_rows", pa.int64()), ("n_registers", pa.int64()),
        ("sum_sq", pa.int64()), ("f2_est", pa.int64()),
        ("f2_exact", pa.int64())])
    # splitmix64 adds one gamma internally, so seed j*gamma lines up with
    # the SQL chain's (u + (j+1)*gamma) start (the count_min convention)
    seeds = (np.arange(R, dtype=np.uint64) * _SM_GAMMA)

    def sketch_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"j": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(u, return_counts=True)
        cnt = cnt.astype(np.int64)
        s = np.empty(R, dtype=np.int64)
        with np.errstate(over="ignore"):
            for j in range(R):
                h = splitmix64(uu.view(np.uint64) + seeds[j])
                sign = 1 - 2 * (h & np.uint64(1)).astype(np.int64)
                s[j] = int(np.dot(sign, cnt))
        return pa.table({"j": pa.array(np.arange(R, dtype=np.int64)),
                         "s": pa.array(s),
                         "n": pa.array(np.full(R, len(u),
                                               dtype=np.int64))})

    def count_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table({"u": pa.array(uu.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64)),
                         "_shard": pa.array(_shard_of_keys(
                             uu.astype(np.int64), n_shards))})

    def shard_sq(g) -> "pd.DataFrame":
        import pandas as pd
        if len(g) == 0:
            return pd.DataFrame({"sq": pd.Series([], dtype=np.int64)})
        tot = g.groupby("u")["c"].sum().to_numpy(np.int64)
        return pd.DataFrame({"sq": [int(np.dot(tot, tot))]})

    sk = (ds.map_batches(sketch_partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas())
    n_rows = 0
    S = np.zeros(R, dtype=np.int64)
    if len(sk) and "j" in sk.columns:
        import pandas as pd
        byj = sk.groupby("j").agg(s=("s", "sum"))
        S[byj.index.to_numpy(np.int64)] = byj["s"].to_numpy(np.int64)
        # n was emitted once per register row; divide by R per batch
        n_rows = int(sk["n"].sum()) // R
    ex = (ds.map_batches(count_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
          .groupby("_shard").map_groups(shard_sq, batch_format="pandas")
          .to_pandas())
    f2_exact = int(ex["sq"].sum()) if len(ex) and "sq" in ex.columns else 0
    sum_sq = int(np.dot(S, S))
    return pa.table({"n_rows": [n_rows], "n_registers": [R],
                     "sum_sq": [sum_sq], "f2_est": [sum_sq // R],
                     "f2_exact": [f2_exact]}, schema=out_schema)

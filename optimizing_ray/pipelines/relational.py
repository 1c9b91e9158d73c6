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

__all__ = ["broadcast_lookup", "sales_by_nation", "bloom_semi_join",
           "pricing_summary", "top_orders"]


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


def sales_by_nation(sf_dir: str) -> pa.Table:
    """Order revenue per customer nation: two broadcast dimension joins +
    in-batch partial aggregation + driver-side merge of the partials.

    The merge side is bounded by nation cardinality (25) x block count,
    so collecting the partials driver-side is O(blocks) tiny rows — a
    native groupby here would pay the full all-to-all Aggregate floor
    (~1-2 s on this VM, round-2 working note) to merge what a single
    pandas groupby folds in microseconds.  At 100-TB scale the shape is
    unchanged: partials stay <= 25 rows per block regardless of fact size."""
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
    pdf = parts.to_pandas()  # <= 25 rows per block
    agg = (pdf.groupby("nation", sort=True)
              .agg(n_orders=("n", "sum"), revenue=("s", "sum")).reset_index())
    return pa.table({
        "nation": pa.array(agg["nation"]),
        "n_orders": pa.array(agg["n_orders"].to_numpy().astype(np.int64)),
        "revenue": pa.array(np.round(agg["revenue"].to_numpy(), 4)),
    })


# --- bloom-prefiltered distributed semi-join --------------------------------

_SM_GOLD = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + _SM_GOLD
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m_bits: int,
                     k_hashes: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (h2 forced odd)."""
    u = keys.astype(np.uint64)
    h1 = _splitmix64(u)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(k_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None])
                % np.uint64(m_bits))


def bloom_semi_join(left: rd.Dataset, right_keys: rd.Dataset, *, on: str,
                    m_bits: int = 1 << 20, k_hashes: int = 4,
                    n_shards: int | None = None,
                    rebundle: int | None = 65536) -> rd.Dataset:
    """Semi-join: left rows whose ``on`` key appears in ``right_keys``
    (a Dataset whose ``on`` values are UNIQUE — dedupe upstream), EXACT
    by construction, bloom-accelerated for scale.

    At 100 TB the key side is too big to broadcast exactly and a full
    shuffle of the left side is the dominant cost; the classic fix is a
    bloom prefilter: (1) one pass over the keys builds per-batch local
    blooms (fixed m_bits/8 bytes each, independent of key count) that
    OR together driver-side and ship once via ray.put; (2) the probe leg
    drops every left row the bloom rejects (no false negatives); (3) ONE
    hash-shard exchange verifies the surviving candidates against the
    true key set, so false positives are eliminated and the result
    equals the plain semi-join bit-for-bit (``oracle``: a plain IN
    subquery) while the shuffle moves only bloom-survivors.  Expected FP
    rate (1 - e^(-k*n/m))^k — <1% up to ~10^5 keys at the defaults;
    size m_bits ~ 10x key count at scale.

    ``rebundle``: the survivors are by design a small fraction of the
    left side, so post-probe blocks are tiny and the exchange would pay
    per-block dispatch on near-empty blocks (measured 3x at sf0.01); a
    cheap identity rebundle over SURVIVORS ONLY (probe keeps per-block
    parallelism) coalesces them before the shuffle."""
    import ray

    from optimizing_ray.pipelines.shard_join import hash_shard_join

    words_len = (m_bits + 63) // 64

    def build(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or on not in t.column_names:
            return pa.table({"bloom": pa.array([], pa.binary())})
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_positions(keys, m_bits, k_hashes).ravel()
        words = np.zeros(words_len, dtype=np.uint64)
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bloom": pa.array([words.tobytes()], pa.binary())})

    parts = right_keys.map_batches(build, batch_format="pyarrow",
                                   zero_copy_batch=True).take_all()
    bloom = np.zeros(words_len, dtype=np.uint64)
    for r in parts:
        bloom |= np.frombuffer(r["bloom"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        from optimizing_ray.broadcast import cached
        if t.num_rows == 0 or on not in t.column_names:
            return t
        w = cached(("bloom", bloom_ref.hex()), lambda: ray.get(bloom_ref))
        keys = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_positions(keys, m_bits, k_hashes)
        hit = ((w[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)).all(axis=1)
        return t.filter(pa.array(hit))

    candidates = left.map_batches(probe, batch_format="pyarrow",
                                  zero_copy_batch=True)
    if rebundle:
        candidates = candidates.map_batches(
            lambda t: t, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=rebundle)
        right_keys = right_keys.map_batches(
            lambda t: t, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=rebundle)
    # schemas are known without peeking (probe is a pure filter; the key
    # side is the single key column) — skip Dataset.schema()'s upstream
    # re-execution
    lschema = left.schema().base_schema
    rschema = pa.schema([(on, lschema.field(on).type)])
    return hash_shard_join(candidates, right_keys, on=on, how="inner",
                           n_shards=n_shards, lschema=lschema,
                           rschema=rschema)


# --- TPC-H Q1 pricing summary (integer-cents exact) -------------------------

def pricing_summary(li: rd.Dataset, *, cutoff: str = "1998-09-02") -> pa.Table:
    """TPC-H Q1 twin: per (returnflag, linestatus) pricing summary over
    lineitem rows shipped on or before ``cutoff``.

    Exactness: every money/rate column is 2-decimal by TPC-H convention,
    so floor(x*100+0.5) cents are exact int64 on both engines; the
    derived sums stay integer (disc_price in 1e-4 dollars, charge in
    1e-6), so parallel partial sums are order-exact — no float rounding
    discipline needed anywhere.  Averages are integer floor-divisions
    (all operands nonnegative; DuckDB twin uses the divisible-
    subtraction form).  Overflow headroom: charge6 <= ~1e11/row, so
    int64 holds ~9e7 rows per PARTIAL (one batch); the driver merge
    re-sums <= 6 rows per block in Python ints via pandas int64 —
    at 100 TB shard the merge by group key first (6 keys — trivial).

    Plan: one streaming pass, per-batch lexsort+reduceat partials
    bounded by the 6 (flag, status) combos, driver merge of <= 6 rows
    per block; zero shuffles (reference relational surface:
    aggregation over scan, SURVEY.md section 2.5).
    """
    cut = np.datetime64(cutoff)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "l_linestatus": pa.array([], pa.string()),
            "sum_qty_c": pa.array([], pa.int64()),
            "sum_base_c": pa.array([], pa.int64()),
            "sum_disc_c": pa.array([], pa.int64()),
            "sum_disc_price4": pa.array([], pa.int64()),
            "sum_charge6": pa.array([], pa.int64()),
            "count_order": pa.array([], pa.int64()),
        })
        if t.num_rows == 0 or "l_shipdate" not in t.column_names:
            return empty
        keep = t["l_shipdate"].to_numpy() <= cut
        if not keep.any():
            return empty
        t = t.filter(pa.array(keep))
        qc = np.floor(t["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        pc = np.floor(t["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        tc = np.floor(t["l_tax"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc_price4 = pc * (100 - dc)
        charge6 = disc_price4 * (100 + tc)
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        stat = t["l_linestatus"].to_numpy(zero_copy_only=False)
        combo = np.char.add(np.char.add(flag.astype("U1"), "|"),
                            stat.astype("U1"))
        uk, inv = np.unique(combo, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uk)))
        out = {"l_returnflag": pa.array([u[0] for u in uk]),
               "l_linestatus": pa.array([u[2] for u in uk])}
        for name, col in (("sum_qty_c", qc), ("sum_base_c", pc),
                          ("sum_disc_c", dc),
                          ("sum_disc_price4", disc_price4),
                          ("sum_charge6", charge6)):
            out[name] = pa.array(np.add.reduceat(col[order], starts))
        out["count_order"] = pa.array(np.diff(
            np.append(starts, len(inv))).astype(np.int64))
        return pa.table(out)

    parts = li.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        agg = pd.DataFrame(columns=["l_returnflag", "l_linestatus",
                                    "sum_qty_c", "sum_base_c", "sum_disc_c",
                                    "sum_disc_price4", "sum_charge6",
                                    "count_order"])
    else:
        agg = (parts.groupby(["l_returnflag", "l_linestatus"], sort=True)
               .sum().reset_index())
    n = agg["count_order"].to_numpy(np.int64) if len(agg) else np.array([], np.int64)
    cols = {"l_returnflag": pa.array(agg["l_returnflag"].astype(str)),
            "l_linestatus": pa.array(agg["l_linestatus"].astype(str))}
    for c in ("sum_qty_c", "sum_base_c", "sum_disc_c", "sum_disc_price4",
              "sum_charge6", "count_order"):
        cols[c] = pa.array(agg[c].to_numpy(np.int64) if len(agg)
                           else np.array([], np.int64))
    for src, dst in (("sum_qty_c", "avg_qty_c"), ("sum_base_c", "avg_price_c"),
                     ("sum_disc_c", "avg_disc_c")):
        s = cols[src].to_numpy(zero_copy_only=False)
        cols[dst] = pa.array(s // n if len(agg) else np.array([], np.int64))
    return pa.table(cols)


# --- TPC-H Q3 shipping-priority twin -----------------------------------------

def top_orders(sf_dir: str, *, segment: str = "BUILDING",
               cutoff: str = "1997-06-15", k: int = 10,
               n_shards: int | None = None) -> pa.Table:
    """TPC-H Q3 twin: the ``k`` unshipped orders with the highest
    outstanding revenue — customers in ``segment``, orders placed before
    ``cutoff``, revenue from lineitems shipped after ``cutoff``.

    Exactness: revenue4 = cents(extendedprice) * (100 - cents(discount))
    is integer 1e-4 dollars (the pricing_summary discipline), so partial
    sums are order-exact; the final order is (revenue4 DESC, o_orderkey)
    — a deterministic composite, so the LIMIT is reproducible.

    Plan (the 100-TB shape): customer is a broadcast dimension (segment
    filter -> sorted custkey array via ray.put); orders prunes to three
    columns at the read, date-filters, semi-joins against the broadcast
    in-batch, and slims to (o_orderkey, o_orderdate_us); lineitem prunes
    to four columns, date-filters, and PRE-AGGREGATES revenue per
    orderkey inside each batch (lexsort+reduceat — ~4 lineitems/order
    fold before the wire).  ONE hash(orderkey) shard exchange then sums
    partials, inner-joins the order side, and keeps only the per-shard
    top ``k`` (revenue ties cannot straddle the cut unseen: the
    composite includes o_orderkey), so the driver merge is <= k rows per
    shard.  Reference analogue: the relational aggregate-over-join
    surface (SURVEY.md section 2.5); SQL twin ``oracle.top_orders_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    cut = np.datetime64(cutoff)

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keep = np.asarray(cust["c_mktsegment"].to_numpy(zero_copy_only=False)
                      == segment)
    cust_keys = np.sort(cust["c_custkey"].to_numpy()[keep])
    cust_ref = ray.put(cust_keys)

    unified = pa.schema([("_side", pa.int8()), ("o_orderkey", pa.int64()),
                         ("_rev4", pa.int64()), ("_odate", pa.int64()),
                         ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        ck = cached(("q3_cust", cust_ref.hex()), lambda: ray.get(cust_ref))
        odate = t["o_orderdate"].to_numpy()
        m = odate < cut
        custs = t["o_custkey"].to_numpy()
        pos = np.searchsorted(ck, custs)
        m &= (pos < len(ck)) & (ck[np.minimum(pos, max(0, len(ck) - 1))]
                                == custs) if len(ck) else False
        okey = t["o_orderkey"].to_numpy()[m]
        n = len(okey)
        return pa.table({
            "_side": pa.array(np.full(n, 1, np.int8)),
            "o_orderkey": pa.array(okey),
            "_rev4": pa.array(np.zeros(n, np.int64)),
            "_odate": pa.array(odate[m].astype("datetime64[us]")
                               .astype(np.int64)),
            "_shard": _shard(okey)}).cast(unified)

    def lineitem_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        m = t["l_shipdate"].to_numpy() > cut
        okey = t["l_orderkey"].to_numpy()[m]
        pc = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        uk, inv = np.unique(okey, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uk)))
        n = len(uk)
        return pa.table({
            "_side": pa.array(np.full(n, 0, np.int8)),
            "o_orderkey": pa.array(uk),
            "_rev4": pa.array(np.add.reduceat(rev[order], starts)
                              if n else np.zeros(0, np.int64)),
            "_odate": pa.array(np.zeros(n, np.int64)),
            "_shard": _shard(uk)}).cast(unified)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]).map_batches(
        lineitem_partial, batch_format="pyarrow", zero_copy_batch=True)

    def shard_topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderkey": np.int64, "o_orderdate_us": np.int64,
                "revenue4": np.int64}
        empty = pd.DataFrame({c: pd.Series([], dtype=t)
                              for c, t in cols.items()})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rev = lf.groupby("o_orderkey", sort=False)["_rev4"].sum()
        rf = g[g["_side"] == 1]
        out = rf[["o_orderkey", "_odate"]].merge(
            rev.rename("revenue4"), on="o_orderkey", how="inner")
        if len(out) == 0:
            return empty
        order = np.lexsort((out["o_orderkey"].to_numpy(),
                            -out["revenue4"].to_numpy()))[:k]
        out = out.iloc[order]
        return pd.DataFrame({
            "o_orderkey": out["o_orderkey"].to_numpy(np.int64),
            "o_orderdate_us": out["_odate"].to_numpy(np.int64),
            "revenue4": out["revenue4"].to_numpy(np.int64)})

    tops = (orders.union(li).groupby("_shard")
            .map_groups(shard_topk, batch_format="pandas")
            .to_pandas())  # <= k rows per shard
    if len(tops) == 0:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_orderdate_us": pa.array([], pa.int64()),
                         "revenue4": pa.array([], pa.int64())})
    order = np.lexsort((tops["o_orderkey"].to_numpy(),
                        -tops["revenue4"].to_numpy()))[:k]
    tops = tops.iloc[order]
    return pa.table({"o_orderkey": pa.array(tops["o_orderkey"].to_numpy(np.int64)),
                     "o_orderdate_us": pa.array(tops["o_orderdate_us"].to_numpy(np.int64)),
                     "revenue4": pa.array(tops["revenue4"].to_numpy(np.int64))})

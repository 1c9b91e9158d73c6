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
           "pricing_summary", "top_orders", "customer_distribution",
           "large_orders", "regional_sales", "sales_rollup",
           "order_priority_check", "churned_high_balance",
           "promo_revenue", "bracket_revenue", "top_supplier",
           "small_qty_revenue", "returned_top_customers", "nation_volume",
           "product_profit", "market_share", "dominant_suppliers",
           "balance_deciles", "slow_suppliers", "forecast_revenue",
           "revenue_trend", "theil_sen", "copurchase_pairs",
           "revenue_gini", "pareto_coverage"]


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

# --- TPC-H Q13 customer-distribution twin ------------------------------------

def customer_distribution(sf_dir: str, *, order_date_min: str | None = None,
                          n_shards: int | None = None) -> pa.Table:
    """TPC-H Q13 twin: the distribution of per-customer order counts —
    how many customers placed exactly c orders, INCLUDING the zero-order
    customers (the left-join subtlety that breaks naive inner-join
    plans).  ``order_date_min`` restricts the counted orders (Q13's
    comment filter stand-in — the driver fixture gives every customer
    an order, so the zero bucket only exists under a filter).  Output
    (c_count, custdist), ordered (custdist DESC, c_count DESC).

    Plan (the 100-TB shape): orders prunes to ONE column at the read
    and pre-aggregates per-batch (custkey, n) partials (lexsort-free
    np.unique — ~10 orders/customer fold before the wire); customer
    prunes to its key.  ONE hash(custkey) side-tag exchange co-locates
    each customer with its count partials; inside the shard the count
    is summed per key and customers absent from orders take 0.  Each
    shard then emits its LOCAL histogram (c_count, custdist) — bounded
    by the distinct count values — so the driver merge is tiny.
    Reference analogue: the relational aggregate-over-join surface
    (SURVEY.md section 2.5); SQL twin ``oracle.customer_distribution_sql``."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    date_min = np.datetime64(order_date_min) if order_date_min else None
    ocols = ["o_custkey"] + (["o_orderdate"] if order_date_min else [])
    unified = pa.schema([("_side", pa.int8()), ("_key", pa.int64()),
                         ("_n", pa.int64()), ("_shard", pa.int64())])

    def orders_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return unified.empty_table()
        if date_min is not None:
            t = t.filter(pa.array(t["o_orderdate"].to_numpy() >= date_min))
        uk, counts = np.unique(t["o_custkey"].to_numpy(), return_counts=True)
        return pa.table({
            "_side": pa.array(np.zeros(len(uk), np.int8)),
            "_key": pa.array(uk),
            "_n": pa.array(counts.astype(np.int64)),
            "_shard": pa.array((uk % n_shards).astype(np.int64))}).cast(unified)

    def customer_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.column_names:
            return unified.empty_table()
        ck = t["c_custkey"].to_numpy().astype(np.int64)
        return pa.table({
            "_side": pa.array(np.ones(len(ck), np.int8)),
            "_key": pa.array(ck),
            "_n": pa.array(np.zeros(len(ck), np.int64)),
            "_shard": pa.array((ck % n_shards).astype(np.int64))}).cast(unified)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=ocols).map_batches(
        orders_partial, batch_format="pyarrow", zero_copy_batch=True)
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"]).map_batches(
        customer_keys, batch_format="pyarrow", zero_copy_batch=True)

    def shard_hist(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"c_count": pd.Series([], dtype=np.int64),
                                 "custdist": pd.Series([], dtype=np.int64)})
        of = g[g["_side"] == 0]
        counts = of.groupby("_key", sort=False)["_n"].sum()
        ck = g.loc[g["_side"] == 1, "_key"].to_numpy()
        c_count = counts.reindex(ck, fill_value=0).to_numpy(np.int64)
        uk, dist = np.unique(c_count, return_counts=True)
        return pd.DataFrame({"c_count": uk.astype(np.int64),
                             "custdist": dist.astype(np.int64)})

    parts = (orders.union(cust).groupby("_shard")
             .map_groups(shard_hist, batch_format="pandas")
             .to_pandas())  # <= distinct-count rows per shard
    if len(parts) == 0:
        return pa.table({"c_count": pa.array([], pa.int64()),
                         "custdist": pa.array([], pa.int64())})
    agg = parts.groupby("c_count", sort=False)["custdist"].sum().reset_index()
    order = np.lexsort((-agg["c_count"].to_numpy(),
                        -agg["custdist"].to_numpy()))
    agg = agg.iloc[order]
    return pa.table({"c_count": pa.array(agg["c_count"].to_numpy(np.int64)),
                     "custdist": pa.array(agg["custdist"].to_numpy(np.int64))})

# --- TPC-H Q18 large-volume-customer twin ------------------------------------

def large_orders(sf_dir: str, *, min_qty: float = 250.0,
                 n_shards: int | None = None) -> pa.Table:
    """TPC-H Q18 twin: orders whose total lineitem quantity exceeds
    ``min_qty``, with the customer name attached.  Output (c_name,
    o_custkey, o_orderkey, o_orderdate_us, o_totalprice_c, sum_qty_c),
    ordered (o_totalprice_c DESC, o_orderkey).

    Exactness: quantities are 2-decimal, so floor(q*100+0.5) cents make
    the HAVING-sum order-exact (pricing_summary discipline); the
    threshold compares integers (min_qty scaled once driver-side).

    Plan (the 100-TB shape): lineitem prunes to two columns and
    pre-aggregates per-batch (orderkey, qty_c) partials (~4 rows/order
    fold before the wire); ONE hash(orderkey) shard exchange sums the
    partials and applies the threshold IN-SHARD, so only qualifying
    orders — a tiny, selectivity-bounded set — reach the driver.  That
    winner set broadcasts (ray.put) to a second pruned pass over orders
    (searchsorted semi-join in-batch), and customer names attach via
    the broadcast dimension lookup.  The final stitch of sum_qty onto
    the <= |winners| order rows is a driver-side searchsorted.
    Reference analogue: aggregate-over-join (SURVEY.md section 2.5);
    SQL twin ``oracle.large_orders_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    min_qty_c = int(np.floor(min_qty * 100.0 + 0.5))

    def li_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"_key": pa.array([], pa.int64()),
                          "_qty_c": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return empty
        okey = t["l_orderkey"].to_numpy()
        qc = np.floor(t["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        uk, inv = np.unique(okey, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, qc)
        return pa.table({"_key": pa.array(uk),
                         "_qty_c": pa.array(sums),
                         "_shard": pa.array((uk % n_shards).astype(np.int64))})

    def shard_winners(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"o_orderkey": pd.Series([], dtype=np.int64),
                                 "sum_qty_c": pd.Series([], dtype=np.int64)})
        sums = g.groupby("_key", sort=False)["_qty_c"].sum()
        win = sums[sums > min_qty_c]
        return pd.DataFrame({"o_orderkey": win.index.to_numpy(np.int64),
                             "sum_qty_c": win.to_numpy(np.int64)})

    winners = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])
               .map_batches(li_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
               .groupby("_shard").map_groups(shard_winners,
                                             batch_format="pandas")
               .to_pandas())  # selectivity-bounded
    empty_out = pa.table({"c_name": pa.array([], pa.string()),
                          "o_custkey": pa.array([], pa.int64()),
                          "o_orderkey": pa.array([], pa.int64()),
                          "o_orderdate_us": pa.array([], pa.int64()),
                          "o_totalprice_c": pa.array([], pa.int64()),
                          "sum_qty_c": pa.array([], pa.int64())})
    # all-empty groups can surface as a column-less frame (Ray Data
    # empty-block schema gotcha) — short-circuit before the probe pass
    if len(winners) == 0 or "o_orderkey" not in winners.columns:
        return empty_out
    wkeys = np.sort(winners["o_orderkey"].to_numpy(np.int64))
    wq = winners.set_index("o_orderkey")["sum_qty_c"]
    win_ref = ray.put(wkeys)

    def orders_semi(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "o_custkey": pa.array([], pa.int64()),
                          "o_orderdate_us": pa.array([], pa.int64()),
                          "o_totalprice_c": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return empty
        wk = cached(("q18_win", win_ref.hex()), lambda: ray.get(win_ref))
        okey = t["o_orderkey"].to_numpy()
        if len(wk) == 0:
            return empty
        pos = np.searchsorted(wk, okey)
        hit = (pos < len(wk)) & (wk[np.minimum(pos, len(wk) - 1)] == okey)
        if not hit.any():
            return empty
        return pa.table({
            "o_orderkey": pa.array(okey[hit]),
            "o_custkey": pa.array(t["o_custkey"].to_numpy()[hit]),
            "o_orderdate_us": pa.array(
                t["o_orderdate"].to_numpy()[hit]
                .astype("datetime64[us]").astype(np.int64)),
            "o_totalprice_c": pa.array(np.floor(
                t["o_totalprice"].to_numpy()[hit] * 100.0
                + 0.5).astype(np.int64))})

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    hits = broadcast_lookup(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_totalprice"])
        .map_batches(orders_semi, batch_format="pyarrow",
                     zero_copy_batch=True),
        cust, fact_key="o_custkey", dim_key="c_custkey",
        value_cols=("c_name",)).to_pandas()  # <= |winners| rows
    if len(hits) == 0:
        return empty_out
    hits["sum_qty_c"] = wq.reindex(hits["o_orderkey"].to_numpy()).to_numpy(np.int64)
    order = np.lexsort((hits["o_orderkey"].to_numpy(),
                        -hits["o_totalprice_c"].to_numpy()))
    hits = hits.iloc[order]
    return pa.table({"c_name": pa.array(hits["c_name"].astype(str)),
                     "o_custkey": pa.array(hits["o_custkey"].to_numpy(np.int64)),
                     "o_orderkey": pa.array(hits["o_orderkey"].to_numpy(np.int64)),
                     "o_orderdate_us": pa.array(hits["o_orderdate_us"].to_numpy(np.int64)),
                     "o_totalprice_c": pa.array(hits["o_totalprice_c"].to_numpy(np.int64)),
                     "sum_qty_c": pa.array(hits["sum_qty_c"].to_numpy(np.int64))})

# --- TPC-H Q5 local-supplier-volume twin -------------------------------------

def regional_sales(sf_dir: str, *, region: str = "ASIA",
                   date_from: str = "1996-01-01",
                   date_to: str = "1997-01-01",
                   n_shards: int | None = None) -> pa.Table:
    """TPC-H Q5 twin: revenue per nation from lineitems where the
    CUSTOMER and the SUPPLIER sit in the same nation of ``region``, for
    orders placed in [date_from, date_to).  Output (n_name, revenue4,
    n_items), revenue in integer 1e-4 dollars (pricing_summary
    discipline — parallel partials order-exact), ordered revenue4 DESC.

    Plan (the 100-TB shape): nation ⋈ region resolves driver-side to a
    <= 25-entry nation set; supplier and customer key→nation maps ride
    ray.put ONCE (sorted-key searchsorted — the small-side broadcast
    rule).  Orders date-filters, attaches the customer nation in-batch
    and drops non-region rows (slim 2-column survivors); lineitem
    attaches the supplier nation in-batch, drops non-region rows, and
    carries integer revenue4.  ONE hash(orderkey) side-tag exchange
    then merges the two legs, applies the SAME-NATION equality
    IN-SHARD, and emits bounded (nation, revenue4, n) partials — the
    driver merge is <= 25 rows per shard.  At larger-than-memory dims,
    swap the broadcasts for hash_shard_join legs (plan-gate by nrows —
    the knn_join discipline).  SQL twin ``oracle.regional_sales_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    d0, d1 = np.datetime64(date_from), np.datetime64(date_to)

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg["r_regionkey"].to_numpy()[
        np.asarray(reg["r_name"].to_numpy(zero_copy_only=False)) == region]
    nmask = np.isin(nation["n_regionkey"].to_numpy(), rkey)
    nat_keys = nation["n_nationkey"].to_numpy()[nmask].astype(np.int64)
    nat_names = np.asarray(
        nation["n_name"].to_numpy(zero_copy_only=False))[nmask]
    order_n = np.argsort(nat_keys)
    nat_keys, nat_names = nat_keys[order_n], nat_names[order_n]

    def _key_map(path: str, key: str, val: str) -> ray.ObjectRef:
        t = pq.read_table(path, columns=[key, val])
        k = t[key].to_numpy().astype(np.int64)
        v = t[val].to_numpy().astype(np.int64)
        o = np.argsort(k)
        return ray.put((k[o], v[o]))

    cust_ref = _key_map(f"{sf_dir}/customer.parquet", "c_custkey",
                        "c_nationkey")
    supp_ref = _key_map(f"{sf_dir}/supplier.parquet", "s_suppkey",
                        "s_nationkey")
    nat_set = np.sort(nat_keys)

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_nat", pa.int64()), ("_rev4", pa.int64()),
                         ("_shard", pa.int64())])

    def _lookup(ref, tag, keys: np.ndarray) -> np.ndarray:
        k, v = cached(("q5_map", tag, ref.hex()), lambda: ray.get(ref))
        pos = np.searchsorted(k, keys)
        hit = (pos < len(k)) & (k[np.minimum(pos, max(0, len(k) - 1))] == keys)
        out = np.where(hit, v[np.minimum(pos, max(0, len(k) - 1))], -1)
        return out.astype(np.int64)

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        od = t["o_orderdate"].to_numpy()
        m = (od >= d0) & (od < d1)
        okey = t["o_orderkey"].to_numpy()[m]
        nat = _lookup(cust_ref, "c", t["o_custkey"].to_numpy()[m])
        keep = np.isin(nat, nat_set)
        okey, nat = okey[keep], nat[keep]
        n = len(okey)
        return pa.table({"_side": pa.array(np.ones(n, np.int8)),
                         "_okey": pa.array(okey),
                         "_nat": pa.array(nat),
                         "_rev4": pa.array(np.zeros(n, np.int64)),
                         "_shard": pa.array((okey % n_shards))}).cast(unified)

    def li_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        nat = _lookup(supp_ref, "s", t["l_suppkey"].to_numpy())
        keep = np.isin(nat, nat_set)
        okey = t["l_orderkey"].to_numpy()[keep]
        pc = np.floor(t["l_extendedprice"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        n = len(okey)
        return pa.table({"_side": pa.array(np.zeros(n, np.int8)),
                         "_okey": pa.array(okey),
                         "_nat": pa.array(nat[keep]),
                         "_rev4": pa.array(pc * (100 - dc)),
                         "_shard": pa.array((okey % n_shards))}).cast(unified)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        li_slim, batch_format="pyarrow", zero_copy_batch=True)

    def shard_partial(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_nat": pd.Series([], dtype=np.int64),
                              "_rev4": pd.Series([], dtype=np.int64),
                              "_n": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        m = lf[["_okey", "_nat", "_rev4"]].merge(
            rf[["_okey", "_nat"]], on="_okey", how="inner",
            suffixes=("", "_c"))
        m = m[m["_nat"] == m["_nat_c"]]
        if len(m) == 0:
            return empty
        agg = m.groupby("_nat", sort=False).agg(
            _rev4=("_rev4", "sum"), _n=("_rev4", "size")).reset_index()
        return pd.DataFrame({"_nat": agg["_nat"].astype(np.int64),
                             "_rev4": agg["_rev4"].astype(np.int64),
                             "_n": agg["_n"].astype(np.int64)})

    parts = (li.union(orders).groupby("_shard")
             .map_groups(shard_partial, batch_format="pandas")
             .to_pandas())  # <= |nations| rows per shard
    if len(parts) == 0 or "_nat" not in parts.columns:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue4": pa.array([], pa.int64()),
                         "n_items": pa.array([], pa.int64())})
    agg = parts.groupby("_nat", sort=False).agg(
        revenue4=("_rev4", "sum"), n_items=("_n", "sum")).reset_index()
    pos = np.searchsorted(nat_keys, agg["_nat"].to_numpy(np.int64))
    names = nat_names[pos]
    order = np.argsort(-agg["revenue4"].to_numpy())
    return pa.table({
        "n_name": pa.array(names[order].astype(str)),
        "revenue4": pa.array(agg["revenue4"].to_numpy(np.int64)[order]),
        "n_items": pa.array(agg["n_items"].to_numpy(np.int64)[order])})

# --- ROLLUP / grouping-sets over (nation, year) ------------------------------

def sales_rollup(sf_dir: str) -> pa.Table:
    """ROLLUP(nation, year) revenue — the grouping-sets surface: order
    revenue at (nation, year), (nation, ALL), (ALL, ALL), in ONE pass:
    the finest level is the only thing computed from data (per-batch
    integer-cents partials bounded by |nations| x |years| per block,
    driver merge — the sales_by_nation shape), and every coarser level
    DERIVES from the merged finest by re-aggregation — at 100 TB the
    rollup costs exactly one scan no matter how many levels.

    Sentinels: coarser levels use n_name = 'ALL' / o_year = -1 instead
    of SQL's ROLLUP NULLs, so the twin (``oracle.sales_rollup_sql``,
    three sentinel-labelled GROUP BYs unioned) compares exactly.
    Output (n_name, o_year, revenue_c, n_orders)."""
    import pyarrow.parquet as pq

    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk = nation["n_nationkey"].to_numpy().astype(np.int64)
    nname = np.asarray(nation["n_name"].to_numpy(zero_copy_only=False))
    norder = np.argsort(nk)
    nk, nname = nk[norder], nname[norder]

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])
    j = broadcast_lookup(orders, customer, fact_key="o_custkey",
                         dim_key="c_custkey", value_cols=("c_nationkey",))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"_nat": pa.array([], pa.int64()),
                          "_year": pa.array([], pa.int64()),
                          "_rev_c": pa.array([], pa.int64()),
                          "_n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "c_nationkey" not in t.column_names:
            return empty
        nat = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        year = (t["o_orderdate"].to_numpy().astype("datetime64[Y]")
                .astype(np.int64) + 1970)
        rev = np.floor(t["o_totalprice"].to_numpy() * 100.0
                       + 0.5).astype(np.int64)
        key = nat * 10_000 + year
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uk), np.int64)
        cnts = np.zeros(len(uk), np.int64)
        np.add.at(sums, inv, rev)
        np.add.at(cnts, inv, 1)
        return pa.table({"_nat": pa.array(uk // 10_000),
                         "_year": pa.array(uk % 10_000),
                         "_rev_c": pa.array(sums), "_n": pa.array(cnts)})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if len(parts) == 0:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "o_year": pa.array([], pa.int64()),
                         "revenue_c": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64())})
    finest = (parts.groupby(["_nat", "_year"], sort=True)
              .agg(revenue_c=("_rev_c", "sum"), n_orders=("_n", "sum"))
              .reset_index())
    by_nat = (finest.groupby("_nat", sort=True)
              .agg(revenue_c=("revenue_c", "sum"),
                   n_orders=("n_orders", "sum")).reset_index())
    total = pd.DataFrame({
        "revenue_c": [finest["revenue_c"].sum()],
        "n_orders": [finest["n_orders"].sum()]})

    def name_of(nat: np.ndarray) -> np.ndarray:
        return nname[np.searchsorted(nk, nat)]

    names = np.r_[name_of(finest["_nat"].to_numpy(np.int64)),
                  name_of(by_nat["_nat"].to_numpy(np.int64)),
                  np.array(["ALL"], dtype=object)]
    years = np.r_[finest["_year"].to_numpy(np.int64),
                  np.full(len(by_nat), -1, np.int64),
                  np.array([-1], np.int64)]
    revs = np.r_[finest["revenue_c"].to_numpy(np.int64),
                 by_nat["revenue_c"].to_numpy(np.int64),
                 total["revenue_c"].to_numpy(np.int64)]
    ns = np.r_[finest["n_orders"].to_numpy(np.int64),
               by_nat["n_orders"].to_numpy(np.int64),
               total["n_orders"].to_numpy(np.int64)]
    return pa.table({"n_name": pa.array(names.astype(str)),
                     "o_year": pa.array(years),
                     "revenue_c": pa.array(revs),
                     "n_orders": pa.array(ns)})


# --- TPC-H Q4 order-priority-check twin --------------------------------------

def order_priority_check(sf_dir: str, *, date_lo: str = "1996-01-01",
                         date_hi: str = "1997-01-01",
                         returnflag: str = "R",
                         n_shards: int | None = None) -> pa.Table:
    """TPC-H Q4 twin: orders placed in [date_lo, date_hi) with at least
    one lineitem flagged ``returnflag`` (the driver lineitem has no
    commit/receipt dates, so the 'late line' EXISTS predicate becomes a
    'returned line' EXISTS — same semi-join shape), counted per
    o_orderpriority.

    Plan: both scans prune to 2-3 columns and filter AT THE READ;
    the lineitem side collapses to per-batch UNIQUE orderkeys (the
    EXISTS only needs membership — ~4 lines/order fold before the
    wire); ONE hash(orderkey) side-tag exchange decides the semi-join
    by sorted membership in-shard and reduces to (priority, n) partials
    — bounded by the 5 priority classes per shard, tiny driver merge.
    SQL twin ``oracle.order_priority_check_sql``."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_prio", pa.string()), ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        od = t["o_orderdate"].to_numpy()
        m = (od >= lo) & (od < hi)
        okey = t["o_orderkey"].to_numpy()[m]
        return pa.table({
            "_side": pa.array(np.ones(len(okey), np.int8)),
            "_okey": pa.array(okey),
            "_prio": t["o_orderpriority"].filter(pa.array(m)),
            "_shard": _shard(okey)}).cast(unified)

    def li_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        m = (t["l_returnflag"].to_numpy(zero_copy_only=False)
             == returnflag)
        okey = np.unique(t["l_orderkey"].to_numpy()[m])
        n = len(okey)
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "_okey": pa.array(okey),
            "_prio": pa.array([""] * n, pa.string()),
            "_shard": _shard(okey)}).cast(unified)

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_slim, batch_format="pyarrow", zero_copy_batch=True)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"]
    ).map_batches(li_keys, batch_format="pyarrow", zero_copy_batch=True)

    def semi_count(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_orderpriority": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        keys = np.unique(g.loc[g["_side"] == 0, "_okey"].to_numpy(np.int64))
        o = g[g["_side"] == 1]
        if len(o) == 0 or len(keys) == 0:
            return empty
        ok = o["_okey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, ok)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ok)
        vc = o.loc[hit, "_prio"].value_counts()
        return pd.DataFrame({"o_orderpriority": vc.index.to_numpy(object),
                             "n": vc.to_numpy(np.int64)})

    parts = (orders.union(li).groupby("_shard")
             .map_groups(semi_count, batch_format="pandas").to_pandas())
    if len(parts) == 0 or "o_orderpriority" not in parts.columns:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "order_count": pa.array([], pa.int64())})
    agg = (parts.groupby("o_orderpriority", sort=True)["n"].sum()
           .astype(np.int64))
    return pa.table({"o_orderpriority": pa.array(agg.index.to_numpy(object),
                                                 pa.string()),
                     "order_count": pa.array(agg.to_numpy(np.int64))})


# --- TPC-H Q22 churned-high-balance twin --------------------------------------

def churned_high_balance(sf_dir: str, *,
                         nations: tuple = (1, 3, 5, 8, 13, 17, 21),
                         cutoff: str = "2000-06-01",
                         n_shards: int | None = None) -> pa.Table:
    """TPC-H Q22 twin: customers in ``nations`` whose balance exceeds
    the average POSITIVE balance of that nation group, with NO orders
    on/after ``cutoff`` (the driver fixture's customers all have
    lifetime orders, so Q22's never-ordered anti-join becomes a
    churned-since anti-join — same shape), aggregated per nation.
    Output (c_nationkey, numcust, totbal_c), nation order.

    Exactness: balances ride integer cents; the above-average gate is
    the division-free cross-multiply bal_c * n_pos > sum_pos_c (the
    integer-cosine-gate discipline), so no float average exists on
    either side.

    Plan: pass 1 reduces customer to per-batch (sum, count) partials of
    positive balances (2 ints per batch, driver-added — the global
    scalar subquery); pass 2 side-tags gated customer rows against
    per-batch UNIQUE recent-order custkeys in ONE hash(custkey)
    exchange, anti-joins by sorted membership in-shard, and emits
    (nation, numcust, totbal_c) partials bounded by the nation list.
    SQL twin ``oracle.churned_high_balance_sql``."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    cut = np.datetime64(cutoff)
    nat = np.sort(np.asarray(nations, np.int64))

    def bal_cents(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        nk = t["c_nationkey"].to_numpy()
        inn = np.isin(nk, nat)
        bal = np.floor(t["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return nk, np.where(inn, bal, np.int64(0)), inn

    def pos_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_acctbal" not in t.column_names:
            return pa.table({"s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        _, bal, inn = bal_cents(t)
        m = inn & (bal > 0)
        return pa.table({"s": pa.array([np.int64(bal[m].sum())]),
                         "n": pa.array([np.int64(m.sum())])})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    partials = (rd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_nationkey", "c_acctbal"])
                .map_batches(pos_partial, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas())
    sum_pos = np.int64(partials["s"].sum()) if len(partials) else np.int64(0)
    n_pos = np.int64(partials["n"].sum()) if len(partials) else np.int64(0)

    unified = pa.schema([("_side", pa.int8()), ("_ck", pa.int64()),
                         ("_nat", pa.int64()), ("_bal", pa.int64()),
                         ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def cust_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.column_names:
            return unified.empty_table()
        nk, bal, inn = bal_cents(t)
        # division-free above-average gate (sum/count never divided)
        m = inn & (bal * n_pos > sum_pos)
        ck = t["c_custkey"].to_numpy()[m]
        return pa.table({
            "_side": pa.array(np.ones(len(ck), np.int8)),
            "_ck": pa.array(ck),
            "_nat": pa.array(nk[m].astype(np.int64)),
            "_bal": pa.array(bal[m]),
            "_shard": _shard(ck)}).cast(unified)

    def recent_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return unified.empty_table()
        m = t["o_orderdate"].to_numpy() >= cut
        ck = np.unique(t["o_custkey"].to_numpy()[m])
        n = len(ck)
        z = np.zeros(n, np.int64)
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "_ck": pa.array(ck), "_nat": pa.array(z), "_bal": pa.array(z),
            "_shard": _shard(ck)}).cast(unified)

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=cust_cols).map_batches(
        cust_slim, batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"]
                             ).map_batches(
        recent_keys, batch_format="pyarrow", zero_copy_batch=True)

    def anti_agg(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"c_nationkey": pd.Series([], dtype=np.int64),
                              "numcust": pd.Series([], dtype=np.int64),
                              "totbal_c": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        keys = np.unique(g.loc[g["_side"] == 0, "_ck"].to_numpy(np.int64))
        c = g[g["_side"] == 1]
        if len(c) == 0:
            return empty
        ck = c["_ck"].to_numpy(np.int64)
        if len(keys):
            pos = np.searchsorted(keys, ck)
            hit = ((pos < len(keys))
                   & (keys[np.minimum(pos, len(keys) - 1)] == ck))
        else:
            hit = np.zeros(len(ck), bool)
        c = c[~hit]
        if len(c) == 0:
            return empty
        gg = c.groupby("_nat", sort=True)
        return pd.DataFrame({
            "c_nationkey": gg.size().index.to_numpy(np.int64),
            "numcust": gg.size().to_numpy(np.int64),
            "totbal_c": gg["_bal"].sum().to_numpy(np.int64)})

    parts = (cust.union(orders).groupby("_shard")
             .map_groups(anti_agg, batch_format="pandas").to_pandas())
    if len(parts) == 0 or "c_nationkey" not in parts.columns:
        return pa.table({"c_nationkey": pa.array([], pa.int64()),
                         "numcust": pa.array([], pa.int64()),
                         "totbal_c": pa.array([], pa.int64())})
    agg = parts.groupby("c_nationkey", sort=True).sum()
    return pa.table({
        "c_nationkey": pa.array(agg.index.to_numpy(np.int64)),
        "numcust": pa.array(agg["numcust"].to_numpy(np.int64)),
        "totbal_c": pa.array(agg["totbal_c"].to_numpy(np.int64))})


# --- TPC-H Q14 promo-revenue twin ---------------------------------------------

def promo_revenue(sf_dir: str, *, date_from: str = "1997-09-01",
                  date_to: str = "1997-10-01",
                  promo_type: str = "PROMO") -> pa.Table:
    """TPC-H Q14 twin: the share of revenue earned by ``promo_type``
    parts among lineitems shipped in [date_from, date_to).  One row:
    (promo_rev4, total_rev4, promo_share6).

    Exactness: revenue4 is the integer 1e-4-dollar discipline
    (pricing_summary), so both sums are order-exact; the share is ONE
    floor division promo*1e6 // total computed in arbitrary-precision
    Python ints on the driver (DuckDB twin sums to HUGEINT and uses the
    divisible-subtraction floor) — no float ratio on either side.

    Plan (the 100-TB shape): part collapses to a broadcast sorted
    promo-partkey array plus the sorted all-partkey array (inner-join
    semantics: lines with unknown parts drop on both engines); lineitem
    prunes to four columns, date-filters, and reduces each batch to ONE
    (promo_rev4, total_rev4) partial row — zero shuffles, driver adds
    O(blocks) pairs.  SQL twin ``oracle.promo_revenue_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    promo = (part["p_type"].to_numpy(zero_copy_only=False)
             == promo_type)[order]
    ref = ray.put({"pk": pk[order], "promo": promo})

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"p4": pa.array([], pa.int64()),
                          "t4": pa.array([], pa.int64())})
        if t.num_rows == 0 or "l_shipdate" not in t.column_names:
            return empty
        sd = t["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        if not m.any():
            return empty
        d = cached(("q14_part", ref.hex()), lambda: ray.get(ref))
        lk = t["l_partkey"].to_numpy()[m]
        pos = np.searchsorted(d["pk"], lk)
        hit = ((pos < len(d["pk"]))
               & (d["pk"][np.minimum(pos, max(0, len(d["pk"]) - 1))] == lk)
               if len(d["pk"]) else np.zeros(len(lk), bool))
        pc = np.floor(t["l_extendedprice"].to_numpy()[m][hit] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[m][hit] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        isp = d["promo"][pos[hit]]
        return pa.table({"p4": pa.array([np.int64(rev[isp].sum())]),
                         "t4": pa.array([np.int64(rev.sum())])})

    parts = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])
             .map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    p4 = int(parts["p4"].sum()) if len(parts) else 0
    t4 = int(parts["t4"].sum()) if len(parts) else 0
    share6 = (p4 * 1_000_000) // t4 if t4 else 0
    return pa.table({"promo_rev4": pa.array([p4], pa.int64()),
                     "total_rev4": pa.array([t4], pa.int64()),
                     "promo_share6": pa.array([share6], pa.int64())})


# --- TPC-H Q19 disjunctive-bracket revenue twin --------------------------------

DEFAULT_BRACKETS = (("Brand#12", 1, 5, 1, 11),
                    ("Brand#23", 1, 10, 10, 20),
                    ("Brand#24", 1, 15, 20, 30))


def bracket_revenue(sf_dir: str,
                    brackets: tuple = DEFAULT_BRACKETS) -> pa.Table:
    """TPC-H Q19 twin: revenue from lineitems matching ANY of the
    (brand, size_lo..size_hi, qty_lo..qty_hi) brackets — the canonical
    disjunctive multi-table predicate (the driver part table has no
    container column, so the container list becomes the size range).
    One row: (revenue4, n_lines).

    Plan: part collapses to a broadcast sorted partkey array plus a
    per-part uint8 bracket BITMASK (brand+size are part-side — decided
    once per part, not per line); each lineitem batch looks the mask up
    by searchsorted, tests the qty range per bracket on integer cents,
    and keeps rows where mask AND qty-bracket intersect; ONE
    (revenue4, n) partial row per batch, zero shuffles.  SQL twin
    ``oracle.bracket_revenue_sql`` (the literal OR form)."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part["p_partkey"].to_numpy()
    order = np.argsort(pk)
    brand = part["p_brand"].to_numpy(zero_copy_only=False)[order]
    size = part["p_size"].to_numpy()[order]
    mask = np.zeros(len(pk), np.uint8)
    for b, (br, slo, shi, _, _) in enumerate(brackets):
        mask |= np.where((brand == br) & (size >= slo) & (size <= shi),
                         np.uint8(1 << b), np.uint8(0))
    ref = ray.put({"pk": pk[order], "mask": mask})
    qlo = np.array([b[3] * 100 for b in brackets], np.int64)
    qhi = np.array([b[4] * 100 for b in brackets], np.int64)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"r4": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return empty
        d = cached(("q19_part", ref.hex()), lambda: ray.get(ref))
        lk = t["l_partkey"].to_numpy()
        pos = np.searchsorted(d["pk"], lk)
        hit = ((pos < len(d["pk"]))
               & (d["pk"][np.minimum(pos, max(0, len(d["pk"]) - 1))] == lk)
               if len(d["pk"]) else np.zeros(len(lk), bool))
        m = d["mask"][np.minimum(pos, max(0, len(d["pk"]) - 1))]
        m = np.where(hit, m, np.uint8(0))
        qc = np.floor(t["l_quantity"].to_numpy() * 100.0
                      + 0.5).astype(np.int64)
        qin = (qc[:, None] >= qlo[None, :]) & (qc[:, None] <= qhi[None, :])
        bits = (m[:, None] >> np.arange(len(brackets), dtype=np.uint8)) & 1
        keep = (qin & bits.astype(bool)).any(axis=1)
        if not keep.any():
            return empty
        pc = np.floor(t["l_extendedprice"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        return pa.table({"r4": pa.array([np.int64(rev.sum())]),
                         "n": pa.array([np.int64(keep.sum())])})

    parts = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_quantity",
                                      "l_extendedprice", "l_discount"])
             .map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    r4 = int(parts["r4"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return pa.table({"revenue4": pa.array([r4], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


# --- TPC-H Q15 top-supplier twin ------------------------------------------------

def top_supplier(sf_dir: str, *, date_from: str = "1996-01-01",
                 date_to: str = "1996-04-01") -> pa.Table:
    """TPC-H Q15 twin: the supplier(s) with the maximum revenue from
    lineitems shipped in [date_from, date_to) — Q15's view + scalar-max
    equality, so REVENUE TIES ALL SURVIVE (integer revenue4 makes the
    tie test exact; no float max anywhere).

    Plan: lineitem prunes to four columns, date-filters, and reduces
    each batch to (suppkey, rev4) partials via lexsort+reduceat —
    bounded by the distinct suppliers per batch; the driver merge is
    O(blocks x suppliers-per-batch) and the supplier name attach is a
    local read of the tiny dimension.  At a supplier cardinality where
    the driver merge matters, the same partials feed ONE hash(suppkey)
    exchange with per-shard (max + ties) before a <= ties-per-shard
    merge — shape documented, not needed at TPC-H supplier scale
    (10k x sf).  SQL twin ``oracle.top_supplier_sql``."""
    import pyarrow.parquet as pq

    lo, hi = np.datetime64(date_from), np.datetime64(date_to)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"sk": pa.array([], pa.int64()),
                          "r4": pa.array([], pa.int64())})
        if t.num_rows == 0 or "l_shipdate" not in t.column_names:
            return empty
        sd = t["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        if not m.any():
            return empty
        sk = t["l_suppkey"].to_numpy()[m]
        pc = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        uk, inv = np.unique(sk, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uk)))
        return pa.table({"sk": pa.array(uk),
                         "r4": pa.array(np.add.reduceat(rev[order], starts)
                                        if len(uk) else np.zeros(0, np.int64))})

    parts = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_suppkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])
             .map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "total_rev4": pa.array([], pa.int64())})
    if len(parts) == 0:
        return empty
    tot = parts.groupby("sk", sort=True)["r4"].sum()
    mt = tot.max()
    win = tot[tot == mt]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    skey = supp["s_suppkey"].to_numpy()
    order = np.argsort(skey)
    skey, snames = skey[order], supp["s_name"].to_numpy(
        zero_copy_only=False)[order]
    wk = win.index.to_numpy(np.int64)
    pos = np.searchsorted(skey, wk)
    hit = ((pos < len(skey))
           & (skey[np.minimum(pos, max(0, len(skey) - 1))] == wk)
           if len(skey) else np.zeros(len(wk), bool))
    wk, wv = wk[hit], win.to_numpy(np.int64)[hit]
    return pa.table({"s_suppkey": pa.array(wk),
                     "s_name": pa.array(snames[pos[hit]], pa.string()),
                     "total_rev4": pa.array(wv)})


# --- TPC-H Q17 small-quantity revenue twin --------------------------------------

def small_qty_revenue(sf_dir: str, *, brand: str = "Brand#12",
                      max_size: int = 25, frac_den: int = 5,
                      n_shards: int | None = None) -> pa.Table:
    """TPC-H Q17 twin: revenue from lineitems of ``brand`` parts (size
    <= ``max_size`` stands in for the container list) whose quantity is
    below 1/``frac_den`` of that part's average quantity — the
    correlated per-group scalar-subquery shape.  One row:
    (sum_price_c, n_lines, avg_yearly_c = sum_price_c // 7).

    Exactness: the gate qty < avg/frac_den is the division-free integer
    cross-multiply frac_den * qty_c * n < sum_qty_c (strict — no float
    average on either side); the /7 is ONE floor division of a
    nonnegative driver-side total.

    Plan: part collapses to a broadcast sorted eligible-partkey array;
    lineitem filters to eligible parts AT THE BATCH (selectivity
    ~1/brand-count before any wire) and slims to (partkey, qty_c,
    price_c); ONE hash(partkey) exchange co-locates each part's lines,
    the in-shard gate is a lexsort + reduceat (per-part sum/count,
    gather back by group id), and each shard emits ONE (sum, n) partial.
    SQL twin ``oracle.small_qty_revenue_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    el = ((part["p_brand"].to_numpy(zero_copy_only=False) == brand)
          & (part["p_size"].to_numpy() <= max_size))
    keys = np.sort(part["p_partkey"].to_numpy()[el])
    ref = ray.put(keys)

    slim_schema = pa.schema([("_pk", pa.int64()), ("_qc", pa.int64()),
                             ("_pc", pa.int64()), ("_shard", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return slim_schema.empty_table()
        ek = cached(("q17_part", ref.hex()), lambda: ray.get(ref))
        lk = t["l_partkey"].to_numpy()
        pos = np.searchsorted(ek, lk)
        m = ((pos < len(ek))
             & (ek[np.minimum(pos, max(0, len(ek) - 1))] == lk)
             if len(ek) else np.zeros(len(lk), bool))
        if not m.any():
            return slim_schema.empty_table()
        pk = lk[m]
        qc = np.floor(t["l_quantity"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        pc = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        with np.errstate(over="ignore"):
            h = pk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({"_pk": pa.array(pk), "_qc": pa.array(qc),
                         "_pc": pa.array(pc),
                         "_shard": pa.array(((h >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))})

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        pk = g["_pk"].to_numpy(np.int64)
        qc = g["_qc"].to_numpy(np.int64)
        pc = g["_pc"].to_numpy(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, qc, pc = pk[order], qc[order], pc[order]
        starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        lens = np.diff(np.r_[starts, len(pk)])
        sums = np.add.reduceat(qc, starts)
        gid = np.cumsum(np.r_[0, pk[1:] != pk[:-1]])
        keep = frac_den * qc * lens[gid] < sums[gid]
        return pd.DataFrame({"s": [np.int64(pc[keep].sum())],
                             "n": [np.int64(keep.sum())]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"]).map_batches(
        slim, batch_format="pyarrow", zero_copy_batch=True)
    parts = (li.groupby("_shard").map_groups(gate, batch_format="pandas")
             .to_pandas())
    s = int(parts["s"].sum()) if len(parts) and "s" in parts.columns else 0
    n = int(parts["n"].sum()) if len(parts) and "n" in parts.columns else 0
    return pa.table({"sum_price_c": pa.array([s], pa.int64()),
                     "n_lines": pa.array([n], pa.int64()),
                     "avg_yearly_c": pa.array([s // 7], pa.int64())})


# --- TPC-H Q10 returned-item top-customers twin -----------------------------------

def returned_top_customers(sf_dir: str, *, date_from: str = "1997-01-01",
                           date_to: str = "1997-04-01",
                           returnflag: str = "R", k: int = 20,
                           n_shards: int | None = None) -> pa.Table:
    """TPC-H Q10 twin: the ``k`` customers who lost the most revenue to
    returned lines among orders placed in [date_from, date_to), with
    name / balance / nation attached.  Order (revenue4 DESC, c_custkey)
    — deterministic, so the LIMIT is reproducible.

    Plan (the re-key shape Q3 doesn't exercise): orders date-filters at
    the scan and slims to (orderkey, custkey); lineitem filters to
    ``returnflag`` and PRE-AGGREGATES rev4 per orderkey in-batch; ONE
    hash(orderkey) side-tag exchange joins them into (custkey, rev4)
    partials; a SECOND hash(custkey) exchange sums per customer and
    keeps the per-shard top ``k`` on the composite — the driver merges
    <= k rows per shard and attaches the customer/nation attributes
    with one local dimension read (k rows).  SQL twin
    ``oracle.returned_top_customers_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    lo, hi = np.datetime64(date_from), np.datetime64(date_to)

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_val", pa.int64()), ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        od = t["o_orderdate"].to_numpy()
        m = (od >= lo) & (od < hi)
        okey = t["o_orderkey"].to_numpy()[m]
        return pa.table({
            "_side": pa.array(np.ones(len(okey), np.int8)),
            "_okey": pa.array(okey),
            "_val": pa.array(t["o_custkey"].to_numpy()[m].astype(np.int64)),
            "_shard": _shard(okey)}).cast(unified)

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        m = (t["l_returnflag"].to_numpy(zero_copy_only=False) == returnflag)
        okey = t["l_orderkey"].to_numpy()[m]
        pc = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        uk, inv = np.unique(okey, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uk)))
        return pa.table({
            "_side": pa.array(np.zeros(len(uk), np.int8)),
            "_okey": pa.array(uk),
            "_val": pa.array(np.add.reduceat(rev[order], starts)
                             if len(uk) else np.zeros(0, np.int64)),
            "_shard": _shard(uk)}).cast(unified)

    def join_rekey(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_ck": pd.Series([], dtype=np.int64),
                              "_rev": pd.Series([], dtype=np.int64),
                              "_shard2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        j = rf[["_okey", "_val"]].merge(
            lf[["_okey", "_val"]].rename(columns={"_val": "_rev"}),
            on="_okey", how="inner")
        if len(j) == 0:
            return empty
        ck = j["_val"].to_numpy(np.int64)
        with np.errstate(over="ignore"):
            h = ck.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pd.DataFrame({
            "_ck": ck, "_rev": j["_rev"].to_numpy(np.int64),
            "_shard2": ((h >> np.uint64(33)) % np.uint64(n_shards))
            .astype(np.int64)})

    def cust_topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                              "revenue4": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        tot = g.groupby("_ck", sort=False)["_rev"].sum()
        ck = tot.index.to_numpy(np.int64)
        rv = tot.to_numpy(np.int64)
        order = np.lexsort((ck, -rv))[:k]
        return pd.DataFrame({"c_custkey": ck[order],
                             "revenue4": rv[order]})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag",
                                  "l_extendedprice", "l_discount"]
                         ).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True)

    tops = (orders.union(li)
            .groupby("_shard").map_groups(join_rekey,
                                          batch_format="pandas")
            .groupby("_shard2").map_groups(cust_topk,
                                           batch_format="pandas")
            .to_pandas())  # <= k rows per shard
    empty = pa.table({"c_custkey": pa.array([], pa.int64()),
                      "c_name": pa.array([], pa.string()),
                      "revenue4": pa.array([], pa.int64()),
                      "c_acctbal_c": pa.array([], pa.int64()),
                      "n_name": pa.array([], pa.string())})
    if len(tops) == 0 or "c_custkey" not in tops.columns:
        return empty
    order = np.lexsort((tops["c_custkey"].to_numpy(np.int64),
                        -tops["revenue4"].to_numpy(np.int64)))[:k]
    tops = tops.iloc[order]
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = (tops.merge(cust, on="c_custkey", how="inner")
           .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    order = np.lexsort((out["c_custkey"].to_numpy(np.int64),
                        -out["revenue4"].to_numpy(np.int64)))
    out = out.iloc[order]
    return pa.table({
        "c_custkey": pa.array(out["c_custkey"].to_numpy(np.int64)),
        "c_name": pa.array(out["c_name"].to_numpy(object), pa.string()),
        "revenue4": pa.array(out["revenue4"].to_numpy(np.int64)),
        "c_acctbal_c": pa.array(np.floor(out["c_acctbal"].to_numpy()
                                         * 100.0 + 0.5).astype(np.int64)),
        "n_name": pa.array(out["n_name"].to_numpy(object), pa.string())})


# --- TPC-H Q7 nation-pair volume twin ----------------------------------------------

def nation_volume(sf_dir: str, *, nat_a: int = 2, nat_b: int = 3,
                  date_from: str = "1996-01-01",
                  date_to: str = "1998-01-01",
                  n_shards: int | None = None) -> pa.Table:
    """TPC-H Q7 twin: shipping volume between supplier nation and
    customer nation for the (nat_a, nat_b) pair, both directions, per
    ship year.  Output (supp_nation, cust_nation, l_year, revenue4)
    ordered by the three keys.

    Plan: supplier and customer key→nationkey maps ride ray.put once
    (the regional_sales discipline); lineitem date-filters at the scan,
    keeps supplier-nation ∈ {a,b} rows only, and PRE-AGGREGATES rev4
    per (orderkey, snat, year) in-batch; orders slims to
    (orderkey, cnat ∈ {a,b}); ONE hash(orderkey) side-tag exchange
    joins them, applies the cross-pair predicate (snat != cnat) in-
    shard, and reduces to (snat, cnat, year, rev4) partials bounded by
    2 x years per shard — tiny driver merge.  SQL twin
    ``oracle.nation_volume_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    lo, hi = np.datetime64(date_from), np.datetime64(date_to)
    pair = {nat_a, nat_b}

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    so = np.argsort(supp["s_suppkey"].to_numpy())
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put({
        "sk": supp["s_suppkey"].to_numpy()[so],
        "sn": supp["s_nationkey"].to_numpy()[so].astype(np.int64),
        "ck": cust["c_custkey"].to_numpy()[co],
        "cn": cust["c_nationkey"].to_numpy()[co].astype(np.int64)})

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_nat", pa.int64()), ("_year", pa.int64()),
                         ("_rev", pa.int64()), ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def _lookup(keys: np.ndarray, sk: np.ndarray,
                sv: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if len(sk) == 0:
            return (np.zeros(len(keys), bool),
                    np.zeros(len(keys), sv.dtype))
        pos = np.searchsorted(sk, keys)
        hit = (pos < len(sk)) & (sk[np.minimum(pos, len(sk) - 1)] == keys)
        return hit, sv[np.minimum(pos, len(sk) - 1)]

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        d = cached(("q7_dims", ref.hex()), lambda: ray.get(ref))
        sd = t["l_shipdate"].to_numpy()
        m = (sd >= lo) & (sd < hi)
        hit, sn = _lookup(t["l_suppkey"].to_numpy(), d["sk"], d["sn"])
        m &= hit & np.isin(sn, list(pair))
        if not m.any():
            return unified.empty_table()
        okey = t["l_orderkey"].to_numpy()[m]
        sn = sn[m]
        yr = sd[m].astype("datetime64[Y]").astype(np.int64) + 1970
        pc = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[m] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc * (100 - dc)
        key = np.stack([okey, sn, yr])
        order = np.lexsort(key)
        okey, sn, yr, rev = okey[order], sn[order], yr[order], rev[order]
        new = np.r_[True, (okey[1:] != okey[:-1]) | (sn[1:] != sn[:-1])
                    | (yr[1:] != yr[:-1])]
        starts = np.flatnonzero(new)
        n = len(starts)
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "_okey": pa.array(okey[starts]),
            "_nat": pa.array(sn[starts]),
            "_year": pa.array(yr[starts]),
            "_rev": pa.array(np.add.reduceat(rev, starts)),
            "_shard": _shard(okey[starts])}).cast(unified)

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        d = cached(("q7_dims", ref.hex()), lambda: ray.get(ref))
        hit, cn = _lookup(t["o_custkey"].to_numpy(), d["ck"], d["cn"])
        m = hit & np.isin(cn, list(pair))
        okey = t["o_orderkey"].to_numpy()[m]
        n = len(okey)
        z = np.zeros(n, np.int64)
        return pa.table({
            "_side": pa.array(np.ones(n, np.int8)),
            "_okey": pa.array(okey), "_nat": pa.array(cn[m]),
            "_year": pa.array(z), "_rev": pa.array(z),
            "_shard": _shard(okey)}).cast(unified)

    def join_agg(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"supp_nation": pd.Series([], dtype=np.int64),
                              "cust_nation": pd.Series([], dtype=np.int64),
                              "l_year": pd.Series([], dtype=np.int64),
                              "revenue4": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        j = lf[["_okey", "_nat", "_year", "_rev"]].merge(
            rf[["_okey", "_nat"]].rename(columns={"_nat": "_cnat"}),
            on="_okey", how="inner")
        j = j[j["_nat"].to_numpy() != j["_cnat"].to_numpy()]
        if len(j) == 0:
            return empty
        gg = j.groupby(["_nat", "_cnat", "_year"], sort=True)["_rev"].sum()
        idx = gg.index.to_frame(index=False)
        return pd.DataFrame({
            "supp_nation": idx["_nat"].to_numpy(np.int64),
            "cust_nation": idx["_cnat"].to_numpy(np.int64),
            "l_year": idx["_year"].to_numpy(np.int64),
            "revenue4": gg.to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"]
                         ).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"]
                             ).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)

    parts = (li.union(orders).groupby("_shard")
             .map_groups(join_agg, batch_format="pandas").to_pandas())
    if len(parts) == 0 or "supp_nation" not in parts.columns:
        return pa.table({"supp_nation": pa.array([], pa.int64()),
                         "cust_nation": pa.array([], pa.int64()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue4": pa.array([], pa.int64())})
    agg = (parts.groupby(["supp_nation", "cust_nation", "l_year"],
                         sort=True)["revenue4"].sum())
    idx = agg.index.to_frame(index=False)
    return pa.table({
        "supp_nation": pa.array(idx["supp_nation"].to_numpy(np.int64)),
        "cust_nation": pa.array(idx["cust_nation"].to_numpy(np.int64)),
        "l_year": pa.array(idx["l_year"].to_numpy(np.int64)),
        "revenue4": pa.array(agg.to_numpy(np.int64))})


# --- TPC-H Q9 product-profit twin ----------------------------------------------

def product_profit(sf_dir: str, *, name_substr: str = "red",
                   n_shards: int | None = None) -> pa.Table:
    """TPC-H Q9 twin: profit per (supplier nation, order year) from
    lineitems of parts whose name contains ``name_substr`` — profit4 =
    extendedprice*(1-discount) - retailprice*quantity in integer 1e-4
    dollars (the driver schema has no partsupp, so p_retailprice stands
    in for ps_supplycost; same join tree shape otherwise).

    Plan: part filters driver-side to a broadcast (partkey -> cost
    basis) map and supplier to (suppkey -> nation); lineitem prunes to
    six columns, keeps matching parts AT THE BATCH, and PRE-AGGREGATES
    profit4 per (orderkey, nation) in-batch; orders slims to
    (orderkey, year); ONE hash(orderkey) side-tag exchange joins them
    into (nation, year, profit4) partials bounded by nations x years —
    tiny driver merge.  SQL twin ``oracle.product_profit_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_retailprice"])
    import pyarrow.compute as pc
    m = pc.match_substring(part["p_name"], name_substr).to_numpy(
        zero_copy_only=False)
    pk = part["p_partkey"].to_numpy()[m]
    order = np.argsort(pk)
    rpc = np.floor(part["p_retailprice"].to_numpy()[m][order] * 100.0
                   + 0.5).astype(np.int64)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    so = np.argsort(supp["s_suppkey"].to_numpy())
    ref = ray.put({"pk": pk[order], "rpc": rpc,
                   "sk": supp["s_suppkey"].to_numpy()[so],
                   "sn": supp["s_nationkey"].to_numpy()[so]
                   .astype(np.int64)})

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_nat", pa.int64()), ("_p4", pa.int64()),
                         ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def _lk(keys, sk, sv):
        if len(sk) == 0:
            return (np.zeros(len(keys), bool),
                    np.zeros(len(keys), sv.dtype))
        pos = np.searchsorted(sk, keys)
        hit = (pos < len(sk)) & (sk[np.minimum(pos, len(sk) - 1)] == keys)
        return hit, sv[np.minimum(pos, len(sk) - 1)]

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        d = cached(("q9_dims", ref.hex()), lambda: ray.get(ref))
        hit, cost = _lk(t["l_partkey"].to_numpy(), d["pk"], d["rpc"])
        if not hit.any():
            return unified.empty_table()
        shit, sn = _lk(t["l_suppkey"].to_numpy()[hit], d["sk"], d["sn"])
        keep = np.flatnonzero(hit)[shit]
        cost, sn = cost[hit][shit], sn[shit]
        okey = t["l_orderkey"].to_numpy()[keep]
        pc_ = np.floor(t["l_extendedprice"].to_numpy()[keep] * 100.0
                       + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        qc = np.floor(t["l_quantity"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        p4 = pc_ * (100 - dc) - cost * qc
        key = np.stack([okey, sn])
        o = np.lexsort(key)
        okey, sn, p4 = okey[o], sn[o], p4[o]
        new = np.r_[True, (okey[1:] != okey[:-1]) | (sn[1:] != sn[:-1])]
        starts = np.flatnonzero(new)
        n = len(starts)
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "_okey": pa.array(okey[starts]),
            "_nat": pa.array(sn[starts]),
            "_p4": pa.array(np.add.reduceat(p4, starts)),
            "_shard": _shard(okey[starts])}).cast(unified)

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        okey = t["o_orderkey"].to_numpy()
        yr = (t["o_orderdate"].to_numpy().astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        return pa.table({
            "_side": pa.array(np.ones(len(okey), np.int8)),
            "_okey": pa.array(okey), "_nat": pa.array(yr),
            "_p4": pa.array(np.zeros(len(okey), np.int64)),
            "_shard": _shard(okey)}).cast(unified)

    def join_agg(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"s_nationkey": pd.Series([], dtype=np.int64),
                              "o_year": pd.Series([], dtype=np.int64),
                              "profit4": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        j = lf[["_okey", "_nat", "_p4"]].merge(
            rf[["_okey", "_nat"]].rename(columns={"_nat": "_yr"}),
            on="_okey", how="inner")
        if len(j) == 0:
            return empty
        gg = j.groupby(["_nat", "_yr"], sort=True)["_p4"].sum()
        idx = gg.index.to_frame(index=False)
        return pd.DataFrame({"s_nationkey": idx["_nat"].to_numpy(np.int64),
                             "o_year": idx["_yr"].to_numpy(np.int64),
                             "profit4": gg.to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount"]).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"]
                             ).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)

    parts = (li.union(orders).groupby("_shard")
             .map_groups(join_agg, batch_format="pandas").to_pandas())
    if len(parts) == 0 or "s_nationkey" not in parts.columns:
        return pa.table({"s_nationkey": pa.array([], pa.int64()),
                         "o_year": pa.array([], pa.int64()),
                         "profit4": pa.array([], pa.int64())})
    agg = (parts.groupby(["s_nationkey", "o_year"], sort=True)["profit4"]
           .sum())
    idx = agg.index.to_frame(index=False)
    return pa.table({
        "s_nationkey": pa.array(idx["s_nationkey"].to_numpy(np.int64)),
        "o_year": pa.array(idx["o_year"].to_numpy(np.int64)),
        "profit4": pa.array(agg.to_numpy(np.int64))})


# --- TPC-H Q8 market-share twin --------------------------------------------------

def market_share(sf_dir: str, *, target_nation: int = 3,
                 region: str = "ASIA", part_type: str = "ECONOMY",
                 n_shards: int | None = None) -> pa.Table:
    """TPC-H Q8 twin: the ``target_nation`` suppliers' share of
    ``part_type`` revenue sold to ``region`` customers, per order year.
    Output (o_year, total_rev4, nation_rev4, share6) — the share is ONE
    floor division nation*1e6 // total per year in arbitrary-precision
    driver ints (HUGEINT divisible-subtraction twin); both revenue
    columns stay integer so the numerator/denominator are order-exact.

    Plan: three broadcast maps (matching partkeys; suppkey -> is-target
    flag; custkey -> is-in-region flag, nation⋈region resolved
    driver-side over <= 25 keys); lineitem filters parts at the batch
    and pre-aggregates (orderkey, flag) rev4 partials; orders slims to
    (orderkey, year) for in-region customers; ONE hash(orderkey)
    side-tag exchange joins them into per-year (total, nation) partials
    bounded by the year count.  SQL twin ``oracle.market_share_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pm = (part["p_type"].to_numpy(zero_copy_only=False) == part_type)
    pk = np.sort(part["p_partkey"].to_numpy()[pm])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    so = np.argsort(supp["s_suppkey"].to_numpy())
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rkeys = reg["r_regionkey"].to_numpy()[
        reg["r_name"].to_numpy(zero_copy_only=False) == region]
    in_reg_nat = np.sort(nat["n_nationkey"].to_numpy()[
        np.isin(nat["n_regionkey"].to_numpy(), rkeys)])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cm = np.isin(cust["c_nationkey"].to_numpy(), in_reg_nat)
    ck = np.sort(cust["c_custkey"].to_numpy()[cm])
    ref = ray.put({"pk": pk,
                   "sk": supp["s_suppkey"].to_numpy()[so],
                   "st": (supp["s_nationkey"].to_numpy()[so]
                          == target_nation),
                   "ck": ck})

    unified = pa.schema([("_side", pa.int8()), ("_okey", pa.int64()),
                         ("_flag", pa.int64()), ("_rev", pa.int64()),
                         ("_shard", pa.int64())])

    def _shard(key: np.ndarray) -> pa.Array:
        with np.errstate(over="ignore"):
            h = key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                        .astype(np.int64))

    def _member(keys, sk):
        if len(sk) == 0:
            return np.zeros(len(keys), bool), np.zeros(len(keys), np.int64)
        pos = np.searchsorted(sk, keys)
        safe = np.minimum(pos, len(sk) - 1)
        return (pos < len(sk)) & (sk[safe] == keys), safe

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return unified.empty_table()
        d = cached(("q8_dims", ref.hex()), lambda: ray.get(ref))
        hit, _ = _member(t["l_partkey"].to_numpy(), d["pk"])
        if not hit.any():
            return unified.empty_table()
        shit, spos = _member(t["l_suppkey"].to_numpy()[hit], d["sk"])
        keep = np.flatnonzero(hit)[shit]
        flag = d["st"][spos[shit]].astype(np.int64)
        okey = t["l_orderkey"].to_numpy()[keep]
        pc_ = np.floor(t["l_extendedprice"].to_numpy()[keep] * 100.0
                       + 0.5).astype(np.int64)
        dc = np.floor(t["l_discount"].to_numpy()[keep] * 100.0
                      + 0.5).astype(np.int64)
        rev = pc_ * (100 - dc)
        o = np.lexsort(np.stack([okey, flag]))
        okey, flag, rev = okey[o], flag[o], rev[o]
        new = np.r_[True, (okey[1:] != okey[:-1]) | (flag[1:] != flag[:-1])]
        starts = np.flatnonzero(new)
        n = len(starts)
        return pa.table({
            "_side": pa.array(np.zeros(n, np.int8)),
            "_okey": pa.array(okey[starts]),
            "_flag": pa.array(flag[starts]),
            "_rev": pa.array(np.add.reduceat(rev, starts)),
            "_shard": _shard(okey[starts])}).cast(unified)

    def orders_slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.column_names:
            return unified.empty_table()
        d = cached(("q8_dims", ref.hex()), lambda: ray.get(ref))
        hit, _ = _member(t["o_custkey"].to_numpy(), d["ck"])
        okey = t["o_orderkey"].to_numpy()[hit]
        yr = (t["o_orderdate"].to_numpy()[hit].astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        n = len(okey)
        return pa.table({
            "_side": pa.array(np.ones(n, np.int8)),
            "_okey": pa.array(okey), "_flag": pa.array(yr),
            "_rev": pa.array(np.zeros(n, np.int64)),
            "_shard": _shard(okey)}).cast(unified)

    def join_agg(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                              "total_rev4": pd.Series([], dtype=np.int64),
                              "nation_rev4": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return empty
        j = lf[["_okey", "_flag", "_rev"]].merge(
            rf[["_okey", "_flag"]].rename(columns={"_flag": "_yr"}),
            on="_okey", how="inner")
        if len(j) == 0:
            return empty
        tot = j.groupby("_yr", sort=True)["_rev"].sum()
        ntv = (j[j["_flag"] == 1].groupby("_yr", sort=True)["_rev"].sum()
               .reindex(tot.index, fill_value=0))
        return pd.DataFrame({"o_year": tot.index.to_numpy(np.int64),
                             "total_rev4": tot.to_numpy(np.int64),
                             "nation_rev4": ntv.to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"]
                         ).map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]).map_batches(
        orders_slim, batch_format="pyarrow", zero_copy_batch=True)

    parts = (li.union(orders).groupby("_shard")
             .map_groups(join_agg, batch_format="pandas").to_pandas())
    if len(parts) == 0 or "o_year" not in parts.columns:
        return pa.table({"o_year": pa.array([], pa.int64()),
                         "total_rev4": pa.array([], pa.int64()),
                         "nation_rev4": pa.array([], pa.int64()),
                         "share6": pa.array([], pa.int64())})
    agg = parts.groupby("o_year", sort=True).sum()
    tot = [int(x) for x in agg["total_rev4"]]
    ntv = [int(x) for x in agg["nation_rev4"]]
    share = [(n * 1_000_000) // t if t else 0 for n, t in zip(ntv, tot)]
    return pa.table({"o_year": pa.array(agg.index.to_numpy(np.int64)),
                     "total_rev4": pa.array(tot, pa.int64()),
                     "nation_rev4": pa.array(ntv, pa.int64()),
                     "share6": pa.array(share, pa.int64())})


# --- TPC-H Q20-flavored dominant-suppliers twin ------------------------------------

def dominant_suppliers(sf_dir: str, *, name_substr: str = "red",
                       share_num: int = 3, share_den: int = 20,
                       n_shards: int | None = None) -> pa.Table:
    """TPC-H Q20-shaped nested semi-join (no partsupp in the driver
    schema, so availability becomes VOLUME SHARE): suppliers who shipped
    more than share_num/share_den of some ``name_substr`` part's total
    quantity, with how many such parts.  Output (s_suppkey, s_name,
    n_parts) ordered by supplier.

    The correlated inner aggregate (each part's total across ALL
    suppliers) and the outer per-(part, supplier) sum resolve in the
    SAME exchange: a part's rows co-locate under hash(partkey), so the
    share gate is the division-free cross-multiply den*s > num*total
    in-shard, and only (suppkey, n_parts) partials leave the shard —
    bounded by suppliers per shard.  Lineitem pre-aggregates
    (partkey, suppkey) quantities per batch before the wire.  SQL twin
    ``oracle.dominant_suppliers_sql``."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    m = pc.match_substring(part["p_name"], name_substr).to_numpy(
        zero_copy_only=False)
    pk = np.sort(part["p_partkey"].to_numpy()[m])
    ref = ray.put(pk)

    slim_schema = pa.schema([("_pk", pa.int64()), ("_sk", pa.int64()),
                             ("_qc", pa.int64()), ("_shard", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.column_names:
            return slim_schema.empty_table()
        ek = cached(("q20_parts", ref.hex()), lambda: ray.get(ref))
        lk = t["l_partkey"].to_numpy()
        if len(ek) == 0:
            return slim_schema.empty_table()
        pos = np.searchsorted(ek, lk)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == lk)
        if not hit.any():
            return slim_schema.empty_table()
        pkv = lk[hit]
        sk = t["l_suppkey"].to_numpy()[hit]
        qc = np.floor(t["l_quantity"].to_numpy()[hit] * 100.0
                      + 0.5).astype(np.int64)
        o = np.lexsort((sk, pkv))
        pkv, sk, qc = pkv[o], sk[o], qc[o]
        new = np.r_[True, (pkv[1:] != pkv[:-1]) | (sk[1:] != sk[:-1])]
        starts = np.flatnonzero(new)
        pkv, sk = pkv[starts], sk[starts]
        with np.errstate(over="ignore"):
            h = pkv.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({"_pk": pa.array(pkv), "_sk": pa.array(sk),
                         "_qc": pa.array(np.add.reduceat(qc, starts)),
                         "_shard": pa.array(((h >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))})

    def gate(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_sk": pd.Series([], dtype=np.int64),
                              "_np": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        ps = (g.groupby(["_pk", "_sk"], sort=False)["_qc"].sum()
              .reset_index())
        tot = ps.groupby("_pk", sort=False)["_qc"].transform("sum")
        keep = (share_den * ps["_qc"].to_numpy()
                > share_num * tot.to_numpy())
        if not keep.any():
            return empty
        vc = ps.loc[keep, "_sk"].value_counts()
        return pd.DataFrame({"_sk": vc.index.to_numpy(np.int64),
                             "_np": vc.to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey", "l_quantity"]
                         ).map_batches(slim, batch_format="pyarrow",
                                       zero_copy_batch=True)
    parts = (li.groupby("_shard").map_groups(gate, batch_format="pandas")
             .to_pandas())
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "n_parts": pa.array([], pa.int64())})
    if len(parts) == 0 or "_sk" not in parts.columns:
        return empty
    agg = parts.groupby("_sk", sort=True)["_np"].sum()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = (agg.rename("n_parts").reset_index()
           .merge(supp, left_on="_sk", right_on="s_suppkey", how="inner")
           .sort_values("s_suppkey"))
    return pa.table({
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(out["s_name"].to_numpy(object), pa.string()),
        "n_parts": pa.array(out["n_parts"].to_numpy(np.int64))})


# --- NTILE-style decile summary ------------------------------------------------

def balance_deciles(sf_dir: str, *, k: int = 10) -> pa.Table:
    """Customer balance decile summary — the NTILE window-function twin:
    rank every customer by (balance cents asc, custkey asc), bucket
    d = (rank-1)*k // n (0-based, the exact-quantile split both engines
    compute identically in integers — NOT the builtin NTILE remainder
    rule), and summarize each bucket.  Output (decile, n_cust,
    sum_bal_c, min_bal_c, max_bal_c).

    Plan: ``sort.global_rank`` supplies the exact global rank (sample
    boundaries + count pass + ONE range exchange); the bucket label is
    then a pure function of (rank, n), so the summary is per-batch
    partials bounded by k x blocks and a tiny driver merge — no second
    shuffle.  SQL twin ``oracle.balance_deciles_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.pipelines.sort import global_rank

    n_total = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if n_total == 0:
        return pa.table({"decile": pa.array([], pa.int64()),
                         "n_cust": pa.array([], pa.int64()),
                         "sum_bal_c": pa.array([], pa.int64()),
                         "min_bal_c": pa.array([], pa.int64()),
                         "max_bal_c": pa.array([], pa.int64())})

    def bal_c(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_acctbal" not in t.column_names:
            return pa.table({"bal_c": pa.array([], pa.int64()),
                             "c_custkey": pa.array([], pa.int64())})
        return pa.table({
            "bal_c": pa.array(np.floor(t["c_acctbal"].to_numpy() * 100.0
                                       + 0.5).astype(np.int64)),
            "c_custkey": pa.array(t["c_custkey"].to_numpy())})

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_acctbal"]).map_batches(
        bal_c, batch_format="pyarrow", zero_copy_batch=True)
    ranked = global_rank(cust, key_col="bal_c", id_col="c_custkey")

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "n_cust": pa.array([], pa.int64()),
                          "sum_bal_c": pa.array([], pa.int64()),
                          "min_bal_c": pa.array([], pa.int64()),
                          "max_bal_c": pa.array([], pa.int64())})
        if t.num_rows == 0 or "global_rank" not in t.column_names:
            return empty
        r = t["global_rank"].to_numpy()
        b = t["bal_c"].to_numpy()
        d = (r - 1) * np.int64(k) // np.int64(n_total)
        order = np.argsort(d, kind="stable")
        d, b = d[order], b[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        lens = np.diff(np.r_[starts, len(d)]).astype(np.int64)
        return pa.table({
            "decile": pa.array(d[starts]),
            "n_cust": pa.array(lens),
            "sum_bal_c": pa.array(np.add.reduceat(b, starts)),
            "min_bal_c": pa.array(np.minimum.reduceat(b, starts)),
            "max_bal_c": pa.array(np.maximum.reduceat(b, starts))})

    parts = ranked.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    agg = parts.groupby("decile", sort=True).agg(
        n_cust=("n_cust", "sum"), sum_bal_c=("sum_bal_c", "sum"),
        min_bal_c=("min_bal_c", "min"), max_bal_c=("max_bal_c", "max"))
    return pa.table({
        "decile": pa.array(agg.index.to_numpy(np.int64)),
        "n_cust": pa.array(agg["n_cust"].to_numpy(np.int64)),
        "sum_bal_c": pa.array(agg["sum_bal_c"].to_numpy(np.int64)),
        "min_bal_c": pa.array(agg["min_bal_c"].to_numpy(np.int64)),
        "max_bal_c": pa.array(agg["max_bal_c"].to_numpy(np.int64))})


# --- TPC-H Q21-flavored last-shipper twin --------------------------------------

def slow_suppliers(sf_dir: str, *, n_shards: int | None = None) -> pa.Table:
    """TPC-H Q21-shaped blame assignment (the driver lineitem has no
    commit/receipt dates, so 'kept the order waiting' becomes 'was the
    UNIQUE latest shipper of a multi-supplier order'): per supplier,
    how many orders with >= 2 distinct suppliers they closed strictly
    last — a max-shipdate tie means nobody is solely to blame, exactly
    Q21's exists/not-exists pair.  Output (s_suppkey, s_name, n_orders)
    ordered by supplier.

    Plan: lineitem pre-aggregates (orderkey, suppkey) -> max shipdate
    per batch (lines fold before the wire); ONE hash(orderkey) exchange
    co-locates each order, where one lexsort finds per-order supplier
    count, the order max, and the uniqueness of its achiever; only
    (suppkey, n) partials leave — bounded by suppliers per shard.
    SQL twin ``oracle.slow_suppliers_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)

    slim_schema = pa.schema([("_ok", pa.int64()), ("_sk", pa.int64()),
                             ("_sd", pa.int64()), ("_shard", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return slim_schema.empty_table()
        ok = t["l_orderkey"].to_numpy()
        sk = t["l_suppkey"].to_numpy()
        sd = (t["l_shipdate"].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        o = np.lexsort((sd, sk, ok))
        ok, sk, sd = ok[o], sk[o], sd[o]
        last = np.r_[(ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1]), True]
        ok, sk, sd = ok[last], sk[last], sd[last]   # per (okey,supp) max
        with np.errstate(over="ignore"):
            h = ok.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({"_ok": pa.array(ok), "_sk": pa.array(sk),
                         "_sd": pa.array(sd),
                         "_shard": pa.array(((h >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))})

    def blame(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_sk": pd.Series([], dtype=np.int64),
                              "_n": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        s = (g.groupby(["_ok", "_sk"], sort=False)["_sd"].max()
             .reset_index())
        ok = s["_ok"].to_numpy(np.int64)
        sk = s["_sk"].to_numpy(np.int64)
        sd = s["_sd"].to_numpy(np.int64)
        o = np.lexsort((sd, ok))
        ok, sk, sd = ok[o], sk[o], sd[o]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        last = starts + lens - 1                     # per-order max row
        # unique max: the runner-up (if any) is strictly earlier
        runner = sd[np.maximum(last - 1, starts)]
        keep = (lens >= 2) & (runner < sd[last])
        if not keep.any():
            return empty
        vc = pd.Series(sk[last[keep]]).value_counts()
        return pd.DataFrame({"_sk": vc.index.to_numpy(np.int64),
                             "_n": vc.to_numpy(np.int64)})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate"]
                         ).map_batches(slim, batch_format="pyarrow",
                                       zero_copy_batch=True)
    parts = (li.groupby("_shard").map_groups(blame, batch_format="pandas")
             .to_pandas())
    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "s_name": pa.array([], pa.string()),
                      "n_orders": pa.array([], pa.int64())})
    if len(parts) == 0 or "_sk" not in parts.columns:
        return empty
    agg = parts.groupby("_sk", sort=True)["_n"].sum()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = (agg.rename("n_orders").reset_index()
           .merge(supp, left_on="_sk", right_on="s_suppkey", how="inner")
           .sort_values("s_suppkey"))
    return pa.table({
        "s_suppkey": pa.array(out["s_suppkey"].to_numpy(np.int64)),
        "s_name": pa.array(out["s_name"].to_numpy(object), pa.string()),
        "n_orders": pa.array(out["n_orders"].to_numpy(np.int64))})


# --- TPC-H Q6 forecast-revenue twin ---------------------------------------------

def forecast_revenue(sf_dir: str, *, date_from: str = "1997-01-01",
                     date_to: str = "1998-01-01", disc_lo: int = 5,
                     disc_hi: int = 7, max_qty: int = 24) -> pa.Table:
    """TPC-H Q6 twin: revenue increase from discount removal — ONE
    filtered integer sum (rev6 = price_c * disc_c, 1e-6 dollars), with
    the discount band on integer cents [disc_lo, disc_hi] and quantity
    strictly below ``max_qty``.  One row (revenue6, n_lines).

    Plan: the minimal aggregate-over-scan — column-pruned read, one
    (sum, n) partial per batch, zero shuffles.  Exists mostly to close
    the TPC-H family: every query expressible over the driver schema
    now has a twin.  SQL twin ``oracle.forecast_revenue_sql``."""
    lo, hi = np.datetime64(date_from), np.datetime64(date_to)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"r6": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or "l_shipdate" not in t.column_names:
            return empty
        sd = t["l_shipdate"].to_numpy()
        dc = np.floor(t["l_discount"].to_numpy() * 100.0
                      + 0.5).astype(np.int64)
        qc = np.floor(t["l_quantity"].to_numpy() * 100.0
                      + 0.5).astype(np.int64)
        m = ((sd >= lo) & (sd < hi) & (dc >= disc_lo) & (dc <= disc_hi)
             & (qc < max_qty * 100))
        if not m.any():
            return empty
        pc_ = np.floor(t["l_extendedprice"].to_numpy()[m] * 100.0
                       + 0.5).astype(np.int64)
        return pa.table({"r6": pa.array([np.int64((pc_ * dc[m]).sum())]),
                         "n": pa.array([np.int64(m.sum())])})

    parts = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_shipdate", "l_discount",
                                      "l_quantity", "l_extendedprice"])
             .map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas())
    r6 = int(parts["r6"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return pa.table({"revenue6": pa.array([r6], pa.int64()),
                     "n_lines": pa.array([n], pa.int64())})


def revenue_trend(sf_dir: str) -> pa.Table:
    """Integer-exact OLS revenue trend per customer nation: yearly
    order-revenue cents y over centered years x = year - min(year),
    slope reported as the EXACT rational (slope_num, slope_den) =
    (n*Sxy - Sx*Sy, n*Sxx - Sx*Sx) — the regr_slope aggregate without
    the float (parallel float sums would be order-ambiguous; integers
    make the trend hash-verifiable).  n counts the nation's years WITH
    data.  Output (nation, n_years, slope_num, slope_den) by nation.

    Plan: the sales_by_nation shape — broadcast customer/nation dims,
    per-batch (nation, year, cents) partials bounded by 25 x years per
    block, driver OLS fold over the tiny partial table.  SQL twin
    ``oracle.revenue_trend_sql``."""
    import pyarrow.parquet as pq

    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])
    j = broadcast_lookup(orders, customer, fact_key="o_custkey",
                         dim_key="c_custkey", value_cols=("c_nationkey",))
    j = broadcast_lookup(j, nation, fact_key="c_nationkey",
                         dim_key="n_nationkey", value_cols=("n_name",))

    part_schema = pa.schema([("nation", pa.string()), ("yr", pa.int64()),
                             ("s", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_name" not in t.column_names:
            return part_schema.empty_table()
        yr = (t["o_orderdate"].to_numpy().astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        pc = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({"nation": t["n_name"].to_numpy(
            zero_copy_only=False), "yr": yr, "s": pc})
        agg = df.groupby(["nation", "yr"], sort=False)["s"] \
            .sum().reset_index()
        return pa.table({"nation": pa.array(agg["nation"].astype(str)),
                         "yr": pa.array(agg["yr"].to_numpy(np.int64)),
                         "s": pa.array(agg["s"].to_numpy(np.int64))})

    parts = (j.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas())
    if len(parts) == 0 or "nation" not in parts.columns:
        return pa.table({"nation": pa.array([], pa.string()),
                         "n_years": pa.array([], pa.int64()),
                         "slope_num": pa.array([], pa.int64()),
                         "slope_den": pa.array([], pa.int64())})
    agg = parts.groupby(["nation", "yr"], sort=True)["s"].sum().reset_index()
    x = (agg["yr"] - int(agg["yr"].min())).to_numpy(np.int64)
    y = agg["s"].to_numpy(np.int64)
    agg["x"], agg["xy"], agg["xx"] = x, x * y, x * x
    g = agg.groupby("nation", sort=True).agg(
        ny=("x", "size"), sx=("x", "sum"), sxx=("xx", "sum"),
        sy=("s", "sum"), sxy=("xy", "sum")).reset_index()
    ny = g["ny"].to_numpy(np.int64)
    return pa.table({
        "nation": pa.array(g["nation"].astype(str)),
        "n_years": pa.array(ny),
        "slope_num": pa.array(ny * g["sxy"].to_numpy(np.int64)
                              - g["sx"].to_numpy(np.int64)
                              * g["sy"].to_numpy(np.int64)),
        "slope_den": pa.array(ny * g["sxx"].to_numpy(np.int64)
                              - g["sx"].to_numpy(np.int64) ** 2)})


THEIL_L = 2520  # lcm(1..10): every observed year gap divides it


def theil_sen(sf_dir: str) -> pa.Table:
    """Theil–Sen robust revenue trend per customer nation — the
    outlier-resistant companion of ``revenue_trend``: the LOWER MEDIAN
    of the pairwise yearly slopes.  Every slope is made EXACTLY integer
    by the common-denominator trick: year gaps dx all divide
    ``THEIL_L`` (lcm(1..10); the corpus spans 7 years), so
    slope_scaled = (y_j - y_i) * (THEIL_L // dx) is the slope in
    cents/year scaled by THEIL_L — median selection over integers is
    order-exact and hash-verifiable (the robust_quality_stats lower-
    median discipline).  Output (nation, n_years, n_pairs,
    slope_scaled), nations with >= 2 data years, nation order.

    Plan: identical to revenue_trend — broadcast dims, bounded
    (nation, year, cents) per-batch partials, driver fold over the
    <= 25 x years partial table (pairs are <= C(years, 2) per nation).
    SQL twin ``oracle.theil_sen_sql``."""
    import pyarrow.parquet as pq

    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice",
                                      "o_orderdate"])
    j = broadcast_lookup(orders, customer, fact_key="o_custkey",
                         dim_key="c_custkey", value_cols=("c_nationkey",))
    j = broadcast_lookup(j, nation, fact_key="c_nationkey",
                         dim_key="n_nationkey", value_cols=("n_name",))

    part_schema = pa.schema([("nation", pa.string()), ("yr", pa.int64()),
                             ("s", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_name" not in t.column_names:
            return part_schema.empty_table()
        yr = (t["o_orderdate"].to_numpy().astype("datetime64[Y]")
              .astype(np.int64) + 1970)
        pc = np.floor(t["o_totalprice"].to_numpy() * 100 + 0.5) \
            .astype(np.int64)
        df = pd.DataFrame({"nation": t["n_name"].to_numpy(
            zero_copy_only=False), "yr": yr, "s": pc})
        agg = df.groupby(["nation", "yr"], sort=False)["s"] \
            .sum().reset_index()
        return pa.table({"nation": pa.array(agg["nation"].astype(str)),
                         "yr": pa.array(agg["yr"].to_numpy(np.int64)),
                         "s": pa.array(agg["s"].to_numpy(np.int64))})

    out_schema = pa.schema([("nation", pa.string()),
                            ("n_years", pa.int64()),
                            ("n_pairs", pa.int64()),
                            ("slope_scaled", pa.int64())])
    parts = (j.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas())
    if len(parts) == 0 or "nation" not in parts.columns:
        return out_schema.empty_table()
    agg = parts.groupby(["nation", "yr"], sort=True)["s"].sum().reset_index()
    rows = []
    for nat, g in agg.groupby("nation", sort=True):
        yrs = g["yr"].to_numpy(np.int64)
        ys = g["s"].to_numpy(np.int64)
        if len(yrs) < 2:
            continue
        iu, iv = np.triu_indices(len(yrs), 1)
        dx = yrs[iv] - yrs[iu]
        assert int(dx.max()) <= 10, "year gap exceeds THEIL_L coverage"
        sl = (ys[iv] - ys[iu]) * (THEIL_L // dx)
        sl.sort()
        rows.append((nat, len(yrs), len(sl), int(sl[(len(sl) - 1) // 2])))
    if not rows:
        return out_schema.empty_table()
    n_, ny_, np_, s_ = zip(*rows)
    return pa.table({"nation": pa.array(list(n_), pa.string()),
                     "n_years": pa.array(list(ny_), pa.int64()),
                     "n_pairs": pa.array(list(np_), pa.int64()),
                     "slope_scaled": pa.array(list(s_), pa.int64())})


def copurchase_pairs(sf_dir: str, *, min_support: int = 2,
                     n_shards: int | None = None) -> pa.Table:
    """Market-basket pair mining over lineitem — the frequent-itemset
    (k=2) primitive: unordered part pairs co-occurring in at least
    ``min_support`` distinct orders, with both single-part supports
    attached (support counts = distinct orders containing the part, so
    confidence/lift gates are exact integer ratios downstream).  Output
    (part_a, part_b, pair_support, support_a, support_b) with
    part_a < part_b, (part_a, part_b) order.  All counts are distinct-
    order counts — repeated lines of the same part in one order fold.

    Plan: TWO bounded exchanges, no driver blowup.  Exchange 1 co-
    locates an order's lines on hash(orderkey); in-shard lexsort folds
    duplicate (order, part) rows, a vectorized run expansion emits each
    order's C(L,2) pairs (L = basket size, small by construction), and
    an in-shard (pa, pb) run-length fold emits pair PARTIALS plus
    per-part distinct-order partials (side-tagged with pb = -1).
    Exchange 2 co-locates partials on hash(pa, pb); full pair counts
    filter to >= min_support IN-SHARD, so only survivors plus the
    (bounded by part cardinality) support rows reach the driver merge.
    SQL twin ``oracle.copurchase_pairs_sql`` (distinct self-join).

    Reference parity note: the reference engine has no mining family;
    this extends the curation toolbox (basket co-occurrence is the
    tabular twin of the text collocation op, textops.collocations)."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([
        ("part_a", pa.int64()), ("part_b", pa.int64()),
        ("pair_support", pa.int64()), ("support_a", pa.int64()),
        ("support_b", pa.int64())])
    part_empty = pa.table({"pa": pa.array([], pa.int64()),
                           "pb": pa.array([], pa.int64()),
                           "c": pa.array([], pa.int64()),
                           "_shard": pa.array([], pa.int64())})

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.column_names:
            return pa.table({"ok": pa.array([], pa.int64()),
                             "pk": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table({"ok": pa.array(ok),
                         "pk": t["l_partkey"].cast(pa.int64()),
                         "_shard": pa.array(
                             (_splitmix64(ok.astype(np.uint64))
                              % np.uint64(n_shards)).astype(np.int64))})

    def per_order_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("pa", "pb", "c", "_shard")
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        ok = g["ok"].to_numpy(np.int64)
        pk = g["pk"].to_numpy(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        ok, pk = ok[keep], pk[keep]  # distinct (order, part)
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        # vectorized all-pairs within each order run: row i pairs with
        # the (run_end - i - 1) rows after it
        run_end = np.repeat(starts + lens, lens)
        cnt = run_end - np.arange(len(ok)) - 1
        li = np.repeat(np.arange(len(ok)), cnt)
        cum = np.r_[0, np.cumsum(cnt)]
        rj = np.arange(int(cum[-1])) - cum[li] + li + 1
        a, b = pk[li], pk[rj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # in-shard partial fold of pair counts
        po = np.lexsort((hi, lo))
        lo, hi = lo[po], hi[po]
        new = np.r_[True, (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
        ps = np.flatnonzero(new)
        pc = np.diff(np.r_[ps, len(lo)])
        pairs_a, pairs_b = lo[ps], hi[ps]
        # per-part distinct-order partials, side-tagged pb = -1
        so = np.sort(pk)
        ss = np.flatnonzero(np.r_[True, so[1:] != so[:-1]])
        sc = np.diff(np.r_[ss, len(so)])
        pa_all = np.r_[pairs_a, so[ss]]
        pb_all = np.r_[pairs_b, np.full(len(ss), -1, np.int64)]
        c_all = np.r_[pc, sc]
        h = (_splitmix64(pa_all.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             ^ _splitmix64(pb_all.astype(np.uint64)))
        return pd.DataFrame({"pa": pa_all, "pb": pb_all, "c": c_all,
                             "_shard": (h % np.uint64(n_shards))
                             .astype(np.int64)})

    def per_pair_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("pa", "pb", "c")
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        pa_ = g["pa"].to_numpy(np.int64)
        pb_ = g["pb"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        order = np.lexsort((pb_, pa_))
        pa_, pb_, c = pa_[order], pb_[order], c[order]
        new = np.r_[True, (pa_[1:] != pa_[:-1]) | (pb_[1:] != pb_[:-1])]
        gid = np.cumsum(new) - 1
        tot = np.zeros(int(gid[-1]) + 1, np.int64)
        np.add.at(tot, gid, c)
        starts = np.flatnonzero(new)
        pa_, pb_ = pa_[starts], pb_[starts]
        keep = (pb_ == -1) | (tot >= min_support)
        return pd.DataFrame({"pa": pa_[keep], "pb": pb_[keep],
                             "c": tot[keep]})

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    out = (li.map_batches(slim, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("_shard").map_groups(per_order_shard,
                                         batch_format="pandas")
           .groupby("_shard").map_groups(per_pair_shard,
                                         batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "pa" not in out.columns:
        return out_schema.empty_table()
    sup = out[out["pb"] == -1]
    sup_key = sup["pa"].to_numpy(np.int64)
    sup_cnt = sup["c"].to_numpy(np.int64)
    so = np.argsort(sup_key)
    sup_key, sup_cnt = sup_key[so], sup_cnt[so]
    pairs = out[out["pb"] != -1]
    if len(pairs) == 0:
        return out_schema.empty_table()
    pairs = pairs.sort_values(["pa", "pb"]).reset_index(drop=True)
    a = pairs["pa"].to_numpy(np.int64)
    b = pairs["pb"].to_numpy(np.int64)
    sa = sup_cnt[np.searchsorted(sup_key, a)]
    sb = sup_cnt[np.searchsorted(sup_key, b)]
    return pa.table({"part_a": pa.array(a), "part_b": pa.array(b),
                     "pair_support": pa.array(
                         pairs["c"].to_numpy(np.int64)),
                     "support_a": pa.array(sa), "support_b": pa.array(sb)})


def revenue_gini(sf_dir: str, *, n_shards: int | None = None) -> pa.Table:
    """Per-nation GINI COEFFICIENT of order totals — the revenue-
    concentration / inequality statistic (who depends on a few whale
    orders): with a nation's order cents sorted ascending x_1..x_n,

        gini = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    kept as the exact integer rational (num, den) — rank-weighted sums
    are tie-order invariant (tied values swap equal ranks), so both
    engines agree exactly; gini6 = floor(num * 1e6 / den) in arbitrary
    precision (bounded per-nation rows).  Output (nationkey, n_orders,
    gini_num, gini_den, gini6), nation order.

    Plan: customer key→nation map rides ray.put once (the
    regional_sales small-side rule); orders slim to (nation, cents)
    in-batch; ONE hash(nation) exchange sorts + folds in-shard (a
    nation's orders co-locate), one row per nation to the driver.
    SQL twin ``oracle.revenue_gini_sql`` (row_number + HUGEINT sums).
    """
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    t = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"])
    ck = t["c_custkey"].to_numpy().astype(np.int64)
    cn = t["c_nationkey"].to_numpy().astype(np.int64)
    o = np.argsort(ck)
    cust_ref = ray.put((ck[o], cn[o]))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"nat": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        k, v = cached(("gini_cust", cust_ref.hex()),
                      lambda: ray.get(cust_ref))
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, cust), 0, len(k) - 1)
        nat = v[pos]
        cents = np.floor(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"nat": pa.array(nat), "cents": pa.array(cents),
                         "_shard": pa.array((nat % n_shards)
                                            .astype(np.int64))})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        if len(g) == 0:
            return pd.DataFrame({
                "nationkey": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "gini_num": pd.Series([], dtype=np.int64),
                "gini_den": pd.Series([], dtype=np.int64),
                "gini6": pd.Series([], dtype=np.int64)})
        nat = g["nat"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((cents, nat))
        nat, cents = nat[order], cents[order]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        ends = np.r_[starts[1:], len(nat)]
        rows = []
        for s, e in zip(starts, ends):
            x = cents[s:e]
            n = e - s
            i = np.arange(1, n + 1, dtype=np.int64)
            sx = int(x.sum())
            six = int((i * x).sum())
            num = 2 * six - (n + 1) * sx
            den = n * sx
            g6 = (num * 1_000_000 // den) if den else 0
            rows.append((int(nat[s]), n, num, den, g6))
        return pd.DataFrame(rows, columns=["nationkey", "n_orders",
                                           "gini_num", "gini_den",
                                           "gini6"]).astype(np.int64)

    out = (orders.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(fold, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "nationkey" not in out.columns:
        return pa.schema([("nationkey", pa.int64()),
                          ("n_orders", pa.int64()),
                          ("gini_num", pa.int64()),
                          ("gini_den", pa.int64()),
                          ("gini6", pa.int64())]).empty_table()
    out = out.sort_values("nationkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def pareto_coverage(sf_dir: str, *, pct_num: int = 80, pct_den: int = 100,
                    n_shards: int | None = None) -> pa.Table:
    """Per-nation PARETO COVERAGE DEPTH — how many top orders cover
    ``pct`` of the nation's revenue (the 80/20 concentration probe
    next to ``revenue_gini``'s full-curve statistic): with order cents
    sorted DESC, k = the smallest prefix with

        pct_den * cum_k >= pct_num * total      (exact integers)

    — tie order among equal cents cannot change k (the cumsum sequence
    over sorted VALUES is tie-order invariant).  Output (nationkey,
    n_orders, total_cents, k_top), nation order.

    Plan: the revenue_gini shape — broadcast cust->nation map, slim
    (nation, cents) rows, ONE hash(nation) exchange, in-shard sort +
    searchsorted on the cumsum.  SQL twin
    ``oracle.pareto_coverage_sql``."""
    import pyarrow.parquet as pq

    from optimizing_ray.broadcast import cached
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    t = pq.read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey"])
    ck = t["c_custkey"].to_numpy().astype(np.int64)
    cn = t["c_nationkey"].to_numpy().astype(np.int64)
    o = np.argsort(ck)
    cust_ref = ray.put((ck[o], cn[o]))
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"nat": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "o_custkey" not in t.column_names:
            return empty
        k, v = cached(("pareto_cust", cust_ref.hex()),
                      lambda: ray.get(cust_ref))
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, cust), 0, len(k) - 1)
        nat = v[pos]
        cents = np.floor(t["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"nat": pa.array(nat), "cents": pa.array(cents),
                         "_shard": pa.array((nat % n_shards)
                                            .astype(np.int64))})

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        if len(g) == 0:
            return pd.DataFrame({
                "nationkey": pd.Series([], dtype=np.int64),
                "n_orders": pd.Series([], dtype=np.int64),
                "total_cents": pd.Series([], dtype=np.int64),
                "k_top": pd.Series([], dtype=np.int64)})
        nat = g["nat"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        order = np.lexsort((-cents, nat))
        nat, cents = nat[order], cents[order]
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        ends = np.r_[starts[1:], len(nat)]
        rows = []
        for s, e in zip(starts, ends):
            x = cents[s:e]
            cum = np.cumsum(x)
            tot = int(cum[-1])
            k = int(np.searchsorted(pct_den * cum, pct_num * tot,
                                    side="left")) + 1
            rows.append((int(nat[s]), e - s, tot, k))
        return pd.DataFrame(rows, columns=["nationkey", "n_orders",
                                           "total_cents", "k_top"]
                            ).astype(np.int64)

    out = (orders.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(fold, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "nationkey" not in out.columns:
        return pa.schema([("nationkey", pa.int64()),
                          ("n_orders", pa.int64()),
                          ("total_cents", pa.int64()),
                          ("k_top", pa.int64())]).empty_table()
    out = out.sort_values("nationkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)

"""Windowed aggregates over the events stream table.

Ray Data has no event-time windows (and neither does the reference —
SURVEY.md §2.10); stream-shaped workloads are expressed as batch windows:
assign each event its tumbling-window id with integer-exact timestamp
arithmetic in ``map_batches`` (pre-aggregating within the batch), then a
small ``groupby`` merges partials — the partial/final split that keeps
the shuffle at one row per (batch, user, window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.config import resolve_shards

__all__ = ["tumbling_window", "sliding_window", "session_window",
           "trajectory_stats", "event_transitions", "user_tile_visits",
           "late_events", "geofence_transitions", "od_matrix",
           "with_prev_value", "running_total", "asof_join", "range_join",
           "interval_join", "interval_coverage", "funnel",
           "cohort_retention", "windowed_topk_types", "resample_interpolate",
           "trajectory_similarity", "mad_outliers", "activity_streaks",
           "peak_concurrency", "trajectory_diameter", "cusum_alarms",
           "stay_points", "douglas_peucker", "convex_hull", "min_obb",
           "decayed_counts", "emerging_hotspots", "benford_audit",
           "rolling_stats", "zone_dwell", "radius_of_gyration",
           "visit_entropy"]

def _sharded_sum(partials: rd.Dataset, key_col: str,
                 n_shards: int | None = None) -> rd.Dataset:
    """Merge (key, window_id, n, s) partials by (key, window): shard on
    hash(key, window) % n_shards and sum vectorized inside each shard —
    Ray's native multi-key aggregate degrades when group count approaches
    row count (measured 2x slower than a single-block pandas groupby at
    380 k groups); 64 shards keep the merge distributed AND vectorized
    (cluster-derived via resolve_shards, floor 64)."""
    n_shards = resolve_shards(n_shards, floor=64)

    def add_shard(t: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            h = (t[key_col].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + t["window_id"].to_numpy().astype(np.uint64))
        return t.append_column("_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby([key_col, "window_id"], sort=False).agg(
            n_events=("n", "sum"), sv=("s", "sum")).reset_index()
        agg["sum_value"] = np.round(agg["sv"].to_numpy(), 6)
        return agg[[key_col, "window_id", "n_events", "sum_value"]]

    return (partials.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(merge, batch_format="pandas"))



def tumbling_window(events: rd.Dataset, *, window_s: int = 3600,
                    key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value") -> rd.Dataset:
    """Per (key, tumbling window): event count and value sum.

    Window id = epoch_us // (window_s * 1e6) — exact int64 arithmetic,
    identical in DuckDB (epoch_us(ts) // N).  Sums are rounded to 6
    decimals at the END so parallel float summation order cannot flip the
    compared value."""
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        win = ts // win_us
        key = t[key_col].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": key, "w": win, "v": val})
        agg = df.groupby(["k", "w"], sort=True).agg(n=("v", "size"), s=("v", "sum")).reset_index()
        return pa.table({key_col: pa.array(agg["k"].to_numpy()),
                         "window_id": pa.array(agg["w"].to_numpy()),
                         "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
                         "s": pa.array(agg["s"].to_numpy())})

    partials = events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _sharded_sum(partials, key_col)


def sliding_window(events: rd.Dataset, *, window_s: int = 3600,
                   slide_s: int = 900, key_col: str = "user_id",
                   ts_col: str = "ts", value_col: str = "value") -> rd.Dataset:
    """Sliding windows: each event lands in window ids
    ``floor((ts - window)/slide)+1 .. floor(ts/slide)`` (windows identified
    by their start = id * slide).  The event explosion is a vectorized
    in-batch repeat; partial/final aggregation as in tumbling_window."""
    win_us = np.int64(window_s) * np.int64(1_000_000)
    slide_us = np.int64(slide_s) * np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False)
        last = ts // slide_us
        first = (ts - win_us) // slide_us + 1
        reps = (last - first + 1).astype(np.int64)
        total = int(reps.sum())
        rows = np.repeat(np.arange(len(ts)), reps)
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        wid = np.repeat(first, reps) + (np.arange(total) - np.repeat(starts, reps))
        df = pd.DataFrame({"k": key[rows], "w": wid, "v": val[rows]})
        agg = df.groupby(["k", "w"], sort=True).agg(n=("v", "size"), s=("v", "sum")).reset_index()
        return pa.table({key_col: pa.array(agg["k"].to_numpy()),
                         "window_id": pa.array(agg["w"].to_numpy()),
                         "n": pa.array(agg["n"].to_numpy().astype(np.int64)),
                         "s": pa.array(agg["s"].to_numpy())})

    partials = events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _sharded_sum(partials, key_col)


def session_window(events: rd.Dataset, *, gap_s: int = 1800,
                   key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", id_col: str = "event_id",
                   n_shards: int | None = None) -> rd.Dataset:
    """Session windows: per key, a new session starts when the gap to the
    previous event exceeds ``gap_s``.  Requires per-key ordered
    processing: shuffle key = ``key % n_shards`` (per-group dispatch
    amortized, same sharding rationale as dedup), per-key ordering done
    with a vectorized pandas sort inside the shard.  Ties on ts break by
    ``id_col`` — the same ORDER BY the SQL oracle uses."""
    n_shards = resolve_shards(n_shards, floor=64)
    gap_us = np.int64(gap_s) * np.int64(1_000_000)

    def add_shard(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("_shard", pa.array((key % n_shards).astype(np.int64)))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        tsus = g[ts_col].astype("int64")
        new_key = g[key_col] != g[key_col].shift()
        brk = new_key | (tsus.diff() > gap_us)
        g = g.assign(_sess=brk.cumsum())
        agg = g.groupby([key_col, "_sess"], sort=True).agg(
            n_events=(value_col, "size"), sv=(value_col, "sum"),
            t_start_us=(ts_col, "min"), t_end_us=(ts_col, "max")).reset_index()
        # session_id = per-key ordinal starting at 0
        agg["session_id"] = agg.groupby(key_col).cumcount()
        agg["sum_value"] = np.round(agg["sv"].to_numpy(), 6)
        agg["t_start_us"] = agg["t_start_us"].astype("int64")
        agg["t_end_us"] = agg["t_end_us"].astype("int64")
        return agg[[key_col, "session_id", "n_events", "sum_value",
                    "t_start_us", "t_end_us"]]

    return (events.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(sessions, batch_format="pandas"))


def with_prev_value(events: rd.Dataset, *, key_col: str = "user_id",
                    ts_col: str = "ts", value_col: str = "value",
                    id_col: str = "event_id",
                    n_shards: int | None = None) -> rd.Dataset:
    """As-of self-join: attach each event's most recent PRIOR value for the
    same key (the ordered-log pattern for as-of/range joins: shard by key
    hash, sort within shard, vectorized shift).  Ties on ts break by
    id_col, matching the SQL lag() oracle."""
    n_shards = resolve_shards(n_shards, floor=64)

    def add_shard(t: pa.Table) -> pa.Table:
        key = t[key_col].to_numpy(zero_copy_only=False)
        return t.append_column("_shard", pa.array((key % n_shards).astype(np.int64)))

    def prev(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        shifted = g[value_col].shift()
        same_key = g[key_col] == g[key_col].shift()
        g = g.assign(prev_value=shifted.where(same_key))
        return g.drop(columns=["_shard"])

    return (events.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(prev, batch_format="pandas"))


def running_total(events: rd.Dataset, *, key_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  id_col: str = "event_id",
                  n_shards: int | None = None) -> rd.Dataset:
    """Per-key running total ordered by (ts, id) — the cumulative-window
    streaming op (SUM ... OVER (PARTITION BY key ORDER BY ts, id)).

    Values ride as fixed-point cents (floor(v*100 + 0.5), the repo's
    float-rounding discipline) so the int64 prefix sums are order-exact
    and bit-identical to the SQL window twin regardless of block layout.
    One hash(key) exchange; the per-shard cumsum is a vectorized pandas
    groupby (keys co-located, arbitrarily many keys per shard)."""
    n_shards = resolve_shards(n_shards, floor=64)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64()),
                             ts_col: pa.array([], pa.int64()),
                             "_cents": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        key = t[key_col].to_numpy(zero_copy_only=False)
        cents = np.floor(t[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: t[id_col], key_col: t[key_col], ts_col: t[ts_col],
            "_cents": pa.array(cents),
            "_shard": pa.array(_shard_of_keys(key, n_shards)),
        })

    def accumulate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        g = g.assign(run_cents=g.groupby(key_col, sort=False)["_cents"].cumsum())
        return g.drop(columns=["_shard", "_cents"])

    return (events.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(accumulate, batch_format="pandas"))


def _shard_of_keys(key: np.ndarray, n_shards: int) -> np.ndarray:
    """Shard index per key: cheap modulo for integer keys, pandas hash
    (siphash, deterministic within a run) for everything else.  Only the
    DISTRIBUTION depends on the hash — correctness needs each key's rows
    co-located, which any pure function of the key gives."""
    if np.issubdtype(np.asarray(key).dtype, np.integer):
        return (key % n_shards).astype(np.int64)
    h = pd.util.hash_array(np.asarray(key, dtype=object))
    return (h % np.uint64(n_shards)).astype(np.int64)


def asof_join(events: rd.Dataset, dim: rd.Dataset, *,
              key_col: str = "user_id", ts_col: str = "ts",
              rate_col: str = "rate", id_col: str = "event_id",
              payload_cols: tuple[str, ...] = (),
              n_shards: int | None = None) -> rd.Dataset:
    """Temporal AS-OF join: each event row gets the dimension row with
    the LATEST ts <= event ts for the same key (inclusive on equal ts),
    NULL when no dimension row precedes it — the operator Ray Data lacks
    natively, built from the engine's shuffle primitives.

    Plan (partitioning assumption: co-locate by key): side-tag both
    inputs with SAME-TYPED payload columns (a null-typed column would be
    upcast to float by pandas, working notes), shard by hash(key) %
    n_shards, and inside each shard run ONE vectorized
    ``pd.merge_asof`` (sorted-merge in C) over the shard's events x
    dimension rows.  Events for a key land in exactly one shard with all
    of that key's dimension rows, so the shard-local join is globally
    correct.  Dimension rows are pre-deduped per (key, ts) by max(rate)
    so tie order is deterministic (the SQL twin aggregates the same
    way).

    Output: (id, key, ts, rate, *payload_cols) — ``payload_cols`` names
    extra EVENT columns carried through the shuffle (side-tagged with
    typed nulls on the dimension side, the pip_join_shuffle pattern).
    Keys may be integers (sharded by cheap modulo) or any hashable type
    (sharded by pandas hash, round-2 VERDICT generalization)."""
    n_shards = resolve_shards(n_shards)
    ev_schema = events.schema().base_schema
    pay_types = {c: ev_schema.field(c).type for c in payload_cols}

    def _filler(n: int, ty: pa.DataType) -> pa.Array:
        """Same-typed dim-side filler for event-only columns.  Numeric /
        bool / timestamp columns get VALUES, not nulls: a pa.nulls int64
        column flowing into the pandas map_groups would upcast the whole
        column (event rows included) to float64 (working notes).  The
        filler rows never reach the output — merge_asof only emits event
        rows."""
        if pa.types.is_integer(ty):
            return pa.array(np.zeros(n, dtype=np.int64)).cast(ty)
        if pa.types.is_floating(ty):
            return pa.array(np.full(n, np.nan), ty)
        if pa.types.is_boolean(ty):
            return pa.array(np.zeros(n, dtype=bool))
        if pa.types.is_timestamp(ty):
            return pa.array(np.zeros(n, dtype="datetime64[us]")).cast(ty)
        return pa.nulls(n, ty)  # strings/nested: object dtype, no upcast

    def _empty_tagged(t: pa.Table) -> pa.Table:
        # derive types from the block when present; hard-coded defaults
        # only for truly EMPTY-SCHEMA blocks (working notes) — otherwise
        # a typed-empty block could mismatch the union's real schema
        def typ(col, fallback):
            return t[col].type if col in t.column_names else fallback
        cols = {
            id_col: pa.array([], typ(id_col, pa.int64())),
            key_col: pa.array([], typ(key_col, pa.int64())),
            ts_col: pa.array([], typ(ts_col, pa.timestamp("us"))),
            rate_col: pa.array([], pa.float64())}
        for c, ty in pay_types.items():
            cols[c] = pa.array([], ty)
        cols["_is_event"] = pa.array([], pa.bool_())
        cols["_shard"] = pa.array([], pa.int64())
        return pa.table(cols)

    def tag_events(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return _empty_tagged(t)
        key = t[key_col].to_numpy(zero_copy_only=False)
        cols = {
            id_col: t[id_col], key_col: t[key_col], ts_col: t[ts_col],
            rate_col: pa.array(np.full(t.num_rows, np.nan), pa.float64())}
        for c in pay_types:
            cols[c] = t[c]
        cols["_is_event"] = pa.array(np.ones(t.num_rows, bool))
        cols["_shard"] = pa.array(_shard_of_keys(key, n_shards))
        return pa.table(cols)

    def tag_dim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return _empty_tagged(t)
        key = t[key_col].to_numpy(zero_copy_only=False)
        cols = {
            id_col: _filler(t.num_rows, ev_schema.field(id_col).type),
            key_col: t[key_col], ts_col: t[ts_col],
            rate_col: t[rate_col].cast(pa.float64())}
        for c, ty in pay_types.items():
            cols[c] = _filler(t.num_rows, ty)
        cols["_is_event"] = pa.array(np.zeros(t.num_rows, bool))
        cols["_shard"] = pa.array(_shard_of_keys(key, n_shards))
        return pa.table(cols)

    tagged = events.map_batches(tag_events, batch_format="pyarrow",
                                zero_copy_batch=True).union(
        dim.map_batches(tag_dim, batch_format="pyarrow", zero_copy_batch=True))

    out_cols = [id_col, key_col, ts_col, rate_col, *payload_cols]
    ev_cols = [id_col, key_col, ts_col, *payload_cols]

    def join(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_is_event"]].sort_values(ts_col, kind="stable")
        dm = (g[~g["_is_event"]]
              .groupby([key_col, ts_col], as_index=False)[rate_col].max()
              .sort_values(ts_col, kind="stable"))
        if not len(ev):
            cols = {id_col: ev[id_col], key_col: ev[key_col],
                    ts_col: pd.Series([], dtype=ev[ts_col].dtype
                                      if ts_col in ev else "datetime64[us]"),
                    rate_col: pd.Series([], dtype=np.float64)}
            for c in payload_cols:
                cols[c] = ev[c]
            return pd.DataFrame(cols)
        if not len(dm):
            out = ev[ev_cols].copy()
            out[rate_col] = np.nan
            return out[out_cols]
        m = pd.merge_asof(ev[ev_cols], dm,
                          on=ts_col, by=key_col, direction="backward",
                          allow_exact_matches=True)
        return m[out_cols]

    return tagged.groupby("_shard").map_groups(join, batch_format="pandas")


def range_join(events: rd.Dataset, bands: "pa.Table", *,
               value_col: str = "value", id_col: str = "event_id",
               lo_col: str = "lo", hi_col: str = "hi",
               band_col: str = "band_id") -> rd.Dataset:
    """1-D interval (range) join: each event row pairs with EVERY band
    whose [lo, hi) contains its value — bands may overlap (a genuine
    range join, not bucketing).  The band table is small by assumption:
    broadcast once via ray.put, vectorized (n_rows x n_bands) containment
    mask per batch — the 1-D sibling of the broadcast box join, no
    shuffle at all."""
    import ray as _ray

    bref = _ray.put({
        "lo": bands[lo_col].to_numpy(), "hi": bands[hi_col].to_numpy(),
        "id": bands[band_col].to_numpy(),
    })

    def join(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or value_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             band_col: pa.array([], pa.int64()),
                             value_col: pa.array([], pa.float64())})
        b = _ray.get(bref)
        v = t[value_col].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        hit = (v[:, None] >= b["lo"][None, :]) & (v[:, None] < b["hi"][None, :])
        ri, bi = np.nonzero(hit)
        return pa.table({id_col: pa.array(ids[ri]),
                         band_col: pa.array(b["id"][bi]),
                         value_col: pa.array(v[ri])})

    return events.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)


# deterministic per-event interval durations (SQL-twinned, pure int64)
IVJ_DUR_MULT = 2_246_822_519
IVJ_DUR_SALT = 911_382_323
IVJ_DUR_MIN_US = 60_000_000        # 1 min
IVJ_DUR_SPAN_US = 540_000_000      # + up to 9 min  (max ~= bucket width)
IVJ_BUCKET_US = 600_000_000        # 10 min >= max duration


def interval_durations(event_id: np.ndarray) -> np.ndarray:
    """dur_us = MIN + ((id + SALT) * MULT mod 2^32) mod SPAN — plain
    int64 arithmetic DuckDB reproduces exactly."""
    return (np.int64(IVJ_DUR_MIN_US)
            + ((event_id + np.int64(IVJ_DUR_SALT)) * np.int64(IVJ_DUR_MULT)
               % np.int64(1 << 32)) % np.int64(IVJ_DUR_SPAN_US))


def _interval_join_broadcast(events: rd.Dataset, *, id_col: str,
                             ts_col: str) -> rd.Dataset:
    """Broadcast plan for ``interval_join`` (gated upstream by nrows):
    the interval table ships once via ray.put as start-sorted arrays;
    every batch finds its rows' overlap candidates with two
    searchsorted calls (window [s - max_dur, e) is a provable superset:
    durations are < IVJ_DUR_MIN_US + IVJ_DUR_SPAN_US by construction)
    and a ragged-arange gather — zero shuffles, each unordered pair
    emitted exactly once from its smaller-id side."""
    from optimizing_ray.broadcast import cached

    max_dur = np.int64(IVJ_DUR_MIN_US + IVJ_DUR_SPAN_US)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({"_id": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.int64()),
                             "_e": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (t[ts_col].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({"_id": pa.array(eid), "_s": pa.array(s),
                         "_e": pa.array(s + interval_durations(eid))})

    parts = [p for p in ray.get(events.map_batches(
        slim, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs())
        if p.num_rows]
    if parts:
        rt = pa.concat_tables(parts)
        ss = rt["_s"].to_numpy()
        order = np.argsort(ss, kind="stable")
        state = (ss[order], rt["_e"].to_numpy()[order],
                 rt["_id"].to_numpy()[order])
    else:
        state = (np.empty(0, np.int64),) * 3
    state_ref = ray.put(state)

    def join_batch(t: pa.Table) -> pa.Table:
        empty = pa.table({"event_a": pa.array([], pa.int64()),
                          "event_b": pa.array([], pa.int64()),
                          "overlap_us": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        ss, ee, ii = cached(("ivj_bcast", state_ref.hex()),
                            lambda: ray.get(state_ref))
        if len(ss) == 0:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (t[ts_col].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        e = s + interval_durations(eid)
        lo = np.searchsorted(ss, s - max_dur, side="left")
        hi = np.searchsorted(ss, e, side="left")     # s_j < e_i
        n_i = hi - lo
        tot = int(n_i.sum())
        if tot == 0:
            return empty
        voffs = np.zeros(len(n_i) + 1, dtype=np.int64)
        np.cumsum(n_i, out=voffs[1:])
        idx = (np.arange(tot, dtype=np.int64)
               + np.repeat(lo - voffs[:-1], n_i))
        row = np.repeat(np.arange(len(eid), dtype=np.int64), n_i)
        keep = (ee[idx] > s[row]) & (eid[row] < ii[idx])
        ri, ci = row[keep], idx[keep]
        overlap = np.minimum(e[ri], ee[ci]) - np.maximum(s[ri], ss[ci])
        return pa.table({"event_a": pa.array(eid[ri]),
                         "event_b": pa.array(ii[ci]),
                         "overlap_us": pa.array(overlap)})

    return events.map_batches(join_batch, batch_format="pyarrow",
                              zero_copy_batch=True)


def interval_join(events: rd.Dataset, *, id_col: str = "event_id",
                  ts_col: str = "ts", n_shards: int | None = None,
                  bucket_us: int = IVJ_BUCKET_US, nrows: int | None = None,
                  broadcast_threshold: int = 200_000) -> rd.Dataset:
    """Temporal interval-overlap SELF-join: every pair of events whose
    half-open intervals [s, s+dur) intersect, each unordered pair once
    (event_a < event_b), with the exact integer overlap length.

    Plan choice (the dedup/knn_join discipline): with ``nrows`` (free
    parquet metadata) at or below ``broadcast_threshold`` the interval
    table broadcasts once and each batch joins locally with zero
    shuffles (``_interval_join_broadcast``); no hint = assume large =
    the sharded bucket-explode plan below.

    Large-large plan: intervals explode over the <= 2 time buckets they
    touch (bucket width >= max duration by construction), ONE
    ``shard_join.hash_shard_join`` on the bucket, then a vectorized
    residual (overlap + id order + BUCKET OWNERSHIP: a pair is emitted
    only in the bucket containing max(s_a, s_b), so cross-bucket pairs
    are never duplicated).  The 1-D temporal twin of the spatial
    ``dwithin_join``; SQL twin ``oracle.interval_join_sql``."""
    if nrows is not None and 0 <= nrows <= broadcast_threshold:
        return _interval_join_broadcast(events, id_col=id_col, ts_col=ts_col)
    from optimizing_ray.pipelines import shard_join

    def explode(t: pa.Table, prefix: str) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({f"{prefix}id": pa.array([], pa.int64()),
                             f"{prefix}s": pa.array([], pa.int64()),
                             f"{prefix}e": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (t[ts_col].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        e = s + interval_durations(eid)
        b0 = s // np.int64(bucket_us)
        b1 = e // np.int64(bucket_us)
        nb = (b1 - b0 + 1).astype(np.int64)
        rep = np.repeat(np.arange(len(eid), dtype=np.int64), nb)
        starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
        off = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(starts, nb)
        return pa.table({f"{prefix}id": pa.array(eid[rep]),
                         f"{prefix}s": pa.array(s[rep]),
                         f"{prefix}e": pa.array(e[rep]),
                         "bucket": pa.array(b0[rep] + off)})

    left = events.map_batches(lambda t: explode(t, "_a"),
                              batch_format="pyarrow", zero_copy_batch=True)
    right = events.map_batches(lambda t: explode(t, "_b"),
                               batch_format="pyarrow", zero_copy_batch=True)
    joined = shard_join.hash_shard_join(left, right, on="bucket",
                                        how="inner", n_shards=n_shards)

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_a": np.int64, "event_b": np.int64,
                "overlap_us": np.int64}
        if len(df) == 0 or "_aid" not in df.columns:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in cols.items()})
        a_s = df["_as"].to_numpy()
        b_s = df["_bs"].to_numpy()
        a_e = df["_ae"].to_numpy()
        b_e = df["_be"].to_numpy()
        own = np.maximum(a_s, b_s) // np.int64(bucket_us)
        keep = ((df["_aid"].to_numpy() < df["_bid"].to_numpy())
                & (a_s < b_e) & (b_s < a_e)
                & (own == df["bucket"].to_numpy()))
        out = df[keep]
        return pd.DataFrame({
            "event_a": out["_aid"].to_numpy(),
            "event_b": out["_bid"].to_numpy(),
            "overlap_us": (np.minimum(out["_ae"].to_numpy(),
                                      out["_be"].to_numpy())
                           - np.maximum(out["_as"].to_numpy(),
                                        out["_bs"].to_numpy())),
        })

    return joined.map_batches(residual, batch_format="pandas")


def trajectory_stats(events: rd.Dataset, *, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     n_shards: int | None = None) -> rd.Dataset:
    """Per-user trajectory aggregation — the GPS-track shape of the
    events stream: each event gets a deterministic point (x, y derived
    from event_id by the shared driver-table formula), each user's
    points are ordered by (ts, event_id), and one row per user reports

        n_points, path_len (sum of consecutive segment lengths),
        net_disp (first -> last point distance),
        min_x / max_x / min_y / max_y (visit bbox)

    path_len and net_disp are floor(x*1e6 + 0.5)/1e6-rounded at the END
    on both sides (per-user float sums are order-ambiguous at ~1e-12);
    the bbox extrema are order-independent and exact.

    Scale shape: ONE hash(user)-shard exchange of slim
    (user, ts, event_id, x, y) rows; per-shard work is one lexsort +
    ``np.add.reduceat`` segment sums — no per-user Python.  SQL twin:
    ``oracle.trajectory_stats_sql`` (lag window + group aggregates)."""
    n_shards = resolve_shards(n_shards)

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    wx = WORLD_2D.size[0]
    wy = WORLD_2D.size[1]

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_eid": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        return pa.table({"user_id": pa.array(key), "_ts": pa.array(ts),
                         "_eid": pa.array(eid), "x": pa.array(x),
                         "y": pa.array(y),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in
                                 [("user_id", np.int64),
                                  ("n_points", np.int64),
                                  ("path_len", np.float64),
                                  ("net_disp", np.float64),
                                  ("min_x", np.float64), ("max_x", np.float64),
                                  ("min_y", np.float64), ("max_y", np.float64)]})
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), g["_ts"].to_numpy(), key))
        key = key[order]
        x = g["x"].to_numpy()[order]
        y = g["y"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        bounds = np.r_[starts, len(key)]
        dx = np.diff(x)
        dy = np.diff(y)
        seg = np.sqrt(dx * dx + dy * dy)
        seg[starts[1:] - 1] = 0.0  # cross-user boundaries contribute 0
        seg = np.r_[seg, 0.0]
        path = np.add.reduceat(seg, starts)
        # reduceat over a trailing zero keeps single-point users at 0.0
        lasts = bounds[1:] - 1
        nd = np.sqrt((x[lasts] - x[starts]) ** 2 + (y[lasts] - y[starts]) ** 2)
        r6 = lambda v: np.floor(v * 1e6 + 0.5) / 1e6
        mn_x = np.minimum.reduceat(x, starts)
        mx_x = np.maximum.reduceat(x, starts)
        mn_y = np.minimum.reduceat(y, starts)
        mx_y = np.maximum.reduceat(y, starts)
        return pd.DataFrame({
            "user_id": key[starts].astype(np.int64),
            "n_points": np.diff(bounds).astype(np.int64),
            "path_len": r6(path), "net_disp": r6(nd),
            "min_x": mn_x, "max_x": mx_x, "min_y": mn_y, "max_y": mx_y})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard, batch_format="pandas"))


def event_transitions(events: rd.Dataset, *, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      type_col: str = "event_type",
                      n_shards: int | None = None) -> pa.Table:
    """Corpus-wide event-type transition matrix — the Markov-bigram view
    of the events stream: for every consecutive pair within a user's
    (ts, event_id)-ordered sequence, count (from_type, to_type).
    Output one row per observed transition: (from_type, to_type, n).

    Scale shape: transitions are within-user, so rows ride ONE
    hash(user) shard exchange of slim (user, ts, event_id, type) rows;
    inside the shard one lexsort + boundary mask yields the pair list
    and a pandas groupby emits per-shard partials.  The result is
    bounded by |types|^2 regardless of corpus size, so partials merge
    driver-side (the tile_counts discipline).  SQL twin:
    ``oracle.event_transitions_sql`` (lag window + group)."""
    n_shards = resolve_shards(n_shards)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_eid": pa.array([], pa.int64()),
                             "etype": pa.array([], pa.string()),
                             "_shard": pa.array([], pa.int64())})
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(key),
                         "_ts": t[ts_col].cast(pa.int64()),
                         "_eid": t[id_col],
                         "etype": t[type_col],
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), g["_ts"].to_numpy(), key))
        key = key[order]
        ty = g["etype"].to_numpy()[order]
        same = key[1:] == key[:-1]
        df = pd.DataFrame({"from_type": ty[:-1][same], "to_type": ty[1:][same]})
        agg = (df.groupby(["from_type", "to_type"], sort=False)
               .size().rename("n").reset_index())
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    parts = (events.map_batches(slim, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("_shard").map_groups(per_shard,
                                           batch_format="pandas"))
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"from_type": pa.array([], pa.string()),
                         "to_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    df = pa.concat_tables(tabs).to_pandas()
    out = (df.groupby(["from_type", "to_type"], sort=True)["n"].sum()
           .reset_index())
    out["n"] = out["n"].astype(np.int64)
    # bounded result (types^2 rows): a pyarrow Table, the
    # heavy_hitters/build_vocab driver-merge convention — wrapping it
    # back into a Dataset only re-buys a dispatch round-trip
    return pa.Table.from_pandas(out, preserve_index=False)


def user_tile_visits(events: rd.Dataset, *, depth: int, world,
                     key_col: str = "user_id", ts_col: str = "ts",
                     id_col: str = "event_id",
                     n_shards: int | None = None) -> rd.Dataset:
    """Spatio-temporal visit matrix — who was where, when: per
    (user, tile) the visit count and first/last event time, with tiles
    derived from event_id by the shared geometry formula (Morton key at
    ``depth``).  The geo x stream fusion: output
    (user_id, tile, n_visits, first_ts_us, last_ts_us).

    Scale shape: per-batch pre-aggregation (one lexsort + reduceat per
    batch — at most one row per (batch, user, tile) leaves the stage),
    then ONE hash(user, tile) shard exchange merges partials (counts
    sum; first/last are order-independent min/max, so the merge is
    exact).  SQL twin: ``oracle.user_tile_visits_sql``."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "tile": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "f": pa.array([], pa.int64()),
                             "l": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t[ts_col].cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        tile = point_cell2(x, y, world, depth).astype(np.int64)
        order = np.lexsort((tile, key))
        k2, t2, ts2 = key[order], tile[order], ts[order]
        starts = np.flatnonzero(
            np.r_[True, (k2[1:] != k2[:-1]) | (t2[1:] != t2[:-1])])
        n = np.diff(np.r_[starts, len(k2)]).astype(np.int64)
        f = np.minimum.reduceat(ts2, starts)
        l = np.maximum.reduceat(ts2, starts)
        uk, ut = k2[starts], t2[starts]
        with np.errstate(over="ignore"):
            h = (uk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + ut.astype(np.uint64))
        return pa.table({"user_id": pa.array(uk), "tile": pa.array(ut),
                         "n": pa.array(n), "f": pa.array(f),
                         "l": pa.array(l),
                         "_shard": pa.array(
                             (h % np.uint64(n_shards)).astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "tile"], sort=False).agg(
            n_visits=("n", "sum"), first_ts_us=("f", "min"),
            last_ts_us=("l", "max")).reset_index()
        for c in ("n_visits", "first_ts_us", "last_ts_us"):
            agg[c] = agg[c].astype(np.int64)
        return agg

    return (events.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(merge, batch_format="pandas"))


def late_events(events: rd.Dataset, *, key_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                n_shards: int | None = None) -> rd.Dataset:
    """Out-of-order arrival accounting — the watermark view of the
    stream: an event is LATE if its event time precedes the maximum
    event time already seen for its user in ARRIVAL order (event_id).
    Output one row per user: (user_id, n_events, n_late, max_skew_us)
    where max_skew_us is the worst lateness (running-max ts minus the
    late event's ts; 0 when nothing is late).

    Scale shape: ONE hash(user) shard exchange of slim rows; inside the
    shard one lexsort by (user, event_id) + ``np.maximum.accumulate``
    per user segment (vectorized running watermark).  SQL twin:
    ``oracle.late_events_sql`` (max window with 1-preceding frame)."""
    n_shards = resolve_shards(n_shards)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_eid": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(key),
                         "_ts": t[ts_col].cast(pa.int64()),
                         "_eid": t[id_col],
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "n_late": pd.Series([], dtype=np.int64),
                                 "max_skew_us": pd.Series([], dtype=np.int64)})
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), key))
        df = pd.DataFrame({"u": key[order],
                           "ts": g["_ts"].to_numpy()[order]})
        # per-user running max in arrival order (Cython groupby cummax),
        # shifted one arrival back: the watermark BEFORE each event
        prev_wm = (df.groupby("u", sort=False)["ts"].cummax()
                   .groupby(df["u"], sort=False).shift(1))
        late = df["ts"] < prev_wm  # NaN (first arrival) compares False
        skew = np.where(late, (prev_wm - df["ts"]).fillna(0), 0)
        out = pd.DataFrame({"u": df["u"], "late": late.astype(np.int64),
                            "skew": skew})
        agg = out.groupby("u", sort=False).agg(
            n_events=("late", "size"), n_late=("late", "sum"),
            max_skew_us=("skew", "max")).reset_index()
        return pd.DataFrame({"user_id": agg["u"].astype(np.int64),
                             "n_events": agg["n_events"].astype(np.int64),
                             "n_late": agg["n_late"].astype(np.int64),
                             "max_skew_us": agg["max_skew_us"]
                             .astype(np.int64)})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard, batch_format="pandas"))


def geofence_transitions(events: rd.Dataset, *, fence: tuple, world,
                         key_col: str = "user_id", ts_col: str = "ts",
                         id_col: str = "event_id",
                         n_shards: int | None = None) -> rd.Dataset:
    """Geofence enter/exit detection — the geo x stream op of a location
    pipeline: per user, order events by (event time, event_id) and emit
    a row whenever the inside-the-fence flag CHANGES (first event emits
    nothing).  ``fence`` = (fx0, fy0, fx1, fy1), half-open axis-aligned
    box in world coords; event points derive from event_id by the shared
    driver-table geometry formula (so engine and SQL twin
    ``oracle.geofence_transitions_sql`` land on identical doubles).
    Output: (user_id, event_id, ts_us, kind) with kind 'enter'/'exit'.

    Plan: inside-flag computed per batch (zero-copy), ONE hash(user)
    shard exchange of slim rows, lexsort + neighbor-compare inside the
    shard (the late_events shape)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    fx0, fy0, fx1, fy1 = (float(v) for v in fence)
    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_eid": pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_in": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        ins = ((x >= fx0) & (x < fx1) & (y >= fy0) & (y < fy1))
        return pa.table({"user_id": pa.array(key),
                         "_eid": pa.array(eid),
                         "_ts": t[ts_col].cast(pa.int64()),
                         "_in": pa.array(ins.astype(np.int64)),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), g["_ts"].to_numpy(), key))
        u = key[order]
        e = g["_eid"].to_numpy()[order]
        ts = g["_ts"].to_numpy()[order]
        fl = g["_in"].to_numpy()[order]
        same = u[1:] == u[:-1]
        idx = np.flatnonzero(same & (fl[1:] != fl[:-1])) + 1
        kind = np.where(fl[idx] == 1, "enter", "exit")
        return pd.DataFrame({"user_id": u[idx].astype(np.int64),
                             "event_id": e[idx].astype(np.int64),
                             "ts_us": ts[idx].astype(np.int64),
                             "kind": kind})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard, batch_format="pandas"))


def od_matrix(events: rd.Dataset, *, depth: int, world, gap_s: int = 1800,
              key_col: str = "user_id", ts_col: str = "ts",
              id_col: str = "event_id",
              n_shards: int | None = None) -> rd.Dataset:
    """Origin-destination trip matrix — per user SESSION (the
    session_window gap rule), the Morton tile of the session's first
    event is its origin and of its last event its destination; count
    trips per (origin, dest) pair.  Output (origin_tile, dest_tile,
    n_trips).  SQL twin ``oracle.od_matrix_sql``.

    Plan: ONE hash(user) shard exchange of slim rows (a user's sessions
    are whole within the shard), lexsort + gap-boundary masks give every
    session's first/last tile vectorized; per-shard (o, d) partial
    counts then merge on ONE more hash(o, d) exchange — bounded by
    distinct pairs, never the event count, and fully distributed at any
    tile depth."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    gap_us = int(gap_s) * 1_000_000
    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_eid": pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_tile": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        tile = point_cell2(x, y, world, depth).astype(np.int64)
        return pa.table({"user_id": pa.array(key),
                         "_eid": pa.array(eid),
                         "_ts": t[ts_col].cast(pa.int64()),
                         "_tile": pa.array(tile),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"o": pd.Series([], dtype=np.int64),
                              "d": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64),
                              "_shard2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), g["_ts"].to_numpy(), key))
        u = key[order]
        ts = g["_ts"].to_numpy()[order]
        tile = g["_tile"].to_numpy()[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[False, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.flatnonzero(new_user | gap)
        ends = np.r_[starts[1:], len(u)] - 1
        o, d = tile[starts], tile[ends]
        df = (pd.DataFrame({"o": o, "d": d})
              .groupby(["o", "d"], sort=False).size().rename("n")
              .reset_index())
        with np.errstate(over="ignore"):
            h = (df["o"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + df["d"].to_numpy().astype(np.uint64))
        df["n"] = df["n"].astype(np.int64)
        df["_shard2"] = (h % np.uint64(n_shards)).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["o", "d"], sort=False)["n"].sum().reset_index())
        return pd.DataFrame({"origin_tile": agg["o"].astype(np.int64),
                             "dest_tile": agg["d"].astype(np.int64),
                             "n_trips": agg["n"].astype(np.int64)})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard, batch_format="pandas")
            .groupby("_shard2").map_groups(merge, batch_format="pandas"))


def interval_coverage(events: rd.Dataset, *, key_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      n_shards: int | None = None) -> rd.Dataset:
    """Per-user union-of-intervals coverage — the utilization/uptime view
    of the stream: each event owns the half-open interval [s, s + dur)
    (``interval_durations``, the interval_join derivation), and one row
    per user reports

        n_intervals, n_islands (maximal runs of overlapping-or-touching
        intervals), covered_us (total length of the union).

    Semantics: intervals sorted by (s, e); an interval starts a new
    island iff its s exceeds the running max end of all earlier
    intervals (touching at s == prev_end merges — the half-open
    convention).  Within an island the union is contiguous, so its
    length is max(e) - min(s); all arithmetic is int64 microseconds —
    exact on both engines (SQL twin ``oracle.interval_coverage_sql``:
    max-over 1-preceding frame + island running sum).

    Scale shape: ONE hash(user) shard exchange of slim (user, s, e)
    rows; inside the shard a lexsort + pandas Cython cummax/shift per
    user segment, then two vectorized groupbys (island, user).  Nothing
    driver-side; shard width is cluster-derived (resolve_shards).
    Reference streaming surface: SURVEY.md section 2.10."""
    n_shards = resolve_shards(n_shards)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "_s": pa.array([], pa.int64()),
                             "_e": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (t[ts_col].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]").astype(np.int64))
        return pa.table({"user_id": pa.array(key), "_s": pa.array(s),
                         "_e": pa.array(s + interval_durations(eid)),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = {"user_id": np.int64, "n_intervals": np.int64,
                 "n_islands": np.int64, "covered_us": np.int64}
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=t)
                                 for c, t in empty.items()})
        u = g["user_id"].to_numpy()
        s = g["_s"].to_numpy()
        e = g["_e"].to_numpy()
        order = np.lexsort((e, s, u))
        df = pd.DataFrame({"u": u[order], "s": s[order], "e": e[order]})
        # running max end per user, shifted one row back: the coverage
        # frontier BEFORE each interval (NaN on each user's first row)
        prev_cm = (df.groupby("u", sort=False)["e"].cummax()
                   .groupby(df["u"], sort=False).shift(1))
        new_island = prev_cm.isna() | (df["s"] > prev_cm)
        df["isl"] = np.cumsum(new_island.to_numpy())
        isl = df.groupby("isl", sort=False).agg(
            u=("u", "first"), s0=("s", "min"), e1=("e", "max"),
            cnt=("s", "size"))
        agg = isl.assign(cov=isl["e1"] - isl["s0"]).groupby("u", sort=False).agg(
            n_intervals=("cnt", "sum"), n_islands=("cnt", "size"),
            covered_us=("cov", "sum")).reset_index()
        return pd.DataFrame({
            "user_id": agg["u"].astype(np.int64),
            "n_intervals": agg["n_intervals"].astype(np.int64),
            "n_islands": agg["n_islands"].astype(np.int64),
            "covered_us": agg["covered_us"].astype(np.int64)})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard, batch_format="pandas"))


def funnel(events: rd.Dataset, *,
           stages: tuple[str, ...] = ("view", "click", "purchase"),
           key_col: str = "user_id", ts_col: str = "ts",
           id_col: str = "event_id",
           n_shards: int | None = None) -> pa.Table:
    """Funnel conversion — the product-analytics sequence match: per
    user, the EARLIEST strictly-increasing completion of the stage
    sequence under the total event order (ts, event_id); output one row
    per stage: (stage 1-based, event_type, users reached).

    Semantics (shared with ``oracle.funnel_sql``): a user reaches stage
    k+1 iff some stage-(k+1) event is strictly AFTER the composite
    (ts, event_id) at which stage k was first reached — the greedy
    earliest match, which is optimal for existence (matching stage k as
    early as possible never loses a later completion).

    Scale shape: per-batch filter to funnel event types only (slim
    4-column rows leave the scan), ONE hash(user) shard exchange,
    lexsort by (user, ts, event_id) inside the shard, then per-stage
    vectorized searchsorted over the stage's row positions (no per-user
    Python); each shard emits len(stages) count rows, so the driver
    merge is bounded by stages x shards.  Reference analogue: the
    stream-shaped window surface (SURVEY.md section 2.10)."""
    n_shards = resolve_shards(n_shards)
    n_stage = len(stages)
    stage_of = {s: k for k, s in enumerate(stages)}

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "_ts": pa.array([], pa.int64()),
                          "_eid": pa.array([], pa.int64()),
                          "_stage": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        et = t["event_type"].to_numpy(zero_copy_only=False)
        code = np.full(len(et), -1, np.int64)
        for s, k in stage_of.items():
            code[et == s] = k
        m = code >= 0
        if not m.any():
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return pa.table({
            "user_id": pa.array(key),
            "_ts": pa.array(t[ts_col].cast(pa.int64()).to_numpy()[m]),
            "_eid": pa.array(t[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)[m]),
            "_stage": pa.array(code[m]),
            "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"stage": pd.Series([], dtype=np.int64),
                                 "users": pd.Series([], dtype=np.int64)})
        key = g["user_id"].to_numpy()
        order = np.lexsort((g["_eid"].to_numpy(), g["_ts"].to_numpy(), key))
        u = key[order]
        st = g["_stage"].to_numpy()[order]
        seg_start = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg_end = np.r_[seg_start[1:], len(u)]
        prev = seg_start - 1          # last consumed row index per user
        reached = np.ones(len(seg_start), bool)
        counts = np.zeros(n_stage, np.int64)
        for k in range(n_stage):
            pk = np.flatnonzero(st == k)
            if len(pk) == 0:
                break
            lo = np.searchsorted(pk, prev + 1)
            cand = pk[np.minimum(lo, len(pk) - 1)]
            ok = reached & (lo < len(pk)) & (cand < seg_end)
            prev = np.where(ok, cand, prev)
            reached = ok
            counts[k] = int(ok.sum())
            if counts[k] == 0:
                break
        return pd.DataFrame({"stage": np.arange(1, n_stage + 1,
                                                dtype=np.int64),
                             "users": counts})

    parts = (events.map_batches(slim, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("_shard").map_groups(per_shard, batch_format="pandas")
             .to_pandas())  # len(stages) rows per shard
    if len(parts) == 0:
        tot = np.zeros(n_stage, np.int64)
    else:
        tot = (parts.groupby("stage", sort=True)["users"].sum()
               .reindex(np.arange(1, n_stage + 1), fill_value=0)
               .to_numpy(np.int64))
    return pa.table({"stage": pa.array(np.arange(1, n_stage + 1,
                                                 dtype=np.int64)),
                     "event_type": pa.array(list(stages)),
                     "users": pa.array(tot)})


def cohort_retention(events: rd.Dataset, *, week_us: int = 7 * 86400 * 1_000_000,
                     key_col: str = "user_id", ts_col: str = "ts",
                     n_shards: int | None = None) -> rd.Dataset:
    """Cohort retention — the product-analytics matrix: each user's
    cohort is their FIRST active week (epoch week of min event time);
    for every (cohort_week, week_offset) count the users active in
    cohort_week + offset.  Offset 0 row = cohort size.  Output
    (cohort_week, week_offset, n_users).

    Scale shape: per-batch pre-dedup to (user, week) pairs (the heavy
    fold: ~k events/user/week leave the scan as one row), ONE hash(user)
    shard exchange; in-shard per-user min week (cohort) + distinct-week
    offsets, emitting (cohort, offset) PARTIAL counts bounded by
    weeks^2 per shard, merged in the same map_groups output by a
    bounded driver-side groupby downstream of the returned Dataset —
    here folded by a second tiny hash(cohort,offset) merge so the
    result is already final.  All-integer weeks (nonneg epoch), so the
    SQL twin (``oracle.cohort_retention_sql``) is exact."""
    n_shards = resolve_shards(n_shards)
    wus = np.int64(week_us)

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "_week": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        week = t[ts_col].cast(pa.int64()).to_numpy() // wus
        uw = np.unique(np.stack([key, week], axis=1), axis=0)
        return pa.table({"user_id": pa.array(uw[:, 0]),
                         "_week": pa.array(uw[:, 1]),
                         "_shard": pa.array((uw[:, 0] % n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"cohort_week": pd.Series([], dtype=np.int64),
                              "week_offset": pd.Series([], dtype=np.int64),
                              "n_users": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        u = g["user_id"].to_numpy()
        w = g["_week"].to_numpy()
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        uu = np.unique(np.stack([u, w], axis=1), axis=0)  # cross-batch dedup
        u, w = uu[:, 0], uu[:, 1]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        cohort = np.repeat(w[starts], np.diff(np.r_[starts, len(u)]))
        off = w - cohort
        key = cohort * 100_000 + off
        uk, counts = np.unique(key, return_counts=True)
        return pd.DataFrame({"cohort_week": (uk // 100_000).astype(np.int64),
                             "week_offset": (uk % 100_000).astype(np.int64),
                             "n_users": counts.astype(np.int64)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"cohort_week": pd.Series([], dtype=np.int64),
                                 "week_offset": pd.Series([], dtype=np.int64),
                                 "n_users": pd.Series([], dtype=np.int64)})
        agg = (g.groupby(["cohort_week", "week_offset"], sort=True)
               ["n_users"].sum().reset_index())
        return agg.astype(np.int64)

    parts = (events.map_batches(slim, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("_shard").map_groups(per_shard, batch_format="pandas"))

    def add_shard2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cohort_week" not in t.column_names:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64()),
                             "_shard2": pa.array([], pa.int64())})
        cw = t["cohort_week"].to_numpy()
        return t.append_column("_shard2",
                               pa.array((cw % n_shards).astype(np.int64)))

    return (parts.map_batches(add_shard2, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("_shard2").map_groups(merge, batch_format="pandas"))


def windowed_topk_types(events: rd.Dataset, *, window_s: int = 3600,
                        k: int = 3, ts_col: str = "ts",
                        type_col: str = "event_type",
                        n_shards: int | None = None) -> pa.Table:
    """Per tumbling window, the top ``k`` event types by count — the
    streaming-analytics "trending now" primitive (windowed heavy
    hitters), deterministic under the (count DESC, type) composite so
    the cut is reproducible.  Output (window_start_us, event_type, n,
    rank) sorted by (window, rank).

    Plan: per-batch (window, type) count partials via one lexsort +
    reduceat (bounded by windows x types per batch — the heavy fold
    happens before any wire); ONE hash(window) exchange sums partials
    and keeps the per-window top-k in-shard (a window lives in exactly
    one shard, so the cut is final there); driver merge <= k rows per
    window.  SQL twin ``oracle.windowed_topk_sql`` (row_number over
    grouped counts)."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    w_us = np.int64(window_s) * 1_000_000

    part_schema = pa.schema([("_w", pa.int64()), ("_ty", pa.string()),
                             ("_n", pa.int64()), ("_shard", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or ts_col not in t.column_names:
            return part_schema.empty_table()
        us = t[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = (us // w_us) * w_us
        ty = t[type_col].to_numpy(zero_copy_only=False)
        uty, tyc = np.unique(ty, return_inverse=True)
        order = np.lexsort((tyc, w))
        ws, cs = w[order], tyc[order]
        new = np.r_[True, (ws[1:] != ws[:-1]) | (cs[1:] != cs[:-1])]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(ws)]).astype(np.int64)
        wk = ws[starts]
        with np.errstate(over="ignore"):
            h = wk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({
            "_w": pa.array(wk),
            "_ty": pa.array(uty[cs[starts]], pa.string()),
            "_n": pa.array(n),
            "_shard": pa.array(((h >> np.uint64(33)) % np.uint64(n_shards))
                               .astype(np.int64))}).cast(part_schema)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "window_start_us": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        s = (g.groupby(["_w", "_ty"], sort=False)["_n"].sum()
             .reset_index())
        w = s["_w"].to_numpy(np.int64)
        n = s["_n"].to_numpy(np.int64)
        ty = s["_ty"].to_numpy(object)
        order = np.lexsort((ty, -n, w))    # per window: count DESC, type
        w, n, ty = w[order], n[order], ty[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        gid = np.cumsum(np.r_[0, w[1:] != w[:-1]])
        rank = np.arange(len(w), dtype=np.int64) - starts[gid] + 1
        keep = rank <= k
        return pd.DataFrame({"window_start_us": w[keep],
                             "event_type": ty[keep],
                             "n": n[keep], "rank": rank[keep]})

    out = (events.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(topk, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "window_start_us" not in out.columns:
        return pa.table({"window_start_us": pa.array([], pa.int64()),
                         "event_type": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    order = np.lexsort((out["rank"].to_numpy(np.int64),
                        out["window_start_us"].to_numpy(np.int64)))
    out = out.iloc[order]
    return pa.table({
        "window_start_us": pa.array(out["window_start_us"]
                                    .to_numpy(np.int64)),
        "event_type": pa.array(out["event_type"].to_numpy(object),
                               pa.string()),
        "n": pa.array(out["n"].to_numpy(np.int64)),
        "rank": pa.array(out["rank"].to_numpy(np.int64))})


def trajectory_similarity(events: rd.Dataset, *, depth: int, world,
                          theta_num: int = 1, theta_den: int = 5,
                          key_col: str = "user_id", id_col: str = "event_id",
                          n_shards: int | None = None) -> rd.Dataset:
    """Movement-footprint similarity — the geo x set-similarity fusion:
    users whose visited-TILE sets (Morton keys at ``depth``, the
    user_tile_visits geometry) have Jaccard >= theta_num/theta_den,
    EXACT.  Output (user_a, user_b, inter, union_n, jaccard6).

    Plan: per-batch distinct (user, tile) fold (the heavy reduction —
    at most one row per batch x user x tile leaves the scan), ONE
    hash(user) exchange folds each user's sorted-unique tile set; the
    bounded per-user state (<= 4^depth tiles/user) feeds
    ``dedup.exact_set_join_sets`` — the shared prefix-filter +
    length-band candidate core and parallel integer verify.  SQL twin
    ``oracle.trajectory_similarity_sql`` (unfiltered brute over the
    user_tile_visits CTE)."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.pipelines.dedup import exact_set_join_sets
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def pairs_slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"_u": pa.array([], pa.int64()),
                          "_tile": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        tile = point_cell2(x, y, world, depth).astype(np.int64)
        order = np.lexsort((tile, key))
        k2, t2 = key[order], tile[order]
        keep = np.r_[True, (k2[1:] != k2[:-1]) | (t2[1:] != t2[:-1])]
        k2, t2 = k2[keep], t2[keep]
        with np.errstate(over="ignore"):
            h = k2.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table({"_u": pa.array(k2), "_tile": pa.array(t2),
                         "_shard": pa.array(((h >> np.uint64(33))
                                             % np.uint64(n_shards))
                                            .astype(np.int64))})

    def fold_sets(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_u": pd.Series([], dtype=np.int64),
                              "_tiles": pd.Series([], dtype=object)})
        if len(g) == 0:
            return empty
        u = g["_u"].to_numpy(np.int64)
        tl = g["_tile"].to_numpy(np.int64)
        order = np.lexsort((tl, u))
        u, tl = u[order], tl[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (tl[1:] != tl[:-1])]
        u, tl = u[keep], tl[keep]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        return pd.DataFrame({
            "_u": u[starts],
            "_tiles": [tl[s:e] for s, e in zip(starts, ends)]})

    per_user = (events.map_batches(pairs_slim, batch_format="pyarrow",
                                   zero_copy_batch=True)
                .groupby("_shard").map_groups(fold_sets,
                                              batch_format="pandas")
                .to_pandas())
    if len(per_user) == 0 or "_u" not in per_user.columns:
        return rd.from_arrow(pa.table({
            "user_a": pa.array([], pa.int64()),
            "user_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "union_n": pa.array([], pa.int64()),
            "jaccard6": pa.array([], pa.int64())}))
    per_user = per_user.sort_values("_u")
    ids = per_user["_u"].to_numpy(np.int64)
    sets = list(per_user["_tiles"])
    lens = np.fromiter((len(s) for s in sets), np.int64, count=len(sets))
    offs = np.zeros(len(sets) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = (np.concatenate(sets) if len(sets) else
            np.zeros(0, np.int64)).astype(np.uint64)
    return exact_set_join_sets(ids, offs[:-1], offs[1:], flat,
                               theta_num=theta_num, theta_den=theta_den,
                               out_a="user_a", out_b="user_b")


def resample_interpolate(events: rd.Dataset, *, key_col: str = "user_id",
                         ts_col: str = "ts", id_col: str = "event_id",
                         value_col: str = "value", step_s: int = 3600,
                         n_shards: int | None = None) -> rd.Dataset:
    """Per-key time-series resampling with linear interpolation — the
    sensor gap-fill / feature-grid op: for every key, emit the value at
    each step_s-aligned grid instant inside the key's observed span,
    linearly interpolated between the surrounding observations.

    Exactness discipline: timestamps truncate to whole seconds and
    values quantize to fixed-point millionths (v6); duplicate (key,
    second) observations collapse last-writer-wins (max event_id); the
    interpolant v6p + floor((v6n - v6p) * (g - tp) / (tn - tp)) is pure
    int64 (products bounded by v6-range * span_s), so the SQL twin
    ``oracle.resample_interpolate_sql`` matches bit-for-bit (numpy //
    floors; DuckDB // truncates, the oracle uses the mod-adjust floor
    formula from the repo notes).

    Plan: slim (key, t, v6, eid) rows with in-batch last-writer
    pre-collapse, ONE hash(key) exchange, then SEGMENT-LOCAL grid
    emission per shard (consecutive-observation pairs own their grid
    points: no search structure, no per-key Python, output rows are
    never joined back).  Output (user_id, gts, v6_interp) — gts is the
    epoch-second grid instant."""
    n_shards = resolve_shards(n_shards)
    step = np.int64(step_s)

    slim_schema = pa.schema([("user_id", pa.int64()), ("_t", pa.int64()),
                             ("_v6", pa.int64()), ("_eid", pa.int64()),
                             ("_shard", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return slim_schema.empty_table()
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sec = ts // np.int64(1_000_000)
        v6 = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                      * 1e6 + 0.5).astype(np.int64)
        # in-batch last-writer pre-collapse on (key, second)
        order = np.lexsort((eid, sec, key))
        key, sec, v6, eid = key[order], sec[order], v6[order], eid[order]
        last = np.r_[(key[1:] != key[:-1]) | (sec[1:] != sec[:-1]), True]
        key, sec, v6, eid = key[last], sec[last], v6[last], eid[last]
        return pa.table({"user_id": pa.array(key), "_t": pa.array(sec),
                         "_v6": pa.array(v6), "_eid": pa.array(eid),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    out_cols = [("user_id", np.int64), ("gts", np.int64),
                ("v6_interp", np.int64)]

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in out_cols})
        key = g["user_id"].to_numpy()
        t = g["_t"].to_numpy()
        v6 = g["_v6"].to_numpy()
        eid = g["_eid"].to_numpy()
        order = np.lexsort((eid, t, key))
        key, t, v6 = key[order], t[order], v6[order]
        last = np.r_[(key[1:] != key[:-1]) | (t[1:] != t[:-1]), True]
        key, t, v6 = key[last], t[last], v6[last]
        # consecutive-pair segments (within key) own [ceil(t), tn)
        pair = np.r_[key[1:] == key[:-1], False]
        tn = np.r_[t[1:], 0]
        vn = np.r_[v6[1:], 0]
        g0 = ((t + step - 1) // step) * step
        g1 = np.where(pair, ((tn - 1) // step) * step,
                      np.where(t % step == 0, t, g0 - step))
        counts = np.maximum((g1 - g0) // step + 1, 0)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame({c: pd.Series([], dtype=d)
                                 for c, d in out_cols})
        rep = np.repeat(np.arange(len(t)), counts)
        k = (np.arange(total, dtype=np.int64)
             - np.repeat(np.cumsum(counts) - counts, counts))
        gt = g0[rep] + k * step
        den = np.where(pair[rep], tn[rep] - t[rep], 1)
        num = np.where(pair[rep], (vn[rep] - v6[rep]) * (gt - t[rep]), 0)
        return pd.DataFrame({"user_id": key[rep].astype(np.int64),
                             "gts": gt.astype(np.int64),
                             "v6_interp": (v6[rep] + num // den)
                             .astype(np.int64)})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(per_shard,
                                          batch_format="pandas"))


def mad_outliers(events: rd.Dataset, *, key_col: str = "event_type",
                 id_col: str = "event_id", value_col: str = "value",
                 k: int = 3, n_shards: int | None = None) -> pa.Table:
    """Robust per-key outlier listing — the streaming-quality audit
    (sensor/metric anomaly flags): events whose cents-quantized value
    deviates from the key's LOWER MEDIAN by more than ``k`` times the
    key's MAD (lower median of absolute deviations) — the
    robust_quality_stats order statistics turned into a row filter,
    integer end to end (no sigma, no sqrt, no float compare).  Output
    (event_id, key, v_cents, med_cents, mad_cents, dev), event order.

    Plan: ONE hash(key) exchange of slim (key, id, v_cents) rows; a
    key's events co-locate, so median, MAD and the filter are in-shard
    lexsorts + gathers; only the outliers leave the shard.  SQL twin
    ``oracle.mad_outliers_sql`` (row_number order statistics)."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([
        ("event_id", pa.int64()), ("key", pa.string()),
        ("v_cents", pa.int64()), ("med_cents", pa.int64()),
        ("mad_cents", pa.int64()), ("dev", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.string()),
                          "id": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or value_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False)
        v = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        h = pd.util.hash_pandas_object(pd.Series(key),
                                       index=False).to_numpy()
        return pa.table({
            "key": pa.array(key.astype(str)),
            "id": t[id_col].cast(pa.int64()),
            "v": pa.array(v),
            "_shard": pa.array((h % np.uint64(n_shards))
                               .astype(np.int64))})

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=str),
            "v_cents": pd.Series([], dtype=np.int64),
            "med_cents": pd.Series([], dtype=np.int64),
            "mad_cents": pd.Series([], dtype=np.int64),
            "dev": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        key = g["key"].to_numpy()
        ids = g["id"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        order = np.lexsort((v, key))
        key, ids, v = key[order], ids[order], v[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        lens = np.diff(np.r_[starts, len(key)])
        # lower median per key: 1-based rank (n+1)//2 within the run
        med = v[starts + (lens + 1) // 2 - 1]
        med_of = np.repeat(med, lens)
        av = np.abs(v - med_of)
        # MAD: lower median of deviations, second in-run sort
        order2 = np.lexsort((av, key))
        av_s = av[order2]
        mad = av_s[starts + (lens + 1) // 2 - 1]
        mad_of = np.repeat(mad, lens)
        hit = av > k * mad_of
        return pd.DataFrame({"event_id": ids[hit], "key": key[hit],
                             "v_cents": v[hit], "med_cents": med_of[hit],
                             "mad_cents": mad_of[hit], "dev": av[hit]})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_key, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "event_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("event_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def activity_streaks(events: rd.Dataset, *, key_col: str = "user_id",
                     ts_col: str = "ts",
                     n_shards: int | None = None) -> pa.Table:
    """Gap-and-islands engagement profile — per user: the number of
    distinct active days and the LONGEST run of consecutive active
    days (ties broken toward the earliest run).  The classic retention
    feature (daily-active streaks) as one integer exchange.  Output
    (user_id, n_active_days, longest_streak, streak_end_day) with the
    day as int64 days-since-epoch, user order.

    Plan: slim (user, day) rows, ONE hash(user) exchange; in-shard a
    single lexsort dedups days, splits islands (day step != 1 or user
    change), and reduceats run lengths — the SQL row_number-difference
    trick becomes a vectorized diff.  Only one row per user leaves the
    shard.  SQL twin ``oracle.activity_streaks_sql``."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_active_days", pa.int64()),
        ("longest_streak", pa.int64()), ("streak_end_day", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or ts_col not in t.column_names:
            return empty
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = (t[ts_col].to_numpy().astype("datetime64[D]")
             .astype(np.int64))
        h = u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(33)
        return pa.table({"u": pa.array(u), "d": pa.array(d),
                         "_shard": pa.array((h % np.uint64(n_shards))
                                            .astype(np.int64))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("user_id", "n_active_days", "longest_streak",
                "streak_end_day")
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        u = g["u"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]  # distinct (user, day)
        # island break: user change or day step != 1
        brk = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)]
        rs = np.flatnonzero(brk)
        rlen = np.diff(np.r_[rs, len(u)])
        ru = u[rs]
        rend = d[rs + rlen - 1]
        # per-user fold over runs (runs are user-then-day ordered)
        gs = np.flatnonzero(np.r_[True, ru[1:] != ru[:-1]])
        gid = np.cumsum(np.r_[False, ru[1:] != ru[:-1]])
        maxlen = np.maximum.reduceat(rlen, gs)
        ndays = np.add.reduceat(rlen, gs)
        cand = np.flatnonzero(rlen == maxlen[gid])
        cg = gid[cand]
        firsts = cand[np.r_[True, cg[1:] != cg[:-1]]]
        return pd.DataFrame({"user_id": ru[gs],
                             "n_active_days": ndays,
                             "longest_streak": rlen[firsts],
                             "streak_end_day": rend[firsts]})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard,
                                         batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def peak_concurrency(events: rd.Dataset, *, key_col: str = "event_type",
                     ts_col: str = "ts", value_col: str = "value",
                     base_s: int = 60, span_s: int = 3600,
                     n_shards: int | None = None) -> pa.Table:
    """Sweep-line load profile — per key: the PEAK number of
    simultaneously open sessions and the earliest microsecond it is
    reached (half-open intervals [start, end)).  Session length is a
    deterministic pure function of the row so both engines derive it
    identically: end = start + (base_s + |v_cents| % span_s) seconds.
    Output (key, n_events, peak, peak_ts_us), key order.

    Plan: per-batch endpoint expansion (+1 start / -1 end rows), ONE
    hash(key) exchange; in-shard a single lexsort + equal-timestamp
    delta fold + cumsum gives the concurrency step function — each
    key's deltas sum to zero, so the global cumsum restarts at 0 at
    every key boundary and needs no per-key offset.  Only one row per
    key leaves the shard.  SQL twin ``oracle.peak_concurrency_sql``
    (window cumulative sum over the folded endpoint deltas)."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([
        ("key", pa.string()), ("n_events", pa.int64()),
        ("peak", pa.int64()), ("peak_ts_us", pa.int64())])

    def endpoints(t: pa.Table) -> pa.Table:
        empty = pa.table({"key": pa.array([], pa.string()),
                          "pt": pa.array([], pa.int64()),
                          "delta": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or ts_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False).astype(str)
        s = t[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = np.abs(np.floor(t[value_col].to_numpy(zero_copy_only=False)
                            * 100.0 + 0.5).astype(np.int64))
        e = s + (base_s + v % span_s) * 1_000_000
        k2 = np.r_[key, key]
        h = pd.util.hash_pandas_object(pd.Series(k2),
                                       index=False).to_numpy()
        return pa.table({
            "key": pa.array(k2),
            "pt": pa.array(np.r_[s, e]),
            "delta": pa.array(np.r_[np.ones(len(s), np.int64),
                                    -np.ones(len(s), np.int64)]),
            "_shard": pa.array((h % np.uint64(n_shards))
                               .astype(np.int64))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = ("key", "n_events", "peak", "peak_ts_us")
        if len(g) == 0:
            return pd.DataFrame({
                "key": pd.Series([], dtype=str),
                "n_events": pd.Series([], dtype=np.int64),
                "peak": pd.Series([], dtype=np.int64),
                "peak_ts_us": pd.Series([], dtype=np.int64)})
        key = g["key"].to_numpy()
        pt = g["pt"].to_numpy(np.int64)
        delta = g["delta"].to_numpy(np.int64)
        order = np.lexsort((pt, key))
        key, pt, delta = key[order], pt[order], delta[order]
        n_starts = np.where(delta > 0, delta, 0)
        # fold equal (key, pt) points: net delta per distinct point
        new = np.r_[True, (key[1:] != key[:-1]) | (pt[1:] != pt[:-1])]
        pid = np.cumsum(new) - 1
        nd = np.zeros(int(pid[-1]) + 1, np.int64)
        np.add.at(nd, pid, delta)
        ns = np.zeros_like(nd)
        np.add.at(ns, pid, n_starts)
        ps = np.flatnonzero(new)
        key, pt = key[ps], pt[ps]
        conc = np.cumsum(nd)  # restarts at 0 per key (deltas sum to 0)
        gs = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        gid = np.cumsum(np.r_[False, key[1:] != key[:-1]])
        mx = np.maximum.reduceat(conc, gs)
        nev = np.add.reduceat(ns, gs)
        cand = np.flatnonzero(conc == mx[gid])
        cg = gid[cand]
        firsts = cand[np.r_[True, cg[1:] != cg[:-1]]]
        return pd.DataFrame({"key": key[gs], "n_events": nev,
                             "peak": mx, "peak_ts_us": pt[firsts]})

    out = (events.map_batches(endpoints, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard,
                                         batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "key" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("key").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def trajectory_diameter(events: rd.Dataset, *, key_col: str = "user_id",
                        id_col: str = "event_id",
                        n_shards: int | None = None) -> pa.Table:
    """Per-user trajectory DIAMETER — the max pairwise point distance
    (squared, micro-rounded): the roaming-range feature bounding boxes
    overstate (a diagonal cloud fills a bbox its diameter doesn't).
    Points derive from event_id by the shared driver-table formula, so
    both engines see identical doubles; each pair's d2 = dx*dx + dy*dy
    is a fixed three-op IEEE expression (no accumulation), and max is
    order-independent — exact across engines, rounded only for repr.
    Output (user_id, n_points, diam2_6 = floor(max d2 * 1e6 + 0.5)),
    user order; single-point users report 0.

    Plan: ONE hash(user) exchange of slim (user, x, y) rows; in-shard
    the all-pairs expansion is the vectorized run-pair gather (the
    copurchase/link-prediction kernel shape) + one maximum.reduceat —
    no per-user Python.  O(m^2) per user by construction: the
    documented partitioning assumption is bounded per-key trajectory
    length (pre-aggregate to per-tile visit sets first when keys are
    unbounded).  SQL twin ``oracle.trajectory_diameter_sql``."""
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_points", pa.int64()),
        ("diam2_6", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        return pa.table({"u": pa.array(u), "x": pa.array(x),
                         "y": pa.array(y),
                         "_shard": pa.array(_shard_of_keys(u, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_points": pd.Series([], dtype=np.int64),
                "diam2_6": pd.Series([], dtype=np.int64)})
        u = g["u"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        order = np.argsort(u, kind="stable")
        u, x, y = u[order], x[order], y[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        run_end = np.repeat(starts + lens, lens)
        cnt = run_end - np.arange(len(u)) - 1
        li = np.repeat(np.arange(len(u)), cnt)
        cum = np.r_[0, np.cumsum(cnt)]
        rj = np.arange(int(cum[-1])) - cum[li] + li + 1
        dx = x[li] - x[rj]
        dy = y[li] - y[rj]
        d2 = dx * dx + dy * dy
        # per-user max over its contiguous pair block
        pair_user_starts = cum[starts]
        diam = np.zeros(len(starts), np.float64)
        has = lens > 1
        if has.any():
            ps = pair_user_starts[has].astype(np.int64)
            seg_max = np.maximum.reduceat(d2, ps)
            diam[has] = seg_max
        return pd.DataFrame({
            "user_id": u[starts], "n_points": lens.astype(np.int64),
            "diam2_6": np.floor(diam * 1e6 + 0.5).astype(np.int64)})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard,
                                         batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def cusum_alarms(events: rd.Dataset, *, key_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value", h_cents: int = 30_000,
                 n_shards: int | None = None) -> pa.Table:
    """One-sided CUSUM changepoint detection per key — the classic
    sequential drift monitor (Page 1954): over the key's time-ordered
    cents-quantized values, s_t = max(0, s_{t-1} + (v_t - mean)) and an
    alarm fires when s_t >= h.  Integer-exact end to end: deviations
    scale to d_t = n*v_t - S (the morans_i z trick), which scales s and
    the threshold by n too — alarms compare s_t >= h_cents * n, all
    int64, no float anywhere.

    The recursion is NOT computed sequentially: with P_t = sum(d_1..t),
    the max(0, ...) fold collapses to s_t = P_t - min(0, min_{j<=t}
    P_j) — two vectorized prefix scans (cumsum + cummin), the same
    shape the SQL twin states in window functions
    (``oracle.cusum_alarms_sql``).

    Output per key: (user_id, n_events, n_alarms, first_alarm_seq
    [1-based position in the key's (ts, id) order, -1 if none],
    max_s), key order.

    Plan: ONE hash(key) exchange of slim (key, ts, id, v) rows; a
    key's events co-locate, so both scans are in-shard pandas
    groupby.cumsum/cummin (C kernels); only one summary row per key
    leaves the shard."""
    n_shards = resolve_shards(n_shards)
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_events", pa.int64()),
        ("n_alarms", pa.int64()), ("first_alarm_seq", pa.int64()),
        ("max_s", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or value_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy()
        v = np.floor(t[value_col].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "u": pa.array(u), "ts": pa.array(ts),
            "id": t[id_col].cast(pa.int64()),
            "v": pa.array(v),
            "_shard": pa.array(_shard_of_keys(u, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64),
            "n_alarms": pd.Series([], dtype=np.int64),
            "first_alarm_seq": pd.Series([], dtype=np.int64),
            "max_s": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        g = g.sort_values(["u", "ts", "id"], kind="stable")
        grp = g.groupby("u", sort=True)
        n = grp["v"].transform("size").to_numpy(np.int64)
        tot = grp["v"].transform("sum").to_numpy(np.int64)
        g["d"] = n * g["v"].to_numpy(np.int64) - tot
        p = grp["d"].cumsum()
        g["p"] = p
        runmin = g.groupby("u", sort=True)["p"].cummin().to_numpy(np.int64)
        s = p.to_numpy(np.int64) - np.minimum(0, runmin)
        alarm = s >= h_cents * n
        u = g["u"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        seq = np.arange(len(u), dtype=np.int64) - np.repeat(starts, lens) + 1
        uids = u[starts]
        n_alarms = np.add.reduceat(alarm.astype(np.int64), starts)
        first = np.where(alarm, seq, np.int64(1) << 60)
        first_min = np.minimum.reduceat(first, starts)
        first_min = np.where(n_alarms > 0, first_min, -1)
        max_s = np.maximum.reduceat(s, starts)
        return pd.DataFrame({
            "user_id": uids, "n_events": lens.astype(np.int64),
            "n_alarms": n_alarms, "first_alarm_seq": first_min,
            "max_s": max_s})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values("user_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def stay_points(events: rd.Dataset, *, radius: float = 30_000.0,
                min_points: int = 2, min_dur_us: int = 0,
                key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id",
                n_shards: int | None = None) -> pa.Table:
    """Trajectory stay-point (dwell) detection — the Li/Zheng mobility
    primitive: per key, for each ANCHOR point i in (ts, id) order, the
    window [i..jmax] where every subsequent point through jmax stays
    within ``radius`` of the anchor (jmax = the point before the FIRST
    violation, maximal prefix semantics — well-defined and closed-form,
    unlike the classic advance-i heuristic).  Emits anchors whose
    window holds >= min_points points and spans >= min_dur_us
    microseconds.  Output (user_id, anchor_event_id, n_in_window,
    dur_us), (user, anchor) order.

    Exactness: points derive from event ids by the shared driver-table
    formula; each pair's d2 is the fixed three-op IEEE expression
    compared to radius^2 (one multiply) — identical violation sets
    across engines; durations are integer microseconds.

    Plan: ONE hash(key) exchange of slim (key, ts, id, x, y) rows;
    in-shard the O(m^2)-per-key pair expansion is the vectorized
    run-pair gather (trajectory_diameter kernel) and the first
    violation per anchor is a masked minimum.reduceat — no per-row
    Python.  Documented partitioning assumption: bounded per-key
    trajectory length.  SQL twin ``oracle.stay_points_sql``."""
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    r2 = radius * radius
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("anchor_event_id", pa.int64()),
        ("n_in_window", pa.int64()), ("dur_us", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t[ts_col].cast(pa.int64()),
            "id": pa.array(eid),
            "x": pa.array(WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx),
            "y": pa.array(WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy),
            "_shard": pa.array(_shard_of_keys(u, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "anchor_event_id": pd.Series([], dtype=np.int64),
            "n_in_window": pd.Series([], dtype=np.int64),
            "dur_us": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        g = g.sort_values(["u", "ts", "id"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ts = g["ts"].to_numpy(np.int64)
        ids = g["id"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        m = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, m])
        run_end = np.repeat(starts + lens, lens)  # one-past-end per row
        cnt = run_end - np.arange(m) - 1          # pairs per anchor
        li = np.repeat(np.arange(m), cnt)
        cum = np.r_[0, np.cumsum(cnt)]
        rj = np.arange(int(cum[-1])) - cum[li] + li + 1
        dx = x[li] - x[rj]
        dy = y[li] - y[rj]
        viol = (dx * dx + dy * dy) > r2
        # first violating partner index per anchor (global row index)
        cand = np.where(viol, rj, m + 1)
        first = np.full(m, m + 1, dtype=np.int64)
        has = cnt > 0
        if has.any():
            first[has] = np.minimum.reduceat(cand, cum[:-1][has])
        jmax = np.where(first <= m, first - 1, run_end - 1)
        n_in = jmax - np.arange(m) + 1
        dur = ts[jmax] - ts
        keep = (n_in >= min_points) & (dur >= min_dur_us)
        return pd.DataFrame({
            "user_id": u[keep], "anchor_event_id": ids[keep],
            "n_in_window": n_in[keep].astype(np.int64),
            "dur_us": dur[keep].astype(np.int64)})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["user_id", "anchor_event_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def douglas_peucker(events: rd.Dataset, *, eps: float = 20_000.0,
                    key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id",
                    n_shards: int | None = None) -> pa.Table:
    """Douglas-Peucker polyline simplification per key — THE classic
    cartographic line-generalization operator: keep a trajectory's
    endpoints; recursively keep the interior point farthest from the
    current segment's LINE while that distance exceeds ``eps``
    (line-distance variant, so the split test is the exact
    cross-product inequality cross^2 > eps^2 * len2 — three fixed IEEE
    expressions, no sqrt, no division; ties at the max go to the
    lowest sequence position).  Output the kept points
    (user_id, event_id, seq), (user, seq) order; single-point keys
    keep their point.

    Plan: ONE hash(key) exchange; in-shard the recursion runs
    BREADTH-FIRST over ALL keys' active segments at once — each round
    concatenates every segment's interior range (the run-pair gather
    shape), computes cross^2 in one vector, and picks per-segment
    argmax via maximum.reduceat + masked minimum.reduceat — rounds =
    recursion depth (O(log m) typical), no per-point Python.  SQL twin
    ``oracle.douglas_peucker_sql`` (recursive CTE; kept set = all
    endpoint closure members, which equals the split-point union)."""
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    eps2 = eps * eps
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("seq", pa.int64())])

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.float64()),
                             "y": pa.array([], pa.float64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "u": pa.array(u),
            "ts": t[ts_col].cast(pa.int64()),
            "id": pa.array(eid),
            "x": pa.array(WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx),
            "y": pa.array(WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy),
            "_shard": pa.array(_shard_of_keys(u, n_shards))})

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "event_id": pd.Series([], dtype=np.int64),
            "seq": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        g = g.sort_values(["u", "ts", "id"], kind="stable")
        u = g["u"].to_numpy(np.int64)
        ids = g["id"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.float64)
        y = g["y"].to_numpy(np.float64)
        m = len(u)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, m])
        seq = np.arange(m, dtype=np.int64) - np.repeat(starts, lens) + 1
        kept = np.zeros(m, dtype=bool)
        kept[starts] = True
        kept[starts + lens - 1] = True
        s = starts[lens >= 3]
        e = (starts + lens - 1)[lens >= 3]
        while len(s):
            cnt = e - s - 1
            segi = np.repeat(np.arange(len(s)), cnt)
            cum = np.r_[0, np.cumsum(cnt)]
            ki = np.arange(int(cum[-1])) - cum[segi] + s[segi] + 1
            dxs = x[e] - x[s]
            dys = y[e] - y[s]
            cross = (dxs[segi] * (y[ki] - y[s][segi])
                     - dys[segi] * (x[ki] - x[s][segi]))
            c2 = cross * cross
            maxc2 = np.maximum.reduceat(c2, cum[:-1])
            cand = np.where(c2 == maxc2[segi], ki, m + 1)
            kstar = np.minimum.reduceat(cand, cum[:-1])
            split = maxc2 > eps2 * (dxs * dxs + dys * dys)
            ks = kstar[split]
            kept[ks] = True
            ls, le = s[split], e[split]
            s = np.concatenate([ls[ks - ls >= 2], ks[le - ks >= 2]])
            e = np.concatenate([ks[ks - ls >= 2], le[le - ks >= 2]])
        return pd.DataFrame({"user_id": u[kept], "event_id": ids[kept],
                             "seq": seq[kept]})

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["user_id", "seq"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def _lattice_slim_fn(key_col: str, id_col: str, shift: int,
                     n_shards: int, mx: int, my: int):
    """Batch fn: distinct (key, qx, qy) lattice rows + shard tag, with
    q = ((id * mult) % 2^32) >> shift — the shared hull-family slim."""
    mod = np.int64(1 << 32)
    lat = 1 << (32 - shift)

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({"u": pa.array([], pa.int64()),
                             "qx": pa.array([], pa.int64()),
                             "qy": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = ((eid * np.int64(mx)) % mod) >> np.int64(shift)
        qy = ((eid * np.int64(my)) % mod) >> np.int64(shift)
        packed = (u * lat + qx) * lat + qy       # in-batch distinct
        _, keep = np.unique(packed, return_index=True)
        return pa.table({"u": pa.array(u[keep]), "qx": pa.array(qx[keep]),
                         "qy": pa.array(qy[keep]),
                         "_shard": pa.array(_shard_of_keys(u[keep],
                                                           n_shards))})

    return slim


def _lattice_user_runs(g: "pd.DataFrame", shift: int):
    """Cross-batch distinct + (u, qx, qy) lex sort via ONE packed-int64
    unique; returns (u, qx, qy, starts, ends) run views per key."""
    lat = 1 << (32 - shift)
    u = g["u"].to_numpy(np.int64)
    qx = g["qx"].to_numpy(np.int64)
    qy = g["qy"].to_numpy(np.int64)
    srt = np.unique((u * lat + qx) * lat + qy)
    qy2 = srt % lat
    qx2 = (srt // lat) % lat
    u2 = srt // (lat * lat)
    starts = np.flatnonzero(np.r_[True, u2[1:] != u2[:-1]])
    ends = np.r_[starts[1:], len(u2)]
    return u2, qx2, qy2, starts, ends


def _hull_chain(px: np.ndarray, py: np.ndarray) -> list[int]:
    """Indices of convex-hull vertices in CCW order from the lex-min
    point (strict Andrew monotone chain — collinear boundary points
    are not vertices); input must be lex-sorted by (x, y).  Exact
    Python-int cross products — callers pass integer lattice coords."""
    m = len(px)
    if m == 1:
        return [0]

    def cross(o: int, a: int, b: int) -> int:
        return (int(px[a] - px[o]) * int(py[b] - py[o])
                - int(py[a] - py[o]) * int(px[b] - px[o]))

    lower: list[int] = []
    for i in range(m):
        while len(lower) >= 2 and cross(lower[-2], lower[-1], i) <= 0:
            lower.pop()
        lower.append(i)
    upper: list[int] = []
    for i in range(m - 1, -1, -1):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], i) <= 0:
            upper.pop()
        upper.append(i)
    return lower[:-1] + upper[:-1]


def convex_hull(events: rd.Dataset, *, key_col: str = "user_id",
                id_col: str = "event_id", shift: int = 16,
                n_shards: int | None = None) -> pa.Table:
    """Per-key convex hull over quantized visit locations — the
    classic territory/home-range operator.  Coordinates are EXACT
    INTEGERS by construction: q = ((id * mult) % 2^32) >> shift (the
    driver-table geometry fraction kept on the integer lattice), so
    every orientation test is an exact int64 cross product — no float
    anywhere.  Per key: distinct lattice points, Andrew monotone chain
    with STRICT turns (collinear boundary points are not vertices),
    vertices emitted in CCW order from the lex-min point (lower chain
    (qx, qy) asc incl. both extremes, then upper-chain interior desc),
    doubled shoelace area (exact int, positive).  Output one row per
    hull vertex: (user_id, seq, qx, qy, n_pts, n_vertices, area2),
    (user, seq) order; single-point keys are their own hull.

    Plan: in-batch distinct on packed (key, qx, qy) int64, ONE
    hash(key) exchange of slim lattice rows, per-shard chains
    (documented partitioning assumption: bounded per-key trajectory
    length, as stay_points).  SQL twin ``oracle.convex_hull_sql``
    (supporting-line hull-EDGE test: (a, b) is a CCW hull edge iff
    every other point is strictly left or collinear-within — O(m^3)
    per key at oracle scale only)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS

    n_shards = resolve_shards(n_shards)
    mx, my = GEO_MULTS["x"], GEO_MULTS["y"]
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("seq", pa.int64()),
        ("qx", pa.int64()), ("qy", pa.int64()),
        ("n_pts", pa.int64()), ("n_vertices", pa.int64()),
        ("area2", pa.int64())])

    slim = _lattice_slim_fn(key_col, id_col, shift, n_shards, mx, my)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in ["user_id", "seq", "qx", "qy",
                                        "n_pts", "n_vertices", "area2"]})
        if len(g) == 0:
            return empty
        u2, qx2, qy2, starts, ends = _lattice_user_runs(g, shift)
        rows: list[tuple[int, ...]] = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            px, py = qx2[s:e], qy2[s:e]
            hull = _hull_chain(px, py)
            h = len(hull)
            area2 = sum(
                int(px[hull[i]]) * int(py[hull[(i + 1) % h]])
                - int(px[hull[(i + 1) % h]]) * int(py[hull[i]])
                for i in range(h)) if h >= 3 else 0
            uu, npts = int(u2[s]), e - s
            rows.extend((uu, seq, int(px[j]), int(py[j]), npts, h, area2)
                        for seq, j in enumerate(hull))
        return pd.DataFrame(rows, columns=["user_id", "seq", "qx", "qy",
                                           "n_pts", "n_vertices",
                                           "area2"]).astype(np.int64)

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["user_id", "seq"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def min_obb(events: rd.Dataset, *, key_col: str = "user_id",
            id_col: str = "event_id", shift: int = 16,
            n_shards: int | None = None) -> pa.Table:
    """Minimum-area oriented bounding box per key (rotating calipers):
    over the same exact-integer lattice hull as ``convex_hull``, the
    minimum-area rectangle is flush with some HULL EDGE (the classic
    calipers theorem), so per edge e = v_next - v the candidate area is
    the exact RATIONAL a / l2 with a = (range of proj e.p) * (range of
    proj perp(e).p) and l2 = |e|^2 — the argmin is decided by exact
    integer cross-multiplication a_i * l2_j < a_j * l2_i (ties -> the
    lowest CCW edge seq).  Output one row per key: (user_id, n_pts,
    n_vertices, edge_seq, len2, obb_area_6) with obb_area_6 the
    micro-rounded double a/l2 (the only float, same fixed op chain in
    SQL); single-point keys get (0, 1, 0).  (user) order.

    Plan: the convex_hull exchange fused with the calipers fold in the
    same shard pass — no extra exchange.  SQL twin
    ``oracle.min_obb_sql`` (pairwise NOT EXISTS exact argmin)."""
    from optimizing_ray.sources.driver_tables import GEO_MULTS

    n_shards = resolve_shards(n_shards)
    mx, my = GEO_MULTS["x"], GEO_MULTS["y"]
    out_schema = pa.schema([
        ("user_id", pa.int64()), ("n_pts", pa.int64()),
        ("n_vertices", pa.int64()), ("edge_seq", pa.int64()),
        ("len2", pa.int64()), ("obb_area_6", pa.int64())])
    slim = _lattice_slim_fn(key_col, id_col, shift, n_shards, mx, my)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_pts", "n_vertices", "edge_seq", "len2",
                "obb_area_6"]
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        u2, qx2, qy2, starts, ends = _lattice_user_runs(g, shift)
        rows: list[tuple[int, ...]] = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            px, py = qx2[s:e], qy2[s:e]
            hull = _hull_chain(px, py)
            h = len(hull)
            if h == 1:
                rows.append((int(u2[s]), e - s, 1, 0, 0, 0))
                continue
            hx = [int(px[j]) for j in hull]
            hy = [int(py[j]) for j in hull]
            best = None                      # (a, l2, seq) exact argmin
            for i in range(h):
                ex = hx[(i + 1) % h] - hx[i]
                ey = hy[(i + 1) % h] - hy[i]
                l2 = ex * ex + ey * ey
                us = [ex * x + ey * y for x, y in zip(hx, hy)]
                ws = [-ey * x + ex * y for x, y in zip(hx, hy)]
                a = (max(us) - min(us)) * (max(ws) - min(ws))
                if best is None or a * best[1] < best[0] * l2:
                    best = (a, l2, i)
            a, l2, seq = best
            area6 = int(np.floor(float(a) / float(l2) * 1e6 + 0.5))
            rows.append((int(u2[s]), e - s, h, seq, l2, area6))
        return pd.DataFrame(rows, columns=cols).astype(np.int64)

    out = (events.map_batches(slim, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("_shard").map_groups(per_shard, batch_format="pandas")
           .to_pandas())
    if len(out) == 0 or "user_id" not in out.columns:
        return out_schema.empty_table()
    out = out.sort_values(["user_id"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False,
                                schema=out_schema)


def decayed_counts(events: rd.Dataset, *, ref_us: int, cap_days: int = 30,
                   key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value",
                   n_shards: int | None = None) -> rd.Dataset:
    """Per-key HALF-LIFE-DECAYED count and value at a fixed reference
    instant — the freshness-weighted engagement / trending-score
    aggregate (one-day half-life): an event aged ``d`` whole days at
    ``ref_us`` weighs 2^-d.  EXACT in integers: with ``cap_days`` as
    the common denominator exponent, weight_num = 2^(cap - min(d, cap))
    (ages past the cap saturate at weight 2^-cap, i.e. num 1 — nothing
    is dropped), so the outputs

        decayed_n     = sum weight_num              (x 2^-cap)
        decayed_cents = sum cents * weight_num      (x 2^-cap)

    are plain int64 sums — order-exact across any parallelism and
    bit-identical to the SQL twin ``oracle.decayed_counts_sql``.
    Events after ``ref_us`` are excluded (they haven't happened yet at
    the reference instant).  Values ride the repo's fixed-point cents.

    Overflow guard: 2^cap * max_cents * rows_per_key must stay under
    2^63 — raise ``cap_days`` granularity or pre-bucket for extreme
    keys (asserted per shard).

    Plan: per-batch lexsort+reduceat partials (one row per key per
    batch), ONE hash(key) exchange sums — unbounded key cardinality,
    zero driver materialization.  Output (key, n_events, decayed_n,
    decayed_cents)."""
    n_shards = resolve_shards(n_shards, floor=64)
    us_day = 86_400_000_000
    cap = int(cap_days)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "wn": pa.array([], pa.int64()),
                          "wv": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        keep = ts <= ref_us
        if not keep.any():
            return empty
        key, ts = key[keep], ts[keep]
        cents = np.floor(t[value_col].to_numpy(
            zero_copy_only=False)[keep] * 100.0 + 0.5).astype(np.int64)
        age = np.minimum((ref_us - ts) // us_day, cap)
        w = np.int64(1) << (cap - age)
        assert int(w.max(initial=0)) * max(int(cents.max(initial=0)), 1) \
            < (1 << 62) // max(len(key), 1), \
            "decayed_counts: 2^cap * cents * rows overflows int64 — " \
            "lower cap_days or pre-bucket"
        order = np.argsort(key, kind="stable")
        k, w, c = key[order], w[order], cents[order]
        runs = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        uk = k[runs]
        return pa.table({
            key_col: pa.array(uk),
            "n": pa.array(np.diff(np.r_[runs, len(k)]).astype(np.int64)),
            "wn": pa.array(np.add.reduceat(w, runs)),
            "wv": pa.array(np.add.reduceat(w * c, runs)),
            "_shard": pa.array(_shard_of_keys(uk, n_shards))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "decayed_n": pd.Series([], dtype=np.int64),
                                 "decayed_cents": pd.Series([],
                                                            dtype=np.int64)})
        out = (g.groupby(key_col, as_index=False)
               .agg(n_events=("n", "sum"), decayed_n=("wn", "sum"),
                    decayed_cents=("wv", "sum")))
        return out.astype(np.int64)

    return (events.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(merge, batch_format="pandas"))


def emerging_hotspots(events: rd.Dataset, *, depth: int, world,
                      t0_us: int, n_days: int = 30, s_threshold: int = 60,
                      id_col: str = "event_id", ts_col: str = "ts",
                      x_col: str | None = None) -> pa.Table:
    """Emerging-hot-spot analysis (the space-time-cube + Mann-Kendall
    pairing of classic GIS suites): per occupied Morton tile, the
    Mann-Kendall trend statistic of its DAILY event counts over the
    fixed window [t0_us, t0_us + n_days days)

        S = sum over day pairs i < j of sign(c_j - c_i)

    (missing days count 0 — the dense space-time cube), classified
    intensifying (+1, S >= s_threshold), diminishing (-1,
    S <= -s_threshold) or stable (0).  All-integer, order-exact.
    Events outside the window are excluded by contract (the fixed
    window is what makes the day grid — and so S — deterministic).
    Output (tile, n_events, mk_s, trend), tile order.

    Plan: per-batch (tile, day) count partials (one lexsort+reduceat),
    bounded driver merge (<= 4^depth * n_days rows — the morans_i
    class), then the pairwise sign fold is one (cells, days, days)
    broadcasted difference driver-side.  At depths past the dense
    budget the same partials feed a hash(tile) exchange with the
    per-tile fold in-shard (documented).  SQL twin
    ``oracle.emerging_hotspots_sql``."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    us_day = 86_400_000_000
    wx, wy, _ = world.size

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"tile": pa.array([], pa.int64()),
                          "day": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or id_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts - t0_us) // us_day
        keep = (day >= 0) & (day < n_days)
        if not keep.any():
            return empty
        eid, day = eid[keep], day[keep]
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        tile = point_cell2(x, y, world, depth).astype(np.int64)
        order = np.lexsort((day, tile))
        t2, d2 = tile[order], day[order]
        starts = np.flatnonzero(
            np.r_[True, (t2[1:] != t2[:-1]) | (d2[1:] != d2[:-1])])
        return pa.table({
            "tile": pa.array(t2[starts]),
            "day": pa.array(d2[starts]),
            "n": pa.array(np.diff(np.r_[starts, len(t2)])
                          .astype(np.int64))})

    parts = [p for p in ray.get(
        events.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if p.num_rows]
    schema = pa.schema([("tile", pa.int64()), ("n_events", pa.int64()),
                        ("mk_s", pa.int64()), ("trend", pa.int64())])
    if not parts:
        return schema.empty_table()
    tab = pa.concat_tables(parts)
    tile = tab["tile"].to_numpy(zero_copy_only=False)
    day = tab["day"].to_numpy(zero_copy_only=False)
    n = tab["n"].to_numpy(zero_copy_only=False)
    utile, tinv = np.unique(tile, return_inverse=True)
    C = np.zeros((len(utile), n_days), np.int64)
    np.add.at(C, (tinv, day), n)
    diff = np.sign(C[:, None, :] - C[:, :, None])  # (cells, i, j)
    iu = np.triu_indices(n_days, 1)
    S = diff[:, iu[0], iu[1]].sum(axis=1).astype(np.int64)
    trend = np.where(S >= s_threshold, 1,
                     np.where(S <= -s_threshold, -1, 0)).astype(np.int64)
    return pa.table({"tile": pa.array(utile),
                     "n_events": pa.array(C.sum(axis=1)),
                     "mk_s": pa.array(S),
                     "trend": pa.array(trend)}, schema=schema)


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — fixed rational Benford
# probabilities, part of the operator contract (hardcoded identically
# in oracle.benford_audit_sql) so the deviation statistic is exact
BENFORD_P6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991,
              51152, 45757)


def benford_audit(events: rd.Dataset, *, key_col: str = "event_type",
                  value_col: str = "value") -> pa.Table:
    """Benford first-digit audit per key — the classic fraud /
    data-fabrication screen: distribution of the first significant
    digit of the value (in cents; zero/negative cents excluded) vs the
    Benford expectation, with the scaled sum of absolute deviations

        sad_num = sum_d | 1e6 * n_d - P6[d] * n |     (x 1e-6 counts)
        sad6    = sad_num // n                        (per-value x 1e-6)

    exact int64 end to end (P6 are fixed integer constants shared with
    the SQL twin).  Output (key, n_values, sad_num, sad6) plus the
    nine digit counts d1..d9, key order.

    Plan: per-batch (key, digit) count partials — the first digit
    falls out of 18 vectorized halving-free integer divisions (no
    float log10: 10^k boundaries are exactly where floats bite) —
    bounded driver merge (keys x 9, the tile_counts class), zero
    shuffles."""
    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.string()),
                          "d": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        key = t[key_col].to_numpy(zero_copy_only=False)
        cents = np.floor(t[value_col].to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        keep = cents > 0
        if not keep.any():
            return empty
        key, d = key[keep], cents[keep]
        for _ in range(18):  # 10^18 < 2^63: fixed trip count
            m = d >= 10
            if not m.any():
                break
            d[m] //= 10
        uk, kinv = np.unique(key, return_inverse=True)
        comb = kinv * 9 + (d - 1)
        uc, cnt = np.unique(comb, return_counts=True)
        return pa.table({"k": pa.array(uk[uc // 9]),
                         "d": pa.array((uc % 9 + 1).astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = [p for p in ray.get(
        events.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if p.num_rows]
    cols = ([("key", pa.string()), ("n_values", pa.int64()),
             ("sad_num", pa.int64()), ("sad6", pa.int64())]
            + [(f"d{i}", pa.int64()) for i in range(1, 10)])
    schema = pa.schema(cols)
    if not parts:
        return schema.empty_table()
    tab = pa.concat_tables(parts)
    k = tab["k"].to_numpy(zero_copy_only=False)
    d = tab["d"].to_numpy(zero_copy_only=False)
    n = tab["n"].to_numpy(zero_copy_only=False)
    uk, kinv = np.unique(k, return_inverse=True)
    H = np.zeros((len(uk), 9), np.int64)
    np.add.at(H, (kinv, d - 1), n)
    tot = H.sum(axis=1)
    P = np.array(BENFORD_P6, np.int64)
    sad = np.abs(1_000_000 * H - P[None, :] * tot[:, None]).sum(axis=1)
    out = {"key": pa.array(uk), "n_values": pa.array(tot),
           "sad_num": pa.array(sad),
           "sad6": pa.array(sad // np.maximum(tot, 1))}
    for i in range(9):
        out[f"d{i + 1}"] = pa.array(H[:, i])
    return pa.table(out, schema=schema)


def rolling_stats(events: rd.Dataset, *, window: int = 5,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", id_col: str = "event_id",
                  n_shards: int | None = None) -> rd.Dataset:
    """Per-key ROLLING-WINDOW statistics over the (ts, id) total order
    — the ROWS BETWEEN streaming primitive (trailing ``window``-row
    sum / min / max per event, partial windows at each key's head, the
    SQL `ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW` frame): values
    ride as fixed-point cents so the int64 window sums are order-exact
    and bit-identical to the window-function twin
    ``oracle.rolling_stats_sql``.  Output (event_id, key, ts_us,
    roll_sum_cents, roll_min_cents, roll_max_cents).

    Plan: ONE hash(key) exchange; in-shard ONE lexsort over
    (key, ts, id), window sums by cumsum difference (boundary-masked
    at key starts), min/max by a (n, window) sliding view over a
    sentinel-padded array — no per-row Python, no pandas rolling
    (whose int64 rolling returns float64 and loses exactness)."""
    n_shards = resolve_shards(n_shards, floor=64)
    k = int(window)
    assert k >= 1

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key_col: pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             "_cents": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        key = t[key_col].to_numpy(zero_copy_only=False)
        cents = np.floor(t[value_col].to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            key_col: t[key_col],
            "_ts": t[ts_col].cast(pa.int64()),
            "_cents": pa.array(cents),
            "_shard": pa.array(_shard_of_keys(key, n_shards))})

    INF = np.int64(1) << np.int64(62)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                key_col: pd.Series([], dtype=np.int64),
                "ts_us": pd.Series([], dtype=np.int64),
                "roll_sum_cents": pd.Series([], dtype=np.int64),
                "roll_min_cents": pd.Series([], dtype=np.int64),
                "roll_max_cents": pd.Series([], dtype=np.int64)})
        key = g[key_col].to_numpy(np.int64)
        ts = g["_ts"].to_numpy(np.int64)
        eid = g[id_col].to_numpy(np.int64)
        cents = g["_cents"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, key))
        key, ts, eid, cents = key[order], ts[order], eid[order], \
            cents[order]
        n = len(key)
        # position within the key segment
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        seg = np.repeat(starts, np.diff(np.r_[starts, n]))
        pos = np.arange(n, dtype=np.int64) - seg
        # trailing-k sum: prefix diff, window clipped to the segment
        csum = np.cumsum(cents)
        wlen = np.minimum(pos + 1, k)
        lo = np.arange(n, dtype=np.int64) - wlen  # exclusive lower
        base = np.where(lo >= 0, csum[np.maximum(lo, 0)], 0)
        rsum = csum - base
        # min/max via a sentinel-padded (n, k) sliding view; out-of-
        # segment slots carry +/-INF sentinels
        padded_min = np.concatenate([np.full(k - 1, INF), cents])
        padded_max = np.concatenate([np.full(k - 1, -INF), cents])
        sw_min = np.lib.stride_tricks.sliding_window_view(padded_min, k)
        sw_max = np.lib.stride_tricks.sliding_window_view(padded_max, k)
        # mask slots before the segment start: slot j of row i holds
        # element i - (k - 1) + j; valid iff >= seg[i]
        offs = np.arange(k) - (k - 1)
        idx = np.arange(n)[:, None] + offs[None, :]
        valid = idx >= seg[:, None]
        rmin = np.where(valid, sw_min, INF).min(axis=1)
        rmax = np.where(valid, sw_max, -INF).max(axis=1)
        return pd.DataFrame({id_col: eid, key_col: key, "ts_us": ts,
                             "roll_sum_cents": rsum,
                             "roll_min_cents": rmin,
                             "roll_max_cents": rmax})

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(roll, batch_format="pandas"))


def zone_dwell(events: rd.Dataset, polygons: pa.Table, *, world,
               key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id",
               n_shards: int | None = None) -> rd.Dataset:
    """Per-(user, zone) DWELL TIME — the geofence-accounting fusion of
    the PIP join and the session family: for each convex zone
    INDEPENDENTLY (zones may overlap), every consecutive event pair in
    the user's (ts, id) order whose endpoints BOTH lie inside the zone
    contributes its time delta.  Integer microseconds; the
    boundary-inclusive half-plane test is the ``pip.pip_convex``
    fixed-IEEE kernel, so both engines agree exactly.  Output
    (user_id, poly_id, n_segments, dwell_us), (user, poly) order.

    Plan: per batch ONE vectorized half-plane pass folds all zones
    into a per-event BITMASK (zones are a bounded fixture set — the
    broadcast-side rule), so the exchange rows stay slim
    (user, ts, id, mask); ONE hash(user) exchange, in-shard lexsort +
    neighbor AND of masks, per-zone bit-test fold.  SQL twin
    ``oracle.zone_dwell_sql`` (edge VALUES + lag window)."""
    from optimizing_ray.pipelines.pip import pip_convex
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size
    rings = [(r["poly_id"],
              np.array([v["x"] for v in r["ring"]]),
              np.array([v["y"] for v in r["ring"]]))
             for r in polygons.to_pylist()]
    assert len(rings) <= 63, "zone bitmask packs into int64"
    poly_ids = [pid for pid, _, _ in rings]

    def slim(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "_ts": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "_mask": pa.array([], pa.int64()),
                             "_shard": pa.array([], pa.int64())})
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        mask = np.zeros(len(eid), np.int64)
        for z, (_, vx, vy) in enumerate(rings):
            mask |= pip_convex(x, y, vx, vy).astype(np.int64) << z
        return pa.table({key_col: pa.array(key),
                         "_ts": t[ts_col].cast(pa.int64()),
                         id_col: t[id_col],
                         "_mask": pa.array(mask),
                         "_shard": pa.array(_shard_of_keys(key, n_shards))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                "poly_id": pd.Series([], dtype=str),
                "n_segments": pd.Series([], dtype=np.int64),
                "dwell_us": pd.Series([], dtype=np.int64)})
        key = g[key_col].to_numpy(np.int64)
        ts = g["_ts"].to_numpy(np.int64)
        eid = g[id_col].to_numpy(np.int64)
        mask = g["_mask"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, key))
        key, ts, mask = key[order], ts[order], mask[order]
        same = key[1:] == key[:-1]
        both = (mask[1:] & mask[:-1])[same]
        dt = (ts[1:] - ts[:-1])[same]
        pk = key[1:][same]
        rows = []
        for z, pid in enumerate(poly_ids):
            inz = (both >> z) & 1 == 1
            if not inz.any():
                continue
            uk, kin = np.unique(pk[inz], return_inverse=True)
            nseg = np.bincount(kin).astype(np.int64)
            dsum = np.zeros(len(uk), np.int64)
            np.add.at(dsum, kin, dt[inz])
            for i in range(len(uk)):
                rows.append((int(uk[i]), pid, int(nseg[i]),
                             int(dsum[i])))
        if not rows:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                "poly_id": pd.Series([], dtype=str),
                "n_segments": pd.Series([], dtype=np.int64),
                "dwell_us": pd.Series([], dtype=np.int64)})
        out = pd.DataFrame(rows, columns=[key_col, "poly_id",
                                          "n_segments", "dwell_us"])
        return out.sort_values([key_col, "poly_id"]).reset_index(drop=True)

    return (events.map_batches(slim, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(fold, batch_format="pandas"))


def radius_of_gyration(events: rd.Dataset, *, key_col: str = "user_id",
                       id_col: str = "event_id",
                       n_shards: int | None = None) -> rd.Dataset:
    """Per-user RADIUS OF GYRATION — the classic human-mobility
    statistic (Gonzalez/Hidalgo/Barabasi 2008): RMS distance of a
    user's visit points from their centroid.  EXACT except one final
    sqrt: coordinates quantize to integer world units (floor, the
    kmeans discipline), so per-user (n, sum_x, sum_y, sum_sq) are
    exact int64 partials and

        num = n * sum_sq - sum_x^2 - sum_y^2        (= n^2 * RoG^2)

    is an exact integer; rog6 = round6(sqrt(num) / n) is a fixed
    2-IEEE-op chain (sqrt correctly rounded — the getis_ord
    discipline), bit-identical across engines.  Output (user_id,
    n_points, rog_num, rog6), user order.  Overflow guard:
    n * sum_sq < 2^63 (holds past 10^8 points/user at this world
    size; asserted in-shard).

    Plan: per-batch per-user partial fold (lexsort+reduceat), ONE
    hash(user) exchange sums exactly.  SQL twin
    ``oracle.radius_of_gyration_sql``."""
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = WORLD_2D.size

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.int64()),
                          "sy": pa.array([], pa.int64()),
                          "ss": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        qx = np.floor(WORLD_2D.min_x
                      + _frac(eid, GEO_MULTS["x"]) * wx).astype(np.int64)
        qy = np.floor(WORLD_2D.min_y
                      + _frac(eid, GEO_MULTS["y"]) * wy).astype(np.int64)
        order = np.argsort(key, kind="stable")
        k2 = key[order]
        qx, qy = qx[order], qy[order]
        runs = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1]])
        return pa.table({
            key_col: pa.array(k2[runs]),
            "n": pa.array(np.diff(np.r_[runs, len(k2)]).astype(np.int64)),
            "sx": pa.array(np.add.reduceat(qx, runs)),
            "sy": pa.array(np.add.reduceat(qy, runs)),
            "ss": pa.array(np.add.reduceat(qx * qx + qy * qy, runs)),
            "_shard": pa.array(_shard_of_keys(k2[runs], n_shards))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                "n_points": pd.Series([], dtype=np.int64),
                "rog_num": pd.Series([], dtype=np.int64),
                "rog6": pd.Series([], dtype=np.int64)})
        a = (g.groupby(key_col, as_index=False)
             .agg(n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
                  ss=("ss", "sum")))
        n = a["n"].to_numpy(np.int64)
        sx = a["sx"].to_numpy(np.int64)
        sy = a["sy"].to_numpy(np.int64)
        ss = a["ss"].to_numpy(np.int64)
        assert int(n.max(initial=0)) * int(ss.max(initial=1)) < (1 << 63), \
            "radius_of_gyration: n * sum_sq overflows int64"
        num = n * ss - sx * sx - sy * sy
        rog = np.sqrt(num.astype(np.float64)) / n
        return pd.DataFrame({key_col: a[key_col].to_numpy(np.int64),
                             "n_points": n, "rog_num": num,
                             "rog6": np.floor(rog * 1e6 + 0.5)
                             .astype(np.int64)})

    return (events.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(merge, batch_format="pandas"))


def visit_entropy(events: rd.Dataset, *, depth: int, world,
                  key_col: str = "user_id", id_col: str = "event_id",
                  n_shards: int | None = None) -> rd.Dataset:
    """Per-user VISIT ENTROPY — the mobility-predictability statistic
    (Song/Barabasi limits-of-predictability family): Shannon entropy
    (nats) of the user's tile-visit distribution over event_id-derived
    Morton tiles,

        H = ln(n) - (sum over tiles of c * ln(c)) / n

    micro-rounded to int64 1e-6 (the char_entropy discipline: counts
    are exact integers through one hash(user) exchange of per-batch
    (user, tile, c) partials; the c*ln(c) fold's float-sum order
    ambiguity is ~1e-13, far inside the rounding guard — the
    unigram_logprob argument, shared with the SQL twin).  Output
    (user_id, n_visits, n_tiles, entropy6), user order."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    n_shards = resolve_shards(n_shards)
    wx, wy, _ = world.size

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "tile": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = world.min_x + _frac(eid, GEO_MULTS["x"]) * wx
        y = world.min_y + _frac(eid, GEO_MULTS["y"]) * wy
        tile = point_cell2(x, y, world, depth).astype(np.int64)
        order = np.lexsort((tile, key))
        k2, t2 = key[order], tile[order]
        runs = np.flatnonzero(np.r_[True, (k2[1:] != k2[:-1])
                                    | (t2[1:] != t2[:-1])])
        uk = k2[runs]
        return pa.table({key_col: pa.array(uk),
                         "tile": pa.array(t2[runs]),
                         "c": pa.array(np.diff(np.r_[runs, len(k2)])
                                       .astype(np.int64)),
                         "_shard": pa.array(_shard_of_keys(uk, n_shards))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                key_col: pd.Series([], dtype=np.int64),
                "n_visits": pd.Series([], dtype=np.int64),
                "n_tiles": pd.Series([], dtype=np.int64),
                "entropy6": pd.Series([], dtype=np.int64)})
        a = (g.groupby([key_col, "tile"], as_index=False)["c"].sum())
        key = a[key_col].to_numpy(np.int64)
        c = a["c"].to_numpy(np.int64)
        order = np.lexsort((a["tile"].to_numpy(np.int64), key))
        key, c = key[order], c[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        n = np.add.reduceat(c, starts)
        ntile = np.diff(np.r_[starts, len(key)]).astype(np.int64)
        s = np.add.reduceat(c * np.log(c), starts)
        h = np.log(n) - s / n
        return pd.DataFrame({key_col: key[starts],
                             "n_visits": n,
                             "n_tiles": ntile,
                             "entropy6": np.floor(h * 1e6 + 0.5)
                             .astype(np.int64)})

    return (events.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(fold, batch_format="pandas"))

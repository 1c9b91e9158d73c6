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
import ray.data as rd

__all__ = ["tumbling_window"]


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
    merged = partials.groupby([key_col, "window_id"]).sum(["n", "s"])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            key_col: t[key_col],
            "window_id": t["window_id"],
            "n_events": t["sum(n)"],
            "sum_value": pa.array(np.round(t["sum(s)"].to_numpy(), 6)),
        })

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

"""Sliding and session windows vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from optimizing_ray.pipelines import windows


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(11)
    n = 4000
    ts = np.datetime64("2025-03-01", "us") + \
        rng.integers(0, 6 * 3600 * 1_000_000, n).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 15, n), pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array(rng.uniform(0, 10, n)),
    })


def test_sliding_window_matches_pandas(ray_session, events):
    import ray.data as rd
    out = windows.sliding_window(rd.from_arrow(events), window_s=3600,
                                 slide_s=900).to_pandas()
    df = events.to_pandas()
    tsus = df["ts"].astype("int64")
    rows = []
    for _, r in df.assign(us=tsus).iterrows():
        last = r.us // (900 * 1_000_000)
        first = (r.us - 3600 * 1_000_000) // (900 * 1_000_000) + 1
        for w in range(first, last + 1):
            rows.append((r.user_id, w, r.value))
    want = pd.DataFrame(rows, columns=["user_id", "window_id", "value"]) \
        .groupby(["user_id", "window_id"]).agg(n_events=("value", "size"),
                                               sum_value=("value", "sum")).reset_index()
    m = out.merge(want, on=["user_id", "window_id"], suffixes=("", "_w"))
    assert len(m) == len(want) == len(out)
    assert (m["n_events"] == m["n_events_w"]).all()
    np.testing.assert_allclose(m["sum_value"], np.round(m["sum_value_w"], 6), atol=1e-6)


def test_session_window_matches_pandas(ray_session, events):
    import ray.data as rd
    gap_us = 120 * 1_000_000
    out = windows.session_window(rd.from_arrow(events), gap_s=120).to_pandas()
    df = events.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["us"] = df["ts"].astype("int64")
    recs = []
    for uid, g in df.groupby("user_id"):
        brk = (g["us"].diff() > gap_us).fillna(False)
        sess = brk.cumsum()
        for sid, sg in g.assign(s=sess).groupby("s"):
            recs.append((uid, int(sid), len(sg), round(sg["value"].sum(), 6),
                         int(sg["us"].min()), int(sg["us"].max())))
    want = pd.DataFrame(recs, columns=["user_id", "session_id", "n_events",
                                       "sum_value", "t_start_us", "t_end_us"])
    a = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    b = want.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["user_id"].to_numpy() == b["user_id"].to_numpy()).all()
    assert (a["n_events"].to_numpy() == b["n_events"].to_numpy()).all()
    assert (a["t_start_us"].to_numpy() == b["t_start_us"].to_numpy()).all()
    assert (a["t_end_us"].to_numpy() == b["t_end_us"].to_numpy()).all()
    np.testing.assert_allclose(a["sum_value"], b["sum_value"], atol=1e-6)


def test_asof_join_semantics(ray_session):
    """Inclusive as-of on equal ts; NULL before the first dim row; keys
    with no dim rows stay NULL; latest-of-several wins."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines import windows

    def ts(s):
        return np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")

    events = pa.table({
        "event_id": pa.array(np.arange(6), pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([ts(5), ts(10), ts(20), ts(5), ts(30), ts(9)],
                       pa.timestamp("us")),
    })
    dim = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([ts(10), ts(15), ts(10)], pa.timestamp("us")),
        "rate": pa.array([1.5, 2.5, 9.0], pa.float64()),
    })
    out = windows.asof_join(rd.from_arrow(events), rd.from_arrow(dim),
                            n_shards=4).to_pandas()
    got = out.set_index("event_id")["rate"]
    assert np.isnan(got[0])          # before first dim row
    assert got[1] == 1.5             # equal ts -> inclusive
    assert got[2] == 2.5             # latest of two priors
    assert np.isnan(got[3])          # user 2 before its dim row
    assert got[4] == 9.0
    assert np.isnan(got[5])          # user 3 has no dim rows
    assert len(out) == 6


def test_asof_join_string_keys_and_payload(ray_session):
    """Round-3 generalization: non-integer keys (sharded by pandas hash)
    and arbitrary event payload columns (int + string) carried through
    the side-tagged shuffle with their dtypes intact."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines import windows

    def ts(s):
        return np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")

    events = pa.table({
        "event_id": pa.array(np.arange(5), pa.int64()),
        "user_id": pa.array(["alice", "alice", "bob", "bob", "carol"]),
        "ts": pa.array([ts(5), ts(20), ts(5), ts(30), ts(9)],
                       pa.timestamp("us")),
        "amount": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d", "e"]),
    })
    dim = pa.table({
        "user_id": pa.array(["alice", "alice", "bob"]),
        "ts": pa.array([ts(10), ts(15), ts(10)], pa.timestamp("us")),
        "rate": pa.array([1.5, 2.5, 9.0], pa.float64()),
    })
    out = windows.asof_join(rd.from_arrow(events), rd.from_arrow(dim),
                            payload_cols=("amount", "tag"),
                            n_shards=4).to_pandas()
    assert len(out) == 5
    got = out.set_index("event_id")
    assert np.isnan(got.loc[0, "rate"])
    assert got.loc[1, "rate"] == 2.5
    assert np.isnan(got.loc[2, "rate"])
    assert got.loc[3, "rate"] == 9.0
    assert np.isnan(got.loc[4, "rate"])  # carol: no dim rows
    # payload survives with dtype intact (int64 NOT upcast to float by
    # the dim-side padding; strings unchanged)
    assert got["amount"].dtype == np.int64
    assert got.loc[3, "amount"] == 40 and got.loc[3, "tag"] == "d"
    assert list(got.sort_index()["tag"]) == ["a", "b", "c", "d", "e"]


def test_interval_join_matches_brute_and_crosses_buckets(ray_session):
    """Exploded bucket-owned join == brute O(n^2) overlap; pairs whose
    overlap spans a bucket boundary appear exactly once."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines import windows

    rng = np.random.default_rng(3)
    n = 600
    base = np.int64(1_700_000_000_000_000)
    # cluster starts so overlaps are common AND straddle bucket edges
    s = base + (rng.integers(0, 40, n) * windows.IVJ_BUCKET_US // 2
                + rng.integers(0, 300_000_000, n)).astype(np.int64)
    eid = np.arange(n, dtype=np.int64) * 7 + 3
    t = pa.table({"event_id": pa.array(eid),
                  "ts": pa.array(s.astype("datetime64[us]"))})
    got = (windows.interval_join(rd.from_arrow(t).repartition(4))
           .to_pandas().sort_values(["event_a", "event_b"])
           .reset_index(drop=True))
    e = s + windows.interval_durations(eid)
    rows = []
    for i in range(n):
        for j in range(n):
            if eid[i] < eid[j] and s[i] < e[j] and s[j] < e[i]:
                rows.append((eid[i], eid[j],
                             min(e[i], e[j]) - max(s[i], s[j])))
    want = (pd.DataFrame(rows, columns=["event_a", "event_b", "overlap_us"])
            .sort_values(["event_a", "event_b"]).reset_index(drop=True))
    assert len(got) == len(want) and len(want) > 100
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_interval_join_broadcast_plan_matches_sharded(ray_session):
    """Round-4 nrows-gated broadcast plan == the sharded bucket plan."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines import windows

    rng = np.random.default_rng(9)
    n = 500
    base = np.int64(1_700_000_000_000_000)
    s = base + (rng.integers(0, 30, n) * windows.IVJ_BUCKET_US // 2
                + rng.integers(0, 300_000_000, n)).astype(np.int64)
    eid = np.arange(n, dtype=np.int64) * 3 + 1
    t = pa.table({"event_id": pa.array(eid),
                  "ts": pa.array(s.astype("datetime64[us]"))})
    a = (windows.interval_join(rd.from_arrow(t).repartition(4), nrows=n)
         .to_pandas().sort_values(["event_a", "event_b"])
         .reset_index(drop=True))
    b = (windows.interval_join(rd.from_arrow(t).repartition(4))
         .to_pandas().sort_values(["event_a", "event_b"])
         .reset_index(drop=True))
    assert len(a) == len(b) > 50
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # broadcast plan has no shard exchange in its DAG
    lazy = windows.interval_join(rd.from_arrow(t), nrows=n)
    assert "Sort" not in repr(lazy)


def test_event_transitions_matches_brute(ray_session):
    """Sharded transition counts == a per-user ordered pandas brute."""
    import ray.data as rd
    from optimizing_ray.pipelines import windows as W

    rng = np.random.default_rng(9)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(rng.integers(0, 40, n) * 1_000_000,
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 11, n).astype(np.int64)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n))})
    out = (W.event_transitions(rd.from_arrow(t))
           .to_pandas().sort_values(["from_type", "to_type"])
           .reset_index(drop=True))  # pa.Table -> pandas
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    from collections import Counter
    c = Counter()
    for _, g in df.groupby("user_id"):
        ty = g["event_type"].to_list()
        for x, y in zip(ty, ty[1:]):
            c[(x, y)] += 1
    want = pd.DataFrame([(a, b, v) for (a, b), v in sorted(c.items())],
                        columns=["from_type", "to_type", "n"])
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)


def test_late_events_matches_brute(ray_session):
    """Watermark accounting == a per-user running-max brute over an
    explicit out-of-order arrival sequence."""
    import ray.data as rd
    from optimizing_ray.pipelines import windows as W

    rng = np.random.default_rng(17)
    n = 250
    arrival = rng.permutation(n).astype(np.int64)  # explicit disorder
    t = pa.table({
        "event_id": pa.array(arrival),
        "ts": pa.array(rng.integers(0, 10**9, n),
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 9, n).astype(np.int64))})
    out = (W.late_events(rd.from_arrow(t))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    df = t.to_pandas().sort_values(["user_id", "event_id"])
    rows = []
    for u, g in df.groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy()
        wm = np.iinfo(np.int64).min
        late = 0
        skew = 0
        for v in ts:
            if v < wm:
                late += 1
                skew = max(skew, wm - v)
            wm = max(wm, v)
        rows.append((u, len(ts), late, skew))
    want = pd.DataFrame(rows, columns=["user_id", "n_events", "n_late",
                                       "max_skew_us"]).astype(np.int64)
    pd.testing.assert_frame_equal(out, want)


def test_wave5_ops_handle_empty_inputs(ray_session):
    """Every wave-5 operator returns a typed empty result on an empty
    input table (Ray Data passes empty blocks with empty schemas)."""
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import ann, cluster, dedup, windows as W

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string())}))
    assert W.trajectory_stats(ev).count() == 0
    assert W.event_transitions(ev).num_rows == 0  # pa.Table result
    assert W.late_events(ev).count() == 0
    assert W.user_tile_visits(ev, depth=3, world=WORLD_2D).count() == 0

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                   "text": pa.array([], pa.string())}))
    assert dedup.near_dedup_keep(docs, nrows=0).count() == 0
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    assert ann.embedding_knn_graph(emb, k=3).count() == 0


def test_geofence_transitions_emit_on_flag_change(ray_session):
    """Hand-built stream: user 1 out->in->in->out emits enter+exit; user
    2 always outside emits nothing; first event never emits."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.windows import geofence_transitions
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac
    import numpy as np

    wx, wy, _ = WORLD_2D.size
    eids = np.arange(1, 40, dtype=np.int64)
    x = WORLD_2D.min_x + _frac(eids, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(eids, GEO_MULTS["y"]) * wy
    inside = (x >= 25000.0) & (x < 60000.0) & (y >= 30000.0) & (y < 70000.0)
    ins_ids = eids[inside][:2]
    out_ids = eids[~inside][:4]
    # user 1: out, in, in, out (ts ascending); user 2: out, out
    seq = [(1, out_ids[0], 10), (1, ins_ids[0], 20), (1, ins_ids[1], 30),
           (1, out_ids[1], 40), (2, out_ids[2], 10), (2, out_ids[3], 20)]
    t = pa.table({"user_id": pa.array([s[0] for s in seq], pa.int64()),
                  "event_id": pa.array([s[1] for s in seq], pa.int64()),
                  "ts": pa.array([s[2] * 1_000_000 for s in seq],
                                 pa.timestamp("us"))})
    out = (geofence_transitions(rd.from_arrow(t),
                                fence=(25000.0, 30000.0, 60000.0, 70000.0),
                                world=WORLD_2D)
           .to_pandas().sort_values("ts_us").reset_index(drop=True))
    assert list(out["user_id"]) == [1, 1]
    assert list(out["kind"]) == ["enter", "exit"]
    assert list(out["event_id"]) == [ins_ids[0], out_ids[1]]


def test_od_matrix_counts_session_endpoints(ray_session):
    """Two sessions for one user (gap splits), one for another: the
    (origin, dest) pairs are the session first/last tiles, counted."""
    import pyarrow as pa
    import ray.data as rd
    import numpy as np
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.pipelines.windows import od_matrix
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    wx, wy, _ = WORLD_2D.size
    gap = 1800 * 1_000_000
    # user 1: events 1,2 in session A; big gap; events 3,4 session B
    # user 2: single-event session (origin == dest)
    seq = [(1, 1, 0), (1, 2, 60), (1, 3, 4000), (1, 4, 4060), (2, 5, 0)]
    t = pa.table({"user_id": pa.array([s[0] for s in seq], pa.int64()),
                  "event_id": pa.array([s[1] for s in seq], pa.int64()),
                  "ts": pa.array([s[2] * 1_000_000 for s in seq],
                                 pa.timestamp("us"))})
    out = (od_matrix(rd.from_arrow(t), depth=4, world=WORLD_2D, gap_s=1800)
           .to_pandas())
    eids = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    x = WORLD_2D.min_x + _frac(eids, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(eids, GEO_MULTS["y"]) * wy
    tile = point_cell2(x, y, WORLD_2D, 4).astype(np.int64)
    want = {(tile[0], tile[1]): 1, (tile[2], tile[3]): 1,
            (tile[4], tile[4]): 1}
    got = {(r.origin_tile, r.dest_tile): r.n_trips
           for r in out.itertuples()}
    # identical pairs collapse into counts
    merged = {}
    for k, v in want.items():
        merged[k] = merged.get(k, 0) + v
    assert got == merged


def test_interval_coverage_matches_brute(ray_session):
    """Engine islands/coverage vs a tiny per-user sweep oracle, on a
    layout that exercises overlap, touching (merges), and gaps."""
    import pyarrow as pa
    import ray.data as rd
    import numpy as np
    from optimizing_ray.pipelines.windows import (interval_coverage,
                                                  interval_durations)

    rng = np.random.default_rng(7)
    n = 400
    user = rng.integers(0, 12, n).astype(np.int64)
    eid = np.arange(1, n + 1, dtype=np.int64)
    ts = rng.integers(0, 3_000_000_000, n).astype(np.int64)  # us, dense
    t = pa.table({"user_id": pa.array(user), "event_id": pa.array(eid),
                  "ts": pa.array(ts).cast(pa.timestamp("us"))})
    out = (interval_coverage(rd.from_arrow(t).repartition(4))
           .to_pandas().set_index("user_id").sort_index())

    s_all = ts
    e_all = ts + interval_durations(eid)
    for u in np.unique(user):
        m = user == u
        iv = sorted(zip(s_all[m].tolist(), e_all[m].tolist()))
        islands, cur_s, cur_e = [], None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    islands.append((cur_s, cur_e))
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        islands.append((cur_s, cur_e))
        row = out.loc[u]
        assert row["n_intervals"] == int(m.sum())
        assert row["n_islands"] == len(islands)
        assert row["covered_us"] == sum(e - s for s, e in islands)


def test_interval_coverage_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.windows import interval_coverage

    ev = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64())}))
    assert interval_coverage(ev).count() == 0


def test_funnel_matches_brute(ray_session):
    """Engine funnel vs a per-user greedy Python scan, on a stream with
    ts ties (broken by event_id), skipped stages, and wrong-order
    stages (purchase before view must NOT count)."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 1200
    stages = ("view", "click", "purchase")
    types = np.array(["signup", "view", "click", "purchase", "error"])
    et = types[rng.integers(0, len(types), n)]
    user = rng.integers(0, 40, n).astype(np.int64)
    # coarse ts so same-(user, ts) ties are common
    ts = rng.integers(0, 50, n).astype(np.int64) * 1_000_000
    eid = rng.permutation(n).astype(np.int64)
    t = pa.table({"user_id": pa.array(user), "event_id": pa.array(eid),
                  "ts": pa.array(ts).cast(pa.timestamp("us")),
                  "event_type": pa.array(et)})
    out = (windows.funnel(rd.from_arrow(t).repartition(5), stages=stages)
           .to_pandas().set_index("stage"))

    want = np.zeros(len(stages), np.int64)
    for u in np.unique(user):
        m = user == u
        order = np.lexsort((eid[m], ts[m]))
        seq = et[m][order]
        k = 0
        for s in seq:
            if k < len(stages) and s == stages[k]:
                k += 1
        for r in range(k):
            want[r] += 1
    for k, s in enumerate(stages, start=1):
        assert out.loc[k, "event_type"] == s
        assert out.loc[k, "users"] == want[k - 1], (k, s)


def test_funnel_empty_and_missing_stage(ray_session):
    import ray.data as rd

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "event_id": pa.array([], pa.int64()),
                      "ts": pa.array([], pa.timestamp("us")),
                      "event_type": pa.array([], pa.string())})
    out = windows.funnel(rd.from_arrow(empty)).to_pandas()
    assert list(out["users"]) == [0, 0, 0]

    # stage 2 type absent entirely: stage 1 counts, stages 2-3 zero
    t = pa.table({"user_id": pa.array([1, 1], pa.int64()),
                  "event_id": pa.array([1, 2], pa.int64()),
                  "ts": pa.array([1, 2], pa.int64()).cast(pa.timestamp("us")),
                  "event_type": pa.array(["view", "purchase"])})
    out = windows.funnel(rd.from_arrow(t)).to_pandas()
    assert list(out["users"]) == [1, 0, 0]


def test_cohort_retention_matches_brute(ray_session):
    """Engine matrix vs a per-user Python recomputation on a stream
    where users join in different weeks and churn."""
    import ray.data as rd

    rng = np.random.default_rng(31)
    n = 3000
    week = 7 * 86400 * 1_000_000
    user = rng.integers(0, 50, n).astype(np.int64)
    # users start at week user%6 and are active in random later weeks
    w = (user % 6) + rng.integers(0, 8, n)
    ts = w * week + rng.integers(0, week, n)
    t = pa.table({"user_id": pa.array(user),
                  "ts": pa.array(ts).cast(pa.timestamp("us"))})
    out = (windows.cohort_retention(rd.from_arrow(t).repartition(5))
           .to_pandas())

    want = {}
    for u in np.unique(user):
        weeks = np.unique(ts[user == u] // week)
        c = weeks.min()
        for wk in weeks:
            want[(c, wk - c)] = want.get((c, wk - c), 0) + 1
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples()}
    assert got == want
    # offset-0 cells are the cohort sizes and every user is in exactly
    # one cohort
    assert sum(v for (c, o), v in got.items() if o == 0) == len(np.unique(user))


def test_windowed_topk_types_matches_brute(ray_session):
    """windowed_topk_types vs a pandas brute on a synthetic stream with
    per-window count ties (the (count DESC, type) composite decides);
    invariant to block layout."""
    import ray.data as rd

    from optimizing_ray.pipelines.windows import windowed_topk_types

    w = 3600 * 1_000_000
    # window 0: a x3, b x3 (tie), c x1; window 1: c x2, a x1
    ts = np.array([10, 20, 30, 40, 50, 60, 70,
                   w + 10, w + 20, w + 30], dtype=np.int64)
    ty = ["a", "a", "a", "b", "b", "b", "c", "c", "c", "a"]
    t = pa.table({"ts": pa.array(ts.astype("datetime64[us]")),
                  "event_type": pa.array(ty)})
    for nb in (1, 3):
        got = windowed_topk_types(rd.from_arrow(t).repartition(nb),
                                  k=2).to_pandas()
        rows = [tuple(r) for r in got.itertuples(index=False)]
        assert rows == [(0, "a", 3, 1), (0, "b", 3, 2),
                        (w, "c", 2, 1), (w, "a", 1, 2)]


def test_trajectory_similarity_matches_brute(ray_session):
    """trajectory_similarity vs a per-user set brute over the real
    events table at sf0.001 — exact Jaccard on tile sets, layout
    invariant."""
    import ray.data as rd

    from optimizing_ray.cells import point_cell2
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.windows import trajectory_similarity
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    sfd = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sfd}/events.parquet")
    eid = ev["event_id"].to_numpy(np.int64)
    wx, wy, _ = WORLD_2D.size
    x = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    tile = point_cell2(x, y, WORLD_2D, 4).astype(np.int64)
    sets = {u: set(tile[(ev["user_id"] == u).to_numpy()].tolist())
            for u in ev["user_id"].unique()}
    want = []
    us = sorted(sets)
    for i, a in enumerate(us):
        for b in us[i + 1:]:
            it = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if un and 5 * it >= un:
                want.append((a, b, it, un, it * 10**6 // un))
    assert len(want) > 0

    for nb in (1, 4):
        got = (trajectory_similarity(
            rd.read_parquet(f"{sfd}/events.parquet").repartition(nb),
            depth=4, world=WORLD_2D).to_pandas()
            .sort_values(["user_a", "user_b"]).reset_index(drop=True))
        assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_resample_interpolate_hand_cases(ray_session):
    """Edge cases: duplicate-second last-writer-wins, negative-slope
    FLOOR (not truncate), aligned/unaligned single events, exact grid
    hits, gaps spanning multiple steps."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.windows import resample_interpolate

    us = 1_000_000
    rows = [
        # user 1: v 0 -> 30 over [0, 3h]; grid at 0/1h/2h/3h exact thirds
        (1, 0, 0.0, 10), (1, 10800, 30.0, 11),
        # user 2: NEGATIVE slope 10 -> 9.999997 over [0, 2h]:
        # at 1h the exact interpolant is -1.5e-6 below 10 -> floor
        (2, 0, 10.0, 20), (2, 7200, 9.999997, 21),
        # user 3: duplicate second 3600 -- event_id 31 then 32: 32 wins
        (3, 3600, 1.0, 31), (3, 3600, 5.0, 32),
        # user 4: single unaligned event -> no grid rows
        (4, 5000, 7.0, 40),
        # user 5: gap > step: 0 -> 4 over [1800, 9000]; grid 3600, 7200
        (5, 1800, 0.0, 50), (5, 9000, 4.0, 51),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * us for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "event_id": pa.array([r[3] for r in rows], pa.int64())})
    out = (resample_interpolate(rd.from_arrow(t)).to_pandas()
           .sort_values(["user_id", "gts"]).reset_index(drop=True))
    exp = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2, 3, 5, 5],
        "gts": [0, 3600, 7200, 10800, 0, 3600, 7200, 3600, 3600, 7200],
        "v6_interp": [0, 10_000_000, 20_000_000, 30_000_000,
                      10_000_000, 9_999_998, 9_999_997,  # floor(-1.5)=-2
                      5_000_000, 1_000_000, 3_000_000]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_resample_interpolate_layout_invariance(ray_session):
    import ray.data as rd
    from optimizing_ray.pipelines.windows import resample_interpolate

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    a = (resample_interpolate(ds).to_pandas()
         .sort_values(["user_id", "gts"]).reset_index(drop=True))
    b = (resample_interpolate(ds.repartition(7)).to_pandas()
         .sort_values(["user_id", "gts"]).reset_index(drop=True))
    assert a.equals(b)


def test_mad_outliers_matches_brute(ray_session):
    """Lower median + MAD per key vs a pandas brute; planted spike
    flagged; MAD = 0 key flags every deviating event; layout
    invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.windows import mad_outliers

    rng = np.random.default_rng(17)
    n = 400
    key = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    v = rng.normal(10.0, 1.0, n)
    v[5] = 1000.0            # planted spike in whatever key 5 has
    key[100:120] = "z"       # constant key -> MAD 0
    v[100:120] = 7.0
    v[119] = 7.01            # deviates from the constant -> flagged
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "event_type": pa.array(key.astype(str)),
                  "value": pa.array(v)})
    got = mad_outliers(rd.from_arrow(t).repartition(4), k=3).to_pandas()

    df = pd.DataFrame({"id": np.arange(n), "key": key,
                       "v": np.floor(v * 100.0 + 0.5).astype(np.int64)})
    rows = []
    for kk, g in df.groupby("key"):
        vs = np.sort(g["v"].to_numpy())
        med = vs[(len(vs) + 1) // 2 - 1]
        av = np.sort(np.abs(g["v"].to_numpy() - med))
        mad = av[(len(av) + 1) // 2 - 1]
        for _, r in g.iterrows():
            d = abs(int(r["v"]) - int(med))
            if d > 3 * mad:
                rows.append((int(r["id"]), kk, int(r["v"]), int(med),
                             int(mad), d))
    rows.sort()
    assert list(got.itertuples(index=False, name=None)) == rows
    assert 5 in set(got["event_id"])
    assert 119 in set(got["event_id"])


def test_activity_streaks_matches_brute(ray_session):
    """Planted streaks + a python brute over random days: longest run,
    earliest tie-break, distinct-day fold of repeated same-day events,
    and layout invariance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from optimizing_ray.pipelines.windows import activity_streaks

    rng = np.random.default_rng(23)
    rows = []
    # user 1: two equal-length streaks (days 10-12 and 20-22) -> the
    # earlier end day 12 wins the tie
    for d in (10, 11, 12, 20, 21, 22):
        rows.append((1, d))
    # user 2: one day, repeated events the same day fold to one
    rows += [(2, 40), (2, 40), (2, 40)]
    # random users
    for u in range(3, 40):
        days = rng.choice(200, size=rng.integers(1, 30), replace=False)
        rows += [(u, int(d)) for d in days]
    df = pd.DataFrame(rows, columns=["user_id", "day"])
    df["ts"] = (pd.Timestamp("1995-01-01")
                + pd.to_timedelta(df["day"], unit="D")
                + pd.to_timedelta(rng.integers(0, 86400, len(df)),
                                  unit="s"))
    ds = rd.from_pandas(df[["user_id", "ts"]]).repartition(5)
    got = activity_streaks(ds).to_pandas()

    base = int(np.datetime64("1995-01-01").astype("datetime64[D]")
               .astype(np.int64))
    want = {}
    for u, g in df.groupby("user_id"):
        days = sorted(set(g["day"]))
        best_len, best_end, cur = 1, days[0], 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b - a == 1 else 1
            if cur > best_len:
                best_len, best_end = cur, b
        want[u] = (len(days), best_len, base + best_end)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert (r["n_active_days"], r["longest_streak"],
                r["streak_end_day"]) == want[r["user_id"]]

    again = activity_streaks(ds.repartition(11)).to_pandas()
    assert got.equals(again)


def test_peak_concurrency_matches_brute(ray_session):
    """Half-open sweep vs a python brute: an interval ending exactly
    when another starts does NOT overlap it; earliest peak instant;
    layout invariance."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from optimizing_ray.pipelines.windows import peak_concurrency

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": (pd.Timestamp("1996-03-01")
               + pd.to_timedelta(rng.integers(0, 7200, n), unit="s")),
        "value": rng.uniform(-50, 50, n).round(2),
    })
    # planted half-open touch for key "touch": [0, 60) then [60, 120)
    # (value 0 -> duration exactly base_s = 60) -> peak must be 1
    t0 = pd.Timestamp("1996-04-01")
    df = pd.concat([df, pd.DataFrame({
        "event_type": ["touch", "touch"],
        "ts": [t0, t0 + pd.Timedelta(seconds=60)],
        "value": [0.0, 0.0]})], ignore_index=True)
    ds = rd.from_pandas(df).repartition(5)
    got = peak_concurrency(ds).to_pandas()

    s = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    v = np.abs(np.floor(df["value"].to_numpy() * 100.0 + 0.5)
               .astype(np.int64))
    e = s + (60 + v % 3600) * 1_000_000
    for key, grp in pd.DataFrame({"k": df["event_type"], "s": s,
                                  "e": e}).groupby("k"):
        pts = sorted(set(grp["s"]) | set(grp["e"]))
        best, best_pt = -1, None
        for p in pts:
            c = int(((grp["s"].to_numpy() <= p)
                     & (p < grp["e"].to_numpy())).sum())
            if c > best:
                best, best_pt = c, p
        row = got[got["key"] == key].iloc[0]
        assert row["peak"] == best
        assert row["peak_ts_us"] == best_pt
        assert row["n_events"] == len(grp)
    assert got[got["key"] == "touch"]["peak"].iloc[0] == 1

    again = peak_concurrency(ds.repartition(9)).to_pandas()
    assert got.equals(again)


def test_trajectory_diameter_matches_brute(ray_session):
    """Max pairwise d2 per user vs an itertools brute over real sf
    events; single-point users report 0; layout invariance."""
    from itertools import combinations

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.windows import trajectory_diameter
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    sfd = "/root/testdata/sf0.001"
    ev = driver_tables.read(sfd, "events", columns=["user_id", "event_id"])
    got = trajectory_diameter(ev).to_pandas()
    again = trajectory_diameter(ev.repartition(7)).to_pandas()
    assert got.equals(again)

    df = pd.read_parquet(f"{sfd}/events.parquet",
                         columns=["user_id", "event_id"])
    eid = df["event_id"].to_numpy(np.int64)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    df["x"] = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    df["y"] = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    for u, g in df.groupby("user_id"):
        pts = list(zip(g["x"], g["y"]))
        best = max(((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                    for a, b in combinations(pts, 2)), default=0.0)
        row = got[got["user_id"] == u].iloc[0]
        assert row["n_points"] == len(pts)
        assert row["diam2_6"] == int(np.floor(best * 1e6 + 0.5))

    one = rd.from_items([{"user_id": 1, "event_id": 42}])
    solo = trajectory_diameter(one).to_pandas()
    assert (solo["n_points"].iloc[0], solo["diam2_6"].iloc[0]) == (1, 0)


def test_cusum_alarms_matches_sequential_brute(ray_session):
    """The two-scan fold vs the literal s = max(0, s + d) recursion
    over real sf events; alarm count, first alarm position, max stat;
    layout invariance."""
    import numpy as np
    import pandas as pd

    from optimizing_ray.pipelines.windows import cusum_alarms
    from optimizing_ray.sources import driver_tables

    sfd = "/root/testdata/sf0.001"
    h = 30_000
    ev = driver_tables.read(sfd, "events",
                            columns=["user_id", "ts", "event_id", "value"])
    got = cusum_alarms(ev, h_cents=h).to_pandas()
    again = cusum_alarms(ev.repartition(7), h_cents=h).to_pandas()
    assert got.equals(again)
    assert (got["n_alarms"] > 0).any() and (got["n_alarms"] == 0).any()

    df = pd.read_parquet(f"{sfd}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    df["v"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        v = g["v"].to_numpy(np.int64)
        n = len(v)
        d = n * v - v.sum()
        s = 0
        n_alarms, first, max_s = 0, -1, 0
        for i, di in enumerate(d, start=1):
            s = max(0, s + int(di))
            max_s = max(max_s, s)
            if s >= h * n:
                n_alarms += 1
                if first < 0:
                    first = i
        row = got[got["user_id"] == u].iloc[0]
        assert (row["n_events"], row["n_alarms"],
                row["first_alarm_seq"], row["max_s"]) == (n, n_alarms,
                                                          first, max_s)


def test_stay_points_matches_sequential_brute(ray_session):
    """Window bound = point before the first in-order violation — vs a
    literal per-anchor scan over real sf events; layout invariance;
    duration and filter semantics."""
    import numpy as np
    import pandas as pd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.windows import stay_points
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    sfd = "/root/testdata/sf0.001"
    r = 30_000.0
    ev = driver_tables.read(sfd, "events",
                            columns=["user_id", "ts", "event_id"])
    got = stay_points(ev, radius=r).to_pandas()
    again = stay_points(ev.repartition(7), radius=r).to_pandas()
    assert got.equals(again)
    assert len(got) > 0 and (got["n_in_window"] >= 2).all()

    df = pd.read_parquet(f"{sfd}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    eid = df["event_id"].to_numpy(np.int64)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    df["x"] = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    df["y"] = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    df["tsi"] = df["ts"].astype("int64")
    rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        x, y = g["x"].to_numpy(), g["y"].to_numpy()
        ts, ids = g["tsi"].to_numpy(np.int64), g["event_id"].to_numpy(np.int64)
        for i in range(len(x)):
            j = i
            while j + 1 < len(x) and ((x[i] - x[j + 1]) ** 2
                                      + (y[i] - y[j + 1]) ** 2) <= r * r:
                j += 1
            if j - i + 1 >= 2:
                rows.append((u, ids[i], j - i + 1, ts[j] - ts[i]))
    brute = pd.DataFrame(rows, columns=["user_id", "anchor_event_id",
                                        "n_in_window", "dur_us"])
    brute = brute.sort_values(["user_id", "anchor_event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, brute.astype("int64"))


def test_douglas_peucker_matches_recursive_brute(ray_session):
    """Breadth-first reduceat recursion vs the literal recursive DP
    (line-distance variant, lowest-seq tie break) over real sf events;
    layout invariance; endpoints always kept."""
    import numpy as np
    import pandas as pd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines.windows import douglas_peucker
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    sfd = "/root/testdata/sf0.001"
    eps = 20_000.0
    ev = driver_tables.read(sfd, "events",
                            columns=["user_id", "ts", "event_id"])
    got = douglas_peucker(ev, eps=eps).to_pandas()
    again = douglas_peucker(ev.repartition(7), eps=eps).to_pandas()
    assert got.equals(again)
    assert 0 < len(got)

    df = pd.read_parquet(f"{sfd}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    eid = df["event_id"].to_numpy(np.int64)
    wx, wy = WORLD_2D.size[0], WORLD_2D.size[1]
    df["x"] = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    df["y"] = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        x, y = g["x"].to_numpy(), g["y"].to_numpy()
        ids = g["event_id"].to_numpy(np.int64)
        kept = {0, len(x) - 1}

        def rec(i, j):
            if j - i < 2:
                return
            best, bk = -1.0, -1
            for k in range(i + 1, j):
                c = ((x[j] - x[i]) * (y[k] - y[i])
                     - (y[j] - y[i]) * (x[k] - x[i]))
                if c * c > best:
                    best, bk = c * c, k
            if best > eps * eps * ((x[j] - x[i]) ** 2 + (y[j] - y[i]) ** 2):
                kept.add(bk)
                rec(i, bk)
                rec(bk, j)

        rec(0, len(x) - 1)
        for k in sorted(kept):
            rows.append((u, ids[k], k + 1))
    brute = pd.DataFrame(rows, columns=["user_id", "event_id", "seq"])
    pd.testing.assert_frame_equal(
        got, brute.sort_values(["user_id", "seq"])
                  .reset_index(drop=True).astype("int64"))


def test_convex_hull_properties(ray_session):
    """Hull invariants on random users: vertices are input points in
    strict-CCW order (every triple a strict left turn), every input
    point is inside-or-on the ring (exact integer half-plane tests),
    area2 is the shoelace sum; layout invariance."""
    import ray.data as rd

    from optimizing_ray.pipelines.windows import convex_hull
    from optimizing_ray.sources.driver_tables import GEO_MULTS

    rng = np.random.default_rng(3)
    n = 3000
    eid = rng.choice(200_000, n, replace=False).astype(np.int64)
    uid = rng.integers(0, 25, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(uid), "event_id": pa.array(eid)})
    got = convex_hull(rd.from_arrow(t).repartition(4)).to_pandas()

    mod, q = 1 << 32, 1 << 16
    qx = ((eid * GEO_MULTS["x"]) % mod) // q
    qy = ((eid * GEO_MULTS["y"]) % mod) // q
    for u, grp in got.groupby("user_id"):
        m = uid == u
        pts = set(zip(qx[m].tolist(), qy[m].tolist()))
        hx = grp.sort_values("seq")["qx"].tolist()
        hy = grp.sort_values("seq")["qy"].tolist()
        h = len(hx)
        assert grp["n_pts"].iloc[0] == len(pts)
        assert (grp["n_vertices"] == h).all()
        assert set(zip(hx, hy)) <= pts
        assert grp["seq"].tolist() == sorted(range(h))
        area2 = sum(hx[i] * hy[(i + 1) % h] - hx[(i + 1) % h] * hy[i]
                    for i in range(h)) if h >= 3 else 0
        assert grp["area2"].iloc[0] == area2
        if h >= 3:
            assert area2 > 0          # CCW
            for i in range(h):        # strict turns, all points inside
                ax, ay = hx[i], hy[i]
                bx, by = hx[(i + 1) % h], hy[(i + 1) % h]
                cx, cy = hx[(i + 2) % h], hy[(i + 2) % h]
                assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0
                for px, py in pts:
                    assert (bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0

    again = convex_hull(rd.from_arrow(t)).to_pandas()
    assert got.equals(again)


def test_convex_hull_degenerate_cases(ray_session):
    """Hand-planted degenerate keys via crafted event ids: the hull of
    collinear points is its 2 endpoints, of one point itself, and
    collinear boundary points of a triangle are not vertices."""
    import ray.data as rd

    from optimizing_ray.pipelines.windows import convex_hull
    from optimizing_ray.sources.driver_tables import GEO_MULTS

    mod, q = 1 << 32, 1 << 16
    # search small event ids landing on useful lattice points is
    # brittle — instead check REAL ids but tiny key populations
    eids = np.arange(1, 8, dtype=np.int64)
    t = pa.table({"user_id": pa.array([0, 1, 1, 2, 2, 2, 2], pa.int64()),
                  "event_id": pa.array(eids)})
    got = convex_hull(rd.from_arrow(t)).to_pandas()
    qx = ((eids * GEO_MULTS["x"]) % mod) // q
    qy = ((eids * GEO_MULTS["y"]) % mod) // q

    g0 = got[got["user_id"] == 0]
    assert (len(g0), g0["n_pts"].iloc[0], g0["area2"].iloc[0]) == (1, 1, 0)
    assert (g0["qx"].iloc[0], g0["qy"].iloc[0]) == (qx[0], qy[0])

    g1 = got[got["user_id"] == 1]            # 2 points: both vertices
    assert len(g1) == 2 and (g1["area2"] == 0).all()
    assert set(zip(g1["qx"], g1["qy"])) == set(zip(qx[1:3], qy[1:3]))

    g2 = got[got["user_id"] == 2]            # 4 random pts: hull 3 or 4
    assert 3 <= len(g2) <= 4 and g2["area2"].iloc[0] > 0


def test_min_obb_matches_brute_over_hull(ray_session):
    """OBB replayed from the convex_hull output: exact rational argmin
    over every hull-edge direction (Fraction comparison), and the OBB
    area never exceeds the axis-aligned bbox area."""
    from fractions import Fraction

    import ray.data as rd

    from optimizing_ray.pipelines.windows import convex_hull, min_obb

    rng = np.random.default_rng(9)
    n = 2000
    eid = rng.choice(150_000, n, replace=False).astype(np.int64)
    uid = rng.integers(0, 20, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(uid), "event_id": pa.array(eid)})
    hull = convex_hull(rd.from_arrow(t).repartition(4)).to_pandas()
    got = min_obb(rd.from_arrow(t).repartition(4)).to_pandas()
    assert got["user_id"].tolist() == sorted(hull["user_id"].unique())

    for u, grp in hull.groupby("user_id"):
        row = got[got["user_id"] == u].iloc[0]
        grp = grp.sort_values("seq")
        hx = grp["qx"].tolist()
        hy = grp["qy"].tolist()
        h = len(hx)
        assert (row["n_pts"], row["n_vertices"]) == \
            (grp["n_pts"].iloc[0], h)
        if h == 1:
            assert (row["edge_seq"], row["len2"], row["obb_area_6"]) \
                == (0, 0, 0)
            continue
        cands = []
        for i in range(h):
            ex = hx[(i + 1) % h] - hx[i]
            ey = hy[(i + 1) % h] - hy[i]
            us = [ex * x + ey * y for x, y in zip(hx, hy)]
            ws = [-ey * x + ex * y for x, y in zip(hx, hy)]
            a = (max(us) - min(us)) * (max(ws) - min(ws))
            cands.append((Fraction(a, ex * ex + ey * ey), i, a,
                          ex * ex + ey * ey))
        frac, seq, a, l2 = min(cands)
        assert (row["edge_seq"], row["len2"]) == (seq, l2)
        assert row["obb_area_6"] == (
            0 if a == 0 else int(np.floor(float(a) / float(l2)
                                          * 1e6 + 0.5)))
        # sanity: OBB <= AABB (compare the same micro-rounding)
        aabb = (max(hx) - min(hx)) * (max(hy) - min(hy))
        assert frac <= Fraction(aabb)

    again = min_obb(rd.from_arrow(t)).to_pandas()
    assert got.equals(again)


def test_decayed_counts_matches_brute(ray_session):
    """Half-life decayed aggregate vs a per-row python brute: exact
    integer weights, post-reference events excluded, cap saturation,
    layout invariance."""
    import datetime

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import windows

    ref = int(datetime.datetime(2024, 2, 1,
                                tzinfo=datetime.timezone.utc).timestamp()
              * 1_000_000)
    us_day = 86_400_000_000
    rng = np.random.default_rng(3)
    n = 400
    key = rng.integers(0, 7, n)
    # ages straddling 0 days .. past the cap, plus post-ref rows
    ts = ref - rng.integers(-2 * us_day, 40 * us_day, n)
    val = np.round(rng.uniform(0, 50, n), 2)
    t = pa.table({"user_id": pa.array(key.astype(np.int64)),
                  "ts": pa.array(ts.astype("datetime64[us]")),
                  "value": pa.array(val)})
    cap = 10
    got = (windows.decayed_counts(rd.from_arrow(t).repartition(5),
                                  ref_us=ref, cap_days=cap)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    again = (windows.decayed_counts(rd.from_arrow(t), ref_us=ref,
                                    cap_days=cap)
             .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)

    want = {}
    for k, tus, v in zip(key, ts, val):
        if tus > ref:
            continue
        age = min((ref - int(tus)) // us_day, cap)
        w = 1 << (cap - age)
        c = int(np.floor(v * 100.0 + 0.5))
        e = want.setdefault(int(k), [0, 0, 0])
        e[0] += 1
        e[1] += w
        e[2] += w * c
    assert {int(r.user_id): [int(r.n_events), int(r.decayed_n),
                             int(r.decayed_cents)]
            for r in got.itertuples()} == want
    assert any(tus > ref for tus in ts)          # exclusion exercised
    assert any((ref - int(tus)) // us_day > cap
               for tus in ts if tus <= ref)      # cap exercised


def test_emerging_hotspots_matches_brute(ray_session):
    """Mann-Kendall S vs a literal pairwise replay over planted daily
    series: a strictly-intensifying tile hits S = +C(n,2), a dying one
    -C(n,2), a flat one 0; out-of-window events excluded; dense
    zero-days counted; layout invariance."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import windows
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac
    from optimizing_ray.cells import point_cell2

    t0 = 1704067200000000
    us_day = 86_400_000_000
    n_days = 6
    # find event ids landing in three distinct tiles
    wx, wy, _ = WORLD_2D.size
    ids = np.arange(5000, dtype=np.int64)
    x = WORLD_2D.min_x + _frac(ids, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(ids, GEO_MULTS["y"]) * wy
    tiles = point_cell2(x, y, WORLD_2D, 4).astype(np.int64)
    ut = np.unique(tiles)
    grow, die, flat = ut[0], ut[1], ut[2]
    pick = {t: ids[tiles == t] for t in (grow, die, flat)}
    rows_id, rows_ts = [], []
    for d in range(n_days):
        # grow: d+1 events on day d; die: n_days-d; flat: 2 (but day 5
        # only 2 - spread deterministic)
        for k in range(d + 1):
            rows_id.append(int(pick[grow][k]))
            rows_ts.append(t0 + d * us_day + k)
        for k in range(n_days - d):
            rows_id.append(int(pick[die][k]))
            rows_ts.append(t0 + d * us_day + 10_000 + k)
        for k in range(2):
            rows_id.append(int(pick[flat][k]))
            rows_ts.append(t0 + d * us_day + 20_000 + k)
    # out-of-window noise (before t0 and after the window)
    rows_id += [int(pick[grow][0]), int(pick[die][0])]
    rows_ts += [t0 - 5, t0 + n_days * us_day + 5]
    t = pa.table({"event_id": pa.array(np.array(rows_id, np.int64)),
                  "ts": pa.array(np.array(rows_ts, np.int64)
                                 .astype("datetime64[us]"))})
    got = windows.emerging_hotspots(
        rd.from_arrow(t).repartition(4), depth=4, world=WORLD_2D,
        t0_us=t0, n_days=n_days, s_threshold=10).to_pandas()
    again = windows.emerging_hotspots(
        rd.from_arrow(t), depth=4, world=WORLD_2D, t0_us=t0,
        n_days=n_days, s_threshold=10).to_pandas()
    assert got.equals(again)

    m = {int(r.tile): (int(r.n_events), int(r.mk_s), int(r.trend))
         for r in got.itertuples()}
    pairs = n_days * (n_days - 1) // 2
    assert m[int(grow)] == (pairs + n_days, pairs, 1)   # counts 1..6
    assert m[int(die)] == (pairs + n_days, -pairs, -1)
    assert m[int(flat)] == (2 * n_days, 0, 0)


def test_benford_audit_matches_brute(ray_session):
    """First-digit extraction + deviation vs a literal brute; planted
    Benford-ish vs uniform-digit keys rank correctly; zero/negative
    values excluded; 10^k boundary values take the right digit."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import windows
    from optimizing_ray.pipelines.windows import BENFORD_P6

    vals = []
    # 'ben': roughly Benford-shaped cents; 'uni': every digit equally
    ben = [1, 1, 1, 10, 12, 15, 19, 2, 2, 25, 3, 35, 4, 5, 6, 7, 8, 9]
    for c in ben:
        vals.append(("ben", c / 100.0))
    for d in range(1, 10):
        for rep in range(3):
            vals.append(("uni", (d * 100 + rep) / 100.0))
    # excluded rows + exact 10^k boundaries
    vals += [("ben", 0.0), ("ben", -5.0), ("uni", 10.0), ("uni", 100.0)]
    t = pa.table({"event_type": pa.array([k for k, _ in vals]),
                  "value": pa.array([v for _, v in vals])})
    got = windows.benford_audit(rd.from_arrow(t).repartition(3)).to_pandas()
    again = windows.benford_audit(rd.from_arrow(t)).to_pandas()
    assert got.equals(again)

    import collections
    cnt = collections.defaultdict(lambda: np.zeros(9, np.int64))
    for k, v in vals:
        c = int(np.floor(v * 100.0 + 0.5))
        if c <= 0:
            continue
        while c >= 10:
            c //= 10
        cnt[k][c - 1] += 1
    m = {r.key: r for r in got.itertuples()}
    P = np.array(BENFORD_P6, np.int64)
    for k, H in cnt.items():
        n = int(H.sum())
        sad = int(np.abs(1_000_000 * H - P * n).sum())
        assert m[k].n_values == n
        assert m[k].sad_num == sad and m[k].sad6 == sad // n
        for i in range(9):
            assert getattr(m[k], f"d{i + 1}") == H[i]
    assert m["ben"].sad6 < m["uni"].sad6  # Benford-ish scores lower


def test_rolling_stats_matches_brute(ray_session):
    """Trailing-k window sum/min/max vs a literal per-row brute:
    partial head windows, key boundaries never leak, (ts, id) tie
    order, layout invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import windows

    rng = np.random.default_rng(7)
    n = 300
    key = rng.integers(0, 5, n).astype(np.int64)
    ts = rng.integers(0, 40, n).astype(np.int64)  # many ts ties
    val = np.round(rng.uniform(-20, 50, n), 2)
    t = pa.table({"event_id": pa.array(np.arange(n, dtype=np.int64)),
                  "user_id": pa.array(key),
                  "ts": pa.array(ts.astype("datetime64[us]")),
                  "value": pa.array(val)})
    k = 4
    got = (windows.rolling_stats(rd.from_arrow(t).repartition(5),
                                 window=k)
           .to_pandas().sort_values(["user_id", "ts_us", "event_id"])
           .reset_index(drop=True))
    again = (windows.rolling_stats(rd.from_arrow(t), window=k)
             .to_pandas().sort_values(["user_id", "ts_us", "event_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)

    cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
    rows = sorted(zip(key, ts, np.arange(n), cents))
    by_key = {}
    want = {}
    for kk, tt, ee, cc in rows:
        h = by_key.setdefault(kk, [])
        h.append(cc)
        w = h[-k:]
        want[ee] = (sum(w), min(w), max(w))
    for r in got.itertuples():
        assert (r.roll_sum_cents, r.roll_min_cents,
                r.roll_max_cents) == want[r.event_id], r.event_id


def test_zone_dwell_matches_brute(ray_session):
    """Dwell accounting vs a literal per-pair replay: overlapping
    zones count independently, boundary events included, gaps where
    one endpoint leaves the zone contribute nothing; layout
    invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import windows
    from optimizing_ray.pipelines.pip import pip_convex
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    # two overlapping axis-aligned square zones (CCW rings)
    def ring(x0, y0, x1, y1):
        return [{"x": x0, "y": y0}, {"x": x1, "y": y0},
                {"x": x1, "y": y1}, {"x": x0, "y": y1}]
    polys = pa.table({
        "poly_id": pa.array(["za", "zb"]),
        "ring": pa.array([ring(0.0, 0.0, 60_000.0, 60_000.0),
                          ring(30_000.0, 0.0, 99_000.0, 99_000.0)],
                         pa.list_(pa.struct([("x", pa.float64()),
                                             ("y", pa.float64())])))})
    rng = np.random.default_rng(3)
    n = 600
    eid = rng.permutation(np.arange(50_000, dtype=np.int64))[:n]
    uid = rng.integers(0, 6, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype(np.int64)
    t = pa.table({"event_id": pa.array(eid), "user_id": pa.array(uid),
                  "ts": pa.array(ts.astype("datetime64[us]"))})
    got = (windows.zone_dwell(rd.from_arrow(t).repartition(4), polys,
                              world=WORLD_2D)
           .to_pandas().sort_values(["user_id", "poly_id"])
           .reset_index(drop=True))
    again = (windows.zone_dwell(rd.from_arrow(t), polys, world=WORLD_2D)
             .to_pandas().sort_values(["user_id", "poly_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)

    wx, wy, _ = WORLD_2D.size
    x = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    inz = {}
    for r in polys.to_pylist():
        vx = np.array([v["x"] for v in r["ring"]])
        vy = np.array([v["y"] for v in r["ring"]])
        inz[r["poly_id"]] = pip_convex(x, y, vx, vy)
    want = {}
    order = np.lexsort((eid, ts, uid))
    for i, j in zip(order[:-1], order[1:]):
        if uid[i] != uid[j]:
            continue
        for pid, m in inz.items():
            if m[i] and m[j]:
                k = (int(uid[j]), pid)
                s = want.setdefault(k, [0, 0])
                s[0] += 1
                s[1] += int(ts[j] - ts[i])
    assert {(int(r.user_id), r.poly_id): [int(r.n_segments),
                                          int(r.dwell_us)]
            for r in got.itertuples()} == want
    # the overlap region produces users dwelling in BOTH zones
    pids_per_user = {}
    for (u, p) in want:
        pids_per_user.setdefault(u, set()).add(p)
    assert any(len(v) == 2 for v in pids_per_user.values())


def test_radius_of_gyration_and_pareto_match_brute(ray_session):
    """RoG vs the textbook float formula on quantized points (exact
    integer numerator, planted tight-vs-spread users rank correctly);
    Pareto k vs a literal prefix scan incl. the all-equal case."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import windows
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    rng = np.random.default_rng(5)
    eid = rng.permutation(np.arange(30_000, dtype=np.int64))[:900]
    uid = (eid % 9).astype(np.int64)  # deterministic user split
    t = pa.table({"event_id": pa.array(eid), "user_id": pa.array(uid)})
    got = (windows.radius_of_gyration(rd.from_arrow(t).repartition(4))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    again = (windows.radius_of_gyration(rd.from_arrow(t))
             .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert got.equals(again)

    wx, wy, _ = WORLD_2D.size
    qx = np.floor(WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
                  ).astype(np.int64)
    qy = np.floor(WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
                  ).astype(np.int64)
    for r in got.itertuples():
        m = uid == r.user_id
        n = int(m.sum())
        sx, sy = int(qx[m].sum()), int(qy[m].sum())
        ss = int((qx[m] ** 2 + qy[m] ** 2).sum())
        num = n * ss - sx * sx - sy * sy
        assert r.n_points == n and r.rog_num == num
        assert r.rog6 == int(np.floor(np.sqrt(np.float64(num)) / n
                                      * 1e6 + 0.5))
        # textbook float check within rounding slack
        cx, cy = qx[m].mean(), qy[m].mean()
        ref = np.sqrt(((qx[m] - cx) ** 2 + (qy[m] - cy) ** 2).mean())
        assert abs(r.rog6 / 1e6 - ref) < 1e-3

    # pareto: literal brute on a tiny synthetic dir
    import os

    import pyarrow.parquet as pq

    from optimizing_ray.pipelines import relational
    d = "/tmp/graft_pareto_fixture"
    os.makedirs(d, exist_ok=True)
    cust = pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_nationkey": pa.array([0, 1], pa.int32())})
    # nation 0: one whale + dust -> k=1; nation 1: all equal -> k=4
    orders = pa.table({
        "o_custkey": pa.array([1, 1, 1, 1, 2, 2, 2, 2, 2], pa.int64()),
        "o_totalprice": pa.array([97.0, 1.0, 1.0, 1.0,
                                  10.0, 10.0, 10.0, 10.0, 10.0])})
    pq.write_table(cust, f"{d}/customer.parquet")
    pq.write_table(orders, f"{d}/orders.parquet")
    g = relational.pareto_coverage(d).to_pandas()
    m = {int(r.nationkey): int(r.k_top) for r in g.itertuples()}
    assert m[0] == 1        # 97 of 100 cents in one order
    assert m[1] == 4        # 4 of 5 equal orders reach 80%

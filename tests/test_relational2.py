"""bloom_semi_join + tfidf_top_terms engine invariants (SQL equivalence
runs in test_driver_contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from optimizing_ray.pipelines.relational import (_bloom_positions,
                                                 bloom_semi_join)
from optimizing_ray.pipelines.textops import tfidf_top_terms


def test_bloom_prefilter_rejects_most_non_members(ray_session):
    """The bloom is a real prefilter: non-member keys rarely pass (FP
    rate << 1 at the defaults), and members ALWAYS pass (no false
    negatives — the semi-join result is exact)."""
    rng = np.random.default_rng(3)
    members = np.unique(rng.integers(0, 1 << 40, 2000))
    non = np.unique(rng.integers(1 << 41, 1 << 42, 5000))
    m_bits, k = 1 << 20, 4
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = _bloom_positions(members, m_bits, k).ravel()
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (pos & np.uint64(63)))

    def hits(keys):
        p = _bloom_positions(keys, m_bits, k)
        return ((words[(p >> np.uint64(6)).astype(np.int64)]
                 >> (p & np.uint64(63))) & np.uint64(1)).all(axis=1)

    assert hits(members).all()                   # no false negatives
    assert hits(non).mean() < 0.01               # sparse false positives


def test_bloom_semi_join_is_exact(ray_session):
    left = pa.table({"k": pa.array(list(range(1000)), pa.int64()),
                     "v": pa.array([i * 2 for i in range(1000)], pa.int64())})
    keys = pa.table({"k": pa.array([3, 500, 999, 12345], pa.int64())})
    out = (bloom_semi_join(rd.from_arrow(left), rd.from_arrow(keys), on="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [3, 500, 999]
    assert out["v"].tolist() == [6, 1000, 1998]


def test_tfidf_rare_term_outranks_common(ray_session):
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["common rare common", "common common",
                          "common other"])})
    out = tfidf_top_terms(rd.from_arrow(docs), k=1).to_pandas()
    row = out[out.doc_id == 1].iloc[0]
    assert row["token"] == "rare" and row["rank"] == 1
    # score = tf * 1e6 // df = 1 * 1e6 // 1
    assert row["score"] == 1_000_000


def test_dup_ngram_stats_flags_cross_doc_repeats(ray_session):
    from optimizing_ray.pipelines.textops import dup_ngram_stats
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e", "x a b c d y", "p q r s t"])})
    out = (dup_ngram_stats(rd.from_arrow(docs), n=4).to_pandas()
           .set_index("doc_id").sort_index())
    # doc 1: grams {abcd, bcde} — abcd also in doc 2
    assert out.loc[1, "n_dup"] == 1 and out.loc[1, "n_grams"] == 2
    # doc 2: grams {xabc, abcd, bcdy} — one shared
    assert out.loc[2, "n_dup"] == 1 and out.loc[2, "n_grams"] == 3
    # doc 3: nothing shared
    assert out.loc[3, "n_dup"] == 0 and out.loc[3, "dup_frac"] == 0.0


def test_span_kind_rollup_counts(ray_session):
    from optimizing_ray.pipelines.textops import span_kind_rollup
    spans_t = pa.list_(pa.struct([("kind", pa.string()),
                                  ("text", pa.string()),
                                  ("media_ref", pa.string()),
                                  ("offset", pa.int32())]))
    rows = [[{"kind": "text", "text": "ab cd", "media_ref": "", "offset": 0},
             {"kind": "image", "text": "", "media_ref": "m://1", "offset": 5}],
            [{"kind": "text", "text": "xyz", "media_ref": "", "offset": 0}]]
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "spans": pa.array(rows, spans_t)})
    out = span_kind_rollup(rd.from_arrow(t)).to_pandas().set_index("kind")
    assert out.loc["text", "n_spans"] == 2
    assert out.loc["text", "text_chars"] == 8
    assert out.loc["image", "n_media"] == 1
    assert out.loc["image", "max_offset"] == 5


def test_curate_hygiene_stages(ray_session):
    """decontaminate_mod drops benchmark docs AND their n-gram sharers;
    redact_pii scrubs text before analysis."""
    from optimizing_ray.pipelines.curate import curate
    docs = pa.table({
        "doc_id": pa.array([97 * 2, 5, 6, 7], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta",      # benchmark doc
            "x alpha beta gamma delta y z",             # shares a 4-gram
            "mail me at u9@ex.org for the the data set now ok",
            "clean words only in this one document here"])})
    out = curate(rd.from_arrow(docs), min_quality=0.0, nrows=4,
                 decontaminate_mod=97, redact_pii=True).to_pandas()
    kept = set(out.doc_id)
    assert 97 * 2 not in kept          # benchmark doc dropped
    assert 5 not in kept               # contaminated doc dropped
    assert {6, 7} <= kept
    txt = out[out.doc_id == 6].iloc[0]["text"]
    assert "<EMAIL>" in txt and "u9@ex.org" not in txt


def test_resize_images_nearest_neighbor(ray_session):
    """Resize stage: decode + nearest-neighbor on the fixture store;
    stats equal a direct numpy resample of the fixture pixels."""
    import pyarrow as pa

    from optimizing_ray.sources.driver_tables import derive_spans_batch
    from optimizing_ray.stages.codecs import IMG_H, IMG_W, image_pixels
    from optimizing_ray.stages.media import resize_images

    base = pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    docs = rd.from_arrow(derive_spans_batch(base))
    out = resize_images(docs, out_w=4, out_h=4).to_pandas()
    assert len(out) > 0
    iy = (np.arange(4) * IMG_H) // 4
    ix = (np.arange(4) * IMG_W) // 4
    for _, row in out.head(10).iterrows():
        px = image_pixels(int(row.doc_id) * 16 + int(row.ord))
        r = px[iy][:, ix].astype(np.int64)
        s = r.reshape(-1, 3).sum(axis=0)
        exp = np.floor(s / 16.0 * 1e6 + 0.5) / 1e6
        assert (row.r_mean_r, row.r_mean_g, row.r_mean_b) == tuple(exp)
        assert row.r_min == r.min() and row.r_max == r.max()


def test_source_cap_keeps_lowest_ids_per_source(ray_session):
    """Skewed sources: one hot source far over the cap, one under; the
    cap keeps exactly the k lowest ids with crawl-order ranks, invariant
    to block layout (partials forward <= k rows per source per batch)."""
    from optimizing_ray.pipelines.textops import source_cap

    ids = np.arange(1000, dtype=np.int64)
    src = np.where(ids % 10 == 0, "rare.org", "hot.com")
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    for nb in (1, 7):
        out = (source_cap(rd.from_arrow(t).repartition(nb), k=5)
               .to_pandas().sort_values(["source", "doc_id"])
               .reset_index(drop=True))
        hot = out[out.source == "hot.com"]
        rare = out[out.source == "rare.org"]
        assert hot.doc_id.tolist() == [1, 2, 3, 4, 5]      # lowest non-%10
        assert rare.doc_id.tolist() == [0, 10, 20, 30, 40]
        assert hot.src_rank.tolist() == [1, 2, 3, 4, 5]
        assert rare.src_rank.tolist() == [1, 2, 3, 4, 5]


@pytest.mark.parametrize("plan_rows", [6, None])
def test_curate_near_dedup_stage(ray_session, plan_rows):
    """The --near-dedup funnel stage keeps exactly one survivor per
    near-duplicate cluster on BOTH plans (broadcast anti-filter and
    sharded kept-id join)."""
    import ray.data as rd
    from optimizing_ray.pipelines.curate import curate

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base, base.replace("the", "THE", 1),
             "pack my box with five dozen liquor jugs tonight my friend",
             "a completely different document about ray data and arrow",
             "sphinx of black quartz judge my vow said the old teacher",
             "how vexingly quick daft zebras jump over fences here"]
    docs = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                     "text": pa.array(texts)})
    out = curate(rd.from_arrow(docs), min_quality=0.0, nrows=plan_rows,
                 near_dup_jaccard=0.6).to_pandas()
    # doc 1 is a near-dup of doc 0 (1-char edit) -> dropped; rest kept
    assert set(out["doc_id"]) == {0, 2, 3, 4, 5}


def test_strip_dup_ngrams_cuts_covered_tokens(ray_session):
    """Rewrite twin of dup_ngram_stats: tokens covered by any cross-doc
    duplicated n-gram are cut, survivors re-join single-spaced; brute
    union-of-windows oracle, incl. empty text and an all-covered doc."""
    from optimizing_ray.pipelines.textops import strip_dup_ngrams
    texts = ["a b c d e", "x a b c d y", "p q r s t", "", "a b c d"]
    ids = [1, 2, 3, 4, 5]
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})
    out = (strip_dup_ngrams(rd.from_arrow(docs), n=4).to_pandas()
           .set_index("doc_id").sort_index())

    n = 4
    gram_docs = {}
    toks = {i: t.split(" ") for i, t in zip(ids, texts)}
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            gram_docs.setdefault(tuple(tk[p:p + n]), set()).add(i)
    for i, tk in toks.items():
        cov = [False] * len(tk)
        for p in range(len(tk) - n + 1):
            if len(gram_docs[tuple(tk[p:p + n])]) >= 2:
                cov[p:p + n] = [True] * n
        kept = [t for t, c in zip(tk, cov) if not c]
        assert out.loc[i, "clean_text"] == " ".join(kept)
        assert out.loc[i, "n_tokens"] == len(tk)
        assert out.loc[i, "n_removed"] == sum(cov)
    # doc 5 is wholly one duplicated gram -> fully stripped
    assert out.loc[5, "clean_text"] == "" and out.loc[5, "n_removed"] == 4


def test_source_quality_gate_drops_whole_sources(ray_session):
    """Per-source mean-quality gate: sources whose mean q6 falls below
    tau6 drop wholesale; survivors keep every doc with its quality."""
    from optimizing_ray.pipelines.textops import analyze_text, source_quality_gate
    texts = {
        "good": ["the quick brown fox jumps over the lazy dog near the river bank",
                 "a small team of engineers built the new bridge over the canal"],
        "junk": ["$$$ !!! ### @@@ %%% ^^^ &&& *** ((( )))",
                 "zzz qqq jjj xxx vvv kkk www yyy hhh ggg"]}
    rows_id, rows_src, rows_txt = [], [], []
    i = 1
    for src, ts in texts.items():
        for t in ts:
            rows_id.append(i); rows_src.append(src); rows_txt.append(t); i += 1
    docs = pa.table({"doc_id": pa.array(rows_id, pa.int64()),
                     "source": pa.array(rows_src),
                     "text": pa.array(rows_txt)})
    scored = analyze_text(rd.from_arrow(docs)).to_pandas()
    means = scored.groupby("source")["quality"].mean()
    assert means["good"] > means["junk"]
    tau = float((means["good"] + means["junk"]) / 2)
    out = (source_quality_gate(rd.from_arrow(docs), tau=tau).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert set(out["source"]) == {"good"} and len(out) == 2
    got = out.set_index("doc_id")["quality"]
    want = scored.set_index("doc_id")["quality"]
    for d in out["doc_id"]:
        assert got.loc[d] == want.loc[d]


def test_pricing_summary_matches_pandas_brute(ray_session):
    """Integer-cents TPC-H Q1 twin == float pandas brute (the fixture
    values are exact 2-decimal, so cents arithmetic loses nothing), and
    the shipdate cutoff actually filters."""
    import pandas as pd
    from optimizing_ray.pipelines.relational import pricing_summary

    n = 400
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["O", "F"], n),
        "l_quantity": rng.integers(1, 51, n).astype(float),
        "l_extendedprice": rng.integers(100, 10_000_000, n) / 100.0,
        "l_discount": rng.integers(0, 11, n) / 100.0,
        "l_tax": rng.integers(0, 9, n) / 100.0,
        "l_shipdate": pd.to_datetime("1998-01-01")
        + pd.to_timedelta(rng.integers(0, 700, n), unit="D"),
    })
    out = pricing_summary(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    ).to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)

    kept = df[df.l_shipdate <= pd.Timestamp("1998-09-02")].copy()
    assert 0 < len(kept) < n
    kept["qc"] = np.floor(kept.l_quantity * 100 + 0.5).astype(np.int64)
    kept["pc"] = np.floor(kept.l_extendedprice * 100 + 0.5).astype(np.int64)
    kept["dc"] = np.floor(kept.l_discount * 100 + 0.5).astype(np.int64)
    kept["tc"] = np.floor(kept.l_tax * 100 + 0.5).astype(np.int64)
    kept["dp4"] = kept.pc * (100 - kept.dc)
    kept["ch6"] = kept.dp4 * (100 + kept.tc)
    g = (kept.groupby(["l_returnflag", "l_linestatus"], sort=True)
         .agg(sum_qty_c=("qc", "sum"), sum_base_c=("pc", "sum"),
              sum_disc_c=("dc", "sum"), sum_disc_price4=("dp4", "sum"),
              sum_charge6=("ch6", "sum"), count_order=("qc", "size"))
         .reset_index())
    for c in ["sum_qty_c", "sum_base_c", "sum_disc_c", "sum_disc_price4",
              "sum_charge6", "count_order"]:
        assert (out[c].to_numpy() == g[c].to_numpy()).all(), c
    assert (out["avg_qty_c"].to_numpy()
            == g.sum_qty_c.to_numpy() // g.count_order.to_numpy()).all()
    # cents round-trip is exact: sum of floats == cents sum / 100
    assert np.allclose(out["sum_base_c"].to_numpy() / 100.0,
                       kept.groupby(["l_returnflag", "l_linestatus"],
                                    sort=True).l_extendedprice.sum().to_numpy())


def test_sample_per_group_quota_and_determinism(ray_session):
    """Exactly min(n, |group|) rows per group, identical across block
    layouts (pure function of the id set), and ranks follow the 2^32-wrap
    hash order."""
    from optimizing_ray.pipelines.textops import SAMPLE_MULT, sample_per_group

    ids = np.arange(1, 301, dtype=np.int64)
    src = np.where(ids % 7 == 0, "rare", np.where(ids % 2 == 0, "even", "odd"))
    t = pa.table({"doc_id": pa.array(ids), "source": pa.array(src.tolist())})

    def run(nblocks):
        out = sample_per_group(rd.from_arrow(t).repartition(nblocks),
                               n=4).to_pandas()
        return out.sort_values(["source", "smp_rank"]).reset_index(drop=True)

    a, b = run(1), run(9)
    assert a.equals(b)
    sizes = a.groupby("source").size()
    assert (sizes == 4).all()  # every group has >= 4 members here
    # rank order == hash order within each group
    for _, g in a.groupby("source"):
        h = (g.doc_id.to_numpy() * SAMPLE_MULT) % (1 << 32)
        assert (g.smp_h.to_numpy() == h).all()
        assert (np.argsort(h, kind="stable") + 1 == g.smp_rank.to_numpy()).all()
    # a group smaller than n returns the whole group
    small = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "source": pa.array(["s", "s"])})
    assert len(sample_per_group(rd.from_arrow(small), n=10).to_pandas()) == 2


def test_top_orders_matches_pandas_brute(ray_session):
    """Engine top-10 vs a pandas recomputation from raw parquet at
    sf0.001 — segment filter, date windows, integer revenue4, composite
    tie order."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import top_orders

    sf = "/root/testdata/sf0.001"
    out = top_orders(sf).to_pandas()

    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    cut = pd.Timestamp("1997-06-15")
    keys = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    o = orders[(orders.o_orderdate < cut) & orders.o_custkey.isin(keys)]
    l = li[li.l_shipdate > cut].copy()
    pc = np.floor(l.l_extendedprice.to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(l.l_discount.to_numpy() * 100.0 + 0.5).astype(np.int64)
    l["rev"] = pc * (100 - dc)
    j = l.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                right_on="o_orderkey")
    agg = j.groupby("o_orderkey").agg(
        revenue4=("rev", "sum"),
        o_orderdate=("o_orderdate", "first")).reset_index()
    agg = agg.sort_values(["revenue4", "o_orderkey"],
                          ascending=[False, True]).head(10)
    assert list(out["o_orderkey"]) == list(agg["o_orderkey"])
    assert list(out["revenue4"]) == list(agg["revenue4"])
    assert list(out["o_orderdate_us"]) == [
        int(t.value // 1000) for t in agg["o_orderdate"]]


def test_top_orders_empty_segment(ray_session):
    from optimizing_ray.pipelines.relational import top_orders

    out = top_orders("/root/testdata/sf0.001", segment="NO_SUCH_SEGMENT")
    assert out.num_rows == 0
    assert out.column_names == ["o_orderkey", "o_orderdate_us", "revenue4"]


def test_customer_distribution_matches_pandas_brute(ray_session):
    """Q13 twin vs a pandas left-join recomputation at sf0.001 — the
    zero-order customers must land in the c_count=0 bucket."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import customer_distribution

    sf = "/root/testdata/sf0.001"
    date_min = "2000-06-01"
    out = customer_distribution(sf, order_date_min=date_min).to_pandas()

    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    orders = orders[orders.o_orderdate >= pd.Timestamp(date_min)]
    per_cust = orders.groupby("o_custkey").size()
    c_count = per_cust.reindex(cust["c_custkey"], fill_value=0)
    want = (c_count.value_counts().rename_axis("c_count")
            .rename("custdist").reset_index()
            .sort_values(["custdist", "c_count"], ascending=[False, False])
            .reset_index(drop=True))
    assert list(out["c_count"]) == list(want["c_count"])
    assert list(out["custdist"]) == list(want["custdist"])
    # the left-join subtlety is actually exercised
    assert (want["c_count"] == 0).any(), "fixture has no zero-order customers"


def test_large_orders_matches_pandas_brute(ray_session):
    """Q18 twin vs a pandas recomputation at sf0.001 — integer-cents
    HAVING threshold, name attach, (totalprice DESC, orderkey) order."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import large_orders

    sf = "/root/testdata/sf0.001"
    min_qty = 180.0
    out = large_orders(sf, min_qty=min_qty).to_pandas()

    cust = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    li = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    qc = np.floor(li.l_quantity.to_numpy() * 100.0 + 0.5).astype(np.int64)
    sums = pd.DataFrame({"k": li.l_orderkey, "q": qc}).groupby("k")["q"].sum()
    win = sums[sums > int(min_qty * 100)]
    assert len(win) > 0, "threshold too high for fixture"
    j = orders[orders.o_orderkey.isin(win.index)].merge(
        cust[["c_custkey", "c_name"]], left_on="o_custkey",
        right_on="c_custkey")
    j["sum_qty_c"] = win.reindex(j.o_orderkey).to_numpy()
    j["o_totalprice_c"] = np.floor(
        j.o_totalprice.to_numpy() * 100.0 + 0.5).astype(np.int64)
    j = j.sort_values(["o_totalprice_c", "o_orderkey"],
                      ascending=[False, True])
    assert list(out["o_orderkey"]) == list(j["o_orderkey"])
    assert list(out["sum_qty_c"]) == list(j["sum_qty_c"])
    assert list(out["c_name"]) == list(j["c_name"])


def test_large_orders_empty_winner_set(ray_session):
    from optimizing_ray.pipelines.relational import large_orders

    out = large_orders("/root/testdata/sf0.001", min_qty=1e9)
    assert out.num_rows == 0
    assert out.column_names == ["c_name", "o_custkey", "o_orderkey",
                                "o_orderdate_us", "o_totalprice_c",
                                "sum_qty_c"]


def test_regional_sales_matches_pandas_brute(ray_session):
    """Q5 twin vs a pandas recomputation at sf0.001 — region filter,
    date window, same-nation equality, integer revenue4."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import regional_sales

    sf = "/root/testdata/sf0.001"
    out = regional_sales(sf, region="EUROPE").to_pandas()

    r = pq.read_table(f"{sf}/region.parquet").to_pandas()
    n = pq.read_table(f"{sf}/nation.parquet").to_pandas()
    c = pq.read_table(f"{sf}/customer.parquet").to_pandas()
    s = pq.read_table(f"{sf}/supplier.parquet").to_pandas()
    o = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    l = pq.read_table(f"{sf}/lineitem.parquet").to_pandas()
    rk = r.loc[r.r_name == "EUROPE", "r_regionkey"]
    nat = n[n.n_regionkey.isin(rk)]
    j = (l.merge(o[["o_orderkey", "o_custkey", "o_orderdate"]],
                 left_on="l_orderkey", right_on="o_orderkey")
         .merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey",
                right_on="c_custkey")
         .merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey",
                right_on="s_suppkey")
         .merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey",
                right_on="n_nationkey"))
    j = j[(j.s_nationkey == j.c_nationkey)
          & (j.o_orderdate >= pd.Timestamp("1996-01-01"))
          & (j.o_orderdate < pd.Timestamp("1997-01-01"))]
    pc = np.floor(j.l_extendedprice.to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(j.l_discount.to_numpy() * 100.0 + 0.5).astype(np.int64)
    j = j.assign(rev=pc * (100 - dc))
    want = (j.groupby("n_name").agg(revenue4=("rev", "sum"),
                                    n_items=("rev", "size"))
            .reset_index().sort_values("revenue4", ascending=False))
    assert len(want) > 0, "fixture has no qualifying rows"
    assert list(out["n_name"]) == list(want["n_name"])
    assert list(out["revenue4"]) == list(want["revenue4"])
    assert list(out["n_items"]) == list(want["n_items"])


def test_regional_sales_empty_region(ray_session):
    from optimizing_ray.pipelines.relational import regional_sales

    out = regional_sales("/root/testdata/sf0.001", region="NO_SUCH")
    assert out.num_rows == 0
    assert out.column_names == ["n_name", "revenue4", "n_items"]


def test_sales_rollup_levels_are_consistent(ray_session):
    """The derived levels must re-aggregate the finest exactly: nation
    rows sum their year rows, the ALL row sums the nation rows, and
    the grand totals equal the raw table."""
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import sales_rollup

    sf = "/root/testdata/sf0.001"
    out = sales_rollup(sf).to_pandas()
    finest = out[(out.o_year >= 0)]
    by_nat = out[(out.o_year == -1) & (out.n_name != "ALL")]
    total = out[out.n_name == "ALL"]
    assert len(total) == 1
    for _, r in by_nat.iterrows():
        f = finest[finest.n_name == r.n_name]
        assert f["revenue_c"].sum() == r.revenue_c
        assert f["n_orders"].sum() == r.n_orders
    assert by_nat["revenue_c"].sum() == total["revenue_c"].iloc[0]
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    assert total["n_orders"].iloc[0] == len(orders)
    want = int(np.floor(orders.o_totalprice.to_numpy() * 100.0
                        + 0.5).astype(np.int64).sum())
    assert total["revenue_c"].iloc[0] == want


def test_skyline_sweep_matches_n2_brute():
    """The skyline sweep kernel (the exact code skyline_docs runs per
    batch AND for the driver merge) vs the O(n^2) dominance definition,
    with planted duplicate points (equal points must survive together);
    the local-fronts-then-merge composition must equal the global
    front (local filtering is lossless)."""
    from optimizing_ray.pipelines.textops import _skyline_sweep

    rng = np.random.default_rng(41)
    n = 400
    q6 = rng.integers(0, 50, n).astype(np.int64) * 1000
    nt = rng.integers(0, 60, n).astype(np.int64)
    q6[10], nt[10] = q6[3], nt[3]  # planted duplicate pair
    ids = np.arange(n, dtype=np.int64)

    dominated = np.zeros(n, bool)
    for i in range(n):
        dominated[i] = bool(np.any(
            (q6 >= q6[i]) & (nt >= nt[i]) & ((q6 > q6[i]) | (nt > nt[i]))))
    want = set(ids[~dominated].tolist())

    # one global sweep
    assert set(ids[_skyline_sweep(q6, nt)].tolist()) == want

    # local fronts on 4 arbitrary splits, then the merge sweep —
    # exactly the plan skyline_docs composes
    parts = []
    for sl in np.array_split(np.arange(n), 4):
        parts.append(sl[_skyline_sweep(q6[sl], nt[sl])])
    cand = np.concatenate(parts)
    got = set(ids[cand[_skyline_sweep(q6[cand], nt[cand])]].tolist())
    assert got == want
    # the duplicate pair lives or dies together
    assert (3 in got) == (10 in got)


def test_order_priority_check_matches_pandas_brute(ray_session):
    """Q4 twin vs a pandas EXISTS brute at sf0.001, plus an
    impossible-window empty result with a stable schema."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import order_priority_check

    sfd = "/root/testdata/sf0.001"
    got = order_priority_check(sfd).to_pandas()

    orders = pq.read_table(sfd + "/orders.parquet").to_pandas()
    li = pq.read_table(sfd + "/lineitem.parquet").to_pandas()
    rk = set(li.loc[li.l_returnflag == "R", "l_orderkey"])
    m = ((orders.o_orderdate >= pd.Timestamp("1996-01-01"))
         & (orders.o_orderdate < pd.Timestamp("1997-01-01"))
         & orders.o_orderkey.isin(rk))
    want = (orders[m].groupby("o_orderpriority").size()
            .sort_index())
    assert got["o_orderpriority"].tolist() == want.index.tolist()
    assert got["order_count"].tolist() == want.tolist()

    z = order_priority_check(sfd, date_lo="1888-01-01",
                             date_hi="1888-01-02").to_pandas()
    assert len(z) == 0
    assert list(z.columns) == ["o_orderpriority", "order_count"]


def test_churned_high_balance_matches_pandas_brute(ray_session):
    """Q22 twin vs a pandas brute: the above-average gate must use the
    POSITIVE-balance average of the nation group (cross-multiplied, no
    division) and the anti-join must use the recent-order custkeys."""
    import pandas as pd
    import pyarrow.parquet as pq
    from optimizing_ray.pipelines.relational import churned_high_balance

    sfd = "/root/testdata/sf0.001"
    nations = (1, 3, 5, 8, 13, 17, 21)
    cutoff = pd.Timestamp("2000-06-01")
    got = churned_high_balance(sfd).to_pandas()

    cust = pq.read_table(sfd + "/customer.parquet").to_pandas()
    orders = pq.read_table(sfd + "/orders.parquet").to_pandas()
    cust = cust[cust.c_nationkey.isin(nations)].copy()
    cust["bal_c"] = np.floor(cust.c_acctbal.to_numpy() * 100.0
                             + 0.5).astype(np.int64)
    pos = cust[cust.bal_c > 0]
    s, n = int(pos.bal_c.sum()), len(pos)
    recent = set(orders.loc[orders.o_orderdate >= cutoff, "o_custkey"])
    sel = cust[(cust.bal_c * n > s) & ~cust.c_custkey.isin(recent)]
    want = sel.groupby("c_nationkey").agg(
        numcust=("bal_c", "size"), totbal_c=("bal_c", "sum")).sort_index()
    assert got["c_nationkey"].tolist() == want.index.tolist()
    assert got["numcust"].tolist() == want.numcust.tolist()
    assert got["totbal_c"].tolist() == want.totbal_c.tolist()

    # empty nation set: stable empty schema
    z = churned_high_balance(sfd, nations=(24,), cutoff="1900-01-01"
                             ).to_pandas()
    assert list(z.columns) == ["c_nationkey", "numcust", "totbal_c"]


def test_robust_quality_stats_matches_brute(ray_session):
    """robust_quality_stats vs a per-group numpy brute force (sorted
    order statistics) on the real documents table: lower median, MAD,
    trimmed count/sum must agree group by group, including groups whose
    size makes the trim slice degenerate."""
    import ray.data as rd
    from optimizing_ray.pipelines.textops import (analyze_text,
                                                  robust_quality_stats)

    sfd = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sfd}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    got = robust_quality_stats(docs).to_pandas()

    df = analyze_text(
        rd.read_parquet(f"{sfd}/documents.parquet",
                        columns=["doc_id", "source", "text"])).to_pandas()
    df["q6"] = np.floor(df["quality"].to_numpy() * 1e6 + 0.5).astype(np.int64)

    assert len(got) == df["source"].nunique()
    by_src = got.set_index("source")
    for src, g in df.groupby("source"):
        q = np.sort(g["q6"].to_numpy(np.int64))
        n = len(q)
        row = by_src.loc[src]
        assert row["n"] == n
        med = q[(n - 1) // 2]
        assert row["med_q6"] == med
        assert row["mad_q6"] == np.sort(np.abs(q - med))[(n - 1) // 2]
        lo = n // 10
        kept = q[lo:n - lo]
        assert row["trim_n"] == len(kept)
        assert row["trim_sum_q6"] == kept.sum()


def test_promo_revenue_matches_pandas_brute(ray_session):
    """Q14 twin vs a pandas integer brute force, plus the empty-window
    schema edge."""
    from optimizing_ray.pipelines.relational import promo_revenue

    sfd = "/root/testdata/sf0.001"
    got = promo_revenue(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    lo, hi = np.datetime64("1997-09-01"), np.datetime64("1997-10-01")
    m = (li["l_shipdate"].to_numpy() >= lo) & (li["l_shipdate"].to_numpy() < hi)
    j = li[m].merge(part, left_on="l_partkey", right_on="p_partkey")
    pc = np.floor(j["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    rev = pc * (100 - dc)
    p4 = int(rev[(j["p_type"] == "PROMO").to_numpy()].sum())
    t4 = int(rev.sum())
    assert got["promo_rev4"].iloc[0] == p4
    assert got["total_rev4"].iloc[0] == t4
    assert got["promo_share6"].iloc[0] == (p4 * 1_000_000) // t4

    z = promo_revenue(sfd, date_from="1900-01-01",
                      date_to="1900-01-02").to_pandas()
    assert (z["promo_rev4"].iloc[0], z["total_rev4"].iloc[0],
            z["promo_share6"].iloc[0]) == (0, 0, 0)


def test_bracket_revenue_matches_pandas_brute(ray_session):
    """Q19 twin vs a pandas OR-bracket brute force; a bracket set that
    matches nothing returns the zero row."""
    from optimizing_ray.pipelines.relational import (DEFAULT_BRACKETS,
                                                     bracket_revenue)

    sfd = "/root/testdata/sf0.001"
    got = bracket_revenue(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    qc = np.floor(j["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    keep = np.zeros(len(j), bool)
    for br, slo, shi, qlo, qhi in DEFAULT_BRACKETS:
        keep |= ((j["p_brand"] == br).to_numpy()
                 & (j["p_size"].to_numpy() >= slo)
                 & (j["p_size"].to_numpy() <= shi)
                 & (qc >= qlo * 100) & (qc <= qhi * 100))
    pc = np.floor(j["l_extendedprice"].to_numpy()[keep] * 100.0
                  + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy()[keep] * 100.0
                  + 0.5).astype(np.int64)
    assert got["revenue4"].iloc[0] == int((pc * (100 - dc)).sum())
    assert got["n_lines"].iloc[0] == int(keep.sum())
    assert got["n_lines"].iloc[0] > 0  # parameters actually select rows

    z = bracket_revenue(sfd, brackets=(("Brand#999", 1, 1, 1, 1),)
                        ).to_pandas()
    assert (z["revenue4"].iloc[0], z["n_lines"].iloc[0]) == (0, 0)


def test_top_supplier_matches_pandas_brute(ray_session):
    """Q15 twin vs a pandas brute force, including the all-ties property
    (every returned supplier carries the global max) and the empty
    window."""
    from optimizing_ray.pipelines.relational import top_supplier

    sfd = "/root/testdata/sf0.001"
    got = top_supplier(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")
    m = (li["l_shipdate"].to_numpy() >= lo) & (li["l_shipdate"].to_numpy() < hi)
    li = li[m]
    pc = np.floor(li["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(li["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    tot = pd.DataFrame({"sk": li["l_suppkey"].to_numpy(),
                        "r": pc * (100 - dc)}).groupby("sk")["r"].sum()
    mt = tot.max()
    want = np.sort(tot[tot == mt].index.to_numpy(np.int64))
    assert list(got["s_suppkey"]) == list(want)
    assert (got["total_rev4"] == mt).all()
    supp = pd.read_parquet(f"{sfd}/supplier.parquet").set_index("s_suppkey")
    assert list(got["s_name"]) == list(supp.loc[want, "s_name"])

    z = top_supplier(sfd, date_from="1900-01-01", date_to="1900-01-02")
    assert z.num_rows == 0
    assert z.column_names == ["s_suppkey", "s_name", "total_rev4"]


def test_small_qty_revenue_matches_pandas_brute(ray_session):
    """Q17 twin vs a pandas per-part brute force (float-free gate), and
    the no-eligible-parts edge returns zeros."""
    from optimizing_ray.pipelines.relational import small_qty_revenue

    sfd = "/root/testdata/sf0.001"
    got = small_qty_revenue(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    el = part[(part["p_brand"] == "Brand#12") & (part["p_size"] <= 25)]
    j = li.merge(el[["p_partkey"]], left_on="l_partkey",
                 right_on="p_partkey")
    qc = np.floor(j["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    pc = np.floor(j["l_extendedprice"].to_numpy() * 100.0
                  + 0.5).astype(np.int64)
    j = j.assign(qc=qc, pc=pc)
    s, n = 0, 0
    for _, g in j.groupby("l_partkey"):
        sq, cnt = int(g["qc"].sum()), len(g)
        keep = 5 * g["qc"].to_numpy() * cnt < sq
        s += int(g["pc"].to_numpy()[keep].sum())
        n += int(keep.sum())
    assert n > 0  # parameters actually select rows
    assert got["sum_price_c"].iloc[0] == s
    assert got["n_lines"].iloc[0] == n
    assert got["avg_yearly_c"].iloc[0] == s // 7

    z = small_qty_revenue(sfd, brand="Brand#999").to_pandas()
    assert (z["sum_price_c"].iloc[0], z["n_lines"].iloc[0]) == (0, 0)


def test_returned_top_customers_matches_pandas_brute(ray_session):
    """Q10 twin vs a pandas brute force on the full (rev DESC, custkey)
    composite; the empty-window edge keeps the schema."""
    from optimizing_ray.pipelines.relational import returned_top_customers

    sfd = "/root/testdata/sf0.001"
    k = 20
    got = returned_top_customers(sfd, k=k).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    o = pd.read_parquet(f"{sfd}/orders.parquet")
    lo, hi = np.datetime64("1997-01-01"), np.datetime64("1997-04-01")
    o = o[(o["o_orderdate"].to_numpy() >= lo)
          & (o["o_orderdate"].to_numpy() < hi)]
    j = o.merge(li[li["l_returnflag"] == "R"], left_on="o_orderkey",
                right_on="l_orderkey")
    pc = np.floor(j["l_extendedprice"].to_numpy() * 100.0
                  + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    tot = (j.assign(rev=pc * (100 - dc)).groupby("o_custkey")["rev"].sum()
           .reset_index())
    order = np.lexsort((tot["o_custkey"].to_numpy(),
                        -tot["rev"].to_numpy()))[:k]
    want = tot.iloc[order]
    assert list(got["c_custkey"]) == list(want["o_custkey"])
    assert list(got["revenue4"]) == list(want["rev"])
    cust = pd.read_parquet(f"{sfd}/customer.parquet").set_index("c_custkey")
    assert list(got["c_name"]) == list(cust.loc[want["o_custkey"], "c_name"])

    z = returned_top_customers(sfd, date_from="1900-01-01",
                               date_to="1900-01-02")
    assert z.num_rows == 0
    assert z.column_names == ["c_custkey", "c_name", "revenue4",
                              "c_acctbal_c", "n_name"]


def test_nation_volume_matches_pandas_brute(ray_session):
    """Q7 twin vs a pandas 4-table brute force, both directions of the
    pair present at sf0.01; the impossible pair returns empty schema."""
    from optimizing_ray.pipelines.relational import nation_volume

    sfd = "/root/testdata/sf0.01"
    got = nation_volume(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    o = pd.read_parquet(f"{sfd}/orders.parquet")
    su = pd.read_parquet(f"{sfd}/supplier.parquet")
    cu = pd.read_parquet(f"{sfd}/customer.parquet")
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1998-01-01")
    li = li[(li["l_shipdate"].to_numpy() >= lo)
            & (li["l_shipdate"].to_numpy() < hi)]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey"))
    sn = j["s_nationkey"].to_numpy()
    cn = j["c_nationkey"].to_numpy()
    m = ((sn == 2) & (cn == 3)) | ((sn == 3) & (cn == 2))
    j = j[m]
    pc = np.floor(j["l_extendedprice"].to_numpy() * 100.0
                  + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = (j.assign(rev=pc * (100 - dc),
                     yr=j["l_shipdate"].dt.year.astype(np.int64))
            .groupby(["s_nationkey", "c_nationkey", "yr"], sort=True)["rev"]
            .sum().reset_index())
    assert len(got) == len(want) > 0
    assert set(got["supp_nation"]) == {2, 3}  # both directions exist
    assert list(got["revenue4"]) == list(want["rev"])
    assert list(got["l_year"]) == list(want["yr"])

    z = nation_volume(sfd, nat_a=98, nat_b=99)
    assert z.num_rows == 0
    assert z.column_names == ["supp_nation", "cust_nation", "l_year",
                              "revenue4"]


def test_product_profit_matches_pandas_brute(ray_session):
    """Q9 twin vs a pandas 4-table integer brute force; negative profits
    must appear (the retailprice cost basis exceeds discounted revenue
    for deep discounts), and the no-matching-parts edge returns empty."""
    from optimizing_ray.pipelines.relational import product_profit

    sfd = "/root/testdata/sf0.001"
    got = product_profit(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    su = pd.read_parquet(f"{sfd}/supplier.parquet")
    o = pd.read_parquet(f"{sfd}/orders.parquet")
    j = (li.merge(part[part["p_name"].str.contains("red")],
                  left_on="l_partkey", right_on="p_partkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey"))
    pc_ = np.floor(j["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    qc = np.floor(j["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    rc = np.floor(j["p_retailprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    want = (j.assign(p4=pc_ * (100 - dc) - rc * qc,
                     yr=j["o_orderdate"].dt.year.astype(np.int64))
            .groupby(["s_nationkey", "yr"], sort=True)["p4"].sum()
            .reset_index())
    assert len(got) == len(want) > 0
    assert list(got["profit4"]) == list(want["p4"])
    assert list(got["o_year"]) == list(want["yr"])

    z = product_profit(sfd, name_substr="zzznope")
    assert z.num_rows == 0
    assert z.column_names == ["s_nationkey", "o_year", "profit4"]


def test_market_share_matches_pandas_brute(ray_session):
    """Q8 twin vs a pandas 6-table integer brute force; years with no
    target-nation sales keep nation_rev4 = 0 rows; the impossible region
    returns empty."""
    from optimizing_ray.pipelines.relational import market_share

    sfd = "/root/testdata/sf0.001"
    got = market_share(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    su = pd.read_parquet(f"{sfd}/supplier.parquet")
    o = pd.read_parquet(f"{sfd}/orders.parquet")
    cu = pd.read_parquet(f"{sfd}/customer.parquet")
    na = pd.read_parquet(f"{sfd}/nation.parquet")
    re_ = pd.read_parquet(f"{sfd}/region.parquet")
    j = (li.merge(part[part["p_type"] == "ECONOMY"], left_on="l_partkey",
                  right_on="p_partkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey")
         .merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey")
         .merge(re_[re_["r_name"] == "ASIA"], left_on="n_regionkey",
                right_on="r_regionkey"))
    pc_ = np.floor(j["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    dc = np.floor(j["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    j = j.assign(rev=pc_ * (100 - dc),
                 yr=j["o_orderdate"].dt.year.astype(np.int64),
                 tgt=(j["s_nationkey"] == 3).astype(np.int64))
    tot = j.groupby("yr", sort=True)["rev"].sum()
    ntv = (j.assign(nr=j["rev"] * j["tgt"]).groupby("yr", sort=True)["nr"]
           .sum())
    assert len(got) == len(tot) > 0
    assert list(got["total_rev4"]) == [int(x) for x in tot]
    assert list(got["nation_rev4"]) == [int(x) for x in ntv]
    assert list(got["share6"]) == [
        (int(n) * 10**6) // int(t) for n, t in zip(ntv, tot)]
    z = market_share(sfd, region="NOWHERE")
    assert z.num_rows == 0
    assert z.column_names == ["o_year", "total_rev4", "nation_rev4",
                              "share6"]


def test_dominant_suppliers_matches_pandas_brute(ray_session):
    """Q20-shape twin vs a pandas brute force; a 100% threshold returns
    only sole-source suppliers (or empty), never more."""
    from optimizing_ray.pipelines.relational import dominant_suppliers

    sfd = "/root/testdata/sf0.001"
    got = dominant_suppliers(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    part = pd.read_parquet(f"{sfd}/part.parquet")
    j = li.merge(part[part["p_name"].str.contains("red")],
                 left_on="l_partkey", right_on="p_partkey")
    j = j.assign(qc=np.floor(j["l_quantity"].to_numpy() * 100.0
                             + 0.5).astype(np.int64))
    ps = j.groupby(["l_partkey", "l_suppkey"])["qc"].sum().reset_index()
    tot = ps.groupby("l_partkey")["qc"].transform("sum")
    keep = 20 * ps["qc"].to_numpy() > 3 * tot.to_numpy()
    want = (ps[keep].groupby("l_suppkey").size().sort_index())
    assert len(got) == len(want) > 0
    assert list(got["s_suppkey"]) == list(want.index)
    assert list(got["n_parts"]) == list(want)

    sole = dominant_suppliers(sfd, share_num=1, share_den=1).to_pandas()
    ps2 = ps.merge(tot.rename("tot"), left_index=True, right_index=True)
    n_sole = (ps2[ps2["qc"] == ps2["tot"]]
              .groupby("l_suppkey").size())
    # 1/1 gate is s > tot — impossible; strictness must hold
    assert len(sole) == 0 or (sole["n_parts"] <= n_sole.max()).all()


def test_balance_deciles_matches_numpy_brute(ray_session):
    """Decile summary vs a numpy sort brute: bucket populations follow
    the (rank-1)*k//n split exactly, sums/mins/maxes per bucket agree,
    and populations differ by at most 1."""
    from optimizing_ray.pipelines.relational import balance_deciles

    sfd = "/root/testdata/sf0.001"
    got = balance_deciles(sfd).to_pandas()

    cu = pd.read_parquet(f"{sfd}/customer.parquet")
    bal = np.floor(cu["c_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    order = np.lexsort((cu["c_custkey"].to_numpy(), bal))
    bal = bal[order]
    n = len(bal)
    d = np.arange(n, dtype=np.int64) * 10 // n
    assert list(got["decile"]) == list(range(10))
    for i in range(10):
        seg = bal[d == i]
        row = got.iloc[i]
        assert row["n_cust"] == len(seg)
        assert row["sum_bal_c"] == seg.sum()
        assert row["min_bal_c"] == seg.min()
        assert row["max_bal_c"] == seg.max()
    assert got["n_cust"].max() - got["n_cust"].min() <= 1


def test_slow_suppliers_matches_pandas_brute(ray_session):
    """Q21-shape twin vs a pandas brute: unique-max semantics (shipdate
    ties disqualify the order), single-supplier orders excluded."""
    from optimizing_ray.pipelines.relational import slow_suppliers

    sfd = "/root/testdata/sf0.001"
    got = slow_suppliers(sfd).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    ps = (li.groupby(["l_orderkey", "l_suppkey"])["l_shipdate"].max()
          .reset_index())
    want = {}
    for ok, g in ps.groupby("l_orderkey"):
        if len(g) < 2:
            continue
        mx = g["l_shipdate"].max()
        winners = g[g["l_shipdate"] == mx]
        if len(winners) == 1:
            sk = int(winners["l_suppkey"].iloc[0])
            want[sk] = want.get(sk, 0) + 1
    assert len(want) > 0
    have = dict(zip(got["s_suppkey"], got["n_orders"]))
    assert have == want


def test_forecast_revenue_brute_and_empty(ray_session):
    """Q6 twin vs pandas; empty window returns the zero row."""
    from optimizing_ray.pipelines.relational import forecast_revenue

    sfd = "/root/testdata/sf0.001"
    got = forecast_revenue(sfd).to_pandas()
    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    sd = li["l_shipdate"].to_numpy()
    dc = np.floor(li["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    qc = np.floor(li["l_quantity"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    m = ((sd >= np.datetime64("1997-01-01")) & (sd < np.datetime64("1998-01-01"))
         & (dc >= 5) & (dc <= 7) & (qc < 2400))
    pc_ = np.floor(li["l_extendedprice"].to_numpy()[m] * 100.0
                   + 0.5).astype(np.int64)
    assert got["revenue6"].iloc[0] == int((pc_ * dc[m]).sum())
    assert got["n_lines"].iloc[0] == int(m.sum()) > 0

    z = forecast_revenue(sfd, date_from="1900-01-01",
                         date_to="1900-01-02").to_pandas()
    assert (z["revenue6"].iloc[0], z["n_lines"].iloc[0]) == (0, 0)


def test_span_dedup_stats_counts(ray_session):
    """Hand-built spans: within-doc repeats fold to one distinct value,
    sharing is cross-DOC only, docs with no text spans are absent."""
    from optimizing_ray.pipelines.textops import span_dedup_stats
    spans_t = pa.list_(pa.struct([("kind", pa.string()),
                                  ("text", pa.string()),
                                  ("media_ref", pa.string()),
                                  ("offset", pa.int32())]))

    def txt(s, o):
        return {"kind": "text", "text": s, "media_ref": "", "offset": o}

    rows = [
        # doc 1: "aa" twice (distinct once), "bb" unique to this doc
        [txt("aa", 0), txt("aa", 2), txt("bb", 4)],
        # doc 2: shares "aa"; "cc" unique
        [txt("aa", 0), txt("cc", 2)],
        # doc 3: media only -> absent from the output
        [{"kind": "image", "text": "", "media_ref": "m://3", "offset": 0}],
    ]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "spans": pa.array(rows, spans_t)})
    out = span_dedup_stats(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_text_spans"] == 2 and out.loc[1, "n_shared"] == 1
    assert out.loc[2, "n_text_spans"] == 2 and out.loc[2, "n_shared"] == 1


def test_revenue_trend_brute(ray_session):
    import duckdb
    import numpy as np
    from optimizing_ray.pipelines.relational import revenue_trend

    sf = "/root/testdata/sf0.001"
    out = revenue_trend(sf).to_pandas()
    con = duckdb.connect()
    b = con.execute(f"""
      SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
             SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) AS y
      FROM read_parquet('{sf}/orders.parquet') o
      JOIN read_parquet('{sf}/customer.parquet') c ON c_custkey = o_custkey
      JOIN read_parquet('{sf}/nation.parquet') n
        ON n_nationkey = c_nationkey
      GROUP BY 1, 2""").df()
    y0 = int(b["yr"].min())
    for _, r in out.iterrows():
        g = b[b["n_name"] == r["nation"]]
        x = (g["yr"] - y0).to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        n = len(g)
        assert r["n_years"] == n
        assert r["slope_num"] == n * (x * y).sum() - x.sum() * y.sum()
        assert r["slope_den"] == n * (x * x).sum() - x.sum() ** 2
        # a real trend: the rational evaluates to the float regr_slope
        if r["slope_den"]:
            assert abs(r["slope_num"] / r["slope_den"]
                       - np.polyfit(x, y.astype(float), 1)[0]) < 1e-3 * max(
                           1.0, abs(r["slope_num"] / r["slope_den"]))


def test_theil_sen_matches_brute(ray_session):
    """Lower median of integer-scaled pairwise slopes vs a pandas brute
    over the same yearly cents table."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from optimizing_ray.pipelines.relational import THEIL_L, theil_sen

    sf_dir = "/root/testdata/sf0.001"
    got = theil_sen(sf_dir).to_pandas()

    orders = pq.read_table(f"{sf_dir}/orders.parquet").to_pandas()
    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey") \
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    j["yr"] = pd.to_datetime(j["o_orderdate"]).dt.year.astype(np.int64)
    j["pc"] = np.floor(j["o_totalprice"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    a = j.groupby(["n_name", "yr"])["pc"].sum().reset_index()
    rows = []
    for nation, g in a.groupby("n_name"):
        yrs = g["yr"].to_numpy(np.int64)
        ys = g["pc"].to_numpy(np.int64)
        if len(yrs) < 2:
            continue
        sl = sorted((int(ys[jx]) - int(ys[ix])) * (THEIL_L // int(yrs[jx] - yrs[ix]))
                    for ix in range(len(yrs)) for jx in range(ix + 1, len(yrs)))
        rows.append((nation, len(yrs), len(sl), sl[(len(sl) - 1) // 2]))
    rows.sort()
    assert list(got.itertuples(index=False, name=None)) == rows
    assert len(got) > 0


def test_copurchase_pairs_matches_brute(ray_session):
    """Market-basket pair mining vs an itertools brute over sf0.001:
    pair supports are distinct-order counts, single supports attach
    correctly, and a higher min_support strictly filters."""
    from itertools import combinations

    from optimizing_ray.pipelines.relational import copurchase_pairs

    sfd = "/root/testdata/sf0.001"
    got = copurchase_pairs(sfd, min_support=2).to_pandas()

    li = pd.read_parquet(f"{sfd}/lineitem.parquet")
    baskets = li.groupby("l_orderkey")["l_partkey"].agg(
        lambda s: sorted(set(s)))
    pair_cnt: dict = {}
    item_cnt: dict = {}
    for parts in baskets:
        for p in parts:
            item_cnt[p] = item_cnt.get(p, 0) + 1
        for a, b in combinations(parts, 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    want = sorted((a, b, c) for (a, b), c in pair_cnt.items() if c >= 2)
    assert len(got) == len(want)
    assert list(map(tuple, got[["part_a", "part_b",
                                "pair_support"]].to_numpy())) == want
    for _, r in got.head(50).iterrows():
        assert r["support_a"] == item_cnt[r["part_a"]]
        assert r["support_b"] == item_cnt[r["part_b"]]

    got3 = copurchase_pairs(sfd, min_support=3).to_pandas()
    want3 = {(a, b) for (a, b), c in pair_cnt.items() if c >= 3}
    assert set(map(tuple, got3[["part_a", "part_b"]].to_numpy())) == want3
    assert (got3["pair_support"] >= 3).all()


def test_source_drift_and_gini_match_brute(ray_session):
    """EMD drift vs a literal normalized-CDF brute on planted skewed
    sources (a shifted source scores high, a proportional one scores
    0); Gini vs the textbook formula incl. the all-equal -> 0 and
    one-whale extremes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import textops

    # sources: 'lo' all tiny docs, 'hi' all huge docs, 'mix' mirrors
    # the global distribution of lo+hi combined exactly? build simple:
    vals = ([("lo", 10)] * 30 + [("hi", 900)] * 30
            + [("mix", 10)] * 15 + [("mix", 900)] * 15)
    t = pa.table({"source": pa.array([s for s, _ in vals]),
                  "n_chars": pa.array([v for _, v in vals], pa.int64()),
                  "doc_id": pa.array(np.arange(len(vals), dtype=np.int64))})
    got = textops.source_drift(rd.from_arrow(t).repartition(3)).to_pandas()
    m = {r.source: r for r in got.itertuples()}

    # brute EMD per source
    import collections
    n_bins, bw = 16, 64
    hist = collections.defaultdict(lambda: np.zeros(n_bins, np.int64))
    for s, v in vals:
        hist[s][min(v // bw, n_bins - 1)] += 1
    G = sum(hist.values())
    N = G.sum()
    for s, H in hist.items():
        ns = H.sum()
        diff = H * N - G * ns
        num = int(np.abs(np.cumsum(diff)).sum())
        assert m[s].emd_num == num and m[s].emd_den == ns * N, s
        assert m[s].emd6 == num * 10**6 // (ns * N)
    # mix mirrors the global 50/50 shape less than lo/hi deviate
    assert m["mix"].emd6 < m["lo"].emd6 and m["mix"].emd6 < m["hi"].emd6
    assert m["lo"].emd6 > 0

    # Gini brute on the library kernel via a tiny synthetic orders dir
    import os
    import pyarrow.parquet as pq

    from optimizing_ray.pipelines import relational
    d = "/tmp/graft_gini_fixture"
    os.makedirs(d, exist_ok=True)
    cust = pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64()),
                     "c_nationkey": pa.array([0, 0, 1], pa.int32())})
    # nation 0: equal orders -> gini 0; nation 1: one whale dominates
    orders = pa.table({
        "o_custkey": pa.array([1, 2, 1, 2, 3, 3, 3], pa.int64()),
        "o_totalprice": pa.array([10.0, 10.0, 10.0, 10.0,
                                  0.01, 0.01, 99.99])})
    pq.write_table(cust, f"{d}/customer.parquet")
    pq.write_table(orders, f"{d}/orders.parquet")
    g = relational.revenue_gini(d).to_pandas()
    r0 = g[g.nationkey == 0].iloc[0]
    assert r0.gini_num == 0 and r0.gini6 == 0
    r1 = g[g.nationkey == 1].iloc[0]
    x = sorted([1, 1, 9999])
    n, sx = 3, sum(x)
    six = sum((i + 1) * v for i, v in enumerate(x))
    assert r1.gini_num == 2 * six - (n + 1) * sx
    assert r1.gini_den == n * sx
    assert r1.gini6 == r1.gini_num * 10**6 // r1.gini_den
    assert r1.gini6 > 600000  # heavily concentrated

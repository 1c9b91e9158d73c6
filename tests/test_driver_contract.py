"""Simulates the driver's correctness gate: every queries() entry vs. its
DuckDB oracle on /root/testdata/sf0.01 — row count, schema, sorted values."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SQL_NAMES = [
    "tile_assign", "tile_counts", "grid_cells", "box_join", "box_join_shuffle",
    "box_join_3d", "knn",
    "knn_ring", "pip_join", "pip_join_shuffle", "raster_near", "vector_raster", "delete_assign",
    "relocate_assign", "train_split", "dedup_exact", "doc_stats", "events_window",
    "sliding_window", "session_window", "prev_value", "raster_density", "ann_topk",
    "distinct_sources", "top_docs_per_lang", "sales_by_nation", "median_qty",
    # round 2: brute-force twins for the formerly rows-only ops
    "adaptive_assign", "minhash_pairs", "simhash_pairs", "text_analysis",
    "fingerprints", "ann_ivf", "embedding_near_dup", "hll_distinct_users",
    "curate", "user_median_sketch",
    # round 2: span invariant fingerprint-oracled (order+byte-exact twin)
    "span_passthrough",
    # round 2: PQ with corpus-covering rerank pool provably equals exact
    # top-k (the full-probe ann_ivf pattern)
    "ann_pq",
    # round 2: temporal as-of join vs DuckDB's native ASOF LEFT JOIN;
    # 1-D interval join vs a plain range-predicate join
    "asof_join", "range_join",
    # round 3: deterministic first-bounce raycast (pixel-center rays, no
    # RNG) puts the tracer's geometry kernels under the SQL gate
    "trace_first_hit",
    # round 3: real stdlib PNG/WAV codecs — the oracle recomputes stats
    # from raw fixture values, so equality proves the bytes roundtrip
    "media_features",
    # round 3: multi-resolution tile pyramid (shift-derived levels) and
    # the distributed kNN self-join (ring-disk explode + outer cell join)
    "tile_pyramid", "knn_join",
    # round 3: zonal statistics (PIP join + exact-integer zone aggregates)
    "zonal_stats",
    # round 3: hexagonal (H3-flavored) cell family — axial assignment via
    # cube rounding + per-hex counts
    "hex_assign", "hex_counts",
    # round 3: distance-band spatial self-join (ST_DWithin)
    "dwithin_join",
    # round 3: spatial anti-join + nearest-zone reverse geocode
    "pip_anti_join", "nearest_zone",
    # round 3: IDW interpolation raster (order-exact integer weights)
    "idw_grid",
    # round 3: corpus-wide heavy hitters (top-k tokens)
    "heavy_hitters",
    # round 3: trajectory segment -> tile supercover (column sweep)
    "segment_cover",
    # round 3: convex polygon-polygon intersection join (SAT)
    "poly_overlap_join",
    # round 3: per-tile median (spatial x quantile-sketch composition)
    "tile_median",
    # round 3: temporal interval-overlap self-join (bucket ownership)
    "interval_join",
    # round 3: geohash cell strings (third cell family)
    "geohash",
    # round 3: top-k per tile (spatial group top-k)
    "tile_topk",
    # round 3: density clustering = dwithin graph + connected components
    "spatial_clusters",
    # round 3: deterministic per-stratum sampling (corpus rebalancing)
    "stratified_sample",
    # round 3: exact per-tile distinct-source counts
    "tile_distinct_sources",
    # round 4: training-data hygiene — benchmark n-gram decontamination
    # (broadcast blocklist) and Gopher-style repetition signals
    "decontaminate", "repetition_stats",
    # round 4: PII count+redaction over planted, SQL-twinned PII
    "pii_redact",
    # round 4: adaptive polygon region cover (S2 RegionCoverer twin) vs
    # the non-recursive per-depth closure of the BFS emission rule
    "polygon_cover",
    # round 4: per-doc TF-IDF top terms (exact integer score, two bounded
    # exchanges) and the bloom-prefiltered exact semi-join
    "tfidf_top_terms", "bloom_semi_join",
    # round 4: cross-doc duplicated-substring signal and the per-kind
    # interleaved-span rollup
    "dup_ngram_stats", "span_kind_rollup",
    # round 4: image resize (real PNG decode + nearest-neighbor resample,
    # oracle recomputes selected pixels from the fixture formula)
    "image_resize",
    # round 4 wave 3: per-source document cap (curation per-domain cap)
    # and the per-key cumulative window (order-exact fixed-point cents)
    "source_cap", "running_total",
    # round 4 wave 3: distributed global sort/rank (sample-based range
    # partitioning, the TeraSort shape)
    "global_rank",
    # round 4 wave 4: exact quantized k-means Lloyd step over embeddings,
    # token-budget sequence packing (global prefix sum, TeraSort shape),
    # unigram-LM quality score (broadcast/sharded vocab plans)
    "kmeans_clusters", "pack_sequences", "unigram_logprob",
    # round 4 wave 4 second batch: sliding-window RAG chunking (vectorized
    # blob gather) and per-language corpus mixing under a token budget
    "chunk_docs", "mix_corpus",
    # round 4 wave 5: end-to-end dedup keep lists — MinHash+LSH pairs ->
    # connected components (recursive-CTE SQL closure) and SemDeDup
    # (quantized k-means + integer-exact within-cluster cosine gate)
    "near_dedup_keep", "semantic_dedup",
    # round 4 wave 5 second batch: tokenizer vocabulary (min-count +
    # global rank) and per-user trajectory aggregation over derived
    # event points (lag-window segments, bbox extrema)
    "build_vocab", "trajectory_stats",
    # round 4 wave 5 third batch: per-tile integer-exact mean embedding
    # (geo x embedding fusion, kmeans fixed-point discipline by tile)
    "tile_embedding_centroid",
    # round 4 wave 5 fourth batch: DSIR importance weights over hashed
    # unigram buckets (SQL twin computes the identical polynomial token
    # hash via a powers-of-base table)
    "importance_weights",
    # round 4 wave 5 fifth batch: event-type Markov transition matrix
    "event_transitions",
    # round 4 wave 5 sixth batch: curriculum binning (exact ntile over
    # the sample-sort global rank) and the exact embedding kNN graph —
    # both born past-cap (window full of first-check queries),
    # pytest-oracled here
    "curriculum_bins", "embedding_knn_graph",
    # round 4 wave 5 seventh batch: spatio-temporal visit matrix (geo x
    # stream fusion) and incremental store-backed dedup — past-cap,
    # pytest-oracled
    "user_tile_visits", "dedup_incremental",
    # round 4 wave 5 eighth batch: language-ID confusion matrix over the
    # exact text_analysis lang_pred, and cluster topic labels (kmeans
    # labels join docs -> per-cluster top terms)
    "lang_confusion", "cluster_top_terms",
    # round 4 wave 5 ninth batch: out-of-order arrival accounting under
    # a deterministic scrambled arrival order
    "late_events",
    # round 4 wave 5 tenth batch: semantic benchmark decontamination
    # (cross-set integer-exact cosine vs a planted benchmark)
    "semantic_decontaminate",
    # round 4 wave 5 eleventh batch: IVF-bucketed kNN graph at full
    # probe (provably equals the brute graph; shares its oracle)
    "embedding_knn_graph_ivf",
    # round 4 wave 5 twelfth batch: perceptual image dhash + audio
    # difference fingerprint over the real PNG/WAV decode paths
    "image_dhash", "audio_fingerprint",
    # round 4 continuation: exact-substring dedup removal (the rewrite
    # behind the dup_ngram_stats signal; byte-exact clean_text)
    "strip_dup_ngrams",
    # round 4 continuation: DSIR importance resampling (acceptance gate
    # over importance_weights, all-integer)
    "dsir_sample",
    # round 4 continuation: per-domain quality gate (C4-style source
    # filter; integer cross-multiply mean test)
    "source_quality_gate",
    # round 4 continuation: geo x stream fusions — geofence enter/exit
    # transitions and the per-session origin-destination trip matrix
    "geofence_transitions", "od_matrix",
    # round 4 continuation: bigram-LM quality score (CCNet-style
    # perplexity proxy; hash(prev) shard co-locates pair + prefix counts)
    "bigram_logprob",
    # round 4 continuation: kNN majority-vote classifier (the
    # similarity-search quality-classifier stand-in)
    "knn_classify",
    # round 4 wave 6: TPC-H Q1 pricing summary (integer-cents exact,
    # bounded partials, zero shuffles)
    "pricing_summary",
    # round 4 wave 6: fixed-quota deterministic per-group sampling
    "sample_per_group",
    # round 4 wave 6: per-user union-of-intervals coverage (the
    # gaps-and-islands window pattern, int64-exact)
    "interval_coverage",
    # round 4 wave 6: TPC-H Q3 twin — broadcast segment semi-join,
    # per-batch revenue partials, per-shard top-k (integer revenue4)
    "top_orders",
    # round 4 wave 7: funnel conversion (sequence match under the
    # (ts, event_id) total order; greedy earliest match)
    "funnel",
    # round 4 wave 7: TPC-H Q13 (left-join count distribution incl.
    # the zero bucket) and Q18 (integer-cents HAVING winners) twins
    "customer_distribution", "large_orders",
    # round 4 wave 7: count-min sketch (mergeable d x w counter blobs,
    # deterministic splitmix64 row hashes, exact SQL twin)
    "count_min",
    # round 4 wave 7: signed random projection (JL reduction, integer
    # GEMM vs a splitmix-parity sign matrix, bit-exact twin)
    "random_projection",
    # round 4 wave 7: TPC-H Q5 twin (two broadcast dims + one
    # hash(orderkey) exchange, same-nation equality in-shard)
    "regional_sales",
    # round 4 wave 7: triangle count over the kNN graph (MR node-
    # iterator, min-vertex orientation, 2 exchanges)
    "triangle_count",
    # round 4 wave 7: ROLLUP(nation, year) — finest partials once,
    # coarser levels derived; sentinel-labelled SQL twin
    "sales_rollup",
    # round 4 wave 7: weekly cohort retention (per-batch (user, week)
    # dedup, one hash(user) exchange, bounded matrix)
    "cohort_retention",
    # round 4 wave 7: Pareto-front (skyline) curation selection over
    # the integer (quality, n_tokens) plane
    "skyline_docs",
    # round 4 wave 8: integer fixed-point PageRank over the kNN graph
    # (unrolled damped iterations, exact floor arithmetic both sides)
    "pagerank",
    # round 4 wave 8: inverted-index conjunctive retrieval (pruned
    # posting-part reads, one hash(doc) exchange)
    "boolean_search",
    # round 4 wave 8: TPC-H Q4 (EXISTS semi-join per priority) and
    # Q22 (division-free above-average gate + recent-order anti-join)
    "order_priority_check",
    "churned_high_balance",
    # round 4 wave 9: robust per-source quality stats — lower median,
    # MAD, trimmed sum+count on the integer q6 plane (order statistics
    # are tie-order invariant, so both engines agree exactly)
    "robust_quality_stats",
    # round 4 wave 10: TPC-H Q14/Q19/Q15 twins (promo share, disjunctive
    # brackets, top supplier with ties) — integer rev4 exact on both sides
    "promo_revenue",
    # round 4 wave 10b: Q17 correlated-average gate, Q10 re-keyed top-k,
    # Q7 nation-pair volume — all integer-exact both sides
    "returned_top_customers",
    # round 4 wave 11: winnowing (MOSS) fingerprints — rightmost-min
    # k-gram selection, byte-exact on the ASCII corpus
    "winnow_fingerprints",
    # exact prefix-filtered set-similarity join vs the unfiltered SQL
    # brute: a green row proves the prefix filter lossless
    "set_similarity_join",
    # reciprocal kNN pairs over the exact embedding kNN graph
    "mutual_knn",
    # MOSS overlap rollup over winnowed fingerprints
    "winnow_overlap",
    # TPC-H Q9 twin (retailprice stands in for ps_supplycost)
    "product_profit",
    # TPC-H Q8 twin: per-year integer market share
    # windowed heavy hitters (per-hour top event types)
    # TPC-H Q20-shaped nested semi-join (volume-share gate)
    "dominant_suppliers",
    # NTILE-style decile summary over the exact global rank
    # geo x set-similarity fusion: exact Jaccard over visited-tile sets
    # TPC-H Q21-shaped unique-last-shipper blame counts
    # TPC-H Q6: one filtered integer sum
    # round 4 wave 13: span-level cross-doc dedup over the interleaved
    # span column (raw-text SQL counts vs engine 64-bit hash counts)
    "span_dedup_stats",
    # round 4 wave 14: BPE tokenizer training — chained-CTE SQL twin
    # replays every pair census, tie-break, and merge application
    "bpe_merges",
    # round 4 wave 14: theta/KMV distinct set operations — integer
    # estimators recomputed in HUGEINT, bit-identical by construction
    "kmv_overlap",
    # round 4 wave 14: per-key resample + exact int64 linear
    # interpolation (segment-local grid emission)
    "resample_interpolate",
    # round 4 wave 14: integer-exact OLS slope per nation (regr_slope
    # as an exact rational; HUGEINT sums in the oracle)
    "revenue_trend",
    # round 4 wave 14: deterministic random walks over the kNN graph
    # (counter-based neighbor choice, splitmix block per step)
    "random_walks",
    # round 4 wave 15: ranked TF-IDF retrieval over the posting store
    # (integer BM25-idf weights, per-shard top-k over disjoint docs)
    "ranked_search",
    # round 4 wave 15: BPE train-then-apply tokenization (per-doc
    # post-merge token counts; SQL replays the merge chain per word)
    "bpe_encode",
    # round 4 wave 15: pruned-probe IVF recall@k audit — the SQL replay
    # of centroids + probe selection makes the approximate op exact
    "ann_recall",
    # round 4 wave 15: 3x3 focal tile statistics (the raster hotspot
    # stencil; partials stencil before totalling)
    "focal_stats",
    # round 4 wave 15: polygon shoelace area + centroid (fixed-order
    # float lockstep, micro-rounded)
    "polygon_stats",
    # round 4 wave 15: Hilbert-curve cell keys (per-bit rotate/reflect
    # unrolled in SQL)
    "hilbert_assign",
    # round 4 wave 15: Dice-score collocation mining (integer score,
    # two attach exchanges, per-shard top-k)
    "collocations",
    # round 4 wave 15: segment-segment proper-intersection join (the
    # bucketed plan vs the unbucketed SQL brute)
    "segment_intersections",
    # round 4 wave 15: exact int64 WAV resample (the SQL recomputes
    # from the fixture formula, proving the decode + interpolation)
    "audio_resample",
    # round 4 wave 15: k-core peeling over the kNN graph (fixed-round
    # CTE chain, alive-restricted degrees)
    "kcore",
    # round 4 wave 15: Theil–Sen robust trend (integer pairwise-slope
    # lower median via the common-denominator trick)
    "theil_sen",
    # round 4 wave 15: priority sampling (exact-integer DLT weights)
    # and rendezvous placement (splitmix64 argmax)
    "priority_sample",
    "rendezvous_assign",
    # round 4 wave 15: SymSpell edit-distance-2 vocabulary pairs vs
    # the unbucketed levenshtein brute
    "typo_pairs",
    # round 4 wave 15: robust per-type MAD outlier listing (integer
    # order statistics, one exchange)
    # round 4 wave 16: market-basket pair mining (distinct-order pair
    # supports, two bounded exchanges)
    "copurchase_pairs",
    # round 4 wave 16: gap-and-islands longest consecutive-day streaks
    "activity_streaks",
    # round 4 wave 16: sweep-line peak session concurrency
    "peak_concurrency",
    # round 4 wave 16: boundary-aware exact phrase retrieval
    "phrase_search",
    # round 4 wave 16: resource-allocation link prediction over the
    # mutual kNN graph
    "link_prediction",
    # round 4 wave 16: per-doc char-entropy quality gate
    "char_entropy",
    # round 4 wave 16: exact-integer full BM25 retrieval
    "bm25_search",
    # round 4 wave 16: per-user trajectory diameter
    "trajectory_diameter",
    # round 4 wave 17: Moran's I + multi-source grid BFS
    "morans_i",
    "grid_bfs",
    # round 4 wave 17: CUSUM changepoint alarms
    "cusum",
    # round 4 wave 17: AMS F2 tug-of-war sketch (exact-register twin)
    "ams_f2",
    # round 5: DBSCAN proper (minPts>=2 core/border/noise; the
    # spatial_clusters family completed) — born past-cap, DuckDB
    # gate here every suite run
    "dbscan",
    # round 5: half-life decayed per-key aggregate (exact powers-of-
    # two weights) — born past-cap, DuckDB gate here every suite run
    "decayed_counts",
    # round 5: marching-squares contour band over the tile grid —
    # born past-cap, DuckDB gate here every suite run
    "contour_cells",
    # round 5: weighted Bellman-Ford cost-distance (unrolled
    # materialized round CTEs) — born past-cap, gated here
    "cost_distance",
    # round 5: asymmetric containment join (probe prefix + length
    # filters vs the unfiltered brute) — born past-cap, gated here
    "containment_join",
    # round 5: Mann-Kendall emerging hotspots over the space-time
    # cube — born past-cap, gated here
    "emerging_hotspots",
    # round 5: synchronous label-propagation communities — born
    # past-cap, gated here
    "label_propagation",
    # round 5: time-respecting contact reachability — born
    # past-cap, gated here
    "contact_reach",
    # round 5: exact-integer distribution statistics (EMD drift,
    # Gini concentration) — born past-cap, gated here
    "source_drift", "revenue_gini", "benford_audit",
    # round 5: ROWS BETWEEN rolling frame (exact integer window
    # sum/min/max) — born past-cap, gated here
    "rolling_stats",
    # round 5: kmeans cluster exemplars — born past-cap, gated here
    "cluster_exemplars",
    # round 5: end-to-end image dedup groups — born past-cap, gated
    "media_dup_groups",
    # round 5: per-(user, zone) dwell accounting — born past-cap
    "zone_dwell",
    # round 5: mobility + concentration statistics — born past-cap
    "radius_of_gyration", "pareto_coverage",
    # round 5: visit entropy + degree assortativity — born past-cap
    "visit_entropy", "degree_assortativity",
    # round 4 wave 17: trajectory stay-point dwell windows
    "stay_points",
    # round 4 wave 17: Douglas-Peucker trajectory simplification
    "douglas_peucker",
    # round 4 wave 17: D8 flow accumulation over the tile grid
    "flow_accumulation",
    # round 4 wave 17: per-node local clustering coefficient
    "clustering_coeff",
    # round 4 wave 17: Ripley's K point-pattern statistic
    "ripley_k",
    # round 4 wave 17: local Moran's I (LISA)
    "local_morans",
    # round 4 wave 17: viewshed analysis over splitmix terrain
    "viewshed",
    # round 4 wave 18: watershed basin labels (pointer doubling)
    "watershed_basins",
    # round 4 wave 19: Horn slope/aspect + Getis-Ord Gi* hotspots
    "slope_aspect",
    "getis_ord",
    # round 4 wave 20: per-user convex hull (exact integer lattice)
    "convex_hull",
    # round 4 wave 21: rotating-calipers minimum OBB
    "min_obb",
    # round 4 wave 22: spatiotemporal co-location join
    "colocation",
    # round 4 wave 23: Clark-Evans nearest-neighbour index
    "clark_evans",
]
ROWS_ONLY_NAMES = [
    # trace_bounces: stochastic recursion, scalar-oracle-pinned in
    # test_tracer
    "trace_bounces",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def to_df(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), \
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), \
        f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            np.testing.assert_allclose(av, bv.astype(av.dtype), rtol=0, atol=0,
                                       err_msg=f"{name}.{c}")
        else:
            assert (av == bv).all(), f"{name}.{c} mismatch"


def _oracled_names():
    import __ray_entry__ as e
    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_NAMES)
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    ray_df = to_df(q(SF_DIR))
    sql_df = con.execute(sql).df()
    compare(ray_df, sql_df, name)


def test_every_oracle_key_has_query():
    import __ray_entry__ as e
    assert set(e.oracle_sql()) <= set(e.queries())




def test_parametrization_covers_every_query():
    """Every queries() entry is exercised by exactly one of the two
    parametrized gate tests (a new query cannot silently skip the gate)."""
    import __ray_entry__ as e

    assert sorted(SQL_NAMES) == sorted(e.oracle_sql().keys())
    assert sorted(SQL_NAMES + ROWS_ONLY_NAMES) == sorted(e.queries().keys())


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(ray_session, name):
    import __ray_entry__ as e

    df = to_df(e.queries()[name](SF_DIR))
    assert len(df) >= 0
    # an all-pruned pair pipeline can legitimately return an empty,
    # schema-less frame (e.g. no near-dup embeddings at this sf)
    if len(df):
        assert len(df.columns) >= 2


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = to_df(res)
    assert len(df) >= 0
    assert "query_id" in df.columns and "doc_id" in df.columns


@pytest.mark.parametrize("name", [
    "tile_assign", "box_join", "knn", "dedup_exact",
    # round-2 oracles: determinism must hold across scales too
    "simhash_pairs", "text_analysis", "fingerprints", "adaptive_assign",
    "hll_distinct_users", "user_median_sketch", "embedding_near_dup",
])
def test_queries_also_match_at_sf0001(ray_session, name):
    """Cross-sf check: the oracle equivalence is not tuned to one scale."""
    sf = "/root/testdata/sf0.001"
    c = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    import __ray_entry__ as e

    ray_df = to_df(e.queries()[name](sf))
    sql_df = c.execute(e.oracle_sql()[name]).df()
    compare(ray_df, sql_df, f"{name}@sf0.001")


def test_rotation_window_holds_the_unverified_queries():
    """Round-5 rotation guard: the driver checks only the FIRST 50
    queries() entries.  This final round, EVERY window slot goes to a
    query that has never had a driver row in any prior round (the
    CORRECTNESS_r01-r04 files are the authoritative history), and the
    queries whose implementation changed this round (the retrieval
    store's dl doc-values layout) all sit in-window."""
    import json

    import __ray_entry__ as e

    q = list(e.queries().keys())
    window = q[:50]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    previously_checked = set()
    for r in (1, 2, 3, 4):
        p = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            with open(p) as f:
                previously_checked |= set(json.load(f).keys())
    stale = [n for n in window if n in previously_checked]
    assert not stale, f"window slots wasted on already-checked queries: {stale}"
    # implementations changed in round 5 => must be driver-checked
    changed_r5 = {"bm25_search", "ranked_search", "boolean_search"}
    missing = changed_r5 - set(window)
    assert not missing, f"changed queries past the driver cap: {missing}"
    # every oracle key must be a real query and vice versa (minus the
    # documented rows-only remainder)
    o = set(e.oracle_sql().keys())
    assert o <= set(q)
    assert set(q) - o == set(ROWS_ONLY_NAMES)


# ---- round-5 contract prune: retired near-twin queries ----
# These 11 left queries()/oracle_sql() (the round-4 verdict's
# prune-redundant-twins task; retained-kernel mapping documented in
# __ray_entry__.retired_oracle_sql).  Verification strength is
# unchanged: this gate runs every retired twin against DuckDB at
# sf0.01 on every suite run, exactly like the live contract gate.
RETIRED_NAMES = [
    "nation_volume", "market_share", "small_qty_revenue",
    "bracket_revenue", "forecast_revenue", "slow_suppliers",
    "top_supplier", "windowed_topk", "trajectory_similarity",
    "balance_deciles", "mad_outliers",
]


@pytest.mark.parametrize("name", RETIRED_NAMES)
def test_retired_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as e

    q = e.retired_queries()[name]
    sql = e.retired_oracle_sql()[name]
    ray_df = to_df(q(SF_DIR))
    sql_df = con.execute(sql).df()
    compare(ray_df, sql_df, name)


def test_retired_registries_consistent():
    import __ray_entry__ as e

    assert sorted(e.retired_queries()) == sorted(e.retired_oracle_sql())
    assert sorted(e.retired_queries()) == sorted(RETIRED_NAMES)
    # retired names must NOT also be live contract entries
    assert not set(RETIRED_NAMES) & set(e.queries())

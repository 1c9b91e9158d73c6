"""Round-4 wave-4 ops: exact quantized k-means, sequence packing,
unigram-LM scoring — kernel oracles plus the plan-equality checks the
sf0.01 driver gate can't see (sharded vs broadcast, empty-cluster drop)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from optimizing_ray.pipelines import cluster, textops
from optimizing_ray.pipelines.sort import global_running_offset

SF = "/root/testdata/sf0.001"


def _emb_ds(vecs: np.ndarray) -> rd.Dataset:
    t = pa.table({"vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                  "embedding": pa.array([v.astype(np.float32) for v in vecs],
                                        pa.list_(pa.float32()))})
    return rd.from_arrow(t)


def _brute_assign(Q, C):
    d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def test_kmeans_matches_brute_force(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    Q = np.floor(vecs.astype(np.float64) * 1024).astype(np.int64)
    k = 5
    seeds = Q[:k]
    cent, live = cluster.kmeans_step(_emb_ds(vecs), seeds)
    # brute twin: assign to seeds, floor-div centroid update
    a0, _ = _brute_assign(Q, seeds)
    exp_cent = np.stack([Q[a0 == j].sum(axis=0) // (a0 == j).sum()
                         for j in range(k)])
    assert (live == np.arange(k)).all()
    np.testing.assert_array_equal(cent, exp_cent)
    out = cluster.kmeans_assign(_emb_ds(vecs), cent, live).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    a1, d1 = _brute_assign(Q, exp_cent)
    np.testing.assert_array_equal(out["cluster"].to_numpy(), a1)
    np.testing.assert_array_equal(out["dist2"].to_numpy(), d1.astype(np.int64))


def test_kmeans_duplicate_seed_drops_empty_cluster(ray_session):
    # seed 2 duplicates seed 0 -> every vector prefers cluster 0 (tie ->
    # lowest id), cluster 2 captures nothing and is dropped on refine
    vecs = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0],
                     [0.9, 0.1], [0.1, 0.9]], dtype=np.float32)
    Q = np.floor(vecs.astype(np.float64) * 1024).astype(np.int64)
    seeds = Q[:3]
    cent, live = cluster.kmeans_step(_emb_ds(vecs), seeds)
    assert list(live) == [0, 1]
    out = cluster.kmeans_assign(_emb_ds(vecs), cent, live).to_pandas()
    assert set(out["cluster"]) <= {0, 1}
    assert len(out) == 5


def test_global_running_offset_exact(ray_session):
    rng = np.random.default_rng(3)
    ids = rng.permutation(1000).astype(np.int64)
    vals = rng.integers(0, 50, size=1000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(ids), "v": pa.array(vals)}))
    out = (global_running_offset(ds, key_col="k", val_col="v",
                                 offset_name="off")
           .to_pandas().sort_values("k").reset_index(drop=True))
    order = np.argsort(ids)
    expect = np.concatenate([[0], np.cumsum(vals[order])[:-1]])
    np.testing.assert_array_equal(out["off"].to_numpy(), expect)


def test_pack_sequences_brute(ray_session):
    texts = ["a b c", "", "x", "one  two", "  lead", "t " * 500]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    out = (textops.pack_sequences(ds, budget=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ntok = np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
    start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    np.testing.assert_array_equal(out["n_tokens"].to_numpy(), ntok)
    np.testing.assert_array_equal(out["pack_start"].to_numpy(), start)
    np.testing.assert_array_equal(out["pack_id"].to_numpy(), start // 4)


@pytest.mark.parametrize("plan_rows,thresh", [(500, 1 << 30), (500, 10)])
def test_unigram_logprob_plans_agree_with_brute(ray_session, plan_rows, thresh):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = rd.from_arrow(t)
    out = (textops.unigram_logprob(docs, nrows=plan_rows,
                                   broadcast_threshold=thresh)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # brute twin over token strings
    toks = [s.split(" ") for s in t["text"].to_pylist()]
    from collections import Counter
    cnt = Counter(tok for ts in toks for tok in ts)
    total = sum(cnt.values())
    exp = []
    for ts in toks:
        s = sum(np.log(float(cnt[x])) for x in ts)
        exp.append(np.floor((s / len(ts) - np.log(float(total))) * 1e6 + 0.5) / 1e6)
    ids = np.argsort(t["doc_id"].to_numpy())
    np.testing.assert_allclose(out["logprob"].to_numpy(),
                               np.asarray(exp)[ids], rtol=0, atol=1e-9)
    np.testing.assert_array_equal(
        out["n_tokens"].to_numpy(),
        np.array([len(ts) for ts in toks], dtype=np.int64)[ids])


def test_chunk_docs_brute(ray_session):
    texts = ["a b c d e f g", "", "x", "one  two", "  lead sp",
             "αβ γδ εζ", "w " * 40 + "end"]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}))
    C, S = 3, 2
    out = (textops.chunk_docs(ds, chunk_tokens=C, stride=S)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    rows = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        o = 0
        cid = 0
        while o < len(toks):
            rows.append((i, cid, o, min(C, len(toks) - o),
                         " ".join(toks[o:o + C])))
            o += S
            cid += 1
    exp = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "chunk_start",
                                      "n_chunk_tokens", "chunk_text"])
    assert len(out) == len(exp)
    for c in exp.columns:
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_mix_corpus_rates_and_determinism(ray_session):
    rng = np.random.default_rng(11)
    langs = np.array(["en", "fr", "xx"])[rng.integers(0, 3, size=300)]
    texts = ["tok " * int(n) + "end" for n in rng.integers(1, 30, size=300)]
    ids = np.arange(300, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs),
                  "text": pa.array(texts)})
    targets = {"en": 0.7, "fr": 0.3}
    out = (textops.mix_corpus(rd.from_arrow(t), targets=targets,
                              budget_tokens=1500)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # untargeted language keeps nothing
    assert not (out["lang"] == "xx").any()
    # brute twin
    ntok = np.array([len(s.split(" ")) for s in texts], dtype=np.int64)
    kept = []
    for lang, frac in targets.items():
        tl = int(ntok[langs == lang].sum())
        rate = min(1.0, (1500.0 * frac) / float(tl))
        sel = (langs == lang) & (
            ((ids * 2_885_564_557) % (1 << 32)) / float(1 << 32) < rate)
        kept.extend(ids[sel])
    assert sorted(kept) == out["doc_id"].tolist()
    # deterministic across a rerun
    out2 = (textops.mix_corpus(rd.from_arrow(t), targets=targets,
                               budget_tokens=1500)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out2["doc_id"].tolist() == out["doc_id"].tolist()


# --- property tests (no Ray session: chunk_batch is a pure kernel) ---

from hypothesis import given, settings, strategies as st

_txt = st.text(
    alphabet=st.sampled_from(list("ab αβ日\t") + [" "]), min_size=0, max_size=60)


@given(st.lists(_txt, min_size=1, max_size=12),
       st.integers(1, 7), st.integers(1, 5))
@settings(max_examples=150, deadline=None)
def test_chunk_batch_equals_python_prop(texts, C, S):
    from optimizing_ray.pipelines.textops import chunk_batch
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    out = chunk_batch(t, C, S).to_pandas()
    rows = []
    for i, s in enumerate(texts):
        toks = s.split(" ")
        o = 0
        while o < len(toks):
            rows.append((i, o // S, o, min(C, len(toks) - o),
                         " ".join(toks[o:o + C])))
            o += S
    assert len(out) == len(rows)
    got = list(map(tuple, out[["doc_id", "chunk_id", "chunk_start",
                               "n_chunk_tokens", "chunk_text"]].itertuples(index=False)))
    assert got == rows


def test_semantic_dedup_matches_brute(ray_session):
    """Engine result == numpy brute force of the same exact pipeline
    (one quantized Lloyd step, then within-cluster lower-id cosine gate
    via the integer cross-multiplied predicate)."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(scale=0.3, size=(120, 16)).astype(np.float32)
    # plant exact copies so real duplicates exist
    plant_src = np.arange(0, 120, 10)
    vecs = np.concatenate([vecs, vecs[plant_src]])
    ids = np.concatenate([np.arange(120), plant_src + 1000]).astype(np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([v for v in vecs],
                                        pa.list_(pa.float32()))})
    Q = np.floor(vecs.astype(np.float64) * 1024).astype(np.int64)
    k = 4
    seeds = Q[:k]
    out = (cluster.semantic_dedup(rd.from_arrow(t), seeds)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    # brute twin
    a0, _ = _brute_assign(Q, seeds)
    cent = np.stack([Q[a0 == j].sum(axis=0) // (a0 == j).sum()
                     for j in range(k)])
    a1, _ = _brute_assign(Q, cent)
    n2 = (Q * Q).sum(axis=1)
    order = np.argsort(ids)
    kept = {}
    for j in range(k):
        members = [i for i in order if a1[i] == j]
        for pi, i in enumerate(members):
            dup = any((Q[i] @ Q[m]) > 0 and
                      100 * int(Q[i] @ Q[m]) ** 2
                      >= 81 * int(n2[i]) * int(n2[m])
                      for m in members[:pi])
            kept[ids[i]] = 0 if dup else 1
    np.testing.assert_array_equal(out["cluster"].to_numpy(),
                                  a1[order].astype(np.int64))
    np.testing.assert_array_equal(out["kept"].to_numpy(),
                                  np.array([kept[i] for i in ids[order]]))
    # every planted copy is caught (cosine exactly 1 with its original,
    # same cluster by identical distances)
    planted = out[out["vec_id"] >= 1000]
    assert (planted["kept"] == 0).all()
    assert len(planted) == len(plant_src)


def test_build_vocab_matches_brute(ray_session):
    """Sharded vocabulary == a Counter over single-space tokens with the
    cutoff; rank deterministic under (cnt DESC, term ASC)."""
    from collections import Counter
    texts = ["a b b c c c", "c d d  e", "b c a", "", "a a  b"]
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    out = textops.build_vocab(rd.from_arrow(t), min_count=2).to_pandas()
    cnt = Counter(tok for s in texts for tok in s.split(" ") if tok)
    want = sorted(((c, k) for k, c in cnt.items() if c >= 2),
                  key=lambda p: (-p[0], p[1]))
    assert list(out["term"]) == [k for _, k in want]
    assert list(out["cnt"]) == [c for c, _ in want]
    assert list(out["term_rank"]) == list(range(1, len(want) + 1))


def test_trajectory_stats_matches_brute(ray_session):
    """Engine per-user trajectory rows == a pandas brute force over the
    same derived points (order by ts then event_id, segment sums)."""
    from optimizing_ray.pipelines import windows as W
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac
    from optimizing_ray.config import WORLD_2D

    rng = np.random.default_rng(3)
    n = 400
    eid = np.arange(n, dtype=np.int64)
    t = pa.table({
        "event_id": pa.array(eid),
        "ts": pa.array(rng.integers(0, 50, n) * 1_000_000,
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 17, n).astype(np.int64))})
    out = (W.trajectory_stats(rd.from_arrow(t))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    wx, wy, _ = WORLD_2D.size
    df = t.to_pandas()
    df["x"] = WORLD_2D.min_x + _frac(eid, GEO_MULTS["x"]) * wx
    df["y"] = WORLD_2D.min_y + _frac(eid, GEO_MULTS["y"]) * wy
    r6 = lambda v: np.floor(v * 1e6 + 0.5) / 1e6
    rows = []
    for u, g in df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        x, y = g["x"].to_numpy(), g["y"].to_numpy()
        seg = np.sqrt(np.diff(x) ** 2 + np.diff(y) ** 2)
        rows.append((u, len(g), r6(seg.sum()),
                     r6(np.sqrt((x[-1] - x[0]) ** 2 + (y[-1] - y[0]) ** 2)),
                     x.min(), x.max(), y.min(), y.max()))
    want = pd.DataFrame(rows, columns=["user_id", "n_points", "path_len",
                                       "net_disp", "min_x", "max_x",
                                       "min_y", "max_y"])
    want["n_points"] = want["n_points"].astype(np.int64)
    pd.testing.assert_frame_equal(out, want)


def test_tile_embedding_centroid_matches_brute(ray_session):
    """Sharded tile-centroid rows == a numpy brute force over the same
    derived points and quantized vectors (exact floor-div means)."""
    from optimizing_ray.cells import point_cell2
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources.driver_tables import GEO_MULTS, _frac

    rng = np.random.default_rng(5)
    vecs = rng.normal(scale=0.4, size=(300, 8)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64) * 7 + 3  # non-contiguous ids
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([v for v in vecs],
                                        pa.list_(pa.float32()))})
    depth = 3
    out = (cluster.tile_embedding_centroid(rd.from_arrow(t), depth=depth,
                                           world=WORLD_2D)
           .to_pandas().sort_values(["tile", "pos"]).reset_index(drop=True))
    wx, wy, _ = WORLD_2D.size
    x = WORLD_2D.min_x + _frac(ids, GEO_MULTS["x"]) * wx
    y = WORLD_2D.min_y + _frac(ids, GEO_MULTS["y"]) * wy
    key = point_cell2(x, y, WORLD_2D, depth).astype(np.int64)
    Q = np.floor(vecs.astype(np.float64) * 1024).astype(np.int64)
    rows = []
    for tile in np.unique(key):
        m = key == tile
        cen = Q[m].sum(axis=0) // m.sum()
        for pos in range(Q.shape[1]):
            rows.append((tile, pos + 1, int(m.sum()), cen[pos]))
    want = pd.DataFrame(rows, columns=["tile", "pos", "n_vecs", "centroid_q"])
    want = want.astype({"tile": np.int64, "pos": np.int64,
                        "n_vecs": np.int64, "centroid_q": np.int64})
    pd.testing.assert_frame_equal(out, want)


def test_importance_weights_matches_brute(ray_session):
    """Engine DSIR weights == a Counter-based brute force of the same
    hashed-bucket add-1 log-ratio formula."""
    from optimizing_ray.functions.text import token_hash
    texts = ["the cat sat", "le chat", "the dog ran fast",
             "der hund", "the the the", "chat chat le le"]
    langs = ["en", "fr", "en", "de", "en", "fr"]
    t = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                  "text": pa.array(texts), "lang": pa.array(langs)})
    B = 64
    out = (textops.importance_weights(rd.from_arrow(t), n_buckets=B)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    rc = np.zeros(B); tc = np.zeros(B)
    for s, l in zip(texts, langs):
        for tok in s.split(" "):
            b = token_hash(tok) % B
            rc[b] += 1
            if l == "en":
                tc[b] += 1
    const = np.log(rc.sum() + B) - np.log(tc.sum() + B)
    want = []
    for s in texts:
        bs = [token_hash(tok) % B for tok in s.split(" ")]
        sm = sum(np.log(tc[b] + 1.0) - np.log(rc[b] + 1.0) for b in bs)
        want.append(np.floor((sm + len(bs) * const) * 1e6 + 0.5) / 1e6)
    np.testing.assert_array_equal(out["weight"].to_numpy(), np.array(want))
    # target-looking docs score higher than off-target ones
    assert out.loc[4, "weight"] > out.loc[5, "weight"]


def test_dsir_sample_gate_is_exact(ray_session):
    """Acceptance gate recomputed brute from the weights: rate6 clamps
    the scaled per-token weight, keep iff the 2^32-wrap hash is under
    it; the kept set equals importance_weights + manual gate."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.textops import dsir_sample, importance_weights

    texts = ["alpha beta gamma delta", "epsilon zeta eta theta",
             "alpha beta epsilon zeta", "iota kappa lam mu",
             "alpha alpha beta beta", "nu xi omicron pi"]
    langs = ["en", "en", "fr", "fr", "en", "de"]
    docs = pa.table({"doc_id": pa.array(list(range(1, 7)), pa.int64()),
                     "text": pa.array(texts), "lang": pa.array(langs)})
    scale, off, mult = 2, 700_000, 2_654_435_761
    iw = (importance_weights(rd.from_arrow(docs)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    w6pt = np.floor(iw["weight"].to_numpy()
                    / iw["n_tokens"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    rate6 = np.clip(scale * w6pt + off, 0, 1_000_000)
    u = (iw["doc_id"].to_numpy().astype(np.int64) * np.int64(mult)) % (1 << 32)
    keep = u * np.int64(1_000_000) < (rate6 << np.int64(32))
    want = set(iw["doc_id"].to_numpy()[keep])

    out = (dsir_sample(rd.from_arrow(docs), scale=scale, offset6=off)
           .to_pandas().sort_values("doc_id"))
    assert set(out["doc_id"]) == want and 0 < len(out) < 6
    got_rate = out.set_index("doc_id")["rate6"]
    for d in want:
        assert got_rate.loc[d] == rate6[iw["doc_id"].to_numpy() == d][0]


@pytest.mark.parametrize("plan_kw", [{"nrows": 10}, {}],
                         ids=["broadcast", "sharded"])
def test_bigram_logprob_matches_brute(ray_session, plan_kw):
    """Both plans vs a Counter brute over token-string bigrams,
    including a single-token doc (0 pairs -> 0.0) and repeated pairs."""
    import pyarrow as pa
    import ray.data as rd
    from collections import Counter
    from optimizing_ray.pipelines.textops import bigram_logprob

    V = 4096.0
    texts = ["a b a b c", "b c b c", "a", "x y x y x"]
    ids = [1, 2, 3, 4]
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts)})
    pc, pv = Counter(), Counter()
    for t in texts:
        tk = t.split(" ")
        for a, b in zip(tk, tk[1:]):
            pc[(a, b)] += 1
            pv[a] += 1
    out = (bigram_logprob(rd.from_arrow(docs), **plan_kw).to_pandas()
           .set_index("doc_id").sort_index())
    for i, t in zip(ids, texts):
        tk = t.split(" ")
        prs = list(zip(tk, tk[1:]))
        assert out.loc[i, "n_pairs"] == len(prs)
        if not prs:
            assert out.loc[i, "logprob"] == 0.0
            continue
        s = sum(np.log(pc[p] + 1.0) - np.log(pv[p[0]] + V) for p in prs)
        want = np.floor(s / len(prs) * 1e6 + 0.5) / 1e6
        assert out.loc[i, "logprob"] == want


def test_triangle_count_matches_adjacency_brute(ray_session):
    """Engine count vs trace(A^3)/6 on a random graph fed as DIRECTED,
    DUPLICATED edge rows (the orientation pass must dedup), plus a
    planted triangle and the empty graph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.cluster import triangle_count

    rng = np.random.default_rng(17)
    n = 60
    A = (rng.random((n, n)) < 0.08)
    A = np.triu(A, 1)
    A = A | A.T
    u, v = np.nonzero(A)  # both directions present
    # duplicate a third of the rows to exercise the dedup
    dup = rng.random(len(u)) < 0.33
    uu = np.r_[u, u[dup]].astype(np.int64)
    vv = np.r_[v, v[dup]].astype(np.int64)
    t = pa.table({"vec_id": pa.array(uu), "neighbor_id": pa.array(vv)})
    out = triangle_count(rd.from_arrow(t).repartition(4)).to_pandas()
    want_tri = int(np.trace(np.linalg.matrix_power(A.astype(np.int64), 3)) // 6)
    assert out["n_triangles"].iloc[0] == want_tri
    assert out["n_edges"].iloc[0] == int(A.sum() // 2)

    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64())})
    z = triangle_count(rd.from_arrow(empty)).to_pandas()
    assert list(z.iloc[0]) == [0, 0, 0]


def test_pagerank_matches_iterative_brute_both_plans(ray_session):
    """Integer PageRank vs a per-iteration numpy brute on a random
    directed graph with a planted DANGLING node (mass leaks) and a
    planted sink hub (no out-edges, high in-degree); the driver plan
    and the 2-exchange distributed plan must agree bit-exactly."""
    from optimizing_ray.pipelines.cluster import pagerank

    rng = np.random.default_rng(23)
    n = 80
    # node 79 dangling+hub: no out-edges, many in-edges
    src, dst = [], []
    for u in range(n - 1):
        outs = rng.choice(np.r_[np.arange(u), np.arange(u + 1, n)],
                          size=rng.integers(1, 6), replace=False)
        src += [u] * len(outs)
        dst += list(outs)
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)

    r0, dn, dd, iters = 10 ** 9, 85, 100, 3
    base = (r0 * (dd - dn)) // dd
    deg = np.bincount(src, minlength=n).astype(np.int64)
    r = np.full(n, r0, np.int64)
    for _ in range(iters):
        s = np.zeros(n, np.int64)
        np.add.at(s, dst, r[src] // np.maximum(deg[src], 1))
        r = base + (dn * s) // dd
    assert deg[n - 1] == 0  # the dangling node really is dangling

    edges = rd.from_arrow(pa.table({
        "vec_id": pa.array(src), "neighbor_id": pa.array(dst)})).repartition(4)
    nodes = rd.from_arrow(pa.table({"vec_id": pa.array(
        np.arange(n, dtype=np.int64))})).repartition(3)

    got_b = pagerank(edges, nodes, iters=iters, nrows=n).to_pandas()
    assert got_b["vec_id"].tolist() == list(range(n))
    np.testing.assert_array_equal(got_b["rank_fp"].to_numpy(np.int64), r)

    got_d = (pagerank(edges, nodes, iters=iters)
             .to_pandas().sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_array_equal(got_d["rank_fp"].to_numpy(np.int64), r)
    assert got_d["vec_id"].tolist() == list(range(n))

    # empty graph: every node keeps base mass after one damp of zero sum
    e0 = rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64())}))
    z = pagerank(e0, nodes, iters=1, nrows=n).to_pandas()
    assert (z["rank_fp"].to_numpy(np.int64) == base).all()


def test_mutual_knn_pairs_matches_brute(ray_session):
    """mutual_knn_pairs vs a dict brute force on a small directed graph
    with duplicates, self loops, and one-directional edges; invariant to
    block layout."""
    import ray.data as rd

    from optimizing_ray.pipelines.cluster import mutual_knn_pairs

    src = [1, 2, 2, 3, 4, 5, 5, 1, 7, 7]
    dst = [2, 1, 3, 2, 5, 4, 4, 1, 8, 9]   # (1,2) + (2,3) + (4,5) mutual,
    t = pa.table({"vec_id": pa.array(src, pa.int64()),   # (1,1) self,
                  "neighbor_id": pa.array(dst, pa.int64())})  # 7->8/9 one-way
    edges = set(zip(src, dst))
    want = sorted({(min(a, b), max(a, b)) for a, b in edges
                   if a != b and (b, a) in edges})
    for nb in (1, 4):
        got = mutual_knn_pairs(rd.from_arrow(t).repartition(nb)).to_pandas()
        assert list(zip(got["vec_a"], got["vec_b"])) == want
    assert want == [(1, 2), (2, 3), (4, 5)]

    z = mutual_knn_pairs(rd.from_arrow(t.slice(0, 0)))
    assert z.num_rows == 0 and z.column_names == ["vec_a", "vec_b"]


def test_random_walks_plans_and_brute(ray_session):
    """Both plans replay the brute per-walk loop exactly; dangling
    nodes stop their walk early."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.cluster import random_walks
    from optimizing_ray.pipelines.sketches import splitmix64

    # ranked adjacency: node 1 -> [2, 3]; 2 -> [3]; 3 dangling
    edges = pa.table({
        "vec_id": pa.array([1, 1, 2], pa.int64()),
        "neighbor_id": pa.array([2, 3, 3], pa.int64()),
        "knn_rank": pa.array([1, 2, 1], pa.int64())})

    def brute(L):
        adj = {1: [2, 3], 2: [3]}
        rows = []
        for st0 in sorted(adj):
            cur = st0
            rows.append((st0, 0, cur))
            for s in range(L):
                nb = adj.get(cur)
                if not nb:
                    break
                h = int(splitmix64(np.array([st0 * 16 + s],
                                            np.uint64))[0])
                cur = nb[h % len(nb)]
                rows.append((st0, s + 1, cur))
        return pd.DataFrame(rows, columns=["start_id", "step", "node_id"])

    exp = brute(4)
    loc = random_walks(rd.from_arrow(edges), walk_len=4,
                       nrows=0).to_pandas()
    pd.testing.assert_frame_equal(loc.reset_index(drop=True), exp,
                                  check_dtype=False)
    dist = (random_walks(rd.from_arrow(edges), walk_len=4,
                         nrows=3_000_000).to_pandas()
            .sort_values(["start_id", "step"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(dist, exp, check_dtype=False)


def test_collocations_matches_brute(ray_session):
    """Dice score, min_count prune, tie order, and both plans' exchange
    path against a Counter brute (raw-split pair adjacency)."""
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.textops import collocations

    texts = ["new york is big", "new york new york", "big apple",
             "is big is big is", "york new york", "a b a b a b",
             ""]  # empty text: one '' token, no pairs
    t = pa.table({"text": pa.array(texts)})
    k, min_count, scale = 6, 2, 1_000_000
    got = collocations(rd.from_arrow(t).repartition(3), k=k,
                       min_count=min_count).to_pandas()

    uc = Counter(w for s in texts for w in s.split(" "))
    pc = Counter((ws[i], ws[i + 1]) for s in texts
                 for ws in [s.split(" ")] for i in range(len(ws) - 1))
    rows = []
    for (u, v), c in pc.items():
        if c < min_count:
            continue
        rows.append((u, v, c, uc[u], uc[v],
                     (2 * c * scale) // (uc[u] + uc[v])))
    rows.sort(key=lambda r: (-r[5], -r[2], r[0], r[1]))
    want = [(i + 1, *r) for i, r in enumerate(rows[:k])]
    assert list(got.itertuples(index=False, name=None)) == want


def test_kcore_peeling_matches_brute(ray_session):
    """Planted graph with a 2-round cascade: a clique core survives,
    a pendant chain peels over successive rounds; both plans agree
    with a pure-Python peel."""
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.cluster import kcore

    # clique K5 (nodes 0-4, degree 4 each), chain 5-6-7 hanging off 0,
    # isolated 8
    base = [(a, b) for a in range(5) for b in range(5) if a != b]
    extra = [(0, 5), (5, 6), (6, 7)]
    ed = base + extra  # directed; kcore symmetrizes
    edges = pa.table({
        "vec_id": pa.array([a for a, _ in ed], pa.int64()),
        "neighbor_id": pa.array([b for _, b in ed], pa.int64())})
    nodes = pa.table({"vec_id": pa.array(range(9), pa.int64())})

    def brute(k, rounds):
        und = set()
        for a, b in ed:
            und.add((a, b))
            und.add((b, a))
        alive = set(range(9))
        for _ in range(rounds):
            deg = {v: sum(1 for a, b in und
                          if a == v and b in alive and a in alive)
                   for v in alive}
            alive = {v for v in alive if deg.get(v, 0) >= k}
        return sorted((v, sum(1 for a, b in und
                              if a == v and b in alive))
                      for v in alive)

    for k, rounds in ((2, 4), (4, 3), (5, 2)):
        want = brute(k, rounds)
        loc = kcore(rd.from_arrow(edges), rd.from_arrow(nodes), k=k,
                    rounds=rounds, nrows=9).to_pandas()
        dist = kcore(rd.from_arrow(edges).repartition(3),
                     rd.from_arrow(nodes), k=k, rounds=rounds,
                     nrows=3_000_000).to_pandas()
        assert list(loc.itertuples(index=False, name=None)) == want, (k, rounds)
        assert list(dist.itertuples(index=False, name=None)) == want, (k, rounds)
    # k=2 cascade: 7 (deg 1) peels round 1, 6 round 2, 5 round 3 —
    # only the clique survives, node 0 back at degree 4
    assert brute(2, 4) == [(0, 4), (1, 4), (2, 4), (3, 4), (4, 4)]
    assert brute(2, 2) == [(0, 5), (1, 4), (2, 4), (3, 4), (4, 4), (5, 1)]


def test_priority_sample_and_rendezvous(ray_session):
    """Priority sample equals the brute top-k under the exact integer
    rule (layout-invariant: per-batch cuts can't drop a winner);
    rendezvous ownership is stable under bucket removal (only the
    removed bucket's keys move)."""
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.sketches import splitmix64
    from optimizing_ray.pipelines.textops import priority_sample
    from optimizing_ray.stages.assign import rendezvous_assign_batch

    n = 300
    texts = [("x" * ((i * 37) % 257 + 1)) for i in range(n)]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts)})
    got = priority_sample(rd.from_arrow(t).repartition(5),
                          k=10).to_pandas()
    w = np.array([len(s) + 1 for s in texts], dtype=np.int64)
    u = (splitmix64(np.arange(n, dtype=np.uint64))
         % np.uint64(1 << 32)).astype(np.int64)
    q = (w << np.int64(32)) // (u + 1)
    order = np.lexsort((np.arange(n), -q))[:10]
    want = [(r + 1, int(i), int(w[i]), int(q[i]))
            for r, i in enumerate(order)]
    assert list(got.itertuples(index=False, name=None)) == want

    own16 = rendezvous_assign_batch(t.select(["doc_id"]), 16)
    o16 = own16["owner"].to_numpy()
    assert set(np.unique(o16)) <= set(range(16))
    # balance: no bucket is empty or hoards (16 buckets over 300 keys)
    cnt = np.bincount(o16, minlength=16)
    assert cnt.min() > 0 and cnt.max() < 3 * cnt.mean()
    # consistency: dropping bucket 15 moves ONLY its keys
    keys = np.arange(n, dtype=np.uint64)
    h = splitmix64((keys[:, None] * np.uint64(16)
                    + np.arange(16, dtype=np.uint64)[None, :]).reshape(-1)
                   ).reshape(n, 16)
    o15 = h[:, :15].argmax(axis=1)
    moved = np.flatnonzero(o16 != o15)
    assert set(o16[moved]) == {15}


def test_link_prediction_matches_brute(ray_session):
    """RA index vs a python brute on a hand+random graph: adjacent
    pairs excluded, weights floor(1e9/deg), both plans identical."""
    rng = np.random.default_rng(41)
    edges = {(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)}
    while len(edges) < 60:
        a, b = rng.integers(0, 25, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    ed = sorted(edges)
    pairs = pa.table({"vec_a": pa.array([a for a, _ in ed], pa.int64()),
                      "vec_b": pa.array([b for _, b in ed], pa.int64())})

    adj: dict = {}
    for a, b in ed:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in edges:
                continue
            common = adj[x] & adj[y]
            if common:
                want[(x, y)] = (len(common),
                                sum(10**9 // len(adj[w]) for w in common))

    got = cluster.link_prediction(pairs).to_pandas()
    assert {(r.vec_a, r.vec_b): (r.n_common, r.ra_score)
            for r in got.itertuples()} == want
    assert list(got["vec_a"]) == sorted(got["vec_a"])  # pair order

    sharded = cluster.link_prediction(pairs, nrows=1 << 61).to_pandas()
    assert sharded.equals(got)


def test_clustering_coeff_matches_brute(ray_session):
    """Per-node triangles/degree/cc vs a dense adjacency brute on a
    crafted graph: a clique (cc=1), a star hub (cc=0), a bridge."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from optimizing_ray.pipelines.cluster import clustering_coeff

    # 0-1-2-3 clique; 10 hub with leaves 11..14; bridge 3-10; dupes+both
    # directions in the input must not change anything
    und = ([(a, b) for a in range(4) for b in range(a + 1, 4)]
           + [(10, x) for x in (11, 12, 13, 14)] + [(3, 10)])
    edges = und + [(b, a) for a, b in und] + und[:3] + [(5, 5)]
    ds = rd.from_items([{"vec_id": a, "neighbor_id": b} for a, b in edges])
    got = clustering_coeff(ds).to_pandas().set_index("vec_id")

    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    for n in nodes:
        deg = len(adj[n])
        tri = sum(1 for u in adj[n] for v in adj[n]
                  if u < v and v in adj[u])
        row = got.loc[n]
        assert (row["deg"], row["tri"]) == (deg, tri)
        want = ((4 * tri * 1_000_000 + deg * (deg - 1))
                // (2 * deg * (deg - 1)) if deg >= 2 else 0)
        assert row["cc_6"] == want
    assert got.loc[0, "cc_6"] == 1_000_000      # clique corner
    assert got.loc[10, "cc_6"] == 0             # star hub
    assert 5 not in got.index                   # self-loop-only node drops
    again = clustering_coeff(ds.repartition(5)).to_pandas()
    assert got.reset_index().equals(again)


def test_label_propagation_matches_brute_and_plans_agree(ray_session):
    """Synchronous min-tie LPA vs a literal python replay on a planted
    two-clique graph with a bridge + isolated node; both plans
    bit-equal; cliques collapse to their min id."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.cluster import label_propagation

    # cliques {0,1,2,3} and {10,11,12,13}, bridge 3-10, isolated 20
    edges = ([(i, j) for i in range(4) for j in range(i + 1, 4)]
             + [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
             + [(3, 10)])
    nodes_arr = np.array(sorted({x for e in edges for x in e} | {20}),
                         dtype=np.int64)
    pt = pa.table({"vec_a": pa.array([e[0] for e in edges], pa.int64()),
                   "vec_b": pa.array([e[1] for e in edges], pa.int64())})
    nt = rd.from_arrow(pa.table({"vec_id": pa.array(nodes_arr)}))
    rounds = 4

    got = (label_propagation(pt, nt, rounds=rounds, nrows=len(nodes_arr))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    dist = (label_propagation(rd.from_arrow(pt).repartition(2), nt,
                              rounds=rounds, nrows=None)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, dist)

    # literal synchronous replay
    adj = {int(v): [] for v in nodes_arr}
    for x, y in edges:
        adj[x].append(y)
        adj[y].append(x)
    lab = {int(v): int(v) for v in nodes_arr}
    for _ in range(rounds):
        new = {}
        for v in adj:
            if not adj[v]:
                new[v] = lab[v]
                continue
            cnt = {}
            for u in adj[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            best = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == best)
        if new == lab:
            break
        lab = new
    assert {int(r.vec_id): int(r.community)
            for r in got.itertuples()} == lab
    comm = dict(zip(got["vec_id"], got["community"]))
    assert comm[20] == 20                      # isolated keeps itself
    assert len({comm[i] for i in range(4)}) == 1      # clique collapses
    assert len({comm[i] for i in range(10, 14)}) == 1


def test_cluster_exemplars_picks_nearest_member(ray_session):
    """Exemplar = argmin (dist2, vec_id) to the REFINED centroid — on
    planted geometry where the refined centroid moves AWAY from the
    seed, the exemplar is a non-seed member; counts partition the
    corpus; layout invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import cluster

    # cluster A: seed at origin, mass at ~ (10, 0...) so the refined
    # centroid lands near (8, 0) — nearest member is vec 3 (at 8.0),
    # not the seed.  cluster B: tight blob far away.
    dim = 4
    V = np.zeros((8, dim), np.float32)
    V[0] = 0.0                      # seed A (vec 0)
    V[1] = [100.0, 100.0, 0, 0]     # seed B (vec 1)
    V[2] = [10.0, 0, 0, 0]
    V[3] = [8.0, 0, 0, 0]
    V[4] = [12.0, 0, 0, 0]
    V[5] = [101.0, 100.0, 0, 0]
    V[6] = [99.0, 100.0, 0, 0]
    V[7] = [100.0, 101.0, 0, 0]
    t = pa.table({"vec_id": pa.array(np.arange(8, dtype=np.int64)),
                  "embedding": pa.array(list(V), pa.list_(pa.float32()))})
    seeds = cluster.quantize_embeddings(
        pa.array(list(V[:2]), pa.list_(pa.float32())))
    got = cluster.cluster_exemplars(
        rd.from_arrow(t).repartition(3), seeds).to_pandas()
    again = cluster.cluster_exemplars(rd.from_arrow(t), seeds).to_pandas()
    pd.testing.assert_frame_equal(got, again)

    # brute replay of step + assign + argmin
    Q = np.floor(V.astype(np.float64) * 1024).astype(np.int64)
    S = np.floor(V[:2].astype(np.float64) * 1024).astype(np.int64)
    a0 = np.array([np.lexsort((np.arange(2),
                               ((Q[i] - S) ** 2).sum(1)))[0]
                   for i in range(8)])
    cent = np.stack([
        np.floor_divide(Q[a0 == c].sum(0), (a0 == c).sum())
        for c in range(2)])
    d1 = ((Q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    a1 = np.array([np.lexsort((np.arange(2), d1[i]))[0]
                   for i in range(8)])
    m = {int(r.cluster): r for r in got.itertuples()}
    for c in range(2):
        members = np.flatnonzero(a1 == c)
        d = d1[members, c]
        w = members[np.lexsort((members, d))[0]]
        assert m[c].exemplar_id == w
        assert m[c].dist2 == d1[w, c]
        assert m[c].n_members == len(members)
    assert m[0].exemplar_id != 0       # refined centroid left the seed
    assert got["n_members"].sum() == 8


def test_degree_assortativity_known_graphs(ray_session):
    """Exact Pearson rational on graphs with known r: a perfect
    2-regular cycle has zero degree variance (den = 0 -> 0); a star is
    maximally disassortative (r = -1 exactly when M > 1); layout
    invariance via Dataset input."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.cluster import degree_assortativity

    def tbl(edges):
        return pa.table({"vec_a": pa.array([e[0] for e in edges],
                                           pa.int64()),
                         "vec_b": pa.array([e[1] for e in edges],
                                           pa.int64())})

    cycle = [(i, (i + 1) % 6) for i in range(6)]
    r = degree_assortativity(tbl(cycle)).to_pandas().iloc[0]
    assert r.r_den == 0 and r.r6 == 0

    star = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(tbl(star)).to_pandas().iloc[0]
    assert r.r_num == -r.r_den and r.r6 == -1_000_000

    # brute Pearson on a mixed graph
    mixed = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    r = degree_assortativity(
        rd.from_arrow(tbl(mixed)).repartition(2)).to_pandas().iloc[0]
    deg = {}
    for a, b in mixed:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    j = np.array([deg[a] for a, _ in mixed], dtype=float)
    k = np.array([deg[b] for _, b in mixed], dtype=float)
    m = len(mixed)
    num = 4 * m * (j * k).sum() - (j + k).sum() ** 2
    den = 2 * m * (j * j + k * k).sum() - (j + k).sum() ** 2
    assert r.r_num == int(num) and r.r_den == int(den)
    assert abs(r.r6 / 1e6 - num / den) < 1e-6

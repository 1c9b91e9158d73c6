"""ANN search, text analysis, windowed aggregates, media stubs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from optimizing_ray import synth
from optimizing_ray.functions.text import TextAnalyzer, fingerprint64, token_count
from optimizing_ray.pipelines import ann, textops, windows
from optimizing_ray.stages import media


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(500, 16)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(500), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    }), vecs


def test_brute_topk_matches_numpy(ray_session, embeddings):
    import ray.data as rd
    t, vecs = embeddings
    Q = vecs[:5].astype(np.float64)
    res = ann.brute_topk(rd.from_arrow(t), np.arange(5), Q, k=10).to_pandas()
    Vn = vecs.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    for qi in range(5):
        s = Vn @ Qn[qi]
        want = np.lexsort((np.arange(500), -s))[:10]
        g = res[res.query_id == qi].sort_values("ann_rank")
        np.testing.assert_array_equal(g["vec_id"].to_numpy(), want)


def test_ivf_topk_recall(ray_session, embeddings):
    import ray.data as rd
    t, vecs = embeddings
    Q = vecs[:5].astype(np.float64)
    exact = ann.brute_topk(rd.from_arrow(t), np.arange(5), Q, k=10).to_pandas()
    approx = ann.ivf_topk(rd.from_arrow(t), np.arange(5), Q, k=10,
                          n_centroids=8, n_probe=4).to_pandas()
    recall = 0.0
    for qi in range(5):
        e = set(exact[exact.query_id == qi]["vec_id"])
        a = set(approx[approx.query_id == qi]["vec_id"])
        recall += len(e & a) / len(e)
    assert recall / 5 >= 0.5  # probing half the centroids on random data
    # self-match is always found (vector identical to query)
    for qi in range(5):
        assert approx[(approx.query_id == qi) & (approx.ann_rank == 1)]["vec_id"].iloc[0] == qi


def test_text_analyzer_basics():
    an = TextAnalyzer()
    lang, conf = an.lang_id("the cat and the dog sat in a house of straw")
    assert lang == "en" and conf > 0.2
    lang, _ = an.lang_id("le chat et la souris sont dans le jardin de la maison")
    assert lang == "fr"
    assert an.lang_id("")[0] == "und"
    assert 0 <= an.quality("word " * 50) <= 1
    assert an.quality("") == 0.0


def test_token_count_and_fingerprint():
    assert token_count(["a b  c", "", "  ", "one"]).tolist() == [3, 0, 0, 1]
    f = fingerprint64(["hello world", "hello world", "hello worle"])
    assert f[0] == f[1] and f[0] != f[2]


def test_analyze_pipeline(ray_session):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["the quick brown fox and the hound",
                                    "le petit chat est dans le jardin"], pa.string())})
    out = textops.analyze_text(rd.from_arrow(t)).to_pandas()
    assert list(out.lang_pred) == ["en", "fr"]
    out2 = textops.doc_stats(rd.from_arrow(t)).to_pandas()
    assert out2.loc[0, "n_ws_tokens"] == 7
    assert out2.loc[0, "n_chars_calc"] == len("the quick brown fox and the hound")


def test_tumbling_window_matches_pandas(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(4)
    n = 5000
    ts = np.datetime64("2025-01-01", "us") + rng.integers(0, 86_400_000_000, n).astype("timedelta64[us]")
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 20, n), pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array(rng.uniform(0, 100, n)),
    })
    out = windows.tumbling_window(rd.from_arrow(t), window_s=3600).to_pandas()
    df = t.to_pandas()
    df["window_id"] = df["ts"].astype("int64") // (3600 * 1_000_000)
    want = df.groupby(["user_id", "window_id"]).agg(
        n_events=("value", "size"), sum_value=("value", "sum")).reset_index()
    merged = out.merge(want, on=["user_id", "window_id"], suffixes=("", "_w"))
    assert len(merged) == len(want) == len(out)
    assert (merged["n_events"] == merged["n_events_w"]).all()
    np.testing.assert_allclose(merged["sum_value"], np.round(merged["sum_value_w"], 6),
                               atol=1e-6)


def test_media_featurizer_deterministic(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(100), variant="uniform", with_spans=True)
    out1 = media.extract_media_features(rd.from_arrow(t)).to_pandas()
    out2 = media.extract_media_features(rd.from_arrow(t)).to_pandas()
    assert len(out1) == 100
    a = np.stack(out1.sort_values("doc_id")["media_features"].to_numpy())
    b = np.stack(out2.sort_values("doc_id")["media_features"].to_numpy())
    np.testing.assert_array_equal(a, b)
    # docs with no media spans -> zero features
    z = out1[out1.n_media_spans == 0]
    if len(z):
        assert np.allclose(np.stack(z["media_features"].to_numpy()), 0.0)
    # real decode happened: image means live in (0, 255) and rms > 0
    m = out1[out1.n_img > 0]
    assert ((m.img_mean_r > 0) & (m.img_mean_r < 255)).all()
    assert (out1[out1.n_aud > 0].aud_rms > 0).all()


def test_png_codec_roundtrip_all_filters():
    from optimizing_ray.stages import codecs
    rng = np.random.default_rng(3)
    # >5 rows so the cycling encoder exercises every filter type; odd
    # width so stride arithmetic is non-trivial
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)
    for key in (0, 42 * 16 + 3, 10**7):
        px = codecs.image_pixels(key)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(px)), px)
        au = codecs.audio_samples(key)
        assert np.array_equal(codecs.decode_wav(codecs.encode_wav(au)), au)


def test_media_exotic_format_seam():
    from optimizing_ray.stages import codecs
    with pytest.raises(NotImplementedError):
        codecs.decode_png(b"GIF89a not a png")
    with pytest.raises(NotImplementedError):
        codecs.fetch_fixture("media://doc-000000000001/0", "video")
    feat = media.MediaFeaturizer(fetch=lambda ref, kind: b"\x00exotic")
    t = synth.documents_batch(np.arange(20), variant="uniform", with_spans=True)
    with pytest.raises(NotImplementedError):
        feat(t)


def test_sample_frames(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(50), variant="uniform", with_spans=True)
    out = media.sample_frames(rd.from_arrow(t), every_n=10).to_pandas()
    assert (out["frame_idx"] % 10 == 0).all()
    assert out["media_ref"].str.startswith("media://").all()


def test_curate_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines import curate as cur
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then the cat runs home to the house " * 3),
        (2, "the quick brown fox jumps over the lazy dog and then the cat runs home to the house " * 3),  # dup of 1
        (3, "le chat et le chien sont dans le jardin de la maison et il y a un arbre " * 3),
        (4, "!!!! ???? $$$$ %%%% ^^^^"),   # junk -> low quality
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    out = cur.curate(rd.from_arrow(t), min_quality=0.3).to_pandas()
    assert 2 not in set(out["doc_id"])          # dedup kept min id
    assert 4 not in set(out["doc_id"])          # junk gated out
    assert set(out["doc_id"]) == {1, 3}
    assert set(out.loc[out.doc_id == 1, "lang_pred"]) == {"en"}
    assert set(out.loc[out.doc_id == 3, "lang_pred"]) == {"fr"}
    assert set(out["split"]) <= {"train", "val"}


def test_pq_topk_exact_when_pool_covers(ray_session, embeddings):
    """rerank >= corpus: the PQ scan's candidate pool covers everything,
    so the exact re-rank provably returns brute-force top-k."""
    import ray.data as rd
    t, vecs = embeddings
    Q = vecs[:5].astype(np.float64)
    got = ann.pq_topk(rd.from_arrow(t), np.arange(5), Q, k=10, m=4,
                      ksub=64, rerank=500).to_pandas()
    want = ann.brute_topk(rd.from_arrow(t), np.arange(5), Q, k=10).to_pandas()
    key = lambda d: d.sort_values(["query_id", "ann_rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got)[["query_id", "vec_id", "ann_rank"]],
                                  key(want)[["query_id", "vec_id", "ann_rank"]],
                                  check_dtype=False)


def test_pq_topk_recall_compressed(ray_session, embeddings):
    """Small rerank pool (the compressed-scan mode): recall@10 vs brute
    must stay high on clustered data, and runs must be deterministic."""
    import ray.data as rd
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(10, 16))
    vecs = np.concatenate([c + 0.05 * rng.normal(size=(50, 16))
                           for c in centers]).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(500), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    Q = vecs[::100][:5].astype(np.float64)
    want = ann.brute_topk(rd.from_arrow(t), np.arange(5), Q, k=10).to_pandas()
    got1 = ann.pq_topk(rd.from_arrow(t), np.arange(5), Q, k=10, m=4,
                       ksub=64, rerank=50).to_pandas()
    got2 = ann.pq_topk(rd.from_arrow(t), np.arange(5), Q, k=10, m=4,
                       ksub=64, rerank=50).to_pandas()
    pd.testing.assert_frame_equal(got1, got2)  # deterministic
    recalls = []
    for qi in range(5):
        w = set(want[want.query_id == qi]["vec_id"])
        g = set(got1[got1.query_id == qi]["vec_id"])
        recalls.append(len(w & g) / len(w))
    assert np.mean(recalls) >= 0.9, recalls


def test_pq_encode_is_compact(ray_session, embeddings):
    """The encoded corpus carries only (id, m-byte code) — the 16x
    compression that makes a 100 TB scan feasible."""
    import ray.data as rd
    t, _ = embeddings
    books = ann.train_pq(rd.from_arrow(t), m=4, ksub=64)
    assert books.shape == (4, 64, 4)
    enc = ann.pq_encode(rd.from_arrow(t), books).to_arrow_refs()
    import ray as _ray
    tt = pa.concat_tables([_ray.get(r) for r in enc])
    assert tt.column_names == ["vec_id", "code"]
    assert tt.num_rows == 500
    assert tt.schema.field("code").type == pa.list_(pa.uint8(), 4)


def test_heavy_hitters_tiebreak_and_block_invariance(ray_session):
    """Counts exact vs a local Counter; ties at equal count order by
    token asc; result invariant to block count."""
    from collections import Counter

    import ray.data as rd
    from optimizing_ray.pipelines import textops

    texts = (["aa bb", "bb cc aa", "  cc  dd ", "AA bb"] * 25
             + ["zz yy xx"] * 10)
    t = pa.table({"text": pa.array(texts)})
    want = Counter()
    for s in texts:
        want.update(w.lower() for w in s.split())
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    for nb in (1, 7):
        got = textops.heavy_hitters(
            rd.from_arrow(t).repartition(nb), k=5).to_pandas()
        assert list(zip(got["token"], got["n"])) == top
        assert list(got["rank"]) == [1, 2, 3, 4, 5]


def test_embedding_knn_graph_ties_and_chunking(ray_session):
    """Chunked engine result == brute lexsort selection, including exact
    distance ties (planted identical vectors) across chunk boundaries."""
    import ray.data as rd
    from optimizing_ray.pipelines import ann as A

    rng = np.random.default_rng(13)
    vecs = rng.normal(scale=0.4, size=(90, 8)).astype(np.float32)
    vecs[60] = vecs[10]  # exact duplicate -> d2 tie structure
    vecs[61] = vecs[10]
    t = pa.table({"vec_id": pa.array(np.arange(90, dtype=np.int64)),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (A.embedding_knn_graph(rd.from_arrow(t), k=4, corpus_chunk=17,
                                 nrows=90)
           .to_pandas().sort_values(["vec_id", "knn_rank"])
           .reset_index(drop=True))
    Q = np.floor(vecs.astype(np.float64) * 1024).astype(np.int64)
    rows = []
    for i in range(90):
        d2 = ((Q - Q[i]) ** 2).sum(axis=1)
        cand = [(int(d2[j]), j) for j in range(90) if j != i]
        cand.sort()
        for rk, (d, j) in enumerate(cand[:4], 1):
            rows.append((i, j, d, rk))
    want = pd.DataFrame(rows, columns=["vec_id", "neighbor_id",
                                       "dist2", "knn_rank"])
    want = want.astype(np.int64)
    pd.testing.assert_frame_equal(out, want)
    # the planted duplicates are each other's rank-1/2 neighbors at d2=0
    assert set(out[(out.vec_id == 10) & (out.dist2 == 0)]
               ["neighbor_id"]) == {60, 61}


def test_embedding_knn_graph_ivf_full_probe_equals_brute(ray_session):
    """With every cell probed the IVF graph PROVABLY equals the brute
    graph (the full-probe oracle-certainty rule); at n_probe=1 planted
    identical vectors are still found (they share a cell), and overall
    recall stays high."""
    import ray.data as rd
    from optimizing_ray.pipelines import ann as A
    from optimizing_ray.pipelines.cluster import quantize_embeddings

    rng = np.random.default_rng(23)
    vecs = rng.normal(scale=0.4, size=(150, 8)).astype(np.float32)
    vecs[120] = vecs[7]  # planted exact duplicate
    t = pa.table({"vec_id": pa.array(np.arange(150, dtype=np.int64)),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    seeds = np.floor(vecs[:6].astype(np.float64) * 1024).astype(np.int64)

    brute = (A.embedding_knn_graph(rd.from_arrow(t), k=4, nrows=150)
             .to_pandas().sort_values(["vec_id", "knn_rank"])
             .reset_index(drop=True))
    full = (A.embedding_knn_graph_ivf(rd.from_arrow(t), seeds, k=4,
                                      n_probe=6)
            .to_pandas().sort_values(["vec_id", "knn_rank"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(full, brute)

    one = (A.embedding_knn_graph_ivf(rd.from_arrow(t), seeds, k=4,
                                     n_probe=1).to_pandas())
    # planted duplicate found at rank 1 both directions
    assert ((one.vec_id == 120) & (one.neighbor_id == 7)
            & (one.knn_rank == 1)).any()
    assert ((one.vec_id == 7) & (one.neighbor_id == 120)
            & (one.knn_rank == 1)).any()
    # recall vs brute stays high even at 1 probe of 6 cells
    bset = set(map(tuple, brute[["vec_id", "neighbor_id"]].values))
    oset = set(map(tuple, one[["vec_id", "neighbor_id"]].values))
    assert len(bset & oset) / len(bset) > 0.6


def test_embedding_knn_graph_plan_gate(ray_session):
    """The library entry nrows-gates its plan (round-5 verdict item):
    a small nrows hint keeps the exact broadcast brute; above the
    threshold — or with NO hint at all (conservative "large") — the
    call falls into the IVF sharded plan, which at full probe equals
    the brute graph bit-for-bit and at partial probe still finds the
    planted duplicates (shared-cell certainty)."""
    import ray.data as rd
    from optimizing_ray.pipelines import ann as A

    rng = np.random.default_rng(41)
    vecs = rng.normal(scale=0.4, size=(100, 8)).astype(np.float32)
    vecs[80] = vecs[5]  # planted exact duplicate
    t = pa.table({"vec_id": pa.array(np.arange(100, dtype=np.int64)),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})

    brute = (A.embedding_knn_graph(rd.from_arrow(t), k=4, nrows=100)
             .to_pandas().sort_values(["vec_id", "knn_rank"])
             .reset_index(drop=True))
    # nrows above the threshold -> IVF plan; full probe (n_probe >=
    # n_seeds, auto-drawn seeds) must equal the brute graph exactly
    gated = (A.embedding_knn_graph(rd.from_arrow(t), k=4,
                                   nrows=1_000_000,
                                   broadcast_threshold=200_000,
                                   n_seeds=6, n_probe=100)
             .to_pandas().sort_values(["vec_id", "knn_rank"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(gated, brute)
    # no hint at all -> conservative "large" -> IVF partial probe:
    # approximate, but the planted duplicate pair is certain
    nohint = A.embedding_knn_graph(rd.from_arrow(t), k=4,
                                   n_seeds=6).to_pandas()
    assert ((nohint.vec_id == 80) & (nohint.neighbor_id == 5)
            & (nohint.knn_rank == 1)).any()
    assert ((nohint.vec_id == 5) & (nohint.neighbor_id == 80)
            & (nohint.knn_rank == 1)).any()
    # explicit plan pin overrides the hint
    pinned = (A.embedding_knn_graph(rd.from_arrow(t), k=4,
                                    nrows=1_000_000, plan="broadcast")
              .to_pandas().sort_values(["vec_id", "knn_rank"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(pinned, brute)


def test_ivf_recall_histogram(ray_session):
    """The recall histogram equals the driver-side intersection of the
    two (independently brute-verified) graphs; full probe puts every
    vector at n_hits=k; counts total the corpus."""
    import ray.data as rd
    from optimizing_ray.pipelines import ann as A

    rng = np.random.default_rng(31)
    vecs = rng.normal(scale=0.4, size=(120, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(np.arange(120, dtype=np.int64)),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    seeds = np.floor(vecs[:6].astype(np.float64) * 1024).astype(np.int64)
    k = 4

    got = A.ivf_recall(rd.from_arrow(t), seeds, k=k,
                       n_probe=2).to_pandas()
    brute = (A.embedding_knn_graph(rd.from_arrow(t), k=k, nrows=120)
             .to_pandas())
    appr = (A.embedding_knn_graph_ivf(rd.from_arrow(t), seeds, k=k,
                                      n_probe=2).to_pandas())
    bset = set(map(tuple, brute[["vec_id", "neighbor_id"]].values))
    aset = set(map(tuple, appr[["vec_id", "neighbor_id"]].values))
    from collections import Counter
    per_vec = Counter(v for v, _ in bset & aset)
    want = Counter(per_vec.get(v, 0) for v in range(120))
    assert dict(zip(got["n_hits"], got["n_vectors"])) == dict(want)
    assert got["n_vectors"].sum() == 120

    full = A.ivf_recall(rd.from_arrow(t), seeds, k=k,
                        n_probe=6).to_pandas()
    assert list(full.itertuples(index=False, name=None)) == [(k, 120)]


def test_knn_classify_majority_and_ties(ray_session):
    """Planted geometry: queries sit on top of known-label clusters;
    a vote tie breaks to the smallest label."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.ann import knn_classify

    # train ids (not % 5 == 0): two clusters, labels 1 and 2
    # query ids (% 5 == 0): 10 near cluster A, 20 equidistant tie
    rows = []
    for i, vid in enumerate([1, 2, 3]):        # cluster A, label 1
        rows.append((vid, [0.0, 0.1 * i], 1))
    for i, vid in enumerate([6, 7, 8]):        # cluster B, label 2
        rows.append((vid, [10.0, 0.1 * i], 2))
    rows.append((10, [0.0, 0.05], 9))          # query near A
    rows.append((4, [5.0, 0.0], 1))            # midpoint train, label 1
    rows.append((9, [5.0, 0.1], 2))            # midpoint train, label 2
    rows.append((20, [5.0, 0.05], 9))          # query: 2 votes vs 2 votes
    t = pa.table({"vec_id": pa.array([r[0] for r in rows], pa.int64()),
                  "embedding": pa.array([r[1] for r in rows],
                                        pa.list_(pa.float32())),
                  "label": pa.array([r[2] for r in rows], pa.int32())})
    out = (knn_classify(rd.from_arrow(t), k=3, holdout_mod=5,
                        holdout_rem=0).to_pandas()
           .set_index("vec_id").sort_index())
    assert set(out.index) == {10, 20}
    assert out.loc[10, "pred_label"] == 1 and out.loc[10, "n_votes"] == 3
    # query 20's 3 nearest: the two midpoint trains + one cluster — the
    # exact winner depends on the (count, label) rule; recompute brute
    import numpy as np
    q = np.floor(np.array([5.0, 0.05]) * 1024).astype(np.int64)
    trains = [(r[0], np.floor(np.array(r[1]) * 1024).astype(np.int64), r[2])
              for r in rows if r[0] % 5 != 0]
    d = sorted(((int(((q - v) ** 2).sum()), vid, lab)
                for vid, v, lab in trains))[:3]
    from collections import Counter
    cnt = Counter(lab for _, _, lab in d)
    top = max(cnt.values())
    want = min(l for l, c in cnt.items() if c == top)
    assert out.loc[20, "pred_label"] == want
    assert out.loc[20, "n_votes"] == top
    assert out.loc[20, "label"] == 9


def test_random_projection_preserves_planted_neighbor(ray_session):
    """JL sanity on the engine op: a planted near-duplicate pair stays
    each other's nearest neighbor in the projected space, and the
    output is partition-invariant (pure per-row function)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.ann import random_projection

    rng = np.random.default_rng(9)
    n, d = 200, 64
    M = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    M[1] = M[0] + 1e-3  # planted near-dup
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(M), pa.list_(pa.float32()))})
    out = (random_projection(rd.from_arrow(t), out_dim=16)
           .to_pandas().sort_values(["vec_id", "out_dim"]))
    Y = out["y_q"].to_numpy().reshape(n, 16).astype(np.float64)
    d2 = ((Y - Y[0]) ** 2).sum(axis=1)
    d2[0] = np.inf
    assert int(np.argmin(d2)) == 1

    out2 = (random_projection(rd.from_arrow(t).repartition(7), out_dim=16)
            .to_pandas().sort_values(["vec_id", "out_dim"]))
    assert (out2["y_q"].to_numpy() == out["y_q"].to_numpy()).all()


def test_random_projection_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.pipelines.ann import random_projection

    t = pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float32()))})
    out = random_projection(rd.from_arrow(t)).to_pandas()
    # all-empty datasets surface column-less through to_pandas (Ray
    # empty-block gotcha); rows must be zero either way
    assert len(out) == 0
    assert list(out.columns) in ([], ["vec_id", "out_dim", "y_q"])


def test_audio_resample_exact(ray_session):
    """Resampled values replay a per-sample integer brute over the
    fixture audio; endpoints are preserved exactly; floor division
    handles negative slopes (x alternates signs)."""
    import ray.data as rd

    from optimizing_ray.sources import driver_tables
    from optimizing_ray.stages import codecs, media

    docs = (rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(40, dtype=np.int64))}))
        .map_batches(driver_tables.derive_spans_batch,
                     batch_format="pyarrow", zero_copy_batch=True))
    m = media.N_RESAMPLE
    got = (media.audio_resample(docs).to_pandas()
           .sort_values(["doc_id", "ord", "out_i"]).reset_index(drop=True))
    assert len(got) % m == 0 and len(got) > 0

    N = codecs.N_SAMPLES
    den = m - 1
    for (d, o), grp in got.groupby(["doc_id", "ord"]):
        x = codecs.audio_samples(int(d) * 16 + int(o)).astype(np.int64)
        vals = grp.sort_values("out_i")["v"].to_numpy(np.int64)
        assert vals[0] == x[0] and vals[-1] == x[N - 1]
        for j in range(m):
            num = j * (N - 1)
            i0, r = num // den, num % den
            i1 = min(i0 + 1, N - 1)
            want = int(x[i0]) + ((int(x[i1]) - int(x[i0])) * r) // den
            assert vals[j] == want, (d, o, j)


def test_media_decode_actor_pool_one_client_per_actor(ray_session, tmp_path):
    """Round-5 verdict item: the decode stages (dhash / audio fp /
    audio resample) run behind client-per-actor pools when a store
    client factory is supplied — each actor constructs exactly one
    client, and results are unchanged vs the stateless fixture path."""
    import ray.data as rd

    from optimizing_ray.sources import driver_tables
    from optimizing_ray.stages import media

    class _CountingClientFactory:
        """Fake store-client factory: records every construction in a
        pid-tagged file so the test can prove ONE client per actor
        process.  Defined in-function so cloudpickle ships it by VALUE
        (workers cannot import the test module)."""

        def __init__(self, log_dir):
            self.log_dir = log_dir

        def __call__(self):
            import os

            from optimizing_ray.stages.media import fetch_fixture
            with open(os.path.join(self.log_dir,
                                   f"{os.getpid()}.cnt"), "a") as f:
                f.write("x")
            return fetch_fixture

    docs = (rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(60, dtype=np.int64))}))
        .map_batches(driver_tables.derive_spans_batch,
                     batch_format="pyarrow", zero_copy_batch=True))

    for name, op in (("dhash", media.image_dhash),
                     ("afp", media.audio_fingerprint),
                     ("ares", media.audio_resample)):
        log_dir = tmp_path / name
        log_dir.mkdir()
        base = op(docs).to_pandas()
        pooled = op(docs, fetch_factory=_CountingClientFactory(str(log_dir)),
                    concurrency=2, batch_size=16).to_pandas()
        sort_cols = [c for c in ("doc_id", "ord", "out_i")
                     if c in base.columns]
        pd.testing.assert_frame_equal(
            base.sort_values(sort_cols).reset_index(drop=True),
            pooled.sort_values(sort_cols).reset_index(drop=True))
        logs = list(log_dir.iterdir())
        assert len(logs) >= 1            # the pool actually ran actors
        for p in logs:                   # ONE construction per process
            assert p.read_text() == "x", (name, p)


def test_media_dup_groups_matches_brute(ray_session):
    """Duplicate grouping vs a python replay over the per-span hashes:
    counts, distinct docs, (doc, ord)-minimal representative, the
    min_spans gate, and layout invariance."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.sources import driver_tables
    from optimizing_ray.stages import media

    docs = (rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(80, dtype=np.int64))}))
        .map_batches(driver_tables.derive_spans_batch,
                     batch_format="pyarrow", zero_copy_batch=True))
    spans = media.image_dhash(docs).to_pandas()
    got = (media.media_dup_groups(docs, min_spans=2).to_pandas()
           .sort_values("dhash").reset_index(drop=True))
    again = (media.media_dup_groups(
        rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(80, dtype=np.int64))}))
        .map_batches(driver_tables.derive_spans_batch,
                     batch_format="pyarrow", zero_copy_batch=True)
        .repartition(5), min_spans=2).to_pandas()
        .sort_values("dhash").reset_index(drop=True))
    assert got.equals(again)

    groups = collections.defaultdict(list)
    for r in spans.itertuples():
        groups[int(r.dhash)].append((int(r.doc_id), int(r.ord)))
    want = []
    for h, members in groups.items():
        if len(members) >= 2:
            kd, ko = min(members)
            want.append((h, len(members), len({d for d, _ in members}),
                         kd, ko))
    want.sort()
    assert list(map(tuple, got.to_numpy())) == want
    assert len(want) > 0                      # fixture plants dup sets

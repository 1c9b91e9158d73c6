"""Dedup family: exact, MinHash-LSH, SimHash, embedding near-dup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from optimizing_ray.functions.text import shingles
from optimizing_ray.pipelines import dedup


def corpus_with_dups():
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs before the party starts",
        "how vexingly quick daft zebras jump over fences in the garden",
        "sphinx of black quartz judge my vow said the old teacher slowly",
        "a completely different document about ray data pipelines and arrow",
    ]
    rows = []
    i = 0
    for b in base:
        rows.append((i, b)); i += 1
        rows.append((i, b)); i += 1                      # exact dup
        rows.append((i, b.replace("the", "THE", 1))); i += 1  # near dup
        rows.append((i, f"unique filler text number {i} with its own words {i*7}")); i += 1
    return pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                     "text": pa.array([r[1] for r in rows], pa.string())})


def test_exact_dedup(ray_session):
    import ray.data as rd
    t = corpus_with_dups()
    out = dedup.exact_dedup(rd.from_arrow(t)).to_pandas()
    # oracle: min doc_id per distinct text
    df = t.to_pandas()
    want = df.groupby("text")["doc_id"].min().reset_index()
    got = out.sort_values("doc_id").reset_index(drop=True)
    assert set(got["doc_id"]) == set(want["doc_id"])
    assert len(got) == df["text"].nunique()


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd
    t = corpus_with_dups()
    pairs = dedup.minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.6).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    # every exact pair (j=1.0) must be found; near pairs (1-char edit) too
    for b in range(5):
        i = b * 4
        assert (i, i + 1) in got, f"exact dup pair {(i, i+1)} missed"
        assert (i, i + 2) in got or (i + 1, i + 2) in got
    # verified jaccard must be exact
    df = t.to_pandas().set_index("doc_id")["text"]
    for _, r in pairs.iterrows():
        sa, sb = shingles(df[r.doc_a]), shingles(df[r.doc_b])
        assert r.jaccard == pytest.approx(len(sa & sb) / len(sa | sb))
        assert r.jaccard >= 0.6


def test_minhash_pairs_unique(ray_session):
    import ray.data as rd
    t = corpus_with_dups()
    pairs = dedup.minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.5).to_pandas()
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()


def test_simhash_finds_exact_dups(ray_session):
    import ray.data as rd
    t = corpus_with_dups()
    pairs = dedup.simhash_pairs(rd.from_arrow(t), max_hamming=3).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    for b in range(5):
        i = b * 4
        assert (i, i + 1) in got  # identical text -> hamming 0
    assert (pairs["hamming"] <= 3).all()


def test_embedding_near_dup(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    vecs = np.concatenate([base, base + rng.normal(scale=0.01, size=base.shape).astype(np.float32)])
    t = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    pairs = dedup.embedding_near_dup_pairs(rd.from_arrow(t), threshold=0.99).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    found = sum((i, i + 20) in got for i in range(20))
    assert found >= 18  # LSH recall on near-identical vectors
    assert (pairs["cosine"] >= 0.99).all()


def test_connected_components():
    pairs = pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
    cc = dedup.connected_components(pairs)
    assert cc[1] == cc[2] == cc[3]
    assert cc[10] == cc[11]
    assert cc[1] != cc[10]


def test_minhash_join_verify_path_matches_broadcast(ray_session):
    """Force the at-scale streaming-join verification and check it equals
    the broadcast path."""
    import ray.data as rd
    t = corpus_with_dups()
    a = dedup.minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.6,
                                verify="join").to_pandas()
    b = dedup.minhash_lsh_pairs(rd.from_arrow(t), jaccard_threshold=0.6,
                                verify="broadcast").to_pandas()
    key = lambda df: sorted(map(tuple, df[["doc_a", "doc_b"]].values))
    assert key(a) == key(b)
    ja = a.sort_values(["doc_a", "doc_b"])["jaccard"].to_numpy()
    jb = b.sort_values(["doc_a", "doc_b"])["jaccard"].to_numpy()
    np.testing.assert_allclose(ja, jb)


def test_embedding_join_verify_path(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    base = rng.normal(size=(15, 16)).astype(np.float32)
    vecs = np.concatenate([base, base])
    t = pa.table({"vec_id": pa.array(np.arange(30), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    pairs = dedup.embedding_near_dup_pairs(rd.from_arrow(t), threshold=0.999,
                                           verify="join").to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert all((i, i + 15) in got for i in range(15))
    np.testing.assert_allclose(pairs["cosine"], 1.0, atol=1e-6)


def test_exact_dedup_gather_path(ray_session):
    """Force the at-scale winner-gather path (broadcast_threshold=0) and
    check it matches the broadcast semi-join path."""
    import ray.data as rd
    t = corpus_with_dups()
    out_gather = dedup.exact_dedup(rd.from_arrow(t),
                                   broadcast_threshold=0).to_pandas()
    df = t.to_pandas()
    want = df.groupby("text")["doc_id"].min()
    assert set(out_gather["doc_id"]) == set(want)
    assert sorted(out_gather.columns) == ["doc_id", "text"]


def test_connected_components_distributed_matches_union_find(ray_session):
    """Min-label propagation == driver union-find on a graph with small
    cliques AND a long path (the diameter-bound case)."""
    import pandas as pd
    import ray.data as rd
    from optimizing_ray.pipelines import dedup

    rng = np.random.default_rng(41)
    pairs = []
    # 30 random cliques over ids 0..149
    for c in range(30):
        members = rng.choice(np.arange(c * 5, c * 5 + 5), size=3, replace=False)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.append((int(members[i]), int(members[j])))
    # a 6-node path: propagation needs several rounds (diameter bound)
    for i in range(1000, 1005):
        pairs.append((i, i + 1))
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b"])
    want = dedup.connected_components(df)

    got = dedup.connected_components_distributed(
        rd.from_pandas(df).repartition(4), n_shards=8).to_pandas()
    got_map = dict(zip(got["id"], got["rep"]))
    assert len(got_map) == len(want)
    for k, v in want.items():
        assert got_map[k] == v, (k, got_map[k], v)


def test_pairs_from_buckets_plans_equivalent(ray_session):
    """The one-shuffle first-agreeing-band ownership plan (with_bh=True)
    and the two-shuffle pairs-dedup plan (with_bh=False) must emit the
    SAME candidate pair set, each pair exactly once."""
    import ray.data as rd
    from optimizing_ray.pipelines.dedup import (_banded_table,
                                                _pairs_from_buckets)

    rng = np.random.default_rng(7)
    n, bands = 400, 6
    # low-entropy bucket hashes so buckets collide a lot (incl. multi-band
    # agreement, the case the dedup plans exist for)
    hs = rng.integers(0, 13, size=(n, bands)).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)

    def run(with_bh):
        t = _banded_table(ids, hs, with_bh=with_bh)
        ds = rd.from_arrow(t).repartition(5)
        out = _pairs_from_buckets(ds, with_bh=with_bh).to_pandas()
        return sorted(zip(out["doc_a"], out["doc_b"]))

    one_shuffle, two_shuffle = run(True), run(False)
    assert len(one_shuffle) == len(set(one_shuffle))  # exactly-once
    assert len(two_shuffle) == len(set(two_shuffle))
    assert one_shuffle == two_shuffle
    # sanity: ground truth = any band agrees
    agree = (hs[:, None, :] == hs[None, :, :]).any(axis=2)
    iu, ju = np.triu_indices(n, k=1)
    want = {(int(a), int(b)) for a, b in zip(ids[iu[agree[iu, ju]]],
                                             ids[ju[agree[iu, ju]]])}
    assert set(one_shuffle) == want


def test_connected_components_distributed_raises_on_exhaustion(ray_session):
    """A path component of diameter > max_iters must raise, never return
    silently-unconverged (non-minimal) representatives."""
    import ray.data as rd

    pairs = pd.DataFrame({"doc_a": list(range(0, 30)),
                          "doc_b": list(range(1, 31))})  # path, diameter 30
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components_distributed(
            rd.from_pandas(pairs), n_shards=4, max_iters=3).to_pandas()


def test_cc_distributed_long_chain_pointer_halving(ray_session):
    """A 300-node path graph (diameter 299) converges in O(log d) rounds
    — plain min-label propagation would exhaust max_iters=64."""
    import pyarrow as pa
    import ray.data as rd

    n = 300
    pairs = pa.table({"doc_a": pa.array(np.arange(n - 1, dtype=np.int64)),
                      "doc_b": pa.array(np.arange(1, n, dtype=np.int64))})
    stats = {}
    out = (dedup.connected_components_distributed(
        rd.from_arrow(pairs).repartition(3), stats=stats)
        .to_pandas())
    assert set(out["rep"]) == {0}
    assert len(out) == n
    assert stats["rounds"] <= 14, stats  # ~log2(300) + slack, not 299


def test_plan_choice_by_nrows_hint(ray_session):
    """Round-4 (VERDICT item 8): the nrows hint is THE plan switch — a
    small known corpus takes the zero/one-shuffle broadcast plan, no hint
    assumes large and takes the sharded join plan."""
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": pa.array(["a b c d e"] * 5 + ["f g h i j"] * 5)})
    # exact_dedup: broadcast = semi-join filter, no Sort/shuffle in plan
    b = dedup.exact_dedup(rd.from_arrow(t), nrows=10)
    j = dedup.exact_dedup(rd.from_arrow(t))
    assert "semi" in repr(b) and "Sort" not in repr(b)
    assert "Sort" in repr(j)  # sharded winners exchange
    # minhash: broadcast = driver candidates + check_broadcast leg
    mb = dedup.minhash_lsh_pairs(rd.from_arrow(t), nrows=10)
    mj = dedup.minhash_lsh_pairs(rd.from_arrow(t))
    assert "check_broadcast" in repr(mb) and "Sort" not in repr(mb)
    assert "check_joined" in repr(mj)
    # both plans agree on the result
    bb = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    jj = j.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bb, jj)


def test_resolve_shards_seam(ray_session):
    """Cluster-derived shuffle width: floor 32 locally (the measured
    dispatch knee), max(floor, cluster CPUs) when Ray is up, explicit
    values pass through."""
    from optimizing_ray.config import default_shards, resolve_shards
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 0))
    assert default_shards() == max(32, cpus)
    assert resolve_shards(None) == max(32, cpus)
    assert resolve_shards(48) == 48
    assert resolve_shards(None, floor=64) == max(64, cpus)


def _brute_keep(t: pa.Table, threshold: float) -> pd.DataFrame:
    """Exhaustive exact-Jaccard graph + union-find keep list."""
    df = t.to_pandas()
    sh = {r.doc_id: shingles(r.text) for r in df.itertuples()}
    ids = sorted(sh)
    edges = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= threshold]
    rep = dedup.connected_components(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    out = pd.DataFrame({"doc_id": ids})
    out["rep_id"] = [rep.get(i, i) for i in ids]
    out["kept"] = (out["doc_id"] == out["rep_id"]).astype(np.int64)
    return out


@pytest.mark.parametrize("plan_nrows", ["hint", None])
def test_near_dedup_keep_matches_brute(ray_session, plan_nrows):
    """Both plans (broadcast via nrows hint, sharded without) produce the
    exhaustive union-find keep list: every doc one row, rep = min member,
    exactly one kept doc per cluster.  Recall certainty: the corpus's
    true pairs all have jaccard >= ~0.9 where 16x4 banding is sure."""
    import ray.data as rd
    t = corpus_with_dups()
    nrows = t.num_rows if plan_nrows == "hint" else None
    out = (dedup.near_dedup_keep(rd.from_arrow(t), jaccard_threshold=0.6,
                                 nrows=nrows)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _brute_keep(t, 0.6)
    pd.testing.assert_frame_equal(out[["doc_id", "rep_id", "kept"]], want)
    # structural: one survivor per cluster, singletons keep themselves
    assert (out.groupby("rep_id")["kept"].sum() == 1).all()


@pytest.mark.parametrize("plan_nrows", ["hint", None])
def test_cluster_reps_covers_isolated_items(ray_session, plan_nrows):
    """cluster_reps labels EVERY item: members get the component min,
    items in no pair are their own rep — identically on both plans."""
    import ray.data as rd
    items = pa.table({"doc_id": pa.array(np.arange(10, dtype=np.int64))})
    pairs = pa.table({"doc_a": pa.array([1, 2, 7], pa.int64()),
                      "doc_b": pa.array([2, 3, 8], pa.int64())})
    nrows = 10 if plan_nrows == "hint" else None
    out = (dedup.cluster_reps(rd.from_arrow(items), rd.from_arrow(pairs),
                              nrows=nrows)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}
    assert dict(zip(out["doc_id"], out["rep"])) == want


def test_fingerprint_store_incremental_dedup(ray_session, tmp_path):
    """Incremental dedup against the on-disk fingerprint store: new docs
    whose text exists in the stored corpus drop; genuinely-new docs
    survive; rebuild is idempotent; a skewed increment reads only the
    parts its prefixes name."""
    import os

    import ray.data as rd

    old_texts = [f"stored document number {i} with words {i * 13}"
                 for i in range(40)]
    old = pa.table({"doc_id": pa.array(np.arange(40, dtype=np.int64)),
                    "text": pa.array(old_texts)})
    store = str(tmp_path / "fpstore")
    info = dedup.build_fingerprint_store(rd.from_arrow(old), store)
    assert info["rows"] == 40 and info["parts"] >= 1
    info2 = dedup.build_fingerprint_store(rd.from_arrow(old), store)
    assert info2 == info  # idempotent rebuild

    # new corpus: 10 repeats of stored texts + 10 fresh docs
    new_texts = old_texts[:10] + [f"fresh crawl doc {i}" for i in range(10)]
    new = pa.table({"doc_id": pa.array(np.arange(100, 120, dtype=np.int64)),
                    "text": pa.array(new_texts)})
    stats = {}
    out = (dedup.filter_new_against_store(rd.from_arrow(new), store,
                                          stats=stats)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == list(range(110, 120))
    assert stats["parts_total"] == info["parts"]

    # pruned read: ONE new doc names at most one part
    one = pa.table({"doc_id": pa.array([999], pa.int64()),
                    "text": pa.array([old_texts[0]])})
    from optimizing_ray.pipelines.dedup import _content_hash128
    h1, _ = _content_hash128([old_texts[0]])
    part_named = int(h1.view(np.uint64)[0] >> np.uint64(58))
    assert os.path.exists(os.path.join(store, f"part={part_named:04d}.parquet"))
    out1 = dedup.filter_new_against_store(rd.from_arrow(one), store).to_pandas()
    assert len(out1) == 0  # the stored text is recognized through 1 part


def test_fingerprint_store_append_merges_increment(ray_session, tmp_path):
    """append_to_fingerprint_store folds an increment in: after the
    merge the store recognizes BOTH corpora; untouched parts are not
    rewritten."""
    import os

    import ray.data as rd

    a = pa.table({"doc_id": pa.array(np.arange(30, dtype=np.int64)),
                  "text": pa.array([f"corpus A doc {i}" for i in range(30)])})
    b = pa.table({"doc_id": pa.array(np.arange(30, 50, dtype=np.int64)),
                  "text": pa.array([f"corpus B doc {i}" for i in range(20)])})
    store = str(tmp_path / "fp2")
    dedup.build_fingerprint_store(rd.from_arrow(a), store)
    mtimes = {f: os.path.getmtime(os.path.join(store, f))
              for f in os.listdir(store)}
    info = dedup.append_to_fingerprint_store(rd.from_arrow(b), store)
    assert info["rows_added"] == 20 and info["parts_touched"] >= 1
    # untouched parts keep their mtime (never rewritten)
    from optimizing_ray.pipelines.dedup import _content_hash128
    h1, _ = _content_hash128(b["text"])
    touched = {f"part={p:04d}.parquet"
               for p in np.unique(h1.view(np.uint64) >> np.uint64(58))}
    for f, mt in mtimes.items():
        if f not in touched:
            assert os.path.getmtime(os.path.join(store, f)) == mt
    # both corpora recognized; fresh doc survives
    probe = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": pa.array([a["text"][0].as_py(),
                                        b["text"][0].as_py(),
                                        "genuinely new text"])})
    out = dedup.filter_new_against_store(rd.from_arrow(probe),
                                         store).to_pandas()
    assert list(out["doc_id"]) == [3]


def test_set_similarity_join_plans_agree_and_match_brute(ray_session):
    """Both set_similarity_join plans (broadcast prefix self-merge and
    sharded bucket exchange) return the IDENTICAL exact result, equal to
    an O(n^2) token-set brute force; the prefix filter loses nothing
    (planted exact duplicate + near-duplicate pairs must all appear)."""
    import ray.data as rd

    from optimizing_ray.functions.text import unique_token_hashes_batch
    from optimizing_ray.pipelines.dedup import set_similarity_join

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [base,                              # 0: planted dup of 1
             base,                              # 1
             base + " extra",                   # 2: J = 10/11 vs 0/1
             "totally different words here now",
             "alpha beta unrelated tail words",
             ""]                                # empty doc: set {h('')}
    t = pa.table({"doc_id": pa.array(list(range(6)), pa.int64()),
                  "text": pa.array(texts)})
    num, den = 4, 5

    flat, offs = unique_token_hashes_batch(texts)
    sets = [flat[offs[i]:offs[i + 1]] for i in range(len(texts))]
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(np.intersect1d(sets[i], sets[j]))
            union = len(sets[i]) + len(sets[j]) - inter
            if union and den * inter >= num * union:
                want.append((i, j, inter, union, inter * 10**6 // union))
    assert (0, 1) in [(a, b) for a, b, *_ in want]     # planted dup found
    assert (0, 2) in [(a, b) for a, b, *_ in want]     # near-dup found

    outs = []
    for plan in ("broadcast", "sharded"):
        out = (set_similarity_join(rd.from_arrow(t).repartition(3),
                                   theta_num=num, theta_den=den, plan=plan)
               .to_pandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])
    got = [tuple(r) for r in outs[0].itertuples(index=False)]
    assert got == sorted(want)


def test_winnow_overlap_stats_detects_planted_copy(ray_session):
    """A planted copied passage (>= k + w - 1 chars) is guaranteed to
    share winnowed fingerprints (covering property); per-doc stats match
    a brute-force recount and are invariant to block layout."""
    import ray.data as rd

    from optimizing_ray.functions.text import winnow_batch
    from optimizing_ray.pipelines.dedup import winnow_overlap_stats

    passage = ("the same long copied paragraph body that winnowing "
               "must fingerprint identically in both documents")
    texts = ["INTRO " + passage + " OUTRO-A",
             "DIFFERENT-LEAD " + passage,
             "completely unrelated filler content with other words",
             "more unrelated text that shares nothing at all herein"]
    t = pa.table({"doc_id": pa.array([10, 20, 30, 40], pa.int64()),
                  "text": pa.array(texts)})

    d, _, fp = winnow_batch(texts, 8, 4)
    sets = [set(fp[d == i].tolist()) for i in range(4)]
    want = {}
    m = 8
    for i in range(4):
        for j in range(i + 1, 4):
            s = len(sets[i] & sets[j])
            if s >= m:
                for x in (10 * (i + 1), 10 * (j + 1)):
                    n, mx = want.get(x, (0, 0))
                    want[x] = (n + 1, max(mx, s))
    assert 10 in want and 20 in want          # the planted pair survives

    for nb in (1, 3):
        got = winnow_overlap_stats(rd.from_arrow(t).repartition(nb),
                                   min_shared=m).to_pandas()
        have = {int(r.doc_id): (int(r.n_partners), int(r.max_shared))
                for r in got.itertuples()}
        assert have == want


def test_containment_join_matches_brute_and_plans_agree(ray_session):
    """Asymmetric containment join vs a python set brute: planted
    subset doc (C=1 one way, low the other), probe filter, both plans
    bit-equal, df-ordered prefix lossless."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines import dedup

    texts = [
        "alpha beta gamma delta epsilon zeta",        # 0: container
        "alpha beta gamma",                           # 1: subset of 0
        "alpha beta gamma delta",                     # 2: subset of 0
        "omega psi chi",                              # 3: disjoint
        "alpha beta gamma delta epsilon zeta",        # 4: dup of 0
        "beta gamma unknown1 unknown2 unknown3",      # 5: partial
        "",                                           # 6: empty token set
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)})).repartition(3)
    num, den = 4, 5
    got = (dedup.containment_join(docs, theta_num=num, theta_den=den,
                                  nrows=len(texts))
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    sharded = (dedup.containment_join(docs, theta_num=num, theta_den=den,
                                      plan="sharded")
               .to_pandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sharded)

    sets = [set(t.split(" ")) for t in texts]
    want = []
    for a in range(len(texts)):
        for b in range(len(texts)):
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            na = len(sets[a])
            if den * inter >= num * na and na > 0:
                want.append((a, b, inter, na, inter * 10**6 // na))
    assert list(map(tuple, got.to_numpy())) == sorted(want)
    # asymmetry: 1 -> 0 qualifies at C=1, 0 -> 1 does not
    assert (1, 0, 3, 3, 10**6) in want
    assert not any(r[0] == 0 and r[1] == 1 for r in want)

    # probe filter restricts the CONTAINED side only
    probed = (dedup.containment_join(docs, theta_num=num, theta_den=den,
                                     probe_mod=2, probe_rem=1,
                                     nrows=len(texts))
              .to_pandas())
    assert set(probed["doc_a"]) <= {1, 3, 5}
    assert list(map(tuple, probed.sort_values(["doc_a", "doc_b"])
                    .to_numpy())) == [r for r in sorted(want)
                                      if r[0] % 2 == 1]

"""Round-4 batch text kernels: the blob-vectorized paths must be
bit-identical to the per-row scalar reference semantics (which remain in
the module as the non-ASCII fallback)."""

import numpy as np
import pyarrow as pa
import pytest

from optimizing_ray.functions.text import (TextAnalyzer, fingerprint64,
                                           shingle_hashes,
                                           shingle_hashes_batch,
                                           shingle_window_hashes_batch,
                                           token_count)
from optimizing_ray.pipelines.dedup import (_minhash_salts,
                                            minhash_signatures)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    words = ["the", "and", "of", "to", "a", "le", "la", "der", "und", "cat",
             "maison", "x1", "hello,", "wor!ld", "it's", "est", "que", "un"]
    texts = []
    for i in range(400):
        t = " ".join(rng.choice(words, rng.integers(0, 30)))
        if i % 17 == 0:
            t = "  " + t + "  "          # untrimmed
        if i % 23 == 0:
            t = ""                        # empty
        if i % 29 == 0:
            t = "ab"                      # shorter than window/k
        if i % 31 == 0:
            t = "   "                     # whitespace-only
        texts.append(t)
    return texts


def test_analyze_batch_matches_scalar_ascii(corpus):
    an = TextAnalyzer()
    vec = an.analyze_batch(corpus)
    ref = an._analyze_batch_python(corpus)
    assert (np.asarray(vec["lang_pred"]) == np.asarray(ref["lang_pred"])).all()
    np.testing.assert_array_equal(vec["lang_conf"], ref["lang_conf"])
    np.testing.assert_array_equal(vec["quality"], ref["quality"])  # bit-exact
    np.testing.assert_array_equal(vec["n_tokens"], ref["n_tokens"])


def test_analyze_batch_non_ascii_falls_back():
    an = TextAnalyzer()
    texts = ["the cat and the dog", "naïve déjà vu", "Straße und Haus"]
    vec = an.analyze_batch(texts)
    ref = an._analyze_batch_python(texts)
    np.testing.assert_array_equal(vec["quality"], ref["quality"])
    np.testing.assert_array_equal(vec["n_tokens"], ref["n_tokens"])


def test_analyze_batch_accepts_arrow_with_nulls():
    an = TextAnalyzer()
    arr = pa.array(["the cat and the dog sat", None, ""], pa.string())
    vec = an.analyze_batch(arr)
    assert vec["lang_pred"][0] == "en"
    assert vec["quality"][1] == 0.0 and vec["n_tokens"][1] == 0


def test_token_count_blob_path(corpus):
    got = token_count(corpus)
    want = np.asarray([len(t.strip().split()) if t.strip() else 0
                       for t in corpus], dtype=np.int64)
    np.testing.assert_array_equal(got, want)
    assert token_count(["a b  c", "", "  ", "one"]).tolist() == [3, 0, 0, 1]


def test_fingerprint64_matches_scalar_reference(corpus):
    texts = corpus + ["naïve déjà", "h" * 7, ""]  # unicode + short + empty

    def fp_ref(ts, window=8):  # the round-1..3 per-doc implementation
        out = np.empty(len(ts), dtype=np.uint64)
        B = np.uint64(1000003)
        with np.errstate(over="ignore"):
            for i, t in enumerate(ts):
                b = t.encode("utf-8", "ignore")
                arr = np.frombuffer(b if len(b) >= window
                                    else b.ljust(window, b"\0"), dtype=np.uint8)
                n = len(arr) - window + 1
                h = np.zeros(n, dtype=np.uint64)
                for j in range(window):
                    h = h * B + arr[j:j + n].astype(np.uint64)
                out[i] = np.bitwise_xor.reduce(h)
        return out

    np.testing.assert_array_equal(fingerprint64(texts), fp_ref(texts))


def test_shingle_hashes_batch_matches_scalar(corpus):
    texts = corpus + ["naïve déjà", ""]
    flat, offs = shingle_hashes_batch(texts, 5)
    assert offs[0] == 0 and offs[-1] == len(flat)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(flat[offs[i]:offs[i + 1]],
                                      shingle_hashes(t, 5))


def test_minhash_signatures_match_per_doc_reference(corpus):
    texts = corpus + ["", "ab"]

    def old_sigs(ts, num_perm=64, k=5, seed=1):
        salts = _minhash_salts(num_perm, seed)
        sig = np.full((len(ts), num_perm), np.iinfo(np.uint64).max,
                      dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, t in enumerate(ts):
                sh = shingle_hashes(t or "", k)
                v = sh[:, None] ^ salts[None, :]
                v ^= v >> np.uint64(33)
                v *= np.uint64(0xFF51AFD7ED558CCD)
                v ^= v >> np.uint64(33)
                sig[i] = v.min(axis=0)
        return sig

    np.testing.assert_array_equal(minhash_signatures(texts), old_sigs(texts))


def test_window_hashes_min_equals_unique_min(corpus):
    # duplicate-insensitivity: min over all windows == min over the set
    flat_w, offs_w = shingle_window_hashes_batch(corpus, 5)
    flat_u, offs_u = shingle_hashes_batch(corpus, 5)
    for i in range(len(corpus)):
        a = flat_w[offs_w[i]:offs_w[i + 1]]
        b = flat_u[offs_u[i]:offs_u[i + 1]]
        assert a.min() == b.min()


# --- round-4 wave 2: word-token machinery ----------------------------------

WORD_DOCS = ["the fast key order sort table", "", "a", "a a a b", "x  y",
             "spark spark spark", "merge line " * 40 + "tail"]


def test_token_hashes_match_scalar():
    from optimizing_ray.functions.text import token_hash, token_hashes_batch
    th, doffs = token_hashes_batch(WORD_DOCS)
    flat_exp, offs_exp = [], [0]
    for d in WORD_DOCS:
        toks = d.split(" ")
        flat_exp += [token_hash(t) for t in toks]
        offs_exp.append(offs_exp[-1] + len(toks))
    assert th.tolist() == flat_exp
    assert doffs.tolist() == offs_exp


def test_token_ngram_hashes_roll_over_token_hashes():
    from optimizing_ray.functions.text import (token_hash,
                                               token_ngram_hashes_batch)
    n = 3
    hv, voffs = token_ngram_hashes_batch(WORD_DOCS, n)
    B, M = 1000003, 1 << 64
    flat_exp, offs_exp = [], [0]
    for d in WORD_DOCS:
        hs = [token_hash(t) for t in d.split(" ")]
        grams = []
        for i in range(max(len(hs) - n + 1, 0)):
            h = 0
            for x in hs[i:i + n]:
                h = (h * B + x) % M
            grams.append(h)
        flat_exp += grams
        offs_exp.append(offs_exp[-1] + len(grams))
    assert hv.tolist() == flat_exp
    assert voffs.tolist() == offs_exp


def test_repetition_profile_matches_counter_reference():
    from collections import Counter

    from optimizing_ray.functions.text import repetition_profile_batch
    p = repetition_profile_batch(WORD_DOCS)
    for i, d in enumerate(WORD_DOCS):
        ts = d.split(" ")
        bg = [tuple(ts[j:j + 2]) for j in range(len(ts) - 1)]
        c = Counter(ts)
        assert p["n_tokens"][i] == len(ts)
        assert p["n_distinct"][i] == len(set(ts))
        assert p["top_count"][i] == max(c.values())
        assert p["n_bigrams"][i] == len(bg)
        assert p["n_distinct_bigrams"][i] == len(set(bg))


def test_decontaminate_blocklist_is_benchmark_bounded(ray_session):
    """The broadcast blocklist derives from benchmark docs only: with no
    doc_id divisible by the modulus, nothing is flagged even for exact
    duplicate texts."""
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.textops import decontaminate
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b c d e f", "a b c d e f", "q r s t"])})
    out = decontaminate(rd.from_arrow(t), benchmark_mod=97, n=4).take_all()
    assert out == []
    # doc 97*2 is a benchmark doc; doc 5 repeats one of its 4-grams
    t2 = pa.table({"doc_id": pa.array([194, 5, 6], pa.int64()),
                   "text": pa.array(["a b c d e f", "z z a b c d zz", "q r s t"])})
    out2 = decontaminate(rd.from_arrow(t2), benchmark_mod=97, n=4).take_all()
    assert out2 == [{"doc_id": 5, "n_hits": 1}]


def test_pii_redact_counts_and_scrubs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.textops import pii_redact
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "mail a@b.co and c.d+x@e-f.org, call +1-555-0042, ip 10.0.0.1",
            "no pii here"])})
    out = (pii_redact(rd.from_arrow(t)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "n_emails"] == 2
    assert out.loc[0, "n_phones"] == 1
    assert out.loc[0, "n_ips"] == 1
    assert out.loc[0, "clean_text"] == \
        "mail <EMAIL> and <EMAIL>, call <PHONE>, ip <IP>"
    assert out.loc[1, ["n_emails", "n_phones", "n_ips"]].tolist() == [0, 0, 0]
    assert out.loc[1, "clean_text"] == "no pii here"


def test_token_kernels_match_scalar_on_random_unicode():
    """Property: batch kernels == scalar split/hash on arbitrary text,
    including multibyte UTF-8, control bytes, repeated/leading/trailing
    spaces (UTF-8 continuation bytes never collide with the 0x20
    separator, so byte-level splitting equals str.split(' '))."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from optimizing_ray.functions.text import (repetition_profile_batch,
                                               token_hash,
                                               token_hashes_batch)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40),
        max_size=8))
    def check(docs):
        th, doffs = token_hashes_batch(docs)
        flat_exp, offs_exp = [], [0]
        for d in docs:
            toks = d.split(" ")
            flat_exp += [token_hash(t) for t in toks]
            offs_exp.append(offs_exp[-1] + len(toks))
        assert th.tolist() == flat_exp
        assert doffs.tolist() == offs_exp
        p = repetition_profile_batch(docs)
        for i, d in enumerate(docs):
            ts = d.split(" ")
            c = Counter(ts)
            assert p["n_tokens"][i] == len(ts)
            assert p["n_distinct"][i] == len(set(ts))
            assert p["top_count"][i] == max(c.values())

    check()


def test_winnow_batch_matches_scalar_brute():
    """winnow_batch vs a pure-Python winnower over edge-heavy docs:
    all-equal hashes (rightmost tie rule), len < k (no output), len == k
    (one gram), 1 <= n < w (clipped single window), empty string."""
    from optimizing_ray.functions.text import winnow_batch

    def brute(texts, k=8, w=4):
        out = []
        for di, t in enumerate(texts):
            b = t.encode()
            n = len(b) - k + 1
            if n <= 0:
                continue
            h = []
            for i in range(n):
                x = 0
                for c in b[i:i + k]:
                    x = (x * 1000003 + c) % (1 << 64)
                h.append(x)
            seen = set()
            for i in range(max(1, n - w + 1)):
                win = range(i, min(i + w, n))
                mv = min(h[q] for q in win)
                seen.add(max(q for q in win if h[q] == mv))
            for j in sorted(seen):
                fp = h[j]
                out.append((di, j, fp - (1 << 64) if fp >= (1 << 63) else fp))
        return out

    texts = ["abcdefghijabcdefghijklm", "aaaaaaaaaaaaaa", "short",
             "abcdefgh", "abcdefghi", "abcdefghij",
             "the quick brown fox jumps over the lazy dog", ""]
    d, pos, fp = winnow_batch(texts, 8, 4)
    got = sorted(zip(d.tolist(), pos.tolist(), fp.tolist()))
    assert got == sorted(brute(texts))


def test_winnow_fingerprints_covering_property(ray_session):
    """The winnowing guarantee on the pipeline surface: two docs sharing
    a substring of length >= k + w - 1 share at least one selected
    fingerprint VALUE; results are invariant to block layout."""
    import ray.data as rd

    from optimizing_ray.pipelines.textops import winnow_fingerprints

    shared = "zqxwvutsrqponmlk"          # 16 >= 8 + 4 - 1
    texts = ["AAA " + shared + " BBBBBBBB",
             "CCCCCCCCCC " + shared + " DD",
             "totally unrelated content here"]
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(texts)})
    outs = []
    for nb in (1, 3):
        out = (winnow_fingerprints(rd.from_arrow(t).repartition(nb))
               .to_pandas().sort_values(["doc_id", "pos"])
               .reset_index(drop=True))
        outs.append(out)
    assert outs[0].equals(outs[1])
    f1 = set(outs[0][outs[0].doc_id == 1]["fp"])
    f2 = set(outs[0][outs[0].doc_id == 2]["fp"])
    f3 = set(outs[0][outs[0].doc_id == 3]["fp"])
    assert f1 & f2                       # covering property
    assert not (f1 & f3) and not (f2 & f3)


def test_typo_pairs_matches_brute(ray_session):
    """SymSpell candidates + vectorized DP verify vs a brute all-pairs
    Levenshtein: substitutions, deletions, transposition costs 2 (no
    Damerau), distance-3 excluded, non-ASCII fallback path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from optimizing_ray.pipelines.textops import typo_pairs

    texts = ["kitten sitting kiten mitten",
             "hash hsah cash dash dashes",
             "abc acb", "a ab abx", "café cafe coffee",
             "zzzz yyyy"]
    t = pa.table({"text": pa.array(texts)})
    got = typo_pairs(rd.from_arrow(t).repartition(3),
                     max_dist=2).to_pandas()

    def lev(x, y):
        pv = list(range(len(y) + 1))
        for i in range(1, len(x) + 1):
            cu = [i] + [0] * len(y)
            for j in range(1, len(y) + 1):
                cu[j] = min(pv[j] + 1, cu[j - 1] + 1,
                            pv[j - 1] + (x[i - 1] != y[j - 1]))
            pv = cu
        return pv[len(y)]

    vocab = sorted({w for s in texts for w in s.split(" ")})
    want = [(a, b, lev(a, b)) for i, a in enumerate(vocab)
            for b in vocab[i + 1:] if lev(a, b) <= 2]
    want.sort()
    assert list(got.itertuples(index=False, name=None)) == want
    d = {(a, b): c for a, b, c in want}
    assert d[("cash", "dash")] == 1          # substitution
    assert d[("kiten", "kitten")] == 1       # deletion
    assert d[("abc", "acb")] == 2            # transposition costs 2
    assert d[("cafe", "café")] == 1     # non-ASCII fallback
    assert ("kitten", "sitting") not in d    # distance 3 excluded
    assert ("yyyy", "zzzz") not in d


def test_char_entropy_matches_scalar(ray_session):
    """Hand values: constant string -> 0 nats, 'ab' -> ln 2, uniform
    4-symbol -> ln 4; empty docs dropped; brute collections.Counter
    cross-check on random ASCII."""
    import math
    from collections import Counter

    import ray.data as rd

    from optimizing_ray.pipelines.textops import char_entropy

    rng = np.random.default_rng(7)
    rand_texts = ["".join(rng.choice(list("abcdef ghij"), size=int(n)))
                  for n in rng.integers(1, 120, 20)]
    texts = ["aaaa", "ab", "abcdabcd", ""] + rand_texts
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)]).repartition(3)
    got = (char_entropy(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert 3 not in set(got["doc_id"])          # empty doc dropped

    def brute(t):
        c = Counter(t.encode())
        n = len(t)
        h = math.log(n) - sum(k * math.log(k) for k in c.values()) / n
        return len(c), int(math.floor(h * 1e6 + 0.5))

    for _, r in got.iterrows():
        nd, e6 = brute(texts[r["doc_id"]])
        assert (r["n_distinct"], r["entropy6"]) == (nd, e6)
        assert r["n_chars_e"] == len(texts[r["doc_id"]])
    assert got[got["doc_id"] == 0]["entropy6"].iloc[0] == 0
    assert got[got["doc_id"] == 1]["entropy6"].iloc[0] == int(
        math.floor(math.log(2) * 1e6 + 0.5))

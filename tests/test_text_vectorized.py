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

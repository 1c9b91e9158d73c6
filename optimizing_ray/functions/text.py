"""Text-analysis kernels for the training-data pipeline operators.

These are engine additions beyond the reference (which has no string
functions at all — SURVEY.md §2.8): language-ID by stopword/char n-gram
heuristics, quality scoring, token counting, and rolling-hash document
fingerprints.  All operate on a list/array of strings and return numpy
arrays, so the surrounding ``map_batches`` stays vectorized per batch and
compiled state (regexes, stopword sets) lives in actor ``__init__``.
"""

from __future__ import annotations

import math
import re

import numpy as np

__all__ = ["TextAnalyzer", "token_count", "fingerprint64", "shingles",
           "shingle_hashes", "jaccard_sorted"]

_WS = re.compile(r"\s+")
_TOKEN = re.compile(r"[A-Za-z0-9]+(?:'[a-z]+)?")  # BPE-ish wordpiece seed
_PUNCT = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "es", "un", "una"},
}


def token_count(texts) -> np.ndarray:
    """Whitespace token counts (vectorized-ish; regex precompiled)."""
    return np.asarray([len(_WS.split(t.strip())) if t and t.strip() else 0
                       for t in texts], dtype=np.int64)


def fingerprint64(texts, *, window: int = 8) -> np.ndarray:
    """Rolling polynomial hash fingerprint of each document: XOR of all
    `window`-gram Rabin-Karp hashes — order-sensitive, locality-free."""
    out = np.empty(len(texts), dtype=np.uint64)
    B = np.uint64(1000003)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            b = t.encode("utf-8", "ignore")
            if len(b) < window:
                arr = np.frombuffer(b.ljust(window, b"\0"), dtype=np.uint8)
            else:
                arr = np.frombuffer(b, dtype=np.uint8)
            n = len(arr) - window + 1
            h = np.zeros(n, dtype=np.uint64)
            for j in range(window):  # window is small; the array op is the vector axis
                h = h * B + arr[j:j + n].astype(np.uint64)
            out[i] = np.bitwise_xor.reduce(h)
    return out


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted-unique character k-shingle hashes of one document (uint64).

    The sorted-array representation keeps MinHash (min over the set is
    order-independent) and Jaccard (``jaccard_sorted``: C-speed
    intersect1d) fully vectorized — a Python ``set`` of the same values
    measures ~3x slower to build and intersect."""
    b = text.encode("utf-8", "ignore")
    if len(b) < k:
        # deterministic (NOT Python hash(): bytes hashing is per-process
        # randomized): same rolling hash over the NUL-padded text
        b = b.ljust(k, b"\0")
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * np.uint64(1000003) + arr[j:j + n].astype(np.uint64)
    return np.unique(h)


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique hash arrays (shingle_hashes)."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def jaccard_pairs_grouped(ids_a: np.ndarray, ids_b: np.ndarray,
                          sh) -> np.ndarray:
    """Exact Jaccard for a BATCH of candidate pairs, vectorized by
    grouping on ``ids_a``: on LSH-candidate batches a doc appears in many
    pairs (~75x at sf0.1), so per-pair ``intersect1d`` calls are Python-
    overhead-bound (~53 us/pair measured).  Instead, for each unique
    doc_a, concatenate the shingle arrays of ALL its partners and run ONE
    ``searchsorted`` against doc_a's sorted-unique array, segmenting the
    match counts back per pair with a cumsum — the Python loop shrinks
    from pairs to distinct left docs.

    ``sh(id) -> np.ndarray`` returns the doc's sorted-unique shingle
    hashes (callers memoize per batch).  Returns float64 jaccard per
    pair, aligned with the input order."""
    n = len(ids_a)
    ja = np.empty(n, dtype=np.float64)
    if n == 0:
        return ja
    order = np.argsort(ids_a, kind="stable")
    sa = ids_a[order]
    sb = ids_b[order]
    run_starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
    run_ends = np.r_[run_starts[1:], n]
    out = np.empty(n, dtype=np.float64)
    for s, e in zip(run_starts, run_ends):
        A = sh(sa[s])
        bs = [sh(x) for x in sb[s:e]]
        lens = np.fromiter((len(x) for x in bs), dtype=np.int64, count=e - s)
        if len(A) == 0 or not lens.any():
            inter = np.zeros(e - s, dtype=np.int64)
        else:
            X = np.concatenate(bs)
            pos = np.searchsorted(A, X)
            pos[pos == len(A)] = len(A) - 1
            match = A[pos] == X
            cs = np.r_[0, np.cumsum(match)]
            ends = np.cumsum(lens)
            inter = cs[ends] - cs[ends - lens]
        union = len(A) + lens - inter
        out[s:e] = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    ja[order] = out
    return ja


def shingles(text: str, k: int = 5) -> set[int]:
    """Character k-shingle hash set of one document (same values as
    ``shingle_hashes``, as a Python set — test/oracle convenience)."""
    return set(shingle_hashes(text, k).tolist())


class TextAnalyzer:
    """Stateful per-actor text scorer (compiled once per actor — T1/T3
    pattern).  Produces lang-ID, quality score, token counts."""

    def __init__(self):
        self.token = _TOKEN
        self.punct = _PUNCT
        self.ws = _WS
        self.stops = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def lang_id(self, text: str) -> tuple[str, float]:
        toks = [t.lower() for t in self.ws.split(text.strip()) if t]
        if not toks:
            return "und", 0.0
        best, best_hits = "und", 0
        for lang, stops in self.stops.items():
            hits = sum(1 for t in toks if t in stops)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best, best_hits / len(toks)

    def quality(self, text: str) -> float:
        """Length / punctuation / stopword-ratio composite in [0, 1]."""
        if not text:
            return 0.0
        n = len(text)
        toks = self.ws.split(text.strip())
        n_tok = max(1, len(toks))
        mean_tok = n / n_tok
        punct_ratio = len(self.punct.findall(text)) / n
        _, stop_ratio = self.lang_id(text)
        len_score = min(1.0, n / 500.0)
        tok_score = max(0.0, 1.0 - abs(mean_tok - 6.0) / 10.0)
        punct_score = max(0.0, 1.0 - 4.0 * punct_ratio)
        stop_score = min(1.0, 4.0 * stop_ratio)
        q = 0.25 * (len_score + tok_score + punct_score + stop_score)
        # explicit floor(x*1e6 + 0.5) rounding: Python round() is
        # half-even, DuckDB round() is half-away — components are nice
        # decimals so exact halfway values DO occur; one shared machine
        # formula keeps the SQL oracle bit-identical
        return math.floor(q * 1e6 + 0.5) / 1e6

    def analyze_batch(self, texts) -> dict[str, np.ndarray]:
        langs, confs, quals = [], [], []
        for t in texts:
            lang, conf = self.lang_id(t or "")
            langs.append(lang)
            confs.append(conf)
            quals.append(self.quality(t or ""))
        return {
            "lang_pred": np.asarray(langs),
            "lang_conf": np.asarray(confs),
            "quality": np.asarray(quals),
            "n_tokens": token_count(texts),
        }

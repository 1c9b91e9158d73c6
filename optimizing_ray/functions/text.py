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
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["TextAnalyzer", "token_count", "fingerprint64", "shingles",
           "shingle_hashes", "shingle_hashes_batch",
           "shingle_window_hashes_batch", "jaccard_sorted",
           "token_hash", "token_hashes_batch", "token_ngram_hashes_batch",
           "repetition_profile_batch"]

# ---------------------------------------------------------------------------
# Batch blob machinery (round-4): every corpus-wide kernel below operates on
# ONE concatenated UTF-8 byte blob + per-doc offsets — zero-copy straight out
# of the Arrow string column — so the per-doc Python loop disappears from the
# hot paths (fingerprints, shingling, text analysis).  The per-doc scalar
# functions remain as the reference semantics and the non-ASCII fallback.
# ---------------------------------------------------------------------------


def _as_string_array(texts) -> pa.Array:
    """Normalize any text input (list of str/None, pa.Array, ChunkedArray)
    to one non-null pyarrow string array."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array([("" if t is None else t) for t in texts],
                         pa.string())
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    return texts


def _utf8_blob(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8, offsets int64) view of a string array's UTF-8 bytes —
    zero-copy except for slice normalization and the int64 offset cast."""
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=odt,
                         count=len(arr) + 1 + arr.offset)[arr.offset:]
    offs = offs.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(offs[-1]))
    if offs[0]:
        data = data[offs[0]:]
        offs = offs - offs[0]
    return data, offs


def _padded_blob(arr: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Blob + offsets with every doc NUL-padded to >= k bytes (the scalar
    kernels' short-doc branch), so every rolling-hash segment is
    non-empty.  Fast path is the zero-copy blob when no doc is short."""
    data, offs = _utf8_blob(arr)
    lens = np.diff(offs)
    if len(lens) == 0 or int(lens.min()) >= k:
        return data, offs
    new_lens = np.maximum(lens, k)
    new_offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(new_lens, out=new_offs[1:])
    out = np.zeros(int(new_offs[-1]), dtype=np.uint8)
    # scatter all original bytes to their padded positions in one pass
    src_total = int(offs[-1])
    if src_total:
        dst = (np.arange(src_total, dtype=np.int64)
               + np.repeat(new_offs[:-1] - offs[:-1], lens))
        out[dst] = data[:src_total]
    return out, new_offs


_ROLL_B = np.uint64(1000003)


def _rolling_hash(data: np.ndarray, k: int) -> np.ndarray:
    """All k-gram Rabin-Karp hashes of the blob (positions 0..len-k),
    base 1000003 mod 2^64 — the scalar ``shingle_hashes``/``fingerprint64``
    recurrence, k vector passes over the blob.

    Returns a SCRATCH view (optimizing_ray.scratch): valid until the
    next _rolling_hash call in this process — every caller gathers or
    reduces it immediately.  Fresh h/d buffers here paid the fault wall
    per call (measured 0.93 s for 12 MB during an episode, 9 ms warm)."""
    n = len(data) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    from optimizing_ray import scratch
    h = scratch.get("text._rolling_hash.h", n)
    h[:] = 0
    d = scratch.get("text._rolling_hash.d", len(data))
    np.copyto(d, data, casting="unsafe")
    with np.errstate(over="ignore"):
        for j in range(k):
            h *= _ROLL_B
            h += d[j:j + n]
    return h


def _valid_windows(offs: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat indices of in-doc window starts, per-doc valid-window offsets)
    for a padded blob (every doc >= k bytes, so every segment >= 1)."""
    lens = np.diff(offs)
    n_i = lens - k + 1
    voffs = np.zeros(len(n_i) + 1, dtype=np.int64)
    np.cumsum(n_i, out=voffs[1:])
    idx = (np.arange(int(voffs[-1]), dtype=np.int64)
           + np.repeat(offs[:-1] - voffs[:-1], n_i))
    return idx, voffs

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


# Python re's \s over str matches these ASCII bytes (incl. \x1c-\x1f file
# separators, which are NOT Unicode White_Space — the scalar reference
# semantics the byte tables reproduce exactly for ASCII input)
_PY_SPACE_BYTES = (9, 10, 11, 12, 13, 28, 29, 30, 31, 32)
_SPACE_TABLE = np.zeros(256, dtype=bool)
_SPACE_TABLE[list(_PY_SPACE_BYTES)] = True
_WORD_TABLE = np.zeros(256, dtype=bool)
_WORD_TABLE[[ord(c) for c in
             "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"]] = True
# bytes where the vectorized ASCII classifier would diverge from Python
# re semantics via pyarrow's Unicode tokenizer: non-ASCII lead bytes and
# the \x1c-\x1f separators (Python-\s yes, Unicode-WS no)
_ASCII_DIVERGENT = np.zeros(256, dtype=bool)
_ASCII_DIVERGENT[128:] = True
_ASCII_DIVERGENT[[28, 29, 30, 31]] = True


def _token_run_counts(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Per-doc count of maximal non-whitespace byte runs (== Python
    ``len(re.split(r'\\s+', t.strip()))`` for non-blank ASCII t, 0 for
    blank) — one pass over the blob."""
    n_docs = len(offs) - 1
    if len(data) == 0:
        return np.zeros(n_docs, dtype=np.int64)
    sp = _SPACE_TABLE[data]
    prev_sp = np.empty(len(data), dtype=bool)
    prev_sp[0] = True
    prev_sp[1:] = sp[:-1]
    ds = offs[:-1]
    prev_sp[ds[ds < len(data)]] = True  # doc starts (trailing empties excl.)
    starts = ~sp & prev_sp
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(starts, out=cs[1:])
    return cs[offs[1:]] - cs[offs[:-1]]


def token_count(texts) -> np.ndarray:
    """Whitespace token counts — vectorized over the batch blob (ASCII
    fast path; per-row regex fallback on divergent bytes)."""
    arr = _as_string_array(texts)
    data, offs = _utf8_blob(arr)
    if len(data) and _ASCII_DIVERGENT[data].any():
        return np.asarray([len(_WS.split(t.strip())) if t and t.strip() else 0
                           for t in arr.to_pylist()], dtype=np.int64)
    return _token_run_counts(data, offs)


def fingerprint64(texts, *, window: int = 8) -> np.ndarray:
    """Rolling polynomial hash fingerprint of each document: XOR of all
    `window`-gram Rabin-Karp hashes — order-sensitive, locality-free.
    Vectorized over the batch blob: ONE rolling-hash pass + per-doc XOR
    segments (round-4; was a per-doc Python loop)."""
    arr = _as_string_array(texts)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    data, offs = _padded_blob(arr, window)
    h = _rolling_hash(data, window)
    idx, voffs = _valid_windows(offs, window)
    return np.bitwise_xor.reduceat(h[idx], voffs[:-1])


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


def shingle_hashes_batch(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Batch twin of ``shingle_hashes``: (flat uint64, offsets int64) where
    ``flat[offs[i]:offs[i+1]]`` is doc i's SORTED-UNIQUE k-shingle hashes
    (bit-identical to the scalar function).  One rolling-hash pass over
    the concatenated blob + one segment-keyed lexsort — the per-doc
    Python loop that dominated the minhash signature stage (~44 us/doc
    measured round 2) collapses to C passes (round-4, VERDICT item 3)."""
    hv, voffs = shingle_window_hashes_batch(texts, k)
    n_docs = len(voffs) - 1
    if len(hv) == 0:
        return hv, voffs
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(voffs))
    try:  # polars hash-unique + multithreaded sort: ~5x a numpy lexsort
        import polars as pl
        df = pl.DataFrame({"s": seg, "h": hv}).unique().sort(["s", "h"])
        hs = df["h"].to_numpy()
        segs = df["s"].to_numpy()
        # every doc has >= 1 window (padding), so all segments present
        uoffs = np.searchsorted(segs, np.arange(n_docs + 1, dtype=np.int64))
        return hs, uoffs
    except ImportError:
        order = np.lexsort((hv, seg))
        hs = hv[order]
        # seg blocks are contiguous and in order, so segment boundaries in
        # the sorted view are still voffs; unique-within-segment mask:
        mask = np.empty(len(hs), dtype=bool)
        mask[0] = True
        np.not_equal(hs[1:], hs[:-1], out=mask[1:])
        mask[voffs[:-1]] = True  # first window of every doc
        cs = np.zeros(len(hs) + 1, dtype=np.int64)
        np.cumsum(mask, out=cs[1:])
        return hs[mask], cs[voffs]


def shingle_window_hashes_batch(texts, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """All k-gram window hashes per doc WITHOUT the sorted-unique step:
    (flat uint64, offsets int64).  Sufficient (and cheaper) wherever the
    consumer is duplicate-insensitive — MinHash's per-salt min over the
    multiset equals the min over the set."""
    arr = _as_string_array(texts)
    n_docs = len(arr)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    data, offs = _padded_blob(arr, k)
    h = _rolling_hash(data, k)
    idx, voffs = _valid_windows(offs, k)
    return h[idx], voffs


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


# ---------------------------------------------------------------------------
# Word-token machinery (round-4 wave 2): decontamination, repetition
# signals.  Tokenization is an EXACT single-space split (DuckDB
# ``string_split(text, ' ')`` semantics: empties kept, '' -> ['']), NOT the
# whitespace regex of TextAnalyzer — the oracle joins on token/n-gram
# STRINGS, so both sides must agree byte-for-byte on token boundaries and
# the regex-\s dialect differences (see _PY_SPACE_BYTES above) stay out of
# the contract.  Engine-side tokens travel as 64-bit polynomial hashes
# (same base as the shingle machinery); equal strings hash equal, distinct
# strings collide with ~2^-64 probability — the same by-design
# approximation as the LSH family, verified exact by the driver gate.
# ---------------------------------------------------------------------------


def token_hash(token: str) -> int:
    """Scalar reference: polynomial (base 1000003, mod 2^64) hash of one
    token's UTF-8 bytes — the per-token twin of the rolling-hash
    recurrence.  '' hashes to 0."""
    h = 0
    for b in token.encode("utf-8"):
        h = (h * int(_ROLL_B) + b) & 0xFFFFFFFFFFFFFFFF
    return h


def _segment_hashes(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Polynomial hash of every [offs[i], offs[i+1]) byte segment of one
    blob, vectorized: byte-position passes over a shrinking alive set
    (tokens are short, so ~max_token_len passes).  Empty segments -> 0."""
    lens = np.diff(offs)
    n = len(lens)
    h = np.zeros(n, dtype=np.uint64)  # escapes — not scratch
    if n == 0 or len(data) == 0:
        return h
    from optimizing_ray import scratch
    d = scratch.get("text._segment_hashes.d", len(data))
    np.copyto(d, data, casting="unsafe")
    starts = offs[:-1].astype(np.int64)
    alive = np.flatnonzero(lens > 0)
    j = 0
    with np.errstate(over="ignore"):
        while len(alive):
            h[alive] = h[alive] * _ROLL_B + d[starts[alive] + j]
            j += 1
            alive = alive[lens[alive] > j]
    return h


def token_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 token hashes, int64 per-doc offsets) for the
    single-space tokenization of every doc.  The split itself is
    arrow-native (``pc.split_pattern``); hashing is one blob pass."""
    arr = _as_string_array(texts)
    n_docs = len(arr)
    if n_docs == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    lists = pc.split_pattern(arr, " ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    counts = pc.list_value_length(lists).to_numpy().astype(np.int64)
    doffs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=doffs[1:])
    toks = pc.list_flatten(lists)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    data, offs = _utf8_blob(toks)
    return _segment_hashes(data, offs), doffs


def token_ngram_hashes_batch(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 word-n-gram hashes, int64 per-doc offsets): rolling
    polynomial over token-hash SYMBOLS (not bytes), windows clipped to doc
    boundaries.  Docs with fewer than n tokens contribute zero windows.
    Hash-equal to ``token_hash`` composition on the joined n-gram, i.e.
    two n-grams collide iff their token sequences collide."""
    th, doffs = token_hashes_batch(texts)
    return _doc_windows(th, doffs, n)


def repetition_profile_batch(texts) -> dict[str, np.ndarray]:
    """Gopher-style repetition signals per doc, all int64 and vectorized
    over the batch: n_tokens, n_distinct (distinct tokens), top_count
    (occurrences of the most frequent token), n_bigrams (n_tokens - 1,
    floored at 0), n_distinct_bigrams.  Token identity = 64-bit hash
    (collision caveat in the module note above)."""
    th, doffs = token_hashes_batch(texts)
    counts = np.diff(doffs)
    n_docs = len(counts)
    if n_docs == 0:
        z = np.empty(0, dtype=np.int64)
        return {"n_tokens": z, "n_distinct": z, "top_count": z,
                "n_bigrams": z, "n_distinct_bigrams": z}
    # every doc has >= 1 token (split of '' is ['']), so doffs boundaries
    # are valid run starts
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    order = np.lexsort((th, seg))
    hs = th[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    np.not_equal(hs[1:], hs[:-1], out=new[1:])
    new[doffs[:-1]] = True
    n_distinct = np.bincount(seg[order][new], minlength=n_docs)
    run_starts = np.flatnonzero(new)
    run_lens = np.diff(np.append(run_starts, len(hs)))
    run_doc = seg[order][run_starts]
    first_run = np.searchsorted(run_doc, np.arange(n_docs, dtype=np.int64))
    top_count = np.maximum.reduceat(run_lens, first_run)
    bh, boffs = _doc_windows(th, doffs, 2)
    n_bigrams = np.diff(boffs)
    if len(bh):
        bseg = np.repeat(np.arange(n_docs, dtype=np.int64), n_bigrams)
        border = np.lexsort((bh, bseg))
        bhs = bh[border]
        bnew = np.empty(len(bhs), dtype=bool)
        bnew[0] = True
        np.not_equal(bhs[1:], bhs[:-1], out=bnew[1:])
        bnew[boffs[:-1][n_bigrams > 0]] = True
        n_db = np.bincount(bseg[border][bnew], minlength=n_docs)
    else:
        n_db = np.zeros(n_docs, dtype=np.int64)
    return {"n_tokens": counts.astype(np.int64),
            "n_distinct": n_distinct.astype(np.int64),
            "top_count": top_count.astype(np.int64),
            "n_bigrams": n_bigrams.astype(np.int64),
            "n_distinct_bigrams": n_db.astype(np.int64)}


def _doc_windows(sym: np.ndarray, doffs: np.ndarray,
                 n: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling n-window polynomial hashes over a flat symbol array,
    clipped to per-doc segments (the shared tail of
    ``token_ngram_hashes_batch``)."""
    counts = np.diff(doffs)
    n_i = np.maximum(counts - n + 1, 0)
    voffs = np.zeros(len(n_i) + 1, dtype=np.int64)
    np.cumsum(n_i, out=voffs[1:])
    total = int(voffs[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), voffs
    idx = (np.arange(total, dtype=np.int64)
           + np.repeat(doffs[:-1] - voffs[:-1], n_i))
    return _rolling_hash(sym, n)[idx], voffs


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
        """Vectorized batch scorer (round-4, VERDICT item 2): arrow-native
        tokenize + hashed stopword membership + byte-table punctuation
        counts over the batch blob — zero Python per row on the ASCII
        fast path (the corpus); per-row scalar fallback on divergent
        bytes keeps the reference semantics exact everywhere.  Float
        expressions mirror the scalar operation ORDER so doubles are
        bit-identical (the SQL-oracle contract)."""
        arr = _as_string_array(texts)
        n_docs = len(arr)
        data, offs = _utf8_blob(arr)
        if len(data) and _ASCII_DIVERGENT[data].any():
            return self._analyze_batch_python(arr.to_pylist())
        n = np.diff(offs).astype(np.float64)          # chars == bytes (ASCII)
        n_toks = _token_run_counts(data, offs)        # lang_id/quality denom
        if len(data):
            punct = ~_SPACE_TABLE[data] & ~_WORD_TABLE[data]
            cs = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(punct, out=cs[1:])
            n_punct = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.float64)
        else:
            n_punct = np.zeros(n_docs, dtype=np.float64)
        # stopword hits per language: one flatten + one is_in per language
        toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(arr))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.utf8_lower(pc.list_flatten(toks))
        loffs = np.asarray(toks.offsets, dtype=np.int64)
        lang_names = list(self.stops)
        hits = np.zeros((n_docs, len(lang_names)), dtype=np.int64)
        if len(flat):
            csb = np.zeros(len(flat) + 1, dtype=np.int64)
            for li, lang in enumerate(lang_names):
                m = pc.is_in(flat, value_set=pa.array(sorted(self.stops[lang])))
                np.cumsum(m.to_numpy(zero_copy_only=False), out=csb[1:])
                hits[:, li] = csb[loffs[1:]] - csb[loffs[:-1]]
        mh = hits.max(axis=1)
        lang_pred = np.where(mh == 0, "und",
                             np.asarray(lang_names)[hits.argmax(axis=1)])
        lang_conf = np.divide(mh, n_toks, out=np.zeros(n_docs),
                              where=n_toks > 0)
        # quality composite — same expression order as the scalar path
        n_tok_q = np.maximum(n_toks, 1).astype(np.float64)
        n_safe = np.maximum(n, 1.0)
        len_score = np.minimum(1.0, n / 500.0)
        tok_score = np.maximum(0.0, 1.0 - np.abs(n / n_tok_q - 6.0) / 10.0)
        punct_score = np.maximum(0.0, 1.0 - 4.0 * (n_punct / n_safe))
        stop_score = np.minimum(1.0, 4.0 * lang_conf)
        q = 0.25 * (len_score + tok_score + punct_score + stop_score)
        q = np.floor(q * 1e6 + 0.5) / 1e6
        q[n == 0] = 0.0
        return {
            "lang_pred": lang_pred,
            "lang_conf": lang_conf,
            "quality": q,
            "n_tokens": n_toks,
        }

    def _analyze_batch_python(self, texts) -> dict[str, np.ndarray]:
        """Per-row reference path (non-ASCII / control-byte fallback)."""
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


def winnow_batch(texts, k: int = 8, w: int = 4
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS scheme): over each doc's k-gram Rabin-Karp hashes (base 1000003
    mod 2^64 — the ``fingerprint64`` recurrence), every window of ``w``
    consecutive k-grams selects its RIGHTMOST minimal hash; the selected
    set is deduplicated (adjacent windows usually agree).  Docs shorter
    than ``k`` bytes yield nothing; docs with 1 <= n < w k-grams form
    ONE clipped window (the whole doc).

    Returns (doc_idx int64, pos int64 0-based k-gram byte offset,
    fp int64 — the uint64 hash's signed bit pattern).  Guarantee: any
    substring match of length >= k + w - 1 shares at least one selected
    fingerprint (the winnowing covering property).

    Fully vectorized across the batch: one blob rolling hash, one
    reversed-blob sliding-window argmin for the full windows (first-min
    over the reversed view IS the rightmost-min forward), one lexsort
    for the clipped docs — no per-doc Python.
    """
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64),
             np.zeros(0, np.int64))
    arr = _as_string_array(texts)
    if len(arr) == 0:
        return empty
    data, offs = _utf8_blob(arr)
    lens = np.diff(offs)
    n_i = np.maximum(lens - k + 1, 0)
    voffs = np.zeros(len(n_i) + 1, np.int64)
    np.cumsum(n_i, out=voffs[1:])
    V = int(voffs[-1])
    if V == 0:
        return empty
    idx = (np.arange(V, dtype=np.int64)
           + np.repeat(offs[:-1] - voffs[:-1], n_i))
    vh = _rolling_hash(data, k)[idx]  # gather immediately (scratch view)
    doc_of = np.repeat(np.arange(len(n_i), dtype=np.int64), n_i)

    picks = []
    if V >= w:
        # full windows: argmin over the REVERSED flat array — its
        # first-min is the forward rightmost-min; cross-doc windows
        # are dropped by the same-doc mask.
        rev = vh[::-1]
        a = np.lib.stride_tricks.sliding_window_view(rev, w).argmin(axis=1)
        s = np.arange(V - w + 1, dtype=np.int64)
        f = V - w - s                       # forward window starts
        sel = f + w - 1 - a                 # rightmost-min flat position
        valid = doc_of[f] == doc_of[f + w - 1]
        picks.append(sel[valid])
    cmask = n_i[doc_of] < w                 # clipped docs: one window each
    if cmask.any():
        p = np.flatnonzero(cmask)
        d, v = doc_of[p], vh[p]
        order = np.lexsort((-p, v, d))      # per doc: min value, max pos
        _, first = np.unique(d[order], return_index=True)
        picks.append(p[order[first]])
    sel = np.unique(np.concatenate(picks)) if picks else np.zeros(0, np.int64)
    d = doc_of[sel]
    return d, sel - voffs[d], vh[sel].view(np.int64)


def unique_token_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 SORTED-UNIQUE token hashes per doc, int64 per-doc
    offsets) for the single-space tokenization — the SET view that
    set-similarity joins compare.  One lexsort across the batch (token
    axis AND doc axis vectorized); consecutive-duplicate mask gives the
    per-doc unique sets already sorted for searchsorted kernels."""
    th, doffs = token_hashes_batch(texts)
    n_docs = len(doffs) - 1
    if len(th) == 0:
        return th, doffs.copy()
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(doffs))
    order = np.lexsort((th, doc))
    d, h = doc[order], th[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
    d, h = d[keep], h[keep]
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(np.bincount(d, minlength=n_docs).astype(np.int64),
              out=offs[1:])
    return h, offs


def inter_pairs_grouped(ids_a: np.ndarray, ids_b: np.ndarray,
                        sh) -> np.ndarray:
    """Exact INTERSECTION SIZE for a batch of candidate pairs — the
    integer sibling of ``jaccard_pairs_grouped`` (same per-left-doc
    grouped searchsorted; returns int64 counts so threshold gates can be
    division-free cross-multiplies).  ``sh(id)`` -> sorted-unique uint64
    hashes (callers memoize)."""
    n = len(ids_a)
    out_al = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out_al
    order = np.argsort(ids_a, kind="stable")
    sa, sb = ids_a[order], ids_b[order]
    run_starts = np.flatnonzero(np.r_[True, sa[1:] != sa[:-1]])
    run_ends = np.r_[run_starts[1:], n]
    out = np.empty(n, dtype=np.int64)
    for s, e in zip(run_starts, run_ends):
        A = sh(sa[s])
        bs = [sh(x) for x in sb[s:e]]
        lens = np.fromiter((len(x) for x in bs), dtype=np.int64, count=e - s)
        if len(A) == 0 or not lens.any():
            out[s:e] = 0
            continue
        X = np.concatenate(bs)
        pos = np.searchsorted(A, X)
        pos[pos == len(A)] = len(A) - 1
        match = A[pos] == X
        cs = np.r_[0, np.cumsum(match)]
        ends = np.cumsum(lens)
        out[s:e] = cs[ends] - cs[ends - lens]
    out_al[order] = out
    return out_al

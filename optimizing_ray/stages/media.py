"""Multimodal (image/audio) stages — real stdlib codecs over an
actor-pool ``map_batches`` seam.

Media lives in the corpus as opaque references inside ``spans`` (kind in
{image, audio}).  The stage architecture for 100 TB:

* the storage GET is a pluggable ``fetch(ref, kind) -> bytes`` callable
  (default: the deterministic fixture store in ``codecs.py`` — the
  sandbox has no object store; a real deployment swaps exactly this one
  function for its store client);
* decode is REAL: PNG via stdlib ``zlib`` + full filter reconstruction,
  WAV via stdlib ``wave`` — dispatched on magic bytes, not metadata;
* exotic formats (non-PNG/WAV bytes, non-RGB PNG) raise
  ``NotImplementedError`` from the codec — the only remaining seam;
* features are INTEGER accumulations per doc (pixel channel sums,
  min/max, sample energy, zero crossings) finished by one deterministic
  division + floor-round(1e-6), so the whole stage is SQL-oracled
  (``oracle.media_features_sql``) despite the bytes roundtrip.

Batch sizes default small (256) because decoded media rows are wide —
the memory rule of thumb is batch_size x concurrency x decoded_size per
node (SURVEY.md §4 memory row).  Reference analogue: the image/texture
path ``Raytracing.hpp:671-689``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from optimizing_ray.stages import codecs
from optimizing_ray.stages.codecs import (IMG_H, IMG_W, N_SAMPLES, _PNG_MAGIC,
                                          decode_png, decode_wav,
                                          fetch_fixture)

__all__ = ["MediaFeaturizer", "extract_media_features", "sample_frames",
           "N_FEATURES", "ImageResizer", "resize_images",
           "audio_resample", "N_RESAMPLE", "media_dup_groups"]

N_FEATURES = 8

_SCALAR_COLS: list[tuple[str, pa.DataType]] = [
    ("n_media_spans", pa.int64()), ("n_img", pa.int64()),
    ("n_aud", pa.int64()),
    ("img_mean_r", pa.float64()), ("img_mean_g", pa.float64()),
    ("img_mean_b", pa.float64()),
    ("img_min", pa.int64()), ("img_max", pa.int64()),
    ("aud_mean", pa.float64()), ("aud_rms", pa.float64()),
    ("aud_crossings", pa.int64()),
]


def _round6(a: np.ndarray) -> np.ndarray:
    """Shared engine<->SQL rounding (floor half-up at 1e-6)."""
    return np.floor(a * 1e6 + 0.5) / 1e6


def _empty_append(batch: pa.Table) -> pa.Table:
    for name, typ in _SCALAR_COLS:
        batch = batch.append_column(name, pa.array([], typ))
    return batch.append_column(
        "media_features", pa.array([], pa.list_(pa.float32(), N_FEATURES)))


def _featurize_batch(batch: pa.Table, fetch) -> pa.Table:
    """fetch + decode + featurize the media spans of each document.

    Input rows carry ``spans``; output appends the scalar stat columns in
    ``_SCALAR_COLS`` plus ``media_features: fixed_size_list<float32>[8]``
    (a compact summary vector; zeros when the doc has no media spans)."""
    import pyarrow.compute as pc
    if batch.num_rows == 0 or "spans" not in batch.column_names:
        return _empty_append(batch)
    spans = batch["spans"]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    # vectorized span scan: flatten once, never per-row as_py() —
    # only the per-REF fetch+decode (inherently per-object) loops
    flat = spans.flatten()
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
    is_media = (kind != "text") & (ref != "")
    offs = np.asarray(spans.offsets, dtype=np.int64)
    n_spans = np.diff(offs)
    n = len(batch)
    row_of_span = np.repeat(np.arange(n), n_spans)
    counts = np.zeros(n, dtype=np.int64)
    np.add.at(counts, row_of_span, is_media)

    n_img = np.zeros(n, dtype=np.int64)
    n_aud = np.zeros(n, dtype=np.int64)
    sum_rgb = np.zeros((n, 3), dtype=np.int64)
    img_min = np.full(n, 255, dtype=np.int64)
    img_max = np.zeros(n, dtype=np.int64)
    sum_x = np.zeros(n, dtype=np.int64)
    sum_x2 = np.zeros(n, dtype=np.int64)
    crossings = np.zeros(n, dtype=np.int64)

    m_rows = row_of_span[is_media]
    m_refs = ref[is_media]
    m_kinds = kind[is_media]
    for j in range(len(m_refs)):
        row = int(m_rows[j])
        data = fetch(m_refs[j], m_kinds[j])
        if data[:8] == _PNG_MAGIC:
            px = decode_png(data).astype(np.int64)
            n_img[row] += 1
            sum_rgb[row] += px.reshape(-1, 3).sum(axis=0)
            img_min[row] = min(img_min[row], int(px.min()))
            img_max[row] = max(img_max[row], int(px.max()))
        elif data[:4] == b"RIFF":
            x = decode_wav(data).astype(np.int64)
            n_aud[row] += 1
            sum_x[row] += int(x.sum())
            sum_x2[row] += int((x * x).sum())
            crossings[row] += int((x[:-1] * x[1:] < 0).sum())
        else:
            raise NotImplementedError(
                f"unrecognized media container for {m_refs[j]!r} "
                "(PNG and WAV supported)")

    img_px = np.maximum(n_img, 1) * float(IMG_W * IMG_H)
    aud_n = np.maximum(n_aud, 1) * float(N_SAMPLES)
    has_i, has_a = n_img > 0, n_aud > 0
    mean_rgb = _round6(sum_rgb / img_px[:, None]) * has_i[:, None]
    aud_mean = _round6(sum_x / aud_n) * has_a
    aud_rms = _round6(np.sqrt(sum_x2 / aud_n)) * has_a
    img_min = np.where(has_i, img_min, 0)

    vals = {
        "n_media_spans": counts, "n_img": n_img, "n_aud": n_aud,
        "img_mean_r": mean_rgb[:, 0], "img_mean_g": mean_rgb[:, 1],
        "img_mean_b": mean_rgb[:, 2],
        "img_min": img_min, "img_max": img_max,
        "aud_mean": aud_mean, "aud_rms": aud_rms,
        "aud_crossings": crossings,
    }
    for name, typ in _SCALAR_COLS:
        batch = batch.append_column(name, pa.array(vals[name], typ))
    feats = np.stack([
        n_img.astype(np.float64), n_aud.astype(np.float64),
        mean_rgb[:, 0], mean_rgb[:, 1], mean_rgb[:, 2],
        aud_mean, aud_rms, crossings.astype(np.float64),
    ], axis=1).astype(np.float32)
    return batch.append_column(
        "media_features",
        pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()),
                                          N_FEATURES))


class MediaFeaturizer:
    """Actor seam for a REAL store client: construction cost (client
    connect, codec tables) is per-actor — pass this class to
    ``map_batches`` as a callable CLASS with ``concurrency=N``.  The
    default fixture store has no such state, so
    ``extract_media_features`` only routes through this pool when a
    custom ``fetch`` is supplied."""

    def __init__(self, fetch=None):
        self.fetch = fetch or fetch_fixture

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _featurize_batch(batch, self.fetch)


def _featurize_fixture(batch: pa.Table) -> pa.Table:
    return _featurize_batch(batch, fetch_fixture)


def extract_media_features(docs: rd.Dataset, *, fetch=None,
                           concurrency: int | tuple[int, int] = (2, 8),
                           batch_size: int = 256) -> rd.Dataset:
    """Decode + featurize media spans.

    Default (fixture store, no per-worker state): STATELESS tasks — an
    autoscaling actor pool starts at 1 actor and never ramps inside a
    seconds-long decode stage, serializing ~250 us/image codec work
    (the repo's broadcast-stage discipline, ``broadcast.py``).  With a
    custom ``fetch`` (a real store client) the stage becomes the
    actor-pool seam so the client is built once per actor."""
    if fetch is None:
        return docs.map_batches(_featurize_fixture, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=batch_size)
    return docs.map_batches(MediaFeaturizer, fn_constructor_args=(fetch,),
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=batch_size, concurrency=concurrency)


def sample_frames(docs: rd.Dataset, *, every_n: int = 10) -> rd.Dataset:
    """Frame sampling for video-style refs: one row per sampled frame
    index per media span.  Frame count is a deterministic function of the
    ref's (doc_id, ordinal) key; the expansion is fully vectorized
    (offset arithmetic — no per-row loop)."""
    import pyarrow.compute as pc

    def frames(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.string()),
                          "media_ref": pa.array([], pa.string()),
                          "frame_idx": pa.array([], pa.int32())})
        if t.num_rows == 0 or "spans" not in t.column_names:
            return empty
        spans = t["spans"]
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        flat = spans.flatten()
        kind = pc.struct_field(flat, "kind")
        ref = pc.struct_field(flat, "media_ref")
        is_media = pc.and_(pc.not_equal(kind, "text"),
                           pc.not_equal(ref, "")).to_numpy(zero_copy_only=False)
        if not is_media.any():
            return empty
        offs = np.asarray(spans.offsets, dtype=np.int64)
        n_spans = np.diff(offs)
        doc_rep = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False), n_spans)[is_media]
        refs = ref.to_numpy(zero_copy_only=False)[is_media]
        mref = pc.cast(ref.filter(pa.array(is_media)), pa.string())
        did = pc.cast(pc.utf8_slice_codeunits(mref, 12, 24), pa.int64()).to_numpy()
        order = pc.cast(pc.utf8_slice_codeunits(mref, 25, 1 << 30),
                        pa.int64()).to_numpy()
        key = did * 16 + order
        n_frames = (key * 2_654_435_761) % (1 << 32) % 100 + 1
        n_out = (n_frames + every_n - 1) // every_n
        starts = np.zeros(len(n_out) + 1, dtype=np.int64)
        np.cumsum(n_out, out=starts[1:])
        total = int(starts[-1])
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(starts[:-1], n_out))
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_rep, n_out), pa.string()),
            "media_ref": pa.array(np.repeat(refs, n_out), pa.string()),
            "frame_idx": pa.array((within * every_n).astype(np.int32)),
        })

    return docs.map_batches(frames, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=256)


def _resize_batch(batch: pa.Table, fetch, out_w: int, out_h: int) -> pa.Table:
    """decode -> nearest-neighbor resize -> per-IMAGE stats (one row per
    image span).  The resample index math is exact integer
    (src = (dst * src_dim) // dst_dim), so the SQL twin recomputes the
    selected pixels from the fixture formula and equality proves the
    decode + resize path reconstructs them exactly."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "ord": pa.array([], pa.int64()),
                      "r_mean_r": pa.array([], pa.float64()),
                      "r_mean_g": pa.array([], pa.float64()),
                      "r_mean_b": pa.array([], pa.float64()),
                      "r_min": pa.array([], pa.int64()),
                      "r_max": pa.array([], pa.int64())})
    if batch.num_rows == 0 or "spans" not in batch.column_names:
        return empty
    spans = batch["spans"]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    flat = spans.flatten()
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
    is_media = (kind != "text") & (ref != "")
    offs = np.asarray(spans.offsets, dtype=np.int64)
    n_spans = np.diff(offs)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of_span = np.repeat(ids, n_spans)
    ord_of_span = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(offs[:-1], n_spans))
    iy = (np.arange(out_h, dtype=np.int64) * IMG_H) // out_h
    ix = (np.arange(out_w, dtype=np.int64) * IMG_W) // out_w
    npix = float(out_w * out_h)
    rows: list[tuple] = []
    for j in np.flatnonzero(is_media):
        data = fetch(ref[j], kind[j])
        if data[:8] != _PNG_MAGIC:
            continue  # resize is an image op; audio spans pass through
        px = decode_png(data)
        r = px[iy][:, ix].astype(np.int64)          # (out_h, out_w, 3)
        s = r.reshape(-1, 3).sum(axis=0)
        means = np.floor(s / npix * 1e6 + 0.5) / 1e6
        rows.append((int(doc_of_span[j]), int(ord_of_span[j]),
                     float(means[0]), float(means[1]), float(means[2]),
                     int(r.min()), int(r.max())))
    if not rows:
        return empty
    d, o, mr, mg, mb, mn, mx = zip(*rows)
    return pa.table({"doc_id": pa.array(list(d), pa.int64()),
                     "ord": pa.array(list(o), pa.int64()),
                     "r_mean_r": pa.array(list(mr), pa.float64()),
                     "r_mean_g": pa.array(list(mg), pa.float64()),
                     "r_mean_b": pa.array(list(mb), pa.float64()),
                     "r_min": pa.array(list(mn), pa.int64()),
                     "r_max": pa.array(list(mx), pa.int64())})


class ImageResizer:
    """Actor seam for resize with a real store client (the
    MediaFeaturizer discipline: client per actor, decode per batch)."""

    def __init__(self, fetch=None, out_w: int = 4, out_h: int = 4):
        self.fetch = fetch or fetch_fixture
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _resize_batch(batch, self.fetch, self.out_w, self.out_h)


def resize_images(docs: rd.Dataset, *, out_w: int = 4, out_h: int = 4,
                  fetch=None, batch_size: int = 256,
                  concurrency: int | tuple[int, int] = (2, 8)) -> rd.Dataset:
    """Image resize stage: fetch + REAL PNG decode + nearest-neighbor
    resample to (out_w, out_h), one output row per image span with the
    resized channel means / min / max (``oracle.image_resize_sql``
    twin).  Same plan shape as ``extract_media_features``: stateless
    tasks on the fixture store, actor pool when a real ``fetch`` client
    is supplied."""
    if fetch is None:
        return docs.map_batches(
            lambda t: _resize_batch(t, fetch_fixture, out_w, out_h),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
    return docs.map_batches(ImageResizer,
                            fn_constructor_args=(fetch, out_w, out_h),
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=batch_size, concurrency=concurrency)


def _dhash_batch(batch: pa.Table, fetch, gw: int = 9, gh: int = 8) -> pa.Table:
    """Perceptual difference-hash per image span — the image-dedup
    primitive: decode PNG, nearest-neighbor resample to a (gh, gw)
    integer-gray grid (gray = r+g+b, no float luma weights), bit
    (y, x) = gray[y, x] < gray[y, x+1] — 64 bits for the 9x8 default.
    All arithmetic integer, so the SQL twin recomputes the hash from
    the fixture formula bit-for-bit (signed int64 view both sides)."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "ord": pa.array([], pa.int64()),
                      "dhash": pa.array([], pa.int64())})
    if batch.num_rows == 0 or "spans" not in batch.column_names:
        return empty
    spans = batch["spans"]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    flat = spans.flatten()
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
    is_media = (kind != "text") & (ref != "")
    offs = np.asarray(spans.offsets, dtype=np.int64)
    n_spans = np.diff(offs)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of_span = np.repeat(ids, n_spans)
    ord_of_span = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(offs[:-1], n_spans))
    iy = (np.arange(gh, dtype=np.int64) * IMG_H) // gh
    ix = (np.arange(gw, dtype=np.int64) * IMG_W) // gw
    weights = (np.uint64(1) << np.arange(gh * (gw - 1),
                                         dtype=np.uint64).reshape(gh, gw - 1))
    rows: list[tuple] = []
    for j in np.flatnonzero(is_media):
        data = fetch(ref[j], kind[j])
        if data[:8] != _PNG_MAGIC:
            continue
        px = decode_png(data)
        g = px[iy][:, ix].astype(np.int64).sum(axis=2)  # (gh, gw) gray
        bits = (g[:, :-1] < g[:, 1:])
        rows.append((int(doc_of_span[j]), int(ord_of_span[j]),
                     int(weights[bits].sum(dtype=np.uint64))))
    if not rows:
        return empty
    d, o, hh = zip(*rows)
    return pa.table({"doc_id": pa.array(list(d), pa.int64()),
                     "ord": pa.array(list(o), pa.int64()),
                     "dhash": pa.array(np.array(hh, dtype=np.uint64)
                                       .view(np.int64))})


class MediaDecodeActor:
    """Shared actor seam for the decode-stage family (dhash / audio
    fingerprint / audio resample) — the MediaFeaturizer discipline:
    the store client is built ONCE per actor in ``__init__`` (pass a
    zero-arg ``fetch_factory`` so every actor constructs its OWN
    client — connections never serialize across processes), decode
    runs per batch in ``__call__``.  ``op`` picks the batch kernel."""

    _OPS = {"dhash": lambda fetch, args: (
                lambda t: _dhash_batch(t, fetch, *args)),
            "audio_fp": lambda fetch, args: (
                lambda t: _audio_fp_batch(t, fetch)),
            "audio_resample": lambda fetch, args: (
                lambda t: _audio_resample_batch(t, fetch, *args))}

    def __init__(self, op: str, fetch=None, fetch_factory=None, args=()):
        f = fetch_factory() if fetch_factory is not None \
            else (fetch or fetch_fixture)
        self._fn = self._OPS[op](f, args)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


def image_dhash(docs: rd.Dataset, *, fetch=None, fetch_factory=None,
                gw: int = 9, gh: int = 8, batch_size: int = 256,
                concurrency: int | tuple[int, int] = (2, 8)) -> rd.Dataset:
    """Per-span perceptual hash.  Fixture fetch (no per-worker state)
    -> stateless tasks (the broadcast-stage discipline: autoscaling
    pools never ramp inside sub-second stages).  A real store client
    (``fetch`` callable or, better, zero-arg ``fetch_factory`` so each
    actor builds its own connection) -> actor pool, client per actor
    (round-5 verdict item)."""
    if fetch is None and fetch_factory is None:
        return docs.map_batches(lambda t: _dhash_batch(t, fetch_fixture,
                                                       gw, gh),
                                batch_format="pyarrow", zero_copy_batch=True)
    return docs.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs=dict(op="dhash", fetch=fetch,
                                   fetch_factory=fetch_factory,
                                   args=(gw, gh)),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def _audio_fp_batch(batch: pa.Table, fetch) -> pa.Table:
    """Difference fingerprint per audio span — the audio-dedup twin of
    ``_dhash_batch``: decode WAV, bit i = sample(i) < sample(i+1) over
    the N_SAMPLES int16 sequence (63 bits), signed-int64 fold.  Integer
    end to end; the SQL twin recomputes every bit from the fixture
    sample formula, so equality proves the WAV encode/decode path."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "ord": pa.array([], pa.int64()),
                      "afp": pa.array([], pa.int64())})
    if batch.num_rows == 0 or "spans" not in batch.column_names:
        return empty
    spans = batch["spans"]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
    flat = spans.flatten()
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
    is_media = (kind != "text") & (ref != "")
    offs = np.asarray(spans.offsets, dtype=np.int64)
    n_spans = np.diff(offs)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of_span = np.repeat(ids, n_spans)
    ord_of_span = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(offs[:-1], n_spans))
    weights = np.uint64(1) << np.arange(N_SAMPLES - 1, dtype=np.uint64)
    rows: list[tuple] = []
    for j in np.flatnonzero(is_media):
        data = fetch(ref[j], kind[j])
        if data[:8] == _PNG_MAGIC:
            continue  # fingerprint is an audio op; image spans pass
        x = decode_wav(data).astype(np.int64)
        bits = x[:-1] < x[1:]
        rows.append((int(doc_of_span[j]), int(ord_of_span[j]),
                     int(weights[bits].sum(dtype=np.uint64))))
    if not rows:
        return empty
    d, o, hh = zip(*rows)
    return pa.table({"doc_id": pa.array(list(d), pa.int64()),
                     "ord": pa.array(list(o), pa.int64()),
                     "afp": pa.array(np.array(hh, dtype=np.uint64)
                                     .view(np.int64))})


def audio_fingerprint(docs: rd.Dataset, *, fetch=None, fetch_factory=None,
                      batch_size: int = 256,
                      concurrency: int | tuple[int, int] = (2, 8)
                      ) -> rd.Dataset:
    """Per-span audio difference fingerprint — same plan split as
    ``image_dhash``: stateless tasks on the fixture store, client-per-
    actor pool when a real store client / factory is supplied."""
    if fetch is None and fetch_factory is None:
        return docs.map_batches(lambda t: _audio_fp_batch(t, fetch_fixture),
                                batch_format="pyarrow", zero_copy_batch=True)
    return docs.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs=dict(op="audio_fp", fetch=fetch,
                                   fetch_factory=fetch_factory),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


N_RESAMPLE = 48  # resample target length (64 -> 48, a 4:3 downsample)


def _audio_resample_batch(batch: pa.Table, fetch, m: int) -> pa.Table:
    """Exact int64 linear-interpolation resample of each audio span's
    decoded WAV to ``m`` samples (the resample_interpolate fixed-point
    discipline applied to the media family): output index j maps to
    source position num/den with num = j*(N-1), den = m-1;
    v = x[i0] + floor((x[i1] - x[i0]) * r / den) with i0 = num // den,
    r = num % den, i1 = min(i0+1, N-1) — floor division is negative-
    safe on both sides (numpy // vs the SQL mod-adjust).  The decode
    loop is per media span (the established media path); the
    interpolation is one vectorized gather over all spans."""
    import pyarrow.compute as pc
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "ord": pa.array([], pa.int64()),
                      "out_i": pa.array([], pa.int64()),
                      "v": pa.array([], pa.int64())})
    if batch.num_rows == 0 or "spans" not in batch.column_names:
        return empty
    spans = batch["spans"]
    spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) \
        else spans
    flat = spans.flatten()
    kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
    ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
    is_media = (kind != "text") & (ref != "")
    offs = np.asarray(spans.offsets, dtype=np.int64)
    n_spans = np.diff(offs)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of_span = np.repeat(ids, n_spans)
    ord_of_span = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(offs[:-1], n_spans))
    xs, docs_o, ords_o = [], [], []
    for j in np.flatnonzero(is_media):
        data = fetch(ref[j], kind[j])
        if data[:8] == _PNG_MAGIC:
            continue  # audio op; image spans pass
        xs.append(decode_wav(data).astype(np.int64))
        docs_o.append(int(doc_of_span[j]))
        ords_o.append(int(ord_of_span[j]))
    if not xs:
        return empty
    X = np.stack(xs)                      # (k, N_SAMPLES)
    den = m - 1
    num = np.arange(m, dtype=np.int64) * (N_SAMPLES - 1)
    i0 = num // den
    r = num % den
    i1 = np.minimum(i0 + 1, N_SAMPLES - 1)
    V = X[:, i0] + ((X[:, i1] - X[:, i0]) * r) // den   # (k, m)
    k = len(xs)
    return pa.table({
        "doc_id": pa.array(np.repeat(np.array(docs_o, np.int64), m)),
        "ord": pa.array(np.repeat(np.array(ords_o, np.int64), m)),
        "out_i": pa.array(np.tile(np.arange(m, dtype=np.int64), k)),
        "v": pa.array(V.reshape(-1))})


def audio_resample(docs: rd.Dataset, *, m: int = N_RESAMPLE,
                   fetch=None, fetch_factory=None, batch_size: int = 256,
                   concurrency: int | tuple[int, int] = (2, 8)) -> rd.Dataset:
    """Per-span exact WAV resample — same plan split as ``image_dhash``:
    stateless tasks on the fixture store, client-per-actor pool when a
    real store client / factory is supplied."""
    if fetch is None and fetch_factory is None:
        return docs.map_batches(
            lambda t: _audio_resample_batch(t, fetch_fixture, m),
            batch_format="pyarrow", zero_copy_batch=True)
    return docs.map_batches(
        MediaDecodeActor,
        fn_constructor_kwargs=dict(op="audio_resample", fetch=fetch,
                                   fetch_factory=fetch_factory, args=(m,)),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def media_dup_groups(docs: rd.Dataset, *, min_spans: int = 2,
                     fetch=None, fetch_factory=None,
                     n_shards: int | None = None) -> rd.Dataset:
    """End-to-end IMAGE DEDUP over the interleaved media column: decode
    every image span, dHash it (``image_dhash``), and group spans by
    the perceptual hash — groups with >= ``min_spans`` members are the
    duplicate sets an asset pipeline collapses (true duplicate images
    share a dhash exactly; the fixture's mod-PIX_MOD collisions plant
    such sets deterministically).  Output (dhash, n_spans, n_docs,
    keep_doc, keep_ord) — the representative is the (doc, ord)-minimal
    span, the exact-dedup min-winner rule.

    Plan: the decode stage is the ``image_dhash`` task/actor-pool seam
    (client-per-actor with ``fetch_factory``); per-batch (dhash, count,
    distinct-doc partial, min (doc, ord)) folds, ONE hash(dhash)
    exchange merges — distinct-doc counts stay exact because a batch's
    per-(dhash, doc) fold emits at most one doc row per batch and the
    exchange counts distinct doc values in-shard."""
    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    hashes = image_dhash(docs, fetch=fetch, fetch_factory=fetch_factory)
    gold = np.uint64(0x9E3779B97F4A7C15)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"dh": pa.array([], pa.int64()),
                          "doc": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "mdoc": pa.array([], pa.int64()),
                          "mord": pa.array([], pa.int64()),
                          "_shard": pa.array([], pa.int64())})
        if t.num_rows == 0 or "dhash" not in t.column_names:
            return empty
        dh = t["dhash"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        o = t["ord"].to_numpy(zero_copy_only=False)
        order = np.lexsort((o, doc, dh))
        dh, doc, o = dh[order], doc[order], o[order]
        runs = np.flatnonzero(np.r_[True, (dh[1:] != dh[:-1])
                                    | (doc[1:] != doc[:-1])])
        # one row per (dhash, doc) per batch; first row of the dhash
        # run holds the (doc, ord) minimum
        n = np.diff(np.r_[runs, len(dh)]).astype(np.int64)
        with np.errstate(over="ignore"):
            sh = ((dh[runs].astype(np.uint64) * gold) >> np.uint64(33))
        return pa.table({"dh": pa.array(dh[runs]),
                         "doc": pa.array(doc[runs]),
                         "n": pa.array(n),
                         "mdoc": pa.array(doc[runs]),
                         "mord": pa.array(o[runs]),
                         "_shard": pa.array((sh % np.uint64(n_shards))
                                            .astype(np.int64))})

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        if len(g) == 0:
            return pd.DataFrame({
                "dhash": pd.Series([], dtype=np.int64),
                "n_spans": pd.Series([], dtype=np.int64),
                "n_docs": pd.Series([], dtype=np.int64),
                "keep_doc": pd.Series([], dtype=np.int64),
                "keep_ord": pd.Series([], dtype=np.int64)})
        dh = g["dh"].to_numpy(np.int64)
        doc = g["doc"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        mdoc = g["mdoc"].to_numpy(np.int64)
        mord = g["mord"].to_numpy(np.int64)
        order = np.lexsort((mord, mdoc, dh))
        dh, doc, n = dh[order], doc[order], n[order]
        mdoc, mord = mdoc[order], mord[order]
        runs = np.flatnonzero(np.r_[True, dh[1:] != dh[:-1]])
        tot = np.add.reduceat(n, runs)
        # distinct docs: (dhash, doc) rows may repeat across batches
        dd = np.flatnonzero(np.r_[True, (dh[1:] != dh[:-1])
                                  | (doc[1:] != doc[:-1])])
        seg = np.searchsorted(runs, dd, side="right") - 1
        ndocs = np.bincount(seg, minlength=len(runs)).astype(np.int64)
        keep = (tot >= min_spans)
        return pd.DataFrame({"dhash": dh[runs][keep],
                             "n_spans": tot[keep],
                             "n_docs": ndocs[keep],
                             "keep_doc": mdoc[runs][keep],
                             "keep_ord": mord[runs][keep]})

    return (hashes.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("_shard").map_groups(merge, batch_format="pandas"))

"""Multimodal (image/audio/video) stages — actor-pool plumbing with
stubbed codecs.

Media lives in the corpus as opaque references/bytes inside ``spans``
(kind in {image, audio}) or as a dedicated ``binary`` column.  The
Ray-side plumbing — schema, batch sizing, actor lifecycle, output layout
— is real and tested; the codec itself is a seam:

* if PIL / soundfile are importable, real decode runs (not in this
  container);
* otherwise ``allow_fake=True`` selects a DETERMINISTIC fake decoder
  (content-hash-derived features) so downstream stages and tests run;
* ``allow_fake=False`` raises NotImplementedError at actor init — the
  clearly-marked stub the task contract asks for.

Batch sizes default small (256) because decoded media rows are wide —
the memory rule of thumb is batch_size x concurrency x decoded_size per
node (SURVEY.md §4 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = ["MediaFeaturizer", "extract_media_features", "sample_frames"]

try:  # pragma: no cover — PIL absent in this container
    from PIL import Image  # type: ignore # noqa: F401
    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

N_FEATURES = 8


def _fake_features(refs: list[str]) -> np.ndarray:
    """Deterministic stand-in: 8 floats in [0,1) from the md5 of the ref."""
    out = np.empty((len(refs), N_FEATURES), dtype=np.float32)
    for i, r in enumerate(refs):
        dig = hashlib.md5((r or "").encode()).digest()
        out[i] = np.frombuffer(dig[:N_FEATURES * 2], dtype=np.uint16).astype(np.float32) / 65536.0
    return out


class MediaFeaturizer:
    """Actor: decode + featurize the media spans of each document.

    Input rows carry ``spans``; output appends
    ``media_features: list<float32>`` (mean feature over the doc's media
    spans; zeros when none) and ``n_media_spans: int32``.
    """

    def __init__(self, allow_fake: bool = True):
        if not HAVE_PIL and not allow_fake:
            raise NotImplementedError(
                "media decode requires PIL/soundfile (not in this container); "
                "pass allow_fake=True for the deterministic stub")
        self.fake = not HAVE_PIL

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if batch.num_rows == 0 or "spans" not in batch.column_names:
            out = batch
            out = out.append_column("media_features", pa.array(
                [], pa.list_(pa.float32(), N_FEATURES)))
            return out.append_column("n_media_spans", pa.array([], pa.int32()))
        spans = batch["spans"]
        spans = spans.combine_chunks() if isinstance(spans, pa.ChunkedArray) else spans
        # vectorized span scan: flatten once, never per-row as_py() —
        # only the per-REF codec call (the real decode seam) stays a loop
        flat = spans.flatten()
        kind = pc.struct_field(flat, "kind").to_numpy(zero_copy_only=False)
        ref = pc.struct_field(flat, "media_ref").to_numpy(zero_copy_only=False)
        is_media = (kind != "text") & (ref != "")
        offs = np.asarray(spans.offsets, dtype=np.int64)
        n_spans = np.diff(offs)
        counts = np.zeros(len(batch), dtype=np.int64)
        np.add.at(counts, np.repeat(np.arange(len(batch)), n_spans), is_media)
        refs = ref[is_media]
        feats = np.zeros((len(batch), N_FEATURES), dtype=np.float32)
        if len(refs):
            f = _fake_features(list(refs)) if self.fake else self._decode(list(refs))
            row_of = np.repeat(np.arange(len(batch)), n_spans)[is_media]
            np.add.at(feats, row_of, f)
            nz = counts > 0
            feats[nz] /= counts[nz, None].astype(np.float32)
        batch = batch.append_column(
            "media_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), N_FEATURES))
        return batch.append_column("n_media_spans",
                                   pa.array(counts.astype(np.int32)))

    def _decode(self, refs):  # pragma: no cover — real codec path
        raise NotImplementedError("real media decode not available here")


def extract_media_features(docs: rd.Dataset, *, allow_fake: bool = True,
                           concurrency: int | tuple[int, int] = (1, 4),
                           batch_size: int = 256) -> rd.Dataset:
    return docs.map_batches(MediaFeaturizer, fn_constructor_args=(allow_fake,),
                            batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=batch_size, concurrency=concurrency)


def sample_frames(docs: rd.Dataset, *, every_n: int = 10) -> rd.Dataset:
    """Frame-sampling stub for video refs: emits one row per sampled frame
    index per media span (the plumbing of a real frame sampler; frame
    count is a deterministic function of the ref hash)."""

    def frames(t: pa.Table) -> pa.Table:
        doc_ids, refs_out, frame_idx = [], [], []
        spans = t["spans"]
        dids = t["doc_id"].to_pylist()
        for i in range(len(t)):
            for s in (spans[i].as_py() or []):
                if s["kind"] == "text" or not s["media_ref"]:
                    continue
                n_frames = (int(hashlib.md5(s["media_ref"].encode()).hexdigest()[:4], 16) % 100) + 1
                for f in range(0, n_frames, every_n):
                    doc_ids.append(dids[i])
                    refs_out.append(s["media_ref"])
                    frame_idx.append(f)
        return pa.table({"doc_id": pa.array(doc_ids, pa.string()),
                         "media_ref": pa.array(refs_out, pa.string()),
                         "frame_idx": pa.array(frame_idx, pa.int32())})

    return docs.map_batches(frames, batch_format="pyarrow", zero_copy_batch=True,
                            batch_size=256)

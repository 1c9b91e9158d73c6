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
        spans = batch["spans"]
        feats = np.zeros((len(batch), N_FEATURES), dtype=np.float32)
        counts = np.zeros(len(batch), dtype=np.int32)
        for i in range(len(batch)):
            row = spans[i].as_py() or []
            refs = [s["media_ref"] for s in row if s["kind"] != "text" and s["media_ref"]]
            counts[i] = len(refs)
            if refs:
                f = _fake_features(refs) if self.fake else self._decode(refs)
                feats[i] = f.mean(axis=0)
        batch = batch.append_column(
            "media_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel()), N_FEATURES))
        return batch.append_column("n_media_spans", pa.array(counts))

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

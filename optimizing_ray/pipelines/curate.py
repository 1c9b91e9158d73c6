"""Corpus curation — the composed training-data flagship.

Chains the engine's training-data operators into the standard curation
funnel a 100 TB pretraining pipeline runs:

    exact dedup -> text analysis (lang-ID + quality) -> quality/lang
    filter -> deterministic train/val split

Each stage is one of the already-tested primitives; the composition
stays a single lazy Dataset pipeline (dedup's winner shuffle is the only
exchange — analysis, filtering and splitting fuse into its output maps).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from optimizing_ray.pipelines.dedup import exact_dedup
from optimizing_ray.pipelines.textops import analyze_text, train_split

__all__ = ["curate"]


def curate(docs: rd.Dataset, *, text_col: str = "text", id_col: str = "doc_id",
           min_quality: float = 0.3, keep_langs: tuple[str, ...] | None = None,
           train_frac: float = 0.9, nrows: int | None = None) -> rd.Dataset:
    """Returns the curated corpus with ``lang_pred``, ``quality`` and
    ``split`` columns; rows failing the quality (or language) gate are
    dropped.  ``nrows`` (optional corpus-size hint, e.g. from parquet
    metadata) lets the dedup stage pick its broadcast plan without an
    extra counting pass."""
    ds = exact_dedup(docs, text_col=text_col, id_col=id_col, nrows=nrows)
    ds = analyze_text(ds, text_col=text_col)

    def gate(t: pa.Table) -> pa.Table:
        import numpy as np
        keep = t["quality"].to_numpy() >= min_quality
        if keep_langs is not None:
            langs = t["lang_pred"].to_numpy(zero_copy_only=False)
            keep = keep & np.isin(langs, list(keep_langs))
        return t.filter(pa.array(keep))

    ds = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    return train_split(ds, id_col=id_col, train_frac=train_frac)

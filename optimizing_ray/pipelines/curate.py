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
           train_frac: float = 0.9, nrows: int | None = None,
           decontaminate_mod: int | None = None,
           redact_pii: bool = False) -> rd.Dataset:
    """Returns the curated corpus with ``lang_pred``, ``quality`` and
    ``split`` columns; rows failing the quality (or language) gate are
    dropped.  ``nrows`` (optional corpus-size hint, e.g. from parquet
    metadata) lets the dedup stage pick its broadcast plan without an
    extra counting pass.

    Optional hygiene stages (both zero-shuffle):
    ``decontaminate_mod`` drops benchmark docs (doc_id %% mod == 0) and
    every doc sharing a word n-gram with them (broadcast blocklist,
    ``textops.decontaminate`` emit='clean'); ``redact_pii`` scrubs the
    text column in place with the RE2 PII patterns before analysis."""
    ds = exact_dedup(docs, text_col=text_col, id_col=id_col, nrows=nrows)
    if decontaminate_mod is not None:
        from optimizing_ray.pipelines.textops import decontaminate
        ds = decontaminate(ds, benchmark_mod=decontaminate_mod,
                           id_col=id_col, text_col=text_col, emit="clean")
    if redact_pii:
        import pyarrow.compute as pc

        from optimizing_ray.pipelines.textops import PII_PATTERNS

        def scrub(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or text_col not in t.column_names:
                return t
            clean = t[text_col]
            for _, pat, repl in PII_PATTERNS:
                clean = pc.replace_substring_regex(clean, pat, repl)
            i = t.column_names.index(text_col)
            return t.set_column(i, text_col, clean)

        ds = ds.map_batches(scrub, batch_format="pyarrow",
                            zero_copy_batch=True)
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

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
           redact_pii: bool = False,
           near_dup_jaccard: float | None = None,
           broadcast_threshold: int = 200_000) -> rd.Dataset:
    """Returns the curated corpus with ``lang_pred``, ``quality`` and
    ``split`` columns; rows failing the quality (or language) gate are
    dropped.  ``nrows`` (optional corpus-size hint, e.g. from parquet
    metadata) lets the dedup stage pick its broadcast plan without an
    extra counting pass.

    Optional hygiene stages (both zero-shuffle):
    ``decontaminate_mod`` drops benchmark docs (doc_id %% mod == 0) and
    every doc sharing a word n-gram with them (broadcast blocklist,
    ``textops.decontaminate`` emit='clean'); ``redact_pii`` scrubs the
    text column in place with the RE2 PII patterns before analysis.

    ``near_dup_jaccard`` adds the near-dedup stage after exact dedup:
    ``dedup.near_dedup_keep`` at that threshold, keeping one survivor
    per duplicate cluster.  The corpus materializes once first (the
    keep-list pipeline reads it three times — signatures, verify,
    labeling — and re-executing the upstream hygiene stages per leg
    would triple their cost); below ``broadcast_threshold`` the DROPPED
    id set (bounded by the duplicate count) rides ``ray.put`` as an
    anti-filter — zero extra shuffles — else the kept list joins back
    by id through the sharded exchange."""
    ds = exact_dedup(docs, text_col=text_col, id_col=id_col, nrows=nrows)
    if near_dup_jaccard is not None:
        import numpy as np
        import pyarrow.compute as pc
        import ray

        from optimizing_ray.pipelines.dedup import near_dedup_keep

        ds = ds.materialize()
        keep = near_dedup_keep(ds, text_col=text_col, id_col=id_col,
                               jaccard_threshold=near_dup_jaccard,
                               nrows=nrows,
                               broadcast_threshold=broadcast_threshold)
        from optimizing_ray.pipelines.dedup import _plan_rows
        if _plan_rows(nrows) <= broadcast_threshold:
            tabs = [t for t in ray.get(keep.to_arrow_refs()) if t.num_rows]
            dropped = (np.sort(np.concatenate(
                [t.filter(pc.equal(t["kept"], 0))[id_col]
                 .to_numpy(zero_copy_only=False) for t in tabs]))
                if tabs else np.empty(0, np.int64))
            drop_ref = ray.put(dropped.astype(np.int64))

            def anti(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or id_col not in t.column_names:
                    return t
                from optimizing_ray.broadcast import cached as _c
                dd = _c(("curate_neardup_drop", drop_ref.hex()),
                        lambda: ray.get(drop_ref))
                ids = t[id_col].to_numpy(zero_copy_only=False)
                if not len(dd):
                    return t
                pos = np.clip(np.searchsorted(dd, ids), 0, len(dd) - 1)
                return t.filter(pa.array(dd[pos] != ids))

            ds = ds.map_batches(anti, batch_format="pyarrow",
                                zero_copy_batch=True)
        else:
            from optimizing_ray.pipelines.shard_join import hash_shard_join

            def kept_only(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or "kept" not in t.column_names:
                    return pa.table({id_col: pa.array([], pa.int64())})
                return (t.filter(pc.equal(t["kept"], 1))
                        .select([id_col]))

            kept_ids = keep.map_batches(kept_only, batch_format="pyarrow",
                                        zero_copy_batch=True)
            ds = hash_shard_join(
                ds, kept_ids, on=id_col, how="inner",
                lschema=ds.schema().base_schema,
                rschema=pa.schema([pa.field(id_col, pa.int64())]))
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

#!/usr/bin/env python
"""CLI / `ray job submit` entry point: the flagship tiling pipeline with
resumable, manifest-tracked output.

    python scripts/run_pipeline.py --input /root/testdata/sf0.01 \
        --output /tmp/out/tiles --depth 6 [--adaptive] [--resume]

On a cluster:  ray job submit -- python scripts/run_pipeline.py ...
(then `address="auto"` picks up the cluster; here it stays local).

Rerunning with the same --output resumes: completed tile groups are
skipped via the checkpoint manifest (state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir or parquet path")
    ap.add_argument("--output", required=True, help="output dir (tile groups + manifest)")
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--adaptive", action="store_true",
                    help="capacity-based adaptive depth + hot-cell salting")
    ap.add_argument("--curate", action="store_true",
                    help="run the curation funnel (dedup -> analyze -> "
                         "quality gate -> split) and write the curated "
                         "corpus partitioned by split+shard instead of "
                         "the tiling pipeline")
    ap.add_argument("--compact", action="store_true",
                    help="maintenance pass on an existing --output store: "
                         "merge Morton-adjacent small tile groups "
                         "(--small-rows/--target-rows)")
    ap.add_argument("--small-rows", type=int, default=10_000)
    ap.add_argument("--target-rows", type=int, default=500_000)
    ap.add_argument("--trajectories", action="store_true",
                    help="trajectory ingest: derive per-doc movement "
                         "segments, supercover them to tiles, and write "
                         "one tile group per cell (resumable)")
    ap.add_argument("--min-quality", type=float, default=0.2)
    ap.add_argument("--decontaminate-mod", type=int, default=None,
                    help="curate: drop benchmark docs (doc_id %% MOD == 0) "
                         "and every doc sharing a word 4-gram with them")
    ap.add_argument("--near-dedup", type=float, default=None,
                    metavar="JACCARD",
                    help="curate: drop near-duplicate docs (MinHash+LSH "
                         "keep list at this jaccard threshold, one "
                         "survivor per cluster)")
    ap.add_argument("--redact-pii", action="store_true",
                    help="curate: scrub email/phone/IP from text before "
                         "analysis")
    ap.add_argument("--capacity", type=int, default=10_000)
    ap.add_argument("--salt-threshold", type=int, default=1_000_000)
    ap.add_argument("--n-salts", type=int, default=8)
    ap.add_argument("--coarse-depth", type=int, default=3)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.stages import adaptive
    from optimizing_ray.stages.assign import assign_tiles
    from optimizing_ray.state import manifest

    t0 = time.perf_counter()

    if args.compact:
        stats = manifest.compact_store(args.output,
                                       small_rows=args.small_rows,
                                       target_rows=args.target_rows)
        out = {"status": "ok", "mode": "compact",
               "wall_s": round(time.perf_counter() - t0, 3),
               **stats, "output": args.output}
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if args.curate:
        # the training-data flagship as a resumable CLI: curated corpus
        # lands as one tile group per (split, id-hash shard) so a failed
        # run resumes per partition
        import numpy as np
        import pyarrow as pa

        from optimizing_ray.pipelines import curate as cur

        docs = driver_tables.read(args.input, "documents",
                                  columns=["doc_id", "text"], num_blocks=8)
        try:
            import pyarrow.parquet as _pq
            nrows = _pq.ParquetFile(f"{args.input}/documents.parquet").metadata.num_rows
        except Exception:
            nrows = None
        out_ds = cur.curate(docs, min_quality=args.min_quality, nrows=nrows,
                            decontaminate_mod=args.decontaminate_mod,
                            redact_pii=args.redact_pii,
                            near_dup_jaccard=args.near_dedup)

        def part(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "doc_id" not in t.column_names:
                # empty blocks can carry an EMPTY schema (working notes)
                return t.append_column("part_key", pa.array([], pa.int64()))
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pk = np.where(np.asarray(t["split"].to_pylist()) == "train", 0, 1_000)                 + (ids % 16)
            return t.append_column("part_key", pa.array(pk.astype(np.int64)))

        keyed = out_ds.map_batches(part, batch_format="pyarrow",
                                   zero_copy_batch=True)
        rows = manifest.resumable_write(keyed, args.output, key_col="part_key")
        out = {
            "status": "ok", "mode": "curate",
            "wall_s": round(time.perf_counter() - t0, 3),
            "tile_groups_written": len(rows),
            "rows_written": int(sum(r["rows_out"] for r in rows)),
            "tile_groups_total": len(manifest.read_manifest(args.output)),
            "output": args.output,
        }
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if args.trajectories:
        # trajectory ingest: segment -> tile supercover rows land as one
        # tile group per crossed cell (Morton-composite part key), so a
        # failed run resumes per cell
        import pyarrow as pa

        from optimizing_ray import cells as cl
        from optimizing_ray.stages.assign import segment_cover

        docs = driver_tables.documents_with_geometry(args.input)
        segs = docs.map_batches(driver_tables.derive_segments_batch,
                                batch_format="pyarrow", zero_copy_batch=True)
        covered = segment_cover(segs, args.depth, WORLD_2D)

        def part(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "cell_ix" not in t.column_names:
                return t.append_column("part_key", pa.array([], pa.int64()))
            import numpy as np
            key = cl.encode2(t["cell_ix"].to_numpy().astype(np.uint64),
                             t["cell_iy"].to_numpy().astype(np.uint64),
                             args.depth).astype(np.int64)
            return t.append_column("part_key", pa.array(key))

        keyed = covered.map_batches(part, batch_format="pyarrow",
                                    zero_copy_batch=True)
        rows = manifest.resumable_write(keyed, args.output,
                                        key_col="part_key")
        out = {
            "status": "ok", "mode": "trajectories",
            "wall_s": round(time.perf_counter() - t0, 3),
            "tile_groups_written": len(rows),
            "rows_written": int(sum(r["rows_out"] for r in rows)),
            "tile_groups_total": len(manifest.read_manifest(args.output)),
            "output": args.output,
        }
        print(json.dumps(out))
        ray.shutdown()
        return 0

    docs = driver_tables.documents_with_geometry(args.input)
    part_col = "cell_key"
    if args.adaptive:
        keyed, plan = adaptive.adaptive_assign(
            docs, WORLD_2D, capacity=args.capacity,
            coarse_depth=args.coarse_depth, max_depth=args.depth,
            salt_threshold=args.salt_threshold, n_salts=args.n_salts)
        n_leaves = len(plan.leaves)
        if len(plan.hot_cells):
            # salted hot cells fan out over composite part keys
            import pyarrow as pa

            def composite(t):
                pk = (t["cell_key"].to_numpy() * args.n_salts
                      + t["salt"].to_numpy())
                return t.append_column("part_key", pa.array(pk))

            keyed = keyed.map_batches(composite, batch_format="pyarrow",
                                      zero_copy_batch=True)
            part_col = "part_key"
    else:
        keyed = assign_tiles(docs, args.depth, WORLD_2D)
        n_leaves = None
    rows = manifest.resumable_write(keyed, args.output, key_col=part_col)
    out = {
        "status": "ok",
        "wall_s": round(time.perf_counter() - t0, 3),
        "tile_groups_written": len(rows),
        "rows_written": int(sum(r["rows_out"] for r in rows)),
        "tile_groups_total": len(manifest.read_manifest(args.output)),
        "adaptive_leaves": n_leaves,
        "output": args.output,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

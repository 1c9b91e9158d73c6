#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline pipelines (BASELINE.md target metrics):
  * tile_assign_1m : generate + Morton-assign the 1M-row flat2d corpus
                     (the reference quadtree benchmark workload,
                     .Test/QuadTree.cpp:351-365) -> tile-assignments/s
  * box_join_1m    : 64 box queries joined against the 1M corpus
                     -> spatial-join rows/s
  * knn_1m         : 32 exact kNN queries over the 1M corpus
  * driver-table queries (tile_assign/tile_counts/box_join/knn) at
    $GRAFT_SF_DIR (default /root/testdata/sf0.1)

`--scaling`: runs the headline job in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on identical input and reports throughput at both
plus scaling efficiency (the sandbox stand-in for the N vs 4N cluster
criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CORPUS = 1_000_000
N_BLOCKS = 64


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import box_join, knn
    from optimizing_ray.sources import driver_tables
    from optimizing_ray.sources.corpus import synthetic_documents
    from optimizing_ray import synth
    from optimizing_ray.stages.assign import assign_tiles

    times: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        times[name] = round(time.perf_counter() - t0, 3)
        return out

    depth = 6  # 64x64 grid over the 1M corpus (~244 rows/cell)

    # untimed warmup: spin up worker processes + page cache so timings
    # measure compute/shuffle, not cold start (ray_guide.md scaling section)
    synthetic_documents(200_000, variant="flat2d", with_spans=False,
                        override_num_blocks=N_BLOCKS).sum("x")
    driver_tables.documents_with_geometry(sf_dir).count()

    # -- headline 1: corpus generation + tile assignment (ingest) ----------
    def assign_1m():
        ds = synthetic_documents(N_CORPUS, variant="flat2d", with_spans=False,
                                 override_num_blocks=N_BLOCKS)
        ds = assign_tiles(ds, depth, WORLD_2D)
        return ds.sum("cell_key")  # forces full execution of the map chain

    timed("tile_assign_1m", assign_1m)
    extras["tile_assignments_per_sec"] = round(N_CORPUS / times["tile_assign_1m"], 1)

    # -- headline 2: box spatial join --------------------------------------
    corpus = synthetic_documents(N_CORPUS, variant="flat2d", with_spans=False,
                                 override_num_blocks=N_BLOCKS)
    corpus = assign_tiles(corpus, depth, WORLD_2D).materialize()
    # 64 boxes of side ~8k-16k (~1-2.5% of the world each) so join output is
    # in the reference's hit-count regime (~100k+ pairs)
    import numpy as np
    import pyarrow as pa
    qi = np.arange(64, dtype=np.int64)
    qcx = synth.u01(qi, 901) * 100_000.0
    qcy = synth.u01(qi, 902) * 100_000.0
    qs = 8_000.0 + synth.u01(qi, 903) * 8_000.0
    queries = pa.table({
        "query_id": pa.array(np.char.mod("bq-%03d", qi)),
        "min_x": pa.array(qcx - qs / 2), "min_y": pa.array(qcy - qs / 2),
        "max_x": pa.array(qcx + qs / 2), "max_y": pa.array(qcy + qs / 2),
    })

    def join_1m():
        res = box_join.box_join_broadcast(
            corpus, queries, world=WORLD_2D, depth=depth,
            max_extent=(100.0, 100.0), concurrency=(1, max(2, num_cpus // 2)))
        return res.count()

    n_pairs = timed("box_join_1m", join_1m)
    extras["join_rows"] = int(n_pairs)
    extras["join_rows_per_sec"] = round(n_pairs / times["box_join_1m"], 1)

    # -- headline 3: kNN ----------------------------------------------------
    kq = synth.knn_queries_table(32)

    def knn_1m():
        return knn.knn_brute(corpus, kq,
                             concurrency=(1, max(2, num_cpus // 2))).count()

    timed("knn_1m", knn_1m)

    # -- driver-table queries at sf ----------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    for name, q in entrymod.queries().items():
        def run_q(q=q):
            res = q(sf_dir)
            return res.count() if hasattr(res, "count") else len(res)
        timed(f"sf_{name}", run_q)

    ray.shutdown()
    return {
        "metric": "headline_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "extras": extras,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "corpus_rows": N_CORPUS,
    }


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    # headline throughput = corpus rows / (assign + join seconds)
    core = ["tile_assign_1m", "box_join_1m", "knn_1m"]
    t_lo = sum(r_lo["queries"][k] for k in core)
    t_hi = sum(r_hi["queries"][k] for k in core)
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": round(t_lo, 3), "sec_hi": round(t_hi, 3),
        "rows_per_sec_lo": round(N_CORPUS / t_lo, 1),
        "rows_per_sec_hi": round(N_CORPUS / t_hi, 1),
        "detail_lo": r_lo["queries"], "detail_hi": r_hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

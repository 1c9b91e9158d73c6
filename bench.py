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

`--scaling`: runs the headline job in fresh processes at
RAY_GRAFT_CPUS=2 and 8 (GRAFT_SCALE_LO/HI) on identical input and reports
throughput at both plus scaling efficiency (the sandbox stand-in for the
N vs 4N cluster criterion).  Why 2 vs 8 and not 8 vs 32: this VM's DRAM
bandwidth saturates at ~8-16 concurrent numpy streams (see the measured
rationale in run_scaling) — the honest same-machine window is below
saturation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_CORPUS = int(os.environ.get("GRAFT_BENCH_N", "1000000"))
N_BLOCKS = int(os.environ.get("GRAFT_BENCH_BLOCKS", "0")) or max(16, N_CORPUS // 500_000)


def run_bench() -> dict:
    import numpy as _np0
    import time as _time0

    # fresh-page provisioning probe — MUST run before any big allocation
    # in this process (freed pages from earlier arrays would be reused and
    # hide the wall fresh worker allocations actually pay).  Big numpy
    # temporaries are mmap'd per call; during provisioning-wall episodes
    # this measured 15 MB/s vs ~3 GB/s calm (round-4 working notes).
    _t0 = _time0.perf_counter()
    _fx = _np0.empty(12_000_000, dtype=_np0.uint8)
    _fx[::4096] = 1
    _fault_mbs = round(12.0 / (_time0.perf_counter() - _t0), 1)
    del _fx

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
    # min-of-REPS per stateless query: this VM's noisy-neighbor bursts
    # cycle in minutes, so a single-shot sweep always catches a few;
    # the min of two consecutive runs discards one-sided bursts (stateful
    # stages — store write, serving — stay single-run)
    reps = max(1, int(os.environ.get("GRAFT_BENCH_REPS", "2")))

    # record run quality: this shared VM has multi-minute noisy-neighbor
    # episodes that cut single-stream DRAM bandwidth from ~8-10 GB/s to
    # 1.5-5 (working notes).  The probe contextualizes every recorded
    # number — a run with probe < ~7 is not an idle-machine run.
    import numpy as _np2
    _pb = _np2.random.rand(25_000_000)
    _t0 = time.perf_counter()
    _s = 0.0
    for _ in range(5):
        _s += _pb.sum()
    extras["dram_probe_gbs"] = round(5 * _pb.nbytes / 1e9
                                     / (time.perf_counter() - _t0), 2)
    del _pb

    # round-4 (VERDICT item 5): PER-QUERY noise attribution — a probe
    # runs immediately before every rep, and each recorded time carries
    # the probe of its winning (min) rep.  A query whose number
    # regressed with a sub-normal probe was measured inside a
    # noisy-neighbor episode, not a code regression.
    # Buffer sized 100 MB — the original 32 MB buffer fit the LLC, so
    # per-query values read cache bandwidth (~7-8) even while true DRAM
    # streaming was at 1.5 GB/s (measured round 4); readings before
    # this change are on the cache scale, not comparable.
    _pp = _np2.random.rand(12_500_000)
    probes: dict = {}

    def _mini_probe() -> float:
        t0 = time.perf_counter()
        _x = _pp.sum() + _pp.sum()
        return round(2 * _pp.nbytes / 1e9 / (time.perf_counter() - t0), 2)

    extras["fault_probe_mbs"] = _fault_mbs  # taken at process start

    def timed(name, fn, n_reps=None):
        best = None
        out = None
        for _ in range(n_reps if n_reps is not None else reps):
            p = _mini_probe()
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                probes[name] = p
        times[name] = round(best, 3)
        return out

    extras["probe_per_query"] = probes  # filled as queries run

    depth = 6  # 64x64 grid over the 1M corpus (~244 rows/cell)

    # untimed warmup: spin up worker processes + page cache AND exercise
    # each headline code path once so worker-side module imports/JIT-ish
    # first-call costs land outside the timed region
    import numpy as _np
    import pyarrow as _pa
    _warm = assign_tiles(
        synthetic_documents(200_000, variant="flat2d", with_spans=False,
                            override_num_blocks=N_BLOCKS), depth, WORLD_2D)
    _wq = _pa.table({"query_id": ["w"], "min_x": [0.0], "min_y": [0.0],
                     "max_x": [5_000.0], "max_y": [5_000.0]})
    box_join.box_join_broadcast(_warm, _wq, world=WORLD_2D, depth=depth,
                                max_extent=(100.0, 100.0)).count()
    _wk = synth.knn_queries_table(4)
    _ = knn.knn_brute(
        assign_tiles(synthetic_documents(100_000, variant="flat2d",
                                         with_spans=False,
                                         override_num_blocks=N_BLOCKS),
                     depth, WORLD_2D), _wk)
    driver_tables.documents_with_geometry(sf_dir).count()

    # -- headline 1: corpus generation + tile assignment (ingest) ----------
    def assign_1m():
        ds = synthetic_documents(N_CORPUS, variant="flat2d", with_spans=False,
                                 override_num_blocks=N_BLOCKS)
        ds = assign_tiles(ds, depth, WORLD_2D)
        return ds.count()  # AggregateNumRows: executes the fused map chain

    timed("tile_assign_1m", assign_1m)
    extras["tile_assignments_per_sec"] = round(N_CORPUS / times["tile_assign_1m"], 1)

    # -- headline 2: box spatial join --------------------------------------
    # FUSED streaming pipeline gen -> assign -> join: consecutive map_batches
    # fuse into one task, so corpus blocks never round-trip through the
    # object store (single-node plasma bandwidth was the scaling ceiling
    # when the corpus was materialized first)
    def corpus():
        return assign_tiles(
            synthetic_documents(N_CORPUS, variant="flat2d", with_spans=False,
                                override_num_blocks=N_BLOCKS), depth, WORLD_2D)
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
            corpus(), queries, world=WORLD_2D, depth=depth,
            max_extent=(100.0, 100.0))
        return res.count()

    if "--stats" in sys.argv:
        res = box_join.box_join_broadcast(
            corpus(), queries, world=WORLD_2D, depth=depth,
            max_extent=(100.0, 100.0))
        res.count()
        print(res.stats(), file=sys.stderr)

    n_pairs = timed("box_join_1m", join_1m)
    extras["join_rows"] = int(n_pairs)
    extras["join_rows_per_sec"] = round(n_pairs / times["box_join_1m"], 1)

    # -- headline 2b: adaptive subdivision + salting over a SKEWED corpus
    # with a point-mass landmark (3% of rows on ONE coordinate) so the
    # hot-cell salt path — the case subdivision cannot split — runs
    # end-to-end at bench scale, not just in test_adaptive
    def adaptive_1m():
        from optimizing_ray.stages import adaptive as ad
        ds = synthetic_documents(N_CORPUS, variant="hotspot", with_spans=False,
                                 override_num_blocks=N_BLOCKS)
        keyed, plan = ad.adaptive_assign(
            ds, __import__("optimizing_ray.config", fromlist=["WORLD_3D"]).WORLD_3D,
            capacity=max(1000, N_CORPUS // 100), coarse_depth=3, max_depth=7,
            salt_threshold=max(1000, N_CORPUS // 100), n_salts=8)
        n = keyed.count()
        extras["adaptive_leaves"] = len(plan.leaves)
        extras["adaptive_hot_cells"] = int(len(plan.hot_cells))
        assert extras["adaptive_hot_cells"] > 0, \
            "hotspot corpus must exercise the salt path"
        return n

    if os.environ.get("GRAFT_HEADLINE_ONLY") != "1":
        # excluded from --scaling subprocesses: not part of the efficiency
        # metric, and its driver-coordinated counts pass would share the
        # measurement window with the metric stages
        timed("adaptive_1m", adaptive_1m)

    # -- headline 2c: ingest to the partitioned tile store (disk path) ------
    if os.environ.get("GRAFT_HEADLINE_ONLY") != "1":
        import shutil
        store_dir = "/tmp/graft_bench_store"

        def store_write_1m():
            from optimizing_ray.state import manifest as mf
            shutil.rmtree(store_dir, ignore_errors=True)
            ds = synthetic_documents(N_CORPUS, variant="flat2d", with_spans=False,
                                     override_num_blocks=N_BLOCKS)
            keyed = assign_tiles(ds, 4, WORLD_2D)  # 256 tile groups
            rows = mf.resumable_write(keyed, store_dir)
            return sum(r["rows_out"] for r in rows)

        n_written = timed("store_write_1m", store_write_1m)
        extras["store_rows_written"] = int(n_written)
        extras["store_write_rows_per_sec"] = round(n_written / times["store_write_1m"], 1)
        shutil.rmtree(store_dir, ignore_errors=True)

    # -- headline 2d: actor-held serving index (the frame loop) ------------
    if os.environ.get("GRAFT_HEADLINE_ONLY") != "1":
        from optimizing_ray.state.serving import SpatialIndexService

        def serving_load():
            svc = SpatialIndexService(WORLD_2D, depth, n_actors=8,
                                      max_extent=(100.0, 100.0))
            n = svc.load(corpus())
            return svc, n

        t0s = time.perf_counter()
        svc, n_loaded = serving_load()
        times["serving_load_1m"] = round(time.perf_counter() - t0s, 3)

        qframes = synth.queries_table(16, variant="flat2d")
        svc.query_boxes(qframes)  # warm
        n_frames = 50
        t0s = time.perf_counter()
        hits = 0
        for f in range(n_frames):
            qf = synth.queries_table(16, variant="flat2d", seed=5000 + f)
            hits += svc.query_boxes(qf).num_rows
        dt = time.perf_counter() - t0s
        times["serving_frames"] = round(dt, 3)
        extras["serving_fps"] = round(n_frames / dt, 1)
        extras["serving_hit_rows_per_sec"] = round(hits / dt, 1)

        # compute-dominated serving burst (1024 boxes/frame): the 16-box
        # frame loop above is RPC-floor-bound (~8 ms/frame), so kernel
        # throughput only shows at larger Q (round-3 batched query path)
        qburst = synth.queries_table(1024, variant="flat2d", seed=8000)
        svc.query_boxes(qburst)  # warm
        t0s = time.perf_counter()
        bh = 0
        for _ in range(5):
            bh += svc.query_boxes(qburst).num_rows
        dtb = time.perf_counter() - t0s
        times["serving_burst"] = round(dtb, 3)
        extras["serving_burst_hit_rows_per_sec"] = round(bh / dtb, 1)

        # T4 search cache: a slowly-panning view (0.5/frame < tolerance
        # 1.0) reuses the previous frame's results without re-searching
        import pyarrow.compute as pc
        qc = synth.queries_table(16, variant="flat2d", seed=9000)
        t0s = time.perf_counter()
        for f in range(n_frames):
            qf = qc
            for c in ("min_x", "max_x"):
                qf = qf.set_column(qf.schema.get_field_index(c), c,
                                   pc.add(qf[c], 0.5 * (f % 2)))
            svc.query_boxes(qf, cache_tolerance=1.0)
        dtc = time.perf_counter() - t0s
        extras["serving_fps_cached"] = round(n_frames / dtc, 1)
        svc.shutdown()

    # -- headline 3: kNN ----------------------------------------------------
    kq = synth.knn_queries_table(32)

    def knn_1m():
        return knn.knn_brute(corpus(), kq).num_rows

    timed("knn_1m", knn_1m)

    # -- driver-table queries at sf ----------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    sf_queries = ({} if os.environ.get("GRAFT_HEADLINE_ONLY") == "1"
                  else {**entrymod.queries(),
                        # the 11 round-5-retired twins stay in the perf
                        # sweep (library ops; keeps BENCH_r05 comparable
                        # to BENCH_r04 query-for-query)
                        **entrymod.retired_queries()})
    for name, q in sf_queries.items():
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


def _aggregate_probe(n_procs: int = 8, window_s: float = 2.0) -> float:
    """Aggregate streaming GB/s over n_procs concurrent processes:
    each child allocates its buffer, sleeps until a shared start time
    (setup excluded), then streams for window_s and reports bytes
    moved; the parent sums rates over the common window."""
    import subprocess as _sp
    start_at = time.time() + 4.0
    code = (f"import numpy,time;a=numpy.random.rand(12_500_000);"
            f"time.sleep(max(0, {start_at!r}-time.time()));"
            f"t0=time.time();b=0\n"
            f"while time.time()-t0 < {window_s!r}: s=a.sum(); b+=a.nbytes\n"
            f"print(b/1e9/(time.time()-t0))")
    procs = [_sp.Popen([sys.executable, "-c", code], stdout=_sp.PIPE,
                       text=True) for _ in range(n_procs)]
    per = [float(p.communicate()[0].strip()) for p in procs]
    return round(sum(per), 2)


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        # larger corpus for the scaling runs so compute dominates the
        # fixed per-pipeline overhead (sub-second jobs measure startup,
        # not scaling)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_HEADLINE_ONLY="1",
                   GRAFT_BENCH_N=os.environ.get("GRAFT_SCALING_N", "16000000"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    # why 2 vs 8 and not 8 vs 32: this VM's DRAM bandwidth saturates at
    # ~8-16 concurrent numpy streams (measured: aggregate streaming
    # throughput rises only 1.6x from 8 to 32 processes, framework-
    # independent).  The engine's kernels are vectorized to the point of
    # being memory-bound, so the honest same-machine scaling window is
    # below saturation; on a real multi-node cluster each node brings its
    # own memory bus and the N->4N criterion applies per-node.
    # best-of-N per level with INTERLEAVED reps (lo,hi,lo,hi,...): the VM's
    # noise arrives in multi-minute episodes, and interleaving exposes both
    # levels to the same episodes instead of biasing whichever phase ran
    # during one
    import numpy as _np
    _pb = _np.random.rand(25_000_000)
    _t0 = time.time()
    _s = 0.0
    for _ in range(5):
        _s += _pb.sum()
    probe = round(5 * _pb.nbytes / 1e9 / (time.time() - _t0), 2)
    del _pb

    # AGGREGATE probe: 8 concurrent streams.  A neighbor consuming ~10%
    # of aggregate bandwidth is invisible to the single-stream probe but
    # taxes the 8-CPU leg directly (round-4 diagnosis: lo leg at its
    # historical best while hi ran 12% slow).  Compare against the
    # machine's own idle aggregate (~15-20 GB/s) before trusting eff.
    agg_probe = _aggregate_probe()

    reps = 3
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(one(lo))
        runs_hi.append(one(hi))

    # headline throughput = corpus rows / (assign + join + knn seconds).
    # best run = min of PER-RUN core totals (not per-query minima across
    # runs, which would compose a best-case time no single run achieved)
    core = ["tile_assign_1m", "box_join_1m", "knn_1m"]

    def best(runs):
        return min(runs, key=lambda r: sum(r["queries"][k] for k in core))

    r_lo, r_hi = best(runs_lo), best(runs_hi)
    t_lo = sum(r_lo["queries"][k] for k in core)
    t_hi = sum(r_hi["queries"][k] for k in core)
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": round(t_lo, 3), "sec_hi": round(t_hi, 3),
        "corpus_rows": r_lo["corpus_rows"],
        "rows_per_sec_lo": round(r_lo["corpus_rows"] / t_lo, 1),
        "rows_per_sec_hi": round(r_hi["corpus_rows"] / t_hi, 1),
        "dram_probe_gbs": probe,
        "aggregate_probe_gbs": agg_probe,
        "detail_lo": r_lo["queries"], "detail_hi": r_hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

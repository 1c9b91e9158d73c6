"""Checkpoint manifest + resumable per-tile-group writes.

The reference has no persistence; its closest analogue is the idempotent
``Partition::load_data`` (skips work already done,
``WorldPartition.hpp:78-88``).  The engine turns that idea into the batch
contract required by the north rule: output is laid out as one directory
per tile group (coarse cell), each written ATOMICALLY — the group task
writes ``data.parquet`` + a ``_done.json`` lineage record into a temp dir
and renames it into place.  Completion is therefore recorded by the
WORKER at the moment the group finishes, so a crash mid-run loses only
in-flight groups and resume restarts from the last completed tile group
(not from zero).  ``manifest.jsonl`` is the driver-side compaction of the
per-part lineage records ``{cell_key, rows_out, wall_s, part_path}``.

Scale notes: the group writer runs distributed (``groupby(key).map_groups``
over Arrow tables — one task per tile group); only tiny lineage rows come
back to the driver.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

__all__ = ["resumable_write", "read_manifest", "completed_keys",
           "read_output", "compact_store"]

MANIFEST = "manifest.jsonl"
DONE = "_done.json"


def _scan_parts(out_dir: str) -> list[dict]:
    """Lineage records of every atomically-completed tile group on disk.
    A compacted part's ``_done.json`` holds a LIST of records (one per
    member cell, sharing the merged part_path)."""
    rows = []
    for done in glob.glob(os.path.join(out_dir, "part=*", DONE)):
        with open(done) as f:
            rec = json.load(f)
        rows.extend(rec if isinstance(rec, list) else [rec])
    return rows


def read_manifest(out_dir: str) -> list[dict]:
    """Manifest = compacted jsonl if present, unioned with any completed
    part dirs not yet compacted (crash between part rename and compaction)."""
    rows: dict[int, dict] = {}
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    r = json.loads(line)
                    rows[r["cell_key"]] = r
    for r in _scan_parts(out_dir):
        rows.setdefault(r["cell_key"], r)
    return sorted(rows.values(), key=lambda r: r["cell_key"])


def completed_keys(out_dir: str) -> set[int]:
    return {r["cell_key"] for r in read_manifest(out_dir) if r.get("status") == "done"}


def _write_compacted(out_dir: str) -> list[dict]:
    rows = read_manifest(out_dir)
    tmp = os.path.join(out_dir, f".{MANIFEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(out_dir, MANIFEST))
    return rows


def resumable_write(ds: rd.Dataset, out_dir: str, *, key_col: str = "cell_key",
                    fault_hook=None) -> list[dict]:
    """Write `ds` partitioned by `key_col`, skipping already-completed tile
    groups.  Returns the lineage rows newly written by THIS run.

    ``fault_hook(key)`` is a test seam: called before each group write;
    raising aborts that group (simulating a mid-run crash) without marking
    it done.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_keys(out_dir)
    # temp dirs carry THIS run's id so the finally-cleanup below cannot
    # clobber the in-flight temps of a concurrent writer targeting the
    # same directory (their renames still decide atomically)
    run_id = uuid.uuid4().hex[:8]

    if done:
        done_list = sorted(done)

        def drop_done(t: pa.Table) -> pa.Table:
            import numpy as np
            keys = t[key_col].to_numpy()
            return t.filter(pa.array(~np.isin(keys, done_list)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow", zero_copy_batch=True)

    def write_group(t: pa.Table) -> pa.Table:
        key = int(t[key_col][0].as_py())
        if fault_hook is not None:
            fault_hook(key)
        t0 = time.perf_counter()
        part_dir = os.path.join(out_dir, f"part={key}")
        tmp_dir = os.path.join(out_dir, f".tmp-{run_id}-{key}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(t, os.path.join(tmp_dir, "data.parquet"))
        record = {"cell_key": key, "rows_out": t.num_rows,
                  "wall_s": round(time.perf_counter() - t0, 4),
                  "part_path": part_dir, "status": "done"}
        with open(os.path.join(tmp_dir, DONE), "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        if os.path.exists(part_dir):  # idempotent re-run: replace atomically
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)  # the commit point
        return pa.table({"cell_key": pa.array([key], pa.int64()),
                         "rows_out": pa.array([t.num_rows], pa.int64())})

    new_rows: list[dict] = []
    try:
        result = ds.groupby(key_col).map_groups(write_group, batch_format="pyarrow")
        for row in result.iter_rows():
            new_rows.append(row)
    finally:
        # compact whatever actually committed (even on crash) + clean temps
        # (only THIS run's — scoped by run_id).  Foreign .tmp-* dirs are
        # swept only once STALE (mtime > 1 h): a SIGKILLed run never
        # reaches this finally, so without the aged sweep its orphans
        # would leak forever — while a CONCURRENT writer's in-flight
        # temps (minutes old at most) stay untouched.
        for tmp in glob.glob(os.path.join(out_dir, f".tmp-{run_id}-*")):
            shutil.rmtree(tmp, ignore_errors=True)
        cutoff = time.time() - 3600.0
        for tmp in glob.glob(os.path.join(out_dir, ".tmp-*")):
            try:
                # staleness = newest mtime of the dir OR anything inside
                # it: a live writer streaming into data.parquet for >1 h
                # keeps the FILE mtime fresh even though the dir's is old
                newest = max([os.path.getmtime(tmp)]
                             + [e.stat().st_mtime for e in os.scandir(tmp)])
                if newest < cutoff:
                    shutil.rmtree(tmp, ignore_errors=True)
            except OSError:
                pass  # raced with another cleaner
        _write_compacted(out_dir)
    newly = {r["cell_key"] for r in new_rows}
    return [r for r in read_manifest(out_dir) if r["cell_key"] in newly]


def read_output(out_dir: str) -> rd.Dataset:
    """Read back every COMPLETED tile group (manifest-driven, so partially
    written / orphaned temp dirs are never picked up).  Compacted parts
    are read ONCE even though several cells share their path."""
    parts = sorted({os.path.join(r["part_path"], "data.parquet")
                    for r in read_manifest(out_dir)
                    if r.get("status") == "done"})
    return rd.read_parquet(parts)


def compact_store(out_dir: str, *, small_rows: int, target_rows: int,
                  parallel: bool = True) -> dict:
    """Merge runs of Morton-ADJACENT small tile groups into one part —
    the small-files maintenance pass (at 100 TB a store accumulates
    millions of sub-block parts whose open/footer cost dominates reads).

    Greedy over the manifest in cell_key order (Morton order = spatial
    locality, so merged parts stay pruning-friendly): consecutive groups
    with fewer than ``small_rows`` rows pack together until
    ``target_rows``.  Each merged part is written atomically
    (tmp + rename) with a LIST-form ``_done.json`` carrying one lineage
    record per member cell (rows_out preserved, part_path shared); the
    compacted manifest is rewritten BEFORE the stale source dirs are
    deleted, so every crash window leaves a readable store:
    pre-rename -> sources win; post-rename pre-manifest -> sources still
    authoritative (the merged dir is an ignorable orphan until its cells
    enter the manifest); post-manifest -> merged part wins and stale
    source dirs are swept here or by the next compaction.

    Rows keep their cell_key column, so pruned reads over merged parts
    stay correct (the join's cell gather filters rows, not just parts).
    Returns {"parts_before", "parts_after", "groups_merged"}.
    """
    import ray as _ray

    rows = [r for r in read_manifest(out_dir) if r.get("status") == "done"]
    rows.sort(key=lambda r: r["cell_key"])
    # unit = one PHYSICAL part (an earlier compaction may have several
    # records sharing a path — re-compaction must read that file once)
    units: list[dict] = []
    seen: dict[str, dict] = {}
    for r in rows:
        u = seen.get(r["part_path"])
        if u is None:
            u = {"path": r["part_path"], "recs": [], "rows": 0}
            seen[r["part_path"]] = u
            units.append(u)
        u["recs"].append(r)
        u["rows"] += r["rows_out"]
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_rows = 0
    for u in units:
        if u["rows"] < small_rows and cur_rows + u["rows"] <= target_rows:
            cur.append(u)
            cur_rows += u["rows"]
        else:
            if len(cur) > 1:
                groups.append(cur)
            cur, cur_rows = ([u], u["rows"]) if u["rows"] < small_rows \
                else ([], 0)
    if len(cur) > 1:
        groups.append(cur)
    parts_before = len(units)

    def merge_group(group_units: list[dict]) -> list[dict]:
        members = [r for u in group_units for r in u["recs"]]
        tabs = [pq.read_table(os.path.join(u["path"], "data.parquet"))
                for u in group_units]
        merged = pa.concat_tables(tabs)
        k0, k1 = members[0]["cell_key"], members[-1]["cell_key"]
        part_dir = os.path.join(out_dir, f"part={k0}-{k1}")
        tmp_dir = os.path.join(out_dir, f".tmp-cmp-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(merged, os.path.join(tmp_dir, "data.parquet"))
        recs = [{**m, "part_path": part_dir, "compacted": True}
                for m in members]
        with open(os.path.join(tmp_dir, DONE), "w") as f:
            json.dump(recs, f)
            f.flush()
            os.fsync(f.fileno())
        if os.path.exists(part_dir):
            shutil.rmtree(part_dir)
        os.rename(tmp_dir, part_dir)  # commit point for the merged part
        return recs

    if parallel and groups:
        merge_remote = _ray.remote(merge_group)
        all_recs = _ray.get([merge_remote.remote(g) for g in groups])
    else:
        all_recs = [merge_group(g) for g in groups]

    # manifest first (atomic rename), THEN sweep the stale source dirs
    by_key = {r["cell_key"]: r for r in read_manifest(out_dir)}
    stale: set[str] = set()
    for group_units, recs in zip(groups, all_recs):
        for rec in recs:
            by_key[rec["cell_key"]] = rec
        stale.update(u["path"] for u in group_units)
    tmp = os.path.join(out_dir, f".{MANIFEST}.{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        for r in sorted(by_key.values(), key=lambda r: r["cell_key"]):
            f.write(json.dumps(r) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(out_dir, MANIFEST))
    live = {r["part_path"] for r in by_key.values()}
    for p in stale - live:
        shutil.rmtree(p, ignore_errors=True)
    parts_after = len({r["part_path"] for r in by_key.values()
                       if r.get("status") == "done"})
    return {"parts_before": parts_before, "parts_after": parts_after,
            "groups_merged": len(groups)}

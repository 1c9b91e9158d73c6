"""Checkpoint/resume: kill after K tile groups, resume, verify identical
final output (SURVEY.md §5 resume test)."""

import os

import numpy as np
import pandas as pd
import pytest

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.stages.assign import assign_tiles
from optimizing_ray.state import manifest


def make_ds(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(2000), variant="flat2d", with_spans=False)
    return assign_tiles(rd.from_arrow(t), 2, WORLD_2D)


def collect(out_dir):
    df = manifest.read_output(out_dir).to_pandas()
    return df.sort_values(["doc_id"]).reset_index(drop=True)


def test_full_write_and_readback(ray_session, tmp_path):
    ds = make_ds(ray_session)
    rows = manifest.resumable_write(ds, str(tmp_path / "out"))
    assert sum(r["rows_out"] for r in rows) == 2000
    df = collect(str(tmp_path / "out"))
    assert len(df) == 2000
    assert set(rows[0]) >= {"cell_key", "rows_out", "wall_s", "part_path", "status"}


def test_crash_then_resume_identical(ray_session, tmp_path):
    out_run = str(tmp_path / "resumed")
    out_ref = str(tmp_path / "clean")

    ds = make_ds(ray_session)
    manifest.resumable_write(ds, out_ref)
    all_keys = sorted(manifest.completed_keys(out_ref))
    assert len(all_keys) >= 8
    kill_keys = set(all_keys[len(all_keys) // 2:])

    def fault(key):
        if key in kill_keys:
            raise RuntimeError(f"injected crash at {key}")

    with pytest.raises(Exception):
        manifest.resumable_write(make_ds(ray_session), out_run, fault_hook=fault)
    # groups that committed before the crash are durable; none of the
    # killed groups can be marked done
    done_before = manifest.completed_keys(out_run)
    assert done_before.isdisjoint(kill_keys)
    assert done_before <= set(all_keys)

    rows2 = manifest.resumable_write(make_ds(ray_session), out_run)
    # the resume run wrote exactly the pending groups
    assert {r["cell_key"] for r in rows2} == set(all_keys) - done_before
    assert manifest.completed_keys(out_run) == set(all_keys)
    pd.testing.assert_frame_equal(collect(out_run), collect(out_ref))


def test_resume_skips_completed(ray_session, tmp_path):
    out = str(tmp_path / "out")
    ds = make_ds(ray_session)
    rows1 = manifest.resumable_write(ds, out)
    # second run: nothing pending -> zero new groups, output unchanged
    rows2 = manifest.resumable_write(make_ds(ray_session), out)
    assert rows2 == []
    df = collect(out)
    assert len(df) == 2000
    assert len(manifest.read_manifest(out)) == len(rows1)


def test_spans_survive_store_roundtrip(ray_session, tmp_path):
    """Span-sequence invariant across the persistence boundary: write the
    interleaved corpus to tile groups, read it back, every spans list is
    identical and in order."""
    import ray.data as rd
    t = synth.documents_batch(np.arange(800), variant="flat2d", with_spans=True)
    keyed = assign_tiles(rd.from_arrow(t), 3, WORLD_2D)
    store = str(tmp_path / "spans_store")
    manifest.resumable_write(keyed, store)
    back = manifest.read_output(store).to_pandas().set_index("doc_id")
    want = {d: s for d, s in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist())}
    assert len(back) == 800
    for doc_id, row in back.iterrows():
        spans = row["spans"]
        spans = spans.tolist() if hasattr(spans, "tolist") else spans
        got = [tuple(sorted(s.items())) for s in spans]
        assert got == [tuple(sorted(s.items())) for s in want[doc_id]], doc_id


def test_stale_foreign_tmp_swept_fresh_kept(ray_session, tmp_path):
    """Orphaned .tmp-* dirs from a SIGKILLed run (old mtime) are swept by
    the next run; a CONCURRENT writer's fresh temps are untouched."""
    import os
    import time

    out = str(tmp_path / "out")
    os.makedirs(out)
    stale = os.path.join(out, ".tmp-deadbeef-5-aaaaaaaa")
    fresh = os.path.join(out, ".tmp-cafecafe-7-bbbbbbbb")
    live = os.path.join(out, ".tmp-beefbeef-9-cccccccc")
    for d in (stale, fresh, live):
        os.makedirs(d)
        with open(os.path.join(d, "data.parquet"), "w") as f:
            f.write("x")
    old = time.time() - 7200
    os.utime(stale, (old, old))
    os.utime(os.path.join(stale, "data.parquet"), (old, old))
    # `live` simulates a >1h write still streaming: dir mtime old, FILE
    # mtime fresh — must NOT be swept
    os.utime(live, (old, old))

    manifest.resumable_write(make_ds(ray_session), out)
    assert not os.path.exists(stale), "stale orphan should be swept"
    assert os.path.exists(fresh), "fresh foreign temp must survive"
    assert os.path.exists(live), "in-flight long write must survive"


def _store_rows(out_dir):
    import pandas as pd
    df = manifest.read_output(out_dir).to_pandas()
    # the hive `part` column comes from the DIRECTORY name, which
    # compaction legitimately renames — compare table content only
    df = df.drop(columns=[c for c in ("part",) if c in df.columns])
    return df.sort_values(["cell_key", "doc_id"]).reset_index(drop=True)


def test_compact_store_preserves_rows_and_lineage(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.stages.assign import assign_tiles
    from optimizing_ray import synth

    out = str(tmp_path / "store")
    corpus = synth.documents_batch(np.arange(3000), variant="flat2d",
                                   with_spans=False)
    keyed = assign_tiles(rd.from_arrow(corpus).repartition(4), 4, WORLD_2D)
    manifest.resumable_write(keyed, out)
    before = _store_rows(out)
    n_keys_before = len(manifest.completed_keys(out))

    stats = manifest.compact_store(out, small_rows=40, target_rows=400)
    assert stats["groups_merged"] > 0
    assert stats["parts_after"] < stats["parts_before"]
    after = _store_rows(out)
    assert before.equals(after)  # byte-identical content
    # lineage: every cell still has its record, rows_out preserved
    assert len(manifest.completed_keys(out)) == n_keys_before
    recs = {r["cell_key"]: r for r in manifest.read_manifest(out)}
    cnt = before.groupby("cell_key").size()
    for k, n in cnt.items():
        assert recs[int(k)]["rows_out"] == int(n)
    # resume: a rerun writes nothing (completed keys intact)
    rows = manifest.resumable_write(keyed, out)
    assert rows == []
    assert _store_rows(out).equals(before)


def test_compact_store_pruned_read_and_recompaction(ray_session, tmp_path):
    import numpy as np
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.pipelines import tile_store
    from optimizing_ray.stages.assign import assign_tiles
    from optimizing_ray import synth

    out = str(tmp_path / "store")
    corpus = synth.documents_batch(np.arange(2000), variant="flat2d",
                                   with_spans=False)
    keyed = assign_tiles(rd.from_arrow(corpus).repartition(4), 4, WORLD_2D)
    manifest.resumable_write(keyed, out)
    all_keys = sorted(manifest.completed_keys(out))
    want_keys = np.asarray(all_keys[:5], dtype=np.int64)
    ds0, _, _ = tile_store.pruned_read(out, want_keys)
    want = set(ds0.to_pandas()["doc_id"])

    manifest.compact_store(out, small_rows=30, target_rows=300)
    ds1, n_read, n_total = tile_store.pruned_read(out, want_keys)
    got = ds1.to_pandas()
    # a merged part may carry extra cells' rows; the WANTED rows must all
    # be present and cell-filterable
    got_w = got[got["cell_key"].isin(want_keys)]
    assert set(got_w["doc_id"]) == want
    assert n_read <= n_total
    # second compaction over already-merged parts must not duplicate rows
    manifest.compact_store(out, small_rows=10_000, target_rows=100_000)
    assert len(_store_rows(out)) == 2000


def test_compact_store_crash_window_reads_stay_consistent(ray_session,
                                                          tmp_path):
    """Crash AFTER the merged part's rename but BEFORE the manifest
    rewrite: the old manifest + old part dirs stay authoritative, the
    orphan merged dir is ignored, and no row is duplicated or lost."""
    import shutil

    import numpy as np
    import ray.data as rd
    from optimizing_ray.config import WORLD_2D
    from optimizing_ray.stages.assign import assign_tiles
    from optimizing_ray import synth

    src = str(tmp_path / "src")
    corpus = synth.documents_batch(np.arange(1500), variant="flat2d",
                                   with_spans=False)
    keyed = assign_tiles(rd.from_arrow(corpus).repartition(3), 4, WORLD_2D)
    manifest.resumable_write(keyed, src)
    before = _store_rows(src)

    # reconstruct the crash state: pre-compaction snapshot + the merged
    # dirs from a completed compaction, but the OLD manifest
    crash = str(tmp_path / "crash")
    shutil.copytree(src, crash)

    def repoint(root):
        # part_path is recorded absolute at write time; a real crash is
        # in-place (same dir), so the copied simulation must repoint
        import json as _json
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                if fn in (manifest.DONE, manifest.MANIFEST):
                    fp = os.path.join(dirpath, fn)
                    txt = open(fp).read().replace(src, root)
                    open(fp, "w").write(txt)

    repoint(crash)
    manifest.compact_store(src, small_rows=30, target_rows=300)
    merged_dirs = [d for d in os.listdir(src)
                   if d.startswith("part=") and "-" in d]
    assert merged_dirs
    for d in merged_dirs:
        # fix part_path inside the copied _done.json records to point at
        # the crash dir (as the in-flight compaction there would have)
        shutil.copytree(os.path.join(src, d), os.path.join(crash, d))
        done = os.path.join(crash, d, manifest.DONE)
        import json as _json
        recs = _json.load(open(done))
        for r in recs:
            r["part_path"] = os.path.join(crash, d)
        _json.dump(recs, open(done, "w"))

    after = _store_rows(crash)
    assert before.drop(columns=["part"], errors="ignore").equals(
        after.drop(columns=["part"], errors="ignore"))
    # and a LATER compaction on the crash store still works + no dups
    manifest.compact_store(crash, small_rows=30, target_rows=300)
    assert len(_store_rows(crash)) == 1500

"""Checkpoint/resume: kill after K tile groups, resume, verify identical
final output (SURVEY.md §5 resume test)."""

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

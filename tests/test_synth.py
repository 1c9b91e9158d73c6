"""Determinism and schema of the synthetic fixtures."""

import numpy as np
import pyarrow as pa

from optimizing_ray import synth


def test_batch_boundary_invariance():
    """Values derive from global row index only — splitting into batches
    must not change anything (retry/parallelism invariance)."""
    whole = synth.documents_batch(np.arange(100), variant="flat2d")
    parts = pa.concat_tables([
        synth.documents_batch(np.arange(0, 37), variant="flat2d"),
        synth.documents_batch(np.arange(37, 71), variant="flat2d"),
        synth.documents_batch(np.arange(71, 100), variant="flat2d"),
    ])
    assert whole.equals(parts)


def test_spans_schema_and_invariants():
    t = synth.documents_batch(np.arange(200), variant="uniform")
    assert t.schema.field("spans").type == synth.SPAN_TYPE
    for row in t.to_pylist():
        spans = row["spans"]
        assert 1 <= len(spans) <= 8
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)  # strictly increasing
        for j, s in enumerate(spans):
            if s["kind"] == "text":
                assert s["text"] and s["media_ref"] == ""
            else:
                assert s["media_ref"].startswith(f"media://{row['doc_id']}/")
                assert s["text"] == ""


def test_positions_inside_world():
    t = synth.documents_batch(np.arange(500), variant="flat2d")
    x = t["x"].to_numpy()
    assert (x >= 0).all() and (x < 100_000).all()
    assert (t["y"].to_numpy() >= 0).all()
    np.testing.assert_array_equal(t["z"].to_numpy(), 0.0)


def test_skewed_variant_has_hot_cell():
    t = synth.documents_batch(np.arange(4000), variant="skewed", with_spans=False)
    from optimizing_ray import cells
    from optimizing_ray.config import WORLD_3D
    keys = cells.point_cell2(t["x"].to_numpy(), t["y"].to_numpy(), WORLD_3D, 3)
    _, counts = np.unique(keys, return_counts=True)
    # sigma = 1 cell width: hottest cell must be far above the uniform
    # expectation (4000 / 64 cells = 62.5) — exercises subdivision + salting
    assert counts.max() > 4 * (len(t) / 64)


def test_polygons_are_valid_closed_convex_rings():
    t = synth.polygons_table(10)
    for row in t.to_pylist():
        ring = row["ring"]
        assert 4 <= len(ring) <= 12
        xs = np.asarray([v["x"] for v in ring])
        ys = np.asarray([v["y"] for v in ring])
        # convexity: all cross products of consecutive edges share a sign
        x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
        x3, y3 = np.roll(xs, -2), np.roll(ys, -2)
        cross = (x2 - xs) * (y3 - y2) - (y2 - ys) * (x3 - x2)
        assert (cross >= -1e-9).all() or (cross <= 1e-9).all()


def test_raster_table_shape():
    t = synth.raster_table(32, 16)
    assert t.num_rows == 512
    assert t["pixel_id"].to_numpy().max() == 511


# --- driver-table span derivation + fingerprint (SQL-twinned) -------------

def test_driver_spans_fingerprint_matches_slow_reference():
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    batch = pa.table({"doc_id": pa.array(np.arange(200, dtype=np.int64))})
    t = dt.derive_spans_batch(batch)
    rows = t["spans"].to_pylist()
    M64 = 1 << 64

    def ref_fp(span_list):
        fp = 0
        for sp in span_list:
            s = (sp["kind"] + "\x1f" + sp["text"] + "\x1f"
                 + sp["media_ref"]).encode()
            h = 0
            for b in s:
                h = (h * 1000003 + b) % M64
            h = (h * 1000003 + sp["offset"]) % M64
            fp = (fp * 1099511628211 + h) % M64
        return fp - M64 if fp >= 1 << 63 else fp

    expect = np.array([ref_fp(r) for r in rows], dtype=np.int64)
    got = dt.span_fingerprint_batch(t)["span_fp"].to_numpy()
    assert np.array_equal(got, expect)
    # invariants: 1-8 spans, strictly increasing offsets, interleaved kinds
    for r in rows:
        assert 1 <= len(r) <= 8
        offs = [s["offset"] for s in r]
        assert offs == sorted(set(offs))
    kinds = {s["kind"] for r in rows for s in r}
    assert kinds == {"text", "image", "audio"}


def test_driver_spans_fingerprint_order_sensitive():
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    t = dt.derive_spans_batch(
        pa.table({"doc_id": pa.array(np.arange(64, dtype=np.int64))}))
    base = dt.span_fingerprint_batch(t)["span_fp"].to_numpy()
    # reverse each doc's span order -> fingerprint must change for any
    # doc with >= 2 distinct spans
    rows = t["spans"].to_pylist()
    rev = pa.array([list(reversed(r)) for r in rows],
                   t.schema.field("spans").type)
    t2 = t.drop_columns(["spans"]).append_column("spans", rev)
    flipped = dt.span_fingerprint_batch(t2)["span_fp"].to_numpy()
    multi = np.array([len(r) >= 2 and r[0] != r[-1] for r in rows])
    assert (base[multi] != flipped[multi]).all()
    assert (base[~multi] == flipped[~multi]).all()


def test_driver_spans_empty_block_guards():
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    empty = pa.table({})
    assert dt.derive_spans_batch(empty).num_rows == 0
    assert dt.span_fingerprint_batch(empty).column_names == ["span_fp"]


def test_span_fingerprint_handles_empty_span_lists():
    """Empty span lists (any position, incl. TRAILING) fingerprint to 0 —
    the scatter-add path must not crash or corrupt neighbors."""
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    span_t = dt._SPAN_LIST_TYPE
    spans = pa.array([
        [],  # leading empty
        [{"kind": "text", "text": "a b", "media_ref": "", "offset": 0}],
        [],  # middle empty
        [{"kind": "image", "text": "", "media_ref": "media://x/0",
          "offset": 3}],
        [],  # trailing empty
    ], span_t)
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "spans": spans})
    fp = dt.span_fingerprint_batch(t)["span_fp"].to_numpy()
    assert fp[0] == fp[2] == fp[4] == 0
    assert fp[1] != 0 and fp[3] != 0 and fp[1] != fp[3]
    # neighbor integrity: same non-empty rows alone give the same hashes
    t2 = pa.table({"doc_id": pa.array([1, 3], pa.int64()),
                   "spans": pa.array([spans[1].as_py(), spans[3].as_py()],
                                     span_t)})
    fp2 = dt.span_fingerprint_batch(t2)["span_fp"].to_numpy()
    assert fp2[0] == fp[1] and fp2[1] == fp[3]


def test_span_fingerprint_slice_invariant():
    """Zero-copy buffer math in the fold must respect Arrow slice offsets:
    fingerprints of a sliced batch equal the corresponding rows of the
    full batch (sliced ListArrays carry non-zero offsets)."""
    import pyarrow as pa
    from optimizing_ray.sources import driver_tables as dt

    t = dt.derive_spans_batch(
        pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64))}))
    full = dt.span_fingerprint_batch(t)["span_fp"].to_numpy()
    for lo, hi in ((0, 100), (37, 251), (200, 300)):
        sl = dt.span_fingerprint_batch(t.slice(lo, hi - lo))
        assert np.array_equal(sl["span_fp"].to_numpy(), full[lo:hi])

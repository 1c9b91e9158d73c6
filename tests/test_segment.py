"""Segment -> tile supercover: geometric soundness + batch invariance."""

import numpy as np
import pyarrow as pa

from optimizing_ray.config import WORLD_2D
from optimizing_ray.stages import assign


def _emit(t, depth=4):
    out = assign.segment_cover_batch(t, depth, WORLD_2D)
    return set(zip(out["doc_id"].to_numpy(), out["cell_ix"].to_numpy(),
                   out["cell_iy"].to_numpy()))


def test_segment_cover_contains_sampled_path():
    """Every cell visited by dense sampling along the segment is in the
    cover (cells strictly crossed can never be missed)."""
    rng = np.random.default_rng(5)
    n = 200
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "x": pa.array(rng.uniform(0, 99_999, n)),
                  "y": pa.array(rng.uniform(0, 99_999, n)),
                  "x1": pa.array(rng.uniform(0, 99_999, n)),
                  "y1": pa.array(rng.uniform(0, 99_999, n))})
    got = _emit(t)
    depth, g = 4, 16
    cw = 100_000.0 / g
    x0, y0 = t["x"].to_numpy(), t["y"].to_numpy()
    x1, y1 = t["x1"].to_numpy(), t["y1"].to_numpy()
    ts = np.linspace(0, 1, 4000)
    for i in range(n):
        sx = x0[i] + (x1[i] - x0[i]) * ts
        sy = y0[i] + (y1[i] - y0[i]) * ts
        ix = np.clip((sx / cw).astype(np.int64), 0, g - 1)
        iy = np.clip((sy / cw).astype(np.int64), 0, g - 1)
        sampled = set(zip(ix.tolist(), iy.tolist()))
        emitted = {(a, b) for d, a, b in got if d == i}
        assert sampled <= emitted, f"seg {i} missing {sampled - emitted}"
        # no overshoot: every emitted cell's box is within one cell of
        # the segment's bbox corridor
        for (a, b) in emitted:
            assert min(x0[i], x1[i]) - cw <= (a + 1) * cw
            assert max(x0[i], x1[i]) + cw >= a * cw
            assert min(y0[i], y1[i]) - cw <= (b + 1) * cw
            assert max(y0[i], y1[i]) + cw >= b * cw


def test_segment_cover_degenerate_cases():
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  # vertical, horizontal, and zero-length segments
                  "x": pa.array([5_000.0, 1_000.0, 70_000.0]),
                  "y": pa.array([1_000.0, 5_000.0, 70_000.0]),
                  "x1": pa.array([5_000.0, 20_000.0, 70_000.0]),
                  "y1": pa.array([20_000.0, 5_000.0, 70_000.0])})
    got = _emit(t)
    # vertical: one column, rows 0..3 (y 1000..20000, cell 6250)
    assert {(0, 0, j) for j in range(4)} <= got
    assert all(a == 0 for d, a, b in got if d == 0)
    # horizontal: one row
    assert {(1, j, 0) for j in range(4)} <= got
    # zero-length: exactly its own cell
    assert {(d, a, b) for d, a, b in got if d == 2} == {(2, 11, 11)}


def test_segment_cover_empty_and_missing_schema():
    out = assign.segment_cover_batch(pa.table({}), 4, WORLD_2D)
    assert out.num_rows == 0 and out.column_names == ["doc_id", "cell_ix",
                                                      "cell_iy"]

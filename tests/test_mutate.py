"""Delete / relocate invariants (D1-D3 semantics)."""

import numpy as np
import pyarrow as pa

from optimizing_ray import synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import box_join, mutate
from optimizing_ray.stages.assign import assign_tiles


def _corpus():
    return synth.documents_batch(np.arange(3000), variant="flat2d", with_spans=False)


def test_delete_then_query_returns_nothing(ray_session):
    import ray.data as rd
    corpus = _corpus()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    tomb = ids[::97]
    docs = mutate.delete_docs(rd.from_arrow(corpus), tomb)
    assert docs.count() == 3000 - len(tomb)
    queries = pa.table({"query_id": ["q"], "min_x": [0.0], "min_y": [0.0],
                        "max_x": [100_000.0], "max_y": [100_000.0]})
    res = box_join.box_join_broadcast(docs, queries, world=WORLD_2D, depth=3,
                                      max_extent=(100.0, 100.0)).to_pandas()
    assert set(res["doc_id"]).isdisjoint(set(tomb))
    assert len(res) == 3000 - len(tomb)


def test_relocate_conserves_rows_and_rekeys(ray_session):
    import ray.data as rd
    corpus = _corpus()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    move_ids = ids[::101]
    moves = pa.table({
        "doc_id": pa.array(move_ids),
        "new_x": pa.array(np.full(len(move_ids), 12.5)),
        "new_y": pa.array(np.full(len(move_ids), 12.5)),
    })
    out = mutate.relocate_docs(rd.from_arrow(corpus), moves,
                               world=WORLD_2D, depth=4).to_pandas()
    assert len(out) == 3000  # row count conserved
    moved = out[out.doc_id.isin(move_ids)]
    assert (moved["x"] == 12.5).all() and (moved["y"] == 12.5).all()
    # all moved rows land in the corner cell
    from optimizing_ray import cells
    corner = int(cells.point_cell2(np.asarray([12.5]), np.asarray([12.5]), WORLD_2D, 4)[0])
    assert (moved["cell_key"] == corner).all()
    untouched = out[~out.doc_id.isin(move_ids)]
    assert (untouched["cell_key"] == untouched["old_cell_key"]).all()


def test_relocate_changed_only_shuffles_minimum(ray_session):
    import ray.data as rd
    corpus = _corpus()
    ids = np.asarray(corpus["doc_id"].to_pylist())
    move_ids = ids[:50]
    moves = pa.table({
        "doc_id": pa.array(move_ids),
        "new_x": pa.array(np.full(50, 99_999.0)),
        "new_y": pa.array(np.full(50, 99_999.0)),
    })
    out = mutate.relocate_docs(rd.from_arrow(corpus), moves, world=WORLD_2D,
                               depth=4, changed_only=True).to_pandas()
    # only moved rows whose key actually changed appear
    assert set(out["doc_id"]) <= set(move_ids)
    assert (out["cell_key"] != out["old_cell_key"]).all()

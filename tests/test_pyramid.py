"""Tile pyramid vs. per-depth brute recount."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from optimizing_ray import cells, synth
from optimizing_ray.config import WORLD_2D
from optimizing_ray.pipelines import pyramid


@pytest.fixture(scope="module")
def corpus():
    return synth.documents_batch(np.arange(4000), variant="flat2d",
                                 with_spans=False)


def _brute(t, max_depth, min_depth=0):
    x, y = t["x"].to_numpy(), t["y"].to_numpy()
    parts = []
    for d in range(min_depth, max_depth + 1):
        uk, c = np.unique(cells.point_cell2(x, y, WORLD_2D, d),
                          return_counts=True)
        parts.append(pd.DataFrame({"depth": d, "cell_key": uk.astype(np.int64),
                                   "n_docs": c.astype(np.int64)}))
    return (pd.concat(parts).sort_values(["depth", "cell_key"])
            .reset_index(drop=True))


def test_pyramid_matches_per_depth_recount(ray_session, corpus):
    """Shift-derived coarser levels == independent per-depth
    quantization (floor composition + Morton prefix property)."""
    got = (pyramid.tile_pyramid(rd.from_arrow(corpus).repartition(8),
                                world=WORLD_2D, max_depth=6)
           .to_pandas().sort_values(["depth", "cell_key"])
           .reset_index(drop=True))
    want = _brute(corpus, 6)
    assert want.equals(got.astype(want.dtypes.to_dict()))


def test_pyramid_level_invariants(ray_session, corpus):
    """Every level sums to the corpus; every child rolls into its
    parent's count; keys carry the right depth tag."""
    df = (pyramid.tile_pyramid(rd.from_arrow(corpus), world=WORLD_2D,
                               max_depth=5, min_depth=2).to_pandas())
    n = corpus.num_rows
    for d, g in df.groupby("depth"):
        assert g["n_docs"].sum() == n
        tag = 1 << (2 * int(d))
        assert ((g["cell_key"] >= tag) & (g["cell_key"] < 2 * tag)).all()
    for d in range(3, 6):
        child = df[df["depth"] == d].copy()
        child["pk"] = child["cell_key"] // 4
        rolled = child.groupby("pk")["n_docs"].sum().sort_index()
        parent = (df[df["depth"] == d - 1]
                  .set_index("cell_key")["n_docs"].sort_index())
        assert rolled.equals(parent)


def test_pyramid_empty_and_bounds(ray_session):
    import pyarrow as pa

    empty = pa.table({"x": pa.array([], pa.float64()),
                      "y": pa.array([], pa.float64())})
    out = pyramid.tile_pyramid(rd.from_arrow(empty), world=WORLD_2D,
                               max_depth=3)
    assert out.num_rows == 0
    with pytest.raises(ValueError):
        pyramid.tile_pyramid(rd.from_arrow(empty), world=WORLD_2D,
                             max_depth=2, min_depth=3)

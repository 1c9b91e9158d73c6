"""Adaptive subdivision-on-capacity + salting."""

import numpy as np
import pytest

from optimizing_ray import cells, synth
from optimizing_ray.config import WORLD_2D, WORLD_3D
from optimizing_ray.stages import adaptive


def test_split_tree_capacity_rule():
    # two fine cells under one coarse parent: 10 rows -> parent must split
    k_a = int(cells.encode2(np.uint64(0), np.uint64(0), 3))
    k_b = int(cells.encode2(np.uint64(1), np.uint64(0), 3))
    fine = {k_a: 7, k_b: 3}
    plan = adaptive.split_tree(fine, capacity=4, coarse_depth=1, max_depth=3)
    # leaves are prefix-free and cover all rows
    assert sum(plan.leaf_counts.values()) == 10
    leaves = set(plan.leaves.tolist())
    for k in leaves:
        anc = k >> 2
        while anc > 0:
            assert anc not in leaves
            anc >>= 2
    # the 7-row fine cell is a max-depth leaf (cannot split further)
    assert k_a in leaves
    # every leaf above coarse depth respects capacity unless at max depth
    for k, n in plan.leaf_counts.items():
        d = int(cells.depth_of2(np.uint64(k)))
        assert n <= 4 or d == 3


def test_adaptive_assign_skewed(ray_session):
    import ray.data as rd
    t = synth.documents_batch(np.arange(6000), variant="skewed", with_spans=False)
    ds = rd.from_arrow(t)
    out, plan = adaptive.adaptive_assign(
        ds, WORLD_3D, capacity=50, coarse_depth=2, max_depth=5,
        salt_threshold=400, n_salts=4)
    df = out.to_pandas()
    assert len(df) == 6000
    key_depths = cells.depth_of2(df["cell_key"].to_numpy().astype(np.uint64))
    # hot region subdivided deeper than the uniform background
    assert key_depths.max() == 5
    assert key_depths.min() >= 2
    # every row's key is an ancestor-or-self of its fine key (consistency)
    fine = cells.point_cell2(df["x"].to_numpy(), df["y"].to_numpy(), WORLD_3D, 5).astype(np.int64)
    shift = (2 * (5 - key_depths)).astype(np.int64)
    np.testing.assert_array_equal(df["cell_key"].to_numpy(), fine >> shift)
    # counts per leaf match the plan
    got = df.groupby("cell_key").size().to_dict()
    assert got == plan.leaf_counts
    # leaves respect capacity unless at max depth
    for k, n in plan.leaf_counts.items():
        assert n <= 50 or int(cells.depth_of2(np.uint64(k))) == 5
    # salted hot cells: every cell over threshold at max depth fans out
    if len(plan.hot_cells):
        hot_rows = df[df["cell_key"].isin(plan.hot_cells)]
        assert hot_rows["salt"].nunique() > 1
        assert (df.loc[~df["cell_key"].isin(plan.hot_cells), "salt"] == 0).all()


def test_adaptive_matches_uniform_at_high_capacity(ray_session):
    """With capacity above the corpus size nothing splits: adaptive ==
    flat assignment at coarse depth."""
    import ray.data as rd
    t = synth.documents_batch(np.arange(1000), variant="flat2d", with_spans=False)
    ds = rd.from_arrow(t)
    out, plan = adaptive.adaptive_assign(
        ds, WORLD_2D, capacity=10_000, coarse_depth=3, max_depth=5)
    df = out.to_pandas()
    flat = cells.point_cell2(df["x"].to_numpy(), df["y"].to_numpy(), WORLD_2D, 3).astype(np.int64)
    np.testing.assert_array_equal(df["cell_key"].to_numpy(), flat)
    assert (df["salt"] == 0).all()


def test_salted_resumable_write_splits_hot_cell(ray_session, tmp_path):
    """End-to-end skew story: adaptive keys + salt -> composite partition
    key -> resumable write produces multiple tile groups for the hot cell."""
    import pyarrow as pa
    import ray.data as rd
    from optimizing_ray.state import manifest

    t = synth.documents_batch(np.arange(5000), variant="skewed", with_spans=False)
    out, plan = adaptive.adaptive_assign(
        rd.from_arrow(t), WORLD_3D, capacity=100, coarse_depth=2, max_depth=3,
        salt_threshold=300, n_salts=4)
    assert len(plan.hot_cells) > 0

    def composite(tt: pa.Table) -> pa.Table:
        pk = tt["cell_key"].to_numpy() * 4 + tt["salt"].to_numpy()
        return tt.append_column("part_key", pa.array(pk))

    keyed = out.map_batches(composite, batch_format="pyarrow", zero_copy_batch=True)
    rows = manifest.resumable_write(keyed, str(tmp_path / "salted"), key_col="part_key")
    assert sum(r["rows_out"] for r in rows) == 5000
    hot = int(plan.hot_cells[0])
    hot_parts = [r for r in rows if r["cell_key"] // 4 == hot]
    assert len(hot_parts) > 1  # the hot cell fans out over salts


def test_hotspot_variant_forces_salt(ray_session):
    """The bench's headline skew corpus: a point-mass landmark (3% of
    rows on ONE coordinate) lands in a single max_depth cell no
    subdivision can split — only salting handles it (the invariant
    bench.py asserts via adaptive_hot_cells > 0)."""
    import ray.data as rd
    t = synth.documents_batch(np.arange(20000), variant="hotspot",
                              with_spans=False)
    out, plan = adaptive.adaptive_assign(
        rd.from_arrow(t), WORLD_3D, capacity=200, coarse_depth=3, max_depth=7,
        salt_threshold=200, n_salts=8)
    assert len(plan.hot_cells) > 0
    df = out.to_pandas()
    hot = set(int(h) for h in plan.hot_cells)
    hot_rows = df[df["cell_key"].isin(hot)]
    # the landmark rows fan out across salts instead of one giant group
    assert hot_rows["salt"].nunique() == 8
    assert (df[~df["cell_key"].isin(hot)]["salt"] == 0).all()


def test_adaptive_assign_3d_octree(ray_session):
    """The octree capacity rule (dims=3): leaves respect capacity unless at
    max depth, keys are ancestor-consistent, all rows covered."""
    import ray.data as rd
    from optimizing_ray.config import World

    world3 = World(0.0, 0.0, 0.0, 800.0, 600.0, 50.0, dims=3)
    t = synth.documents_batch(np.arange(5000), variant="uniform", with_spans=False)
    out, plan = adaptive.adaptive_assign(
        rd.from_arrow(t), world3, capacity=100, coarse_depth=1, max_depth=4,
        dims=3)
    df = out.to_pandas()
    assert len(df) == 5000
    depths = cells.depth_of3(df["cell_key"].to_numpy().astype(np.uint64))
    assert depths.min() >= 1 and depths.max() <= 4
    fine = cells.point_cell3(df["x"].to_numpy(), df["y"].to_numpy(),
                             df["z"].to_numpy(), world3, 4).astype(np.int64)
    shift = (3 * (4 - depths)).astype(np.int64)
    np.testing.assert_array_equal(df["cell_key"].to_numpy(), fine >> shift)
    got = df.groupby("cell_key").size().to_dict()
    assert got == plan.leaf_counts
    for k, n in plan.leaf_counts.items():
        assert n <= 100 or int(cells.depth_of3(np.uint64(k))) == 4

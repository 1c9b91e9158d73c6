"""Adaptive-resolution tile assignment (A3) + hot-cell salting.

The reference subdivides a node when its occupancy reaches capacity and
depth budget remains (``DynamicOctree.hpp:130-143``, capacity=4 depth=5
``:51-52``; policy critique ``REPORT.md:10``).  The engine's batch twin is
the order-independent closure of that rule:

1. ONE streaming pass computes per-cell counts at ``max_depth`` via
   partial (in-batch) aggregation, so the groupby shuffles at most one row
   per (batch, cell) — at reference scale 4^5 = 1024 cells, at engine
   scale bounded by 4^max_depth, never by corpus size.
2. The split tree is derived driver-side from the counts table: a cell
   splits while its subtree count exceeds ``capacity`` and depth <
   ``max_depth``.  Final cells are the leaves — a prefix-free partition
   of the world.
3. A second streaming pass maps every row to its unique ancestor-or-self
   leaf (vectorized per-level membership, <= max_depth np.isin passes).
4. Cells still over ``salt_threshold`` at max_depth (non-subdividable hot
   cells — the dense-cluster case the reference cannot split further) get
   a ``salt`` column ``row_hash % n_salts``; downstream per-cell stages
   fan out over salts so no single task owns a mega-cell.

Insert-order caveat (SURVEY.md §7.4): the reference parks an item at the
node that was not-yet-full AT INSERT TIME; the closure here assigns by
final counts only.  Conformance to the exact sequential rule is checked
against ``refsim`` in tests; pipelines define cell residency by this
order-independent rule.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World

__all__ = ["cell_counts", "split_tree", "adaptive_assign", "AdaptivePlan"]


def cell_counts(ds: rd.Dataset, world: World, depth: int,
                x_col: str = "x", y_col: str = "y",
                dims: int = 2, z_col: str = "z") -> dict[int, int]:
    """Per-cell row counts at `depth`, pre-aggregated inside each batch
    (one output row per (batch, cell)) then merged driver-side.

    The result is tiny (<= 4^depth entries) by construction."""

    def partial(t: pa.Table) -> pa.Table:
        if dims == 3:
            key = cells.point_cell3(t[x_col].to_numpy(zero_copy_only=False),
                                    t[y_col].to_numpy(zero_copy_only=False),
                                    t[z_col].to_numpy(zero_copy_only=False),
                                    world, depth).astype(np.int64)
        else:
            key = cells.point_cell2(t[x_col].to_numpy(zero_copy_only=False),
                                    t[y_col].to_numpy(zero_copy_only=False),
                                    world, depth).astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell_key": pa.array(uk), "n": pa.array(cnt.astype(np.int64))})

    # merge partials driver-side: the result is bounded by 4^depth cells
    # (not corpus size), and a native groupby over ~10k keys costs more
    # than shipping the tiny partial tables to the driver
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    keys_acc: list[np.ndarray] = []
    ns_acc: list[np.ndarray] = []
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows:
            keys_acc.append(t["cell_key"].to_numpy())
            ns_acc.append(t["n"].to_numpy())
    if not keys_acc:
        return {}
    keys = np.concatenate(keys_acc)
    ns = np.concatenate(ns_acc)
    uk, inv = np.unique(keys, return_inverse=True)
    agg = np.zeros(len(uk), dtype=np.int64)
    np.add.at(agg, inv, ns)
    return dict(zip(uk.tolist(), agg.tolist()))


@dataclass
class AdaptivePlan:
    """The derived prefix-free partition."""

    leaves: np.ndarray          # int64 leaf cell keys (mixed depths)
    leaf_counts: dict[int, int]
    hot_cells: np.ndarray       # leaf keys at max_depth still over salt_threshold
    coarse_depth: int
    max_depth: int


def split_tree(fine_counts: dict[int, int], *, capacity: int,
               coarse_depth: int, max_depth: int,
               salt_threshold: int | None = None,
               dims: int = 2) -> AdaptivePlan:
    """Derive the adaptive leaf set from finest-level counts.

    A cell at depth d < max_depth stays a leaf iff its subtree count <=
    capacity; otherwise it splits (the capacity rule as an order-free
    closure).  dims=2 -> quadtree keys (4 children, shift 2); dims=3 ->
    octree keys (8 children, shift 3) — the DynamicOctree rule proper."""
    bits = dims
    nchild = 1 << dims
    depth_of = cells.depth_of2 if dims == 2 else cells.depth_of3
    fine_keys = np.fromiter(fine_counts.keys(), dtype=np.int64,
                            count=len(fine_counts))
    fine_n = np.fromiter(fine_counts.values(), dtype=np.int64,
                         count=len(fine_counts))
    # aggregate counts upward: level d key -> count
    level_counts: dict[int, dict[int, int]] = {max_depth: dict(fine_counts)}
    keys, ns = fine_keys, fine_n
    for d in range(max_depth - 1, coarse_depth - 1, -1):
        pk = keys >> bits
        uk, inv = np.unique(pk, return_inverse=True)
        agg = np.zeros(len(uk), dtype=np.int64)
        np.add.at(agg, inv, ns)
        level_counts[d] = dict(zip(uk.tolist(), agg.tolist()))
        keys, ns = uk, agg

    leaves: list[int] = []
    leaf_counts: dict[int, int] = {}
    stack = [(k, coarse_depth) for k in sorted(level_counts[coarse_depth])]
    while stack:
        k, d = stack.pop()
        n = level_counts[d].get(k, 0)
        if d == max_depth or n <= capacity:
            leaves.append(k)
            leaf_counts[k] = n
            continue
        child_level = level_counts[d + 1]
        for c in range(nchild):
            ck = (k << bits) | c
            if child_level.get(ck, 0) > 0:
                stack.append((ck, d + 1))
    leaves_arr = np.asarray(sorted(leaves), dtype=np.int64)
    thr = salt_threshold if salt_threshold is not None else np.iinfo(np.int64).max
    hot = np.asarray(
        [k for k in leaves if leaf_counts[k] > thr
         and int(depth_of(np.uint64(k))) == max_depth], dtype=np.int64)
    return AdaptivePlan(leaves_arr, leaf_counts, hot, coarse_depth, max_depth)


def adaptive_assign(ds: rd.Dataset, world: World, *, capacity: int,
                    coarse_depth: int, max_depth: int,
                    salt_threshold: int | None = None, n_salts: int = 8,
                    x_col: str = "x", y_col: str = "y",
                    dims: int = 2, z_col: str = "z") -> tuple[rd.Dataset, AdaptivePlan]:
    """Two-pass adaptive assignment: counts pass + assignment pass.

    Returns (dataset with ``cell_key`` (leaf, mixed depth) and ``salt``
    columns, plan)."""
    fine = cell_counts(ds, world, max_depth, x_col, y_col, dims=dims, z_col=z_col)
    plan = split_tree(fine, capacity=capacity, coarse_depth=coarse_depth,
                      max_depth=max_depth, salt_threshold=salt_threshold,
                      dims=dims)
    depth_of = cells.depth_of2 if dims == 2 else cells.depth_of3
    bits = dims
    leaves_by_depth = {
        d: np.asarray([k for k in plan.leaves
                       if int(depth_of(np.uint64(k))) == d], dtype=np.int64)
        for d in range(coarse_depth, max_depth + 1)}
    leaves_ref = ray.put(leaves_by_depth)
    hot_ref = ray.put(np.sort(plan.hot_cells))

    def assign(t: pa.Table) -> pa.Table:
        lbd = ray.get(leaves_ref)
        hot = ray.get(hot_ref)
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        if dims == 3:
            zv = t[z_col].to_numpy(zero_copy_only=False)
            fine_key = cells.point_cell3(x, y, zv, world, max_depth).astype(np.int64)
        else:
            fine_key = cells.point_cell2(x, y, world, max_depth).astype(np.int64)
        out = np.zeros(len(x), dtype=np.int64)
        unassigned = np.ones(len(x), dtype=bool)
        for d in range(max_depth, coarse_depth - 1, -1):
            kd = fine_key >> (bits * (max_depth - d))
            cand = lbd.get(d)
            if cand is None or len(cand) == 0:
                continue
            m = unassigned & np.isin(kd, cand)
            out[m] = kd[m]
            unassigned &= ~m
        # rows in cells unseen during the counts pass (e.g. new data at
        # resume) fall back to the coarse key
        out[unassigned] = fine_key[unassigned] >> (bits * (max_depth - coarse_depth))
        idx = np.searchsorted(hot, out)
        idx = np.clip(idx, 0, max(0, len(hot) - 1))
        if len(hot):
            is_hot = hot[idx] == out
        else:
            is_hot = np.zeros(len(x), dtype=bool)
        from optimizing_ray.synth import _mix
        # salt hashes PER-ROW identity, not the cell key — every row of a
        # hot cell shares the cell key, so hashing it would put the whole
        # cell in one salt bucket.  Position bits alone are NOT enough
        # either: the canonical hot cell is a point-mass landmark where
        # every row has IDENTICAL coordinates, so fold in doc_id (polars
        # xxh3, hot rows only) whenever the column exists.
        salt = np.zeros(len(x), dtype=np.int64)
        if is_hot.any():
            row_h = (x.view(np.uint64)
                     ^ (y.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            row_h_hot = row_h[is_hot]
            if "doc_id" in t.column_names:
                import polars as pl
                ids = t["doc_id"].filter(pa.array(is_hot))
                ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
                with np.errstate(over="ignore"):
                    row_h_hot = row_h_hot ^ pl.from_arrow(
                        pa.chunked_array([ids])).hash(seed=7).to_numpy()
            salt[is_hot] = (_mix(row_h_hot) % np.uint64(n_salts)).astype(np.int64)
        t = t.append_column("cell_key", pa.array(out))
        return t.append_column("salt", pa.array(salt))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True), plan

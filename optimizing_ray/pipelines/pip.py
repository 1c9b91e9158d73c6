"""Point-in-polygon join (the north-star's PIP workload).

The reference only has axis-aligned boxes; PIP generalizes its range
search: polygons are the small side, compiled ONCE per actor into edge
arrays + bounding boxes + cell covers (the "compiled region coverer +
PIP ray-casting index per partition" of the north star — T3 pattern,
scene gathered once per worker like ``Raytracing.hpp:438-443``).  Docs
stream through; per polygon, candidate rows come from the same
sorted-cell searchsorted pruning as the box join, then a vectorized
point-in-polygon kernel decides.

Two kernels:
* ``pip_ray_cast`` — general polygons, even-odd crossing rule; the 2D
  sibling of the reference's slab test (``Raytracing.hpp:267-289``):
  a +x ray from each point, counting edge crossings.
* ``pip_convex`` — convex (CCW) polygons via half-plane signs
  (``cross >= 0`` for every edge) — boundary-inclusive and exactly
  SQL-expressible (oracle uses the same HAVING min(cross) >= 0).

Axis-aligned degenerate polygons reproduce the F2 box semantics
(tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray import cells
from optimizing_ray.config import World, resolve_shards
from optimizing_ray.stages.assign import assign_point_cells_batch

__all__ = ["pip_ray_cast", "pip_convex", "pip_join_broadcast",
           "pip_join_shuffle", "zonal_stats", "pip_anti_join",
           "zone_centroids", "nearest_zone"]


def pip_ray_cast(px: np.ndarray, py: np.ndarray,
                 vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of points against ONE closed ring
    (vectorized over points)."""
    inside = np.zeros(len(px), dtype=bool)
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    for i in range(len(vx)):
        cond = (y1[i] > py) != (y2[i] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2[i] - x1[i]) * (py - y1[i]) / (y2[i] - y1[i]) + x1[i]
        inside ^= cond & (px < xint)
    return inside


def pip_convex(px: np.ndarray, py: np.ndarray,
               vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Half-plane test for a convex CCW ring, boundary-inclusive:
    min over edges of cross((v2-v1), (p-v1)) >= 0."""
    x1, y1 = vx, vy
    x2, y2 = np.roll(vx, -1), np.roll(vy, -1)
    ok = np.ones(len(px), dtype=bool)
    for i in range(len(vx)):
        cross = (x2[i] - x1[i]) * (py - y1[i]) - (y2[i] - y1[i]) * (px - x1[i])
        ok &= cross >= 0
    return ok


class _PipJoiner:
    """Actor holding compiled polygons (edges + bbox + sorted cell cover)."""

    def __init__(self, polys_ref, world: World, depth: int, kernel: str,
                 payload_cols: tuple[str, ...]):
        polys = ray.get(polys_ref)  # list of (poly_id, vx, vy)
        self.polys = []
        for pid, vx, vy in polys:
            cover = np.sort(cells.cover2(vx.min(), vy.min(), vx.max(), vy.max(),
                                         world, depth)).astype(np.int64)
            self.polys.append((pid, vx, vy, vx.min(), vx.max(), vy.min(), vy.max(), cover))
        self.world = world
        self.depth = depth
        self.kernel = pip_convex if kernel == "convex" else pip_ray_cast
        self.payload_cols = payload_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "cell_key" not in batch.column_names:
            batch = assign_point_cells_batch(batch, self.depth, self.world)
        key = batch["cell_key"].to_numpy()
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        skey = key[order]
        out_rows, out_pid = [], []
        from optimizing_ray.pipelines.box_join import _ranges_to_rows
        for pid, vx, vy, mnx, mxx, mny, mxy, cover in self.polys:
            lo = np.searchsorted(skey, cover, side="left")
            hi = np.searchsorted(skey, cover, side="right")
            rows = order[_ranges_to_rows(lo, hi)]
            if len(rows) == 0:
                continue
            bb = (x[rows] >= mnx) & (x[rows] <= mxx) & (y[rows] >= mny) & (y[rows] <= mxy)
            rows = rows[bb]
            if len(rows) == 0:
                continue
            m = self.kernel(x[rows], y[rows], vx, vy)
            hits = rows[m]
            if len(hits):
                out_rows.append(hits)
                out_pid.extend([pid] * len(hits))
        if not out_rows:
            return pa.table({"poly_id": pa.array([], pa.string()),
                             **{c: batch[c].slice(0, 0) for c in self.payload_cols}})
        rows = np.concatenate(out_rows)
        taken = batch.select(list(self.payload_cols)).take(pa.array(rows))
        return taken.add_column(0, "poly_id", pa.array(out_pid, pa.string()))


def compile_polygons(polygons: pa.Table) -> list[tuple]:
    """polygons table (poly_id, ring list<struct<x,y>>) -> broadcastable
    [(poly_id, vx, vy)] with numpy vertex arrays (one flatten, slices
    per polygon — no per-vertex Python)."""
    import pyarrow.compute as pc
    ring = polygons["ring"]
    ring = ring.combine_chunks() if isinstance(ring, pa.ChunkedArray) else ring
    flat = ring.flatten()
    vx = pc.struct_field(flat, "x").to_numpy(zero_copy_only=False)
    vy = pc.struct_field(flat, "y").to_numpy(zero_copy_only=False)
    offs = np.asarray(ring.offsets, dtype=np.int64)
    offs = offs - offs[0]
    pids = polygons["poly_id"].to_numpy(zero_copy_only=False)
    return [(pid, vx[offs[i]:offs[i + 1]].copy(), vy[offs[i]:offs[i + 1]].copy())
            for i, pid in enumerate(pids)]


def pip_join_broadcast(docs: rd.Dataset, polygons: pa.Table, *, world: World,
                       depth: int, kernel: str = "ray_cast",
                       payload_cols: tuple[str, ...] = ("doc_id",),
                       concurrency=None,  # unused; stage is stateless
                       batch_size: int | None = None) -> rd.Dataset:
    """Join docs' positions against a broadcast polygon table.

    Returns (poly_id, *payload_cols) rows."""
    polys_ref = ray.put(compile_polygons(polygons))
    from optimizing_ray.broadcast import cached

    def join_batch(batch):
        st = cached(("pip", polys_ref.hex(), kernel),
                    lambda: _PipJoiner(polys_ref, world, depth, kernel, payload_cols))
        return st(batch)

    return docs.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def pip_join_shuffle(docs: rd.Dataset, polygons: rd.Dataset | pa.Table, *,
                     world: World, depth: int, kernel: str = "ray_cast",
                     payload_cols: tuple[str, ...] = ("doc_id",),
                     n_shards: int | None = None) -> rd.Dataset:
    """Both-sides-large PIP plan: polygons explode to their cover cells,
    docs carry their point cell; the two sides co-group on a cell-hash
    shard (side-tagged union — Acero joins reject the nested ring column)
    and the PIP kernel runs per cell inside the shard.

    Pairs are unique by construction (each doc has ONE cell; each
    (polygon, cell) is distinct and a doc is tested only against the
    polygons covering its own cell)."""
    n_shards = resolve_shards(n_shards)
    if isinstance(polygons, pa.Table):
        polygons = rd.from_arrow(polygons)

    doc_schema = docs.schema().base_schema
    payload_types = {c: doc_schema.field(c).type for c in payload_cols}

    def explode_polys(t: pa.Table) -> pa.Table:
        """Polygon -> one row per cover cell, fully vectorized: the ring
        list column is flattened ONCE via its offsets (the media.py span
        pattern), bboxes come from reduceat over the flat vertex arrays,
        and the per-cell ring copies are one gather + ListArray rebuild —
        no per-polygon as_py()/tolist() loops (round-2 VERDICT item)."""
        import pyarrow.compute as pc
        from optimizing_ray.pipelines.box_join import _ranges_to_rows
        if t.num_rows == 0 or "ring" not in t.column_names:
            # empty blocks can carry an EMPTY schema (working notes)
            return pa.table({
                "poly_id": pa.array([], pa.string()),
                "cell_key": pa.array([], pa.int64()),
                "_side": pa.array([], pa.int8()),
                "_rx": pa.array([], pa.list_(pa.float64())),
                "_ry": pa.array([], pa.list_(pa.float64()))})
        ring = t["ring"]
        ring = ring.combine_chunks() if isinstance(ring, pa.ChunkedArray) else ring
        flat = ring.flatten()
        vx = pc.struct_field(flat, "x").to_numpy(zero_copy_only=False)
        vy = pc.struct_field(flat, "y").to_numpy(zero_copy_only=False)
        offs = np.asarray(ring.offsets, dtype=np.int64)
        offs = offs - offs[0]  # rebase: flatten() already applied the slice
        starts, ends = offs[:-1], offs[1:]
        # per-polygon bbox (rings are non-empty by construction; reduceat
        # segments [starts[i], starts[i+1]) match the contiguous layout)
        mnx = np.minimum.reduceat(vx, starts)
        mxx = np.maximum.reduceat(vx, starts)
        mny = np.minimum.reduceat(vy, starts)
        mxy = np.maximum.reduceat(vy, starts)
        pids = t["poly_id"].to_numpy(zero_copy_only=False)
        P = len(pids)
        covers = [cells.cover2(mnx[p], mny[p], mxx[p], mxy[p], world, depth)
                  .astype(np.int64) for p in range(P)]
        n_cov = np.fromiter((len(c) for c in covers), dtype=np.int64, count=P)
        keys = (np.concatenate(covers) if P else np.empty(0, np.int64))
        row_poly = np.repeat(np.arange(P), n_cov)
        ring_len = ends - starts
        out_lens = ring_len[row_poly]
        val_idx = _ranges_to_rows(starts[row_poly], ends[row_poly])
        out_offs = np.zeros(len(row_poly) + 1, dtype=np.int32)
        np.cumsum(out_lens, out=out_offs[1:])
        oo = pa.array(out_offs, pa.int32())
        return pa.table({
            "poly_id": pa.array(pids[row_poly], pa.string()),
            "cell_key": pa.array(keys, pa.int64()),
            "_side": pa.array(np.ones(len(row_poly), dtype=np.int8)),
            "_rx": pa.ListArray.from_arrays(oo, pa.array(vx[val_idx])),
            "_ry": pa.ListArray.from_arrays(oo, pa.array(vy[val_idx])),
        })

    def tag_docs(t: pa.Table) -> pa.Table:
        if "cell_key" not in t.column_names:
            t = assign_point_cells_batch(t, depth, world)
        out = {
            "poly_id": pa.nulls(len(t), pa.string()),
            "cell_key": t["cell_key"],
            "_side": pa.array(np.zeros(len(t), dtype=np.int8)),
            "_rx": pa.nulls(len(t), pa.list_(pa.float64())),
            "_ry": pa.nulls(len(t), pa.list_(pa.float64())),
            "_x": t["x"], "_y": t["y"],
        }
        for c in payload_cols:
            out[f"_p_{c}"] = t[c]
        return pa.table(out)

    def pad_polys(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in t.column_names}
        out["_x"] = pa.nulls(len(t), pa.float64())
        out["_y"] = pa.nulls(len(t), pa.float64())
        for c in payload_cols:
            out[f"_p_{c}"] = pa.nulls(len(t), payload_types[c])
        return pa.table(out)

    kern = pip_convex if kernel == "convex" else pip_ray_cast
    poly_side = polygons.map_batches(explode_polys, batch_format="pyarrow",
                                     zero_copy_batch=True) \
        .map_batches(pad_polys, batch_format="pyarrow", zero_copy_batch=True)
    doc_side = docs.map_batches(tag_docs, batch_format="pyarrow", zero_copy_batch=True)
    tagged = doc_side.union(poly_side)

    def add_shard(t: pa.Table) -> pa.Table:
        h = t["cell_key"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
        return t.append_column("_shard", pa.array((h % np.uint64(n_shards)).astype(np.int64)))

    def within_shard(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy()
        key = t["cell_key"].to_numpy()
        doc_rows = np.nonzero(side == 0)[0]
        poly_rows = np.nonzero(side == 1)[0]
        empty = pa.table({"poly_id": pa.array([], pa.string()),
                          **{c: pa.array([], payload_types[c]) for c in payload_cols}})
        if len(doc_rows) == 0 or len(poly_rows) == 0:
            return empty
        x = t["_x"].to_numpy(zero_copy_only=False)
        y = t["_y"].to_numpy(zero_copy_only=False)
        order = doc_rows[np.argsort(key[doc_rows], kind="stable")]
        skey = key[order]
        # parse the shard's polygon side ONCE: take the poly rows and
        # flatten the ring columns to flat vertex arrays + offsets — each
        # polygon's vertices are then numpy SLICES, never a per-polygon
        # as_py() re-parse inside the loop (round-2 VERDICT item)
        pt = t.select(["poly_id", "_rx", "_ry"]).take(pa.array(poly_rows))
        rxc = pt["_rx"].combine_chunks()
        ryc = pt["_ry"].combine_chunks()
        fx = rxc.flatten().to_numpy(zero_copy_only=False)
        fy = ryc.flatten().to_numpy(zero_copy_only=False)
        poffs = np.asarray(rxc.offsets, dtype=np.int64)
        poffs = poffs - poffs[0]
        pids_np = pt["poly_id"].to_numpy(zero_copy_only=False)
        pkeys = key[poly_rows]
        lo = np.searchsorted(skey, pkeys, side="left")
        hi = np.searchsorted(skey, pkeys, side="right")
        out_sel, out_pj = [], []
        for j in np.nonzero(hi > lo)[0]:
            rows = order[lo[j]:hi[j]]
            m = kern(x[rows], y[rows],
                     fx[poffs[j]:poffs[j + 1]], fy[poffs[j]:poffs[j + 1]])
            hits = rows[m]
            if len(hits):
                out_sel.append(hits)
                out_pj.append(np.full(len(hits), j, dtype=np.int64))
        if not out_sel:
            return empty
        sel = np.concatenate(out_sel)
        res = {"poly_id": pa.array(pids_np[np.concatenate(out_pj)], pa.string())}
        for c in payload_cols:
            res[c] = t[f"_p_{c}"].take(pa.array(sel))
        return pa.table(res)

    return (tagged.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_shard").map_groups(within_shard, batch_format="pyarrow"))


def pip_anti_join(docs: rd.Dataset, polygons: pa.Table, *,
                  kernel: str = "ray_cast",
                  payload_cols: tuple[str, ...] = ("doc_id", "x", "y"),
                  batch_size: int | None = None) -> rd.Dataset:
    """Spatial ANTI-join: docs contained in NO polygon (the complement
    of ``pip_join_broadcast`` under the same kernel).  Broadcast-only:
    the anti predicate must see every polygon, so the small side ships
    once and each batch evaluates a bbox-prefiltered containment mask —
    zero shuffles, one streaming pass."""
    polys_ref = ray.put(compile_polygons(polygons))
    from optimizing_ray.broadcast import cached
    kern = pip_convex if kernel == "convex" else pip_ray_cast

    def anti_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "x" not in batch.column_names:
            return pa.table({c: pa.array([], pa.float64() if c in ("x", "y")
                                         else pa.int64())
                             for c in payload_cols})
        polys = cached(("pip_anti", polys_ref.hex()),
                       lambda: ray.get(polys_ref))
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(x), dtype=bool)
        for _pid, vx, vy in polys:
            cand = np.flatnonzero(~hit & (x >= vx.min()) & (x <= vx.max())
                                  & (y >= vy.min()) & (y <= vy.max()))
            if len(cand) == 0:
                continue
            hit[cand[kern(x[cand], y[cand], vx, vy)]] = True
        return batch.select(list(payload_cols)).filter(pa.array(~hit))

    return docs.map_batches(anti_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def zone_centroids(polygons: pa.Table) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """Vertex-mean centroid per polygon, floor-rounded at 1e-6 so the
    value is a shared CONSTANT between the engine and the SQL oracle
    (inlined literals) regardless of float summation order.  Returns
    (poly_ids sorted asc, cx, cy)."""
    polys = sorted(compile_polygons(polygons), key=lambda p: p[0])
    pids = np.asarray([p[0] for p in polys])
    cx = np.asarray([np.floor(p[1].mean() * 1e6 + 0.5) / 1e6 for p in polys])
    cy = np.asarray([np.floor(p[2].mean() * 1e6 + 0.5) / 1e6 for p in polys])
    return pids, cx, cy


def nearest_zone(docs: rd.Dataset, polygons: pa.Table,
                 batch_size: int | None = None) -> rd.Dataset:
    """Reverse geocode: each doc's nearest zone by centroid distance,
    tie-broken by ascending poly_id (the SQL row_number order).  The
    Z-centroid matrix broadcasts as plain constants (Z is small by
    construction); the per-batch kernel is one (n, Z) distance argmin."""
    pids, cx, cy = zone_centroids(polygons)

    def near_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "x" not in batch.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "poly_id": pa.array([], pa.string()),
                             "dist": pa.array([], pa.float64())})
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        dx = x[:, None] - cx[None, :]
        dy = y[:, None] - cy[None, :]
        d2 = dx * dx + dy * dy
        win = np.argmin(d2, axis=1)  # first index wins ties = id-asc order
        dist = np.floor(np.sqrt(d2[np.arange(len(x)), win]) * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": batch["doc_id"],
                         "poly_id": pa.array(pids[win]),
                         "dist": pa.array(dist)})

    return docs.map_batches(near_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


def zonal_stats(docs: rd.Dataset, polygons: pa.Table, *, world: World,
                depth: int, kernel: str = "convex",
                value_col: str = "n_chars") -> pa.Table:
    """Per-zone aggregates over contained points — the classic zonal
    statistics of raster/vector GIS, composed from the broadcast PIP
    join: (poly_id, n_docs, sum_<value>, mean_<value>).

    Scale shape: the join streams; each batch pre-aggregates to at most
    one row per zone, so the merge input is bounded by blocks x zones
    and runs driver-side (the tile_counts plan).  ``value_col`` must be
    an INTEGER column: integer partial sums are order-exact, and the
    mean is ONE shared division of exact integers — the SQL twin
    reproduces both bit-for-bit with no float-sum-order hazard (the
    repo's oracle discipline).  Zones containing no points are absent
    (matching the GROUP BY twin)."""
    joined = pip_join_broadcast(docs, polygons, world=world, depth=depth,
                                kernel=kernel,
                                payload_cols=("doc_id", value_col))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "poly_id" not in t.column_names:
            return pa.table({"poly_id": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        pid = t["poly_id"].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(pid, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        # int64 accumulate (bincount weights go through float64; keep
        # integer sums EXACT at any magnitude)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, val)
        return pa.table({"poly_id": pa.array(uniq.astype(object)),
                         "n": pa.array(n), "s": pa.array(s)})

    parts = joined.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    sum_col, mean_col = f"sum_{value_col}", f"mean_{value_col}"
    if not tabs:
        return pa.table({"poly_id": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         sum_col: pa.array([], pa.int64()),
                         mean_col: pa.array([], pa.float64())})
    df = pa.concat_tables(tabs).to_pandas()
    agg = df.groupby("poly_id", as_index=False, sort=True).sum()
    n = agg["n"].to_numpy().astype(np.int64)
    s = agg["s"].to_numpy().astype(np.int64)
    mean = np.floor((s / n) * 1e6 + 0.5) / 1e6
    return pa.table({"poly_id": pa.array(agg["poly_id"]),
                     "n_docs": pa.array(n), sum_col: pa.array(s),
                     mean_col: pa.array(mean)})

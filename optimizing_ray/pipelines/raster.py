"""Raster <-> vector tile assignment (the engine's raytracer workload).

raster->vector (``nearest_doc_per_pixel``): per pixel, the nearest
document — the batch twin of the tracer's per-ray nearest-hit argmin
(``Raytracing.hpp:640-669``): the scene (doc positions) is broadcast and
held per actor (gathered once like ``Raytracing.hpp:438-443``), pixels
stream through as the large side.  Scale path: at corpus sizes where
broadcasting positions is too big, docs are pre-bucketed by cell and the
actor holds only cell -> (positions block) with ring lookup per pixel;
the broadcast path is the correctness oracle exactly as the reference's
brute scan (J3).

vector->raster (``covering_pixels``): each doc box explodes to the pixel
cells it overlaps (``stages.assign.explode_cover_batch`` at pixel
resolution) — duplicates allowed by design, pixels of one doc are
distinct (J4 without the dedup need).

``raycast_scene``: the 3D nearest-hit kernel over a broadcast scene of
spheres/boxes using the slab + discriminant tests (M6/M7) — per-pixel
min positive distance and hit object id (A4/O1), pytest-verified against
a scalar oracle (non-SQL operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.config import World
from optimizing_ray.functions import rays

__all__ = ["nearest_doc_per_pixel", "covering_pixels", "raycast_scene",
           "shade", "idw_grid", "focal_stats", "morans_i", "grid_bfs", "flow_accumulation", "local_morans", "viewshed", "watershed_basins", "slope_aspect", "getis_ord", "contour_cells", "cost_distance"]


class _NearestDoc:
    """Actor holding broadcast doc positions; per-pixel argmin by chunked
    vectorized distance (doc chunks sized to stay cache-friendly)."""

    def __init__(self, docs_ref, chunk: int = 4096):
        d = ray.get(docs_ref)
        self.doc_id = d["doc_id"]
        self.dx = np.ascontiguousarray(d["x"])
        self.dy = np.ascontiguousarray(d["y"])
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch["cx"].to_numpy(zero_copy_only=False)
        py = batch["cy"].to_numpy(zero_copy_only=False)
        n = len(px)
        best_d2 = np.full(n, np.inf)
        best_i = np.zeros(n, dtype=np.int64)
        for s in range(0, len(self.dx), self.chunk):
            e = min(len(self.dx), s + self.chunk)
            ddx = px[:, None] - self.dx[None, s:e]
            ddy = py[:, None] - self.dy[None, s:e]
            d2 = ddx * ddx + ddy * ddy
            ci = np.argmin(d2, axis=1)
            cd = d2[np.arange(n), ci]
            upd = cd < best_d2
            best_d2[upd] = cd[upd]
            best_i[upd] = ci[upd] + s
        out = batch.select(["pixel_id", "px", "py"])
        out = out.append_column("doc_id", pa.array(np.asarray(self.doc_id)[best_i]))
        out = out.append_column("dist", pa.array(np.sqrt(best_d2)))
        return out


def nearest_doc_per_pixel(pixels: rd.Dataset | pa.Table, docs_small: pa.Table,
                          *, concurrency: int | tuple[int, int] = (1, 8),
                          batch_size: int | None = 16_384) -> rd.Dataset:
    """Per-pixel nearest doc over a broadcast doc table.

    Ties broken toward the lowest doc index in scan order (argmin), which
    equals the (dist2, doc_id) tiebreak when doc ids are sorted ascending
    — callers pass docs sorted by doc_id (the oracle's ordering)."""
    docs_ref = ray.put({
        "doc_id": docs_small["doc_id"].to_numpy(zero_copy_only=False),
        "x": docs_small["x"].to_numpy(),
        "y": docs_small["y"].to_numpy(),
    })
    if isinstance(pixels, pa.Table):
        n_blocks = max(1, pixels.num_rows // 16_384)
        pixels = rd.from_arrow(pixels)
        if n_blocks > 1:
            # repartition is an all-to-all operator even when it's a
            # no-op — skip it for small single-block pixel tables
            pixels = pixels.repartition(n_blocks)
    from optimizing_ray.broadcast import cached

    def near_batch(batch):
        st = cached(("nearest_doc", docs_ref.hex()), lambda: _NearestDoc(docs_ref))
        return st(batch)

    return pixels.map_batches(near_batch, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)


def covering_pixels(docs: rd.Dataset, *, world: World, width: int, height: int,
                    payload_cols: tuple[str, ...] = ("doc_id",)) -> rd.Dataset:
    """vector->raster: one output row per (doc, overlapped pixel)."""
    wx, wy, _ = world.size
    pw, ph = wx / width, wy / height

    def explode(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        ix0 = np.clip(np.floor((x - world.min_x) / pw).astype(np.int64), 0, width - 1)
        ix1 = np.clip(np.floor((x + w - world.min_x) / pw).astype(np.int64), 0, width - 1)
        iy0 = np.clip(np.floor((y - world.min_y) / ph).astype(np.int64), 0, height - 1)
        iy1 = np.clip(np.floor((y + h - world.min_y) / ph).astype(np.int64), 0, height - 1)
        nx = ix1 - ix0 + 1
        ny = iy1 - iy0 + 1
        reps = nx * ny
        total = int(reps.sum())
        row_idx = np.repeat(np.arange(len(t), dtype=np.int64), reps)
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
        nx_r = np.repeat(nx, reps)
        px = (np.repeat(ix0, reps) + local % nx_r).astype(np.int32)
        py = (np.repeat(iy0, reps) + local // nx_r).astype(np.int32)
        out = t.select(list(payload_cols)).take(pa.array(row_idx))
        out = out.append_column("px", pa.array(px))
        out = out.append_column("py", pa.array(py))
        return out.append_column(
            "pixel_id", pa.array(py.astype(np.int64) * width + px.astype(np.int64)))

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def idw_grid(docs: rd.Dataset, *, world: World, width: int, height: int,
             radius: float, value_col: str = "n_chars") -> pa.Table:
    """Inverse-distance-weighted interpolation onto a pixel grid
    (vector -> continuous raster): for every pixel center, over docs
    within ``radius``, idw = sum(w*v) / sum(w) with the fixed-point
    integer weight w = floor(1e9 / (1 + d2)) (1e9 scale: nonzero out to
    the radius, sums far below int64).

    Integer weights make the partial sums ORDER-EXACT (no float-sum-
    order hazard across parallel batches); the mean is ONE shared
    division, floor-rounded at 1e-6 on both engine and SQL sides
    (``oracle.idw_grid_sql``).  Each batch scatter-adds into bounded
    (width x height) accumulators, so the exchange is a driver merge of
    blocks x pixels rows — never a shuffle.  Pixels no doc reaches are
    absent from the output (inner-join semantics)."""
    wx, wy, _ = world.size
    pw, ph = wx / width, wy / height
    mx = int(np.ceil(radius / pw)) + 1
    my = int(np.ceil(radius / ph)) + 1
    r2 = radius * radius
    npix = width * height
    offx, offy = np.meshgrid(np.arange(-mx, mx + 1), np.arange(-my, my + 1),
                             indexing="xy")
    offx, offy = offx.ravel(), offy.ravel()

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"pix": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "wsum": pa.array([], pa.int64()),
                          "wvsum": pa.array([], pa.int64())})
        if t.num_rows == 0 or "x" not in t.column_names:
            return empty
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # candidate pixel window around each doc (superset; d2 decides)
        bx = np.floor((x - world.min_x) / pw).astype(np.int64)
        by = np.floor((y - world.min_y) / ph).astype(np.int64)
        ix = bx[:, None] + offx[None, :]
        iy = by[:, None] + offy[None, :]
        ok = (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
        # pixel-center distance (exact SQL op order)
        cx = world.min_x + (ix + 0.5) / width * wx
        cy = world.min_y + (iy + 0.5) / height * wy
        dx = x[:, None] - cx
        dy = y[:, None] - cy
        d2 = dx * dx + dy * dy
        hit = ok & (d2 <= r2)
        if not hit.any():
            return empty
        pix = (iy * width + ix)[hit]
        w = np.floor(1e9 / (1.0 + d2[hit])).astype(np.int64)
        vv = np.broadcast_to(v[:, None], hit.shape)[hit]
        nacc = np.zeros(npix, dtype=np.int64)
        wacc = np.zeros(npix, dtype=np.int64)
        wvacc = np.zeros(npix, dtype=np.int64)
        np.add.at(nacc, pix, 1)
        np.add.at(wacc, pix, w)
        np.add.at(wvacc, pix, w * vv)
        nz = np.flatnonzero(nacc)
        return pa.table({"pix": pa.array(nz), "n": pa.array(nacc[nz]),
                         "wsum": pa.array(wacc[nz]),
                         "wvsum": pa.array(wvacc[nz])})

    parts = [t for t in ray.get(docs.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.table({"px": pa.array([], pa.int64()),
                         "py": pa.array([], pa.int64()),
                         "n_docs": pa.array([], pa.int64()),
                         "wsum": pa.array([], pa.int64()),
                         "idw": pa.array([], pa.float64())})
    pix = np.concatenate([t["pix"].to_numpy() for t in parts])
    nacc = np.zeros(npix, dtype=np.int64)
    wacc = np.zeros(npix, dtype=np.int64)
    wvacc = np.zeros(npix, dtype=np.int64)
    np.add.at(nacc, pix, np.concatenate([t["n"].to_numpy() for t in parts]))
    np.add.at(wacc, pix, np.concatenate([t["wsum"].to_numpy() for t in parts]))
    np.add.at(wvacc, pix,
              np.concatenate([t["wvsum"].to_numpy() for t in parts]))
    nz = np.flatnonzero(nacc)
    idw = np.floor(wvacc[nz].astype(np.float64) / wacc[nz] * 1e6 + 0.5) / 1e6
    return pa.table({"px": pa.array(nz % width), "py": pa.array(nz // width),
                     "n_docs": pa.array(nacc[nz]),
                     "wsum": pa.array(wacc[nz]), "idw": pa.array(idw)})


class _Raycaster:
    """Broadcast 3D scene; per-ray nearest positive hit (J3/O1)."""

    def __init__(self, scene_ref):
        s = ray.get(scene_ref)
        self.obj_id = s["obj_id"]
        self.kind = s["kind"]  # "sphere" | "box"
        self.a = s["a"]  # sphere: cx cy cz r ; box: min xyz max xyz
        self.is_sphere = np.asarray([k == "sphere" for k in s["kind"]])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ox = batch["ox"].to_numpy()
        oy = batch["oy"].to_numpy()
        oz = batch["oz"].to_numpy()
        dx = batch["dx"].to_numpy()
        dy = batch["dy"].to_numpy()
        dz = batch["dz"].to_numpy()
        n = len(ox)
        best_t = np.full(n, np.inf)
        best_i = np.full(n, -1, dtype=np.int64)
        for i in range(len(self.obj_id)):
            a = self.a[i]
            if self.is_sphere[i]:
                t = rays.ray_sphere(ox, oy, oz, dx, dy, dz, a[0], a[1], a[2], a[3])
            else:
                t = rays.ray_aabb(ox, oy, oz, dx, dy, dz,
                                  a[0], a[1], a[2], a[3], a[4], a[5])
            hit = (t > 0) & (t < best_t)
            best_t[hit] = t[hit]
            best_i[hit] = i
        out = batch.select(["pixel_id"])
        ids = np.asarray(self.obj_id + ["<miss>"], dtype=object)
        out = out.append_column("obj_id", pa.array(ids[best_i].tolist(), pa.string()))
        out = out.append_column("t_hit", pa.array(np.where(np.isinf(best_t), 0.0, best_t)))
        return out


def raycast_scene(pixel_rays: rd.Dataset | pa.Table, scene: dict, *,
                  concurrency: int | tuple[int, int] = (1, 8)) -> rd.Dataset:
    """Per-ray nearest hit over a broadcast scene.

    scene = {"obj_id": [...], "kind": ["sphere"|"box"...], "a": [params...]}
    """
    scene_ref = ray.put(scene)
    if isinstance(pixel_rays, pa.Table):
        n_blocks = max(1, pixel_rays.num_rows // 16_384)
        pixel_rays = rd.from_arrow(pixel_rays)
        if n_blocks > 1:  # repartition is all-to-all even as a no-op
            pixel_rays = pixel_rays.repartition(n_blocks)
    from optimizing_ray.broadcast import cached

    def cast_batch(batch):
        st = cached(("raycast", scene_ref.hex()), lambda: _Raycaster(scene_ref))
        return st(batch)

    return pixel_rays.map_batches(cast_batch, batch_format="pyarrow",
                                  zero_copy_batch=True)


def shade(pixel_rays: rd.Dataset | pa.Table, scene: dict, *,
          samples_per_pixel: int = 4, jitter: float = 0.5,
          seed: int = 17) -> rd.Dataset:
    """Per-pixel mean hit distance over jittered samples — the tracer's
    subpixel sampling + radiance accumulation (``Raytracing.hpp:461-492``):
    each ray is replicated ``samples_per_pixel`` times with a deterministic
    tent-filter-style direction jitter (per-sample RNG seeded by
    (pixel_id, sample) like the reference's per-pixel seeds), raycast
    against the broadcast scene, then averaged per pixel IN-BATCH (samples
    of one pixel stay in one batch, so no shuffle — the A4 in-batch
    reduction path)."""
    from optimizing_ray.synth import u01

    if isinstance(pixel_rays, pa.Table):
        nb = max(1, pixel_rays.num_rows // 16_384)
        pixel_rays = rd.from_arrow(pixel_rays)
        if nb > 1:  # skip the no-op all-to-all
            pixel_rays = pixel_rays.repartition(nb)
    scene_ref = ray.put(scene)

    def shade_batch(t: pa.Table) -> pa.Table:
        from optimizing_ray.broadcast import cached
        caster = cached(("raycast", scene_ref.hex()), lambda: _Raycaster(scene_ref))
        n = len(t)
        s = samples_per_pixel
        pid = t["pixel_id"].to_numpy()
        rep = np.repeat(np.arange(n), s)
        sample_key = pid[rep] * np.int64(1024) + np.tile(np.arange(s), n)
        cols = {c: t[c].to_numpy()[rep] for c in ("ox", "oy", "oz", "dx", "dy", "dz")}
        # tent-ish jitter of the direction (2*u - 1 in [-1, 1])
        for axis, salt in (("dx", 3001), ("dy", 3002)):
            cols[axis] = cols[axis] + jitter * (2.0 * u01(sample_key, seed + salt) - 1.0) * 0.01
        norm = np.sqrt(cols["dx"] ** 2 + cols["dy"] ** 2 + cols["dz"] ** 2)
        for axis in ("dx", "dy", "dz"):
            cols[axis] = cols[axis] / norm
        exp = pa.table({"pixel_id": pa.array(pid[rep]), **{k: pa.array(v) for k, v in cols.items()}})
        hit = caster(exp)
        t_hit = hit["t_hit"].to_numpy().reshape(n, s)
        hit_mask = (t_hit > 0).astype(np.float64)
        n_hits = hit_mask.sum(axis=1)
        mean_t = np.where(n_hits > 0, (t_hit * hit_mask).sum(axis=1) / np.maximum(n_hits, 1), 0.0)
        return pa.table({
            "pixel_id": t["pixel_id"],
            "mean_t_hit": pa.array(mean_t),
            "hit_frac": pa.array(n_hits / s),
        })

    return pixel_rays.map_batches(shade_batch, batch_format="pyarrow",
                                  zero_copy_batch=True)


def focal_stats(docs, *, depth: int, world: World,
                x_col: str = "x", y_col: str = "y",
                n_shards: int | None = None) -> pa.Table:
    """3x3 focal (neighborhood) statistics over the Morton tile grid —
    the raster hotspot/smoothing primitive (the Getis-Ord Gi* integer
    numerator): per OCCUPIED tile, its own point count, the sum of
    counts over the in-grid Chebyshev-1 neighborhood (incl. self), and
    the neighborhood's geometric cell count (9 interior, 6 edge, 4
    corner) — all integer-exact.

    Plan: assign points to tiles, fold per-batch partial counts, then
    each partial EMITS itself to its <= 9 in-grid neighbor targets
    (the MR stencil: focal sums are linear, so partials stencil before
    totalling) plus one occupancy row to itself — ONE hash(target)
    exchange folds (n, focal) per target; per-shard output is complete
    (a target's contributions co-locate) and the driver concat is
    bounded by occupied cells <= 4^depth.  SQL twin
    ``oracle.focal_stats_sql`` (offsets cross join + equi LEFT join,
    the range-join-assertion-safe shape).

    Reference parity: the neighborhood load of
    ``WorldPartition.hpp:196-212`` (ring-1 cell gather) turned into an
    aggregate — cited for role, not ported."""
    import pandas as pd

    from optimizing_ray.cells import decode2, encode2
    from optimizing_ray.config import resolve_shards
    from optimizing_ray.stages.assign import assign_tiles

    n_shards = resolve_shards(n_shards)
    n = 1 << depth
    ds = assign_tiles(docs, depth, world, x_col, y_col)
    emit_schema = pa.schema([("tgt", pa.int64()), ("v", pa.int64()),
                             ("side", pa.int8()), ("_shard", pa.int64())])
    gold = np.uint64(0x9E3779B97F4A7C15)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cell_key" not in t.column_names:
            return emit_schema.empty_table()
        uk, cnt = np.unique(t["cell_key"].to_numpy(), return_counts=True)
        cnt = cnt.astype(np.int64)
        _, ix, iy = decode2(uk.astype(np.uint64))
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)
        tgts = [uk.astype(np.int64)]
        vals = [cnt]
        sides = [np.zeros(len(uk), np.int8)]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = ix + dx, iy + dy
                m = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                if not m.any():
                    continue
                k2 = encode2(nx[m].astype(np.uint64),
                             ny[m].astype(np.uint64), depth)
                tgts.append(k2.astype(np.int64))
                vals.append(cnt[m])
                sides.append(np.ones(int(m.sum()), np.int8))
        tgt = np.concatenate(tgts)
        with np.errstate(over="ignore"):
            sh = (tgt.astype(np.uint64) * gold) >> np.uint64(33)
        return pa.table({"tgt": pa.array(tgt),
                         "v": pa.array(np.concatenate(vals)),
                         "side": pa.array(np.concatenate(sides)),
                         "_shard": pa.array((sh % np.uint64(n_shards))
                                            .astype(np.int64))})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "cell_key": pd.Series([], dtype=np.int64),
            "n_docs": pd.Series([], dtype=np.int64),
            "focal_docs": pd.Series([], dtype=np.int64),
            "n_cells": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        tgt = g["tgt"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        side = g["side"].to_numpy(np.int8)
        ut, inv = np.unique(tgt, return_inverse=True)
        own = np.zeros(len(ut), dtype=np.int64)
        foc = np.zeros(len(ut), dtype=np.int64)
        np.add.at(own, inv[side == 0], v[side == 0])
        np.add.at(foc, inv[side == 1], v[side == 1])
        keep = own > 0  # occupied tiles only
        ut, own, foc = ut[keep], own[keep], foc[keep]
        _, ix, iy = decode2(ut.astype(np.uint64))
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)
        ncells = ((1 + (ix > 0) + (ix < n - 1))
                  * (1 + (iy > 0) + (iy < n - 1))).astype(np.int64)
        return pd.DataFrame({"cell_key": ut, "n_docs": own,
                             "focal_docs": foc, "n_cells": ncells})

    out = (ds.map_batches(emit, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("_shard").map_groups(fold, batch_format="pandas")
           .to_pandas())
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("focal_docs", pa.int64()), ("n_cells", pa.int64())])
    if len(out) == 0 or "cell_key" not in out.columns:
        return schema.empty_table()
    out = out.sort_values("cell_key").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False, schema=schema)


def _cell_partials(docs: rd.Dataset, *, depth: int, world: World,
                   x_col: str = "x", y_col: str = "y",
                   seed_mod: int | None = None,
                   id_col: str = "doc_id") -> tuple[np.ndarray, ...]:
    """Distributed per-cell (count, seed-presence) partials with a
    BOUNDED driver merge: each batch folds to at most 4^depth (cell,
    n[, seeded]) rows, so the driver-side concat+unique is O(occupied
    cells) regardless of corpus size — the ``tile_counts`` plan.  At
    depths where 4^depth itself is large, swap the tail for one sharded
    exchange (the ``focal_stats`` stencil shape); the grid statistics
    below keep the fixed small-depth driver plan and document it.

    Returns (ix, iy, n[, seeded]) int64 arrays sorted by linear index.
    """
    from optimizing_ray.cells import decode2
    from optimizing_ray.stages.assign import assign_tiles

    ds = assign_tiles(docs, depth, world, x_col, y_col)
    want_seed = seed_mod is not None

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cell_key" not in t.column_names:
            cols = {"k": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64())}
            if want_seed:
                cols["s"] = pa.array([], pa.int64())
            return pa.table(cols)
        k = t["cell_key"].to_numpy()
        uk, inv, cnt = np.unique(k, return_inverse=True,
                                 return_counts=True)
        cols = {"k": pa.array(uk.astype(np.int64)),
                "n": pa.array(cnt.astype(np.int64))}
        if want_seed:
            seed = (t[id_col].to_numpy(zero_copy_only=False)
                    .astype(np.int64) % seed_mod) == 0
            s = np.zeros(len(uk), dtype=np.int64)
            np.maximum.at(s, inv, seed.astype(np.int64))
            cols["s"] = pa.array(s)
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_rows]
    if not tabs:
        z = np.zeros(0, np.int64)
        return (z, z, z, z) if want_seed else (z, z, z)
    keys = np.concatenate([t["k"].to_numpy() for t in tabs])
    ns = np.concatenate([t["n"].to_numpy() for t in tabs])
    uk, inv = np.unique(keys, return_inverse=True)
    agg = np.zeros(len(uk), dtype=np.int64)
    np.add.at(agg, inv, ns)
    _, ix, iy = decode2(uk.astype(np.uint64))
    out = [ix.astype(np.int64), iy.astype(np.int64), agg]
    if want_seed:
        ss = np.concatenate([t["s"].to_numpy() for t in tabs])
        sagg = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(sagg, inv, ss)
        out.append(sagg)
    return tuple(out)


def morans_i(docs: rd.Dataset, *, depth: int, world: World,
             x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Global Moran's I spatial autocorrelation of per-tile point counts
    over the OCCUPIED Morton tiles with binary rook (4-neighbour)
    weights — the standard lattice clustering statistic (Moran 1950),
    the scalar complement to the ``focal_stats`` hotspot stencil.

    Exactness: with N occupied cells and total count S, the deviation
    is scaled to the integer z_i = N*n_i - S, so the numerator
    sum(w_ij * z_i * z_j) and denominator sum(z_i^2) are exact int64
    (both engines sum the same integers; DuckDB auto-widens to
    HUGEINT).  The final ratio is THREE IEEE ops in a fixed order —
    (num/den) * N / W — micro-rounded to 1e-6, the idw_grid one-shared-
    division discipline.  Magnitude guard: |z| <= N * S, so depth 4-5
    grids hold to corpus sizes ~2^31 / 4^depth; past the int64 fast
    path the bounded driver arrays switch to exact Python-int dot
    products, and if the exact num/den themselves exceed the int64
    OUTPUT contract the call raises OverflowError with guidance
    (rather than silently truncating).

    Plan: ONE streaming partial-count pass with a 4^depth-bounded
    driver merge (see ``_cell_partials``); the O(occupied) rook-pair
    fold is a driver-side searchsorted on linear indices — no shuffle
    at all.  SQL twin ``oracle.morans_i_sql``."""
    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("n_cells", pa.int64()), ("w_pairs", pa.int64()),
                        ("num", pa.int64()), ("den", pa.int64()),
                        ("morans_i_6", pa.int64())])
    nc = len(ix)
    if nc == 0:
        return pa.table({"n_cells": [0], "w_pairs": [0], "num": [0],
                         "den": [0], "morans_i_6": [0]}, schema=schema)
    tot = int(cnt.sum())
    # int64 fast path holds while W * (N*S)^2 < 2^63 (W <= 4N); beyond
    # that the BOUNDED (<= 4^depth) driver arrays switch to exact
    # Python-int dot products — the oracle sums in HUGEINT regardless.
    if 4 * nc * (nc * tot) ** 2 < (1 << 63):
        z = nc * cnt - tot
    else:
        z = nc * cnt.astype(object) - tot
    lin = ix * n + iy  # unique-sorted already (Morton unique -> but
    # linear order differs from Morton order; sort for searchsorted)
    order = np.argsort(lin)
    lin_s, z_s = lin[order], z[order]
    num = 0
    w_pairs = 0
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        jx, jy = ix + dx, iy + dy
        m = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
        tgt = jx[m] * n + jy[m]
        pos = np.searchsorted(lin_s, tgt)
        pos = np.minimum(pos, len(lin_s) - 1)
        hit = lin_s[pos] == tgt
        num += int(np.dot(z[m][hit], z_s[pos[hit]]))
        w_pairs += int(hit.sum())
    den = int(np.dot(z, z))
    if abs(num) >= (1 << 63) or den >= (1 << 63):
        raise OverflowError(
            "morans_i: exact num/den exceed the int64 output contract "
            f"at this corpus size (|num|={abs(num)}, den={den}); use a "
            "shallower depth or pre-aggregate counts before the "
            "statistic")
    if den == 0 or w_pairs == 0:
        mi6 = 0
    else:
        r = np.float64(num) / np.float64(den)
        r = r * np.float64(nc) / np.float64(w_pairs)
        mi6 = int(np.floor(r * 1e6 + 0.5))
    return pa.table({"n_cells": [nc], "w_pairs": [w_pairs], "num": [num],
                     "den": [den], "morans_i_6": [mi6]}, schema=schema)


def grid_bfs(docs: rd.Dataset, *, depth: int, world: World,
             seed_mod: int = 101, cap: int = 63,
             x_col: str = "x", y_col: str = "y",
             id_col: str = "doc_id") -> pa.Table:
    """Multi-source BFS hop distance over the OCCUPIED-tile grid — the
    cost-distance / isochrone primitive: per occupied tile, the fewest
    4-connected steps (through occupied tiles only) to the nearest SEED
    tile (one containing a doc with doc_id % seed_mod == 0); tiles
    farther than ``cap`` hops (or unreachable) report -1.  The cap is
    part of the operator contract so the recursive-CTE oracle is depth-
    bounded (``oracle.grid_bfs_sql``).

    Plan: the same single-pass 4^depth-bounded partial merge as
    ``morans_i`` (counts + per-cell seed presence fold in the SAME
    exchange), then the wave expansion is O(cap) dense boolean stencil
    shifts on an n x n grid driver-side — integer hops, no floats, no
    per-cell Python.  At depths where the dense grid is too big, the
    frontier exchange is the distributed-CC pattern
    (``dedup.connected_components``); this operator pins the bounded-
    depth driver plan.

    Reference parity: neighborhood walk semantics of the ring gather in
    ``WorldPartition.hpp:196-212`` iterated to a distance field —
    cited for role, not ported."""
    n = 1 << depth
    from optimizing_ray.cells import encode2

    ix, iy, cnt, seeded = _cell_partials(
        docs, depth=depth, world=world, x_col=x_col, y_col=y_col,
        seed_mod=seed_mod, id_col=id_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("hops", pa.int64())])
    if len(ix) == 0:
        return schema.empty_table()
    occ = np.zeros((n, n), dtype=bool)
    occ[ix, iy] = True
    dist = np.full((n, n), -1, dtype=np.int64)
    frontier = np.zeros((n, n), dtype=bool)
    frontier[ix[seeded > 0], iy[seeded > 0]] = True
    dist[frontier] = 0
    for d in range(1, cap + 1):
        if not frontier.any():
            break
        nxt = np.zeros((n, n), dtype=bool)
        nxt[1:, :] |= frontier[:-1, :]
        nxt[:-1, :] |= frontier[1:, :]
        nxt[:, 1:] |= frontier[:, :-1]
        nxt[:, :-1] |= frontier[:, 1:]
        nxt &= occ & (dist < 0)
        dist[nxt] = d
        frontier = nxt
    key = encode2(ix.astype(np.uint64), iy.astype(np.uint64),
                  depth).astype(np.int64)
    order = np.argsort(key)
    return pa.table({"cell_key": pa.array(key[order]),
                     "n_docs": pa.array(cnt[order]),
                     "hops": pa.array(dist[ix, iy][order])},
                    schema=schema)


def _d8_flow(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Shared D8 routing over the n x n splitmix terrain: elevation
    e = splitmix64(lin) >> 1 and per-cell flow target = strictly-lower
    minimum-elevation 8-neighbour (tie -> lowest neighbour linear
    index; -1 = sink).  Offsets scan in (dx, dy) lex order, which IS
    neighbour-linear-index order, so numpy first-min implements the
    tiebreak.  Returns (elev flat int64, flow flat int64)."""
    from optimizing_ray.pipelines.sketches import splitmix64

    lin = np.arange(n * n, dtype=np.int64)
    elev = (splitmix64(lin.view(np.uint64)) >> np.uint64(1)).astype(np.int64)
    eg = elev.reshape(n, n)
    big = np.iinfo(np.int64).max
    best = np.full((n, n), big, dtype=np.int64)
    tgt = np.full((n, n), -1, dtype=np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            sx = slice(max(0, -dx), n - max(0, dx))
            tx = slice(max(0, dx), n + min(0, dx))
            sy = slice(max(0, -dy), n - max(0, dy))
            ty = slice(max(0, dy), n + min(0, dy))
            ne = eg[tx, ty]
            upd = ne < best[sx, sy]   # strict: first-min keeps lowest lin
            b = best[sx, sy]
            t = tgt[sx, sy]
            b[upd] = ne[upd]
            nlin = (lin.reshape(n, n))[tx, ty]
            t[upd] = nlin[upd]
    flow = np.where(best < eg, tgt, -1).ravel()
    return elev, flow


def flow_accumulation(docs: rd.Dataset, *, depth: int, world: World,
                      x_col: str = "x", y_col: str = "y") -> pa.Table:
    """D8 flow accumulation over the tile grid — the classic hydrology
    raster pair (O'Callaghan-Mark 1984): a deterministic ELEVATION
    field derives from each cell's linear index via splitmix64 (>> 1,
    int64-safe, SQL-twinnable); every cell flows to its strictly-lower
    minimum-elevation 8-neighbour (ties -> lowest neighbour linear
    index; no lower neighbour = sink), and each cell accumulates the
    doc-count "rain" of every upstream cell (its own included).
    Output cells with acc > 0: (cell_key, n_docs, acc, sink), key
    order.

    Strictly-lower flow makes the routing graph acyclic even under
    elevation ties, so the downstream walk terminates on both engines.

    Plan: the same single-pass 4^depth-bounded partial merge as
    ``morans_i`` for the rain field; routing is a dense vectorized
    8-neighbour argmin (offsets scanned in (dx, dy) lex order, which IS
    neighbour-linear-index order, so numpy first-min = the contract's
    tiebreak); accumulation visits cells once in elevation-descending
    order — O(4^depth) driver-side, bounded by construction (the
    at-scale path tiles the grid and iterates boundary flows, the
    grid_bfs note).  SQL twin ``oracle.flow_accumulation_sql``
    (recursive-CTE downstream closure from occupied cells)."""
    from optimizing_ray.cells import encode2
    from optimizing_ray.pipelines.sketches import splitmix64

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("acc", pa.int64()), ("sink", pa.int64())])
    if len(ix) == 0:
        return schema.empty_table()
    lin = np.arange(n * n, dtype=np.int64)
    elev, flow = _d8_flow(n)
    rain = np.zeros((n, n), dtype=np.int64)
    rain[ix, iy] = cnt
    acc = rain.ravel().copy()
    order = np.argsort(-elev, kind="stable")
    fo = flow[order]
    for i, f in zip(order.tolist(), fo.tolist()):
        if f >= 0 and acc[i]:
            acc[f] += acc[i]
    keep = acc > 0
    klin = lin[keep]
    key = encode2((klin // n).astype(np.uint64),
                  (klin % n).astype(np.uint64), depth).astype(np.int64)
    order2 = np.argsort(key)
    return pa.table({
        "cell_key": pa.array(key[order2]),
        "n_docs": pa.array(rain.ravel()[keep][order2]),
        "acc": pa.array(acc[keep][order2]),
        "sink": pa.array((flow[keep][order2] < 0).astype(np.int64))},
        schema=schema)


def local_morans(docs: rd.Dataset, *, depth: int, world: World,
                 x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Local Moran's I (LISA, Anselin 1995) per occupied tile — the
    hotspot/coldspot/outlier classifier that ``morans_i`` summarizes
    globally: I_i = z_i * lag_i / den * N with lag_i = sum of rook-
    neighbour deviations, z the morans_i integer scaling (z = N*n - S),
    den = sum(z^2).  z_i*lag_i is exact int64 under the same magnitude
    guard (object-int fallback); the ratio is the fixed three-op
    double, micro-rounded.  Positive lisa = value like its neighbours
    (hot-hot / cold-cold), negative = spatial outlier.  Output
    (cell_key, n_docs, z, lag, lisa_6), key order.

    Plan: identical to ``morans_i`` — one streaming count pass,
    4^depth-bounded driver fold, searchsorted rook gather; per-cell
    output instead of the global scalar.  SQL twin
    ``oracle.local_morans_sql``."""
    from optimizing_ray.cells import encode2

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("z", pa.int64()), ("lag", pa.int64()),
                        ("lisa_6", pa.int64())])
    nc = len(ix)
    if nc == 0:
        return schema.empty_table()
    tot = int(cnt.sum())
    wide = 4 * nc * (nc * tot) ** 2 >= (1 << 63)
    z = (nc * cnt.astype(object) - tot) if wide else (nc * cnt - tot)
    lin = ix * n + iy
    order = np.argsort(lin)
    lin_s, z_s = lin[order], z[order]
    lag = np.zeros(nc, dtype=object if wide else np.int64)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        jx, jy = ix + dx, iy + dy
        m = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
        tgt = jx[m] * n + jy[m]
        pos = np.minimum(np.searchsorted(lin_s, tgt), len(lin_s) - 1)
        hit = lin_s[pos] == tgt
        idx = np.flatnonzero(m)[hit]
        lag[idx] = lag[idx] + z_s[pos[hit]]
    den = int(np.dot(z, z))
    zl = z * lag
    if den == 0:
        lisa = np.zeros(nc, dtype=np.int64)
    else:
        r = (np.array([float(v) for v in zl]) / np.float64(den)
             * np.float64(nc))
        lisa = np.floor(r * 1e6 + 0.5).astype(np.int64)
    key = encode2(ix.astype(np.uint64), iy.astype(np.uint64),
                  depth).astype(np.int64)
    o2 = np.argsort(key)
    return pa.table({
        "cell_key": pa.array(key[o2]),
        "n_docs": pa.array(cnt[o2]),
        "z": pa.array(np.array([int(v) for v in z], np.int64)[o2]),
        "lag": pa.array(np.array([int(v) for v in lag], np.int64)[o2]),
        "lisa_6": pa.array(lisa[o2])}, schema=schema)


def viewshed(docs: rd.Dataset, *, depth: int, world: World,
             x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Viewshed analysis over the tile grid — the classic terrain
    visibility operator: from the OBSERVER cell (most documents; ties
    -> higher elevation, then lowest linear index) a target cell is
    visible iff no intermediate sample cell on the sight line rises
    strictly above the line.  Elevation is the 24-bit splitmix field
    e = splitmix64(lin) >> 40 (small enough that every blocking test
    e_c * D > e_v*(D-k) + e_t*k is exact int64 — no float, no sqrt).

    Sight-line discretization (identical on both engines): with
    di = tx - vx, dj = ty - vy, D = max(|di|, |dj|), sample k = 1..D-1
    at cell (vx + round_half_up(k*di/D), vy + round_half_up(k*dj/D))
    where round_half_up(a/b) = floor((2a + b) / (2b)) in exact integer
    floor division; samples landing on the observer or target cell
    don't block.  Output ALL grid cells: (cell_key, n_docs, elev,
    visible), key order.

    Plan: ONE bounded count pass (the morans_i merge); the line walk
    is a ragged vectorized gather over <= 4^depth * (n-1) samples
    driver-side, bounded by construction.  SQL twin
    ``oracle.viewshed_sql``."""
    from optimizing_ray.cells import encode2
    from optimizing_ray.pipelines.sketches import splitmix64

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("elev", pa.int64()), ("visible", pa.int64())])
    lin = np.arange(n * n, dtype=np.int64)
    elev = (splitmix64(lin.view(np.uint64)) >> np.uint64(40)).astype(np.int64)
    rain = np.zeros(n * n, dtype=np.int64)
    if len(ix):
        rain[ix * n + iy] = cnt
    # observer: max docs, then max elev, then lowest lin
    order = np.lexsort((lin, -elev, -rain))
    v = int(lin[order[0]])
    vx, vy = divmod(v, n)
    ve = int(elev[v])
    tx, ty = lin // n, lin % n
    di, dj = tx - vx, ty - vy
    D = np.maximum(np.abs(di), np.abs(dj))
    blocked = np.zeros(n * n, dtype=bool)
    walk = D >= 2
    if walk.any():
        wl = lin[walk]
        wD = D[walk]
        cnt_k = wD - 1
        cum = np.r_[0, np.cumsum(cnt_k)]
        ti = np.repeat(np.arange(len(wl)), cnt_k)
        k = np.arange(int(cum[-1]), dtype=np.int64) - cum[ti] + 1
        Dt = wD[ti]
        sx = vx + (2 * k * di[walk][ti] + Dt) // (2 * Dt)
        sy = vy + (2 * k * dj[walk][ti] + Dt) // (2 * Dt)
        slin = sx * n + sy
        te = elev[wl]
        blk = ((slin != v) & (slin != wl[ti])
               & (elev[slin] * Dt > ve * (Dt - k) + te[ti] * k))
        hits = np.zeros(len(wl), dtype=np.int64)
        np.add.at(hits, ti, blk.astype(np.int64))
        blocked[wl] = hits > 0
    visible = (~blocked).astype(np.int64)
    key = encode2((lin // n).astype(np.uint64),
                  (lin % n).astype(np.uint64), depth).astype(np.int64)
    o2 = np.argsort(key)
    return pa.table({"cell_key": pa.array(key[o2]),
                     "n_docs": pa.array(rain[o2]),
                     "elev": pa.array(elev[o2]),
                     "visible": pa.array(visible[o2])}, schema=schema)


def watershed_basins(docs: rd.Dataset, *, depth: int, world: World,
                     x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Watershed basin delineation — the companion of
    ``flow_accumulation``: every grid cell labels itself with the SINK
    its D8 flow path terminates in (basins partition the terrain), plus
    the hop count to that sink.  Output ALL cells: (cell_key, n_docs,
    basin_key, path_len), key order; basin_key is the sink's Morton
    key, sinks have path_len 0 and basin_key = own key.

    Plan: ONE bounded count pass for the doc column; the terminal walk
    is POINTER DOUBLING over the dense flow array (f2 = f[f], lengths
    add) — O(log path) rounds instead of per-cell chasing, the
    distributed-CC halving trick applied to a raster.  SQL twin
    ``oracle.watershed_basins_sql`` (recursive step walk)."""
    from optimizing_ray.cells import encode2

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("basin_key", pa.int64()), ("path_len", pa.int64())])
    lin = np.arange(n * n, dtype=np.int64)
    _, flow = _d8_flow(n)
    rain = np.zeros(n * n, dtype=np.int64)
    if len(ix):
        rain[ix * n + iy] = cnt
    # pointer doubling: sinks self-loop during the chase
    nxt = np.where(flow >= 0, flow, lin)
    steps = (flow >= 0).astype(np.int64)
    while True:
        n2 = nxt[nxt]
        if (n2 == nxt).all():
            break
        steps = steps + steps[nxt]
        nxt = n2
    def mkey(v: np.ndarray) -> np.ndarray:
        return encode2((v // n).astype(np.uint64),
                       (v % n).astype(np.uint64), depth).astype(np.int64)
    key = mkey(lin)
    basin = mkey(nxt)
    o2 = np.argsort(key)
    return pa.table({"cell_key": pa.array(key[o2]),
                     "n_docs": pa.array(rain[o2]),
                     "basin_key": pa.array(basin[o2]),
                     "path_len": pa.array(steps[o2])}, schema=schema)


def slope_aspect(docs: rd.Dataset, *, depth: int, world: World,
                 x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Slope / aspect over the splitmix terrain (Horn 1981) — the
    classic DEM derivative: per INTERIOR cell the 3x3 Horn gradient
    gx = (E column weighted 1-2-1) - (W column), gy likewise N-S, the
    squared magnitude g2 = gx^2 + gy^2 (all exact int64 over the
    24-bit elevations e = splitmix64(lin) >> 40), and the discrete D8
    ASPECT: the index k in lex (dx, dy) offset order of the neighbour
    direction minimizing the uphill dot gx*dx + gy*dy (the steepest
    DESCENT octant; ties -> lowest k, flat gradients land on k = 0).
    Output interior cells only (Horn needs all 8 neighbours):
    (cell_key, n_docs, gx, gy, g2, aspect), key order.

    Plan: ONE bounded count pass (the morans_i merge) + a dense
    4^depth driver stencil — same shape as ``viewshed``.  SQL twin
    ``oracle.slope_aspect_sql`` (weighted 8-neighbour join +
    ROW_NUMBER octant pick)."""
    from optimizing_ray.cells import encode2
    from optimizing_ray.pipelines.sketches import splitmix64

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("gx", pa.int64()), ("gy", pa.int64()),
                        ("g2", pa.int64()), ("aspect", pa.int64())])
    if n < 3:
        return schema.empty_table()
    lin = np.arange(n * n, dtype=np.int64)
    elev = (splitmix64(lin.view(np.uint64)) >> np.uint64(40)).astype(np.int64)
    eg = elev.reshape(n, n)
    rain = np.zeros(n * n, dtype=np.int64)
    if len(ix):
        rain[ix * n + iy] = cnt
    gx = ((eg[2:, :-2] + 2 * eg[2:, 1:-1] + eg[2:, 2:])
          - (eg[:-2, :-2] + 2 * eg[:-2, 1:-1] + eg[:-2, 2:])).ravel()
    gy = ((eg[:-2, 2:] + 2 * eg[1:-1, 2:] + eg[2:, 2:])
          - (eg[:-2, :-2] + 2 * eg[1:-1, :-2] + eg[2:, :-2])).ravel()
    g2 = gx * gx + gy * gy
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    dots = np.stack([gx * dx + gy * dy for dx, dy in offs])
    aspect = np.argmin(dots, axis=0).astype(np.int64)  # first-min = low k
    iix, iiy = np.meshgrid(np.arange(1, n - 1), np.arange(1, n - 1),
                           indexing="ij")
    ilin = (iix * n + iiy).ravel()
    key = encode2(iix.ravel().astype(np.uint64),
                  iiy.ravel().astype(np.uint64), depth).astype(np.int64)
    o2 = np.argsort(key)
    return pa.table({"cell_key": pa.array(key[o2]),
                     "n_docs": pa.array(rain[ilin][o2]),
                     "gx": pa.array(gx[o2]), "gy": pa.array(gy[o2]),
                     "g2": pa.array(g2[o2]),
                     "aspect": pa.array(aspect[o2])}, schema=schema)


def getis_ord(docs: rd.Dataset, *, depth: int, world: World,
              x_col: str = "x", y_col: str = "y") -> pa.Table:
    """Getis-Ord Gi* hotspot statistic per OCCUPIED tile — the
    companion of ``local_morans``: with binary rook+self weights over
    the occupied-cell set, wi = neighbourhood size, si = neighbourhood
    doc sum, and the nc-scaled numerator num = nc*si - tot*wi (exact
    integer — it is sum of z over the neighbourhood under the morans_i
    scaling z = nc*x - tot).  gi_6 = micro-rounded
    num / sqrt(B*wi*(nc-wi) / (nc-1)) with B = nc*sumsq - tot^2
    (exact Python-int products; the float tail is the fixed op chain
    divide -> sqrt -> divide, identical in SQL).  Positive = hotspot
    (high values cluster), negative = coldspot.  Output (cell_key,
    n_docs, wi, si, num, gi_6), key order.

    Plan: identical to ``morans_i`` — one streaming count pass,
    4^depth-bounded driver fold, searchsorted rook gather.  SQL twin
    ``oracle.getis_ord_sql``."""
    import math

    from optimizing_ray.cells import encode2

    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("wi", pa.int64()), ("si", pa.int64()),
                        ("num", pa.int64()), ("gi_6", pa.int64())])
    nc = len(ix)
    if nc == 0:
        return schema.empty_table()
    tot = int(cnt.sum())
    lin = ix * n + iy
    order = np.argsort(lin)
    lin_s, cnt_s = lin[order], cnt[order]
    si = cnt.astype(np.int64).copy()
    wi = np.ones(nc, dtype=np.int64)
    for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        jx, jy = ix + dx, iy + dy
        m = (jx >= 0) & (jx < n) & (jy >= 0) & (jy < n)
        tgt = jx[m] * n + jy[m]
        pos = np.minimum(np.searchsorted(lin_s, tgt), len(lin_s) - 1)
        hit = lin_s[pos] == tgt
        idx = np.flatnonzero(m)[hit]
        si[idx] += cnt_s[pos[hit]]
        wi[idx] += 1
    # num = sum of z over the neighbourhood; wide guard as local_morans
    wide = 6 * nc * tot >= (1 << 63)
    if wide:
        num = np.array([nc * int(s) - tot * int(w)
                        for s, w in zip(si, wi)], dtype=object)
    else:
        num = nc * si - tot * wi
    sumsq = int(np.dot(cnt.astype(object), cnt.astype(object)))
    bb = nc * sumsq - tot * tot        # nc^2 * variance numerator, >= 0
    gi = np.zeros(nc, dtype=np.int64)
    for i in range(nc):
        c = bb * int(wi[i]) * (nc - int(wi[i]))   # exact Python int
        if c == 0:
            continue
        r = float(int(num[i])) / math.sqrt(float(c) / float(nc - 1))
        gi[i] = int(math.floor(r * 1e6 + 0.5))
    key = encode2(ix.astype(np.uint64), iy.astype(np.uint64),
                  depth).astype(np.int64)
    o2 = np.argsort(key)
    return pa.table({
        "cell_key": pa.array(key[o2]),
        "n_docs": pa.array(cnt.astype(np.int64)[o2]),
        "wi": pa.array(wi[o2]), "si": pa.array(si[o2]),
        "num": pa.array(np.array([int(v) for v in num], np.int64)[o2]),
        "gi_6": pa.array(gi[o2])}, schema=schema)


def contour_cells(docs: rd.Dataset, *, depth: int, world: World,
                  threshold: int = 3, x_col: str = "x", y_col: str = "y",
                  id_col: str = "doc_id") -> pa.Table:
    """Marching-squares contour extraction over the occupied-tile count
    grid — the iso-density band of the classic cartographic contour
    algorithm: every 2x2 corner block whose corners STRADDLE the
    density threshold (count >= threshold = inside), with the standard
    marching-squares case code

        ms_case = c0 + 2*c1 + 4*c2 + 8*c3
        corners: c0=(bx,by) c1=(bx+1,by) c2=(bx+1,by+1) c3=(bx,by+1)

    All-integer (counts vs an integer threshold — no interpolation
    ambiguity, both engines agree bit-for-bit); uniform blocks (case 0
    and 15) don't emit.  Output (bx, by, ms_case), (bx, by) order.

    Plan: the morans_i shape — ONE streaming partial-count pass with a
    4^depth-bounded driver merge, then the block classification is
    four boolean shifts on the dense grid; no shuffle.  SQL twin
    ``oracle.contour_cells_sql`` (4 offset LEFT JOINs over the block
    lattice)."""
    n = 1 << depth
    ix, iy, cnt = _cell_partials(docs, depth=depth, world=world,
                                 x_col=x_col, y_col=y_col)
    grid = np.zeros((n, n), np.int64)
    grid[ix, iy] = cnt
    inside = grid >= threshold
    case = (inside[:-1, :-1].astype(np.int64)
            + 2 * inside[1:, :-1]
            + 4 * inside[1:, 1:]
            + 8 * inside[:-1, 1:])
    bx, by = np.nonzero((case > 0) & (case < 15))
    order = np.lexsort((by, bx))
    return pa.table({"bx": pa.array(bx[order].astype(np.int64)),
                     "by": pa.array(by[order].astype(np.int64)),
                     "ms_case": pa.array(case[bx, by][order])})


def cost_distance(docs: rd.Dataset, *, depth: int, world: World,
                  seed_mod: int = 101, rounds: int = 12,
                  cost_mod: int = 8, x_col: str = "x", y_col: str = "y",
                  id_col: str = "doc_id") -> pa.Table:
    """WEIGHTED cost-distance over the occupied-tile grid — the
    Bellman-Ford companion of ``grid_bfs`` (whose uniform unit step
    this generalizes): entering a cell costs its deterministic terrain
    cost 1 + (splitmix64(lin) % cost_mod), paths are 4-connected
    through OCCUPIED cells from the nearest SEED tile (doc_id %
    seed_mod == 0; seeds cost 0 to stand on), and exactly ``rounds``
    synchronous relaxation rounds run — the round count is PART OF THE
    OPERATOR CONTRACT (the grid_bfs cap discipline) so the SQL twin is
    the same fixed unrolled chain (the pagerank pattern: one min-join
    CTE pair per round, no recursion).  Cells unreached in ``rounds``
    relaxations report -1.  All-integer.

    Plan: ONE streaming bounded count pass (the morans_i merge), then
    the relaxation is `rounds` vectorized 4-shift min folds on dense
    4^depth arrays driver-side; at depths past the dense-grid budget
    the frontier exchange is the distributed-CC shape (documented, as
    for grid_bfs).  Output (cell_key, n_docs, cell_cost, dist), Morton
    order.  SQL twin ``oracle.cost_distance_sql``."""
    from optimizing_ray.cells import encode2
    from optimizing_ray.pipelines.sketches import splitmix64

    n = 1 << depth
    ix, iy, cnt, seeded = _cell_partials(docs, depth=depth, world=world,
                                         x_col=x_col, y_col=y_col,
                                         seed_mod=seed_mod, id_col=id_col)
    schema = pa.schema([("cell_key", pa.int64()), ("n_docs", pa.int64()),
                        ("cell_cost", pa.int64()), ("dist", pa.int64())])
    if len(ix) == 0:
        return schema.empty_table()
    lin = np.arange(n * n, dtype=np.uint64)
    cost_flat = (1 + (splitmix64(lin) % np.uint64(cost_mod))
                 ).astype(np.int64)
    cost = cost_flat.reshape(n, n)  # lin = ix * n + iy (row-major)
    occ = np.zeros((n, n), dtype=bool)
    occ[ix, iy] = True
    INF = np.int64(1) << 60
    dist = np.full((n, n), INF, dtype=np.int64)
    dist[ix[seeded > 0], iy[seeded > 0]] = 0
    for _ in range(rounds):
        best = dist.copy()
        best[1:, :] = np.minimum(best[1:, :], dist[:-1, :] + cost[1:, :])
        best[:-1, :] = np.minimum(best[:-1, :], dist[1:, :] + cost[:-1, :])
        best[:, 1:] = np.minimum(best[:, 1:], dist[:, :-1] + cost[:, 1:])
        best[:, :-1] = np.minimum(best[:, :-1], dist[:, 1:] + cost[:, :-1])
        best[~occ] = INF
        if np.array_equal(best, dist):
            break
        dist = best
    out = dist[ix, iy]
    out = np.where(out >= INF, -1, out)
    key = encode2(ix.astype(np.uint64), iy.astype(np.uint64),
                  depth).astype(np.int64)
    order = np.argsort(key)
    return pa.table({"cell_key": pa.array(key[order]),
                     "n_docs": pa.array(cnt[order]),
                     "cell_cost": pa.array(cost[ix, iy][order]),
                     "dist": pa.array(out[order])}, schema=schema)

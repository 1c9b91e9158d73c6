"""Polygon-polygon intersection join (convex SAT).

The polygon-overlay primitive: a LARGE stream of per-doc convex polygons
(fixed pentagon shape, per-doc anisotropic scale — ``driver_tables.
derive_doc_polygons_batch``) joined against a small broadcast zone table
(convex rings).  Two convex polygons intersect iff NO separating axis
exists among the edge normals of either polygon (the separating-axis
theorem, exact for convex shapes); the engine evaluates exactly the
projections and STRICT comparisons of ``oracle.poly_overlap_join_sql``,
so the pair set matches the DuckDB twin bit-for-bit.

Plan shape: zones broadcast once (they are the small side by
construction); each doc batch is bbox-prefiltered per zone (conservative:
disjoint bboxes imply SAT separation for convex shapes) and the SAT
kernel runs vectorized over the candidates — zero shuffles, one
streaming pass.  The reference analogue is the broadcast box join
(J1) with the box predicate upgraded to an exact convex overlap test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from optimizing_ray.pipelines.pip import compile_polygons
from optimizing_ray.sources.driver_tables import PENT_UX, PENT_UY

__all__ = ["poly_overlap_join", "polygon_cover", "polygon_cover_arrays",
           "polygon_stats", "segment_intersection_join"]


def polygon_stats(docs: rd.Dataset, *, id_col: str = "doc_id",
                  micro: float = 1e6) -> rd.Dataset:
    """Per-polygon shoelace area and area centroid — the vector-layer
    measurement primitive (ST_Area / ST_Centroid over the per-doc
    pentagons).  Output (doc_id, area2_micro, cx_micro, cy_micro):
    twice the signed area (positive: the unit pentagon is CCW and
    sx, sy > 0 preserve orientation) and the polygon centroid
    Cx = sum (xj + xj1) * cross_j / (3 * A2), all micro-rounded with
    floor(v * 1e6 + 0.5).

    Float discipline: every term is evaluated in ONE FIXED op order
    (left-associated sums over the 5 fixed vertices), identical to the
    SQL expression of ``oracle.polygon_stats_sql`` — same IEEE ops in
    the same order produce bit-identical float64, so the micro-rounded
    integers match exactly (the geometry-derivation lockstep rule).
    Zero shuffles: a pure streaming map over the corpus."""

    def stats(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "area2_micro": pa.array([], pa.int64()),
                          "cx_micro": pa.array([], pa.int64()),
                          "cy_micro": pa.array([], pa.int64())})
        if t.num_rows == 0 or "sx" not in t.column_names:
            return empty
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        vx = [x + sx * np.float64(u) for u in PENT_UX]
        vy = [y + sy * np.float64(u) for u in PENT_UY]
        cr = [vx[j] * vy[(j + 1) % 5] - vx[(j + 1) % 5] * vy[j]
              for j in range(5)]
        a2 = ((((cr[0] + cr[1]) + cr[2]) + cr[3]) + cr[4])
        tx = [(vx[j] + vx[(j + 1) % 5]) * cr[j] for j in range(5)]
        ty = [(vy[j] + vy[(j + 1) % 5]) * cr[j] for j in range(5)]
        nx = ((((tx[0] + tx[1]) + tx[2]) + tx[3]) + tx[4])
        ny = ((((ty[0] + ty[1]) + ty[2]) + ty[3]) + ty[4])
        cx = nx / (3.0 * a2)
        cy = ny / (3.0 * a2)
        return pa.table({
            id_col: t[id_col],
            "area2_micro": pa.array(np.floor(a2 * micro + 0.5)
                                    .astype(np.int64)),
            "cx_micro": pa.array(np.floor(cx * micro + 0.5)
                                 .astype(np.int64)),
            "cy_micro": pa.array(np.floor(cy * micro + 0.5)
                                 .astype(np.int64))})

    return docs.map_batches(stats, batch_format="pyarrow",
                            zero_copy_batch=True)


def _sat_hits(vx: np.ndarray, vy: np.ndarray, zx: np.ndarray,
              zy: np.ndarray) -> np.ndarray:
    """SAT for n candidate pentagons (vx, vy: (n, 5)) vs ONE zone ring
    (zx, zy: (V,)).  Returns a boolean intersect mask of shape (n,)."""
    n = vx.shape[0]
    sep = np.zeros(n, dtype=bool)
    V = len(zx)
    # zone-edge axes (V scalar normals)
    for i in range(V):
        j = (i + 1) % V
        nx = -(zy[j] - zy[i])
        ny = zx[j] - zx[i]
        zp = nx * zx + ny * zy
        zmin, zmax = zp.min(), zp.max()
        p = nx * vx + ny * vy
        pmin, pmax = p.min(axis=1), p.max(axis=1)
        sep |= (pmax < zmin) | (zmax < pmin)
    # pentagon-edge axes (5 per candidate, from the COMPUTED verts)
    for i in range(vx.shape[1]):
        j = (i + 1) % vx.shape[1]
        nx = -(vy[:, j] - vy[:, i])
        ny = vx[:, j] - vx[:, i]
        q = nx[:, None] * vx + ny[:, None] * vy
        qmin, qmax = q.min(axis=1), q.max(axis=1)
        r = nx[:, None] * zx[None, :] + ny[:, None] * zy[None, :]
        rmin, rmax = r.min(axis=1), r.max(axis=1)
        sep |= (qmax < rmin) | (rmax < qmin)
    return ~sep


def poly_overlap_join(docs: rd.Dataset, zones: pa.Table, *,
                      batch_size: int | None = None) -> rd.Dataset:
    """(poly_id, doc_id) for every (zone, doc-pentagon) pair whose convex
    shapes intersect.  ``docs`` must carry (doc_id, x, y, sx, sy)."""
    zones_ref = ray.put(compile_polygons(zones))
    from optimizing_ray.broadcast import cached
    ux = np.asarray(PENT_UX)
    uy = np.asarray(PENT_UY)

    def join_batch(t: pa.Table) -> pa.Table:
        empty = pa.table({"poly_id": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64())})
        if t.num_rows == 0 or "sx" not in t.column_names:
            return empty
        zps = cached(("poly_join", zones_ref.hex()),
                     lambda: ray.get(zones_ref))
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        vx = x[:, None] + sx[:, None] * ux[None, :]
        vy = y[:, None] + sy[:, None] * uy[None, :]
        bx0, bx1 = vx.min(axis=1), vx.max(axis=1)
        by0, by1 = vy.min(axis=1), vy.max(axis=1)
        out_pid: list[str] = []
        out_rows: list[np.ndarray] = []
        for pid, zx, zy in zps:
            cand = np.flatnonzero(~((bx1 < zx.min()) | (zx.max() < bx0)
                                    | (by1 < zy.min()) | (zy.max() < by0)))
            if len(cand) == 0:
                continue
            hit = _sat_hits(vx[cand], vy[cand], zx, zy)
            rows = cand[hit]
            if len(rows):
                out_pid.extend([pid] * len(rows))
                out_rows.append(rows)
        if not out_rows:
            return empty
        rows = np.concatenate(out_rows)
        return pa.table({"poly_id": pa.array(out_pid, pa.string()),
                         "doc_id": t["doc_id"].take(pa.array(rows))})

    return docs.map_batches(join_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)


# --- adaptive polygon region cover (S2 RegionCoverer twin) ------------------
#
# The north star names "compiled S2 region coverers"; ``cells.
# adaptive_cover2`` is the BOX coverer (the reference's recursive search,
# ``DynamicOctree.hpp:146-171``).  This is the polygon one: a mixed-depth
# cell cover of every convex polygon in a stream — BFS down the quadkey
# hierarchy, a cell fully inside the polygon is emitted as full_cover=1
# and not split; a cell merely overlapping splits until max_depth, where
# it is emitted as full_cover=0 (the residual-predicate ring).  Cell-vs-
# convex-polygon classification is exact: SAT over the cell's two axes +
# the polygon's edge normals for disjointness; all-corners half-plane
# tests for containment, in closed form via the center +- halfwidth
# projection.  Every float expression is in ``oracle.polygon_cover_sql``'s
# exact op order (cell bounds derive from (ix, iy, depth) by the same
# wmin + ix*cw formula on both sides), so the cover matches the DuckDB
# closure twin bit-for-bit.


def polygon_cover_arrays(vx: np.ndarray, vy: np.ndarray, world,
                         max_depth: int):
    """Vectorized BFS cover of n convex polygons (vx, vy: (n, k) vertex
    matrices, CCW winding so (-(dy), dx) normals point inward).  Returns
    (row, depth, ix, iy, full) int64/bool arrays — one row per emitted
    cell per polygon, cells within the world box only."""
    n, k = vx.shape
    wx = world.max_x - world.min_x
    wy = world.max_y - world.min_y
    # edge axes + offsets (oracle `axes` CTE op order)
    nx = -(np.roll(vy, -1, axis=1) - vy)
    ny = np.roll(vx, -1, axis=1) - vx
    c = nx * vx + ny * vy
    # polygon projections onto its own axes (order-free min/max)
    proj = nx[:, :, None] * vx[:, None, :] + ny[:, :, None] * vy[:, None, :]
    pmin = proj.min(axis=2)
    pmax = proj.max(axis=2)
    bminx = vx.min(axis=1); bmaxx = vx.max(axis=1)
    bminy = vy.min(axis=1); bmaxy = vy.max(axis=1)

    rows = np.arange(n, dtype=np.int64)
    f_row = rows
    f_ix = np.zeros(n, dtype=np.int64)
    f_iy = np.zeros(n, dtype=np.int64)
    out_row, out_d, out_ix, out_iy, out_full = [], [], [], [], []
    for d in range(max_depth + 1):
        if len(f_row) == 0:
            break
        cw = wx / (1 << d)   # Python-float per depth, inlined in the oracle
        ch = wy / (1 << d)
        cminx = world.min_x + f_ix * cw
        cmaxx = world.min_x + (f_ix + 1) * cw
        cminy = world.min_y + f_iy * ch
        cmaxy = world.min_y + (f_iy + 1) * ch
        ccx = (cminx + cmaxx) * 0.5
        ccy = (cminy + cmaxy) * 0.5
        hx = (cmaxx - cminx) * 0.5
        hy = (cmaxy - cminy) * 0.5
        g = f_row
        cd = nx[g] * ccx[:, None] + ny[g] * ccy[:, None]
        r = np.abs(nx[g]) * hx[:, None] + np.abs(ny[g]) * hy[:, None]
        sep = ((bmaxx[g] < cminx) | (cmaxx < bminx[g])
               | (bmaxy[g] < cminy) | (cmaxy < bminy[g])
               | ((cd + r) < pmin[g]).any(axis=1)
               | (pmax[g] < (cd - r)).any(axis=1))
        ins = ((cd - r) >= c[g]).all(axis=1)
        emit = ins
        if d == max_depth:
            emit = ins | (~ins & ~sep)
        if emit.any():
            out_row.append(g[emit]); out_ix.append(f_ix[emit])
            out_iy.append(f_iy[emit])
            out_d.append(np.full(int(emit.sum()), d, dtype=np.int64))
            out_full.append(ins[emit])
        if d == max_depth:
            break
        split = ~ins & ~sep
        if not split.any():
            f_row = f_row[:0]
            continue
        sr = f_row[split]; sx_ = f_ix[split]; sy_ = f_iy[split]
        f_row = np.repeat(sr, 4)
        f_ix = (np.repeat(sx_ * 2, 4)
                + np.tile(np.array([0, 1, 0, 1], dtype=np.int64), len(sr)))
        f_iy = (np.repeat(sy_ * 2, 4)
                + np.tile(np.array([0, 0, 1, 1], dtype=np.int64), len(sr)))
    if not out_row:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z, np.empty(0, dtype=bool)
    return (np.concatenate(out_row), np.concatenate(out_d),
            np.concatenate(out_ix), np.concatenate(out_iy),
            np.concatenate(out_full))


def polygon_cover(docs: rd.Dataset, *, max_depth: int = 7,
                  world=None) -> rd.Dataset:
    """Adaptive mixed-depth cell cover of every doc pentagon (columns
    x, y, sx, sy from ``derive_doc_polygons_batch``): one vectorized
    map leg, zero shuffles — each batch BFS-covers all its polygons at
    once.  Output (doc_id, depth, cell_ix, cell_iy, full_cover) rows."""
    from optimizing_ray.config import WORLD_2D
    w = world or WORLD_2D
    ux = np.asarray(PENT_UX); uy = np.asarray(PENT_UY)

    def cover(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "depth": z, "cell_ix": z,
                             "cell_iy": z, "full_cover": z})
        x = t["x"].to_numpy(); y = t["y"].to_numpy()
        sx = t["sx"].to_numpy(); sy = t["sy"].to_numpy()
        # oracle `pv` CTE op order: x + sx * ux_j
        vx = x[:, None] + sx[:, None] * ux[None, :]
        vy = y[:, None] + sy[:, None] * uy[None, :]
        row, d, ix, iy, full = polygon_cover_arrays(vx, vy, w, max_depth)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[row]),
                         "depth": pa.array(d),
                         "cell_ix": pa.array(ix),
                         "cell_iy": pa.array(iy),
                         "full_cover": pa.array(full.astype(np.int64))})

    return docs.map_batches(cover, batch_format="pyarrow",
                            zero_copy_batch=True)


def segment_intersection_join(docs: rd.Dataset, *, depth: int, world,
                              id_col: str = "doc_id", scale: int = 16,
                              n_shards: int | None = None) -> pa.Table:
    """Segment-segment proper-intersection self-join (ST_Intersects for
    local trip linestrings): every pair of docs whose QUANTIZED
    segments (floor(v*scale), power-of-two scale — the kmeans quantize
    discipline) strictly cross: the four orientation cross products
    have opposite strict signs pairwise.  All-integer predicate —
    bit-identical to the brute SQL twin
    ``oracle.segment_intersections_sql``.  Output (doc_a, doc_b),
    a < b, sorted.

    Plan: each segment emits its <= 4 bbox cover cells IN INTEGER cell
    arithmetic (cell = clip(floor(q*n / WQ)) over the quantized coords
    — the same monotone rule both endpoints use, so two crossing
    segments always share the intersection point's cell); candidates
    meet on ONE hash(cell) exchange (per-cell vectorized all-pairs
    orientation tests, cells are Chebyshev-local so membership is
    bounded); duplicate pair emissions from shared cells dedup on a
    second hash(pair) exchange; the driver concat is the result set."""
    import pandas as pd

    from optimizing_ray.config import resolve_shards

    n_shards = resolve_shards(n_shards)
    n = 1 << depth
    wx, wy, _ = world.size
    wqx = int(round(wx * scale))
    wqy = int(round(wy * scale))
    minqx = int(round(world.min_x * scale))
    minqy = int(round(world.min_y * scale))
    gold = np.uint64(0x9E3779B97F4A7C15)
    emit_schema = pa.schema([
        ("cell", pa.int64()), ("doc", pa.int64()),
        ("ax0", pa.int64()), ("ay0", pa.int64()),
        ("ax1", pa.int64()), ("ay1", pa.int64()),
        ("_shard", pa.int64())])

    def cell_of(q: np.ndarray, minq: int, wq: int) -> np.ndarray:
        return np.clip(((q - minq) * n) // wq, 0, n - 1)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "x1" not in t.column_names:
            return emit_schema.empty_table()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = {}
        for c in ("x", "y", "x1", "y1"):
            q[c] = np.floor(t[c].to_numpy(zero_copy_only=False)
                            * float(scale)).astype(np.int64)
        cx0 = cell_of(np.minimum(q["x"], q["x1"]), minqx, wqx)
        cx1 = cell_of(np.maximum(q["x"], q["x1"]), minqx, wqx)
        cy0 = cell_of(np.minimum(q["y"], q["y1"]), minqy, wqy)
        cy1 = cell_of(np.maximum(q["y"], q["y1"]), minqy, wqy)
        reps = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(reps.sum())
        row = np.repeat(np.arange(len(ids), dtype=np.int64), reps)
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, reps)
        nxs = np.repeat(cx1 - cx0 + 1, reps)
        px = np.repeat(cx0, reps) + local % nxs
        py = np.repeat(cy0, reps) + local // nxs
        cell = px * n + py
        with np.errstate(over="ignore"):
            sh = (cell.astype(np.uint64) * gold) >> np.uint64(33)
        return pa.table({
            "cell": pa.array(cell), "doc": pa.array(ids[row]),
            "ax0": pa.array(q["x"][row]), "ay0": pa.array(q["y"][row]),
            "ax1": pa.array(q["x1"][row]), "ay1": pa.array(q["y1"][row]),
            "_shard": pa.array((sh % np.uint64(n_shards))
                               .astype(np.int64))})

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64),
                              "_s2": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        cell = g["cell"].to_numpy(np.int64)
        order = np.argsort(cell, kind="stable")
        g = g.iloc[order]
        cell = cell[order]
        doc = g["doc"].to_numpy(np.int64)
        P = {c: g[c].to_numpy(np.int64)
             for c in ("ax0", "ay0", "ax1", "ay1")}
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        ends = np.r_[starts[1:], len(cell)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            iu, iv = np.triu_indices(m, 1)
            iu += s
            iv += s
            bx = P["ax1"][iv] - P["ax0"][iv]
            by = P["ay1"][iv] - P["ay0"][iv]
            d1 = (bx * (P["ay0"][iu] - P["ay0"][iv])
                  - by * (P["ax0"][iu] - P["ax0"][iv]))
            d2 = (bx * (P["ay1"][iu] - P["ay0"][iv])
                  - by * (P["ax1"][iu] - P["ax0"][iv]))
            ax = P["ax1"][iu] - P["ax0"][iu]
            ay = P["ay1"][iu] - P["ay0"][iu]
            d3 = (ax * (P["ay0"][iv] - P["ay0"][iu])
                  - ay * (P["ax0"][iv] - P["ax0"][iu]))
            d4 = (ax * (P["ay1"][iv] - P["ay0"][iu])
                  - ay * (P["ax1"][iv] - P["ax0"][iu]))
            hit = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
            if hit.any():
                da, db = doc[iu[hit]], doc[iv[hit]]
                out_a.append(np.minimum(da, db))
                out_b.append(np.maximum(da, db))
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        with np.errstate(over="ignore"):
            sh = ((a.astype(np.uint64) * gold)
                  ^ (b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9))) \
                >> np.uint64(33)
        return pd.DataFrame({"a": a, "b": b,
                             "_s2": (sh % np.uint64(n_shards))
                             .astype(np.int64)})

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                              "doc_b": pd.Series([], dtype=np.int64)})
        if len(g) == 0:
            return empty
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        return pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]})

    out = (docs.map_batches(emit, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_shard").map_groups(per_cell, batch_format="pandas")
           .groupby("_s2").map_groups(dedup, batch_format="pandas")
           .to_pandas())
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    if len(out) == 0 or "doc_a" not in out.columns:
        return schema.empty_table()
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False, schema=schema)

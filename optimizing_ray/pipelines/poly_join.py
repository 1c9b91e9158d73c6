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
           "polygon_stats"]


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

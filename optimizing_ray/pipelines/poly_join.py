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

__all__ = ["poly_overlap_join"]


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

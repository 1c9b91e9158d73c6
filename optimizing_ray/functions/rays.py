"""Ray-intersection kernels (M6/M7) — vectorized numpy.

Semantics match the reference tracer:
* ``ray_aabb`` — slab test returning the entry distance, 0 when missed
  (``Raytracing.hpp:267-289``): intervals per axis, inclusive overlap;
  rays starting inside return the EXIT distance (tmin < 0 -> tmax).
* ``ray_sphere`` — quadratic discriminant test returning the nearest
  positive root within eps, else 0 (``Raytracing.hpp:291-348``).
* ``clamp01`` / ``gamma_u8`` — the color projection (clamp, gamma 1/2.2,
  quantize, ``Raytracing.hpp:250-265``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ray_aabb", "ray_sphere", "clamp01", "gamma_u8"]

_EPS = 1e-4


def ray_aabb(ox, oy, oz, dx, dy, dz,
             min_x, min_y, min_z, max_x, max_y, max_z) -> np.ndarray:
    """Entry distance of ray (o + t*d) into each AABB; 0 when missed.
    Broadcasts ray components against box arrays."""
    ox, oy, oz = (np.asarray(v, dtype=np.float64) for v in (ox, oy, oz))
    dx, dy, dz = (np.asarray(v, dtype=np.float64) for v in (dx, dy, dz))
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz
        t1 = (min_x - ox) * inv_x
        t2 = (max_x - ox) * inv_x
        t3 = (min_y - oy) * inv_y
        t4 = (max_y - oy) * inv_y
        t5 = (min_z - oz) * inv_z
        t6 = (max_z - oz) * inv_z
    tmin = np.maximum(np.maximum(np.minimum(t1, t2), np.minimum(t3, t4)),
                      np.minimum(t5, t6))
    tmax = np.minimum(np.minimum(np.maximum(t1, t2), np.maximum(t3, t4)),
                      np.maximum(t5, t6))
    hit = (tmax >= np.maximum(tmin, 0.0))
    t = np.where(tmin < 0.0, tmax, tmin)
    return np.where(hit, t, 0.0)


def ray_sphere(ox, oy, oz, dx, dy, dz, cx, cy, cz, r) -> np.ndarray:
    """Nearest positive intersection distance with spheres; 0 when missed."""
    lx, ly, lz = cx - ox, cy - oy, cz - oz
    b = lx * dx + ly * dy + lz * dz
    det = b * b - (lx * lx + ly * ly + lz * lz) + r * r
    sq = np.sqrt(np.maximum(det, 0.0))
    t_near = b - sq
    t_far = b + sq
    t = np.where(t_near > _EPS, t_near, np.where(t_far > _EPS, t_far, 0.0))
    return np.where(det >= 0.0, t, 0.0)


def clamp01(v) -> np.ndarray:
    return np.clip(v, 0.0, 1.0)


def gamma_u8(v) -> np.ndarray:
    """clamp -> gamma 1/2.2 -> quantize to uint8 (+0.5 rounding like the
    reference's ``int(pow(x, 1/2.2) * 255 + .5)``)."""
    return (np.power(clamp01(v), 1.0 / 2.2) * 255.0 + 0.5).astype(np.uint8)

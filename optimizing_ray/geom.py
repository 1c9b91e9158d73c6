"""Vectorized AABB geometry kernels (pure numpy, no Ray).

Two predicate families, matching the reference exactly:

* 3D family (``BoundaryBox.hpp:42-56``): every comparison is
  boundary-INCLUSIVE — ``contains(point)``, ``overlaps(box)``,
  ``contains(box)``.
* 2D family (``.Test/QuadTree.cpp:40-68``): ``contains(point)`` is
  half-open (``>= min``, ``< max``); ``contains(rect)`` is strict on the
  far edge; ``overlaps(rect)`` is mixed — strict on ``min < other.max``,
  inclusive on ``max >= other.min``.

Boxes are given as separate coordinate arrays (struct-of-arrays), the
layout used in Arrow batches, so every predicate is a single vectorized
boolean expression with numpy broadcasting.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "overlaps3",
    "contains_point3",
    "contains_box3",
    "overlaps2_ref",
    "contains_point2_ref",
    "contains_rect2_ref",
    "bounding_box",
]


def bounding_box(x, y, z, w, h, d):
    """Derive the AABB of (position, size) rows: min=pos, max=pos+size.

    Mirrors ``SpatialObject::getBoundingBox`` (``BoundaryBox.hpp:102-105``)
    including the min/max normalization of the ctor (``BoundaryBox.hpp:18-38``)
    so negative sizes are handled identically.
    """
    x2, y2, z2 = x + w, y + h, z + d
    return (
        np.minimum(x, x2), np.minimum(y, y2), np.minimum(z, z2),
        np.maximum(x, x2), np.maximum(y, y2), np.maximum(z, z2),
    )


# --- 3D (boundary-inclusive) family: BoundaryBox.hpp:42-56 ---------------

def overlaps3(amin_x, amin_y, amin_z, amax_x, amax_y, amax_z,
              bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z):
    """Symmetric closed-interval AABB intersection (``BoundaryBox.hpp:47-51``)."""
    return (
        (amin_x <= bmax_x) & (amax_x >= bmin_x)
        & (amin_y <= bmax_y) & (amax_y >= bmin_y)
        & (amin_z <= bmax_z) & (amax_z >= bmin_z)
    )


def contains_point3(min_x, min_y, min_z, max_x, max_y, max_z, px, py, pz):
    """Closed-interval point-in-box (``BoundaryBox.hpp:42-46``)."""
    return (
        (px >= min_x) & (px <= max_x)
        & (py >= min_y) & (py <= max_y)
        & (pz >= min_z) & (pz <= max_z)
    )


def contains_box3(amin_x, amin_y, amin_z, amax_x, amax_y, amax_z,
                  bmin_x, bmin_y, bmin_z, bmax_x, bmax_y, bmax_z):
    """a fully encloses b, boundary-inclusive (``BoundaryBox.hpp:52-56``)."""
    return (
        (amin_x <= bmin_x) & (amax_x >= bmax_x)
        & (amin_y <= bmin_y) & (amax_y >= bmax_y)
        & (amin_z <= bmin_z) & (amax_z >= bmax_z)
    )


# --- 2D reference family: .Test/QuadTree.cpp:40-68 -----------------------

def contains_point2_ref(min_x, min_y, max_x, max_y, px, py):
    """Half-open point-in-rect (``.Test/QuadTree.cpp:38-41``): >= min, < max."""
    return (px >= min_x) & (py >= min_y) & (px < max_x) & (py < max_y)


def contains_rect2_ref(amin_x, amin_y, amax_x, amax_y,
                       bmin_x, bmin_y, bmax_x, bmax_y):
    """a contains rect b, STRICT on the far edge (``.Test/QuadTree.cpp:43-54``)."""
    return (
        (bmin_x >= amin_x) & (bmin_y >= amin_y)
        & (bmax_x < amax_x) & (bmax_y < amax_y)
    )


def overlaps2_ref(amin_x, amin_y, amax_x, amax_y,
                  bmin_x, bmin_y, bmax_x, bmax_y):
    """2D overlap, mixed strictness (``.Test/QuadTree.cpp:56-68``):
    ``a.min < b.max`` (strict) and ``a.max >= b.min`` (inclusive)."""
    return (
        (amin_x < bmax_x) & (amax_x >= bmin_x)
        & (amin_y < bmax_y) & (amax_y >= bmin_y)
    )

"""AABB predicate truth tables vs. the reference semantics."""

import numpy as np

from optimizing_ray import geom


def test_overlaps3_boundary_inclusive():
    # touching at the edge IS an overlap (BoundaryBox.hpp:47-51)
    assert geom.overlaps3(0, 0, 0, 1, 1, 1, 1, 0, 0, 2, 1, 1)
    assert geom.overlaps3(0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 2, 2)  # corner touch
    assert not geom.overlaps3(0, 0, 0, 1, 1, 1, 1.0001, 0, 0, 2, 1, 1)


def test_contains_point3_inclusive():
    assert geom.contains_point3(0, 0, 0, 1, 1, 1, 1.0, 1.0, 1.0)
    assert geom.contains_point3(0, 0, 0, 1, 1, 1, 0.0, 0.0, 0.0)
    assert not geom.contains_point3(0, 0, 0, 1, 1, 1, 1.0, 1.0, 1.01)


def test_contains_box3_inclusive():
    assert geom.contains_box3(0, 0, 0, 2, 2, 2, 0, 0, 0, 2, 2, 2)  # equal boxes
    assert not geom.contains_box3(0, 0, 0, 2, 2, 2, 0, 0, 0, 2, 2, 2.1)


def test_overlaps2_ref_mixed_strictness():
    # a.min < b.max strict; a.max >= b.min inclusive (.Test/QuadTree.cpp:56-68)
    # a=[0,1], b=[1,2] on x: a.min(0) < b.max(2) ok; a.max(1) >= b.min(1) ok -> True
    assert geom.overlaps2_ref(0, 0, 1, 1, 1, 0, 2, 1)
    # a=[1,2], b=[0,1]: a.min(1) < b.max(1)? NO (strict) -> False (asymmetry!)
    assert not geom.overlaps2_ref(1, 0, 2, 1, 0, 0, 1, 1)


def test_contains_rect2_ref_strict_far_edge():
    assert geom.contains_rect2_ref(0, 0, 2, 2, 0, 0, 1.999, 1.999)
    assert not geom.contains_rect2_ref(0, 0, 2, 2, 0, 0, 2, 2)  # far edge equal -> False
    assert geom.contains_rect2_ref(0, 0, 2, 2, 0, 0, 1, 1)      # near edge equal -> True


def test_bounding_box_negative_size_normalized():
    mnx, mny, mnz, mxx, mxy, mxz = geom.bounding_box(
        np.asarray([5.0]), np.asarray([5.0]), np.asarray([5.0]),
        np.asarray([-2.0]), np.asarray([3.0]), np.asarray([-1.0]))
    assert mnx[0] == 3.0 and mxx[0] == 5.0
    assert mny[0] == 5.0 and mxy[0] == 8.0
    assert mnz[0] == 4.0 and mxz[0] == 5.0

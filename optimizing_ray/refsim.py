"""Deterministic single-node simulators of the reference tree rules.

These are NOT the engine — they are conformance oracles used by the test
suite (pytest) so the distributed engine's cell assignments, query results
and subdivision counts can be checked against the reference's exact
semantics (SURVEY.md §5, §7.4):

* ``StaticQuadTree2D`` — ``.Test/QuadTree.cpp:86-190``: insert descends to
  the deepest child that strictly `contains` the item rect (far-edge
  strict, ``:43-54``) while ``depth + 1 < MAX_DEPTH``; no capacity rule.
  Search uses the mixed-strictness 2D ``overlaps`` (``:56-68``) with the
  "query contains child => take whole subtree" fast path (``:150-175``).
* ``DynamicOctree3D`` — ``DynamicOctree.hpp:125-183``: insert recurses
  into the first (SWD..NEU order) child that boundary-inclusively contains
  the item box, but ONLY while the node already holds >= capacity items
  and depth budget remains; otherwise the item parks at the current node.
  All predicates boundary-inclusive (``BoundaryBox.hpp:42-56``).
* ``brute_search`` — the linear-scan oracle the reference itself toggles
  with Tab (``.Test/cacheQuadTree.cpp:349-350,425-441``).

Insert order matters for the dynamic rule (capacity state at insert time
decides which node holds a spanning item) — the simulators take items in
sequence exactly like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from optimizing_ray import geom

__all__ = ["StaticQuadTree2D", "DynamicOctree3D", "brute_search2", "brute_search3"]


@dataclass
class _QNode2:
    min_x: float
    min_y: float
    max_x: float
    max_y: float
    depth: int
    key: int  # sentinel-tagged linear-quadtree key of this node
    items: list = field(default_factory=list)  # (item_id, rect)
    children: list = field(default_factory=lambda: [None, None, None, None])

    def child_boxes(self):
        mx = (self.min_x + self.max_x) / 2.0
        my = (self.min_y + self.max_y) / 2.0
        # reference child order [SW, SE, NW, NE] (.Test/QuadTree.cpp:96-103)
        return [
            (self.min_x, self.min_y, mx, my),
            (mx, self.min_y, self.max_x, my),
            (self.min_x, my, mx, self.max_y),
            (mx, my, self.max_x, self.max_y),
        ]


class StaticQuadTree2D:
    """Reference static quadtree (``.Test/QuadTree.cpp``), semantics exact."""

    def __init__(self, min_x, min_y, max_x, max_y, max_depth: int = 5):
        self.max_depth = max_depth
        self.root = _QNode2(min_x, min_y, max_x, max_y, 0, 1)
        self.n_items = 0

    def insert(self, item_id, rect):
        """rect = (min_x, min_y, max_x, max_y). Mirrors ``:132-149``."""
        node = self.root
        while True:
            placed = False
            if node.depth + 1 < self.max_depth:
                for i, cb in enumerate(node.child_boxes()):
                    if geom.contains_rect2_ref(cb[0], cb[1], cb[2], cb[3],
                                               rect[0], rect[1], rect[2], rect[3]):
                        if node.children[i] is None:
                            cb_ = cb
                            node.children[i] = _QNode2(cb_[0], cb_[1], cb_[2], cb_[3],
                                                       node.depth + 1, (node.key << 2) | i)
                        node = node.children[i]
                        placed = True
                        break
            if not placed:
                node.items.append((item_id, rect))
                self.n_items += 1
                return node.key

    def search(self, q, count_traversals: bool = False):
        """q = (min_x, min_y, max_x, max_y). Mirrors ``:150-187``.
        Returns ids (list, traversal order); optionally (ids, nodes_visited)."""
        out: list = []
        visited = 0

        def items_of(node):
            for iid, _ in node.items:
                out.append(iid)
            for c in node.children:
                if c is not None:
                    items_of(c)

        def rec(node):
            nonlocal visited
            visited += 1
            for iid, r in node.items:
                if geom.overlaps2_ref(q[0], q[1], q[2], q[3], r[0], r[1], r[2], r[3]):
                    out.append(iid)
            for i, c in enumerate(node.children):
                if c is None:
                    continue
                cb = (c.min_x, c.min_y, c.max_x, c.max_y)
                if geom.contains_rect2_ref(q[0], q[1], q[2], q[3], *cb):
                    items_of(c)
                elif geom.overlaps2_ref(q[0], q[1], q[2], q[3], *cb):
                    rec(c)

        rec(self.root)
        return (out, visited) if count_traversals else out

    def node_stats(self):
        """(n_nodes, n_leaf_items_per_depth dict, occupancy dict key->count)."""
        per_depth: dict[int, int] = {}
        occ: dict[int, int] = {}
        n_nodes = 0
        stack = [self.root]
        while stack:
            n = stack.pop()
            n_nodes += 1
            per_depth[n.depth] = per_depth.get(n.depth, 0) + len(n.items)
            if n.items:
                occ[n.key] = len(n.items)
            stack.extend(c for c in n.children if c is not None)
        return n_nodes, per_depth, occ


@dataclass
class _ONode3:
    box: tuple  # (min_x,min_y,min_z,max_x,max_y,max_z)
    depth_left: int
    capacity: int
    items: list = field(default_factory=list)
    children: list = field(default_factory=lambda: [None] * 8)

    def child_boxes(self):
        mnx, mny, mnz, mxx, mxy, mxz = self.box
        sx, sy, sz = (mxx - mnx) / 2.0, (mxy - mny) / 2.0, (mxz - mnz) / 2.0
        # octant order SWD..NEU (DynamicOctree.hpp:86-94): index = x | y<<1 | z<<2
        out = []
        for i in range(8):
            ox = mnx + sx * (i & 1)
            oy = mny + sy * ((i >> 1) & 1)
            oz = mnz + sz * ((i >> 2) & 1)
            out.append((ox, oy, oz, ox + sx, oy + sy, oz + sz))
        return out


class DynamicOctree3D:
    """Reference dynamic octree (``DynamicOctree.hpp``), semantics exact:
    capacity=4, depth=5 defaults (``:51-52``); insert rule ``:125-143``."""

    def __init__(self, box, capacity: int = 4, max_depth: int = 5):
        self.root = _ONode3(tuple(box), max_depth, capacity)

    def insert(self, item_id, ibox):
        node = self.root
        while True:
            descended = False
            # `for i in 0..8: if depth==0 or len(items)<cap: break; ...`
            if node.depth_left > 0 and len(node.items) >= node.capacity:
                for i, cb in enumerate(node.child_boxes()):
                    if geom.contains_box3(cb[0], cb[1], cb[2], cb[3], cb[4], cb[5],
                                          ibox[0], ibox[1], ibox[2], ibox[3], ibox[4], ibox[5]):
                        if node.children[i] is None:
                            node.children[i] = _ONode3(cb, node.depth_left - 1, node.capacity)
                        node = node.children[i]
                        descended = True
                        break
            if not descended:
                node.items.append((item_id, tuple(ibox)))
                return

    def search(self, q):
        """q = 6-tuple box; mirrors ``DynamicOctree.hpp:151-183``."""
        out: list = []

        def items_of(node):
            for iid, _ in node.items:
                out.append(iid)
            for c in node.children:
                if c is not None:
                    items_of(c)

        def rec(node):
            for iid, b in node.items:
                if geom.overlaps3(q[0], q[1], q[2], q[3], q[4], q[5], *b):
                    out.append(iid)
            for c in node.children:
                if c is None:
                    continue
                if geom.contains_box3(q[0], q[1], q[2], q[3], q[4], q[5], *c.box):
                    items_of(c)
                elif geom.overlaps3(q[0], q[1], q[2], q[3], q[4], q[5], *c.box):
                    rec(c)

        rec(self.root)
        return out

    def node_stats(self):
        n_nodes = 0
        n_items = 0
        max_occ = 0
        stack = [self.root]
        while stack:
            n = stack.pop()
            n_nodes += 1
            n_items += len(n.items)
            max_occ = max(max_occ, len(n.items))
            stack.extend(c for c in n.children if c is not None)
        return n_nodes, n_items, max_occ


def brute_search2(q, rects: np.ndarray) -> np.ndarray:
    """Linear-scan oracle (``.Test/cacheQuadTree.cpp:425-441``): indices of
    rects (n,4) overlapping q under the 2D mixed-strictness predicate."""
    m = geom.overlaps2_ref(q[0], q[1], q[2], q[3],
                           rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3])
    return np.nonzero(m)[0]


def brute_search3(q, boxes: np.ndarray) -> np.ndarray:
    m = geom.overlaps3(q[0], q[1], q[2], q[3], q[4], q[5],
                       boxes[:, 0], boxes[:, 1], boxes[:, 2],
                       boxes[:, 3], boxes[:, 4], boxes[:, 5])
    return np.nonzero(m)[0]

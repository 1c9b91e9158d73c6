"""Linear quadtree / Morton tile-key algebra (pure numpy, no Ray).

This is the engine's replacement for the reference's pointer-based trees:
the path root->leaf through the quadtree/octree becomes a depth-tagged
Morton key stored in a uint64 column.  The reference itself gestures at
this encoding (Morton encoder ``.Test/QuadTree.cpp:310-318``; rationale
``REPORT.md:35-38``); the hierarchical-prefix algebra (parent = shift,
children = suffixes, neighbors = de-interleave / +-1 / re-interleave) is
the same as H3/S2 cell ids, implemented in pure numpy because no native
geo wheel exists in this environment (SURVEY.md §7.0).

Key layout (2D): ``key = (1 << 2*depth) | morton2(ix, iy)`` — the high
sentinel bit makes keys unique across depths and keeps the algebra pure
shifts: ``parent(key) = key >> 2``, ``children(key) = key*4 + {0,1,2,3}``.
Root = 1.  Depth <= 29 fits uint64.  (3D: ``(1 << 3*depth) | morton3``.)
"""

from __future__ import annotations

import numpy as np

from optimizing_ray.config import World

__all__ = [
    "spread2", "compact2", "morton2", "demorton2", "morton3", "demorton3",
    "encode2", "decode2", "parent", "children2", "depth_of2",
    "point_cell2", "cell_box2", "neighbors2", "disk2",
    "cover2", "adaptive_cover2", "grid_cell",
    "encode3", "decode3", "depth_of3", "point_cell3", "cover3",
    "hex_axial", "hex_center", "hex_neighbors", "geohash",
]

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

_M2 = (
    0x5555555555555555, 0x3333333333333333, 0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF,
)


def _u64(v) -> np.ndarray:
    return np.asarray(v, dtype=np.uint64)


def spread2(v) -> np.ndarray:
    """Spread the low 32 bits of v so bit i lands at bit 2i (even lanes)."""
    x = _u64(v) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(_M2[4])
    x = (x | (x << np.uint64(8))) & np.uint64(_M2[3])
    x = (x | (x << np.uint64(4))) & np.uint64(_M2[2])
    x = (x | (x << np.uint64(2))) & np.uint64(_M2[1])
    x = (x | (x << np.uint64(1))) & np.uint64(_M2[0])
    return x


def compact2(v) -> np.ndarray:
    """Inverse of spread2: gather even-lane bits back to a dense integer."""
    x = _u64(v) & np.uint64(_M2[0])
    x = (x | (x >> np.uint64(1))) & np.uint64(_M2[1])
    x = (x | (x >> np.uint64(2))) & np.uint64(_M2[2])
    x = (x | (x >> np.uint64(4))) & np.uint64(_M2[3])
    x = (x | (x >> np.uint64(8))) & np.uint64(_M2[4])
    x = (x | (x >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return x


def morton2(ix, iy) -> np.ndarray:
    """Bit-interleave (ix, iy) -> Morton code; x occupies the even bits.

    Bit-for-bit identical to the reference ``mortonEncode2D``
    (``.Test/QuadTree.cpp:310-318``) for 16-bit inputs (unit-tested).
    """
    return spread2(ix) | (spread2(iy) << np.uint64(1))


def demorton2(code):
    c = _u64(code)
    return compact2(c), compact2(c >> np.uint64(1))


_M3 = (0x1249249249249249, 0x10C30C30C30C30C3, 0x100F00F00F00F00F,
       0x001F0000FF0000FF, 0x001F00000000FFFF)


def _spread3(v) -> np.ndarray:
    x = _u64(v) & np.uint64(0x1FFFFF)  # 21 bits
    x = (x | (x << np.uint64(32))) & np.uint64(_M3[4])
    x = (x | (x << np.uint64(16))) & np.uint64(_M3[3])
    x = (x | (x << np.uint64(8))) & np.uint64(_M3[2])
    x = (x | (x << np.uint64(4))) & np.uint64(_M3[1])
    x = (x | (x << np.uint64(2))) & np.uint64(_M3[0])
    return x


def _compact3(v) -> np.ndarray:
    x = _u64(v) & np.uint64(_M3[0])
    x = (x | (x >> np.uint64(2))) & np.uint64(_M3[1])
    x = (x | (x >> np.uint64(4))) & np.uint64(_M3[2])
    x = (x | (x >> np.uint64(8))) & np.uint64(_M3[3])
    x = (x | (x >> np.uint64(16))) & np.uint64(_M3[4])
    x = (x | (x >> np.uint64(32))) & np.uint64(0x1FFFFF)
    return x


def morton3(ix, iy, iz) -> np.ndarray:
    """3D Morton; child index (z<<2 | y<<1 | x) matches the reference octant
    order SWD..NEU (``DynamicOctree.hpp:56-65,86-94``)."""
    return _spread3(ix) | (_spread3(iy) << np.uint64(1)) | (_spread3(iz) << np.uint64(2))


def demorton3(code):
    c = _u64(code)
    return _compact3(c), _compact3(c >> np.uint64(1)), _compact3(c >> np.uint64(2))


# --- depth-tagged keys ----------------------------------------------------

def encode2(ix, iy, depth: int) -> np.ndarray:
    """(ix, iy, depth) -> sentinel-tagged linear-quadtree key."""
    return morton2(ix, iy) | (np.uint64(1) << np.uint64(2 * depth))


def decode2(key):
    """key -> (depth, ix, iy)."""
    k = _u64(key)
    depth = depth_of2(k)
    sent = np.uint64(1) << (np.uint64(2) * depth.astype(np.uint64))
    ix, iy = demorton2(k ^ sent)
    return depth, ix, iy


def depth_of2(key) -> np.ndarray:
    """Depth of a sentinel-tagged 2D key = floor(bit_length(key)-1, / 2)."""
    k = _u64(key)
    # bit_length via log2 is unsafe for uint64; use a loop-free trick on int64
    nb = np.zeros(k.shape if k.shape else (), dtype=np.uint64)
    t = k.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = t >= (np.uint64(1) << np.uint64(s))
        nb = nb + np.where(m, np.uint64(s), np.uint64(0))
        t = np.where(m, t >> np.uint64(s), t)
    return (nb // np.uint64(2)).astype(np.int64)


def parent(key, levels: int = 1) -> np.ndarray:
    return _u64(key) >> np.uint64(2 * levels)


def children2(key) -> np.ndarray:
    """The 4 children in reference child order [SW, SE, NW, NE]
    (``.Test/QuadTree.cpp:96-103``) = Morton suffix order {0,1,2,3}."""
    k = _u64(key)
    return (k[..., None] << np.uint64(2)) | np.arange(4, dtype=np.uint64)


# --- world quantization ---------------------------------------------------

def _grid_n(depth: int) -> int:
    return 1 << depth


def point_cell2(x, y, world: World, depth: int) -> np.ndarray:
    """Quantize points to the tile grid at `depth` -> sentinel-tagged keys.

    Points outside the world clamp to the border cell (the reference's
    uniform grid creates cells lazily for any coordinate,
    ``WorldPartition.hpp:169-181``; for the bounded quadtree world we clamp).
    """
    n = _grid_n(depth)
    wx, wy, _ = world.size
    fx = (np.asarray(x, dtype=np.float64) - world.min_x) / wx
    fy = (np.asarray(y, dtype=np.float64) - world.min_y) / wy
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    return encode2(ix, iy, depth)


def cell_box2(key, world: World):
    """Tile key -> (min_x, min_y, max_x, max_y) of the cell in world coords."""
    depth, ix, iy = decode2(key)
    wx, wy, _ = world.size
    n = (np.uint64(1) << depth.astype(np.uint64)).astype(np.float64)
    cw, ch = wx / n, wy / n
    mnx = world.min_x + ix.astype(np.float64) * cw
    mny = world.min_y + iy.astype(np.float64) * ch
    return mnx, mny, mnx + cw, mny + ch


def neighbors2(key) -> np.ndarray:
    """Ring-1 (3x3 incl. self) neighbor keys of each input key, clamped to
    the grid — the reference's neighborhood load (``WorldPartition.hpp:196-204``).

    Returns shape (..., 9); out-of-grid neighbors are repeated border cells
    (callers dedupe)."""
    return disk2(key, 1)


def disk2(key, k: int) -> np.ndarray:
    """All cells with Chebyshev distance <= k from each key (the reference's
    view-distance rule, ``WorldPartition.hpp:208-212``). Shape (..., (2k+1)^2).

    PRECONDITION: all input keys share one depth (the scalar depth of the
    first key is used for re-encoding)."""
    kk = _u64(key)
    depth, ix, iy = decode2(kk)
    n = np.uint64(1) << depth.astype(np.uint64)
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="xy")
    nx = np.clip(ix.astype(np.int64)[..., None] + dx.ravel(), 0, (n - np.uint64(1)).astype(np.int64)[..., None])
    ny = np.clip(iy.astype(np.int64)[..., None] + dy.ravel(), 0, (n - np.uint64(1)).astype(np.int64)[..., None])
    d = int(np.asarray(depth).reshape(-1)[0]) if np.asarray(depth).size else 0
    return encode2(nx.astype(np.uint64), ny.astype(np.uint64), d)


def cover2(min_x, min_y, max_x, max_y, world: World, depth: int) -> np.ndarray:
    """All tile keys at `depth` whose cell overlaps the (closed) query box.

    This is the flat-grid equivalent of the octree descent
    (``DynamicOctree.hpp:146-171``); scalar box in, 1-D key array out.
    """
    n = _grid_n(depth)
    wx, wy, _ = world.size
    cw, ch = wx / n, wy / n
    ix0 = max(0, min(n - 1, int(np.floor((min_x - world.min_x) / cw))))
    ix1 = max(0, min(n - 1, int(np.floor((max_x - world.min_x) / cw))))
    iy0 = max(0, min(n - 1, int(np.floor((min_y - world.min_y) / ch))))
    iy1 = max(0, min(n - 1, int(np.floor((max_y - world.min_y) / ch))))
    gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1, dtype=np.uint64),
                         np.arange(iy0, iy1 + 1, dtype=np.uint64), indexing="xy")
    return encode2(gx.ravel(), gy.ravel(), depth)


def cover2_many(min_x, min_y, max_x, max_y, world: World,
                depth: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized ``cover2`` over Q boxes at once: returns
    ``(keys: uint64[m], box_idx: int64[m])`` — the concatenation of every
    box's cover with its owning box index.  Same clipping/key semantics
    as ``cover2`` (set-equal per box; within-box order differs).  One
    numpy pass for all boxes instead of Q python-level cover calls — the
    serving driver's frame loop was dominated by per-query cover+routing
    overhead at large Q."""
    n = _grid_n(depth)
    wx, wy, _ = world.size
    cw, ch = wx / n, wy / n
    ix0 = np.clip(np.floor((np.asarray(min_x, dtype=np.float64) - world.min_x)
                           / cw).astype(np.int64), 0, n - 1)
    ix1 = np.clip(np.floor((np.asarray(max_x, dtype=np.float64) - world.min_x)
                           / cw).astype(np.int64), 0, n - 1)
    iy0 = np.clip(np.floor((np.asarray(min_y, dtype=np.float64) - world.min_y)
                           / ch).astype(np.int64), 0, n - 1)
    iy1 = np.clip(np.floor((np.asarray(max_y, dtype=np.float64) - world.min_y)
                           / ch).astype(np.int64), 0, n - 1)
    nx = ix1 - ix0 + 1
    cnt = nx * (iy1 - iy0 + 1)
    total = int(cnt.sum())
    q = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
    starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    o = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
    gx = ix0[q] + (o % nx[q])
    gy = iy0[q] + (o // nx[q])
    return encode2(gx.astype(np.uint64), gy.astype(np.uint64), depth), q


def adaptive_cover2(min_x: float, min_y: float, max_x: float, max_y: float,
                    world: World, max_depth: int):
    """Hierarchical cell cover of a query box — the engine twin of the
    recursive search (``DynamicOctree.hpp:146-171``): descend from the root;
    a cell fully CONTAINED in the query (boundary-inclusive 3D semantics,
    ``BoundaryBox.hpp:52-56``) is emitted with full_cover=True (the
    ``contains -> items()`` fast path); a cell merely overlapping is split
    until max_depth, where it is emitted with full_cover=False (residual
    predicate required).

    Returns (keys: uint64[m], full: bool[m]).
    """
    keys: list[int] = []
    full: list[bool] = []
    wx, wy, _ = world.size

    def visit(key: int, d: int, cminx: float, cminy: float, cmaxx: float, cmaxy: float):
        # query contains cell?
        if min_x <= cminx and min_y <= cminy and max_x >= cmaxx and max_y >= cmaxy:
            keys.append(key); full.append(True)
            return
        # overlap test (closed intervals)
        if not (min_x <= cmaxx and max_x >= cminx and min_y <= cmaxy and max_y >= cminy):
            return
        if d == max_depth:
            keys.append(key); full.append(False)
            return
        mx, my = (cminx + cmaxx) / 2.0, (cminy + cmaxy) / 2.0
        base = key << 2
        visit(base | 0, d + 1, cminx, cminy, mx, my)
        visit(base | 1, d + 1, mx, cminy, cmaxx, my)
        visit(base | 2, d + 1, cminx, my, mx, cmaxy)
        visit(base | 3, d + 1, mx, my, cmaxx, cmaxy)

    visit(1, 0, world.min_x, world.min_y, world.min_x + wx, world.min_y + wy)
    return np.asarray(keys, dtype=np.uint64), np.asarray(full, dtype=bool)


# --- hexagonal (H3-flavored) cells -----------------------------------------
#
# The north-star names H3/S2 cell encoding; the Morton quadkeys above are
# the S2-flavored family (square hierarchy).  This is the H3-flavored one:
# pointy-top hexagons addressed by axial coordinates (q, r), assignment by
# the standard fractional-axial + cube-rounding algorithm.  Every step is
# plain IEEE double arithmetic in a FIXED op order so the DuckDB oracle
# (oracle.hex_assign_sql) reproduces the assignment bit-for-bit — floor
# (x + 0.5) rounding only (Python/DuckDB round() disagree at halves).

_SQRT3 = np.sqrt(3.0)


def hex_axial(x, y, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top hexagonal cell assignment: world (x, y) -> axial
    (q, r) int64 for hexes of circumradius `size`.

    Fractional axial coords, then cube rounding (round each of x/y/z,
    fix the axis with the largest rounding error so x+y+z == 0 holds).
    Op order matches ``oracle.hex_assign_sql`` exactly.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / size
    rf = (2.0 / 3.0 * y) / size
    cx, cz = qf, rf
    cy = -qf - rf
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_center(q, r, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Axial (q, r) -> world coordinates of the hex center."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    return size * (_SQRT3 * q + _SQRT3 / 2.0 * r), size * (1.5 * r)


_HEX_DIRS = np.asarray([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)],
                       dtype=np.int64)


def hex_neighbors(q, r) -> tuple[np.ndarray, np.ndarray]:
    """The 6 axial neighbors of each hex; shape (..., 6)."""
    q = np.asarray(q, dtype=np.int64)[..., None]
    r = np.asarray(r, dtype=np.int64)[..., None]
    return q + _HEX_DIRS[:, 0], r + _HEX_DIRS[:, 1]


def geohash(x, y, world: World, length: int = 8) -> np.ndarray:
    """World-normalized geohash strings (base32, standard alphabet):
    the world box plays the lon/lat extent, x/y quantize to
    ceil(5*length/2) / floor(5*length/2) bits, bits interleave x-first
    from the MSB (the geohash convention), and every 5 bits pick one
    character.  Prefix property holds: truncating the string = the
    enclosing coarser cell.  SQL twin: oracle.geohash_sql."""
    if length % 2 != 0 or length < 2 or length > 12:
        raise ValueError("length must be even, 2..12 (x-bits fit uint32)")
    bits = 5 * length
    nx = bits // 2  # x gets the extra bit for odd bit counts; even here
    wx, wy, _ = world.size
    n = np.int64(1) << np.int64(nx)
    fx = (np.asarray(x, dtype=np.float64) - world.min_x) / wx
    fy = (np.asarray(y, dtype=np.float64) - world.min_y) / wy
    ix = np.clip((fx * n).astype(np.int64), 0, int(n) - 1).astype(np.uint64)
    iy = np.clip((fy * n).astype(np.int64), 0, int(n) - 1).astype(np.uint64)
    code = spread2(iy) | (spread2(ix) << np.uint64(1))  # x on MSB-first even
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), dtype=np.uint8)
    out = np.empty((code.size, length), dtype=np.uint8)
    flat = code.ravel()
    for k in range(length):
        c = (flat >> np.uint64(bits - 5 * (k + 1))) & np.uint64(31)
        out[:, k] = alpha[c.astype(np.int64)]
    return out.view(f"S{length}").ravel().astype(str).reshape(code.shape)


def hilbert_d(ix, iy, depth: int) -> np.ndarray:
    """Hilbert-curve index of grid cell (ix, iy) on the 2^depth grid —
    the locality-preserving alternative to Morton for range scans
    (adjacent indices are ALWAYS 4-adjacent cells; Morton jumps).
    The standard xy->d bit transform (one rotate/reflect step per bit,
    MSB first), vectorized over the bit axis in pure integer
    arithmetic — the quadrant digit is a CASE on (rx, ry), no XOR, so
    the SQL twin (``oracle.hilbert_ctes``) unrolls the identical
    steps."""
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << np.int64(depth - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        # quadrant digit: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
        q = np.where(rx == 0, np.where(ry == 0, 0, 1),
                     np.where(ry == 0, 3, 2)).astype(np.int64)
        d += s * s * q
        # keep only the sub-quadrant bits, rotated/reflected into the
        # canonical orientation (masking first keeps s-1-x in range)
        xl = x & (s - 1)
        yl = y & (s - 1)
        flip = (ry == 0) & (rx == 1)
        nx = np.where(ry == 0, np.where(flip, s - 1 - yl, yl), xl)
        ny = np.where(ry == 0, np.where(flip, s - 1 - xl, xl), yl)
        x, y = nx, ny
        s >>= 1
    return d


def grid_cell(x, z, cell_x: float = 255.0, cell_z: float = 255.0):
    """The reference's uniform world-partition grid key:
    ``(int(pos.x / size.x), int(pos.z / size.z))`` with C-style truncation
    toward zero (``WorldPartition.hpp:174,240``)."""
    cx = np.trunc(np.asarray(x, dtype=np.float64) / cell_x).astype(np.int64)
    cz = np.trunc(np.asarray(z, dtype=np.float64) / cell_z).astype(np.int64)
    return cx, cz


# --- 3D (octree) keys: sentinel (1 << 3*depth) | morton3 ------------------

def encode3(ix, iy, iz, depth: int) -> np.ndarray:
    """(ix, iy, iz, depth) -> sentinel-tagged linear-OCTREE key (the 3D
    twin of encode2; parent = key >> 3, children = key*8 + {0..7} in the
    reference octant order SWD..NEU)."""
    return morton3(ix, iy, iz) | (np.uint64(1) << np.uint64(3 * depth))


def decode3(key):
    k = _u64(key)
    depth = depth_of3(k)
    sent = np.uint64(1) << (np.uint64(3) * depth.astype(np.uint64))
    ix, iy, iz = demorton3(k ^ sent)
    return depth, ix, iy, iz


def depth_of3(key) -> np.ndarray:
    """Depth of a sentinel-tagged 3D key = floor((bit_length - 1) / 3)."""
    k = _u64(key)
    nb = np.zeros(k.shape if k.shape else (), dtype=np.uint64)
    t = k.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = t >= (np.uint64(1) << np.uint64(s))
        nb = nb + np.where(m, np.uint64(s), np.uint64(0))
        t = np.where(m, t >> np.uint64(s), t)
    return (nb // np.uint64(3)).astype(np.int64)


def point_cell3(x, y, z, world: World, depth: int) -> np.ndarray:
    """Quantize 3D points to the octree grid at `depth` (z spans the
    world's min_z..max_z; degenerate z-extent collapses to plane 0)."""
    n = _grid_n(depth)
    wx, wy, wz = world.size
    fx = (np.asarray(x, dtype=np.float64) - world.min_x) / wx
    fy = (np.asarray(y, dtype=np.float64) - world.min_y) / wy
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    if wz > 0:
        fz = (np.asarray(z, dtype=np.float64) - world.min_z) / wz
        iz = np.clip((fz * n).astype(np.int64), 0, n - 1).astype(np.uint64)
    else:
        iz = np.zeros_like(ix)
    return encode3(ix, iy, iz, depth)


def cover3(min_x, min_y, min_z, max_x, max_y, max_z,
           world: World, depth: int) -> np.ndarray:
    """All octree keys at `depth` whose cell overlaps the closed 3D box —
    the flat-grid equivalent of the octree descent (DynamicOctree.hpp:146-171)."""
    n = _grid_n(depth)
    wx, wy, wz = world.size
    cw, ch = wx / n, wy / n
    ix0 = max(0, min(n - 1, int(np.floor((min_x - world.min_x) / cw))))
    ix1 = max(0, min(n - 1, int(np.floor((max_x - world.min_x) / cw))))
    iy0 = max(0, min(n - 1, int(np.floor((min_y - world.min_y) / ch))))
    iy1 = max(0, min(n - 1, int(np.floor((max_y - world.min_y) / ch))))
    if wz > 0:
        cd = wz / n
        iz0 = max(0, min(n - 1, int(np.floor((min_z - world.min_z) / cd))))
        iz1 = max(0, min(n - 1, int(np.floor((max_z - world.min_z) / cd))))
    else:
        iz0 = iz1 = 0
    gx, gy, gz = np.meshgrid(np.arange(ix0, ix1 + 1, dtype=np.uint64),
                             np.arange(iy0, iy1 + 1, dtype=np.uint64),
                             np.arange(iz0, iz1 + 1, dtype=np.uint64),
                             indexing="ij")
    return encode3(gx.ravel(), gy.ravel(), gz.ravel(), depth)

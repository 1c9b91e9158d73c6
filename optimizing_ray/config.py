"""Engine configuration.

Mirrors the reference's tunables (capacity / depth per tree instance,
``DynamicOctree.hpp:51-52,68-73``; grid cell size ``WorldPartition.hpp:240``;
world boxes ``main.cpp:16-19`` and ``.Test/QuadTree.cpp:351-365``) as one
explicit dataclass instead of compile-time constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class World:
    """An axis-aligned world box; the root of the tile hierarchy.

    2D worlds set ``min_z = max_z = 0`` and use dims=2 key algebra.
    """

    min_x: float
    min_y: float
    min_z: float
    max_x: float
    max_y: float
    max_z: float
    dims: int = 2

    @property
    def size(self) -> tuple[float, float, float]:
        return (self.max_x - self.min_x, self.max_y - self.min_y, self.max_z - self.min_z)


# Reference octree demo world: {0,0,0}..{800,50,600} (main.cpp:16-19).
# NOTE axis mapping: the reference partitions on (x, z); we map its z to our y
# so the 2D tile algebra always works on (x, y).
WORLD_3D = World(0.0, 0.0, 0.0, 800.0, 600.0, 50.0, dims=2)

# Reference quadtree benchmark world: 100,000 x 100,000 (.Test/QuadTree.cpp:351-365).
WORLD_2D = World(0.0, 0.0, 0.0, 100_000.0, 100_000.0, 0.0, dims=2)


@dataclass(frozen=True)
class EngineConfig:
    """Tunables of the tiling + join engine.

    capacity / max_depth default to the reference constants
    (MAX_CAPACITY=4, MAX_DEPTH=5, ``DynamicOctree.hpp:51-52``);
    coarse_depth plays the role of the world-partition uniform grid
    (``WorldPartition.hpp:240``).  salt_threshold / n_salts implement
    hot-cell salting for cells still over capacity at max depth.
    """

    world: World = field(default_factory=lambda: WORLD_2D)
    capacity: int = 4
    max_depth: int = 5
    coarse_depth: int = 3
    salt_threshold: int = 100_000
    n_salts: int = 8
    # Ray execution knobs
    batch_size: int | None = 65_536
    target_rows_per_cell: int = 500_000  # pick coarse_depth so E[rows/cell] ~ this


def default_shards(floor: int = 32) -> int:
    """Cluster-derived shuffle width: ``max(floor, total cluster CPUs)``.

    Every sharded exchange in the engine (shard_join, dedup, windows,
    textops, dwithin, pip, sketches) takes an explicit ``n_shards``;
    when the caller passes None this seam resolves it.  The floor of 32
    is THIS VM's measured dispatch-cost knee (<= 32 groups cost ~1 s
    fixed, 64 cost ~2 s — a single-node property, see CLAUDE.md); on a
    multi-node cluster ``ray.cluster_resources()`` raises the width so
    reduce-side parallelism tracks the cluster instead of capping at 32
    (round-4, VERDICT item 6).  Falls back to the floor when Ray isn't
    initialised (pure-local library use)."""
    try:
        import ray
        if ray.is_initialized():
            return max(floor, int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return floor


def resolve_shards(n_shards: int | None, floor: int = 32) -> int:
    """``n_shards or default_shards(floor)`` with explicit-zero guarded."""
    return n_shards if n_shards else default_shards(floor)

"""optimizing_ray — a Ray-Data-native spatial partitioning + join engine.

Built from scratch (NOT a port) with the query capabilities of the reference
world-partition / dynamic quadtree-octree system (MasterLaplace/Optimizing):
hierarchical tile keys (linear quadtree, Morton order, adaptive resolution),
point/box-in-box spatial joins, kNN via neighbor-ring expansion, point-in-
polygon joins, raster<->vector tile assignment, mutations (delete/relocate),
plus large-scale training-data operators (dedup, text analysis, ANN search,
multimodal stages) — all expressed as ray.data.Dataset pipelines over
zero-copy Arrow batches.

Never calls ray.init()/ray.shutdown(): sessions are owned by the caller
(driver, bench.py, or the pytest fixture).
"""

from optimizing_ray.config import EngineConfig, WORLD_3D, WORLD_2D

__all__ = ["EngineConfig", "WORLD_3D", "WORLD_2D"]
__version__ = "0.1.0"

from optimizing_ray.pipelines import (
    ann,
    box_join,
    curate,
    dedup,
    dwithin,
    knn,
    mutate,
    pip,
    poly_join,
    pyramid,
    raster,
    relational,
    shard_join,
    sketches,
    textops,
    tile_store,
    windows,
)

__all__ = ["ann", "box_join", "curate", "dedup", "dwithin", "knn", "mutate",
           "pip", "poly_join", "pyramid", "raster", "relational",
           "shard_join", "sketches", "textops", "tile_store", "windows"]

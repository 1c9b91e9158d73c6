from optimizing_ray.pipelines import (
    ann,
    box_join,
    curate,
    dedup,
    knn,
    mutate,
    pip,
    raster,
    relational,
    sketches,
    textops,
    tile_store,
    windows,
)

__all__ = ["ann", "box_join", "curate", "dedup", "knn", "mutate", "pip", "raster",
           "relational", "sketches", "textops", "tile_store", "windows"]

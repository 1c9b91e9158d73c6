from optimizing_ray.stages import adaptive, media
from optimizing_ray.stages.assign import (
    assign_point_cells_batch,
    assign_tiles,
    explode_cover_batch,
)

__all__ = ["adaptive", "media", "assign_point_cells_batch", "assign_tiles",
           "explode_cover_batch"]

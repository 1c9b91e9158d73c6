from optimizing_ray.stages.assign import (
    assign_point_cells_batch,
    assign_tiles,
    explode_cover_batch,
)

__all__ = ["assign_point_cells_batch", "assign_tiles", "explode_cover_batch"]

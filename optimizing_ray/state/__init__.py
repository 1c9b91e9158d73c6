from optimizing_ray.state.manifest import (
    completed_keys,
    read_manifest,
    read_output,
    resumable_write,
)
from optimizing_ray.state.serving import SpatialIndexService

__all__ = ["resumable_write", "read_manifest", "completed_keys", "read_output",
           "SpatialIndexService"]

from optimizing_ray.state.manifest import (
    completed_keys,
    read_manifest,
    read_output,
    resumable_write,
)

__all__ = ["resumable_write", "read_manifest", "completed_keys", "read_output"]

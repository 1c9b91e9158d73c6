from optimizing_ray.functions import rays, text

__all__ = ["rays", "text"]

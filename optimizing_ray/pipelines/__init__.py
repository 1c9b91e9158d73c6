from optimizing_ray.pipelines import box_join, knn

__all__ = ["box_join", "knn"]

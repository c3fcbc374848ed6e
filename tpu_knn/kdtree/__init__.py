from tpu_knn.kdtree.build import build_kdtree, KDTree

__all__ = ["build_kdtree", "KDTree"]

from tpu_knn.engine.registry import (
    Version,
    register_version,
    get_version,
    list_versions,
)

__all__ = ["Version", "register_version", "get_version", "list_versions"]

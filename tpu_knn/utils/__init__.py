from tpu_knn.utils.shapes import cdiv, round_up, pad_axis_to
from tpu_knn.utils.platform import on_tpu, interpret_mode, default_backend

__all__ = [
    "cdiv",
    "round_up",
    "pad_axis_to",
    "on_tpu",
    "interpret_mode",
    "default_backend",
]

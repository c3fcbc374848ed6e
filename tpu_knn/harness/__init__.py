from tpu_knn.harness.generator import (
    GlibcRand,
    SampleStream,
    TA_SHAPES,
    BIG_SHAPES,
    ta_sample_stream,
    random_sample,
)
from tpu_knn.harness.checker import check_results, true_distance

__all__ = [
    "GlibcRand",
    "SampleStream",
    "TA_SHAPES",
    "BIG_SHAPES",
    "ta_sample_stream",
    "random_sample",
    "check_results",
    "true_distance",
]

from hnsw_vector_db_spark.functions.distance import (
    METRICS,
    cosine,
    distance,
    dot_product,
    euclidean,
    manhattan,
    norm,
    normalize,
    squared_euclidean,
)

__all__ = [
    "METRICS",
    "cosine",
    "distance",
    "dot_product",
    "euclidean",
    "manhattan",
    "norm",
    "normalize",
    "squared_euclidean",
]

from hnsw_vector_db_spark.plans.explain import (
    assert_no_cartesian,
    assert_pushed_filters,
    physical_plan,
    shuffle_count,
)

__all__ = [
    "assert_no_cartesian",
    "assert_pushed_filters",
    "physical_plan",
    "shuffle_count",
]

from caffeonspark_spark.plans.inspect import (
    physical_plan,
    pushed_filters,
    read_schema_columns,
    has_broadcast_join,
    wholestage_codegen_ops,
)

__all__ = [
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_ops",
]

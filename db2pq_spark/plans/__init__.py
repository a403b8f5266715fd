from db2pq_spark.plans.plan import (  # noqa: F401
    QueryPlan,
    build_plan,
    filter_columns,
    resolve_output_columns,
    validate_col_types,
)

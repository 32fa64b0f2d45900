from opentsdb_spark.plans.planner import compile_query, compile_subquery  # noqa: F401

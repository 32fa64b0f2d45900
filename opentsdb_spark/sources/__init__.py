from opentsdb_spark.sources.points import (  # noqa: F401
    POINT_SCHEMA,
    events_to_points,
    load_table,
    parse_put_lines,
    series_id_col,
    write_points,
    write_points_bucketed,
)

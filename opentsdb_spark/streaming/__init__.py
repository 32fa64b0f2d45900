from opentsdb_spark.streaming.ingest import (  # noqa: F401
    dedup_last_write_wins,
    read_json_stream,
    read_put_stream,
    rollup_stream,
    write_points_stream,
)

from earthmover_spark.streaming.ops import (  # noqa: F401
    read_stream_source,
    sessionize_stream,
    windowed_agg_stream,
    write_stream_destination,
)

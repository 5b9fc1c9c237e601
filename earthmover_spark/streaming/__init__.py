from earthmover_spark.streaming.ops import (  # noqa: F401
    attribution_stream,
    dedup_stream,
    dedup_stream_bloom,
    downsample_latest_stream,
    enrich_stream,
    join_streams,
    latest_state_stream,
    read_stream_source,
    running_counts_stream,
    sessionize_stream,
    windowed_agg_stream,
    write_stream_destination,
)

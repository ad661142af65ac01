from olake_spark.streaming.cdc import (  # noqa: F401
    cdc_stream_merge,
    windowed_event_stats,
)

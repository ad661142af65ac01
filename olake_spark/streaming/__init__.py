from olake_spark.streaming.cdc import (  # noqa: F401
    cdc_stream_merge,
    windowed_event_stats,
)
from olake_spark.streaming.kafka import (  # noqa: F401
    build_kafka_options,
    decode_cdc_records,
    offsets_json,
)

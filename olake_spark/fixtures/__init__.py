from olake_spark.fixtures.audio_clips import (  # noqa: F401
    CLIP_SCHEMA,
    cdc_batch,
    generate_clips,
)

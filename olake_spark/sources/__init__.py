from olake_spark.sources.chunked import (  # noqa: F401
    Chunk,
    plan_chunks,
    plan_chunks_by_quantiles,
    read_chunked,
)

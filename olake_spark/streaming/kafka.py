"""Kafka bounded CDC source: Spark's kafka format driven the way the
reference drives its partition readers.

Reference semantics (drivers/kafka/internal/cdc.go):
- capture per-partition end offsets up front, consume each partition
  until its end offset, then stop (cdc.go:98-106 checks
  ``offset >= EndOffset-1``) ≙ ``endingOffsets`` JSON on a batch
  kafka read, or ``startingOffsets`` + ``Trigger.AvailableNow`` on a
  stream (Spark captures the bound itself);
- one reader thread per partition (ReaderManager
  ThreadsEqualTotalPartitions) ≙ Spark maps one task per Kafka
  partition — the scheduler IS the reader manager;
- offsets commit only after the batch lands (PostCDC) ≙ the
  checkpoint advances after foreachBatch returns (same contract as
  the file-stream path in cdc.py).

No broker ships in this sandbox, so option construction + record
decoding are pure functions unit-tested without one; the reader
builders are thin wrappers over ``spark.read[Stream].format("kafka")``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def offsets_json(per_topic: dict[str, dict[int, int]]) -> str:
    """{"topic": {"0": 123, "1": -1}} — the exact JSON shape Spark's
    kafka source takes for starting/endingOffsets. -1 = latest,
    -2 = earliest (per-partition)."""
    return json.dumps(
        {t: {str(p): int(o) for p, o in parts.items()} for t, parts in per_topic.items()},
        sort_keys=True,
    )


def build_kafka_options(
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: dict[str, dict[int, int]] | str = "earliest",
    ending_offsets: dict[str, dict[int, int]] | str | None = None,
    group_id_prefix: str | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Reader options for a bounded Kafka read.

    ending_offsets bounds a BATCH read exactly like the reference's
    captured EndOffset map; for streams leave it None and run
    Trigger.AvailableNow. failOnDataLoss=false mirrors the reference
    tolerating compacted/expired offsets rather than aborting a sync.
    """
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": (
            starting_offsets
            if isinstance(starting_offsets, str)
            else offsets_json(starting_offsets)
        ),
        "failOnDataLoss": "false",
    }
    if ending_offsets is not None:
        opts["endingOffsets"] = (
            ending_offsets
            if isinstance(ending_offsets, str)
            else offsets_json(ending_offsets)
        )
    if group_id_prefix:
        opts["groupIdPrefix"] = group_id_prefix
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def decode_cdc_records(df: DataFrame, table_schema) -> DataFrame:
    """Kafka wire rows → table-shaped CDC rows.

    The reference's Kafka records are JSON documents whose fields map
    straight onto the RawRecord change shape (cdc.go:88-94 wraps each
    message as a 'create' change). ``value`` is parsed against the
    table schema with the same string-typed physical mapping as the
    JSON landing path in cdc.py (binary → base64 string → unbase64,
    timestamps → cast), so a Kafka batch and a JSONL landing file
    merge identically."""
    from pyspark.sql import types as T

    from olake_spark.table.evolution import align_batch

    json_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType()
                if isinstance(f.dataType, (T.BinaryType, T.TimestampType))
                else f.dataType,
                True,
            )
            for f in table_schema.fields
        ]
    )
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), json_schema).alias("__rec"),
        F.col("timestamp").alias("__kafka_ts"),
    ).select("__rec.*", "__kafka_ts")
    bin_cols = [f.name for f in table_schema.fields if isinstance(f.dataType, T.BinaryType)]
    for c in bin_cols:
        parsed = parsed.withColumn(c, F.unbase64(F.col(c)))
    # missing _cdc_timestamp falls back to the broker timestamp
    # (cdc.go uses Message.Time as the change timestamp)
    if "_cdc_timestamp" in parsed.columns:
        parsed = parsed.withColumn(
            "_cdc_timestamp",
            F.coalesce(F.col("_cdc_timestamp").cast("timestamp"), F.col("__kafka_ts")),
        )
    return align_batch(parsed.drop("__kafka_ts"), table_schema)


def kafka_bounded_read(
    spark: SparkSession, options: dict[str, str]
) -> DataFrame:
    """Batch read bounded by endingOffsets — the closest Spark analog
    of the reference's run-to-captured-end-offset loop. Requires a
    live broker."""
    reader = spark.read.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def kafka_cdc_stream(
    spark: SparkSession, options: dict[str, str]
):
    """readStream.format("kafka") with the built options; drain with
    Trigger.AvailableNow + foreachBatch(merge_into) exactly like the
    file-stream path (cdc.cdc_stream_merge). Requires a live broker."""
    reader = spark.readStream.format("kafka")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()

"""Raw (non-normalized) table layout: ``normalization=false`` mode.

The reference's raw destination writes one JSON ``data`` column plus
four metadata columns instead of a typed table
(types/data_types.go:55-61 RawSchema, 63-71 RawRecord,
GetParquetRawSchema:82-90):

    data               string (JSON of the full record)
    _olake_id          string (PK hash, utils/utils.go:252-273)
    _olake_timestamp   timestamp (ingest time)
    _op_type           string (r/c/u/d)
    _cdc_timestamp     timestamp (nullable — CDC only)

``to_raw`` folds any typed DataFrame into that shape with pure
Catalyst expressions (to_json over a struct — JVM-side, codegen);
``from_raw`` re-normalizes by parsing ``data`` against a target
schema. Round-tripping is value-exact for the engine's scalar types
(doubles serialize via shortest-repr and parse back bit-identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.functions.hashing import pk_hash_col

META_COLS = ["_olake_id", "_olake_timestamp", "_op_type", "_cdc_timestamp"]

RAW_SCHEMA = T.StructType(
    [
        T.StructField("data", T.StringType()),
        T.StructField("_olake_id", T.StringType()),
        T.StructField("_olake_timestamp", T.TimestampType()),
        T.StructField("_op_type", T.StringType()),
        T.StructField("_cdc_timestamp", T.TimestampType()),
    ]
)


def to_raw(
    df: DataFrame,
    pk_cols: list[str],
    op_type: str = "r",
    cdc_ts_col: str | None = None,
    ingest_ts_col: str | None = None,
) -> DataFrame:
    """Typed rows → RawRecord shape. Existing metadata columns are
    excluded from the JSON payload (they ride alongside, exactly as
    the reference keeps Data separate from the envelope)."""
    payload = [c for c in df.columns if c not in META_COLS]
    ingest = (
        F.col(ingest_ts_col)
        if ingest_ts_col
        else F.col("_olake_timestamp")
        if "_olake_timestamp" in df.columns
        else F.current_timestamp()
    )
    cdc = (
        F.col(cdc_ts_col)
        if cdc_ts_col
        else F.col("_cdc_timestamp")
        if "_cdc_timestamp" in df.columns
        else F.lit(None).cast("timestamp")
    )
    op = (
        F.col("_op_type")
        if "_op_type" in df.columns
        else F.lit(op_type)
    )
    oid = (
        F.col("_olake_id") if "_olake_id" in df.columns else pk_hash_col(*pk_cols)
    )
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in payload])).alias("data"),
        oid.alias("_olake_id"),
        ingest.cast("timestamp").alias("_olake_timestamp"),
        op.alias("_op_type"),
        cdc.cast("timestamp").alias("_cdc_timestamp"),
    )


def from_raw(df: DataFrame, payload_schema: T.StructType | str) -> DataFrame:
    """RawRecord shape → typed rows: parse ``data`` against the target
    schema (union-by-name; absent JSON keys become NULL — the same
    write-side contract as evolution.align_batch) and carry the four
    metadata columns through."""
    if isinstance(payload_schema, str):
        payload_schema = T.StructType.fromDDL(payload_schema)
    parsed = df.withColumn("__rec", F.from_json(F.col("data"), payload_schema))
    return parsed.select(
        *[F.col(f"__rec.{f.name}").alias(f.name) for f in payload_schema.fields],
        *[F.col(c) for c in META_COLS],
    )

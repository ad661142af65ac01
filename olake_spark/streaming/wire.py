"""CDC wire-format decoders: wal2json and binlog-JSON → RawRecord rows.

T1/T2 as PURE transforms (reference surfaces:
``pkg/waljs/filter.go:33-88`` — WALMessage {nextlsn, timestamp,
change[{kind, schema, table, columnnames/types/values, oldkeys}]} →
CDCChange; ``pkg/binlog/filter.go:36-95`` — RowsEvent {write/update/
delete_rows, update rows as (before, after) pairs, after-image wins} →
CDCChange; ``pkg/waljs/types.go:41-57`` message model). The DB wire
itself (pgoutput binary, mysql binlog binary) needs a live server the
sandbox doesn't have; wal2json and go-mysql both normalize to exactly
these JSON shapes, which IS the surface the reference's filter layer
consumes.

Everything here is JVM-side Catalyst: ``from_json`` against an explicit
message schema, ``map_from_arrays`` to pivot name/value arrays,
``posexplode`` for row fan-out, ``conv`` for LSN hex math — no Python
UDFs, so decode throughput scales with cores like any other projection.
Heterogeneous JSON column values are parsed as strings (Spark's JSON
reader renders any scalar token as its text) and cast to the table
schema by ``align_batch`` — the same string-typed physical mapping the
Kafka and JSONL landing paths use, so all three sources merge
identically.

Output contract: the table's columns + ``_op_type`` (c/u/d) +
``_cdc_timestamp`` — the RawRecord change shape
(types/data_types.go:63-71) that ``merge_into`` / ``merge_mor`` and the
landing pipeline consume directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.functions.reformat import reformat_date, reformat_epoch_auto
from olake_spark.table.evolution import align_batch

#: wal2json format-version-1 message model (pkg/waljs/types.go:41-57)
WAL_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("nextlsn", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "change",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("schema", T.StringType()),
                        T.StructField("table", T.StringType()),
                        T.StructField("columnnames", T.ArrayType(T.StringType())),
                        T.StructField("columntypes", T.ArrayType(T.StringType())),
                        T.StructField("columnvalues", T.ArrayType(T.StringType())),
                        T.StructField(
                            "oldkeys",
                            T.StructType(
                                [
                                    T.StructField("keynames", T.ArrayType(T.StringType())),
                                    T.StructField("keytypes", T.ArrayType(T.StringType())),
                                    T.StructField("keyvalues", T.ArrayType(T.StringType())),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        ),
    ]
)

#: binlog row-event model: the JSON rendering of go-mysql's RowsEvent
#: the reference's FilterRowsEvent consumes (pkg/binlog/filter.go:36-72)
BINLOG_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),  # write_rows|update_rows|delete_rows
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # header ts (or GTID µs ts)
        T.StructField("column_names", T.ArrayType(T.StringType())),
        T.StructField("column_types", T.ArrayType(T.StringType())),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
    ]
)

_WAL_KIND_TO_OP = {"insert": "c", "update": "u", "delete": "d"}
_BINLOG_EVENT_TO_OP = {"write_rows": "c", "update_rows": "u", "delete_rows": "d"}


def lsn_to_long(col) -> "F.Column":
    """Postgres LSN "XXXXXXXX/YYYYYYYY" (two hex words) → 64-bit long:
    hi<<32 | lo (pglogrepl.ParseLSN semantics, used on
    WALMessage.nextlsn for offset commit). JVM-side ``conv``."""
    parts = F.split(col, "/")
    hi = F.conv(parts.getItem(0), 16, 10).cast("long")
    lo = F.conv(parts.getItem(1), 16, 10).cast("long")
    return F.shiftleft(hi, 32) + lo


def _op_map_expr(mapping: dict[str, str]):
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return m


def _wire_timestamp(col) -> "F.Column":
    """Change-timestamp decode shared by all three wire formats. Bare
    integer strings are epoch values whose UNIT varies by producer —
    binlog header seconds, Mongo wallTime milliseconds, GTID
    microseconds — so they route through the digit-count unit detector
    (a bare ``cast('timestamp')`` turns '1735689600' into NULL, and the
    seconds-only arm clamps a millisecond value to year 9999; either
    way merge dedup ordering silently degrades to op-priority only).
    Everything else goes through the layout cascade, like
    transforms._granularity_value does."""
    return F.when(
        col.rlike(r"^-?[0-9]+$"), reformat_epoch_auto(col)
    ).otherwise(reformat_date(col))


def _pg_binary(col) -> "F.Column":
    """Postgres bytea wire decode: wal2json renders binary values as
    hex-escape strings (``\\x0102...``); the Kafka/JSONL landing
    convention is base64. Detect the ``\\x`` prefix and unhex, else
    unbase64 — without this, real Postgres binary payloads decode to
    NULL/garbage silently."""
    return F.when(
        col.startswith("\\x"), F.unhex(F.substring(col, 3, 2147483647))
    ).otherwise(F.unbase64(col))


def _finish(rows: DataFrame, table_schema: T.StructType, binary: str = "pg") -> DataFrame:
    """Pivot the name/value map onto the table's columns, cast through
    the string physical mapping (binary = hex-escape/base64 for the
    Postgres/Kafka conventions, plain lowercase hex for Mongo's
    ``filterMongoObject`` rendering), append RawRecord metadata
    columns. A ``__ts`` already typed timestamp skips the string
    cascade."""
    data_cols = [f for f in table_schema.fields if f.name not in ("_op_type", "_cdc_timestamp")]
    ts = (
        F.col("__ts")
        if isinstance(rows.schema["__ts"].dataType, T.TimestampType)
        else _wire_timestamp(F.col("__ts"))
    )
    out = rows.select(
        *[F.col("__m").getItem(f.name).alias(f.name) for f in data_cols],
        F.col("__op").alias("_op_type"),
        ts.alias("_cdc_timestamp"),
    )
    bin_fn = F.unhex if binary == "hex" else _pg_binary
    for f in data_cols:
        if isinstance(f.dataType, T.BinaryType):
            out = out.withColumn(f.name, bin_fn(F.col(f.name)))
    return align_batch(out, table_schema)


def decode_wal2json(
    raw: DataFrame,
    table_schema: T.StructType,
    schema_name: str,
    table_name: str,
    value_col: str = "value",
) -> DataFrame:
    """wal2json messages (one JSON document per row in ``value_col``) →
    RawRecord rows for one stream.

    Mirrors FilterWalJsChange (pkg/waljs/filter.go:33-88): unknown
    tables are dropped, inserts/updates read columnnames/columnvalues,
    deletes read oldkeys (the replica-identity key set), the message
    timestamp becomes the change timestamp, and kind maps
    insert/update/delete → c/u/d. A column present on the wire but not
    in the table schema is ignored; a table column missing from the
    wire lands NULL (mid-stream schema change tolerance — align_batch).
    """
    msg = raw.select(
        F.from_json(F.col(value_col).cast("string"), WAL_MESSAGE_SCHEMA).alias("__w")
    )
    ch = msg.select(
        F.col("__w.timestamp").alias("__ts"),
        F.explode(F.col("__w.change")).alias("__c"),
    ).filter(
        (F.col("__c.schema") == schema_name) & (F.col("__c.table") == table_name)
    )
    is_del = F.col("__c.kind") == "delete"
    rows = ch.select(
        "__ts",
        _op_map_expr(_WAL_KIND_TO_OP)[F.col("__c.kind")].alias("__op"),
        F.when(
            is_del,
            F.map_from_arrays(F.col("__c.oldkeys.keynames"), F.col("__c.oldkeys.keyvalues")),
        )
        .otherwise(
            F.map_from_arrays(F.col("__c.columnnames"), F.col("__c.columnvalues"))
        )
        .alias("__m"),
    ).filter(F.col("__op").isNotNull())
    return _finish(rows, table_schema)


def wal2json_next_lsn(raw: DataFrame, value_col: str = "value") -> int | None:
    """Max nextlsn across a batch of wal2json messages, as the 64-bit
    LSN long — the offset to ACK after the batch commits (T5: commit
    offset only after successful write, cdc.go:90-98). Tiny agg."""
    r = (
        raw.select(
            F.from_json(F.col(value_col).cast("string"), WAL_MESSAGE_SCHEMA).alias("__w")
        )
        .select(lsn_to_long(F.col("__w.nextlsn")).alias("__lsn"))
        .agg(F.max("__lsn").alias("m"))
        .first()
    )
    return None if r is None or r["m"] is None else int(r["m"])


def decode_binlog_rows(
    raw: DataFrame,
    table_schema: T.StructType,
    schema_name: str,
    table_name: str,
    value_col: str = "value",
) -> DataFrame:
    """binlog row events (one JSON document per row in ``value_col``)
    → RawRecord rows for one stream.

    Mirrors FilterRowsEvent (pkg/binlog/filter.go:36-95): unknown
    tables and event types are dropped; ``update_rows`` carries
    (before, after) image pairs and only the AFTER images (odd
    positions) survive; write/update/delete map to c/u/d; the event
    timestamp becomes the change timestamp.
    """
    msg = raw.select(
        F.from_json(F.col(value_col).cast("string"), BINLOG_EVENT_SCHEMA).alias("__e")
    ).filter(
        (F.col("__e.schema") == schema_name) & (F.col("__e.table") == table_name)
    )
    fan = msg.select(
        F.col("__e.timestamp").alias("__ts"),
        _op_map_expr(_BINLOG_EVENT_TO_OP)[F.col("__e.event_type")].alias("__op"),
        F.col("__e.column_names").alias("__names"),
        F.posexplode(F.col("__e.rows")).alias("__pos", "__vals"),
    ).filter(F.col("__op").isNotNull())
    # update events: rows = [before, after, before, after, ...] — keep
    # after-images only (filter.go:62-68)
    fan = fan.filter((F.col("__op") != "u") | (F.col("__pos") % 2 == 1))
    rows = fan.select(
        "__ts",
        "__op",
        F.map_from_arrays(F.col("__names"), F.col("__vals")).alias("__m"),
    )
    return _finish(rows, table_schema)


# ------------------------------------------------------------------ T3:
# Mongo change streams (drivers/mongodb/internal/cdc.go:29-177)

#: the change-stream document shape the reference's CDCDocument decodes
#: (cdc.go:29-35): _id._data is the resume token; fullDocument carries
#: post-image values already normalized by filterMongoObject
#: (mon.go:241-266 — binary as lowercase hex, ObjectID as hex,
#: Decimal128 as string); documentKey is the key set for deletes.
MONGO_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StructType([T.StructField("_data", T.StringType())])),
        T.StructField("operationType", T.StringType()),
        T.StructField(
            "clusterTime",
            T.StructType(
                [T.StructField("t", T.LongType()), T.StructField("i", T.LongType())]
            ),
        ),
        T.StructField("wallTime", T.StringType()),
        T.StructField("fullDocument", T.MapType(T.StringType(), T.StringType())),
        T.StructField("documentKey", T.MapType(T.StringType(), T.StringType())),
    ]
)

_MONGO_OP_TO_OP = {"insert": "c", "update": "u", "delete": "d"}


def decode_mongo_change_stream(
    raw: DataFrame,
    table_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Mongo change-stream documents (one JSON document per row in
    ``value_col``) → RawRecord rows.

    Mirrors handleChangeDoc (cdc.go:148-177): operation types other
    than insert/update/delete are dropped (the reference's $match
    pipeline, cdc.go:40-44); deletes substitute ``documentKey`` for the
    null ``fullDocument`` (cdc.go:154-156); the change timestamp is
    ``wallTime`` (millisecond precision) when present, else
    ``clusterTime`` as ``T*1000 + I`` milliseconds (cdc.go:161-164).
    Binary columns arrive as filterMongoObject's lowercase hex
    (mon.go:252-253) and are unhexed.
    """
    msg = raw.select(
        F.from_json(F.col(value_col).cast("string"), MONGO_CHANGE_SCHEMA).alias("__c")
    )
    rows = msg.select(
        _op_map_expr(_MONGO_OP_TO_OP)[F.col("__c.operationType")].alias("__op"),
        F.when(
            F.col("__c.operationType") == "delete", F.col("__c.documentKey")
        )
        .otherwise(F.col("__c.fullDocument"))
        .alias("__m"),
        F.coalesce(
            _wire_timestamp(F.col("__c.wallTime")),
            F.timestamp_millis(
                F.col("__c.clusterTime.t") * 1000 + F.col("__c.clusterTime.i")
            ),
        ).alias("__ts"),
    ).filter(F.col("__op").isNotNull())
    return _finish(rows, table_schema, binary="hex")


def mongo_resume_token_op_time(token: str) -> tuple[int, int]:
    """Resume-token hex → (timestamp seconds, increment) — the sortable
    opTime the reference extracts for catch-up checks
    (decodeResumeTokenOpTime, cdc.go:239-249): one keystring type byte,
    then two big-endian uint32s."""
    try:
        b = bytes.fromhex(token)
    except ValueError as e:
        raise ValueError("invalid resume token") from e
    if len(b) < 9:
        raise ValueError("invalid resume token")
    return int.from_bytes(b[1:5], "big"), int.from_bytes(b[5:9], "big")


def mongo_next_resume_token(raw: DataFrame, value_col: str = "value") -> str | None:
    """Max resume token across a batch by decoded (T, I) opTime — the
    cursor to persist after the batch commits (PostCDC, cdc.go:178-189:
    the token is check-pointed only on a clean batch). JVM-side: the
    opTime lives at fixed hex offsets (1 type byte + two BE uint32s →
    hex chars 3-18); fixed-width hex ORDERS the same as the numeric
    value, so the key is the lowercased 16-char substring itself —
    no ``conv`` math, which overflowed int64 for T ≥ 2^31 (post-2038
    tokens: ANSI mode throws, non-ANSI wraps negative and max_by
    checkpoints an OLDER token). Tiny agg, one row back."""
    tok = F.col("__c._id._data")
    key = F.lower(F.substring(tok, 3, 16))
    r = (
        raw.select(
            F.from_json(F.col(value_col).cast("string"), MONGO_CHANGE_SCHEMA).alias("__c")
        )
        .filter(tok.isNotNull())
        .agg(F.max_by(tok, key).alias("t"))
        .first()
    )
    return None if r is None else r["t"]


def mongo_stream_caught_up(token: str, cluster_op_time: tuple[int, int]) -> bool:
    """The idle-termination check (handleIdleCheckpoint,
    cdc.go:121-146): the bounded drain stops when the cluster opTime no
    longer leads the stream's resume-token opTime."""
    return not (cluster_op_time > mongo_resume_token_op_time(token))

"""T1/T2 wire decoders vs reference-shaped payloads
(pkg/waljs/filter.go:33-88, pkg/binlog/filter.go:36-95)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.streaming.wire import (
    decode_binlog_rows,
    decode_wal2json,
    lsn_to_long,
    wal2json_next_lsn,
)

TBL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("_op_type", T.StringType()),
        T.StructField("_cdc_timestamp", T.TimestampType()),
    ]
)


def _wal_msg(nextlsn, ts, changes):
    return json.dumps({"nextlsn": nextlsn, "timestamp": ts, "change": changes})


def _chg(kind, cols=None, oldkeys=None, schema="public", table="clips"):
    c = {"kind": kind, "schema": schema, "table": table}
    if cols is not None:
        c["columnnames"] = [k for k, _ in cols]
        c["columntypes"] = ["bigint" if isinstance(v, int) else "text" for _, v in cols]
        c["columnvalues"] = [v for _, v in cols]
    if oldkeys is not None:
        c["oldkeys"] = {
            "keynames": [k for k, _ in oldkeys],
            "keytypes": ["bigint"],
            "keyvalues": [v for _, v in oldkeys],
        }
    return c


class TestWal2Json:
    def test_insert_update_delete(self, spark):
        b64 = base64.b64encode(b"\x01\x02").decode()
        msgs = [
            _wal_msg(
                "0/1A2B3C4D",
                "2026-01-01 00:00:01",
                [
                    _chg("insert", cols=[("id", 1), ("name", "alpha"), ("payload", b64)]),
                    _chg("update", cols=[("id", 2), ("name", "beta2"), ("payload", b64)]),
                ],
            ),
            _wal_msg(
                "0/1A2B3C9D",
                "2026-01-01 00:00:02",
                [_chg("delete", oldkeys=[("id", 2)])],
            ),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        out = decode_wal2json(raw, TBL_SCHEMA, "public", "clips")
        assert out.schema == TBL_SCHEMA
        rows = {(r["id"], r["_op_type"]): r for r in out.collect()}
        assert set(rows) == {(1, "c"), (2, "u"), (2, "d")}
        assert rows[(1, "c")]["name"] == "alpha"
        assert bytes(rows[(1, "c")]["payload"]) == b"\x01\x02"
        assert rows[(2, "d")]["name"] is None  # delete carries keys only
        assert rows[(2, "d")]["_cdc_timestamp"].second == 2

    def test_unknown_table_dropped(self, spark):
        msgs = [
            _wal_msg(
                "0/10",
                "2026-01-01 00:00:01",
                [
                    _chg("insert", cols=[("id", 1), ("name", "x")], table="other"),
                    _chg("insert", cols=[("id", 2), ("name", "y")], schema="audit"),
                ],
            )
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        assert decode_wal2json(raw, TBL_SCHEMA, "public", "clips").count() == 0

    def test_mid_stream_schema_change(self, spark):
        """A new wire column is ignored; a missing table column lands
        NULL (the reference re-derives the stream schema and keeps
        going — evolution.align_batch is our half of that)."""
        msgs = [
            _wal_msg(
                "0/20",
                "2026-01-01 00:00:03",
                [
                    _chg("insert", cols=[("id", 7), ("name", "n7"), ("extra_col", "zz")]),
                    _chg("insert", cols=[("id", 8)]),
                ],
            )
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        got = {r["id"]: r for r in decode_wal2json(raw, TBL_SCHEMA, "public", "clips").collect()}
        assert got[7]["name"] == "n7" and "extra_col" not in TBL_SCHEMA.names
        assert got[8]["name"] is None and got[8]["payload"] is None

    def test_next_lsn(self, spark):
        msgs = [
            _wal_msg("0/1A2B3C4D", "2026-01-01 00:00:01", []),
            _wal_msg("1/00000002", "2026-01-01 00:00:02", []),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        assert wal2json_next_lsn(raw) == (1 << 32) + 2

    def test_lsn_to_long_column(self, spark):
        df = spark.createDataFrame([("16/B374D848",)], "lsn string")
        got = df.select(lsn_to_long(F.col("lsn")).alias("v")).first()["v"]
        assert got == (0x16 << 32) + 0xB374D848


def _binlog_evt(event_type, rows, ts="2026-01-02 00:00:05", schema="app", table="clips"):
    return json.dumps(
        {
            "event_type": event_type,
            "schema": schema,
            "table": table,
            "timestamp": ts,
            "column_names": ["id", "name", "payload"],
            "column_types": ["bigint", "text", "blob"],
            "rows": rows,
        }
    )


class TestBinlog:
    def test_write_update_delete(self, spark):
        b64 = base64.b64encode(b"pcm").decode()
        msgs = [
            _binlog_evt("write_rows", [[1, "a", b64], [2, "b", b64]]),
            # update rows are (before, after) pairs — after wins
            _binlog_evt(
                "update_rows",
                [[1, "a", b64], [1, "a2", b64], [2, "b", b64], [2, "b2", b64]],
            ),
            _binlog_evt("delete_rows", [[1, "a2", b64]]),
            _binlog_evt("write_rows", [[9, "other", b64]], table="not_ours"),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        out = decode_binlog_rows(raw, TBL_SCHEMA, "app", "clips")
        assert out.schema == TBL_SCHEMA
        rows = sorted(
            ((r["id"], r["_op_type"], r["name"]) for r in out.collect())
        )
        assert rows == [
            (1, "c", "a"),
            (1, "d", "a2"),
            (1, "u", "a2"),
            (2, "c", "b"),
            (2, "u", "b2"),
        ]

    def test_feeds_merge_shape(self, spark):
        """Decoded rows carry the RawRecord contract merge_into needs:
        _op_type + _cdc_timestamp typed, binary decoded."""
        b64 = base64.b64encode(b"\x00\x01").decode()
        raw = spark.createDataFrame(
            [(_binlog_evt("write_rows", [[5, "n", b64]]),)], "value string"
        )
        out = decode_binlog_rows(raw, TBL_SCHEMA, "app", "clips")
        r = out.first()
        assert r["_op_type"] == "c"
        assert r["_cdc_timestamp"] is not None
        assert bytes(r["payload"]) == b"\x00\x01"


class TestWireTimestampAndBytea:
    def test_binlog_epoch_seconds_timestamp(self, spark):
        """The binlog header ts is epoch seconds as a bare integer
        string — it must decode to the real instant, not NULL (ADVICE
        r3: bare cast('timestamp') NULLed it silently)."""
        raw = spark.createDataFrame(
            [(_binlog_evt("write_rows", [[7, "e", ""]], ts="1735689600"),)],
            "value string",
        )
        out = decode_binlog_rows(raw, TBL_SCHEMA, "app", "clips")
        r = out.first()
        assert r["_cdc_timestamp"] is not None
        assert r["_cdc_timestamp"].year == 2025 and r["_cdc_timestamp"].month == 1

    def test_epoch_unit_detection(self, spark):
        """Producers mix epoch units (binlog seconds, Mongo wallTime
        millis, GTID micros). A millisecond value fed to the seconds
        arm lands in year ~56938 and the clamp collapses it to 9999 —
        every row the same _cdc_timestamp, dedup order destroyed. The
        digit-count detector must decode all units to the same
        instant."""
        from olake_spark.functions.reformat import reformat_epoch_auto

        sec = 1735689600  # 2025-01-01T00:00:00Z
        df = spark.createDataFrame(
            [(str(sec),), (str(sec * 1000),), (str(sec * 1000_000),),
             (str(sec * 1000_000_000),)],
            "v string",
        ).select(reformat_epoch_auto("v").alias("ts"))
        got = [r["ts"] for r in df.collect()]
        assert all(t == got[0] for t in got)
        assert got[0].year == 2025 and got[0].month == 1

    def test_mongo_walltime_millis(self, spark):
        """Mongo change streams carry wallTime in epoch milliseconds —
        it must decode to the true instant, not a year-9999 clamp."""
        from olake_spark.streaming.wire import decode_mongo_change_stream

        raw = spark.createDataFrame(
            [(_mongo_evt("insert", 1, full={"id": "7", "name": "m"},
                         wall="1735689600123"),)],
            "value string",
        )
        r = decode_mongo_change_stream(raw, TBL_SCHEMA).first()
        assert r["_cdc_timestamp"].year == 2025
        assert r["_cdc_timestamp"].microsecond == 123000

    def test_wal2json_bytea_hex_escape(self, spark):
        """Real wal2json renders bytea as hex-escape ('\\x0102...'), not
        base64 — both conventions must decode to the same bytes."""
        msgs = [
            _wal_msg(
                "0/10",
                "2026-01-01 00:00:01",
                [_chg("insert", cols=[("id", 1), ("name", "hexrow"), ("payload", "\\x0a0b0c")])],
            ),
            _wal_msg(
                "0/11",
                "2026-01-01 00:00:02",
                [
                    _chg(
                        "insert",
                        cols=[
                            ("id", 2),
                            ("name", "b64row"),
                            ("payload", base64.b64encode(b"\x0a\x0b\x0c").decode()),
                        ],
                    )
                ],
            ),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        out = decode_wal2json(raw, TBL_SCHEMA, "public", "clips")
        rows = {r["id"]: bytes(r["payload"]) for r in out.collect()}
        assert rows == {1: b"\x0a\x0b\x0c", 2: b"\x0a\x0b\x0c"}


def _mongo_evt(op, token_seq, full=None, key=None, wall="2026-01-03 00:00:07", t=None, i=None):
    tok = "82" + format(t or 1767000000, "08x") + format(i if i is not None else token_seq, "08x") + "aa" * 4
    doc = {
        "_id": {"_data": tok},
        "operationType": op,
        "clusterTime": {"t": t or 1767000000, "i": i if i is not None else token_seq},
    }
    if wall is not None:
        doc["wallTime"] = wall
    if full is not None:
        doc["fullDocument"] = full
    if key is not None:
        doc["documentKey"] = key
    return json.dumps(doc)


class TestMongoChangeStream:
    """T3 decoder vs drivers/mongodb/internal/cdc.go:29-177 semantics."""

    def test_insert_update_delete_replace_dropped(self, spark):
        from olake_spark.streaming.wire import decode_mongo_change_stream

        msgs = [
            _mongo_evt("insert", 1, full={"id": "1", "name": "alpha", "payload": "0a0b"}),
            _mongo_evt("update", 2, full={"id": "1", "name": "alpha2", "payload": "0a0b"}),
            _mongo_evt("delete", 3, key={"id": "1"}),
            # $match drops anything not insert/update/delete (cdc.go:40-44)
            _mongo_evt("replace", 4, full={"id": "9", "name": "nope"}),
            _mongo_evt("drop", 5),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        out = decode_mongo_change_stream(raw, TBL_SCHEMA)
        assert out.schema == TBL_SCHEMA
        rows = {(r["id"], r["_op_type"]): r for r in out.collect()}
        assert set(rows) == {(1, "c"), (1, "u"), (1, "d")}
        # delete carries documentKey only (cdc.go:154-156)
        assert rows[(1, "d")]["name"] is None
        # binary is filterMongoObject's hex rendering (mon.go:252-253)
        assert bytes(rows[(1, "c")]["payload"]) == b"\x0a\x0b"
        assert rows[(1, "u")]["_cdc_timestamp"].second == 7

    def test_cluster_time_fallback(self, spark):
        """No wallTime → clusterTime T*1000+I milliseconds (cdc.go:161-164)."""
        from olake_spark.streaming.wire import decode_mongo_change_stream

        raw = spark.createDataFrame(
            [(_mongo_evt("insert", 1, full={"id": "5"}, wall=None, t=1735689600, i=250),)],
            "value string",
        )
        r = decode_mongo_change_stream(raw, TBL_SCHEMA).first()
        assert r["_cdc_timestamp"].year == 2025
        assert r["_cdc_timestamp"].microsecond == 250_000

    def test_resume_token_op_time_and_cursor(self, spark):
        from olake_spark.streaming.wire import (
            mongo_next_resume_token,
            mongo_resume_token_op_time,
            mongo_stream_caught_up,
        )

        msgs = [
            _mongo_evt("insert", 0, full={"id": "1"}, t=1767000001, i=2),
            _mongo_evt("insert", 0, full={"id": "2"}, t=1767000009, i=1),
            _mongo_evt("insert", 0, full={"id": "3"}, t=1767000009, i=0),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        best = mongo_next_resume_token(raw)
        assert mongo_resume_token_op_time(best) == (1767000009, 1)
        # idle-termination check (handleIdleCheckpoint, cdc.go:121-146)
        assert mongo_stream_caught_up(best, (1767000009, 1))
        assert mongo_stream_caught_up(best, (1767000008, 5))
        assert not mongo_stream_caught_up(best, (1767000010, 0))

    def test_resume_token_post_2038(self, spark):
        """T ≥ 2^31 overflowed the old conv()-based int64 ordering key
        (ANSI throw / silent wrap to an OLDER token); the lexicographic
        fixed-width-hex key cannot. Mixed-era tokens order correctly."""
        from olake_spark.streaming.wire import (
            mongo_next_resume_token,
            mongo_resume_token_op_time,
        )

        msgs = [
            _mongo_evt("insert", 0, full={"id": "1"}, t=2**31 + 7, i=3),
            _mongo_evt("insert", 0, full={"id": "2"}, t=2**31 - 1, i=9),
            _mongo_evt("insert", 0, full={"id": "3"}, t=2**32 - 1, i=4),
        ]
        raw = spark.createDataFrame([(m,) for m in msgs], "value string")
        best = mongo_next_resume_token(raw)
        assert mongo_resume_token_op_time(best) == (2**32 - 1, 4)

    def test_resume_token_invalid(self):
        from olake_spark.streaming.wire import mongo_resume_token_op_time

        for bad in ("zz", "82aabb"):
            with pytest.raises(ValueError, match="invalid resume token"):
                mongo_resume_token_op_time(bad)

    def test_feeds_merge_shape(self, spark):
        """Decoded rows align to the table schema and merge cleanly."""
        from olake_spark.streaming.wire import decode_mongo_change_stream

        raw = spark.createDataFrame(
            [(_mongo_evt("insert", 1, full={"id": "77", "name": "m", "payload": "00ff"}),)],
            "value string",
        )
        r = decode_mongo_change_stream(raw, TBL_SCHEMA).first()
        assert r["_op_type"] == "c" and r["id"] == 77
        assert bytes(r["payload"]) == b"\x00\xff"

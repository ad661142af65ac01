"""Column-name normalization, 12-layout date parser, raw layout
(reference utils/utils.go:378-389, typeutils/reformat.go:25-38 and
148-270, types/data_types.go:55-90)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from olake_spark.functions.reformat import (
    normalize_column_name,
    normalize_columns,
    reformat_date,
    reformat_epoch,
)

UTC = datetime.timezone.utc


class TestNormalizeColumns:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Order ID", "order_id"),
            ("o_orderkey", "o_orderkey"),
            ("Émail-Addr", "_mail_addr"),
            ("9col", "9col"),
            ("a.b.c", "a_b_c"),
            ("UPPER", "upper"),
        ],
    )
    def test_name_rule(self, raw, expected):
        assert normalize_column_name(raw) == expected

    def test_dataframe_rename(self, spark):
        df = spark.createDataFrame([(1, "x")], ["Order ID", "Status-Code"])
        out = normalize_columns(df)
        assert out.columns == ["order_id", "status_code"]
        assert out.first()["order_id"] == 1

    def test_collision_is_an_error(self, spark):
        df = spark.createDataFrame([(1, 2)], ["a b", "a_b"])
        with pytest.raises(ValueError, match="collision"):
            normalize_columns(df)


def _parse_one(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(reformat_date("s").alias("p")).first()["p"]


class TestReformatDate:
    @pytest.mark.parametrize(
        "s,expected",
        [
            # the reference's layout list (reformat.go:25-38)
            ("1995-01-15", datetime.datetime(1995, 1, 15)),
            ("1995-01-15 10:23:45", datetime.datetime(1995, 1, 15, 10, 23, 45)),
            ("1995-01-15 10:23:45 -07:00", datetime.datetime(1995, 1, 15, 17, 23, 45)),
            ("1995-01-15 10:23:45-07:00", datetime.datetime(1995, 1, 15, 17, 23, 45)),
            ("1995-01-15 10:23:45 -0700 MST", datetime.datetime(1995, 1, 15, 17, 23, 45)),
            ("1995-01-15T10:23:45", datetime.datetime(1995, 1, 15, 10, 23, 45)),
            ("1995-01-15T10:23:45.000123", datetime.datetime(1995, 1, 15, 10, 23, 45, 123)),
            (
                "1995-01-15T10:23:45.895Z",
                datetime.datetime(1995, 1, 15, 10, 23, 45, 895000),
            ),
            ("1995-01-15T10:23:45+0000", datetime.datetime(1995, 1, 15, 10, 23, 45)),
            (
                "1995-01-15 10:23:45.999999-07",
                datetime.datetime(1995, 1, 15, 17, 23, 45, 999999),
            ),
            ("1995-01-15 10:23:45.999999+00", datetime.datetime(1995, 1, 15, 10, 23, 45, 999999)),
            # gate passes, no layout matches → epoch-0 sentinel (go:269)
            ("1995-01-15 garbage", datetime.datetime(1970, 1, 1)),
            # single-digit parts (the Go layouts zero-pad, but real DBs emit both)
            ("1995-1-5", datetime.datetime(1995, 1, 5)),
        ],
    )
    def test_layouts(self, spark, s, expected):
        # session tz is UTC; offset layouts normalize into UTC wall time
        assert _parse_one(spark, s) == expected

    @pytest.mark.parametrize("s", ["junk-1995-01-15", "", "15/01/1995", "nope"])
    def test_gate_rejects(self, spark, s):
        assert _parse_one(spark, s) is None

    def test_year_clamp_low(self, spark):
        # year 0 → epoch start (reformat.go:217-222)
        assert _parse_one(spark, "0000-01-02") == datetime.datetime(1970, 1, 1)

    def test_year_clamp_high_epoch(self, spark):
        # year > 9999 shifts down to 9999 (reformat.go:223-226);
        # the far-future epoch is computed Spark-side (Python datetime
        # itself caps at 9999)
        far = (
            spark.range(1)
            .selectExpr("unix_seconds(make_timestamp(12025, 6, 1, 0, 0, 0)) AS e")
            .select(reformat_epoch("e").alias("p"))
            .first()["p"]
        )
        assert far.year == 9999
        assert (far.month, far.day) == (6, 1)

    def test_epoch_seconds(self, spark):
        df = spark.createDataFrame([(796_137_825,)], "e long")
        got = df.select(reformat_epoch("e").alias("p")).first()["p"]
        assert got == datetime.datetime(1995, 3, 25, 13, 23, 45)


class TestRawLayout:
    def test_round_trip_with_binary(self, spark):
        """Audio clips: binary payload survives JSON (base64) round
        trip bit-exactly; metadata columns carried through."""
        from olake_spark.fixtures.audio_clips import generate_clips
        from olake_spark.table.raw import from_raw, to_raw

        clips = generate_clips(spark, 16, partitions=2)
        raw = to_raw(clips, pk_cols=["clip_id"])
        assert raw.columns == ["data", "_olake_id", "_olake_timestamp", "_op_type", "_cdc_timestamp"]
        back = from_raw(
            raw, "clip_id string, bytes binary, sr_hz int, dur_ms int, transcript string"
        )
        orig = {r["clip_id"]: r for r in clips.collect()}
        for r in back.collect():
            o = orig[r["clip_id"]]
            assert bytes(r["bytes"]) == bytes(o["bytes"])
            assert r["transcript"] == o["transcript"]
            assert (r["sr_hz"], r["dur_ms"]) == (o["sr_hz"], o["dur_ms"])

    def test_existing_metadata_is_preserved(self, spark):
        from olake_spark.fixtures.audio_clips import cdc_batch
        from olake_spark.table.raw import to_raw

        b = cdc_batch(spark, 32, 1, updates=4, deletes=2)
        raw = to_raw(b, pk_cols=["clip_id"])
        ops = {r["_op_type"] for r in raw.select("_op_type").distinct().collect()}
        assert ops == {"u", "d"}
        # payload JSON must not re-embed the envelope columns
        assert raw.filter(F.col("data").contains("_olake_id")).count() == 0

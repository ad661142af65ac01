"""Incremental cursor-sync tests (drivers/abstract/incremental.go shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.plans.lineage import LineageManifest
from olake_spark.sources.incremental import (
    cursor_predicate,
    read_incremental,
    threshold_predicate,
)

SF = "/root/testdata/sf0.001"


def test_incremental_advances_and_resumes(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lin = LineageManifest(str(tmp_path / "state.json"), "inc-job")

    r1 = read_incremental(ev, "event_id", lin)
    assert r1["rows"] == ev.count()
    assert r1["cursor"] == ev.agg(F.max("event_id")).first()[0]

    # no new rows → cursor unchanged, nothing processed
    r2 = read_incremental(ev, "event_id", lin)
    assert r2 == {"rows": 0, "cursor": r1["cursor"]}

    # new rows past the cursor → only the delta is read
    newer = ev.withColumn("event_id", F.col("event_id") + F.lit(10_000_000))
    both = ev.unionAll(newer)
    r3 = read_incremental(both, "event_id", lin)
    assert r3["rows"] == ev.count()
    assert r3["cursor"] == r1["cursor"] + 10_000_000

    # fresh manifest object from disk resumes the same cursor
    lin2 = LineageManifest(str(tmp_path / "state.json"), "inc-job")
    r4 = read_incremental(both, "event_id", lin2)
    assert r4["rows"] == 0


def test_timestamp_cursor_roundtrips(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    lin = LineageManifest(str(tmp_path / "state.json"), "inc-ts")
    r1 = read_incremental(ev, "ts", lin)
    assert r1["rows"] == ev.count()
    # the persisted string cursor must filter everything out on rerun
    r2 = read_incremental(ev, "ts", lin)
    assert r2["rows"] == 0


def test_secondary_cursor_or_fallback(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "c1", F.when(F.col("event_id") % 3 == 0, F.col("event_id"))
    )
    p = cursor_predicate("c1", 100, secondary_col="event_id", secondary_value=500)
    got = ev.filter(p)
    # rows pass if c1 > 100, OR c1 IS NULL and event_id > 500
    bad = got.filter(
        ~((F.col("c1") > 100) | (F.col("c1").isNull() & (F.col("event_id") > 500)))
    )
    assert bad.count() == 0
    assert got.count() > 0


def test_threshold_caps_backfill(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    mx = ev.agg(F.expr("percentile(event_id, 0.5)")).first()[0]
    capped = ev.filter(threshold_predicate("event_id", int(mx)))
    assert capped.count() <= ev.count() // 2 + 1
    assert capped.agg(F.max("event_id")).first()[0] <= int(mx)

"""Chunk-planned scan tests (SURVEY.md §2.1 S1-S10 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.plans.lineage import LineageManifest
from olake_spark.sources.chunked import (
    Chunk,
    plan_chunks,
    plan_chunks_by_quantiles,
    read_chunked,
)


def test_plan_chunks_stride_and_sizing():
    # 10k rows × 1 MB rows, 2 GiB chunks → 2048 rows/chunk → 5 chunks
    chunks = plan_chunks(lo=0, hi=9999, rows=10_000, avg_row_bytes=1 << 20)
    assert len(chunks) == 5
    assert chunks[0].min == 0 and chunks[-1].max is None
    # half-open, contiguous, no gaps
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min
    assert plan_chunks(0, 10, rows=0, avg_row_bytes=100) == []


def test_chunks_partition_the_table(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    chunks = plan_chunks(0, 999, rows=1000, avg_row_bytes=1 << 21)  # 1024 rows/chunk? -> sized small
    total = sum(df.filter(c.predicate("k")).count() for c in chunks)
    assert total == 1000  # every row in exactly one chunk


def test_plan_chunks_by_quantiles(spark):
    df = spark.range(0, 10_000).selectExpr("id * id AS k")  # skewed key
    chunks = plan_chunks_by_quantiles(df, "k", 4)
    counts = [df.filter(c.predicate("k")).count() for c in chunks]
    assert sum(counts) == 10_000
    # equal-frequency: no chunk more than 2x the ideal quarter
    assert max(counts) <= 2 * 2500


def test_read_chunked_resume(spark, tmp_path):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    chunks = [Chunk(0, 0, 50), Chunk(1, 50, None)]
    lin = LineageManifest(str(tmp_path / "lin.json"), "job1")
    seen = []

    def process(cdf, c):
        n = cdf.count()
        seen.append((c.chunk_id, n))
        return n

    r1 = read_chunked(df, "k", chunks, lineage=lin, process=process)
    assert r1 == {"chunks": 2, "processed": 2, "skipped": 0, "rows": 100}
    assert seen == [(0, 50), (1, 50)]

    # resume: everything already done → nothing reprocessed
    r2 = read_chunked(df, "k", chunks, lineage=lin, process=process)
    assert r2["processed"] == 0 and r2["skipped"] == 2
    assert len(seen) == 2


def test_read_chunked_parallel_waves(spark, tmp_path):
    """max_parallel submits chunk jobs from concurrent driver threads:
    same totals, same per-chunk lineage, every chunk exactly once."""
    df = spark.range(0, 400).withColumnRenamed("id", "k")
    chunks = [Chunk(i, i * 50, None if i == 7 else (i + 1) * 50) for i in range(8)]
    lin = LineageManifest(str(tmp_path / "lin.json"), "jobp")
    r = read_chunked(df, "k", chunks, lineage=lin, max_parallel=4)
    assert r == {"chunks": 8, "processed": 8, "skipped": 0, "rows": 400}
    assert len(lin.metrics("backfill")) == 8
    assert all(m["rows"] == 50 for m in lin.metrics("backfill").values())
    # resume after the parallel run is still a no-op
    r2 = read_chunked(df, "k", chunks, lineage=lin, max_parallel=4)
    assert r2["processed"] == 0 and r2["skipped"] == 8


def test_plan_time_chunks_windows(spark):
    """S7: fixed time-window chunks partition a timestamped table
    exactly; the final chunk is open-ended."""
    import datetime as dt

    from olake_spark.sources.chunked import plan_time_chunks

    chunks = plan_time_chunks(
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8, 12), window_s=2 * 86400
    )
    assert len(chunks) == 4
    assert chunks[0].min == dt.datetime(2024, 1, 1)
    assert chunks[-1].max is None
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lo = ev.agg(F.min("ts")).first()[0]
    hi = ev.agg(F.max("ts")).first()[0]
    chunks = plan_time_chunks(lo, hi + dt.timedelta(seconds=1), window_s=86400)
    counts = [ev.filter(c.predicate("ts")).count() for c in chunks]
    assert sum(counts) == ev.count()
    assert plan_time_chunks(hi, lo, 60) == []

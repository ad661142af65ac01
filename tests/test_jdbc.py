"""JDBC chunk-predicate renderer (SURVEY.md §2 S3/S5; jdbc.go:203-283).

The partition contract: rendered predicates must cover the table
exactly — every row matched by exactly one predicate — including
multi-column lexicographic tuple ranges. Verified by executing the
rendered SQL strings both via Spark ``F.expr`` over parquet and via
DuckDB (dialect portability).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from olake_spark.sources.chunked import Chunk, plan_chunks
from olake_spark.sources.jdbc import (
    TupleChunk,
    chunk_predicates,
    plan_tuple_chunks,
    quote_literal,
    render_chunk_predicate,
    render_tuple_chunk_predicate,
    tuple_cmp_sql,
)

SF = "/root/testdata/sf0.001"


def _plain(c):
    return c


class TestLiterals:
    def test_quoting(self):
        assert quote_literal(5) == "5"
        assert quote_literal("o'brien") == "'o''brien'"
        assert quote_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
        assert (
            quote_literal(datetime.datetime(2024, 1, 2, 3, 4, 5))
            == "TIMESTAMP '2024-01-02 03:04:05'"
        )
        assert quote_literal(True) == "TRUE"
        with pytest.raises(ValueError):
            quote_literal(None)

    def test_tuple_cmp_expansion(self):
        sql = tuple_cmp_sql(["a", "b"], (1, 2), ">=", _plain)
        assert sql == "((a > 1) OR (a = 1 AND b >= 2))"
        sql = tuple_cmp_sql(["a", "b", "c"], (1, 2, 3), "<", _plain)
        assert sql == "((a < 1) OR (a = 1 AND b < 2) OR (a = 1 AND b = 2 AND c < 3))"


def _exact_partition_spark(df, preds):
    """Each rendered predicate via F.expr: counts must sum to the
    total AND the disjunction must cover every row exactly once."""
    total = df.count()
    counts = [df.filter(F.expr(p)).count() for p in preds]
    assert sum(counts) == total, (counts, total)
    assert all(c > 0 for c in counts)
    # disjoint: a row matching two predicates would double-count the OR-sum
    matched = df.filter(F.expr(" OR ".join(f"({p})" for p in preds))).count()
    assert matched == total


def _exact_partition_duckdb(table_sql, preds):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS {table_sql}")
    total = con.execute("SELECT count(*) FROM t").fetchone()[0]
    counts = [
        con.execute(f"SELECT count(*) FROM t WHERE {p}").fetchone()[0] for p in preds
    ]
    assert sum(counts) == total


class TestSingleColumn:
    def test_stride_chunks_partition_exactly(self, spark):
        o = spark.read.parquet(f"{SF}/orders.parquet")
        lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        chunks = plan_chunks(lo, hi, o.count(), avg_row_bytes=100, chunk_bytes=40_000)
        assert len(chunks) > 2
        preds = chunk_predicates(chunks, "o_orderkey", quote=_plain)
        _exact_partition_spark(o, preds)
        _exact_partition_duckdb(
            f"SELECT * FROM '{SF}/orders.parquet'", preds
        )

    def test_open_ended_chunk(self):
        p = render_chunk_predicate(Chunk(0, 10, None), "k", quote=_plain)
        assert p == "k >= 10"


class TestTupleRanges:
    def test_planned_tuple_chunks_partition_exactly(self, spark):
        o = spark.read.parquet(f"{SF}/orders.parquet")
        chunks = plan_tuple_chunks(o, ["o_custkey", "o_orderkey"], 5)
        assert len(chunks) == 5
        assert chunks[0].min is None and chunks[-1].max is None
        preds = chunk_predicates(chunks, ["o_custkey", "o_orderkey"], quote=_plain)
        _exact_partition_spark(o, preds)
        _exact_partition_duckdb(f"SELECT * FROM '{SF}/orders.parquet'", preds)

    def test_tie_on_leading_column(self, spark):
        """Boundaries that tie on the first column force the second
        level of the lexicographic expansion to matter."""
        o = spark.read.parquet(f"{SF}/orders.parquet")
        b1, b2 = ("O", 1000), ("O", 4000)
        chunks = [
            TupleChunk(0, None, b1),
            TupleChunk(1, b1, b2),
            TupleChunk(2, b2, None),
        ]
        cols = ["o_orderstatus", "o_orderkey"]
        preds = chunk_predicates(chunks, cols, quote=_plain)
        _exact_partition_spark(o, preds)
        # the middle chunk is exactly status O, 1000 <= key < 4000 plus
        # nothing else (strict lexicographic semantics)
        mid = o.filter(F.expr(preds[1]))
        exp = o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderkey") >= 1000)
            & (F.col("o_orderkey") < 4000)
        )
        assert mid.count() == exp.count()

    def test_unbounded_chunk_renders_trivial_predicate(self):
        assert render_tuple_chunk_predicate(TupleChunk(0, None, None), ["a"], _plain) == "1 = 1"

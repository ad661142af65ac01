"""JDBC-shaped chunked reads: chunk plans rendered to SQL predicates.

The reference's bread-and-butter source is a parallel DB backfill: the
table is split into key-range chunks and each chunk becomes one WHERE
predicate executed by one reader (pkg/jdbc/jdbc.go:203-283;
drivers/postgres/internal/backfill.go:74-216). Spark's native analog
is ``spark.read.jdbc(url, table, predicates=[...])`` — one partition
per predicate — so the missing piece is exactly the predicate
*renderer*, including the multi-column lexicographic tuple-range
comparison (pkg/jdbc/jdbc.go:231-256) for composite primary keys.

No database ships in this sandbox, so the renderer is verified two
ways instead: every rendered predicate string is executed via
``F.expr`` over parquet (Spark SQL) AND via DuckDB (ANSI SQL) and
must partition the table exactly — no gaps, no overlaps (the
`tuple_range_scan` correctness entry runs the same strings on both
engines).

Scale note: rendering is O(chunks) driver work on a tiny plan object;
the reads it drives are ordinary JDBC partitions. Boundary *planning*
for tuple keys uses an ntile window here (exact); on a 100 TB source
plan from a sample or the reference's LIMIT/OFFSET boundary probes —
the renderer does not care where boundaries come from.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olake_spark.sources.chunked import Chunk


def quote_literal(v) -> str:
    """Render a Python value as a dialect-portable SQL literal.

    Strings double embedded quotes (jdbc.go renders via driver-side
    placeholders; predicates for spark.read.jdbc must inline)."""
    if v is None:
        raise ValueError("NULL is not a valid chunk boundary")
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return "TIMESTAMP '" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "DATE '" + v.isoformat() + "'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def quote_ident(name: str) -> str:
    """ANSI double-quoted identifier (MySQL needs ANSI_QUOTES or
    backticks — callers pass a dialect-specific quoter if so)."""
    return '"' + name.replace('"', '""') + '"'


def render_chunk_predicate(chunk: Chunk, col: str, quote=quote_ident) -> str:
    """Half-open [min, max) single-column range → SQL
    (pkg/jdbc/jdbc.go:212-227)."""
    c = quote(col)
    parts = [f"{c} >= {quote_literal(chunk.min)}"]
    if chunk.max is not None:
        parts.append(f"{c} < {quote_literal(chunk.max)}")
    return " AND ".join(parts)


# ------------------------------------------------------------------ tuples


@dataclass(frozen=True)
class TupleChunk:
    """Half-open lexicographic range over a composite key:
    rows with min <= (c1,..,cn) < max; None end = unbounded."""

    chunk_id: int
    min: tuple | None
    max: tuple | None


def tuple_cmp_sql(cols: list[str], vals: tuple, op: str, quote=quote_ident) -> str:
    """Lexicographic (c1,..,cn) <op> (v1,..,vn) expanded to AND/OR form
    — the reference's buildTupleComparison (pkg/jdbc/jdbc.go:231-256):

        (c1 > v1) OR (c1 = v1 AND c2 > v2) OR ... last level uses op.

    op is '>=' or '<' (the two the half-open chunk contract needs).
    Expansion (not row-value syntax) keeps it valid on every dialect
    and lets engines use leading-column index ranges.
    """
    if len(cols) != len(vals):
        raise ValueError("arity mismatch")
    strict = {" >= ": " > ", " < ": " < "}[f" {op} "]
    terms = []
    for i in range(len(cols)):
        eqs = [
            f"{quote(cols[j])} = {quote_literal(vals[j])}" for j in range(i)
        ]
        last_op = op if i == len(cols) - 1 else strict.strip()
        eqs.append(f"{quote(cols[i])} {last_op} {quote_literal(vals[i])}")
        terms.append("(" + " AND ".join(eqs) + ")")
    return "(" + " OR ".join(terms) + ")"


def render_tuple_chunk_predicate(
    chunk: TupleChunk, cols: list[str], quote=quote_ident
) -> str:
    parts = []
    if chunk.min is not None:
        parts.append(tuple_cmp_sql(cols, chunk.min, ">=", quote))
    if chunk.max is not None:
        parts.append(tuple_cmp_sql(cols, chunk.max, "<", quote))
    return " AND ".join(parts) if parts else "1 = 1"


def plan_tuple_chunks(df: DataFrame, cols: list[str], n_chunks: int) -> list[TupleChunk]:
    """Equal-count boundary tuples via an ntile window over the key
    order — the declarative analog of the reference's next-chunk
    boundary probes (jdbc.go:90-119). Exact but involves a total sort
    of the KEY COLUMNS only; sample first at very large scale."""
    if n_chunks <= 1:
        return [TupleChunk(0, None, None)]
    w = Window.orderBy(*[F.col(c) for c in cols])
    firsts = (
        df.select(*cols)
        .withColumn("__t", F.ntile(n_chunks).over(w))
        .groupBy("__t")
        .agg(*[F.min(c).alias(c) for c in cols])
        .orderBy("__t")
        .collect()
    )
    bounds = [tuple(r[c] for c in cols) for r in firsts[1:]]  # skip tile 1 start
    out = []
    lo = None
    for i, b in enumerate(bounds):
        out.append(TupleChunk(i, lo, b))
        lo = b
    out.append(TupleChunk(len(bounds), lo, None))
    return out


def chunk_predicates(
    chunks: list[Chunk] | list[TupleChunk],
    cols: str | list[str],
    quote=quote_ident,
) -> list[str]:
    """Chunk plan → one WHERE predicate per Spark JDBC partition."""
    if isinstance(cols, str):
        return [render_chunk_predicate(c, cols, quote) for c in chunks]
    return [render_tuple_chunk_predicate(c, cols, quote) for c in chunks]


def read_jdbc_chunked(
    spark,
    url: str,
    table: str,
    chunks: list[Chunk] | list[TupleChunk],
    cols: str | list[str],
    properties: dict | None = None,
) -> DataFrame:
    """One JDBC partition per chunk predicate — Spark's analog of the
    reference's chunk scheduler fanning readers over key ranges
    (drivers/abstract/backfill.go:36-86). Needs a live database;
    everything above it is pure and unit-tested without one."""
    return spark.read.jdbc(
        url, table, predicates=chunk_predicates(chunks, cols), properties=properties or {}
    )

"""Chunk-planned parallel scans: the reference's backfill source model.

OLake splits every source table into half-open key-range *chunks*
sized to ~2 GiB of raw data, reads them concurrently, and checkpoints
per-chunk completion (SURVEY.md §2.1, S1-S10):

- numeric stride split ≙ `plan_chunks` (fixed stride over [min,max],
  drivers/postgres/internal/backfill.go:147-216)
- boundary probing on non-numeric / skewed keys (`splitViaNextQuery`,
  Mongo $bucketAuto) ≙ `plan_chunks_by_quantiles` (approxQuantile —
  equal-frequency boundaries from a sample, S6)
- chunk scan with half-open predicate ≙ `read_chunked`
  (`col >= lo AND col < hi`, pkg/jdbc/jdbc.go:212-227), expressed so
  Catalyst pushes the range predicate into the source scan
- resumable scheduling ≙ the lineage manifest: one unit per chunk,
  plan→persist→remove-on-complete (types/state.go:191-254)

In Spark the *execution* of concurrent chunks is the task scheduler's
job; what remains valuable at 100 TB is the PLAN: deterministic,
checkpointable ranges that bound per-unit work, so a killed job
resumes at chunk granularity instead of rescanning the table.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.plans.lineage import LineageManifest


@dataclass(frozen=True)
class Chunk:
    """Half-open [min, max) range over the split key; max=None → +∞."""

    chunk_id: int
    min: object
    max: object | None

    def predicate(self, col: str):
        p = F.col(col) >= F.lit(self.min)
        if self.max is not None:
            p = p & (F.col(col) < F.lit(self.max))
        return p


def plan_chunks(lo: int, hi: int, rows: int, avg_row_bytes: int,
                chunk_bytes: int = 2 << 30) -> list[Chunk]:
    """Fixed-stride numeric split: chunk row-count sized so a chunk is
    ~chunk_bytes of raw data (EffectiveParquetSize semantics,
    constants/constants.go:33-34; row-size-aware per MySQL
    backfill.go:95-101). Assumes keys roughly uniform over [lo, hi]."""
    if rows <= 0 or hi < lo:
        return []
    rows_per_chunk = max(1, chunk_bytes // max(avg_row_bytes, 1))
    n = max(1, math.ceil(rows / rows_per_chunk))
    span = hi - lo + 1
    stride = max(1, math.ceil(span / n))
    out = []
    b = lo
    while b <= hi:
        nxt = b + stride
        out.append(Chunk(len(out), b, None if nxt > hi else nxt))
        b = nxt
    return out


def plan_time_chunks(
    start,
    end,
    window_s: int,
) -> list[Chunk]:
    """S7: timestamp-window split — the Mongo incremental/CDC scan
    planner that walks fixed time windows over [start, end)
    (drivers/mongodb/internal: timestamp-bounded change batches).
    ``start``/``end`` are datetimes (or epoch seconds); each chunk is
    a half-open [t, t+window) range usable with a timestamp column via
    ``Chunk.predicate(ts_col)``. The final chunk is open-ended so rows
    landing after planning still belong to the last unit."""
    import datetime as _dt

    def _to_dt(v):
        if isinstance(v, (int, float)):
            return _dt.datetime.fromtimestamp(v, tz=_dt.timezone.utc).replace(tzinfo=None)
        return v

    start, end = _to_dt(start), _to_dt(end)
    if end <= start or window_s <= 0:
        return []
    out: list[Chunk] = []
    t = start
    step = _dt.timedelta(seconds=window_s)
    while t < end:
        nxt = t + step
        out.append(Chunk(len(out), t, None if nxt >= end else nxt))
        t = nxt
    return out


def plan_chunks_by_quantiles(df: DataFrame, col: str, n_chunks: int,
                             rel_err: float = 0.001) -> list[Chunk]:
    """Equal-frequency boundaries via approxQuantile — the declarative
    analog of boundary probing (LIMIT/OFFSET probes, $bucketAuto)."""
    if n_chunks <= 1:
        return [Chunk(0, float("-inf"), None)]
    qs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = df.stat.approxQuantile(col, qs, rel_err)
    # dedupe (heavy skew can repeat a boundary)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    lo = df.agg(F.min(col)).first()[0]
    edges = [lo] + uniq
    return [
        Chunk(i, e, uniq[i] if i < len(uniq) else None)
        for i, e in enumerate(edges)
    ]


def read_chunked(
    df: DataFrame,
    col: str,
    chunks: list[Chunk],
    lineage: LineageManifest | None = None,
    stage: str = "backfill",
    process=None,
    max_parallel: int = 1,
) -> dict:
    """Process each chunk's slice, checkpointing completion per chunk.

    ``process(chunk_df, chunk) -> rows_written`` does the work (write,
    merge, ...). Chunks already marked done in the lineage are skipped
    — the resume contract of the reference's backfill
    (drivers/abstract/backfill.go:36-86). Returns totals.

    max_parallel > 1 submits that many chunk jobs CONCURRENTLY from
    driver threads (Spark's scheduler interleaves their tasks — the
    analog of the reference's reader thread pool,
    constants MaxThreads). Sequential submission serializes ~100 ms of
    driver job setup per chunk, which at 10⁴ chunks is 15+ minutes of
    idle executors; lineage marks stay per-chunk either way, so the
    resume granularity is unchanged."""
    if process is None:
        def process(cdf, _c):
            return cdf.count()

    if lineage is not None:
        lineage.plan(
            stage,
            {f"chunk-{c.chunk_id}": {"min": str(c.min), "max": str(c.max)} for c in chunks},
        )
    done = skipped = rows = 0
    pending: list[Chunk] = []
    for c in sorted(chunks, key=lambda c: c.chunk_id):
        if lineage is not None and lineage.is_done(stage, f"chunk-{c.chunk_id}"):
            skipped += 1
        else:
            pending.append(c)

    def run_one(c: Chunk) -> int:
        n = int(process(df.filter(c.predicate(col)), c) or 0)
        if lineage is not None:
            lineage.mark_done(stage, f"chunk-{c.chunk_id}", rows=n)
        return n

    if max_parallel <= 1:
        for c in pending:
            rows += run_one(c)
            done += 1
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max_parallel) as ex:
            for n in ex.map(run_one, pending):
                rows += n
                done += 1
    return {"chunks": len(chunks), "processed": done, "skipped": skipped, "rows": rows}

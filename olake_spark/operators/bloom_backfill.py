"""Backfill key-bloom sidecars for data files that predate the table's
``write.bloom.column`` opt-in — the from-scratch analog of Iceberg's
"rewrite statistics" (puffin generation) maintenance action.

Sidecars are advisory and never manifest entries (table/bloom.py), so
backfill needs NO snapshot commit: each sidecar write is independently
idempotent, concurrent writers of the same sidecar converge (same
deterministic bytes for the same file), and a crash mid-sweep just
leaves some files still conservatively un-bloomed. That makes the op
trivially resumable — re-running skips files whose sidecars already
exist — and safe to run concurrently with ingest/merge (a new data
file gets its sidecar from its own harvest; this op only ever touches
files that are ALREADY live and missing one).

Scale shape mirrors the footer harvest (table/stats.py): the work unit
is one file (read its key column, build, write sidecar — cost ∝ that
file's key bytes), fanned out as a Spark job above the distributed
threshold and a driver thread pool below it. No shuffle anywhere; the
driver only ever holds the path list and per-file status strings.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from olake_spark.table import bloom as bloom_mod
from olake_spark.table.stats import DISTRIBUTED_THRESHOLD
from olake_spark.table.table import Table


def _build_one(abs_path: str, col: str, fpp: float) -> str:
    """Build+write one file's sidecar; returns a status tag.

    Module-level (not a closure) so the Spark path and the thread-pool
    path run the EXACT same code — the two fan-outs cannot drift.
    """
    import pyarrow.parquet as papq

    from olake_spark.table.fsio import fs_for

    fs, fs_path = fs_for(abs_path)
    if bloom_mod.read_sidecar(fs_path, fs=fs) is not None:
        return "skipped"
    try:
        pf = papq.ParquetFile(fs_path, filesystem=fs)
    except (FileNotFoundError, OSError):
        return "missing"
    try:
        if col not in pf.schema_arrow.names or not bloom_mod.buildable(
            pf.schema_arrow.field(col).type
        ):
            return "unsupported"
        values = pf.read(columns=[col]).column(0).to_pylist()
    finally:
        pf.close()
    payload = bloom_mod.build(col, values, fpp)
    if payload is None:  # file too large to bloom economically
        return "unsupported"
    bloom_mod.write_sidecar(fs_path, payload, fs=fs)
    return "built"


def build_blooms(
    table: Table,
    fpp: float | None = None,
    max_workers: int = 16,
) -> dict:
    """Backfill sidecars for every live data file missing one.

    Requires ``write.bloom.column`` to be set on the table — backfill
    for a column the write path will not maintain would silently decay
    as new files land bloom-less.
    """
    col = table.bloom_col
    if col is None:
        raise ValueError(
            "build_blooms: set the write.bloom.column table property first "
            "(backfill must target the same column the write path maintains)"
        )
    use_fpp = table.bloom_fpp if fpp is None else float(fpp)
    paths = [table.abs_entry_path(e) for e in table.data_entries()]
    if len(paths) > DISTRIBUTED_THRESHOLD:
        sc = table.spark.sparkContext
        n = min(len(paths), sc.defaultParallelism * 4)

        def part(items):
            from olake_spark.operators.bloom_backfill import _build_one as one

            return [one(p, col, use_fpp) for p in items]

        statuses = sc.parallelize(paths, n).mapPartitions(part).collect()
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            statuses = list(ex.map(lambda p: _build_one(p, col, use_fpp), paths))
    out = {"files": len(paths), "built": 0, "skipped": 0, "unsupported": 0, "missing": 0}
    for s in statuses:
        out[s] += 1
    return out

"""Per-file stats harvesting from parquet footers.

After a Spark write, we read only the footers (not the data) of the
produced files to build manifest entries: row counts, byte sizes, and
min/max bounds for the tracked stats columns. Two execution paths with
identical output:

- driver thread pool (``harvest``): footer reads are a few KiB each —
  for up-to-hundreds of files the driver finishes before a Spark job
  could even schedule.
- Spark job (``harvest_distributed``): above ``DISTRIBUTED_THRESHOLD``
  files the driver would serialize metadata IO; the same pure
  paths-in/entries-out function runs as an RDD ``mapPartitions`` over
  the path list (executors read footers locally in parallel), and only
  the manifest-sized entry rows return to the driver. This is the path
  a million-file commit takes at fleet scale.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as papq

from olake_spark.table import bloom as bloom_mod
from olake_spark.table.format import DataFileEntry
from olake_spark.table.fsio import file_size, fs_for

#: switch write_datafiles harvesting to the Spark-job path above this
#: many files per commit (footer ≈ ms each; below this the job-launch
#: overhead dominates)
DISTRIBUTED_THRESHOLD = 256

DEFAULT_STATS_COLS = ["_olake_id", "clip_id", "_cdc_timestamp", "dur_ms", "sr_hz"]


def _bound_value(v):
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    return v


def file_entry(
    abs_path: str,
    rel_path: str,
    partition: str,
    stats_cols: list[str],
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
) -> DataFileEntry:
    """Footer read routed through pyarrow.fs (table/fsio.py) so the
    harvest works against any ``FileSystem.from_uri`` storage, not just
    POSIX paths; LocalFileSystem is the plain-path default.

    ``bloom_col``: also build the file's key-bloom sidecar
    (table/bloom.py). This is the ONE place the harvest reads column
    DATA (that single column, decoded once) rather than footer bytes —
    cost proportional to data just written, on the same distributed
    path as the footer reads above DISTRIBUTED_THRESHOLD.
    """
    fs, fs_path = fs_for(abs_path)
    pf = papq.ParquetFile(fs_path, filesystem=fs)
    md = pf.metadata
    schema_names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    lo: dict = {}
    hi: dict = {}
    for col in stats_cols:
        ci = schema_names.get(col)
        if ci is None:
            continue
        cmin, cmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                cmin = cmax = None
                break
            mn, mx = _bound_value(st.min), _bound_value(st.max)
            cmin = mn if cmin is None or mn < cmin else cmin
            cmax = mx if cmax is None or mx > cmax else cmax
        if cmin is not None:
            lo[col] = cmin
            hi[col] = cmax
    if bloom_col is not None and bloom_col in schema_names:
        ftype = pf.schema_arrow.field(bloom_col).type
        if bloom_mod.buildable(ftype):
            values = pf.read(columns=[bloom_col]).column(0).to_pylist()
            payload = bloom_mod.build(bloom_col, values, bloom_fpp)
            if payload is not None:
                bloom_mod.write_sidecar(fs_path, payload, fs=fs)
    return DataFileEntry(
        path=rel_path,
        partition=partition,
        record_count=md.num_rows,
        file_size_bytes=file_size(fs_path, fs),
        lower_bounds=lo,
        upper_bounds=hi,
    )


def harvest(
    location: str,
    files: list[tuple[str, str]],  # (abs_path, partition)
    stats_cols: list[str],
    max_workers: int = 16,
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
) -> list[DataFileEntry]:
    def one(item):
        abs_path, partition = item
        rel = os.path.relpath(abs_path, location)
        return file_entry(abs_path, rel, partition, stats_cols, bloom_col, bloom_fpp)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(one, files))


def harvest_distributed(
    spark,
    location: str,
    files: list[tuple[str, str]],  # (abs_path, partition)
    stats_cols: list[str],
    slices: int | None = None,
    bloom_col: str | None = None,
    bloom_fpp: float = 0.01,
) -> list[DataFileEntry]:
    """Footer harvest as a Spark job: ship (path, partition) pairs to
    executors, read footers there, return manifest entries. Entries are
    tiny (a few hundred bytes) so the collect is manifest-scale, never
    data-scale. Output is byte-identical to ``harvest`` — pytest pins
    the equivalence.

    The closure captures only (location, stats_cols) strings; the
    harvesting logic is the same module-level ``file_entry`` the driver
    path uses, so the two paths cannot drift.
    """
    if not files:
        return []
    sc = spark.sparkContext
    n = slices or min(len(files), sc.defaultParallelism * 4)

    def part(items):
        out = []
        for abs_path, partition in items:
            rel = os.path.relpath(abs_path, location)
            e = file_entry(abs_path, rel, partition, stats_cols, bloom_col, bloom_fpp)
            out.append(
                (
                    e.path,
                    e.partition,
                    e.record_count,
                    e.file_size_bytes,
                    e.lower_bounds,
                    e.upper_bounds,
                )
            )
        return out

    rows = sc.parallelize(files, n).mapPartitions(part).collect()
    entries = [
        DataFileEntry(
            path=p,
            partition=pt,
            record_count=rc,
            file_size_bytes=sz,
            lower_bounds=lo,
            upper_bounds=hi,
        )
        for p, pt, rc, sz, lo, hi in rows
    ]
    # keep driver-path ordering (input file order) so manifests are
    # deterministic regardless of partition completion order
    order = {os.path.relpath(a, location): i for i, (a, _) in enumerate(files)}
    entries.sort(key=lambda e: order[e.path])
    return entries

"""Per-file stats harvesting from parquet footers.

After a Spark write, we read only the footers (not the data) of the
produced files to build manifest entries: row counts, byte sizes, and
min/max bounds for the tracked stats columns. Footer reads are a few
KiB each and parallelized with a thread pool on the driver; at fleet
scale this same harvest runs as a Spark job over file paths (the
function below is partition-shippable — pure paths in, rows out).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pyarrow.parquet as papq

from olake_spark.table.format import DataFileEntry

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
) -> DataFileEntry:
    pf = papq.ParquetFile(abs_path)
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
    return DataFileEntry(
        path=rel_path,
        partition=partition,
        record_count=md.num_rows,
        file_size_bytes=os.path.getsize(abs_path),
        lower_bounds=lo,
        upper_bounds=hi,
    )


def harvest(
    location: str,
    files: list[tuple[str, str]],  # (abs_path, partition)
    stats_cols: list[str],
    max_workers: int = 16,
) -> list[DataFileEntry]:
    def one(item):
        abs_path, partition = item
        rel = os.path.relpath(abs_path, location)
        return file_entry(abs_path, rel, partition, stats_cols)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(one, files))

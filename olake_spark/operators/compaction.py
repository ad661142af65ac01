"""Bin-packing compaction: FFD planner → broadcast plan → fanout rewrite.

Small files are grouped per table-partition into ~target-size bins by
the greedy first-fit-decreasing planner (plans/ffd.py). The plan (a
file→bin map) is broadcast-joined against the scanned rows'
``_metadata.file_path``, the rows are repartitioned on the bin id, and
each bin is written as exactly one output file — one distributed Spark
job for the whole plan, no per-bin driver loop (at 10^5 bins a
job-per-bin would be a scheduler DoS).

Reference parity: target data file size 512 MiB
(arrow-writer/utils.go:22, rolling writer writer.go:195-222); our
compactor enforces the same target after the fact. Resumable via the
lineage manifest in *waves* (one commit per wave ≙ chunk
remove-on-complete, drivers/abstract/backfill.go:60-64).
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import functions as F

from olake_spark.plans.ffd import Bin, first_fit_decreasing
from olake_spark.plans.lineage import LineageManifest
from olake_spark.table.format import DataFileEntry
from olake_spark.table.table import Table

FANOUT_COL = "__olake_bin"


def plan_compaction(
    entries: list[DataFileEntry],
    target_size: int,
    small_ratio: float = 0.75,
) -> list[Bin]:
    """FFD over files smaller than small_ratio × target, per partition."""
    by_partition: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for e in entries:
        if e.file_size_bytes < target_size * small_ratio:
            by_partition[e.partition].append((e.path, e.file_size_bytes))
    bins: list[Bin] = []
    for part in sorted(by_partition):
        for b in first_fit_decreasing(by_partition[part], target_size):
            b.bin_id = len(bins)
            bins.append(b)
    return bins


def _rewrite_bins(table: Table, bins: list[Bin], entry_by_path: dict[str, DataFileEntry]):
    """One Spark job: read all binned files, broadcast-map file→bin,
    fanout-write one file per bin."""
    paths = [p for b in bins for p, _ in b.items]
    src_entries = [entry_by_path[p] for p in paths]
    # file identity rides in via scan's file_col (normalized absolute
    # path — never the basename, which collides across fanout dirs)
    df = table.scan(entries=src_entries, file_col="__file")
    rows = [
        (table.abs_entry_path(entry_by_path[p]), b.bin_id)
        for b in bins
        for p, _ in b.items
    ]
    plan_df = table.spark.createDataFrame(rows, f"__file string, {FANOUT_COL} int")
    binned = df.join(F.broadcast(plan_df), "__file", "inner").drop("__file")
    key = table.meta.identifier_fields[0] if table.meta.identifier_fields else None
    # per-file roll budget from observed bytes/row (W4): a bin whose
    # input stats underestimated its size still rolls at the target
    tot_bytes = sum(e.file_size_bytes for e in src_entries)
    tot_rows = sum(e.record_count for e in src_entries) or 1
    roll_rows = max(1, int(max(b.capacity for b in bins) / max(1.0, tot_bytes / tot_rows)))
    new_entries = table.write_datafiles(
        binned,
        fanout_col=FANOUT_COL,
        num_groups=len(bins),
        sort_within=[key] if key else None,
        max_records_per_file=roll_rows,
    )
    # a rewrite must carry every input row — abort BEFORE the replace
    # commit if the plan join dropped anything (path normalization bugs
    # would otherwise silently delete data)
    expected = sum(entry_by_path[p].record_count for p in paths)
    got = sum(e.record_count for e in new_entries)
    if got != expected:
        raise RuntimeError(
            f"compaction rewrite row mismatch: planned {expected} rows, "
            f"wrote {got} — aborting before commit"
        )
    return paths, new_entries


def compact(
    table: Table,
    target_size: int | None = None,
    small_ratio: float = 0.75,
    lineage: LineageManifest | None = None,
    stage: str = "compact",
    wave_bins: int = 64,
) -> dict:
    """Compact small files; returns metrics. Resumable per wave.

    Merge-on-read interaction: rewriting a data file gives its rows a
    NEW sequence number, which would lift them past any live equality
    delete (sequence-strict anti-join) and resurrect deleted rows —
    so live delete files are folded first (`fold_deletes` rewrites
    exactly the delete-affected files and drops the delete files),
    then compaction plans against the clean table. Iceberg's
    rewrite-data-files maintenance has the same ordering contract."""
    target_size = target_size or table.target_file_size
    if table.delete_entries():
        from olake_spark.operators.merge import fold_deletes

        fold_deletes(table, target_file_size=target_size, lineage=lineage,
                     stage=f"{stage}-prefold")
    # resume: execute the PERSISTED plan, never a fresh re-plan — after a
    # partial run the file set has changed and a re-plan would misalign
    # wave ids with completed units (chunk-protocol parity: the chunk set
    # is computed once and persisted, types/state.go:191-254)
    planned = lineage.planned(stage) if lineage is not None else {}
    if planned:
        waves = []
        for unit in sorted(planned, key=lambda u: int(u.split("-")[1])):
            wv = [
                Bin(bin_id=i, capacity=target_size, items=[tuple(it) for it in items])
                for i, items in enumerate(planned[unit]["bins"])
            ]
            waves.append(wv)
        bins = [b for wv in waves for b in wv]
    else:
        entries = table.entries()
        bins = plan_compaction(entries, target_size, small_ratio)
        if not bins:
            return {"bins": 0, "waves": 0, "files_in": 0, "files_out": 0}
        waves = [bins[i : i + wave_bins] for i in range(0, len(bins), wave_bins)]
        if lineage is not None:
            lineage.plan(
                stage,
                {
                    f"wave-{w}": {"bins": [list(b.items) for b in wv]}
                    for w, wv in enumerate(waves)
                },
            )

    done_waves = 0
    total_in, total_out = 0, 0
    for w, wv in enumerate(waves):
        unit = f"wave-{w}"
        if lineage is not None and lineage.is_done(stage, unit):
            done_waves += 1
            continue
        # a resumed wave may reference files replaced by its own earlier,
        # half-committed attempt — revalidate against live paths
        entry_by_path = {e.path: e for e in table.entries()}
        wv_live = [b for b in wv if all(p in entry_by_path for p, _ in b.items)]
        if not wv_live:
            if lineage is not None:
                lineage.mark_done(stage, unit, snapshot_id=table.meta.current_snapshot_id)
            continue
        removed, new_entries = _rewrite_bins(table, wv_live, entry_by_path)
        snap = table.commit_replace(
            set(removed), new_entries, operation="compact",
            summary={"bins": len(wv_live)},
        )
        total_in += len(removed)
        total_out += len(new_entries)
        if lineage is not None:
            lineage.mark_done(
                stage,
                unit,
                files=len(new_entries),
                rows=sum(e.record_count for e in new_entries),
                bytes_=sum(e.file_size_bytes for e in new_entries),
                snapshot_id=snap.snapshot_id,
            )
        done_waves += 1
    return {
        "bins": len(bins),
        "waves": done_waves,
        "files_in": total_in,
        "files_out": total_out,
        "snapshot_id": table.meta.current_snapshot_id,
    }

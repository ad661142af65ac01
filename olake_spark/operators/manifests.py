"""Manifest rewrite: re-group manifest entries by partition.

After many incremental commits a snapshot accumulates lots of small
manifests with interleaved partitions; scan planning then reads them
all. Rewriting groups entries by partition (then by path) into few
right-sized manifests — a metadata-only snapshot, zero data IO.
(Analog of Iceberg's RewriteManifests action; the reference's
metadata lives server-side in its catalog.)
"""

from __future__ import annotations

from olake_spark.table import format as fmt
from olake_spark.table.table import Table


def rewrite_manifests(
    table: Table,
    target_entries_per_manifest: int = 100_000,
) -> dict:
    snap = table.meta.snapshot()
    if snap is None:
        return {"manifests_before": 0, "manifests_after": 0}
    entries = fmt.read_manifests(table.location, snap.manifests)
    entries.sort(key=lambda e: (e.partition, e.path))
    new_manifests: list[str] = []
    for i in range(0, len(entries), target_entries_per_manifest):
        chunk = entries[i : i + target_entries_per_manifest]
        new_manifests.append(fmt.write_manifest(table.location, chunk))
    before = len(snap.manifests)
    new_snap = table.commit_rewrite_manifests(
        new_manifests,
        summary={"manifests-before": before, "manifests-after": len(new_manifests)},
    )
    return {
        "snapshot_id": new_snap.snapshot_id,
        "manifests_before": before,
        "manifests_after": len(new_manifests),
        "entries": len(entries),
    }

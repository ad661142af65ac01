"""Auto-maintenance planner: inspect table state → ordered stage list.

The reference leaves table upkeep to out-of-band Iceberg services; a
maintenance ENGINE should know when its own operators are due. The
planner reads only metadata (manifest entries + snapshot log — zero
data IO) and emits the stage dicts ``cli.cmd_sync`` executes, in
dependency order (fold before compact/cluster so rewrites don't race
live deletes; expire last so freshly-replaced files age out together).

Triggers, each overridable via table properties (``maintenance.*``):

- ``fold_deletes``      delete-file count ≥ ``max-delete-files`` (4) —
                        bounds MoR scan-time read amplification
- ``compact``           ≥ ``min-small-files`` (8) data files under
                        ``small-file-ratio`` (0.5) × target size
- ``cluster``           a clustering exists and ≥ ``recluster-appends``
                        (8) data files were added after it (staleness);
                        curve follows the last cluster operation
- ``rewrite_manifests`` manifest count ≥ ``max-manifests`` (16)
- ``expire``            snapshot count ≥ ``max-snapshots`` (20)
"""

from __future__ import annotations

from olake_spark.operators.clustering import CURVE_PROP
from olake_spark.table.table import Table


def _prop(table: Table, name: str, default: float) -> float:
    raw = table.meta.properties.get(f"maintenance.{name}")
    return float(raw) if raw is not None else float(default)


def plan_maintenance(table: Table) -> list[dict]:
    """Metadata-only inspection → list of due stage dicts (possibly
    empty). Deterministic given the table state."""
    stages: list[dict] = []
    data = table.data_entries()
    dels = table.delete_entries()
    snaps = table.meta.snapshots
    cur = table.meta.snapshot()
    target = table.target_file_size

    if len(dels) >= _prop(table, "max-delete-files", 4):
        stages.append({"op": "fold_deletes", "reason": f"{len(dels)} delete files live"})

    small_cut = _prop(table, "small-file-ratio", 0.5) * target
    small = [e for e in data if e.file_size_bytes < small_cut]
    if len(small) >= _prop(table, "min-small-files", 8):
        stages.append(
            {"op": "compact", "reason": f"{len(small)} files under {int(small_cut)} bytes"}
        )

    cluster_snaps = [s for s in snaps if s.operation.startswith("cluster-")]
    if cluster_snaps:
        last = max(cluster_snaps, key=lambda s: s.sequence_number)
        # added_snapshot_id is a snapshot id — map it to that snapshot's
        # sequence number for the "added after the clustering" test
        # (today ids equal sequence numbers, but the format models them
        # as distinct domains)
        seq_of = {s.snapshot_id: s.sequence_number for s in snaps}
        # unknown adder (its snapshot expired) ⇒ the file predates the
        # retained window, i.e. older than the clustering — not stale
        stale = [
            e
            for e in data
            if seq_of.get(e.added_snapshot_id, -1) > last.sequence_number
        ]
        if len(stale) >= _prop(table, "recluster-appends", 8):
            curve = last.operation.removeprefix("cluster-").removeprefix("incr-")
            if CURVE_PROP in table.meta.properties:
                # incremental state exists → the cheap heartbeat rewrite
                # (newcomers + overlapped files only), not a full pass
                stages.append(
                    {
                        "op": "cluster_incremental",
                        "reason": f"{len(stale)} data files added since snapshot {last.snapshot_id}",
                    }
                )
            else:
                stages.append(
                    {
                        "op": "cluster",
                        "curve": curve,
                        "reason": f"{len(stale)} data files added since snapshot {last.snapshot_id}",
                    }
                )

    if cur is not None and len(cur.manifests) >= _prop(table, "max-manifests", 16):
        stages.append(
            {"op": "rewrite_manifests", "reason": f"{len(cur.manifests)} manifests"}
        )

    if len(snaps) >= _prop(table, "max-snapshots", 20):
        stages.append({"op": "expire", "keep_last": 2, "reason": f"{len(snaps)} snapshots"})
    return stages

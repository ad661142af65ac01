"""Snapshot expiry: drop old snapshots, delete newly-orphaned files.

The principled version of the reference's drop/clear destination
(destination/iceberg/iceberg.go:511-557, parquet.go:467-553): history
is trimmed by retention policy, and a file is physically deleted only
when *no retained snapshot* references it — so readers pinned to any
retained snapshot are never broken (snapshot isolation holds across
expiry).
"""

from __future__ import annotations

import os
import time

from olake_spark.table import bloom as bloom_mod
from olake_spark.table import format as fmt
from olake_spark.table.table import Table


def expire_snapshots(
    table: Table,
    keep_last: int = 1,
    older_than_ms: int | None = None,
    dry_run: bool = False,
) -> dict:
    """Expire snapshots beyond the newest ``keep_last`` that are older
    than ``older_than_ms`` (default: now). The current snapshot is
    always retained."""
    meta = table.meta
    cutoff = older_than_ms if older_than_ms is not None else int(time.time() * 1000) + 1
    ordered = sorted(meta.snapshots, key=lambda s: s.sequence_number, reverse=True)
    retained, expired = [], []
    for i, s in enumerate(ordered):
        if (
            s.snapshot_id == meta.current_snapshot_id
            or i < keep_last
            or s.timestamp_ms >= cutoff
        ):
            retained.append(s)
        else:
            expired.append(s)
    if not expired:
        return {"expired": 0, "deleted_files": 0, "freed_bytes": 0}

    def files_of(snaps) -> dict[str, int]:
        out: dict[str, int] = {}
        for s in snaps:
            for e in fmt.read_manifests(table.location, s.manifests):
                out[e.path] = e.file_size_bytes
        return out

    live = files_of(retained)
    dead = {p: b for p, b in files_of(expired).items() if p not in live}
    live_manifests = {m for s in retained for m in s.manifests}
    dead_manifests = {
        m for s in expired for m in s.manifests if m not in live_manifests
    }

    if not dry_run:
        # metadata first (atomic version bump), then physical deletes —
        # a crash between the two leaves only harmless orphans
        new_meta = fmt.TableMetadata(
            table_uuid=meta.table_uuid,
            name=meta.name,
            location=meta.location,
            schema_json=meta.schema_json,
            identifier_fields=meta.identifier_fields,
            partition_spec=meta.partition_spec,
            properties=meta.properties,
            current_snapshot_id=meta.current_snapshot_id,
            snapshots=sorted(retained, key=lambda s: s.sequence_number),
            last_sequence_number=meta.last_sequence_number,
            version=meta.version + 1,
        )
        if not fmt.try_write_metadata(table.location, new_meta):
            table.refresh()
            return expire_snapshots(table, keep_last, older_than_ms, dry_run)
        table.meta = new_meta
        for rel in list(dead) + sorted(dead_manifests):
            p = os.path.join(table.location, rel)
            if os.path.exists(p):
                os.remove(p)
            # a dead data file takes its advisory key-bloom sidecar
            # (table/bloom.py) with it; no-op for manifests
            sidecar = p + bloom_mod.SIDECAR_SUFFIX
            if os.path.exists(sidecar):
                os.remove(sidecar)
    return {
        "expired": len(expired),
        "retained": len(retained),
        "deleted_files": len(dead),
        "deleted_manifests": len(dead_manifests),
        "freed_bytes": sum(dead.values()),
    }

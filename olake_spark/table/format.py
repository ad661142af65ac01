"""On-disk table format: JSON snapshot metadata + parquet manifests.

A from-scratch, Iceberg-shaped (NOT Iceberg-binary) format:

    <location>/
      data/<commit-uuid>/...parquet          # immutable data files
      metadata/v<N>.metadata.json            # table metadata versions
      metadata/version-hint.text             # pointer to current N
      metadata/manifests/<uuid>.parquet      # manifest files (file lists)

Each *snapshot* references a set of manifest parquet files; the union
of their rows is exactly the set of live data files at that snapshot —
snapshot-isolated readers resolve their own file list and are immune
to concurrent commits (reference parity: Iceberg RowDelta/AppendFiles
atomicity used by IcebergTableOperator.java:116-169).

Manifests are *shared across snapshots*: an append adds one manifest;
a replace rewrites only manifests that lost a file. Commit cost is
O(changed files), not O(table) — the property that matters at 10^12
rows. Manifest entries carry per-file min/max stats for the tracked
columns, which is what scan pruning and MERGE file pruning use
(reference parity: chunk min/max predicates, pkg/jdbc/jdbc.go:212-227).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass, field

import pyarrow as pa
import pyarrow.parquet as papq

FORMAT_VERSION = 2

MANIFEST_SCHEMA = pa.schema(
    [
        pa.field("path", pa.string()),  # relative to table location
        pa.field("partition", pa.string()),  # encoded 'field=value/...' or ''
        pa.field("record_count", pa.int64()),
        pa.field("file_size_bytes", pa.int64()),
        pa.field("lower_bounds", pa.string()),  # JSON {col: value}
        pa.field("upper_bounds", pa.string()),
        pa.field("added_snapshot_id", pa.int64()),
        # "data" | "deletes" — equality-delete files for merge-on-read
        # (Iceberg content enum parity; BaseDeltaTaskWriter.java:49-61)
        pa.field("content", pa.string()),
    ]
)

CONTENT_DATA = "data"
CONTENT_DELETES = "deletes"


@dataclass
class DataFileEntry:
    path: str
    partition: str
    record_count: int
    file_size_bytes: int
    lower_bounds: dict
    upper_bounds: dict
    added_snapshot_id: int = 0
    content: str = CONTENT_DATA

    def to_row(self) -> dict:
        d = asdict(self)
        d["lower_bounds"] = json.dumps(self.lower_bounds, default=str)
        d["upper_bounds"] = json.dumps(self.upper_bounds, default=str)
        return d

    @staticmethod
    def from_row(r: dict) -> "DataFileEntry":
        return DataFileEntry(
            path=r["path"],
            partition=r["partition"] or "",
            record_count=int(r["record_count"]),
            file_size_bytes=int(r["file_size_bytes"]),
            lower_bounds=json.loads(r["lower_bounds"] or "{}"),
            upper_bounds=json.loads(r["upper_bounds"] or "{}"),
            added_snapshot_id=int(r.get("added_snapshot_id") or 0),
            # manifests written before the MoR feature have no column
            content=r.get("content") or CONTENT_DATA,
        )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    sequence_number: int
    timestamp_ms: int
    operation: str  # append | replace | delete | rewrite-manifests
    manifests: list[str]  # metadata/manifests/*.parquet, relative paths
    summary: dict = field(default_factory=dict)


@dataclass
class TableMetadata:
    table_uuid: str
    name: str
    location: str
    schema_json: str  # Spark StructType JSON
    identifier_fields: list[str]
    partition_spec: list[dict]  # [{"field":..., "transform":...}]
    properties: dict
    current_snapshot_id: int | None
    snapshots: list[Snapshot]
    last_sequence_number: int
    version: int

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            return None
        for s in self.snapshots:
            if s.snapshot_id == sid:
                return s
        raise KeyError(f"snapshot {sid} not found")

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "TableMetadata":
        d = json.loads(s)
        d["snapshots"] = [Snapshot(**sn) for sn in d["snapshots"]]
        return TableMetadata(**d)


# ---------------------------------------------------------------- io helpers


def metadata_dir(location: str) -> str:
    return os.path.join(location, "metadata")


def manifest_dir(location: str) -> str:
    return os.path.join(location, "metadata", "manifests")


def version_hint_path(location: str) -> str:
    return os.path.join(metadata_dir(location), "version-hint.text")


def metadata_path(location: str, version: int) -> str:
    return os.path.join(metadata_dir(location), f"v{version}.metadata.json")


def read_version_hint(location: str) -> int:
    with open(version_hint_path(location)) as f:
        return int(f.read().strip())


def write_version_hint(location: str, version: int) -> None:
    """Atomic pointer swap (temp + rename)."""
    tmp = version_hint_path(location) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, version_hint_path(location))


def try_write_metadata(location: str, meta: TableMetadata) -> bool:
    """Atomic commit attempt: O_EXCL create of v<N>.metadata.json.

    Returns False if another writer won version N (optimistic-concurrency
    loser — caller refreshes and retries, mirroring Iceberg's retry and
    the reference's backoff policy drivers/abstract/utils.go:11-32).
    """
    path = metadata_path(location, meta.version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(meta.to_json())
    write_version_hint(location, meta.version)
    return True


def write_manifest(location: str, entries: list[DataFileEntry]) -> str:
    """Write one manifest parquet; returns its location-relative path."""
    os.makedirs(manifest_dir(location), exist_ok=True)
    rel = os.path.join("metadata", "manifests", f"{uuid.uuid4().hex}.parquet")
    rows = [e.to_row() for e in entries]
    tbl = pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)
    papq.write_table(tbl, os.path.join(location, rel), compression="zstd")
    return rel


def read_manifest(location: str, rel_path: str) -> list[DataFileEntry]:
    tbl = papq.read_table(os.path.join(location, rel_path))
    return [DataFileEntry.from_row(r) for r in tbl.to_pylist()]


def read_manifests(location: str, rel_paths: list[str]) -> list[DataFileEntry]:
    out: list[DataFileEntry] = []
    for p in rel_paths:
        out.extend(read_manifest(location, p))
    return out

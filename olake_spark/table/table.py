"""Table: create/load, snapshot-isolated scans, atomic commits.

The commit protocol is optimistic concurrency over metadata versions
(format.try_write_metadata): losers refresh, validate, and retry with
backoff — the Spark-native analog of the reference's Iceberg
RowDelta/AppendFiles commits (IcebergTableOperator.java:116-169) and
its retry policy (drivers/abstract/utils.go:11-32, 3 attempts).

Data writes go through ``write_datafiles``: one distributed Spark
write into an immutable per-commit directory, optional fanout column
(partitionBy on a synthetic grouping key — each group lands in exactly
one file because we repartition on the key first), then a footer-only
stats harvest builds manifest entries. Target file size honors the
``write.target-file-size-bytes`` property (reference default 512 MiB,
arrow-writer/utils.go:22).
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.table import format as fmt
from olake_spark.table import stats as stats_mod
from olake_spark.table.format import DataFileEntry, Snapshot, TableMetadata

TARGET_FILE_SIZE_PROP = "write.target-file-size-bytes"
STATS_COLS_PROP = "stats.columns"
DEFAULT_TARGET_FILE_SIZE = 512 * 1024 * 1024
#: opt-in per-file key-bloom sidecars (table/bloom.py): set to the key
#: column name (usually ``_olake_id``) to have every data-file write
#: also emit a ``<file>.parquet.bloom`` sidecar MERGE pruning can probe
BLOOM_COL_PROP = "write.bloom.column"
BLOOM_FPP_PROP = "write.bloom.fpp"
DEFAULT_BLOOM_FPP = 0.01

COMMIT_RETRIES = 3
COMMIT_BACKOFF_S = 0.2


def _fpath_col() -> Column:
    """Normalized absolute path of each row's source parquet file:
    ``_metadata.file_path`` with the URI scheme (``file:/``,
    ``file:///``) stripped to a plain absolute path.

    ALWAYS key file-identity joins on this FULL path, never on the
    part-file basename: a partitionBy fanout write reuses one task's
    filename in every partition directory (``__rid=0/part-00000-X``,
    ``__rid=1/part-00000-X``, ...), so basenames collide even within a
    single commit — a basename-keyed broadcast join silently multiplies
    rows.
    """
    return F.regexp_replace(F.col("_metadata.file_path"), "^[a-z][a-z0-9+.-]*:/+", "/")


class CommitConflict(Exception):
    pass


class Table:
    def __init__(self, spark: SparkSession, meta: TableMetadata):
        self.spark = spark
        self.meta = meta

    # ------------------------------------------------------------ lifecycle

    @staticmethod
    def create(
        spark: SparkSession,
        location: str,
        name: str,
        schema: T.StructType | str,
        identifier_fields: list[str] | None = None,
        partition_spec: list[dict] | None = None,
        properties: dict | None = None,
    ) -> "Table":
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        # relative locations break any comparison against Spark's
        # absolute _metadata.file_path — normalize once at the boundary
        location = os.path.abspath(location)
        os.makedirs(fmt.metadata_dir(location), exist_ok=True)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        props = {TARGET_FILE_SIZE_PROP: str(DEFAULT_TARGET_FILE_SIZE)}
        props.update(properties or {})
        meta = TableMetadata(
            table_uuid=uuid.uuid4().hex,
            name=name,
            location=location,
            schema_json=schema.json(),
            identifier_fields=identifier_fields or [],
            partition_spec=partition_spec or [],
            properties=props,
            current_snapshot_id=None,
            snapshots=[],
            last_sequence_number=0,
            version=1,
        )
        if not fmt.try_write_metadata(location, meta):
            raise CommitConflict(f"table already exists at {location}")
        return Table(spark, meta)

    @staticmethod
    def load(spark: SparkSession, location: str) -> "Table":
        location = os.path.abspath(location)
        meta = fmt.read_current_metadata(location)
        meta.location = location  # actual path wins if the dir moved
        return Table(spark, meta)

    def refresh(self) -> "Table":
        self.meta = Table.load(self.spark, self.meta.location).meta
        return self

    # ------------------------------------------------------------ accessors

    @property
    def location(self) -> str:
        return self.meta.location

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.meta.schema_json))

    @property
    def target_file_size(self) -> int:
        return int(self.meta.properties.get(TARGET_FILE_SIZE_PROP, DEFAULT_TARGET_FILE_SIZE))

    @property
    def stats_cols(self) -> list[str]:
        raw = self.meta.properties.get(STATS_COLS_PROP)
        if raw:
            return json.loads(raw) if raw.startswith("[") else raw.split(",")
        return stats_mod.DEFAULT_STATS_COLS

    @property
    def bloom_col(self) -> str | None:
        return self.meta.properties.get(BLOOM_COL_PROP) or None

    @property
    def bloom_fpp(self) -> float:
        return float(self.meta.properties.get(BLOOM_FPP_PROP, DEFAULT_BLOOM_FPP))

    def entries(self, snapshot_id: int | None = None) -> list[DataFileEntry]:
        snap = self.meta.snapshot(snapshot_id)
        if snap is None:
            return []
        return fmt.read_manifests(self.location, snap.manifests)

    def data_entries(self, snapshot_id: int | None = None) -> list[DataFileEntry]:
        return [e for e in self.entries(snapshot_id) if e.content != fmt.CONTENT_DELETES]

    def delete_entries(self, snapshot_id: int | None = None) -> list[DataFileEntry]:
        return [e for e in self.entries(snapshot_id) if e.content == fmt.CONTENT_DELETES]

    def live_paths(self, snapshot_id: int | None = None) -> set[str]:
        return {e.path for e in self.entries(snapshot_id)}

    def abs_entry_path(self, e: DataFileEntry) -> str:
        """Absolute filesystem path of a manifest entry, normalized to
        match ``_fpath_col()`` — the one true join key for mapping scan
        rows back to manifest entries (never the basename)."""
        return os.path.normpath(os.path.join(self.location, e.path))

    # ------------------------------------------------------------ scans

    def scan(
        self,
        snapshot_id: int | None = None,
        entries: list[DataFileEntry] | None = None,
        apply_deletes: bool = True,
        file_col: str | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read: resolve the file list at plan time.

        ``file_col``: attach the source file's normalized absolute
        path under this column name (from ``_metadata.file_path``,
        which is only resolvable directly on the parquet relation) —
        callers like ``fold_deletes`` and ``compact`` join it against
        ``abs_entry_path`` to map rows back to manifest entries without
        a per-file union scan.

        Filters/projections applied by the caller on the returned
        DataFrame still push down to the parquet scans (Catalyst sees a
        plain multi-file parquet relation).

        Merge-on-read: when the snapshot carries equality-delete files
        (merge_mor), data rows are anti-joined against the delete keys
        at scan time — a delete with sequence D kills rows from data
        files with sequence < D only (rows committed WITH the delete
        survive, matching Iceberg equality-delete sequencing and
        BaseDeltaTaskWriter.java:49-61's delete-then-insert upsert).
        ``entries`` restricts which DATA files are read; the snapshot's
        delete files always apply (so a pruned CoW rewrite of a MoR
        table still sees post-delete rows).
        """
        if entries is None:
            entries = self.entries(snapshot_id)
        data = [e for e in entries if e.content != fmt.CONTENT_DELETES]
        paths = [os.path.join(self.location, e.path) for e in data]
        if not paths:
            df = self.spark.createDataFrame([], self.schema)
            if file_col is not None:
                df = df.withColumn(file_col, F.lit(None).cast("string"))
            return df
        df = self.spark.read.schema(self.schema).parquet(*paths)
        if file_col is not None:
            df = df.withColumn(file_col, _fpath_col())
        dels = self.delete_entries(snapshot_id) if apply_deletes else []
        if not dels:
            return df
        return self._anti_join_deletes(df, data, dels)

    def _anti_join_deletes(
        self,
        df: DataFrame,
        data: list[DataFileEntry],
        dels: list[DataFileEntry],
    ) -> DataFrame:
        """Scan-side application of equality deletes.

        Sequence numbers ride in via a tiny broadcast (normalized
        file path → the entry's added_snapshot_id) joined on
        ``_metadata.file_path``, so the big data scan stays ONE
        multi-file parquet relation — no per-file union. The join key is
        the FULL path (see ``_fpath_col``): basenames collide across
        fanout-written partition directories.
        The anti-join itself is an equi-join on the equality key with
        the strict sequence comparison as a residual condition: shuffled
        on the key, never a nested loop; delete files are tiny relative
        to data, so Catalyst broadcasts that side at runtime (AQE).
        """
        key_cols = self.meta.identifier_fields or ["_olake_id"]
        fpath = _fpath_col()

        seq_rows = [(self.abs_entry_path(e), e.added_snapshot_id) for e in data]
        seq_df = self.spark.createDataFrame(seq_rows, "__fpath string, __seq long")
        df = (
            df.withColumn("__fpath", fpath)
            .join(F.broadcast(seq_df), "__fpath", "left")
            .drop("__fpath")
        )

        del_paths = [os.path.join(self.location, e.path) for e in dels]
        dseq_rows = [(self.abs_entry_path(e), e.added_snapshot_id) for e in dels]
        dseq_df = self.spark.createDataFrame(dseq_rows, "__fpath string, __dseq long")
        key_schema = T.StructType([f for f in self.schema.fields if f.name in key_cols])
        del_df = (
            self.spark.read.schema(key_schema)
            .parquet(*del_paths)
            .withColumn("__fpath", fpath)
            .join(F.broadcast(dseq_df), "__fpath")
            .select(*[F.col(c).alias(f"__d_{c}") for c in key_cols], "__dseq")
        )
        cond = F.col("__seq") < F.col("__dseq")
        for c in key_cols:
            cond = cond & (F.col(c) == F.col(f"__d_{c}"))
        return df.join(del_df, cond, "left_anti").drop("__seq")

    def pruned_entries(
        self,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> list[DataFileEntry]:
        """Manifest min/max pruning: files whose [lower, upper] range for
        ``col`` overlaps [lo, hi] (reference parity: chunk-range
        predicates pkg/jdbc/jdbc.go:212-227)."""
        out = []
        for e in self.entries(snapshot_id):
            elo = e.lower_bounds.get(col)
            ehi = e.upper_bounds.get(col)
            if elo is None or ehi is None:
                out.append(e)  # no stats → cannot prune
                continue
            if (hi is not None and elo > hi) or (lo is not None and ehi < lo):
                continue
            out.append(e)
        return out

    # ------------------------------------------------ time travel / changelog

    def snapshot_as_of(self, timestamp_ms: int):
        """Time travel by wall clock: the latest snapshot whose commit
        timestamp is <= ``timestamp_ms`` (Iceberg ``FOR SYSTEM_TIME AS
        OF`` resolution). Returns None when the table had no snapshot
        yet at that time. Feed the result's ``snapshot_id`` to
        ``scan``. Commits sharing a millisecond resolve to the LATEST
        of them (correct for "state as of T"); incremental consumers
        that must not skip a tied commit should track snapshot ids,
        not wall clock."""
        eligible = [s for s in self.meta.snapshots if s.timestamp_ms <= timestamp_ms]
        if not eligible:
            return None
        return max(eligible, key=lambda s: (s.timestamp_ms, s.sequence_number))

    #: snapshot operations whose commits rearrange bytes but preserve
    #: row content — the changelog skips them
    DATA_PRESERVING_OPS = {"compact", "fold-deletes", "rewrite-manifests", "refresh-schema"}

    def changelog(
        self,
        from_snapshot_id: int | None = None,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Incremental changelog scan: the row-level change stream
        committed in ``(from_snapshot_id, to_snapshot_id]`` (exclusive
        start — pass the last snapshot you already consumed; None means
        from the beginning / up to current).

        Semantics (Iceberg incremental-append parity):
        - ``append`` commits → their data files become ``insert`` rows;
          their equality-delete files become ``delete`` rows (key
          columns populated, everything else null). A merge-on-read
          upsert therefore emits delete+insert per key — standard CDC
          output, and an MoR-maintained table has a fully
          changelog-able history at O(batch) read cost per commit.
        - data-preserving maintenance (compact / cluster-* /
          fold-deletes / rewrite-manifests / refresh-schema) is
          skipped: bytes moved, rows identical.
        - copy-on-write overwrites (``merge`` / generic ``replace``)
          raise: the row diff is not derivable from the file diff.

        Output: table schema + ``_change_type`` ('insert'|'delete') +
        ``_commit_snapshot_id``. Files must not have been physically
        removed by ``expire_snapshots`` for the requested range.

        One multi-file parquet relation per content kind regardless of
        how many commits the range spans; the file→snapshot mapping
        rides in via a tiny broadcast on ``_metadata.file_path`` (same
        trick as the MoR scan anti-join).
        """
        snaps = sorted(self.meta.snapshots, key=lambda s: s.sequence_number)
        by_id = {s.snapshot_id: s for s in snaps}

        def _resolve(sid: int):
            if sid not in by_id:
                raise ValueError(
                    f"snapshot {sid} not in table history (expired or never "
                    f"existed); known ids: {sorted(by_id)[-5:] or 'none'}"
                )
            return by_id[sid]

        cur = self.meta.snapshot()
        if cur is None:
            # empty table: empty changelog with the contract schema
            return self.spark.createDataFrame(
                [],
                T.StructType(
                    self.schema.fields
                    + [
                        T.StructField("_change_type", T.StringType()),
                        T.StructField("_commit_snapshot_id", T.LongType()),
                    ]
                ),
            )
        lo = -1 if from_snapshot_id is None else _resolve(from_snapshot_id).sequence_number
        hi = (
            cur.sequence_number
            if to_snapshot_id is None
            else _resolve(to_snapshot_id).sequence_number
        )
        selected = [s for s in snaps if lo < s.sequence_number <= hi]
        ins_files: list[DataFileEntry] = []
        del_files: list[DataFileEntry] = []
        # manifests are shared across snapshots (commit cost scales with
        # the change): cache reads by path so walking k snapshots costs
        # one read per distinct manifest, not k × |manifests|
        mcache: dict[str, list[DataFileEntry]] = {}
        for s in selected:
            op = s.operation
            if op in self.DATA_PRESERVING_OPS or op.startswith("cluster-"):
                continue
            if op != "append":
                raise ValueError(
                    f"changelog cannot derive row diffs from a {op!r} commit "
                    f"(snapshot {s.snapshot_id}); maintain the table with "
                    "merge-on-read (merge_mor) for a changelog-able history"
                )
            for m in s.manifests:
                if m not in mcache:
                    mcache[m] = fmt.read_manifest(self.location, m)
                for e in mcache[m]:
                    if e.added_snapshot_id != s.snapshot_id:
                        continue
                    (del_files if e.content == fmt.CONTENT_DELETES else ins_files).append(e)

        schema = self.schema
        cols = [f.name for f in schema.fields]
        out_schema = T.StructType(
            schema.fields
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_snapshot_id", T.LongType()),
            ]
        )
        fpath = _fpath_col()

        def _tag(entries: list[DataFileEntry], read_schema: T.StructType) -> DataFrame:
            paths = [os.path.join(self.location, e.path) for e in entries]
            snap_rows = [(self.abs_entry_path(e), e.added_snapshot_id) for e in entries]
            snap_df = self.spark.createDataFrame(snap_rows, "__fpath string, __snap long")
            return (
                self.spark.read.schema(read_schema)
                .parquet(*paths)
                .withColumn("__fpath", fpath)
                .join(F.broadcast(snap_df), "__fpath")
            )

        parts: list[DataFrame] = []
        if ins_files:
            df = _tag(ins_files, schema)
            parts.append(
                df.select(
                    *cols,
                    F.lit("insert").alias("_change_type"),
                    F.col("__snap").alias("_commit_snapshot_id"),
                )
            )
        if del_files:
            key_cols = self.meta.identifier_fields or ["_olake_id"]
            key_schema = T.StructType([f for f in schema.fields if f.name in key_cols])
            df = _tag(del_files, key_schema)
            padded = [
                (F.col(c) if c in key_cols else F.lit(None).cast(schema[c].dataType)).alias(c)
                for c in cols
            ]
            parts.append(
                df.select(
                    *padded,
                    F.lit("delete").alias("_change_type"),
                    F.col("__snap").alias("_commit_snapshot_id"),
                )
            )
        if not parts:
            return self.spark.createDataFrame([], out_schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    # ------------------------------------------------------------ writes

    def write_datafiles(
        self,
        df: DataFrame,
        fanout_col: str | None = None,
        num_groups: int | None = None,
        sort_within: list[str] | None = None,
        record_partition_from_dir: bool = False,
        range_partition_cols: list[str] | None = None,
        partition_by: list[str] | None = None,
        content: str = fmt.CONTENT_DATA,
        max_records_per_file: int | None = None,
        shuffle: bool = True,
        extra_stats_cols: list[str] | None = None,
    ) -> list[DataFileEntry]:
        """Distributed write into data/<uuid>/; returns manifest entries.

        fanout_col: synthetic grouping column — rows are repartitioned
        on it and written with partitionBy so each group is exactly one
        output file (the column itself is stripped by partitionBy; real
        table columns all remain in the data files, Iceberg-style).

        shuffle=False (fanout_col only): the caller guarantees rows are
        ALREADY co-located by fanout_col (e.g. the merge join's own
        exchange hash-partitioned on the range id, or a scan whose
        input files map 1:1 to fanout groups). The repartition is
        skipped — partitionBy alone splits each task's rows per group —
        saving a full payload shuffle. If the guarantee is violated the
        result is still correct, just more files (one per task×group).

        range_partition_cols: range-partition + sort by these columns
        instead — each output file covers a tight key range, so the
        min/max manifest stats stay selective for future MERGE/scan
        pruning (one file ≈ one Iceberg sort-order cluster).

        max_records_per_file: per-file ROLL enforcement (W4, the
        reference's rolling size-targeted writer) — the partitioning
        above targets the file size by plan estimate; this option has
        the parquet writer start a new file when a task exceeds the
        row budget, so one skewed/underestimated group can never
        produce an arbitrarily large file.
        """
        commit_dir = uuid.uuid4().hex
        out_dir = os.path.join(self.location, "data", commit_dir)

        def _sink(w_df):
            w = w_df.write
            if max_records_per_file:
                w = w.option("maxRecordsPerFile", int(max_records_per_file))
            return w

        writer = df
        if fanout_col is not None:
            if shuffle:
                n = num_groups or self.spark.sparkContext.defaultParallelism
                writer = df.repartition(n, F.col(fanout_col))
            if sort_within:
                writer = writer.sortWithinPartitions(fanout_col, *sort_within)
            _sink(writer).partitionBy(fanout_col).parquet(out_dir)
        elif partition_by:
            # W11/W8: REAL table-partition fanout (Hive-layout dirs, one
            # level per column — typically the rendered segments of a
            # partition template). Unlike fanout_col, the columns stay
            # recorded via record_partition_from_dir; repartition on
            # them first so each partition is written by few tasks.
            if shuffle:
                n = num_groups or self.spark.sparkContext.defaultParallelism
                writer = df.repartition(n, *[F.col(c) for c in partition_by])
            if sort_within:
                writer = writer.sortWithinPartitions(*partition_by, *sort_within)
            _sink(writer).partitionBy(*partition_by).parquet(out_dir)
        elif range_partition_cols:
            n = num_groups or self.spark.sparkContext.defaultParallelism
            cols = [F.col(c) for c in range_partition_cols]
            writer = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
            _sink(writer).parquet(out_dir)
        else:
            if sort_within:
                writer = writer.sortWithinPartitions(*sort_within)
            _sink(writer).parquet(out_dir)
        files: list[tuple[str, str]] = []
        for p in glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True):
            partition = ""
            if record_partition_from_dir:
                d = os.path.relpath(os.path.dirname(p), out_dir)
                partition = "" if d == "." else d
            files.append((p, partition))
        stats_cols = self.stats_cols
        if extra_stats_cols:
            # caller-supplied columns tracked for THIS commit only (e.g.
            # the clustering curve key, so incremental reclustering can
            # tell sorted files from newcomers by manifest bounds)
            stats_cols = stats_cols + [c for c in extra_stats_cols if c not in stats_cols]
        # key-bloom sidecars ride the harvest (the one pass that already
        # opens every new file); delete-file commits skip them — delete
        # files are never MERGE rewrite targets, so a sidecar would be
        # dead weight
        bloom_col = self.bloom_col if content == fmt.CONTENT_DATA else None
        if len(files) > stats_mod.DISTRIBUTED_THRESHOLD:
            # fleet-scale commits: harvest footers as a Spark job so the
            # driver never serializes per-file metadata IO
            entries = stats_mod.harvest_distributed(
                self.spark, self.location, files, stats_cols,
                bloom_col=bloom_col, bloom_fpp=self.bloom_fpp,
            )
        else:
            entries = stats_mod.harvest(
                self.location, files, stats_cols,
                bloom_col=bloom_col, bloom_fpp=self.bloom_fpp,
            )
        if content != fmt.CONTENT_DATA:
            for e in entries:
                e.content = content
        return entries

    # ------------------------------------------------------------ commits

    def _next_snapshot(self, operation: str, manifests: list[str], summary: dict) -> Snapshot:
        seq = self.meta.last_sequence_number + 1
        return Snapshot(
            snapshot_id=seq,
            parent_id=self.meta.current_snapshot_id,
            sequence_number=seq,
            timestamp_ms=int(time.time() * 1000),
            operation=operation,
            manifests=manifests,
            summary=summary,
        )

    def _commit(
        self,
        build_snapshot,
        validate=None,
        schema_json: str | None = None,
        properties: dict | None = None,
    ) -> Snapshot:
        """Optimistic commit loop: build against current meta, attempt
        version write, on loss refresh + re-validate + rebuild.
        ``schema_json`` swaps the table schema in the SAME metadata
        version as the snapshot — a refresh-level evolve rewrites data
        files and flips the schema atomically (no window where readers
        see new files under the old schema). ``properties`` entries are
        merged over the current table properties in the same version
        (operator state riding the snapshot commit, e.g. clustering
        curve params)."""
        last_err: Exception | None = None
        for attempt in range(COMMIT_RETRIES + 1):
            if validate is not None:
                validate(self)
            snap = build_snapshot(self)
            new_meta = TableMetadata(
                table_uuid=self.meta.table_uuid,
                name=self.meta.name,
                location=self.meta.location,
                schema_json=schema_json or self.meta.schema_json,
                identifier_fields=self.meta.identifier_fields,
                partition_spec=self.meta.partition_spec,
                properties=(
                    {**self.meta.properties, **properties}
                    if properties
                    else self.meta.properties
                ),
                current_snapshot_id=snap.snapshot_id,
                snapshots=self.meta.snapshots + [snap],
                last_sequence_number=snap.sequence_number,
                version=self.meta.version + 1,
            )
            if fmt.try_write_metadata(self.location, new_meta):
                self.meta = new_meta
                return snap
            last_err = CommitConflict(f"lost version {new_meta.version}")
            time.sleep(COMMIT_BACKOFF_S * (2**attempt))
            self.refresh()
        raise last_err  # type: ignore[misc]

    def commit_append(self, added: list[DataFileEntry], summary: dict | None = None) -> Snapshot:
        def build(t: "Table") -> Snapshot:
            seq = t.meta.last_sequence_number + 1
            for e in added:
                e.added_snapshot_id = seq
            new_manifest = fmt.write_manifest(t.location, added)
            cur = t.meta.snapshot()
            manifests = (cur.manifests if cur else []) + [new_manifest]
            s = {"added-files": len(added), "added-records": sum(e.record_count for e in added)}
            s.update(summary or {})
            return t._next_snapshot("append", manifests, s)

        return self._commit(build)

    def commit_replace(
        self,
        removed_paths: set[str],
        added: list[DataFileEntry],
        operation: str = "replace",
        summary: dict | None = None,
        schema_json: str | None = None,
        properties: dict | None = None,
        validate_extra=None,
    ) -> Snapshot:
        """Atomic swap: removed data files out, new files in.

        Only manifests that contain a removed path are rewritten;
        untouched manifests are shared with the parent snapshot —
        commit cost scales with the change, not the table.
        Validation: every removed path must still be live (a concurrent
        replace of the same file is a real conflict → error, mirroring
        the reference's LSN-mismatch full-stop guard,
        drivers/postgres/internal/cdc.go:75-79). ``validate_extra(t)``
        lets the caller add commit-time invariants that run on every
        attempt against refreshed metadata (e.g. compaction refusing
        delete files that landed after its fold); raise CommitConflict
        to reject. A concurrent commit landing between validation and
        the version write makes the write LOSE (O_EXCL versioning), so
        the re-validation after refresh sees it — no unchecked window.
        """

        def validate(t: "Table") -> None:
            live = t.live_paths()
            missing = removed_paths - live
            if missing:
                raise CommitConflict(f"files no longer live: {sorted(missing)[:5]}")
            if validate_extra is not None:
                validate_extra(t)

        def build(t: "Table") -> Snapshot:
            seq = t.meta.last_sequence_number + 1
            for e in added:
                e.added_snapshot_id = seq
            cur = t.meta.snapshot()
            keep_manifests: list[str] = []
            survivors: list[DataFileEntry] = []
            for m in cur.manifests if cur else []:
                m_entries = fmt.read_manifest(t.location, m)
                if any(e.path in removed_paths for e in m_entries):
                    survivors.extend(e for e in m_entries if e.path not in removed_paths)
                else:
                    keep_manifests.append(m)
            manifests = list(keep_manifests)
            if survivors:
                manifests.append(fmt.write_manifest(t.location, survivors))
            if added:
                manifests.append(fmt.write_manifest(t.location, added))
            s = {
                "removed-files": len(removed_paths),
                "added-files": len(added),
                "added-records": sum(e.record_count for e in added),
            }
            s.update(summary or {})
            return t._next_snapshot(operation, manifests, s)

        return self._commit(
            build, validate=validate, schema_json=schema_json, properties=properties
        )

    def update_schema(self, new_schema: T.StructType, rebuild=None) -> None:
        """Metadata-only schema commit (no new snapshot) — the
        EVOLVE_SCHEMA path (iceberg.go:380-460). Optimistic like data
        commits: a loser refreshes and RE-DERIVES the schema against
        the winner's version instead of re-writing its own stale
        schema verbatim (which would silently revert a concurrent
        writer's column — a lost update).

        ``rebuild(current_schema) -> new_schema`` recomputes the
        change per attempt (evolve passes its diff re-application);
        without it, retries union-by-name merge the requested schema
        onto the refreshed one (requested types win per column,
        columns unique to either side survive)."""
        requested = new_schema
        for attempt in range(COMMIT_RETRIES + 1):
            current = self.schema
            if rebuild is not None:
                target = rebuild(current)
            elif attempt == 0:
                target = requested
            else:
                want = {f.name: f for f in requested.fields}
                merged = [want.pop(f.name, f) for f in current.fields]
                target = T.StructType(merged + list(want.values()))
            new_meta = TableMetadata(
                table_uuid=self.meta.table_uuid,
                name=self.meta.name,
                location=self.meta.location,
                schema_json=target.json(),
                identifier_fields=self.meta.identifier_fields,
                partition_spec=self.meta.partition_spec,
                properties=self.meta.properties,
                current_snapshot_id=self.meta.current_snapshot_id,
                snapshots=self.meta.snapshots,
                last_sequence_number=self.meta.last_sequence_number,
                version=self.meta.version + 1,
            )
            if fmt.try_write_metadata(self.location, new_meta):
                self.meta = new_meta
                return
            time.sleep(COMMIT_BACKOFF_S * (2**attempt))
            self.refresh()
        raise CommitConflict("schema update lost all retries")

    def update_properties(self, props: dict) -> None:
        """Metadata-only property commit (no new snapshot): merge
        ``props`` over the current table properties — a ``None`` value
        removes the key. Optimistic like every commit: a loser
        refreshes and re-merges over the winner's properties, so two
        concurrent single-key updates both land (no lost update)."""
        for attempt in range(COMMIT_RETRIES + 1):
            merged = {**self.meta.properties, **props}
            merged = {k: v for k, v in merged.items() if v is not None}
            new_meta = TableMetadata(
                table_uuid=self.meta.table_uuid,
                name=self.meta.name,
                location=self.meta.location,
                schema_json=self.meta.schema_json,
                identifier_fields=self.meta.identifier_fields,
                partition_spec=self.meta.partition_spec,
                properties=merged,
                current_snapshot_id=self.meta.current_snapshot_id,
                snapshots=self.meta.snapshots,
                last_sequence_number=self.meta.last_sequence_number,
                version=self.meta.version + 1,
            )
            if fmt.try_write_metadata(self.location, new_meta):
                self.meta = new_meta
                return
            time.sleep(COMMIT_BACKOFF_S * (2**attempt))
            self.refresh()
        raise CommitConflict("property update lost all retries")

    def commit_rewrite_manifests(self, new_manifests: list[str], summary: dict | None = None) -> Snapshot:
        """Metadata-only snapshot: same data files, new manifest layout."""

        def build(t: "Table") -> Snapshot:
            return t._next_snapshot("rewrite-manifests", new_manifests, summary or {})

        return self._commit(build)

    def rollback_to(self, snapshot_id: int) -> Snapshot:
        """Metadata-only rollback: make ``snapshot_id``'s file set
        current again by committing a NEW snapshot that shares its
        manifests (Iceberg ``rollback_to_snapshot`` semantics — history
        stays append-only, so readers pinned to the snapshots being
        rolled past are untouched, expiry still sees them, and the
        rollback itself is a visible, attributable history event).
        The bad snapshots' files stay referenced until snapshot expiry
        ages them out — rollback undoes VISIBILITY, expiry reclaims
        space; keeping the two separate is what makes rollback instant
        and safe at 10^12-row scale (zero data IO here)."""

        def build(t: "Table") -> Snapshot:
            target = next(
                (s for s in t.meta.snapshots if s.snapshot_id == snapshot_id), None
            )
            if target is None:
                raise ValueError(
                    f"snapshot {snapshot_id} not in table history "
                    f"(have {[s.snapshot_id for s in t.meta.snapshots]})"
                )
            return t._next_snapshot(
                "rollback", list(target.manifests), {"rolled-back-to": snapshot_id}
            )

        return self._commit(build)

"""Time travel (snapshot_as_of) + incremental changelog scan tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.fixtures.audio_clips import FULL_SCHEMA, cdc_batch, generate_clips
from olake_spark.operators.compaction import compact
from olake_spark.operators.merge import fold_deletes, merge_into, merge_mor
from olake_spark.table.table import Table


@pytest.fixture()
def mor_table(spark, tmp_table_dir):
    t = Table.create(
        spark, tmp_table_dir, "clips", FULL_SCHEMA, identifier_fields=["_olake_id"]
    )
    t.commit_append(t.write_datafiles(generate_clips(spark, 60, partitions=2)))
    return t


class TestSnapshotAsOf:
    def test_resolves_latest_at_or_before(self, mor_table, spark):
        t = mor_table
        s1 = t.meta.snapshot()
        merge_mor(t, cdc_batch(spark, 60, 1, updates=5))
        s2 = t.meta.snapshot()
        assert s2.timestamp_ms >= s1.timestamp_ms
        if s2.timestamp_ms > s1.timestamp_ms:  # same-ms tie resolves to s2 by contract
            assert t.snapshot_as_of(s1.timestamp_ms).snapshot_id == s1.snapshot_id
        assert t.snapshot_as_of(s2.timestamp_ms).snapshot_id == s2.snapshot_id
        assert t.snapshot_as_of(s2.timestamp_ms + 10_000).snapshot_id == s2.snapshot_id
        assert t.snapshot_as_of(s1.timestamp_ms - 10_000) is None

    def test_time_travel_scan_is_isolated(self, mor_table, spark):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        before = {r._olake_id: r.transcript for r in t.scan().select("_olake_id", "transcript").collect()}
        batch = cdc_batch(spark, 60, 1, updates=8, deletes=4)
        n_del = batch.filter("_op_type = 'd'").count()  # stride collisions drop some
        merge_mor(t, batch)
        old = {r._olake_id: r.transcript for r in t.scan(snapshot_id=snap1).select("_olake_id", "transcript").collect()}
        assert old == before
        assert t.scan().count() == 60 - n_del


class TestChangelog:
    def test_mor_batch_emits_delete_plus_insert(self, mor_table, spark):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        batch = cdc_batch(spark, 60, 1, updates=6, deletes=3, inserts=2)
        n_all = batch.count()
        n_live = batch.filter("_op_type <> 'd'").count()
        merge_mor(t, batch)
        log = t.changelog(from_snapshot_id=snap1)
        by_type = {r["_change_type"]: r["n"] for r in log.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
        # delete file carries EVERY batch key (delete-then-insert);
        # inserts are the non-'d' winners
        assert by_type == {"delete": n_all, "insert": n_live}
        # delete rows carry the key, null payload
        d = log.filter(F.col("_change_type") == "delete").limit(1).collect()[0]
        assert d._olake_id is not None and d.transcript is None and d.bytes is None

    def test_window_bounds_and_snapshot_ids(self, mor_table, spark):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        merge_mor(t, cdc_batch(spark, 60, 1, updates=4))
        snap2 = t.meta.current_snapshot_id
        merge_mor(t, cdc_batch(spark, 60, 2, updates=2, inserts=1))
        snap3 = t.meta.current_snapshot_id

        # full range covers both batches, tagged with their commit ids
        log = t.changelog(from_snapshot_id=snap1)
        ids = {r._commit_snapshot_id for r in log.select("_commit_snapshot_id").distinct().collect()}
        assert ids == {snap2, snap3}
        # bounded range: only batch 1
        log12 = t.changelog(from_snapshot_id=snap1, to_snapshot_id=snap2)
        assert log12.filter(F.col("_change_type") == "insert").count() == 4
        # from the beginning: the initial append is insert-only history
        first = t.changelog(to_snapshot_id=snap1)
        assert first.filter(F.col("_change_type") == "delete").count() == 0
        assert first.count() == 60

    def test_empty_window(self, mor_table):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        log = t.changelog(from_snapshot_id=snap1)
        assert log.count() == 0
        assert "_change_type" in log.columns

    def test_skips_data_preserving_maintenance(self, mor_table, spark):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        batch = cdc_batch(spark, 60, 1, updates=5, deletes=2)
        n_all = batch.count()
        n_live = batch.filter("_op_type <> 'd'").count()
        merge_mor(t, batch)
        fold_deletes(t)
        compact(t)
        log = t.changelog(from_snapshot_id=snap1)
        by_type = {r["_change_type"]: r["n"] for r in log.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
        assert by_type == {"delete": n_all, "insert": n_live}

    def test_raises_on_cow_overwrite(self, mor_table, spark):
        t = mor_table
        snap1 = t.meta.current_snapshot_id
        merge_into(t, cdc_batch(spark, 60, 1, updates=3))
        with pytest.raises(ValueError, match="merge"):
            t.changelog(from_snapshot_id=snap1)

    def test_replay_matches_final_state(self, mor_table, spark):
        """Folding the changelog (last event per key wins) reproduces
        the table's current state — the CDC consumer contract."""
        t = mor_table
        merge_mor(t, cdc_batch(spark, 60, 1, updates=6, deletes=3, inserts=2))
        merge_mor(t, cdc_batch(spark, 60, 2, updates=3, deletes=1))
        log = t.changelog()
        from pyspark.sql.window import Window

        w = Window.partitionBy("_olake_id").orderBy(
            F.desc("_commit_snapshot_id"),
            # within one MoR commit the delete applies BEFORE the insert
            F.when(F.col("_change_type") == "insert", 1).otherwise(0).desc(),
        )
        last = (
            log.withColumn("__rn", F.row_number().over(w))
            .filter("__rn = 1")
            .filter("_change_type = 'insert'")
        )
        got = {r._olake_id: r.transcript for r in last.select("_olake_id", "transcript").collect()}
        want = {r._olake_id: r.transcript for r in t.scan().select("_olake_id", "transcript").collect()}
        assert got == want


class TestChangelogErrors:
    def test_unknown_snapshot_raises_value_error(self, mor_table):
        with pytest.raises(ValueError, match="not in table history"):
            mor_table.changelog(from_snapshot_id=999)
        with pytest.raises(ValueError, match="not in table history"):
            mor_table.changelog(to_snapshot_id=999)

    def test_empty_table_changelog_is_empty_with_schema(self, spark, tmp_table_dir):
        t = Table.create(
            spark, tmp_table_dir, "empty", FULL_SCHEMA, identifier_fields=["_olake_id"]
        )
        log = t.changelog()
        assert log.count() == 0
        assert "_change_type" in log.columns and "_commit_snapshot_id" in log.columns

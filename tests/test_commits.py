"""Pluggable commit backends: the catalog-CAS path end-to-end.

The default FileCommitBackend is exercised by every other test in the
suite; here the SAME engine (create/append/merge/compact/load) runs
with commit atomicity coming from a catalog compare-and-swap instead
of POSIX O_EXCL — the object-store deployment shape.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from olake_spark.fixtures.audio_clips import FULL_SCHEMA, generate_clips
from olake_spark.table import Table
from olake_spark.table import format as fmt
from olake_spark.table.table import CommitConflict


@pytest.fixture()
def cas_backend(tmp_path):
    b = fmt.CasCatalogBackend(str(tmp_path / "catalog.json"))
    fmt.set_commit_backend(b)
    yield b
    fmt.set_commit_backend(None)


def _clips(spark, n, prefix=""):
    return generate_clips(spark, n).withColumn(
        "clip_id", F.concat(F.lit(prefix), F.col("clip_id"))
    ).withColumn("_olake_id", F.md5("clip_id"))


class TestCasCatalogBackend:
    def test_lifecycle_create_append_merge_load(self, spark, tmp_path, cas_backend):
        loc = str(tmp_path / "tbl")
        t = Table.create(
            spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"]
        )
        for k in range(2):
            df = _clips(spark, 20, f"g{k}_")
            t.commit_append(
                t.write_datafiles(df, range_partition_cols=["_olake_id"], num_groups=2)
            )
        from olake_spark.operators.merge import merge_into

        merge_into(t, t.scan().limit(5).withColumn("transcript", F.lit("edited")))
        # a fresh load resolves through the catalog, not version-hint
        t2 = Table.load(spark, loc)
        assert t2.scan().count() == 40
        assert t2.scan().filter("transcript = 'edited'").count() == 5
        assert t2.meta.version == t.meta.version
        # no version-hint file exists under this backend
        assert not os.path.exists(fmt.version_hint_path(loc))

    def test_double_create_conflicts(self, spark, tmp_path, cas_backend):
        loc = str(tmp_path / "tbl")
        Table.create(spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"])
        with pytest.raises(CommitConflict):
            Table.create(
                spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"]
            )

    def test_lost_cas_retries_and_drops_candidate(self, spark, tmp_path, cas_backend):
        loc = str(tmp_path / "tbl")
        t = Table.create(
            spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"]
        )
        stale = Table.load(spark, loc)  # second writer on an old snapshot
        t.commit_append(
            t.write_datafiles(_clips(spark, 10, "a_"), range_partition_cols=["_olake_id"], num_groups=1)
        )
        # stale writer's first attempt loses the CAS, then the commit
        # loop refreshes and wins the next version
        stale.commit_append(
            stale.write_datafiles(_clips(spark, 10, "b_"), range_partition_cols=["_olake_id"], num_groups=1)
        )
        final = Table.load(spark, loc)
        assert final.scan().count() == 20
        assert final.meta.version == 3
        # exactly one committed candidate per version — losers deleted
        files = glob.glob(os.path.join(loc, "metadata", "v*.metadata.json"))
        assert len(files) == 3

    def test_missing_table_raises(self, spark, tmp_path, cas_backend):
        with pytest.raises(FileNotFoundError):
            Table.load(spark, str(tmp_path / "nope"))

    def test_default_backend_unaffected_after_restore(self, spark, tmp_path):
        b = fmt.CasCatalogBackend(str(tmp_path / "cat.json"))
        fmt.set_commit_backend(b)
        fmt.set_commit_backend(None)
        assert isinstance(fmt.commit_backend(), fmt.FileCommitBackend)
        loc = str(tmp_path / "tbl")
        t = Table.create(
            spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"]
        )
        assert os.path.exists(fmt.version_hint_path(loc))
        assert Table.load(spark, loc).meta.version == t.meta.version

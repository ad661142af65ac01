"""Schema evolution / LCA promotion tests (SURVEY.md §1.2, W3).

Table-driven LCA vectors mirror the reference's resolver tests
(utils/typeutils/resolver_test.go); evolve semantics mirror
destination-validated evolution (iceberg.go:463-484,
IcebergTableOperator.java:96-109).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.fixtures.audio_clips import FULL_SCHEMA, generate_clips
from olake_spark.table import evolution as ev
from olake_spark.table.table import Table


def _st(**cols) -> T.StructType:
    """StructType from name→type without fromDDL (needs no JVM)."""
    m = {
        "int": T.IntegerType(), "bigint": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "string": T.StringType(),
    }
    return T.StructType([T.StructField(n, m[t], True) for n, t in cols.items()])


@pytest.mark.parametrize(
    "a,b,want",
    [
        (ev.BOOL, ev.INT32, ev.INT32),
        (ev.INT32, ev.INT64, ev.INT64),
        (ev.INT64, ev.FLOAT64, ev.FLOAT64),
        (ev.FLOAT32, ev.FLOAT64, ev.FLOAT64),
        (ev.INT32, ev.FLOAT32, ev.FLOAT64),  # via common parent number
        (ev.INT64, ev.STRING, ev.STRING),
        (ev.TS, ev.TS_MICRO, ev.TS_MICRO),
        (ev.TS_NANO, ev.STRING, ev.STRING),
        (ev.TS, ev.INT64, ev.STRING),  # cross-branch → root
        (ev.NULL, ev.INT32, ev.INT32),
        (ev.INT32, ev.INT32, ev.INT32),
        (ev.BOOL, ev.FLOAT32, ev.FLOAT64),
    ],
)
def test_lca_vectors(a, b, want):
    assert ev.lca(a, b) == want
    assert ev.lca(b, a) == want  # symmetric


def test_diff_add_and_promote():
    cur = _st(id="int", score="float", name="string")
    batch = _st(id="bigint", score="double", name="string", extra="string")
    d = ev.diff_schemas(cur, batch)
    assert [f.name for f in d.new_columns] == ["extra"]
    assert d.promotions == {
        "id": (ev.INT32, ev.INT64),
        "score": (ev.FLOAT32, ev.FLOAT64),
    }
    assert not d.refresh_required
    out = ev.evolved_schema(cur, d)
    assert dict((f.name, f.dataType.simpleString()) for f in out.fields) == {
        "id": "bigint", "score": "double", "name": "string", "extra": "string"
    }


def test_diff_lca_equals_stored_is_noop():
    # stored bigint, batch int → LCA bigint == stored → keep (iceberg.go:463-474)
    cur = _st(id="bigint")
    d = ev.diff_schemas(cur, _st(id="int"))
    assert d.is_noop


def test_diff_refresh_required():
    # stored bigint, batch string → LCA string ≠ stored, not an allowed
    # promotion → REFRESH (iceberg.go:428-439)
    cur = _st(id="bigint")
    d = ev.diff_schemas(cur, _st(id="string"))
    assert d.refresh_required == {"id": (ev.INT64, ev.STRING)}


def test_evolve_on_table_and_align(spark, tmp_path):
    t = Table.create(
        spark, str(tmp_path / "tbl"), "audio_clips", FULL_SCHEMA,
        identifier_fields=["_olake_id"],
    )
    t.commit_append(t.write_datafiles(generate_clips(spark, 30, partitions=2)))
    v0 = t.meta.version

    batch_schema = T.StructType(
        t.schema.fields + [T.StructField("speaker_id", T.StringType(), True)]
    )
    diff = ev.evolve(t, batch_schema)
    assert [f.name for f in diff.new_columns] == ["speaker_id"]
    assert t.meta.version == v0 + 1
    assert "speaker_id" in [f.name for f in t.schema.fields]

    # old data files lack the column → scan yields nulls (union-by-name)
    assert t.scan().filter(F.col("speaker_id").isNull()).count() == 30

    # align a batch that misses columns / has promotable types
    src = generate_clips(spark, 5, partitions=1).drop("codec")
    aligned = ev.align_batch(src, t.schema)
    assert [f.name for f in aligned.schema.fields] == [f.name for f in t.schema.fields]
    assert aligned.filter(F.col("codec").isNull()).count() == 5

    # no-op evolve does not bump the version (skip no-op commits)
    v1 = t.meta.version
    ev.evolve(t, t.schema)
    assert t.meta.version == v1

    with pytest.raises(ev.RefreshRequired):
        bad = T.StructType(
            [
                T.StructField("sr_hz", T.StringType(), True),
            ]
        )
        ev.evolve(t, bad)
    # allow_refresh escalates: sr_hz becomes string AND the existing
    # data files are rewritten so the table stays readable (a
    # metadata-only flip would make every old parquet file throw
    # SchemaColumnConvertNotSupported on scan)
    ev.evolve(t, bad, allow_refresh=True)
    assert dict((f.name, f.dataType.simpleString()) for f in t.schema.fields)[
        "sr_hz"
    ] == "string"
    scanned = t.scan()
    assert scanned.count() == 30
    assert scanned.filter(F.col("sr_hz").rlike("^[0-9]+$")).count() == 30
    assert t.meta.snapshot().operation == "refresh-schema"


def test_refresh_evolve_on_empty_table_is_metadata_only(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "tbl"), "x", "a int", identifier_fields=[])
    snap_count = len(t.meta.snapshots)
    ev.evolve(t, T.StructType([T.StructField("a", T.StringType(), True)]), allow_refresh=True)
    assert t.schema["a"].dataType.simpleString() == "string"
    assert len(t.meta.snapshots) == snap_count  # no rewrite commit needed


def test_concurrent_schema_updates_merge_not_lost(spark, tmp_path):
    """Two writers evolving different columns: the retry loser must
    re-derive against the winner's schema, not revert it (the round-1
    code re-wrote the stale schema verbatim — a lost update)."""
    loc = str(tmp_path / "tbl")
    t1 = Table.create(spark, loc, "x", FULL_SCHEMA, identifier_fields=["_olake_id"])
    t2 = Table.load(spark, loc)

    t1.update_schema(
        T.StructType(t1.schema.fields + [T.StructField("col_a", T.StringType(), True)])
    )
    # t2 still holds the pre-col_a meta: its first attempt loses the
    # version race and must merge onto t1's committed schema
    t2.update_schema(
        T.StructType(t2.schema.fields + [T.StructField("col_b", T.LongType(), True)])
    )
    final = [f.name for f in Table.load(spark, loc).schema.fields]
    assert "col_a" in final and "col_b" in final


def test_cdc_with_schema_evolution_mid_stream(spark, tmp_path):
    """The reference's scenario matrix mutates the source schema
    between CDC batches (ALTER TABLE ... MODIFY COLUMN id_int BIGINT +
    new column, mysql_test_util.go:170): the destination must evolve
    (promote + add) and keep merging. Full flow: backfill → CDC batch
    with evolved schema → evolve + align + MERGE → verify."""
    from olake_spark.fixtures.audio_clips import cdc_batch
    from olake_spark.operators.merge import merge_into

    t = Table.create(
        spark, str(tmp_path / "tbl"), "audio_clips", FULL_SCHEMA,
        identifier_fields=["_olake_id"],
    )
    t.commit_append(t.write_datafiles(generate_clips(spark, 60, partitions=2)))

    # evolved CDC batch: sr_hz widened int→bigint, new speaker_id col
    batch = (
        cdc_batch(spark, 60, 1, updates=6, deletes=3, inserts=2)
        .withColumn("sr_hz", F.col("sr_hz").cast("bigint"))
        .withColumn("speaker_id", F.concat(F.lit("spk_"), F.col("clip_id")))
    )
    diff = ev.evolve(t, batch.schema)
    assert diff.promotions == {"sr_hz": (ev.INT32, ev.INT64)}
    assert [f.name for f in diff.new_columns] == ["speaker_id"]

    aligned = ev.align_batch(batch, t.schema)
    merge_into(t, aligned)

    got = t.scan()
    assert dict((f.name, f.dataType.simpleString()) for f in got.schema.fields)[
        "sr_hz"
    ] == "bigint"
    # old rows: null speaker_id; merged rows carry it
    n_del = batch.filter("_op_type = 'd'").count()
    assert got.count() == 60 - n_del + 2
    assert got.filter(F.col("speaker_id").isNotNull()).count() == 6 + 2
    # and the audio invariant still holds on surviving rows
    from olake_spark.functions.audio import VERIFY_SCHEMA, verify_batch

    rep = got.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec").mapInPandas(
        lambda it: (verify_batch(p) for p in it), schema=VERIFY_SCHEMA
    )
    assert rep.filter("NOT snr_ok").count() == 0

"""CLI verb tests: spec/check/discover/sync/clear over a real table."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from olake_spark import cli
from olake_spark.fixtures.audio_clips import FULL_SCHEMA, cdc_batch, generate_clips
from olake_spark.table.table import Table


def _mk(spark, tmp_path, n=80):
    """Two appends of DISJOINT key sets (w0_/w1_ prefixes), 2n rows."""
    loc = str(tmp_path / "tbl")
    t = Table.create(
        spark, loc, "audio_clips", FULL_SCHEMA,
        identifier_fields=["_olake_id"],
        properties={"write.target-file-size-bytes": str(1 << 20)},
    )
    for w in range(2):
        df = (
            generate_clips(spark, n, partitions=4)
            .withColumn("clip_id", F.concat(F.lit(f"w{w}_"), F.col("clip_id")))
            .withColumn("_olake_id", F.md5(F.col("clip_id")))
        )
        t.commit_append(t.write_datafiles(df))
    return t


def test_spec_lists_all_ops():
    spec = cli.cmd_spec({})
    ops = spec["properties"]["stages"]["items"]["properties"]["op"]["enum"]
    assert set(ops) == {
        "append", "cdc_merge", "merge", "merge_mor", "fold_deletes",
        "compact", "cluster", "cluster_incremental",
        "resample", "rewrite_manifests", "expire", "gc_orphans",
        "rollback", "build_blooms", "auto",
    }


def test_check_valid_and_invalid(spark, tmp_path):
    t = _mk(spark, tmp_path)
    ok = cli.cmd_check({"table": t.location, "stages": [{"op": "compact"}]})
    assert ok["status"] == "SUCCEEDED" and ok["probe_rows"] == 1

    bad = cli.cmd_check(
        {"table": str(tmp_path / "nope"), "stages": [{"op": "cdc_merge"}]}
    )
    assert bad["status"] == "FAILED"
    assert any("source_dir" in e for e in bad["errors"])
    assert any("not found" in e for e in bad["errors"])


def test_discover_catalog_shape(spark, tmp_path):
    t = _mk(spark, tmp_path)
    cat = cli.cmd_discover({"table": t.location})
    s = cat["streams"][0]
    assert s["name"] == "audio_clips"
    assert s["primary_keys"] == ["_olake_id"]
    assert s["stats"]["rows"] == 160
    assert [sn["operation"] for sn in s["snapshots"]] == ["append", "append"]
    assert "clip_id" in [f["name"] for f in s["type_schema"]["fields"]]


def test_sync_pipeline_and_resume(spark, tmp_path):
    t = _mk(spark, tmp_path)
    src_dir = str(tmp_path / "cdc")
    batch = (
        cdc_batch(spark, 80, 1, updates=8, deletes=4, inserts=2)
        .withColumn("clip_id", F.concat(F.lit("w0_"), F.col("clip_id")))
        .withColumn("_olake_id", F.md5(F.col("clip_id")))
    )
    batch.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    cfg = {
        "table": t.location,
        "job_id": "job-A",
        "stages": [
            {"op": "cdc_merge", "source_dir": src_dir},
            {"op": "compact"},
            {"op": "cluster", "curve": "hilbert"},
            {"op": "rewrite_manifests"},
            {"op": "expire", "keep_last": 2},
        ],
    }
    out = cli.cmd_sync(cfg)
    assert [s["stage"] for s in out["stages"]] == [
        "00-cdc_merge", "01-compact", "02-cluster", "03-rewrite_manifests", "04-expire"
    ]
    # cdc_batch strides may overlap update/delete ids; count live keys
    # the same way the merge dedups (latest _cdc_timestamp wins)
    from pyspark.sql.window import Window

    w = Window.partitionBy("_olake_id").orderBy(F.desc("_cdc_timestamp"))
    winners = batch.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    n_del = winners.filter("_op_type = 'd'").count()
    n_ins = winners.filter("_op_type = 'c'").count()
    rows_after = Table.load(spark, t.location).scan().count()
    assert rows_after == 160 - n_del + n_ins

    # rerun: cluster stage skips via lineage, cdc stream drains nothing
    out2 = cli.cmd_sync(cfg)
    clus2 = [s for s in out2["stages"] if s["stage"] == "02-cluster"][0]
    assert clus2.get("skipped") is True
    with open(out2["lineage"]) as f:
        assert json.load(f)["job_id"] == "job-A"


def test_sync_cluster_incremental_stage(spark, tmp_path):
    t = _mk(spark, tmp_path)
    cfg = {
        "table": t.location,
        "job_id": "job-incr",
        "stages": [{"op": "cluster_incremental", "curve": "hilbert",
                    "row_weight": "cast(dur_ms as bigint) * sr_hz / 500 + 64"}],
    }
    out = cli.cmd_sync(cfg)
    (s0,) = out["stages"]
    assert s0["mode"] == "full"  # bootstrap records curve state
    # append + second sync with a fresh job id → incremental heartbeat
    df = (
        generate_clips(spark, 30)
        .withColumn("clip_id", F.concat(F.lit("n_"), F.col("clip_id")))
        .withColumn("_olake_id", F.md5(F.col("clip_id")))
    )
    t2 = Table.load(spark, t.location)
    t2.commit_append(t2.write_datafiles(df))
    cfg["job_id"] = "job-incr-2"
    out2 = cli.cmd_sync(cfg)
    (s1,) = out2["stages"]
    assert s1["mode"] == "incremental" and s1["newcomers"] >= 1


def test_clear_trims_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    r = cli.cmd_clear({"table": t.location})
    assert r["expired"] >= 1
    t2 = Table.load(spark, t.location)
    assert len(t2.meta.snapshots) == 1
    assert t2.scan().count() == 160


def test_changelog_export_roundtrip(spark, tmp_path):
    """CDC out: export the MoR change stream as base64 JSON, replay it
    through the CDC landing reader into a second table, and land on the
    same state — changelog is the inverse of sync's CDC in."""
    from olake_spark.operators.merge import merge_mor
    from olake_spark.streaming import cdc_stream_merge

    t = Table.create(
        spark,
        str(tmp_path / "tbl"),
        "clips",
        FULL_SCHEMA,
        identifier_fields=["_olake_id"],
        properties={"stats.columns": '["_olake_id"]'},
    )
    t.commit_append(t.write_datafiles(generate_clips(spark, 80, partitions=2)))
    snap1 = t.meta.current_snapshot_id
    batch = cdc_batch(spark, 80, 1, updates=6, deletes=3, inserts=2)
    n_all = batch.count()
    n_live = batch.filter("_op_type <> 'd'").count()
    merge_mor(t, batch)

    out_dir = str(tmp_path / "export")
    r = cli.cmd_changelog(
        {
            "table": str(tmp_path / "tbl"),
            "cores": 4,
            "from_snapshot": snap1,
            "output_dir": out_dir,
            "format": "json",
        }
    )
    assert r["inserts"] == n_live and r["deletes"] == n_all

    # replay: deletes → op 'd', inserts → op 'u' (upsert), through the
    # jsonl CDC landing path into a fresh copy of the base table
    raw = spark.read.json(out_dir)
    t2 = Table.create(
        spark,
        str(tmp_path / "tbl2"),
        "clips2",
        FULL_SCHEMA,
        identifier_fields=["_olake_id"],
        properties={"stats.columns": '["_olake_id"]'},
    )
    t2.commit_append(t2.write_datafiles(generate_clips(spark, 80, partitions=2)))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    replay = raw.withColumn(
        "_op_type", F.when(F.col("_change_type") == "delete", "d").otherwise("u")
    ).withColumn(
        # deletes sort before the same commit's insert on replay
        "_cdc_timestamp",
        F.concat(
            F.lit("2026-03-0"),
            (F.col("_commit_snapshot_id") % 9 + 1).cast("string"),
            F.when(F.col("_change_type") == "delete", F.lit("T00:00:00")).otherwise(
                F.lit("T00:00:01")
            ),
        ),
    ).drop("_change_type", "_commit_snapshot_id")
    replay.coalesce(1).write.json(os.path.join(landing, "batch1"))
    cdc_stream_merge(t2, landing, str(tmp_path / "ck2"), fmt="json")

    want = {(r_._olake_id, r_.transcript) for r_ in t.scan().collect()}
    got = {(r_._olake_id, r_.transcript) for r_ in t2.scan().collect()}
    assert got == want


def test_changelog_since_timestamp(spark, tmp_path):
    from olake_spark.operators.merge import merge_mor

    t = _mk(spark, tmp_path)
    s1 = t.meta.snapshot()
    merge_mor(t, cdc_batch(spark, 80, 1, updates=4))
    s2 = t.meta.snapshot()
    if s2.timestamp_ms == s1.timestamp_ms:
        import pytest as _pytest

        _pytest.skip("commits landed in the same millisecond; wall-clock "
                     "resolution is ambiguous by contract (use snapshot ids)")
    r = cli.cmd_changelog(
        {"table": str(tmp_path / "tbl"), "cores": 4, "since_timestamp_ms": s1.timestamp_ms}
    )
    assert r["from_snapshot"] == s1.snapshot_id
    assert r["inserts"] == 4 and r["deletes"] == 4


def test_sync_two_resample_stages_distinct_lineage(spark, tmp_path):
    """Two resample stages at the SAME rate in one job must each run
    under their own lineage stage id (ADVICE r3: resample_table's
    hardcoded 'resample-<sr>' made the second stage a silent skip)."""
    t = _mk(spark, tmp_path)
    cfg = {
        "table": t.location,
        "job_id": "job-RS",
        "stages": [
            {"op": "resample", "sr_out": 8000},
            {"op": "resample", "sr_out": 8000},
        ],
    }
    out = cli.cmd_sync(cfg)
    stage_names = [s["stage"] for s in out["stages"]]
    assert stage_names == ["00-resample", "01-resample"]
    # First stage rewrites (clips are synthesized at mixed rates);
    # second must EXECUTE (not lineage-skip) and see a conformant
    # table — a metadata-only no-op, not {"skipped": True}.
    assert out["stages"][0]["mode"] == "rewrite"
    assert out["stages"][1].get("skipped") is not True
    assert out["stages"][1]["mode"] == "noop"
    srs = [r["sr_hz"] for r in Table.load(spark, t.location).scan().select("sr_hz").distinct().collect()]
    assert srs == [8000]


def test_sync_merge_with_stream_filter(spark, tmp_path):
    """A per-stream filter on a merge stage restricts which CDC rows
    merge (the reference pushes the parsed filter into the backfill
    WHERE clause; here Catalyst pushes it into the parquet scan)."""
    t = _mk(spark, tmp_path)
    src_dir = str(tmp_path / "cdc")
    batch = (
        cdc_batch(spark, 80, 1, updates=0, deletes=0, inserts=6)
        .withColumn("clip_id", F.concat(F.lit("w0_"), F.col("clip_id")))
        .withColumn("_olake_id", F.md5(F.col("clip_id")))
    )
    batch.coalesce(1).write.parquet(src_dir)
    inserts = batch.filter("_op_type = 'c'")
    n_match = inserts.filter("dur_ms > 200").count()
    assert 0 < n_match < inserts.count()  # the filter must actually bite
    cfg = {
        "table": t.location,
        "job_id": "job-F",
        "stages": [{"op": "merge", "source_dir": src_dir, "filter": "dur_ms > 200"}],
    }
    assert cli.cmd_check(cfg)["status"] == "SUCCEEDED"
    cli.cmd_sync(cfg)
    assert Table.load(spark, t.location).scan().count() == 160 + n_match


def test_check_rejects_bad_filter_grammar(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = cli.cmd_check(
        {
            "table": t.location,
            "stages": [
                {"op": "merge", "source_dir": "/tmp", "filter": "a > 1 and b < 2 and c = 3"}
            ],
        }
    )
    assert bad["status"] == "FAILED"
    assert any("invalid filter format" in e for e in bad["errors"])


def test_check_rejects_filter_on_non_source_op(spark, tmp_path):
    """exec_stage applies filters only to source-consuming ops; a
    filter on compact would run unfiltered — check must fail fast
    rather than let the user believe rows were restricted."""
    t = _mk(spark, tmp_path)
    bad = cli.cmd_check(
        {"table": t.location, "stages": [{"op": "compact", "filter": "a > 1"}]}
    )
    assert bad["status"] == "FAILED"
    assert any("not supported on op 'compact'" in e for e in bad["errors"])


def test_check_rejects_partition_regex_on_non_append(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bad = cli.cmd_check(
        {
            "table": t.location,
            "stages": [
                {"op": "merge", "source_dir": "/tmp",
                 "partition_regex": "/{codec,raw,}"},
            ],
        }
    )
    assert bad["status"] == "FAILED"
    assert any("partition_regex is not supported" in e for e in bad["errors"])


def test_sync_append_with_partition_template(spark, tmp_path):
    """An append stage with partition_regex lands rows in
    template-rendered partition directories and records the RAW
    rendered sub-path in the manifest (types/catalog.go:40-47,
    parquet.go:397-466)."""
    t = _mk(spark, tmp_path, n=40)
    src_dir = str(tmp_path / "new")
    df = (
        generate_clips(spark, 40, partitions=2)
        .withColumn("clip_id", F.concat(F.lit("new_"), F.col("clip_id")))
        .withColumn("_olake_id", F.md5("clip_id"))
    )
    df.write.parquet(src_dir)
    cfg = {
        "table": t.location,
        "job_id": "job-P",
        "stages": [
            {
                "op": "append",
                "source_dir": src_dir,
                "partition_regex": "/{codec,'unknown',''}/{sr_hz,'0',''}",
            }
        ],
    }
    out = cli.cmd_sync(cfg)
    (st,) = out["stages"]
    assert st["rows"] == 40
    t2 = Table.load(spark, t.location)
    added = [e for e in t2.data_entries() if e.added_snapshot_id == st["snapshot_id"]]
    codecs = {r["codec"] for r in df.select("codec").distinct().collect()}
    srs = {str(r["sr_hz"]) for r in df.select("sr_hz").distinct().collect()}
    parts = {e.partition for e in added}
    # manifest partition = raw rendered sub-path "codec/sr"
    for p in parts:
        cdc, sr = p.split("/")
        assert cdc in codecs and sr in srs
    # physical layout: one Hive dir level per template segment
    rel = added[0].path
    assert "__p0=" in rel and "__p1=" in rel
    # scan sees old + new rows, schema unchanged
    assert t2.scan().count() == 80 + 40
    assert t2.scan().schema == t.scan().schema
    # resume: the append stage is lineage-skipped, no double-append
    out2 = cli.cmd_sync(cfg)
    assert out2["stages"][0].get("skipped") is True
    assert Table.load(spark, t.location).scan().count() == 120


def test_sync_writes_live_stats_file(spark, tmp_path):
    """A5: cmd_sync maintains a stats.json with the reference's fields
    (logger.go:152-166) and leaves a final flush after the last stage."""
    t = _mk(spark, tmp_path)
    cfg = {
        "table": t.location,
        "job_id": "job-S",
        "stages": [{"op": "compact"}, {"op": "rewrite_manifests"}],
    }
    out = cli.cmd_sync(cfg)
    with open(out["stats"]) as f:
        stats = json.load(f)
    for field in (
        "Stage", "Synced Records", "Memory", "Speed",
        "Seconds Elapsed", "Estimated Remaining Time",
    ):
        assert field in stats
    assert stats["Stage"] == "01-rewrite_manifests"
    assert stats["Speed"].endswith("rps")


def test_sync_stats_eta_determined_with_source_stage(spark, tmp_path):
    """Records To Sync is seeded from the source parquet footers
    (driver-side metadata, no job), so the ETA is a live estimate —
    not permanently 'Not Determined'."""
    t = _mk(spark, tmp_path)
    src_dir = str(tmp_path / "cdc")
    batch = (
        cdc_batch(spark, 60, 1, updates=6)
        .withColumn("clip_id", F.concat(F.lit("w0_"), F.col("clip_id")))
        .withColumn("_olake_id", F.md5(F.col("clip_id")))
    )
    batch.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    n_src = batch.count()
    out = cli.cmd_sync(
        {
            "table": t.location,
            "job_id": "job-ETA",
            "stages": [{"op": "cdc_merge", "source_dir": src_dir}],
        }
    )
    with open(out["stats"]) as f:
        stats = json.load(f)
    assert stats["Records To Sync"] == n_src
    assert stats["Estimated Remaining Time"].endswith(" s")


def test_stats_ticker_updates_periodically(tmp_path):
    import time as _time

    from olake_spark.plans.ticker import StatsTicker

    p = str(tmp_path / "stats.json")
    with StatsTicker(p, interval_s=0.05) as st:
        st.add_records_to_sync(100)
        st.record_synced(40)
        _time.sleep(0.2)
        first = json.load(open(p))
        st.record_synced(60)
        _time.sleep(0.2)
        second = json.load(open(p))
    assert first["Synced Records"] == 40
    assert second["Synced Records"] == 100
    assert second["Estimated Remaining Time"].endswith("s")
    final = json.load(open(p))
    assert final["Synced Records"] == 100


def test_decode_hive_partition_sentinel_and_escapes():
    """Spark writes an empty/NULL partition value as the
    __HIVE_DEFAULT_PARTITION__ sentinel and URL-escapes specials; the
    manifest must record the RAW rendered sub-path."""
    from olake_spark.operators.ingest import decode_hive_partition

    assert decode_hive_partition("__p0=2024/__p1=flac") == "2024/flac"
    # empty-rendered segments collapse to the filepath.Clean form the
    # reference's filepath.Join leaves on disk — matching the full
    # renderer (property-tested round-trip in test_properties.py)
    assert (
        decode_hive_partition("__p0=a/__p1=__HIVE_DEFAULT_PARTITION__/__p2=b")
        == "a/b"
    )
    assert (
        decode_hive_partition("__p0=__HIVE_DEFAULT_PARTITION__/__p1=fb")
        == "fb"
    )
    assert decode_hive_partition("__p0=a%3Ab") == "a:b"


def test_sync_mongo_change_stream_end_to_end(spark, tmp_path):
    """T3 driven through cmd_sync: a cdc_merge stage whose landing is
    raw Mongo change-stream JSONL — insert/update/delete batches merge
    via merge_mor, the resume token is check-pointed only after the
    batch commit, and a restart replays nothing."""
    import json as _json

    from pyspark.sql import types as T

    from olake_spark.streaming.cdc import read_mongo_cursor
    from olake_spark.table.table import Table

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("_op_type", T.StringType()),
            T.StructField("_cdc_timestamp", T.TimestampType()),
            T.StructField("_olake_timestamp", T.TimestampType()),
        ]
    )
    t = Table.create(spark, str(tmp_path / "mtbl"), "mdocs", schema, identifier_fields=["id"])

    def evt(op, t_sec, inc, full=None, key=None):
        tok = "82" + format(t_sec, "08x") + format(inc, "08x") + "bb" * 4
        d = {
            "_id": {"_data": tok},
            "operationType": op,
            "clusterTime": {"t": t_sec, "i": inc},
            "wallTime": "2026-01-03 00:00:07",
        }
        if full is not None:
            d["fullDocument"] = full
        if key is not None:
            d["documentKey"] = key
        return _json.dumps(d)

    landing = tmp_path / "mongo_landing"
    landing.mkdir()
    (landing / "b1.jsonl").write_text(
        "\n".join(
            [evt("insert", 1767000100, i + 1, full={"id": str(i), "name": f"d{i}"}) for i in range(4)]
            + [
                evt("update", 1767000101, 1, full={"id": "0", "name": "d0v2"}),
                evt("delete", 1767000101, 2, key={"id": "3"}),
            ]
        )
        + "\n"
    )
    ckpt = str(tmp_path / "mckpt")
    cfg = {
        "table": t.location,
        "job_id": "job-M",
        "stages": [
            {
                "op": "cdc_merge",
                "fmt": "mongo_jsonl",
                "mode": "mor",
                "source_dir": str(landing),
                "checkpoint_dir": ckpt,
            }
        ],
    }
    assert cli.cmd_check(cfg)["status"] == "SUCCEEDED"
    out = cli.cmd_sync(cfg)
    stage = out["stages"][0]
    cur = read_mongo_cursor(stage["mongo_cursor"])
    assert cur["op_time"] == [1767000101, 2]
    assert stage["resume_token"] == cur["resume_token"]
    t.refresh()
    got = {r["id"]: r["name"] for r in t.scan().select("id", "name").collect()}
    assert got == {0: "d0v2", 1: "d1", 2: "d2"}

    # restart: engine checkpoint skips the drained files — no new
    # snapshot, cursor untouched
    snap = t.meta.current_snapshot_id
    out2 = cli.cmd_sync(cfg)
    assert out2["stages"][0]["batches"] == 0
    t.refresh()
    assert t.meta.current_snapshot_id == snap
    assert read_mongo_cursor(stage["mongo_cursor"]) == cur

    # fmt is a cdc_merge-only key — check fails loudly elsewhere
    bad = {"table": t.location, "stages": [{"op": "compact", "fmt": "mongo_jsonl"}]}
    r = cli.cmd_check(bad)
    assert r["status"] == "FAILED" and any("fmt" in e for e in r["errors"])


def test_sync_build_blooms_stage(spark, tmp_path):
    from olake_spark.table import bloom as bloom_mod

    t = _mk(spark, tmp_path)
    t.update_properties({"write.bloom.column": "_olake_id"})
    out = cli.cmd_sync(
        {"table": t.location, "stages": [{"op": "build_blooms"}]}
    )
    res = out["stages"][0]
    n_files = len(t.data_entries())
    assert res["built"] == n_files and res["skipped"] == 0
    t2 = Table.load(spark, t.location)
    for e in t2.data_entries():
        assert os.path.exists(t2.abs_entry_path(e) + bloom_mod.SIDECAR_SUFFIX)


def test_sync_gc_and_rollback_stages(spark, tmp_path):
    import time

    t = _mk(spark, tmp_path)
    # crashed-wave debris: written, never committed
    stray = os.path.join(t.location, "data", "deadbeefcafe", "w.parquet")
    os.makedirs(os.path.dirname(stray))
    with open(stray, "wb") as f:
        f.write(b"PAR1junkPAR1")
    first_id = t.meta.snapshots[0].snapshot_id
    out = cli.cmd_sync(
        {
            "table": t.location,
            "stages": [
                {"op": "gc_orphans", "older_than_ms": int(time.time() * 1000) + 3_600_000},
                {"op": "rollback", "snapshot_id": first_id},
            ],
        }
    )
    gc = out["stages"][0]
    assert gc["stage"] == "00-gc_orphans" and gc["deleted_files"] == 1
    assert not os.path.exists(stray)
    rb = out["stages"][1]
    assert rb["rolled_back_to"] == first_id
    # _mk appends twice (80 rows each); rollback to the first → 80 live
    assert Table.load(spark, t.location).scan().count() == 80

"""Auto-maintenance planner (plans/maintenance.py) + CLI auto op."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark import cli
from olake_spark.fixtures.audio_clips import FULL_SCHEMA, cdc_batch, generate_clips
from olake_spark.operators.clustering import cluster
from olake_spark.operators.merge import merge_mor
from olake_spark.plans.maintenance import plan_maintenance
from olake_spark.table.table import Table


def _mk(spark, path, n=60, **props):
    base = {"stats.columns": '["_olake_id"]'}
    base.update(props)
    t = Table.create(
        spark, path, "clips", FULL_SCHEMA, identifier_fields=["_olake_id"], properties=base
    )
    t.commit_append(t.write_datafiles(generate_clips(spark, n, partitions=2)))
    return t


def _ops(stages):
    return [s["op"] for s in stages]


class TestPlanner:
    def test_fresh_table_plans_nothing(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        assert plan_maintenance(t) == []

    def test_delete_files_trigger_fold(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        for b in range(1, 5):
            merge_mor(t, cdc_batch(spark, 60, b, updates=3))
        plan = plan_maintenance(t)
        assert "fold_deletes" in _ops(plan)
        # threshold overridable via table property
        t.meta.properties["maintenance.max-delete-files"] = "10"
        assert "fold_deletes" not in _ops(plan_maintenance(t))

    def test_small_files_trigger_compact(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        # 60-clip files are far below the default 512 MiB target; add
        # appends until the small-file count crosses the threshold
        for w in range(8):
            df = (
                generate_clips(spark, 10, partitions=1)
                .withColumn("clip_id", F.concat(F.lit(f"x{w}_"), F.col("clip_id")))
                .withColumn("_olake_id", F.md5(F.col("clip_id")))
            )
            t.commit_append(t.write_datafiles(df))
        assert "compact" in _ops(plan_maintenance(t))

    def test_staleness_triggers_recluster_with_same_curve(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.meta.properties["maintenance.min-small-files"] = "999"  # isolate trigger
        cluster(t, curve="hilbert", row_weight="cast(dur_ms as bigint) * sr_hz / 500 + 64")
        ops0 = _ops(plan_maintenance(t))
        assert "cluster" not in ops0 and "cluster_incremental" not in ops0
        for w in range(8):
            df = (
                generate_clips(spark, 5, partitions=1)
                .withColumn("clip_id", F.concat(F.lit(f"y{w}_"), F.col("clip_id")))
                .withColumn("_olake_id", F.md5(F.col("clip_id")))
            )
            t.commit_append(t.write_datafiles(df))
        plan = plan_maintenance(t)
        # clustering state exists → the planner proposes the cheap
        # incremental heartbeat (curve comes from table properties)
        assert [s for s in plan if s["op"] == "cluster_incremental"]

    def test_staleness_without_state_falls_back_to_full(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.meta.properties["maintenance.min-small-files"] = "999"
        cluster(t, curve="hilbert", row_weight="cast(dur_ms as bigint) * sr_hz / 500 + 64")
        # simulate a pre-incremental table: curve state absent
        t.meta.properties.pop("cluster.curve", None)
        for w in range(8):
            df = (
                generate_clips(spark, 5, partitions=1)
                .withColumn("clip_id", F.concat(F.lit(f"x{w}_"), F.col("clip_id")))
                .withColumn("_olake_id", F.md5(F.col("clip_id")))
            )
            t.commit_append(t.write_datafiles(df))
        picked = [s for s in plan_maintenance(t) if s["op"] == "cluster"]
        assert picked and picked[0]["curve"] == "hilbert"

    def test_snapshot_count_triggers_expire(self, spark, tmp_path):
        t = _mk(spark, str(tmp_path / "t"))
        t.meta.properties["maintenance.max-snapshots"] = "3"
        t.meta.properties["maintenance.min-small-files"] = "999"
        for w in range(3):
            df = (
                generate_clips(spark, 5, partitions=1)
                .withColumn("clip_id", F.concat(F.lit(f"z{w}_"), F.col("clip_id")))
                .withColumn("_olake_id", F.md5(F.col("clip_id")))
            )
            t.commit_append(t.write_datafiles(df))
        assert "expire" in _ops(plan_maintenance(t))


class TestCliAuto:
    def test_sync_auto_runs_due_stages_to_clean_state(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        t = _mk(spark, loc)
        for b in range(1, 5):
            merge_mor(t, cdc_batch(spark, 60, b, updates=3))
        out = cli.cmd_sync({"table": loc, "cores": 4, "stages": [{"op": "auto"}]})
        ran = [s["stage"] for s in out["stages"]]
        assert any("fold_deletes" in s for s in ran)
        t = Table.load(spark, loc)
        assert t.delete_entries() == []
        # second auto pass: nothing left due → plans zero stages
        out2 = cli.cmd_sync({"table": loc, "cores": 4, "stages": [{"op": "auto"}]})
        assert out2["stages"][-1].get("planned") == 0 or all(
            "fold" not in s["stage"] for s in out2["stages"]
        )


    def test_auto_retriggers_after_prior_completed_sync(self, spark, tmp_path):
        """A recurring auto sync with an identical config (same job_id →
        same lineage file) must still run stages that became due AGAIN
        after the previous run completed them."""
        loc = str(tmp_path / "t")
        t = _mk(spark, loc)
        for b in range(1, 5):
            merge_mor(t, cdc_batch(spark, 60, b, updates=3))
        cfg = {"table": loc, "cores": 4, "stages": [{"op": "auto"}]}
        cli.cmd_sync(cfg)
        assert Table.load(spark, loc).delete_entries() == []
        # new delete files accumulate after the first run completed
        t = Table.load(spark, loc)
        for b in range(5, 9):
            merge_mor(t, cdc_batch(spark, 60, b, updates=3))
        out = cli.cmd_sync(cfg)  # identical config ⇒ identical job_id
        ran = [s["stage"] for s in out["stages"]]
        assert any("fold_deletes" in s for s in ran)
        assert Table.load(spark, loc).delete_entries() == []

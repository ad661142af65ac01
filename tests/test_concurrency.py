"""Cross-process commit races + driver-side planner scale.

The commit protocol must hold across PROCESSES (O_EXCL create of the
next metadata version), not just threads — two maintenance jobs
hitting one table is the real deployment hazard the reference guards
with catalog-side atomic commits (IcebergTableOperator.java:116-169).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

from olake_spark.fixtures.audio_clips import FULL_SCHEMA, generate_clips
from olake_spark.plans.ffd import first_fit_decreasing
from olake_spark.table.table import Table

APPEND_SNIPPET = """
import sys, json
sys.path.insert(0, "/root/repo")
from olake_spark.session import get_spark
from olake_spark.fixtures.audio_clips import generate_clips
from olake_spark.table.table import Table
from pyspark.sql import functions as F
loc, tag = sys.argv[1], sys.argv[2]
spark = get_spark(f"race-{tag}", cores=2)
t = Table.load(spark, loc)
df = (generate_clips(spark, 40, partitions=2)
      .withColumn("clip_id", F.concat(F.lit(tag + "_"), F.col("clip_id")))
      .withColumn("_olake_id", F.md5(F.col("clip_id"))))
snap = t.commit_append(t.write_datafiles(df))
print(json.dumps({"tag": tag, "snapshot": snap.snapshot_id, "version": t.meta.version}))
"""


def test_two_processes_append_concurrently(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    t = Table.create(spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"])
    t.commit_append(t.write_datafiles(generate_clips(spark, 20, partitions=2)))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", APPEND_SNIPPET, loc, tag],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for tag in ("pa", "pb")
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both commits landed, on distinct versions, no rows lost
    assert outs[0]["snapshot"] != outs[1]["snapshot"]
    t.refresh()
    assert t.scan().count() == 20 + 40 + 40
    assert t.meta.current_snapshot_id == 3
    # history is linear: each snapshot's parent is the previous one
    parents = {s.snapshot_id: s.parent_id for s in t.meta.snapshots}
    assert parents[3] == 2 and parents[2] == 1 and parents[1] is None


def test_ffd_planner_scales_to_200k_files():
    """Driver-side planning must stay trivial at catalog scale: 200k
    small files → plan in seconds, bins capacity-correct. (A job-per-
    bin or O(n²) planner would make 10^5-file tables unmanageable.)"""
    files = [(f"data/f{i:06d}.parquet", 3_000_000 + (i * 7919) % 2_000_000)
             for i in range(200_000)]
    t0 = time.monotonic()
    bins = first_fit_decreasing(files, capacity=512 * 1024 * 1024)
    elapsed = time.monotonic() - t0
    assert elapsed < 20.0
    packed = sum(len(b.items) for b in bins)
    assert packed >= 199_000  # nearly all files packed (>=2 per bin)
    for b in bins[:100]:
        assert b.size <= b.capacity

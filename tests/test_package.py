"""spark-submit --py-files deployment: the zip is the whole engine.

The north rule mandates the ``spark-submit --py-files`` shape; this
test proves it end-to-end rather than asserting zip contents: build
``olake_spark.zip`` with tools/package.build, launch a REAL
``spark-submit`` from a scratch cwd with NO PYTHONPATH to the repo,
and have the job create a table, append synthesized clips (exercising
the Arrow UDF path — worker Python must import the package from the
shipped zip, not the repo), compact, and scan. If the zip were missing
a module or the engine depended on repo-relative paths, this fails.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from tools.package import build

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

JOB = """
import json, sys
from olake_spark.session import get_spark
from olake_spark.fixtures import generate_clips
from olake_spark.fixtures.audio_clips import FULL_SCHEMA
from olake_spark.table import Table
from olake_spark.operators.compaction import compact
from pyspark.sql import functions as F

loc = sys.argv[1]
spark = get_spark("submit-job", cores=4)
t = Table.create(spark, loc, "audio_clips", FULL_SCHEMA, identifier_fields=["_olake_id"])
for w in range(2):
    df = generate_clips(spark, 60, partitions=4).withColumn(
        "clip_id", F.concat(F.lit(f"w{w}_"), F.col("clip_id"))
    ).withColumn("_olake_id", F.md5("clip_id"))
    t.commit_append(t.write_datafiles(df))
c = compact(t, target_size=1 << 30)
print("RESULT " + json.dumps({
    "rows": t.refresh().scan().count(),
    "files": len(t.data_entries()),
    "waves": c["waves"],
}))
"""


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this host"
)
def test_spark_submit_py_files_runs_engine(tmp_path):
    zip_path = build(str(tmp_path / "olake_spark.zip"))
    job_path = tmp_path / "run_job.py"
    job_path.write_text(JOB)
    table_loc = str(tmp_path / "tbl")

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "2g",
            "--py-files", zip_path,
            str(job_path), table_loc,
        ],
        cwd=str(tmp_path),  # scratch cwd: no accidental repo imports
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    result_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    ]
    assert result_lines, proc.stdout[-2000:]
    res = json.loads(result_lines[-1][len("RESULT "):])
    assert res["rows"] == 120
    assert res["waves"] >= 1, "two small appends must trigger a compaction wave"
    # the submitted job really committed a table at the target location
    assert os.path.isdir(table_loc)
    meta_dir = os.path.join(table_loc, "metadata")
    assert any(f.endswith(".metadata.json") for f in os.listdir(meta_dir))

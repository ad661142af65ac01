#!/usr/bin/env python
"""Benchmark harness (driver contract + north-rule scaling evidence).

Default mode — the driver contract:
    python bench.py
runs every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32),
plus the full maintenance pipeline (ingest → MERGE → FFD compaction →
Z-order cluster → manifest rewrite → snapshot expiry → verify scan)
over a synthetic audio-clip table, and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode — the north-rule N→4N evidence (sandbox proxy per
BASELINE.md: same job at two parallelism levels):
    python bench.py --scaling
runs the maintenance pipeline in two fresh subprocesses at local[8]
and local[32] on the SAME input size, reports clips/sec at both and
efficiency = thr(4N) / (4 × thr(N)); writes BENCH_SCALING.json.

Internal: ``--maint-only`` runs just the pipeline in-process and
prints its JSON (used by --scaling subprocesses).

All timings materialize DataFrames with the noop sink (no driver-side
collect — measuring the distributed plan, not row transfer).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
# clips scaled so the pipeline moves ~250 MB of PCM at sf0.1
CLIPS_PER_SF = 240_000


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --------------------------------------------------------------- pipeline


def run_maintenance(spark, n_clips: int, workdir: str) -> dict:
    """The north-rule job graph over a fresh synthetic audio table.

    Returns per-stage seconds + clips/sec throughput. Every stage is
    the same code path the tests exercise (operators/*)."""
    from pyspark.sql import functions as F

    from olake_spark.fixtures.audio_clips import FULL_SCHEMA, cdc_batch, generate_clips
    from olake_spark.operators.clustering import cluster
    from olake_spark.operators.compaction import compact
    from olake_spark.operators.expire import expire_snapshots
    from olake_spark.operators.manifests import rewrite_manifests
    from olake_spark.operators.merge import merge_into
    from olake_spark.table.table import Table

    loc = os.path.join(workdir, "audio_table")
    target = 16 * 1024 * 1024  # 16 MiB files at bench scale (512 MiB in prod)
    table = Table.create(
        spark,
        loc,
        "bench_audio",
        FULL_SCHEMA,
        identifier_fields=["_olake_id"],
        properties={
            "write.target-file-size-bytes": str(target),
            "stats.columns": json.dumps(["_olake_id", "dur_ms", "sr_hz"]),
        },
    )
    stages: dict[str, float] = {}
    t_all = time.monotonic()

    # ingest: 8 fragmented appends -> many small files (compaction input)
    t0 = time.monotonic()
    waves = 8
    per = n_clips // waves
    for w in range(waves):
        df = generate_clips(spark, per, partitions=8).withColumn(
            "clip_id", F.concat(F.lit(f"w{w}_"), F.col("clip_id"))
        ).withColumn("_olake_id", F.md5(F.col("clip_id")))
        entries = table.write_datafiles(df, range_partition_cols=["_olake_id"], num_groups=8)
        table.commit_append(entries)
    stages["maint_ingest"] = time.monotonic() - t0
    total_rows = per * waves

    # MERGE: CDC batch touching ~5% of keys (updates+deletes+inserts+dups)
    t0 = time.monotonic()
    src = cdc_batch(
        spark,
        base_n=per,
        batch_no=1,
        updates=max(per // 40, 10),
        deletes=max(per // 80, 5),
        inserts=max(per // 80, 5),
        dup_keys=10,
    ).withColumn("clip_id", F.concat(F.lit("w0_"), F.col("clip_id"))).withColumn(
        "_olake_id", F.md5(F.col("clip_id"))
    )
    merge_into(table, src)
    stages["maint_merge"] = time.monotonic() - t0

    t0 = time.monotonic()
    res = compact(table)
    stages["maint_compact"] = time.monotonic() - t0
    compact_rows = total_rows  # all ingest files are < target -> all binned

    t0 = time.monotonic()
    cluster(table, curve="zorder")
    stages["maint_zorder"] = time.monotonic() - t0

    t0 = time.monotonic()
    cluster(table, curve="hilbert")
    stages["maint_hilbert"] = time.monotonic() - t0

    t0 = time.monotonic()
    rewrite_manifests(table)
    stages["maint_manifest_rewrite"] = time.monotonic() - t0

    t0 = time.monotonic()
    expire_snapshots(table, keep_last=1)
    stages["maint_expire"] = time.monotonic() - t0

    # post-maintenance verify scan (metadata agg over every surviving row)
    t0 = time.monotonic()
    materialize(
        table.scan().groupBy("sr_hz").agg(
            F.count("*").alias("n"),
            F.sum(F.length("bytes")).alias("pcm_bytes"),
            F.min("_olake_id").alias("lo"),
            F.max("_olake_id").alias("hi"),
        )
    )
    stages["maint_verify_scan"] = time.monotonic() - t0

    total = time.monotonic() - t_all
    rewrite_s = (
        stages["maint_merge"] + stages["maint_compact"] + stages["maint_zorder"]
    )
    return {
        "stages_sec": {k: round(v, 3) for k, v in stages.items()},
        "pipeline_sec": round(total, 3),
        "n_clips": total_rows,
        "clips_per_sec": round(total_rows / total, 1),
        "compact_clips_per_sec": round(compact_rows / stages["maint_compact"], 1),
        "rewrite_clips_per_sec": round((2 * total_rows + compact_rows) / rewrite_s, 1),
        "compact_files_in": res.get("files_in", 0),
        "compact_files_out": res.get("files_out", 0),
    }


# --------------------------------------------------------------- modes


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from olake_spark.entry_queries import QUERIES

    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.monotonic()
        materialize(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
        log(f"  {name}: {out[name]:.2f}s")
    return out


def main_default() -> None:
    from olake_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_of(sf_dir)
    spark = get_spark("bench", cores=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    log(f"== query bench @ {sf_dir} local[{cpus}] ==")
    q = bench_queries(spark, sf_dir)

    log("== maintenance pipeline ==")
    n_clips = max(int(CLIPS_PER_SF * sf), 2_000)
    workdir = tempfile.mkdtemp(prefix="olake_bench_")
    try:
        maint = run_maintenance(spark, n_clips, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    q.update(maint["stages_sec"])

    total = round(sum(q.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": q,
                "sf": sf,
                "maintenance": {
                    k: maint[k]
                    for k in (
                        "pipeline_sec",
                        "n_clips",
                        "clips_per_sec",
                        "compact_clips_per_sec",
                        "rewrite_clips_per_sec",
                    )
                },
            }
        ),
        flush=True,
    )


def main_maint_only(cores: int, n_clips: int) -> None:
    from olake_spark.session import get_spark

    spark = get_spark(f"maint-bench-{cores}", cores=cores)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    workdir = tempfile.mkdtemp(prefix=f"olake_scale_{cores}_")
    try:
        maint = run_maintenance(spark, n_clips, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({"cores": cores, **maint}), flush=True)


def main_scaling(n_clips: int, lo: int = 8, hi: int = 32) -> None:
    """North-rule scaling evidence: same job, same input, N vs 4N cores
    in fresh JVMs; efficiency = thr(4N) / ((4N/N) × thr(N))."""
    results = {}
    for cores in (lo, hi):
        log(f"== scaling run local[{cores}] n_clips={n_clips} ==")
        env = dict(os.environ)
        p = subprocess.run(
            [sys.executable, __file__, "--maint-only", str(cores), str(n_clips)],
            capture_output=True,
            text=True,
            env=env,
            cwd=HERE,
        )
        if p.returncode != 0:
            log(p.stderr[-4000:])
            raise SystemExit(f"scaling run at local[{cores}] failed")
        results[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    ratio = hi / lo
    thr_lo = results[lo]["clips_per_sec"]
    thr_hi = results[hi]["clips_per_sec"]
    eff = thr_hi / (ratio * thr_lo)
    out = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_clips": n_clips,
        "runs": {
            f"local[{c}]": {
                "clips_per_sec": results[c]["clips_per_sec"],
                "pipeline_sec": results[c]["pipeline_sec"],
                "stages_sec": results[c]["stages_sec"],
            }
            for c in (lo, hi)
        },
        "speedup": round(thr_hi / thr_lo, 3),
        "cores_ratio": ratio,
    }
    with open(os.path.join(HERE, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--maint-only" in sys.argv:
        i = sys.argv.index("--maint-only")
        main_maint_only(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    elif "--scaling" in sys.argv:
        n = int(sys.argv[sys.argv.index("--scaling") + 1]) if len(
            sys.argv
        ) > sys.argv.index("--scaling") + 1 else 48_000
        main_scaling(n)
    else:
        main_default()

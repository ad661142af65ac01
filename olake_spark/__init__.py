"""olake_spark — a PySpark-native lakehouse table-maintenance engine.

Re-expresses the capabilities of the reference OLake engine
(/root/reference, Go + Java) as an idiomatic Spark DataFrame stack:

- ``olake_spark.table``     — from-scratch Iceberg-style table format
  (JSON snapshot metadata + parquet manifests + atomic optimistic
  commits + snapshot-isolated scans).
- ``olake_spark.operators`` — MERGE INTO (sort-merge, copy-on-write with
  file pruning), FFD bin-packing compaction, Z-order/Hilbert clustering
  with salted skew mitigation, snapshot expiry, manifest rewrite.
- ``olake_spark.functions`` — Iceberg-spec murmur3 bucket / truncate /
  time transforms, md5 PK hashing (utils/utils.go:252-273 semantics),
  morton/hilbert curve keys, PCM audio synth/decode/SNR (all
  vectorized: numpy inside Arrow-batched pandas UDFs, no per-row
  Python on the Spark hot path).
- ``olake_spark.plans``     — driver-side planners: first-fit-decreasing
  bin packing, skew/salting plans, per-partition lineage manifest with
  idempotent resume (types/state.go chunk protocol).
- ``olake_spark.streaming`` — bounded CDC micro-batches
  (Trigger.AvailableNow semantics of the reference's watermarked WAL
  tailers) applied through MERGE.
"""

__version__ = "0.1.0"

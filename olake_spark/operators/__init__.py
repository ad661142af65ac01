from olake_spark.operators.clustering import cluster  # noqa: F401
from olake_spark.operators.incremental_cluster import (  # noqa: F401
    cluster_incremental,
    read_amplification,
)
from olake_spark.operators.compaction import compact, plan_compaction  # noqa: F401
from olake_spark.operators.expire import expire_snapshots  # noqa: F401
from olake_spark.operators.manifests import rewrite_manifests  # noqa: F401
from olake_spark.operators.merge import dedup_batch, merge_into  # noqa: F401
from olake_spark.operators.rewrite_payload import (  # noqa: F401
    resample_table,
    rewrite_payload,
)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship MERGE-upsert query at
sf0.001. ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline ops; ``oracle_sql()``
carries the DuckDB-equivalent SQL for every query — including the
iterative Lloyd trainer, whose fixed round count is unrolled into
chained CTEs — so the driver hash-checks all of them. See COVERAGE.md
for the full operator → query → test map.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from olake_spark.entry_queries import ORACLES, QUERIES, ordered_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the CDC MERGE-upsert
    shape (sort-merge full-outer join, source-wins, delete-removes)."""
    return QUERIES["merge_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Rotation-ordered: the driver stamps only the first 50 entries, so
    # ordered_queries() keeps never-verified entries inside the window
    # (see entry_queries.ROTATED_OUT and COVERAGE.md's rotation table).
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

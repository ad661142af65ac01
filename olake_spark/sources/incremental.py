"""Incremental sync: cursor-driven delta reads with persisted state.

Reference semantics (drivers/abstract/incremental.go, pkg/jdbc/jdbc.go:
648-772):

- read only rows with ``cursor > last_value`` (F4), with an optional
  secondary cursor OR'd in with IS NULL fallback;
- during a backfill that will be followed by an incremental pass, cap
  at a pre-fetched ``max(cursor)`` with NULL fallback (F5) so rows
  arriving mid-backfill are not double-read;
- after a successful batch, persist the new max cursor (A4) into the
  state (types/state.go StreamState cursor) — resume continues from
  there.

State lives in the same LineageManifest JSON the maintenance stages
use (one state artifact per job, like the reference's single state
file)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.plans.lineage import LineageManifest

STAGE = "incremental"


def cursor_predicate(cursor_col: str, last_value, secondary_col: str | None = None,
                     secondary_value=None):
    """``cursor > v`` with the reference's secondary-cursor OR-fallback
    (pkg/jdbc/jdbc.go:648-697). None last_value → full read."""
    if last_value is None:
        return F.lit(True)
    p = F.col(cursor_col) > F.lit(last_value)
    if secondary_col is not None and secondary_value is not None:
        p = p | (
            F.col(cursor_col).isNull()
            & (F.col(secondary_col) > F.lit(secondary_value))
        )
    return p


def threshold_predicate(cursor_col: str, max_value):
    """Backfill cap: ``cursor IS NULL OR cursor <= max`` (F5,
    pkg/jdbc/jdbc.go:738-772)."""
    if max_value is None:
        return F.lit(True)
    return F.col(cursor_col).isNull() | (F.col(cursor_col) <= F.lit(max_value))


def read_incremental(
    df: DataFrame,
    cursor_col: str,
    lineage: LineageManifest,
    unit: str = "stream",
    process=None,
) -> dict:
    """One incremental pass: filter past the saved cursor, process,
    persist the new max cursor. ``process(delta_df) -> rows`` defaults
    to count. Returns {"rows", "cursor"}; a rerun with no new rows
    advances nothing."""
    st = lineage.metrics(STAGE).get(unit, {})
    last = st.get("cursor")
    # materialize the delta ONCE (localCheckpoint): the source is
    # scanned a single time, and both the cursor max and process() read
    # that one snapshot — rows arriving between two separate scans of a
    # live source can no longer be processed-but-not-cursored (which
    # would re-deliver them next pass).
    delta = df.filter(cursor_predicate(cursor_col, last)).localCheckpoint(eager=True)
    new_max_row = delta.agg(F.max(cursor_col).alias("m")).first()
    new_max = new_max_row["m"] if new_max_row else None
    if new_max is None:  # nothing new
        return {"rows": 0, "cursor": last}
    n = int(process(delta) if process else delta.count())
    lineage.plan(STAGE, {unit: {"cursor_col": cursor_col}})
    lineage.mark_done(STAGE, unit, rows=n, cursor=_plain(new_max))
    return {"rows": n, "cursor": _plain(new_max)}


def _plain(v):
    """JSON-serializable cursor value. Timestamps use 'YYYY-MM-DD
    HH:MM:SS[.ffffff]' (space separator), which Spark implicitly casts
    back in comparisons against timestamp columns."""
    try:
        return v.isoformat(sep=" ")
    except (AttributeError, TypeError):
        return v

"""Iceberg partition transforms as Catalyst expressions.

Parity targets in the reference:
- truncate: ``v - (((v % n) + n) % n)`` negative-safe for ints, prefix
  for strings (arrow-writer/transforms.go:130-169)
- year/month/day/hour on UTC timestamps (transforms.go:74-94)
- partition path encoding ``field=value`` (transforms.go:171-189)
- partition path TEMPLATES ``/{col, fallback, granularity}/...``
  (destination/parquet/parquet.go:397-466, W8)

All pure ``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def truncate_int(col, n: int) -> Column:
    """truncate(n) for ints: v - (((v % n) + n) % n) — floor to bin start."""
    c = F.col(col) if isinstance(col, str) else col
    return (c - (((c % n) + n) % n)).alias(f"{col}_trunc" if isinstance(col, str) else "trunc")


def truncate_string(col, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def year_transform(col) -> Column:
    """Years from epoch (Iceberg stores offsets, paths show the year)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) - F.lit(1970)).cast("int")


def month_transform(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")


def day_transform(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("int")


def hour_transform(col) -> Column:
    # tz-proof: derive from calendar fields, not unix_timestamp (which
    # would apply the session timezone to NTZ values)
    c = F.col(col) if isinstance(col, str) else col
    return (day_transform(c) * 24 + F.hour(c)).cast("int")


def partition_path(**field_values) -> Column:
    """``field=value`` '/'-joined partition path (url-escape elided:
    our synthetic values are path-safe; transforms.go:171-189)."""
    parts = []
    for name, col in field_values.items():
        c = F.col(col) if isinstance(col, str) else col
        parts.append(F.concat(F.lit(f"{name}="), c.cast("string")))
    return F.concat_ws("/", *parts)


# ---------------------------------------------------------------- W8:
# partition path templates (destination/parquet/parquet.go:397-466)

_PLACEHOLDER_RE = re.compile(r"\{([^}]+)\}")
_GRANULARITIES = ("HH", "DD", "WW", "MM", "YYYY")


def parse_partition_pattern(pattern: str) -> list[tuple]:
    """Parse the reference's partition-path pattern into segments.

    ``/{col_name, 'fallback', granularity}/literal/{...}`` →
    ``("lit", text)`` and ``("col", name, fallback, granularity)``
    segments. Reference semantics (parquet.go:406-421):

    - placeholders are ``{...}`` blocks; a block with fewer than three
      comma-separated parts is replaced by the empty string;
    - each part is trimmed of surrounding single quotes, then spaces;
    - an empty fallback becomes ``default_<col_name>``.
    """
    segs: list[tuple] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(pattern):
        if m.start() > pos:
            segs.append(("lit", pattern[pos : m.start()]))
        pos = m.end()
        parts = m.group(1).split(",")
        if len(parts) < 3:
            continue  # malformed block → "" (parquet.go:410-411)
        name = parts[0].strip("'").strip()
        fallback = parts[1].strip("'").strip()
        gran = parts[2].strip("'").strip()
        segs.append(("col", name, fallback or f"default_{name}", gran))
    if pos < len(pattern):
        segs.append(("lit", pattern[pos:]))
    return segs


def _granularity_value(c: Column, gran: str, temporal: bool = False) -> Column:
    """Format a value at the requested time granularity, falling back
    to the raw string when it does not parse as a timestamp — exactly
    the reference's granularityFunction (parquet.go:412-447): only a
    successful ReformatValue(Timestamp, v) is formatted; anything else
    is stringified as-is. NULL stays NULL (the caller substitutes the
    fallback). Epoch-second integers parse via the int64 arm
    (reformat.go:161-168); strings run the layout cascade.
    """
    raw = c.cast("string")
    if gran not in _GRANULARITIES:
        return raw
    if temporal:
        # already timestamp/date-typed: skip the 12-layout parse
        # cascade (it balloons the codegen'd expression past janino's
        # method-size limit when repeated per granularity segment)
        ts = c.cast("timestamp")
    else:
        from olake_spark.functions.reformat import reformat_date, reformat_epoch

        ts = F.when(raw.rlike(r"^-?[0-9]+$"), reformat_epoch(raw)).otherwise(
            reformat_date(raw)
        )
    if gran == "HH":
        fmtd = F.format_string("%02d", F.hour(ts))
    elif gran == "DD":
        fmtd = F.format_string("%02d", F.dayofmonth(ts))
    elif gran == "WW":
        fmtd = F.format_string("%02d", F.weekofyear(ts))  # ISO week
    elif gran == "MM":
        fmtd = F.format_string("%02d", F.month(ts))
    else:  # YYYY
        fmtd = F.year(ts).cast("string")
    return F.when(ts.isNotNull(), fmtd).otherwise(raw)


def partition_path_template(
    pattern: str, columns, now: Column | None = None
) -> Column:
    """Render the reference's partition-path pattern per row as a
    string Column (the sub-path under the writer's base path).

    ``columns`` is either a list of column names or a DataFrame; pass
    the DataFrame when possible — timestamp/date-typed columns then
    take a direct-cast fast path instead of the string-parse cascade,
    keeping the expression inside whole-stage codegen.

    Semantics (parquet.go:397-466):
    - ``now()`` as the column name uses the ingestion timestamp
      (``now`` argument; defaults to ``current_timestamp()``);
    - a column missing from ``columns`` or a NULL value renders the
      fallback;
    - granularity HH/DD/WW/MM/YYYY zero-pads to two digits (YYYY
      four) when the value parses as a timestamp, else the raw value
      passes through;
    - the trailing ``/`` is trimmed (parquet.go:462) and leading
      slashes are dropped the way ``filepath.Join(basePath, result)``
      collapses them, so the result always joins cleanly under a base
      path; callers treat '' as "no partitioning" (base path).

    Timestamps format in the session timezone — run sessions in UTC
    for reference parity (the reference formats ``timestamp.UTC()``).
    """
    temporal_cols: set[str] = set()
    if hasattr(columns, "schema"):  # DataFrame
        temporal_cols = {
            f.name
            for f in columns.schema.fields
            if f.dataType.typeName() in ("timestamp", "timestamp_ntz", "date")
        }
        columns = columns.columns
    parts: list[Column] = []
    for seg in parse_partition_pattern(pattern):
        if seg[0] == "lit":
            parts.append(F.lit(seg[1]))
            continue
        _, name, fallback, gran = seg
        if name == "now()":
            base = now if now is not None else F.current_timestamp()
            parts.append(
                F.coalesce(
                    _granularity_value(base, gran, temporal=True), F.lit(fallback)
                )
            )
        elif name not in columns:
            parts.append(F.lit(fallback))
        else:
            parts.append(
                F.coalesce(
                    _granularity_value(
                        F.col(name), gran, temporal=name in temporal_cols
                    ),
                    F.lit(fallback),
                )
            )
    if not parts:
        return F.lit("")
    # normal form = what the reference's filepath.Join(basePath, result)
    # leaves on disk: Join runs Clean, which collapses duplicate
    # slashes (empty-rendered segments) and drops leading/trailing
    # ones (parquet.go:462 additionally trims the trailing '/')
    return F.regexp_replace(
        F.regexp_replace(F.concat(*parts), "/{2,}", "/"), "^/+|/+$", ""
    )


def split_pattern_segments(pattern: str) -> list[str]:
    """Split a partition-path pattern into its path segments (on ``/``
    outside ``{...}`` blocks), dropping empties from leading/trailing
    slashes. ``/{col1,f,''}/lit-{col2,f,DD}`` → two segments."""
    out: list[str] = []
    cur: list[str] = []
    depth = 0
    for ch in pattern:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth = max(0, depth - 1)
        if ch == "/" and depth == 0:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def partition_template_segment_cols(
    pattern: str, columns, now: Column | None = None
) -> list[Column]:
    """One rendered string Column PER PATH SEGMENT of the pattern —
    the columns a partitioned writer fans out on (one directory level
    per template segment), versus ``partition_path_template`` which
    renders the whole sub-path as one string."""
    return [
        partition_path_template(seg, columns, now=now)
        for seg in split_pattern_segments(pattern)
    ]

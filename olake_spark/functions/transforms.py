"""Iceberg partition transforms as Catalyst expressions.

Parity targets in the reference:
- truncate: ``v - (((v % n) + n) % n)`` negative-safe for ints, prefix
  for strings (arrow-writer/transforms.go:130-169)
- year/month/day/hour on UTC timestamps (transforms.go:74-94)
- partition path encoding ``field=value`` (transforms.go:171-189)

All pure ``pyspark.sql.functions`` — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

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

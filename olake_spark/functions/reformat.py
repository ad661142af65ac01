"""Type-reformat hardening: column-name normalization + the
multi-layout date parser (reference utils/utils.go:378-389,
utils/typeutils/reformat.go:25-38,148-270).

All Catalyst expressions — the layout cascade compiles to a COALESCE
of try_to_timestamp calls inside whole-stage codegen, no Python on the
hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------- column names


def normalize_column_name(name: str) -> str:
    """Destination column-name rule: lowercase; any char outside
    [a-z0-9] becomes ``_`` (utils/utils.go:378-389 Reformat)."""
    return re.sub(r"[^a-z0-9]", "_", name.lower())


def normalize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through the normalizer. Collisions after
    normalization ('a b' vs 'a_b') are a hard error — silently merging
    two source columns loses data."""
    mapping = {c: normalize_column_name(c) for c in df.columns}
    seen: dict[str, str] = {}
    for old, new in mapping.items():
        if new in seen:
            raise ValueError(
                f"column name collision after normalization: "
                f"{seen[new]!r} and {old!r} both map to {new!r}"
            )
        seen[new] = old
    return df.select(*[F.col(f"`{o}`").alias(n) for o, n in mapping.items()])


# ---------------------------------------------------------- date layouts

# Spark datetime patterns for the reference's layout list
# (typeutils/reformat.go:25-38). The two zone-offset spellings that
# Java patterns can't express directly (" -0700 MST", trailing bare
# "+00") are normalized by a regexp first.
_LAYOUTS = [
    "yyyy-M-d",
    "yyyy-M-d H:m:s",
    "yyyy-M-d H:m:s XXX",      # '... 10:23:45 -07:00'
    "yyyy-M-d H:m:sXXX",       # '... 10:23:45-07:00'
    "yyyy-M-d H:m:s Z",        # '... 10:23:45 -0700' (zone name stripped)
    "yyyy-M-d'T'H:m:s",
    "yyyy-M-d'T'H:m:s.SSSSSS",
    "yyyy-M-d'T'H:m:s.SSSSSSSSSXXX",
    "yyyy-M-d'T'H:m:s.SSSXXX",  # ISO milli + Z ('2020-08-17T05:50:22.895Z')
    "yyyy-M-d'T'H:m:sZ",        # '...T10:23:45+0000'
    "yyyy-M-d H:m:s.SSSSSSXXX",
    "yyyy-M-d H:m:s.SSSSSS",
]

# starts-with-date gate: first 10 chars look like Y-M-D with 1-4 digit
# parts (reformat.go:229-253)
_DATE_GATE = r"^[0-9]{1,4}-[0-9]{1,4}-[0-9]{1,4}"


def reformat_date(col: Column | str) -> Column:
    """String → timestamp via the reference's layout cascade.

    Semantics reproduced from ReformatDate/parseStringTimestamp:
    - the string must START with a date pattern, else NULL (the
      reference errors; NULL is the columnar spelling of that);
    - first matching layout wins (COALESCE evaluates in order);
    - date-gated strings that match NO layout land on epoch 0
      (reformat.go:269) — deliberate sentinel, not NULL;
    - years clamp to [1, 9999]: year < 1 → epoch 0, year > 9999 →
      shifted down to year 9999 (reformat.go:217-226).
    """
    c = F.col(col) if isinstance(col, str) else col
    # normalize the two Java-hostile suffixes: ' -0700 MST' → ' -0700',
    # trailing '(+|-)NN' offset → '(+|-)NN:00'
    cleaned = F.regexp_replace(c, r" ([+-]\d{4}) [A-Z]{3,4}$", r" $1")
    # bare trailing '+NN' hour offset (after a time component — a
    # looser match would eat the day of a plain 'yyyy-M-d')
    cleaned = F.regexp_replace(cleaned, r"(:\d{2}(?:\.\d+)?)([+-]\d{2})$", r"$1$2:00")
    parsed = F.coalesce(
        *[F.try_to_timestamp(cleaned, F.lit(p)) for p in _LAYOUTS]
    )
    gated = F.when(c.rlike(_DATE_GATE), F.coalesce(parsed, F.timestamp_seconds(F.lit(0))))
    return clamp_year(gated)


def reformat_epoch(col: Column | str) -> Column:
    """Integer seconds → timestamp (ReformatDate int64 arm,
    reformat.go:161-168), with the same year clamp."""
    c = F.col(col) if isinstance(col, str) else col
    return clamp_year(F.timestamp_seconds(c.cast("long")))


def reformat_epoch_auto(col: Column | str) -> Column:
    """Integer epoch → timestamp with UNIT detection by digit count.

    The reference's int64 arm is seconds-only (reformat.go:161-168),
    but CDC wires mix units: the binlog header is epoch seconds, Mongo
    ``wallTime`` is epoch milliseconds, GTID carries microseconds.
    Fed to the seconds arm, a millisecond value lands in year ~56938
    and the year clamp collapses it to 9999 — every row gets the same
    _cdc_timestamp and merge dedup ordering silently degrades to
    op-priority only. Digit count disambiguates unambiguously for any
    date between 1973 and 5138: ≤11 digits seconds, 12-14 millis,
    15-17 micros, 18+ nanos (truncated to micros exactly, via the
    digit string — a double divide would lose precision at 10^18)."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.length(F.regexp_replace(c, r"^-", ""))
    n = c.cast("long")
    return clamp_year(
        F.when(digits <= 11, F.timestamp_seconds(n))
        .when(digits <= 14, F.timestamp_millis(n))
        .when(digits <= 17, F.timestamp_micros(n))
        .otherwise(
            F.timestamp_micros(
                F.regexp_replace(c, r"[0-9]{3}$", "").cast("long")
            )
        )
    )


def clamp_year(ts: Column) -> Column:
    """Year clamp [1, 9999] (reformat.go:217-226): pre-year-1 values
    collapse to epoch 0; post-9999 shift down by whole years to 9999."""
    y = F.year(ts)
    over = ts - F.make_interval(years=y - F.lit(9999))
    return (
        F.when(y < 1, F.timestamp_seconds(F.lit(0)))
        .when(y > 9999, over)
        .otherwise(ts)
    )

"""F1: the reference's restricted per-stream user filter grammar.

Parses the 1-2 condition filter string a stream config may carry
(``types/stream_configured.go:87-134``: operators ``= != < > <= >=``,
one optional case-insensitive ``and``/``or``, double-quoted column
names for special characters, values as quoted strings / ints /
floats / leading-dot decimals / bare words) and renders it as a
Catalyst ``Column`` so Spark pushes it into the source scan — the
engine's analog of the reference's ``jdbc.SQLFilter``
(``pkg/jdbc/jdbc.go:564-637``), which splices the parsed conditions
into the backfill/incremental WHERE clause.

Semantics mirrored exactly:

- an unparseable filter is a LOUD error, not a silent pass-through
  (the reference's regex gate returns ``invalid filter format``);
- the bare word ``null`` as a value maps ``=``/``!=`` to
  IS NULL / IS NOT NULL and any other operator to a comparison with
  NULL (never true — same rows as the reference's ``col < NULL``);
- quoted values are string literals (quotes stripped); unquoted
  values become int/float/boolean literals when they parse as such,
  else bare-word string literals (``a > b`` compares column ``a``
  with the STRING ``'b'`` — the reference does the same);
- at most two conditions; three or more fail the grammar.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the reference's FilterRegex verbatim (stream_configured.go:108) —
#: Python 3.11 supports the scoped (?i:...) flag it uses
FILTER_RE = re.compile(
    r'^(?:"([^"]*)"|(\w+))\s*(>=|<=|!=|>|<|=)\s*'
    r'((?:"[^"]*"|-?\d+\.\d+|-?\d+|\.\d+|\w+))\s*'
    r'(?:((?i:and|or))\s*(?:"([^"]*)"|(\w+))\s*(>=|<=|!=|>|<|=)\s*'
    r'((?:"[^"]*"|-?\d+\.\d+|-?\d+|\.\d+|\w+)))?\s*$'
)


@dataclass
class Condition:
    column: str
    operator: str  # = != < > <= >=
    value: str  # raw token, quotes preserved (reference keeps them too)


@dataclass
class Filter:
    conditions: list[Condition] = field(default_factory=list)
    logical_operator: str = ""  # "", "and", "or" (as written, any case)


def parse_filter(text: str | None) -> Filter:
    """Parse a stream-config filter string; '' / None → empty Filter.

    Raises ValueError on grammar violations — mirroring the
    reference's ``invalid filter format: %s`` error path.
    """
    s = (text or "").strip()
    if not s:
        return Filter()
    m = FILTER_RE.match(s)
    if m is None:
        raise ValueError(f"invalid filter format: {s}")
    g = m.groups()

    def col_name(quoted, bare):
        return quoted if quoted is not None else bare

    conds = [Condition(column=col_name(g[0], g[1]), operator=g[2], value=g[3])]
    logical = g[4] or ""
    if logical:
        conds.append(Condition(column=col_name(g[5], g[6]), operator=g[7], value=g[8]))
    return Filter(conditions=conds, logical_operator=logical)


#: the grammar's OWN numeric value shapes (FILTER_RE alternatives 2-4).
#: Python int()/float() are looser than the reference's strconv parse —
#: they accept underscore separators ('1_000' → 1000) where the
#: reference falls through to the string literal '1_000' — so numeric
#: conversion is gated on these shapes, never on "int() didn't raise".
_INT_SHAPE = re.compile(r"-?\d+")
_FLOAT_SHAPE = re.compile(r"-?\d+\.\d+|\.\d+")


def _value_literal(raw: str) -> Column:
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return F.lit(raw[1:-1])
    if raw.lower() in ("true", "false"):
        return F.lit(raw.lower() == "true")
    if _INT_SHAPE.fullmatch(raw):
        return F.lit(int(raw))
    if _FLOAT_SHAPE.fullmatch(raw):
        return F.lit(float(raw))
    return F.lit(raw)


def _condition_column(c: Condition) -> Column:
    col = F.col("`" + c.column.replace("`", "``") + "`")
    if c.value == "null":
        # SQLFilter's null arm (jdbc.go:581-590)
        if c.operator == "=":
            return col.isNull()
        if c.operator == "!=":
            return col.isNotNull()
        return _apply_op(col, c.operator, F.lit(None))
    return _apply_op(col, c.operator, _value_literal(c.value))


def _apply_op(col: Column, op: str, val: Column) -> Column:
    if op == "=":
        return col == val
    if op == "!=":
        return col != val
    if op == "<":
        return col < val
    if op == ">":
        return col > val
    if op == "<=":
        return col <= val
    return col >= val


def filter_to_column(f: Filter) -> Column | None:
    """Filter → Catalyst Column (None for the empty filter). Apply it
    directly after the source scan so predicate pushdown sees it."""
    if not f.conditions:
        return None
    out = _condition_column(f.conditions[0])
    if len(f.conditions) > 1:
        second = _condition_column(f.conditions[1])
        out = out | second if f.logical_operator.lower() == "or" else out & second
    return out


def apply_stream_filter(df, text: str | None):
    """Parse + apply a stream-config filter to a DataFrame; the empty
    filter is the identity. Invalid grammar raises before any job."""
    col = filter_to_column(parse_filter(text))
    return df if col is None else df.filter(col)

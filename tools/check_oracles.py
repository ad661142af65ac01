"""Local replica of the driver's correctness gate: run each queries()
entry in Spark and its oracle in DuckDB on the same sf dir; compare
row count, column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full-precision repr: the driver's gate hashes exact values, so
        # the local gate must too (%.6g silently hid cent-level drift on
        # 6-digit prices — that is how round 1 shipped a red cell).
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str, only: list[str]):
    from olake_spark.entry_queries import ORACLES, QUERIES
    from olake_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        if ok_cols and ok_count and sh == dh:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: cols {sorted(scols)} vs {sorted(dcols)} | "
                f"rows {len(srows)} vs {len(drows)} | hash {'=' if sh == dh else '≠'}"
            )
            if ok_cols and ok_count:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(_norm(r[i]) for i in order) for r in srows)
                dset = sorted("|".join(_norm(r[i]) for i in order) for r in drows)
                diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
                for a, b in diffs:
                    print(f"   spark: {a}\n   duck:  {b}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.exit(main(sf, sys.argv[2:]))

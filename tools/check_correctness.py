"""Local replica of the driver's correctness gate.

Runs every registered query's Spark plan AND its DuckDB oracle SQL at a
given scale factor, compares row count + column names + an
order-insensitive value multiset, and prints one status line per query.
Queries without an oracle get a rows-only check (runs, rows >= 0).

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        pass
    return v


def rows_key(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    from mevi_spark.plans import registry
    from mevi_spark.session import get_spark

    queries = registry.get_queries()
    oracles = registry.get_oracles()

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(queries.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        try:
            df = fn(spark, sf_dir)
            cols = list(df.columns)
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(rows)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            ocols = list(res.columns)
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(rows) != len(orows):
            problems.append(f"rowcount {len(rows)} != {len(orows)}")
        if sorted(c.lower() for c in cols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema {sorted(cols)} != {sorted(ocols)}")
        if not problems:
            a, b = rows_key(cols, rows), rows_key(ocols, orows)
            if a != b:
                bad = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                problems.append(
                    f"values differ (first at sorted idx {bad}):\n"
                    f"    spark : {a[bad] if bad is not None else '?'}\n"
                    f"    duckdb: {b[bad] if bad is not None else '?'}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(rows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

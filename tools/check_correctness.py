"""Local replica of the driver's correctness gate — strict edition.

Runs every registered query's Spark plan AND its DuckDB oracle SQL at a
given scale factor and compares them the way the driver does: both
results go through **pandas** (Spark ``toPandas`` / DuckDB ``.df()``),
columns sorted by name, rows sorted, values compared per column. Two
failure classes the old tuple-based checker missed are now hard errors,
because the driver's canonicalizer rejects them:

* any column whose values are lists/arrays (``sort_values`` raises
  ``TypeError: unhashable type: 'list'`` in the driver) — serialize
  arrays with ``concat_ws``/``array_to_string`` instead;
* integer-vs-float dtype-kind mismatches between engines (DuckDB
  ``SUM``→HUGEINT arrives as float64 in pandas, literals as int32 —
  the driver's value hash is dtype-sensitive) — pin both sides to
  BIGINT/DOUBLE explicitly.

Queries without an oracle get a rows-only check (runs, rows >= 0).

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> tuple[pd.DataFrame, str | None]:
    """Sort columns by name then rows by all columns — the driver's
    canonicalization. Returns (canonical_df, error) where error is a
    message when the frame contains driver-unsortable values."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, np.ndarray))).any():
            return df, f"column {c!r} contains raw arrays/lists"
    try:
        out = df.sort_values(list(df.columns)).reset_index(drop=True)
    except TypeError as e:
        return df, f"unsortable values: {e}"
    return out, None


def _kind(s: pd.Series) -> str:
    k = s.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    # object: classify by first non-null value
    for v in s:
        if v is None or (isinstance(v, float) and pd.isna(v)):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        return type(v).__name__ if not isinstance(v, str) else "str"
    return "empty"


def _col_equal(a: pd.Series, b: pd.Series) -> bool:
    if len(a) != len(b):
        return False
    ka, kb = _kind(a), _kind(b)
    if ka != kb:
        return False
    if ka in ("int", "float"):
        av = pd.to_numeric(a, errors="coerce").to_numpy(dtype="float64")
        bv = pd.to_numeric(b, errors="coerce").to_numpy(dtype="float64")
        # driver hash is exact — no tolerance. NULL/NaN may only equal
        # NULL/NaN (equal_nan), NEVER 0.0: the old nan_to_num fallback
        # mapped both NaN and 0.0 to 0.0 and silently passed results
        # the driver's exact hash rejects.
        return bool(np.array_equal(av, bv, equal_nan=True))
    return bool((a.fillna("\0") == b.fillna("\0")).all())


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
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} != {len(odf)}")
        scols = sorted(c.lower() for c in sdf.columns)
        ocols = sorted(c.lower() for c in odf.columns)
        if scols != ocols:
            problems.append(f"schema {scols} != {ocols}")
        if not problems:
            sdf.columns = [c.lower() for c in sdf.columns]
            odf.columns = [c.lower() for c in odf.columns]
            a, aerr = _canon(sdf)
            b, berr = _canon(odf)
            if aerr:
                problems.append(f"spark result not driver-hashable: {aerr}")
            if berr:
                problems.append(f"oracle result not driver-hashable: {berr}")
            if not problems:
                for c in a.columns:
                    ka, kb = _kind(a[c]), _kind(b[c])
                    if ka != kb:
                        problems.append(
                            f"dtype kind mismatch on {c!r}: "
                            f"spark={ka} duckdb={kb}"
                        )
                    elif not _col_equal(a[c], b[c]):
                        diff = next(
                            (
                                i
                                for i in range(len(a))
                                if not _col_equal(a[c].iloc[[i]], b[c].iloc[[i]])
                            ),
                            None,
                        )
                        problems.append(
                            f"values differ on {c!r} (first at sorted row "
                            f"{diff}): spark={a[c].iloc[diff] if diff is not None else '?'!r} "
                            f"duckdb={b[c].iloc[diff] if diff is not None else '?'!r}"
                        )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

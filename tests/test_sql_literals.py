"""The SQL-text literal helpers underpin every inlined codebook: their
contracts (bit-exact round-trip, loud failure on non-finite, identifier
escaping) get direct unit coverage — pure Python, no Spark session."""

from __future__ import annotations

import math
import random
import struct

import pytest

from mevi_spark.functions.vector import sql_double, sql_double_array, sql_ident


def test_sql_double_round_trips_bit_exact():
    rng = random.Random(7)
    vals = [rng.uniform(-1e6, 1e6) for _ in range(200)] + [
        0.0, -0.0, 1e-300, 5e-324, 1.7976931348623157e308,
        1 / 3, 2**-40, 123456789.123456789, 3e-7,
    ]
    for v in vals:
        text = sql_double(v)
        assert text.endswith("D")
        back = float(text[:-1])
        assert struct.pack("<d", back) == struct.pack("<d", v), v


def test_sql_double_rejects_non_finite():
    for bad in (math.inf, -math.inf, math.nan):
        with pytest.raises(ValueError, match="non-finite"):
            sql_double(bad)
    with pytest.raises(ValueError, match="non-finite"):
        sql_double_array([1.0, math.nan, 2.0])


def test_sql_double_array_shape():
    assert sql_double_array([]) == "array()"
    assert sql_double_array([1.5, -2.0]) == "array(1.5D,-2.0D)"


def test_sql_ident_escaping():
    assert sql_ident("plain") == "`plain`"
    assert sql_ident("a b") == "`a b`"
    assert sql_ident("a.b-c") == "`a.b-c`"
    assert sql_ident("a`b") == "`a``b`"


def test_norm_tokens_empty_text_parity(spark):
    """Punctuation-only text must tokenize to ZERO tokens on BOTH
    engines: Spark tokens('') is [] but DuckDB string_split('', ' ')
    is [''] — the guarded _SQL_NORM_T must agree with the Spark twin
    (round-8 review finding)."""
    import duckdb

    from mevi_spark.functions.text import normalize_text, tokens
    from mevi_spark.plans.pipeline_ops import _SQL_NORM_T
    from pyspark.sql import functions as F

    rows = [(1, "!!! ... ???"), (2, "hello, world!"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_spark = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", F.size(tokens(normalize_text("text"))).alias("n")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    got_duck = dict(
        con.execute(
            f"SELECT doc_id, len({_SQL_NORM_T}) FROM documents"
        ).fetchall()
    )
    assert got_spark == got_duck == {1: 0, 2: 2, 3: 0}

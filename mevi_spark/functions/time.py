"""Timestamp-flavor-safe time helpers.

Parquet ``timestamp[us]`` columns with no timezone annotation load as
``TIMESTAMP_NTZ`` under Spark 4 (``spark.sql.parquet.inferTimestampNTZ``
defaults on), while nanos-as-long or timezone-annotated columns load as
``TIMESTAMP`` (LTZ).  ``F.unix_micros`` only accepts LTZ, so any plan
that does epoch arithmetic must branch on the column's flavor or it
breaks the moment the upstream writer changes precision — exactly what
happened between driver rounds.  ``epoch_us`` hides that branch and is
timezone-independent in both arms (the NTZ arm measures wall-clock
micros since the NTZ epoch literal; no session-timezone cast is
involved, so results are stable across engines and cluster configs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def epoch_us(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch for a timestamp column of either flavor.

    For ``TIMESTAMP_NTZ`` the wall-clock value is measured against the
    NTZ epoch literal via ``timestampdiff`` — exact and independent of
    ``spark.sql.session.timeZone``.  For ``TIMESTAMP`` (LTZ) it is the
    instant's ``unix_micros``.  Both agree with DuckDB's ``epoch_us``
    over the same parquet input.
    """
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        from mevi_spark.functions.vector import sql_ident

        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {sql_ident(col)})"
        )
    return F.unix_micros(F.col(col))

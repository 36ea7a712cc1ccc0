"""Exact global exclusive prefix sum without a single-partition window.

The shape ``SUM(w) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` — a
GLOBAL running total — naively plans one unpartitioned window, i.e.
the whole table through one task. The two-pass value-bucket pattern
here keeps it parallel:

1. bucket rows by value range of the (unique) order column and run ONE
   job for per-bucket totals;
2. accumulate bucket offsets on the driver (bounded at
   ``2·defaultParallelism`` entries — a config-sized list, never data);
3. per-bucket window (parallel) + the bucket's offset.

Both passes see identical groups by construction (the bucket is a pure
function of the order value), so the result is exact. Used by
``sequence_pack`` / ``packed_sequences`` (token layout) and mirrored by
``corpus_sample_remap``'s dense-rank variant (``plans/relational.py``).

Counts stay < 2^53 (25 T tokens ≈ 100 TB of text), so downstream
integer div/mod agree bit-for-bit with a DuckDB oracle's ``//``/``%``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bucketed_cum_before(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    out_col: str = "_cum_before",
) -> DataFrame | None:
    """Add ``out_col`` = sum of ``weight_col`` over all rows with a
    strictly smaller ``order_col`` (exclusive prefix sum in
    ``order_col`` order). ``order_col`` must be unique integers.
    Returns ``None`` for an empty input (caller supplies its own empty
    frame — the schema is query-specific). ``weight_col`` must be an
    integral column: the driver-side bucket offsets accumulate in
    Python ints and would silently truncate fractional sums."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    wt = df.schema[weight_col].dataType
    if not isinstance(wt, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"bucketed_cum_before needs an integral weight column; "
            f"{weight_col} is {wt.simpleString()}"
        )
    spark = df.sparkSession
    mn, mx, n = df.agg(
        F.min(order_col), F.max(order_col), F.count("*")
    ).first()
    if not n:
        return None
    nbuckets = max(1, spark.sparkContext.defaultParallelism * 2)
    width = max(1, -(-(int(mx) - int(mn) + 1) // nbuckets))
    bucket = F.expr(f"({order_col} - {int(mn)}L) div {width}L")
    sums = {
        int(r["b"]): int(r["s"])
        for r in df.groupBy(bucket.alias("b"))
        .agg(F.sum(weight_col).alias("s"))
        .collect()
    }
    acc = 0
    entries = []
    for b in sorted(sums):
        entries.append((b, acc))
        acc += sums[b]
    offset_map = F.create_map(
        *[F.lit(v).cast("long") for pair in entries for v in pair]
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (
        F.element_at(offset_map, F.col("_b"))
        + F.sum(weight_col).over(w)
        - F.col(weight_col)
    )
    return (
        df.withColumn("_b", bucket)
        .withColumn(out_col, cum_before)
        .drop("_b")
    )

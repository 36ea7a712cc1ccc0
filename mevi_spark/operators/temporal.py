"""Temporal joins Spark lacks as built-ins: as-of and bounded-range.

Both are implemented as compositions of existing DataFrame operators —
no Python in the row path — with plan shapes chosen for the 100 TB
case:

* :func:`asof_join` — the union-and-window form: ONE shuffle on the
  key, one sort, zero range fan-out. The naive inequality join plans
  a per-key cartesian (or a broadcast-nested-loop) and explodes on
  dense keys; the window form's cost is the sort, independent of how
  many right rows precede each left row.
* :func:`range_join_binned` — equi-join on (key, time-bin) with the
  left side fanned to the ≤3 candidate bins, then the exact bound
  re-checked. Turns an inequality join into a bounded-fan-out
  equi-join the planner shuffles/broadcasts like any other; never a
  cartesian (asserted by the registry-wide plan audit).

Time columns are integer epoch microseconds (use
``mevi_spark.functions.time.epoch_us`` to produce them from either
timestamp flavor); keeping the operator integer-typed sidesteps the
TIMESTAMP vs TIMESTAMP_NTZ branching entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_vals: list[str],
    right_tiebreak: str | None = None,
    tolerance_us: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``right_time <= left_time`` per key (equal times
    match). Matched columns come back as ``<col><suffix>`` plus
    ``<left_time><suffix>`` (the matched right time); unmatched rows
    keep nulls. ``tolerance_us`` drops matches older than
    ``left_time - tolerance_us`` (DuckDB/pandas ``tolerance``
    semantics). ``right_tiebreak`` makes the winner among equal-time
    right rows deterministic (ascending; the LAST in order wins, i.e.
    the max tiebreak).
    """
    lt, rt = F.col(left_time), F.col(right_time)
    # a NULL right time has no place on the as-of axis: left unfiltered
    # it sorts FIRST under the window ordering and last(ignorenulls)
    # hands its value to left rows that have no true predecessor — a
    # phantom match with a NULL matched-time (DuckDB ASOF and pandas
    # merge_asof both return no match for such rows). A NULL right KEY
    # is the same hazard one level up: Window.partitionBy groups NULL
    # keys together (unlike an equi-join, where NULL never matches),
    # so without this filter a dirty NULL-key left row would absorb
    # values from every other NULL-key entity. With NULL-key right
    # rows gone, NULL-key left rows simply find nothing and come back
    # unmatched — the DuckDB/pandas `by` semantics.
    right = right.filter(rt.isNotNull())
    for key in on:
        right = right.filter(F.col(key).isNotNull())
    tb = (
        F.col(right_tiebreak)
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    matched_t = f"{left_time}{suffix}"
    # the matched right row rides as ONE struct (values + matched time):
    # the struct is non-null for every right row even when a member
    # value is NULL, so a single last(ignorenulls) can never skip a
    # legitimately-NULL value and fall through to an older right row
    # (per-value last() did exactly that — the value came from row t=50
    # while the matched time said t=90)
    rrow = F.struct(
        *[F.col(v).alias(f"v_{v}") for v in right_vals],
        rt.cast("long").alias("rts"),
    )
    rrow_t = right.select(rrow.alias("_s")).schema["_s"].dataType
    lrow = F.struct(*left.columns)
    lrow_t = left.select(lrow.alias("_s")).schema["_s"].dataType
    l2 = left.select(
        *on,
        lt.cast("long").alias("_ts"),
        F.lit(1).alias("_is_l"),
        F.lit(0).cast("long").alias("_tb"),
        lrow.alias("_lrow"),
        F.lit(None).cast(rrow_t).alias("_rrow"),
    )
    r2 = right.select(
        *on,
        rt.cast("long").alias("_ts"),
        F.lit(0).alias("_is_l"),
        tb.cast("long").alias("_tb"),
        F.lit(None).cast(lrow_t).alias("_lrow"),
        rrow.alias("_rrow"),
    )
    # right rows sort BEFORE left rows at the same instant (equal times
    # match); among equal-time right rows the tiebreak orders them and
    # last() keeps the max — fully deterministic
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_is_l").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "_is_l",
        "_lrow",
        "_ts",
        F.last("_rrow", ignorenulls=True).over(w).alias("_m"),
    )
    out = filled.filter(F.col("_is_l") == 1)
    in_tol: Column = F.lit(True)
    if tolerance_us is not None:
        in_tol = F.col("_m.rts") >= F.col("_ts") - F.lit(int(tolerance_us))
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[
            F.when(in_tol, F.col(f"_m.v_{v}")).alias(f"{v}{suffix}")
            for v in right_vals
        ],
        F.when(in_tol, F.col("_m.rts")).alias(matched_t),
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    strict_lower: bool = False,
) -> DataFrame:
    """Bounded-range join: pairs where
    ``left_time + lower_us (<|<=) right_time <= left_time + upper_us``
    per key. Returns left columns + right columns (caller aliases any
    collisions away beforehand).

    The left side fans out to the candidate time bins of width
    ``upper_us - lower_us`` that its window can overlap (≤3 by
    construction: a window spans at most two bin boundaries), the right
    side maps to its single bin, and the join is a plain equi-join on
    ``(*on, bin)`` with the exact predicate re-applied — shuffle cost
    is the fan-out factor, never a per-key cartesian.
    """
    width = int(upper_us) - int(lower_us)
    if width <= 0:
        raise ValueError("upper_us must exceed lower_us")
    lt, rt = F.col(left_time).cast("long"), F.col(right_time).cast("long")
    lo = lt + F.lit(int(lower_us))
    hi = lt + F.lit(int(upper_us))
    bins = F.sequence(
        F.floor(lo / F.lit(width)), F.floor(hi / F.lit(width))
    )
    l2 = left.select("*", F.explode(bins).alias("_bin"))
    r2 = right.select("*", F.floor(rt / F.lit(width)).alias("_bin"))
    lower_ok = rt > lo if strict_lower else rt >= lo
    joined = l2.join(r2, [*on, "_bin"]).filter(lower_ok & (rt <= hi))
    return joined.drop("_bin")

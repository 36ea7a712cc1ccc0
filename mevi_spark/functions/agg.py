"""Order-independent exact aggregation helpers.

Row order inside Spark partial aggregates is nondeterministic, so a
float SUM/AVG can differ bit-wise run-to-run (and from the DuckDB
oracle's own order). Every exposed SUM over doubles therefore
accumulates EXACTLY, in fixed-point:

scaled-long accumulation (here)
    Each value is rounded half-away-from-zero to ``scale`` decimal
    places as an integer number of ``10^-scale`` units and summed as
    integers — exact, order-independent, and ~2-4× faster than
    Spark's decimal cast+sum (the decimal path routes every row
    through BigDecimal; measured 0.68→0.34 s on the 600 k-row q1 agg).
    The per-row rounding is the same half-up the engines' ``CAST(x AS
    DECIMAL(18,s))`` applies, so results match the DuckDB oracles'
    decimal accumulation bit-for-bit (verified over every driver
    table at sf0.01 and sf0.1, including computed products).

``wide=True``
    Sums the scaled longs into ``DECIMAL(38,0)`` instead of BIGINT.
    The bigint accumulator is exact while ``n · max|x| · 10^scale``
    stays under 2⁶³ — a huge margin for per-group aggregates (a
    billion rows of million-scale values), but a corpus-wide
    ungrouped sum at the 100 TB design point can cross it; ``wide``
    keeps integer exactness to 38 digits at ~40 % more cost (still
    ~2× cheaper than the decimal-cast path). Choose per aggregate:
    grouped rollups → default; global sums at extreme scale → wide.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def scaled_long(c: Column | str, scale: int = 6) -> Column:
    """``x`` rounded half-away-from-zero at ``scale`` decimals, as a
    BIGINT count of ``10^-scale`` units (NULL-preserving).

    ``floor(|x|·10^s + 0.5)`` is pure float arithmetic — no BigDecimal
    — and equals the decimal cast's HALF_UP for every value whose
    scaled magnitude is below 2⁵¹ (the 1-ulp product error can't reach
    the rounding boundary there).
    """
    col = F.col(c) if isinstance(c, str) else c
    mag = F.floor(F.abs(col) * F.lit(float(10**scale)) + F.lit(0.5))
    return F.when(col < 0, -mag).otherwise(mag).cast("bigint")


def exact_sum(c: Column | str, scale: int = 6, wide: bool = False) -> Column:
    """Order-independent SUM of a double column: scaled-long (or
    ``wide`` decimal) accumulation, double out. See module docstring
    for the accumulator-width tradeoff."""
    s = scaled_long(c, scale)
    if wide:
        s = s.cast("decimal(38,0)")
    return (F.sum(s).cast("double") / F.lit(float(10**scale))).cast("double")

"""Frequent items (heavy hitters) with bounded memory.

The corpus-scale "what are the dominant tokens/domains/URLs" question.
A plain ``groupBy(term).count()`` shuffles the FULL term universe —
at 100 TB that's billions of distinct keys moving for an answer that
only names the few hundred items above a support threshold. The
classic fix is two passes, neither of which shuffles the term space:

1. **candidate pass** — a Misra-Gries summary per partition
   (``mapInPandas``; dict capped at ``capacity`` entries, batch-merged
   Arrow-side). MG's guarantee: an item's stored count undercounts its
   true partition count by at most ``n_p/(capacity+1)``, so any item
   with GLOBAL count > N/(capacity+1) exceeds that slack in at least
   one partition (pigeonhole over the partition sums) and survives
   into some partition's summary. The union of summaries — at most
   ``capacity × n_partitions`` rows, thousands not billions — is the
   complete candidate set for every item above support
   ``1/(capacity+1)``.
2. **exact pass** — re-scan with the candidate set BROADCAST as a
   map-side marker; candidate rows count per term while everything
   else collapses into one null group (so the same aggregation also
   yields the total N — no separate count action). With
   ``min_support > 1/(capacity+1)`` STRICTLY the result equals the
   full group-by — exact counts, exact membership — with shuffle
   volume proportional to the answer, not the vocabulary.

No reference counterpart (the reference has no frequency analytics);
this is the standard distributed Misra-Gries construction
(Misra & Gries 1982; summary merge per Agarwal et al., "Mergeable
Summaries", PODS 2012).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType


def misra_gries_candidates(
    df: DataFrame, col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned and deduplicated.

    Returns a 1-column DataFrame (``col``) containing every item whose
    global frequency exceeds ``N/(capacity+1)`` (plus false positives,
    never false negatives — the completeness half of MG; the exact
    pass removes the false positives). Shuffle-free except the final
    bounded ``distinct`` over ≤ capacity·n_partitions rows.
    """
    schema = StructType([StructField(col, StringType())])

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # batch-merge: vectorized per-batch counts, then ONE trim
            # if over capacity — subtract the (capacity+1)-th largest
            # counter from every entry and drop the non-positive. At
            # most `capacity` entries can exceed that cutoff, so a
            # single subtraction restores the bound (repeated min-
            # subtraction is O(distinct²) worst case on near-uniform
            # batches — ADVICE r8); the slack argument is unchanged:
            # each trim removes d from ≥ capacity+1 counters, so the
            # cumulative per-item undercount stays ≤ n_p/(capacity+1)
            for term, c in pdf[col].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > capacity:
                d = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    t: c - d for t, c in counters.items() if c - d > 0
                }
        yield pd.DataFrame({col: list(counters.keys())}, dtype=object)

    return df.select(col).mapInPandas(summarize, schema).distinct()


def exact_recount(
    df: DataFrame,
    col: str,
    candidates: DataFrame,
    min_support_num: int,
    min_support_den: int,
) -> DataFrame:
    """The exact second pass, shared by :func:`heavy_hitters` and the
    streaming twin (``streaming/incremental.py::
    incremental_heavy_hitters``'s drain): ONE scan that counts the
    BROADCAST candidates and the total row count together — rows
    outside the candidate set collapse into a single null group whose
    count completes the total, so no separate ``df.count()`` action
    (and no extra corpus scan) is needed. The support threshold
    ``ceil(num·N/den)`` is exact integer arithmetic (bit-identical to
    a SQL ``CEIL(decimal × N)``); the tiny (≤ candidates+1 rows)
    aggregate carries the total via an unpartitioned window, which is
    fine at that size."""
    from pyspark.sql import Window

    marked = df.join(
        F.broadcast(candidates.select(col).withColumn("_isc", F.lit(1))),
        col,
        "left",
    )
    grouped = marked.groupBy(
        F.when(F.col("_isc").isNotNull(), F.col(col)).alias(col)
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    num, den = int(min_support_num), int(min_support_den)
    thresh = F.expr(f"CAST(({num} * _total + {den} - 1) DIV {den} AS BIGINT)")
    return (
        grouped.withColumn("_total", total)
        .filter(F.col(col).isNotNull() & (F.col("cnt") >= thresh))
        .select(col, "cnt")
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_support_num: int,
    min_support_den: int,
    capacity: int | None = None,
) -> DataFrame:
    """Exact heavy hitters: every ``col`` value with frequency ≥
    ``min_support_num/min_support_den`` of the row count, with its
    exact count — exactly TWO scans of ``df`` (the MG candidate pass,
    then :func:`exact_recount`, which folds the total-count into the
    recount aggregation), candidate-bounded shuffle (module
    docstring).

    ``capacity`` defaults to the smallest value that makes the
    candidate pass complete for the requested support; completeness
    needs ``(capacity+1)·num > den`` STRICTLY — at equality an item
    sitting exactly on the support threshold can have count exactly
    ``N/(capacity+1)``, which MG is allowed to lose. Pass a larger
    capacity to trade memory for fewer false positives reaching the
    exact pass.
    """
    if capacity is None:
        capacity = math.ceil(min_support_den / min_support_num)
    if (capacity + 1) * min_support_num <= min_support_den:
        raise ValueError(
            f"capacity {capacity} cannot capture support "
            f"{min_support_num}/{min_support_den}: need (capacity+1)·"
            f"{min_support_num} > {min_support_den}, i.e. capacity ≥ "
            f"{min_support_den // min_support_num}"
        )
    cands = misra_gries_candidates(df, col, capacity)
    return exact_recount(df, col, cands, min_support_num, min_support_den)

"""Mergeable lexical-statistics partials (BM25/TF-IDF corpus stats).

The lexical retrieval tier (``plans/pipeline_ops.py::bm25_run``,
``text_tfidf_topterms``) scores against three corpus-wide statistics:
per-term document frequency ``df``, document count ``n_docs``, and
total token length ``sum_dl`` (→ ``avgdl``). All three are sums over
per-document contributions, so they maintain under ingest exactly like
the hypertable rollup (``operators/rollup.py``): each micro-batch
materializes its partial, state = one keyed sum over partials, and
compaction folds partial dirs into a published base.

Ingest contract: APPEND-ONLY document ids (the trainer-ingest model —
ids are assigned at ingest time). A re-used id would need its OLD
term set retracted, which requires a per-doc terms index (the
machinery ``incremental_neardup`` carries for signatures); the stats
tier deliberately stays index-free — its state is vocabulary-sized,
not corpus-sized — so id reuse is out of contract and documented here
rather than silently miscounted.

Partial schema (ONE frame so a batch is one directory):
``(term, df, n_docs, sum_dl)`` — term rows carry ``(term, df, 0, 0)``;
one sentinel row ``(NULL, 0, n_docs, sum_dl)`` carries the length
stats. The merge is a single ``groupBy(term).sum`` — associative,
commutative, replay-safe under the per-batch-dir overwrite discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def lexical_partials(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One batch's mergeable lexical partial: per-term document
    frequency rows plus the NULL-term sentinel row with (n_docs,
    sum_dl). Tokenization is the SHARED kernel
    (``functions/text.py::tokens(normalize_text(...))``) — the same
    one ``bm25_run`` scores with, so the maintained stats cannot drift
    from the batch searcher's."""
    from mevi_spark.functions.text import norm_tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        norm_tokens(text_col).alias("t"),
    )
    df_rows = (
        toks.select(F.explode(F.array_distinct("t")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            F.col("df").cast("long"),
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("sum_dl"),
        )
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.sum(F.size("t")), F.lit(0)).alias("_dl"),
    ).select(
        F.lit(None).cast("string").alias("term"),
        F.lit(0).cast("long").alias("df"),
        F.col("_n").cast("long").alias("n_docs"),
        F.col("_dl").cast("long").alias("sum_dl"),
    )
    return df_rows.unionByName(stats)


def merge_lexical_partials(parts: DataFrame) -> DataFrame:
    """Fold unioned partial rows into current stats — one term-keyed
    partial-aggregable sum (NULL term groups the sentinel rows)."""
    return parts.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("sum_dl").alias("sum_dl"),
    )

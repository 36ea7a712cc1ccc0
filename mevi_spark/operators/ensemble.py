"""Ensemble of retrieval runs (J2 + J6 + W6 + F9) —
``MEVI/ensemble_marco.py`` restated relationally.

The reference parses two run files into nested dicts and loops
(``:221-240``); here runs are normalized ``(query, doc_id, score, rank)``
rows and the fusion is one join + one column expression:

1. W6 — ``cluster_rank``: rank of the doc's cluster within the query's
   predicted cluster list (``:181-209``), via the doc→code mapping (J2)
   joined against the coarse run.
2. J6 — outer-join ANN scores with the cluster feature per (query, doc).
3. F9 — fused = ``s + α/(β·crank+1)``, or ``s·(1−γα)`` when the doc's
   cluster is absent (``:236-238``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mevi_spark.functions.fusion import rrf_fuse_score
from mevi_spark.operators.topk import topk_per_group


def cluster_rank_feature(
    run: DataFrame,
    mapping: DataFrame,
    coarse: DataFrame,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
) -> DataFrame:
    """W6: attach ``cluster_rank`` (0-based, NULL if unmapped) to each
    (query, doc) row of ``run``.

    ``mapping``: ``(doc_id, code_flat)`` (J2 broadcast join —
    ``MEVI/ensemble_marco.py:190``).
    ``coarse``: ``(query_id, code_flat, coarse_rank)`` with 1-based rank.
    """
    m = F.broadcast(mapping.select(doc_id, "code_flat"))
    with_code = run.join(m, doc_id, "left")
    cr = coarse.select(
        query_id, "code_flat", (F.col("coarse_rank") - 1).alias("cluster_rank")
    )
    return with_code.join(cr, [query_id, "code_flat"], "left").drop("code_flat")


def fuse_runs(
    ann_run: DataFrame,
    coarse: DataFrame,
    mapping: DataFrame,
    k: int,
    alpha: float = 0.6,
    beta: float = 0.03,
    gamma: float = 0.02,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """F9 fusion of an ANN run with a coarse cluster run; per-query top-k
    of the fused score. Defaults are the reference's tuned
    (α, β, γ) = (0.6, 0.03, 0.02) (``MEVI/ensemble_marco.py:251-253``)."""
    feat = cluster_rank_feature(ann_run, mapping, coarse, query_id, doc_id)
    fused = feat.withColumn(
        "fused_score",
        rrf_fuse_score(
            F.col(score_col), F.col("cluster_rank").cast("double"), alpha, beta, gamma
        ),
    )
    return topk_per_group(
        fused.select(query_id, doc_id, "fused_score"),
        [query_id],
        "fused_score",
        k,
        [doc_id],
    )

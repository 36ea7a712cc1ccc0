"""Ensemble of retrieval runs (J2 + J6 + W6 + F9) —
``MEVI/ensemble_marco.py`` restated relationally.

The reference parses the ANN run and the seq2seq-fine run into nested
dicts, concatenates them (``apreds + fpreds``), and writes
``scores[q][p]`` in order so **the last occurrence of a (query, doc)
wins** — i.e. the fine run overwrites the ANN run, and within a run the
lowest-ranked duplicate wins (``MEVI/ensemble_marco.py:224-238``). Here
runs are normalized ``(query_id, doc_id, score, rank)`` rows and the
merge is a union + per-(query, doc) last-wins window:

1. J6 — :func:`merge_runs`: union with run priority, keep the
   overwriting row per (query, doc).
2. W6 — :func:`cluster_rank_feature`: rank of the doc's cluster within
   the query's predicted cluster list (``:181-209``) via the doc→code
   mapping (J2) joined against the coarse run; absent clusters get
   ``crank = num_clusters`` (the coarse-list length, ``cr.get(...,
   len(cr))``).
3. F9 — fused = ``s + α/(β·crank+1)``, punished ``×(1−γα)`` when the
   doc's cluster is absent (``:236-238``).
4. :func:`fuse_grid` — the (α, β, γ) grid search (``:251-253``) as a
   crossJoin against a tiny config DataFrame: one pass over the
   feature relation scores every configuration.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame, Window, functions as F

from mevi_spark.functions.fusion import rrf_fuse_score
from mevi_spark.operators.topk import topk_per_group


def merge_runs(
    ann_run: DataFrame,
    fine_run: DataFrame | None,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_col: str = "score",
    rank_col: str = "rank",
) -> DataFrame:
    """J6: dict-overwrite merge of the ANN run with the fine run.

    Returns one row per (query, doc): the fine run's row when the doc
    appears in both (reference appends ``fpreds`` after ``apreds`` and
    the dict write overwrites, ``MEVI/ensemble_marco.py:231-236``);
    within a run the later (worse-ranked) duplicate wins, matching the
    reference's in-order overwrite.
    """
    a = ann_run.select(query_id, doc_id, score_col, rank_col).withColumn(
        "_prio", F.lit(0)
    )
    if fine_run is None:
        merged = a
    else:
        f = fine_run.select(query_id, doc_id, score_col, rank_col).withColumn(
            "_prio", F.lit(1)
        )
        merged = a.unionByName(f)
    w = Window.partitionBy(query_id, doc_id).orderBy(
        F.desc("_prio"), F.desc(rank_col)
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def cluster_rank_feature(
    run: DataFrame,
    mapping: DataFrame,
    coarse: DataFrame,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
) -> DataFrame:
    """W6: attach ``cluster_rank`` (0-based, NULL if unmapped) and
    ``num_clusters`` (the query's coarse-list length — the reference's
    absent-cluster rank) to each (query, doc) row of ``run``.

    ``mapping``: ``(doc_id, code_flat)`` (J2 broadcast join —
    ``MEVI/ensemble_marco.py:190``).
    ``coarse``: ``(query_id, code_flat, coarse_rank)`` with 1-based rank.
    """
    m = F.broadcast(mapping.select(doc_id, "code_flat"))
    with_code = run.join(m, doc_id, "left")
    cr = coarse.select(
        query_id, "code_flat", (F.col("coarse_rank") - 1).alias("cluster_rank")
    )
    ncl = F.broadcast(
        coarse.groupBy(query_id).agg(F.count("*").alias("num_clusters"))
    )
    return (
        with_code.join(cr, [query_id, "code_flat"], "left")
        .join(ncl, query_id, "left")
        .withColumn("num_clusters", F.coalesce("num_clusters", F.lit(0)))
        .drop("code_flat")
    )


def fuse_runs(
    ann_run: DataFrame,
    coarse: DataFrame,
    mapping: DataFrame,
    k: int,
    fine_run: DataFrame | None = None,
    alpha: float = 0.6,
    beta: float = 0.03,
    gamma: float = 0.02,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """F9 fusion of the merged run; per-query top-k of the fused score.
    Defaults are the reference's tuned (α, β, γ) = (0.6, 0.03, 0.02)
    (``MEVI/ensemble_marco.py:251-253``)."""
    merged = merge_runs(ann_run, fine_run, query_id, doc_id, score_col)
    feat = cluster_rank_feature(merged, mapping, coarse, query_id, doc_id)
    fused = feat.withColumn(
        "fused_score",
        rrf_fuse_score(
            F.col(score_col),
            F.col("cluster_rank").cast("double"),
            F.col("num_clusters"),
            alpha,
            beta,
            gamma,
        ),
    )
    return topk_per_group(
        fused.select(query_id, doc_id, "fused_score"),
        [query_id],
        "fused_score",
        k,
        [doc_id],
    )


def fuse_grid(
    ann_run: DataFrame,
    coarse: DataFrame,
    mapping: DataFrame,
    k: int,
    alphas: tuple[float, ...] = (0.6,),
    betas: tuple[float, ...] = (0.03,),
    gammas: tuple[float, ...] = (0.02,),
    fine_run: DataFrame | None = None,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """The (α, β, γ) grid (``MEVI/ensemble_marco.py:251-253``) in ONE
    pass: crossJoin the per-(query, doc) feature relation with a tiny
    config DataFrame, fuse, and take per-(config, query) top-k.

    Returns ``(alpha, beta, gamma, query_id, doc_id, fused_score, rank)``.
    """
    spark = ann_run.sparkSession
    merged = merge_runs(ann_run, fine_run, query_id, doc_id, score_col)
    feat = cluster_rank_feature(merged, mapping, coarse, query_id, doc_id)
    configs = spark.createDataFrame(
        [(float(a), float(b), float(g)) for a, b, g in product(alphas, betas, gammas)],
        "alpha double, beta double, gamma double",
    )
    fused = rrf_fuse_score(
        F.col(score_col),
        F.col("cluster_rank"),
        F.col("num_clusters"),
        F.col("alpha"),
        F.col("beta"),
        F.col("gamma"),
    )
    scored = feat.crossJoin(F.broadcast(configs)).withColumn("fused_score", fused)
    return topk_per_group(
        scored.select("alpha", "beta", "gamma", query_id, doc_id, "fused_score"),
        ["alpha", "beta", "gamma", query_id],
        "fused_score",
        k,
        [doc_id],
    )

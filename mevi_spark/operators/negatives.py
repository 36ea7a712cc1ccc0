"""Negative sampling (J8) — training-pipeline negatives.

Reference (``MEVI/main_models.py:1813-1950``):

* cluster negatives: members of the positive doc's cluster minus the
  positive itself (``remove_ele``, ``:1841-1866``);
* ``notclus`` negatives: sampled docs whose RQ code shares **no digit**
  with the positive's code (the anti-predicate over code arrays,
  ``:1867-1908``).

Spark restatement: equi-join on the cluster key + inequality filter for
the first; an anti-overlap predicate for the second. Selection is
deterministic (first-N by doc id) instead of the reference's
``random.sample`` so runs are reproducible and oracle-checkable; at
scale the notclus variant should pre-``sample()`` the doc side before
the predicate (the reference samples 8.8M ids first for the same
reason) rather than cross-joining the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _first_n_per_query(df: DataFrame, query_id: str, doc_id: str, n: int) -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.asc(doc_id))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def negative_samples(
    pairs: DataFrame,
    mapping: DataFrame,
    n: int,
    query_id: str = "query_id",
    pos_id: str = "pos_id",
    doc_id: str = "doc_id",
    code_col: str = "code_flat",
) -> DataFrame:
    """J8 cluster negatives: for each (query, positive) pair, the first
    ``n`` docs of the positive's cluster excluding the positive.

    ``pairs``: ``(query_id, pos_id)``; ``mapping``: ``(doc_id, code_flat)``.
    Returns ``(query_id, neg_id)``.

    Exclusion is PER PAIR, matching the reference exactly
    (``remove_ele(nn_candidates_from_clus, oldid)``,
    ``MEVI/main_models.py:1813-1872`` removes only the row's own
    positive): a query with several positives in one cluster can see
    its OTHER positives among the negatives — the reference's
    semantics, reproduced deliberately rather than "fixed". A stricter
    variant would anti-join against all of the query's positives.
    """
    pos_code = pairs.join(
        mapping.select(F.col(doc_id).alias(pos_id), code_col), pos_id
    )
    members = pos_code.join(mapping.select(doc_id, code_col), code_col)
    negs = members.filter(F.col(doc_id) != F.col(pos_id)).select(
        query_id, F.col(doc_id).alias("neg_id")
    )
    return _first_n_per_query(negs.distinct(), query_id, "neg_id", n)


def negative_samples_notclus(
    pairs: DataFrame,
    mapping: DataFrame,
    n: int,
    query_id: str = "query_id",
    pos_id: str = "pos_id",
    doc_id: str = "doc_id",
    code_col: str = "code",
    pool_mod: int = 10,
    pool_keep: int = 4,
) -> DataFrame:
    """J8 ``notclus`` negatives: first ``n`` docs (from a bounded
    candidate pool) whose code array shares no element with the
    positive's code array (``MEVI/main_models.py:1867-1908``).

    ``mapping``: ``(doc_id, code: array<int>)``. The code-overlap
    predicate is corpus-wide per query, so the doc side is
    **pre-sampled before the crossJoin** — the reference does the same
    (it samples candidate ids first, ``MEVI/main_models.py:1867-1908``).
    The sample is the deterministic md5 trick (keep docs whose
    ``md5(doc_id)`` prefix mod ``pool_mod`` < ``pool_keep``), so runs
    are reproducible and the DuckDB oracle can replay it; the sampled
    pool (``pool_keep/pool_mod`` of the corpus) is broadcast, making
    the per-query candidate set ``|pool|`` instead of ``|corpus|``.
    At scale pick ``pool_mod`` so the pool is both ``≫ n`` and small
    enough to broadcast (e.g. ``pool_mod = ndocs // 10_000``) — the
    per-query work is then constant, not corpus-sized.
    ``pool_mod=None`` disables the sample (test-only escape hatch).
    """
    pos_code = pairs.join(
        mapping.select(F.col(doc_id).alias(pos_id), F.col(code_col).alias("_pos_code")),
        pos_id,
    )
    pool = mapping.select(doc_id, code_col)
    if pool_mod is not None:
        keep_hash = F.conv(
            F.substring(F.md5(F.col(doc_id).cast("string")), 1, 6), 16, 10
        ).cast("bigint")
        pool = pool.filter(keep_hash % pool_mod < pool_keep)
    cand = pos_code.crossJoin(F.broadcast(pool))
    negs = cand.filter(
        ~F.arrays_overlap(F.col(code_col), F.col("_pos_code"))
    ).select(query_id, F.col(doc_id).alias("neg_id"))
    return _first_n_per_query(negs.distinct(), query_id, "neg_id", n)

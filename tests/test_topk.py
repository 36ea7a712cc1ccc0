"""Exact top-k similarity join (J4/W3) vs a NumPy float64 oracle, on the
driver-provided embeddings table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = df.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    return df, ids, mat


def _oracle_topk(q_ids, q_mat, d_ids, d_mat, k, metric):
    if metric == "ip":
        s = q_mat @ d_mat.T
    elif metric == "cosine":
        qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
        dn = d_mat / np.linalg.norm(d_mat, axis=1, keepdims=True)
        s = qn @ dn.T
    elif metric == "neg_l2":
        s = -(
            (q_mat * q_mat).sum(1)[:, None]
            - 2 * q_mat @ d_mat.T
            + (d_mat * d_mat).sum(1)[None, :]
        )
    out = {}
    for i, qid in enumerate(q_ids):
        order = np.lexsort((d_ids, -s[i]))[:k]
        out[int(qid)] = [int(d_ids[j]) for j in order]
    return out


@pytest.mark.parametrize("impl", ["sql", "blocked"])
@pytest.mark.parametrize("metric", ["ip", "cosine", "neg_l2"])
def test_exact_topk_matches_numpy(spark, emb, impl, metric):
    from mevi_spark.operators.topk import exact_topk_join

    df, ids, mat = emb
    n_q = 8
    queries = (
        df.filter(F.col("vec_id") < n_q)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    docs = df.filter(F.col("vec_id") >= n_q).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("doc_vec")
    )
    got = exact_topk_join(queries, docs, k=10, metric=metric, impl=impl)
    res = {}
    for r in got.orderBy("query_id", "rank").collect():
        res.setdefault(r.query_id, []).append(r.doc_id)

    want = _oracle_topk(ids[:n_q], mat[:n_q], ids[n_q:], mat[n_q:], 10, metric)
    assert res == want


def test_blocked_handles_many_partitions(spark, emb):
    from mevi_spark.operators.topk import exact_topk_join

    df, ids, mat = emb
    queries = df.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    docs = df.repartition(16).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("doc_vec")
    )
    got = exact_topk_join(queries, docs, k=5, metric="ip", impl="blocked")
    assert got.count() == 10  # 2 queries × 5

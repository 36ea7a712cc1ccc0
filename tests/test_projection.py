"""U7 cluster-positional projection: expr vs pandas impl parity, and
the get_ranks fill semantics (reciprocal, zero when absent)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mevi_spark.operators.projection import (
    cluster_positional_projection,
    projection_weights,
)


def _fixture(spark):
    cands = spark.createDataFrame(
        [
            (1, 10, [1.0, 2.0], 100),
            (1, 11, [0.5, -1.0], 200),
            (2, 12, [3.0, 0.0], 300),
        ],
        "query_id long, doc_id long, doc_vec array<double>, code_flat long",
    )
    # query 1 predicted [100 @1, 300 @2]: doc 11's cluster 200 is absent
    coarse = spark.createDataFrame(
        [(1, 100, 1), (1, 300, 2), (2, 300, 1)],
        "query_id long, code_flat long, coarse_rank int",
    )
    logprobs = spark.createDataFrame(
        [(1, 100, -0.1), (1, 200, -2.0), (2, 300, -0.5)],
        "query_id long, code_flat long, logprob double",
    )
    return cands, coarse, logprobs


def test_expr_matches_pandas_impl(spark):
    cands, coarse, logprobs = _fixture(spark)
    w, b = projection_weights(4, 3)
    rows = {}
    for impl in ("expr", "pandas"):
        out = cluster_positional_projection(
            cands, coarse, logprobs, w, b, ntopk=2,
            emb_col="doc_vec", code_col="code_flat", impl=impl,
        ).collect()
        rows[impl] = {
            (r.query_id, r.doc_id): np.array(r.projected) for r in out
        }
    assert set(rows["expr"]) == set(rows["pandas"]) == {(1, 10), (1, 11), (2, 12)}
    for key in rows["expr"]:
        np.testing.assert_allclose(rows["expr"][key], rows["pandas"][key], atol=1e-12)


def test_rank_and_score_features(spark):
    """Feature values follow get_ranks/get_logprobs: reciprocal
    1/(pos+1) of the 0-based rank, 0.0 when the cluster is absent from
    the prediction (zeros init, MEVI/main_models.py:1040-1043)."""
    cands, coarse, logprobs = _fixture(spark)
    w = np.zeros((4, 2))
    w[2, 0] = 1.0  # out[0] = rank feature
    w[3, 1] = 1.0  # out[1] = logprob feature
    b = np.zeros(2)
    out = {
        (r.query_id, r.doc_id): r.projected
        for r in cluster_positional_projection(
            cands, coarse, logprobs, w, b, ntopk=2,
            emb_col="doc_vec", code_col="code_flat",
        ).collect()
    }
    assert out[(1, 10)] == [1.0, -0.1]   # rank 1 → 1/(0+1)
    assert out[(1, 11)] == [0.0, -2.0]   # cluster absent → 0 fill
    assert out[(2, 12)] == [1.0, -0.5]


def test_null_vector_projects_null_in_both_impls(spark):
    """A NULL doc_vec must project to NULL under BOTH impls — the
    pandas kernel previously aborted the job on np.stack over None
    while the expr path quietly yielded NULL (round-8 review)."""
    cands, coarse, logprobs = _fixture(spark)
    cands = cands.unionByName(
        spark.createDataFrame(
            [(2, 13, None, 300)],
            "query_id long, doc_id long, doc_vec array<double>, code_flat long",
        )
    )
    w, b = projection_weights(4, 3)
    for impl in ("expr", "pandas"):
        got = {
            r.doc_id: r.projected
            for r in cluster_positional_projection(
                cands, coarse, logprobs, w, b, ntopk=2,
                emb_col="doc_vec", code_col="code_flat", impl=impl,
            ).collect()
        }
        assert got[13] is None, impl
        assert got[10] is not None, impl

"""U7: cluster-positional embedding projections.

Reference: ``PassageEmbeddingProjection`` (``MEVI/main_models.py:
1054-1160``) re-embeds each candidate document with two cluster features
before the fine interaction:

* a **rank feature** — the position of the doc's own cluster inside the
  query's predicted top-``ntopk`` cluster list (``get_ranks``,
  ``MEVI/main_models.py:1023-1043``): zeros-initialized, scattered with
  ``fill_func(position)`` where ``fill_func`` is ``1/(x+1)``
  (``cluster_position_rank_reciprocal``) or ``(ntopk-x)/ntopk`` — docs
  whose cluster is absent from the prediction keep 0;
* a **score feature** — the log-probability of the doc's cluster
  sequence under the query's decoder (``get_logprobs``,
  ``MEVI/main_models.py:1079-1094``: gather of ``log_softmax(logits)``
  at the gt codes, summed over levels);

then projects ``concat(embedding, rank_feat, logprob)`` through a
learned dense layer (the ``scorerank`` start_dim = d_model + 2 branch,
``:1060-1062``). The sibling ``UnifiedEmbeddingProjection``
(``:1163-1239``) is a transformer adaptor over the same features — a
real-model path that slots into the same ``impl='pandas'`` hook here
with broadcast weights.

Spark restatement: the features are plain column expressions over two
equi-joins (candidates→coarse run for the rank, candidates→cluster
log-prob table for the score); the dense layer is a deterministic
seeded weight matrix applied either as JVM-side sequential dot folds
(``impl='expr'`` — exact, oracle-replayable via ``list_dot_product``)
or as one Arrow-batched NumPy matmul (``impl='pandas'`` — the shape a
real checkpoint would use, vectorized per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from mevi_spark.functions.vector import dot, lit_vec


def projection_weights(
    in_dim: int, out_dim: int, seed: int = 7
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic stand-in for the learned dense layer: seeded
    Gaussian ``(W: in_dim×out_dim, b: out_dim)``, rounded to 6 decimals
    so literal SQL replay is exact."""
    rng = np.random.default_rng(seed)
    w = np.round(rng.standard_normal((in_dim, out_dim)) / np.sqrt(in_dim), 6)
    b = np.round(rng.standard_normal(out_dim) / 100.0, 6)
    return w, b


def _lit_arr(vals) -> Column:
    return lit_vec(vals)


def rank_feature(
    coarse_rank: Column | str, ntopk: int, reciprocal: bool = True
) -> Column:
    """``fill_func`` of ``get_ranks`` over a 1-based rank column; NULL
    rank (cluster absent from the prediction) → 0.0 (the zeros init)."""
    r = F.col(coarse_rank) if isinstance(coarse_rank, str) else coarse_rank
    x = (r - F.lit(1)).cast("double")  # reference positions are 0-based
    feat = 1.0 / (x + 1.0) if reciprocal else (F.lit(ntopk) - x) / F.lit(ntopk)
    return F.coalesce(feat, F.lit(0.0))


def cluster_positional_projection(
    cands: DataFrame,
    coarse: DataFrame,
    logprobs: DataFrame,
    weights: np.ndarray,
    bias: np.ndarray,
    ntopk: int,
    emb_col: str = "doc_vec",
    code_col: str = "code_flat",
    reciprocal: bool = True,
    impl: str = "expr",
) -> DataFrame:
    """Project candidate docs with cluster-rank + cluster-score features.

    ``cands``: ``(query_id, doc_id, <emb_col>, <code_col>)`` candidate
    pairs (the fine run joined to doc embeddings and codes).
    ``coarse``: ``(query_id, code_flat, coarse_rank)`` — the query's
    predicted top-``ntopk`` clusters. ``logprobs``: ``(query_id,
    code_flat, logprob)`` — per-cluster decoder log-probability for the
    query (full softmax, not the pruned beam).

    Returns ``(query_id, doc_id, projected: array<double>)`` where
    ``projected = Wᵀ · concat(emb, rank_feat, logprob) + b``.

    Both joins broadcast run-sized tables (|queries|·ntopk and
    |queries|·K rows — artifact-sized); the corpus-sized side is never
    shuffled beyond its candidate subset.
    """
    in_dim, out_dim = weights.shape
    joined = cands.join(
        F.broadcast(
            coarse.select(
                "query_id",
                F.col("code_flat").alias(code_col),
                "coarse_rank",
            )
        ),
        ["query_id", code_col],
        "left",
    )
    joined = joined.join(
        F.broadcast(
            logprobs.select(
                "query_id", F.col("code_flat").alias(code_col), "logprob"
            )
        ),
        ["query_id", code_col],
        "left",
    )
    feat = F.concat(
        F.col(emb_col).cast("array<double>"),
        F.array(
            rank_feature("coarse_rank", ntopk, reciprocal),
            F.coalesce(F.col("logprob"), F.lit(0.0)),
        ),
    )
    staged = joined.select("query_id", "doc_id", feat.alias("_feat"))

    if impl == "expr":
        cols = [
            (dot("_feat", _lit_arr(weights[:, j])) + F.lit(float(bias[j])))
            for j in range(out_dim)
        ]
        # a NULL feature projects to NULL (not an array of NULL
        # elements) — the same convention the pandas kernel emits
        return staged.select(
            "query_id",
            "doc_id",
            F.when(
                F.col("_feat").isNotNull(), F.array(*cols)
            ).alias("projected"),
        )

    if impl == "pandas":
        w_b, b_b = weights.copy(), bias.copy()

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue  # np.stack rejects an empty sequence
                feats = pdf["_feat"].to_numpy()
                # NULL features project to NULL, matching impl='expr'
                # (np.stack over a sequence containing None aborts the
                # job; the expr path quietly yields NULL — one operator,
                # one semantics)
                mask = np.array([f is not None for f in feats])
                proj: list = [None] * len(pdf)
                if mask.any():
                    mat = np.stack(feats[mask]).astype(np.float64)
                    out = mat @ w_b + b_b
                    for i, row in zip(np.nonzero(mask)[0], out):
                        proj[int(i)] = row
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"],
                        "doc_id": pdf["doc_id"],
                        "projected": proj,
                    }
                )

        return staged.mapInPandas(
            run, schema="query_id long, doc_id long, projected array<double>"
        )

    raise ValueError(f"unknown impl {impl!r}")

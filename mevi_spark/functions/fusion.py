"""Ensemble score fusion (F9) — reciprocal-rank fusion with punishment.

Reference formula (``MEVI/ensemble_marco.py:234-240``), defaults
α=0.6, β=0.03, γ=0.02 (``MEVI/ensemble_marco.py:251-253``):

* every doc: ``score = s + α / (β·crank + 1)`` where ``crank`` is the
  rank of the doc's cluster in the query's coarse list — or
  ``num_clusters`` (= the coarse list length) when the cluster is absent
  (``cr.get(..., len(cr))``, ``MEVI/ensemble_marco.py:209-210``);
* absent-cluster docs are then additionally punished:
  ``score ×= (1 − γ·α)`` (``:238-239``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def rrf_fuse_score(
    base_score: Column,
    cluster_rank: Column,
    num_clusters: Column,
    alpha: float | Column = 0.6,
    beta: float | Column = 0.03,
    gamma: float | Column = 0.02,
) -> Column:
    """``cluster_rank`` is 0-based, NULL when the doc's cluster is not in
    the query's predicted cluster list; ``num_clusters`` is the per-query
    coarse-list length used as the absent-cluster rank.

    α/β/γ accept Columns as well as floats so the grid search
    (``operators/ensemble.py::fuse_grid``) evaluates THIS function over
    its config relation instead of a drift-prone inline copy; constant
    folding collapses the float form to the same literals as before."""

    def _c(x):
        return x if isinstance(x, Column) else F.lit(float(x))

    a, b, g = _c(alpha), _c(beta), _c(gamma)
    crank = F.coalesce(cluster_rank, num_clusters.cast("double"))
    fused = base_score + a / (b * crank + F.lit(1.0))
    return F.when(
        cluster_rank.isNull(), fused * (F.lit(1.0) - g * a)
    ).otherwise(fused)

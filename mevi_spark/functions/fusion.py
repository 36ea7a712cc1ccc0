"""Ensemble score fusion (F9) — reciprocal-rank fusion with punishment.

Reference formula (``MEVI/ensemble_marco.py:236-238``), defaults
α=0.6, β=0.03, γ=0.02 (``MEVI/ensemble_marco.py:251-253``):

* doc's cluster appears at rank ``crank`` in the query's coarse list:
  ``score = s + α / (β·crank + 1)``
* doc's cluster absent from the coarse list: ``score = s · (1 − γ·α)``
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def rrf_fuse_score(
    base_score: Column,
    cluster_rank: Column,
    alpha: float = 0.6,
    beta: float = 0.03,
    gamma: float = 0.02,
) -> Column:
    """``cluster_rank`` is 0-based, NULL when the doc's cluster is not in
    the query's predicted cluster list (the "unmapped" punish branch)."""
    fused = base_score + F.lit(alpha) / (F.lit(beta) * cluster_rank + F.lit(1.0))
    punished = base_score * F.lit(1.0 - gamma * alpha)
    return F.when(cluster_rank.isNotNull(), fused).otherwise(punished)

"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the large-scale
pipeline operators) registers here as a named query:

* a Spark callable ``(spark, sf_dir) -> DataFrame``
* (when SQL-expressible) an equivalent DuckDB oracle SQL string run by
  the driver against the same parquet tables.

Cross-engine determinism rules (these make the driver's value-hash
match):

* **Sequential array folds are bit-stable**: Spark's ``F.aggregate`` over
  ``array<double>`` and DuckDB's ``list_dot_product(::DOUBLE[])`` fold
  left-to-right in float64 and agree bit-for-bit (verified).
* **Row aggregation order is NOT stable** (partial aggs see rows in
  different orders), so every SUM/AVG over doubles is stabilized through
  decimal: ``SUM(CAST(x AS DECIMAL(18,6)))`` is exact and
  order-independent in both engines; cast the final result back to
  DOUBLE.
* Scores exposed in results are ``round(x, 6)``; ranked lists always
  tie-break on (−score, id).
* Array-valued results are serialized ``concat_ws(',', sort_array(...))``
  so hashing is representation-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from mevi_spark.plans import (  # noqa: F401
        interop_ops,
        multimodal_ops,
        pipeline_ops,
        pruning_ops,
        relational,
        retrieval,
        streaming_ops,
    )

    _LOADED = True

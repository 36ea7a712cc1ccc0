"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to ``mevi_spark.plans.registry``, which each
``mevi_spark.plans.*`` module populates at import time. Local replica
of the driver's check: ``python tools/check_correctness.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the coarse-to-fine
    retrieval pipeline (beam over the label-seeded codebook → cluster
    expansion → dot-product re-rank → per-query top-10)."""
    from mevi_spark.plans import registry

    q = registry.get_queries()["coarse_to_fine_retrieval"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mevi_spark.plans import registry

    return registry.get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (keys without one get the driver's
    weaker rows-only check)."""
    from mevi_spark.plans import registry

    return registry.get_oracles()

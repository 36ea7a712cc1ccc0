"""Session-scoped deferred-unpersist registry.

Operators that persist an intermediate consumed by several downstream
branches (MinHash signatures, run artifacts) face a teardown choice:

* eagerly ``localCheckpoint`` the small result and unpersist before
  returning — clean ownership, but pays one extra full materialization
  of the pipeline (the checkpoint) before the caller's own action;
* keep the block persisted and let the CALLER's session teardown
  release it — one materialization total, the same lifetime contract
  as the retrieval run caches.

This registry implements the second: :func:`defer_unpersist` parks the
persisted frame against its session (weakly keyed — a collected
session drops its entry, so id()-reuse can never alias blocks onto a
new session), and ``clear_session_caches`` /
:func:`release` frees everything deterministically.
"""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

_DEFERRED: WeakKeyDictionary = WeakKeyDictionary()


def defer_unpersist(df: DataFrame) -> DataFrame:
    """Register a persisted frame for release at session-cache teardown."""
    _DEFERRED.setdefault(df.sparkSession, []).append(df)
    return df


def release(spark: SparkSession) -> None:
    """Unpersist every deferred frame of ``spark`` (idempotent)."""
    for df in _DEFERRED.pop(spark, []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — blocks are gone anyway

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
persisted frame ON its session object (an attribute — see
:func:`session_attached`), and ``clear_session_caches`` /
:func:`release` frees everything deterministically.

Why attributes and not a module-level ``WeakKeyDictionary`` keyed by
the session: every cached DataFrame holds a strong reference back to
its SparkSession (``DataFrame._session``), so a weak-key entry whose
VALUE contains DataFrames keeps its own key alive forever — the weak
map degraded to a leak exactly in the session-churning service
scenario it was meant to protect. State stored as an attribute of the
session dies with the session, no registry to leak, and id()-reuse
can never alias a dead session's artifacts onto a new one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def session_attached(spark: SparkSession, name: str, factory: Callable):
    """Per-session mutable store, held BY the session object itself so
    its lifetime is exactly the session's (module docstring)."""
    store = getattr(spark, name, None)
    if store is None:
        store = factory()
        setattr(spark, name, store)
    return store


def pop_attached(spark: SparkSession, name: str, default):
    """Remove and return a session-attached store (teardown helper)."""
    store = getattr(spark, name, None)
    if store is None:
        return default
    try:
        delattr(spark, name)
    except AttributeError:
        pass
    return store


def defer_unpersist(df: DataFrame) -> DataFrame:
    """Register a persisted frame for release at session-cache teardown."""
    session_attached(df.sparkSession, "_mevi_deferred", list).append(df)
    return df


def release(spark: SparkSession) -> None:
    """Unpersist every deferred frame of ``spark`` (idempotent)."""
    for df in pop_attached(spark, "_mevi_deferred", []):
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — blocks are gone anyway

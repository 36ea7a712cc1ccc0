"""Bucketed parquet tables — the co-located-join layout.

At 100 TB the dominant cost of a repeated equi-join is the shuffle: both
sides re-hash-partition on the key for every query. Bucketing moves
that shuffle to WRITE time — the table is hash-clustered into a fixed
number of buckets on the join key once, and every later equi-join (or
aggregation) on that key between tables with compatible bucketing reads
bucket-aligned splits with NO exchange in the plan. This is the Spark
form of the reference pre-sharding its corpus by key so per-rank workers
join locally (per-rank shard files, ``MEVI/main.py`` rank-sliced
corpus + ``dataprocess/`` per-split TSVs): layout decided at ingest,
reused by every downstream query.

Design rules encoded here:

* bucket counts must match (or divide) across tables meant to co-join —
  expose one ``buckets`` knob and let callers share it;
* ``sortBy`` the bucket key inside each bucket so sort-merge join also
  skips its per-task sort;
* explicit ``path`` → external table: the catalog entry is metadata
  only, the data lives where the caller puts it (shared storage on a
  cluster), and dropping the table never deletes data.

Ephemeral by default in tests/queries (in-memory catalog, temp paths);
on a cluster the same calls against a persistent metastore make the
layout durable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort_keys: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Save ``df`` as a parquet table hash-bucketed on ``keys``.

    Each bucket is sorted on ``sort_keys`` (default: the bucket keys),
    so bucket-aligned sort-merge joins need neither exchange nor sort.
    Returns the table name for ``spark.table``.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, *keys)
        .sortBy(*(sort_keys or keys))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return table


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str]
) -> DataFrame:
    """Equi-join two bucketed tables on their bucket keys.

    With compatible bucketing this plans as a sort-merge join over
    bucket-aligned scans — zero Exchange operators (asserted as a plan
    regression in ``tests/test_plans.py``).
    """
    return spark.table(left).join(spark.table(right), on)

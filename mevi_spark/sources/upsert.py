"""CDC merge/upsert: apply a change batch to a base table.

The table-maintenance step between ingest dedup and compaction: a
batch of keyed changes (upserts and deletes, each carrying a version)
merges into the base so the latest version per key wins and deletes
drop the key — Delta/Iceberg ``MERGE INTO`` semantics as a plain
DataFrame composition.

Plan shape at 100 TB: ONE shuffle on the key (the union is
partition-local; the per-key latest-version pick is a window over the
keyed exchange, partial state = 1 row per key). Deterministic under
concurrent equal versions via the tiebreak column. For a partitioned
base layout the same merge runs per partition behind dynamic partition
pruning on the change batch's touched partitions; the full-shuffle
form here is the general case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

OP_COL = "_op"
VERSION_COL = "_version"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = VERSION_COL,
    op_col: str = OP_COL,
    base_version: int = 0,
    base_version_col: str | None = None,
    keep_version: bool = False,
    keep_deletes: bool = False,
    base_op_col: str | None = None,
) -> DataFrame:
    """Merge ``changes`` into ``base``; returns the new table state.

    ``changes`` carries the base's data columns plus ``op_col``
    (``'U'`` upsert / ``'D'`` delete) and ``version_col`` (monotone
    per key; higher wins, ties broken by preferring the delete — the
    conservative resolution — then arbitrary-but-deterministic column
    order is the caller's contract). ``base`` rows are implicitly
    ``(op='U', version=base_version)`` — or, when ``base`` is itself a
    versioned state table (the incremental/streaming case), pass
    ``base_version_col`` to take each base row's own version and
    ``keep_version=True`` to carry the winning version into the output
    so the next merge can continue from it. With versions retained the
    merge is replay-idempotent: re-applying an already-applied batch
    reproduces the identical state.

    **Cross-batch version ordering.** With ``keep_deletes=False`` a
    delete winner leaves NO trace, so a LATER batch carrying a
    lower-version upsert for the deleted key would silently resurrect
    it — change batches must then be applied in non-decreasing version
    order per key (the usual CDC-log contract; ``streaming_cdc_apply``
    gets it from file-mtime slice ordering). ``keep_deletes=True``
    removes the requirement: delete winners stay in the state as
    TOMBSTONE rows carrying their version and ``op_col`` (pass
    ``base_op_col`` on re-merge so existing tombstones keep competing),
    and a late lower-version upsert loses to the tombstone. Readers
    filter ``op_col != 'D'`` for the live view; a retention sweep
    drops tombstones older than the source's max replay lag.
    """
    data_cols = [
        c for c in base.columns if c not in (base_version_col, base_op_col)
    ]
    bv = (
        F.col(base_version_col)
        if base_version_col is not None
        else F.lit(base_version)
    )
    bop = (
        F.col(base_op_col) if base_op_col is not None else F.lit("U")
    )
    b = base.select(
        *data_cols,
        bop.alias(op_col),
        bv.cast("long").alias(version_col),
    )
    c = changes.select(
        *data_cols,
        F.col(op_col),
        F.col(version_col).cast("long"),
    )
    u = b.unionByName(c)
    # latest version wins; at equal versions a delete beats an upsert
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.when(F.col(op_col) == "D", 0).otherwise(1).asc(),
    )
    latest = u.select(
        "*", F.row_number().over(w).alias("_rn")
    ).filter(F.col("_rn") == 1)
    out_cols = [
        *data_cols,
        *([version_col] if keep_version else []),
        *([op_col] if keep_deletes else []),
    ]
    if keep_deletes:
        return latest.select(*out_cols)
    return latest.filter(F.col(op_col) != "D").select(*out_cols)


def snapshot_asof(
    changes: DataFrame,
    key_cols: list[str],
    asof_version: int,
    version_col: str = VERSION_COL,
    op_col: str = OP_COL,
    checkpoint: DataFrame | None = None,
) -> DataFrame:
    """Time-travel read: the table state AS OF ``asof_version`` —
    Delta ``VERSION AS OF`` / Iceberg snapshot-id semantics over a CDC
    change log (rows of data columns + ``op_col`` + ``version_col``).

    Replays every change with ``version <= asof_version`` and keeps
    the per-key winner under the same resolution rule as
    :func:`apply_changes` (highest version; delete beats upsert at
    ties), then drops delete winners. ONE keyed shuffle over the
    replayed slice.

    At 100 TB nobody replays the full log per read: pass
    ``checkpoint`` — a retained-tombstone state table produced by
    ``apply_changes(..., keep_version=True, keep_deletes=True)`` at
    some version ``C <= asof_version`` — and only the log TAIL
    (``C < version <= asof_version``) is replayed against it, so the
    keyed shuffle is sized by checkpoint + tail, not the log. The
    checkpoint's tombstones keep competing (``base_op_col``), so a key
    deleted before ``C`` stays deleted unless the tail re-upserts it.

    **Caller contract: the checkpoint version must satisfy C ≤
    asof_version.** A checkpoint is a collapsed state — history below
    it is gone, so time-travel BELOW a checkpoint cannot be served
    from it (use an earlier checkpoint or the full-log form; Delta
    keeps a checkpoint ladder for exactly this). The version filter
    applied to both inputs is defense-in-depth against future-
    versioned rows leaking in under a correct C, NOT a rescue for a
    too-new checkpoint: rows a newer checkpoint already collapsed
    cannot be recovered by filtering. The filter also prunes at the
    scan for a version-partitioned log layout (PartitionFilters).
    """
    tail = changes.filter(F.col(version_col) <= F.lit(asof_version))
    if checkpoint is not None:
        base = checkpoint.filter(
            F.col(version_col) <= F.lit(asof_version)
        )
        return apply_changes(
            base,
            tail,
            key_cols,
            version_col=version_col,
            op_col=op_col,
            base_version_col=version_col,
            base_op_col=op_col,
        )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.when(F.col(op_col) == "D", 0).otherwise(1).asc(),
    )
    data_cols = [c for c in changes.columns if c not in (op_col, version_col)]
    return (
        tail.select("*", F.row_number().over(w).alias("_rn"))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != "D"))
        .select(*data_cols)
    )


def merge_into_partitioned(
    spark,
    base_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_col: str,
    version_col: str = VERSION_COL,
    op_col: str = OP_COL,
) -> list:
    """The partition-pruned MERGE the module docstring sketches: apply
    a change batch to a ``partitionBy(partition_col)`` parquet layout
    rewriting ONLY the touched partitions. Returns the touched
    partition values (bounded: a change batch touches few partitions —
    the Delta/Iceberg MERGE access pattern).

    Mechanics — three pieces, each a physical-plan property:

    1. the touched-partition list comes from one pass over the (batch-
       sized) changes; the base scan filters ``partition_col IN
       (touched)``, which Spark pushes into PartitionFilters — the
       untouched partitions' files are never opened;
    2. :func:`apply_changes` merges base∩touched with the batch — the
       keyed shuffle is sized by the touched slice, not the table;
    3. the write-back uses DYNAMIC partition overwrite, so only the
       partition directories present in the merged output (= touched)
       are replaced; untouched directories are untouched bytes. A
       touched partition whose merge result is EMPTY (a batch that
       deletes its every key) never appears in the output, so dynamic
       overwrite alone would leave its old files serving deleted rows
       — those emptied directories are removed explicitly (the same
       gap Delta closes with delete actions in the log).

    Contract: ``partition_col`` must be immutable per key (a stable
    hash bucket, a creation date) — a change row carries its key's
    one-and-only partition, so deletes prune correctly. The standard
    lakehouse partitioning rule, stated rather than checked (checking
    would scan the base). Partition values must be non-NULL: a NULL
    never matches the ``isin`` prune, so its changes would silently
    merge against nothing — rejected loudly here.
    """
    touched_rows = (
        changes.select(
            F.col(partition_col).alias("_v"),
            F.col(partition_col).cast("string").alias("_s"),
        )
        .distinct()
        .collect()
    )
    if any(r["_v"] is None for r in touched_rows):
        raise ValueError(
            f"merge_into_partitioned: NULL {partition_col} in the change "
            "batch — NULL partition values cannot be pruned or merged "
            "(module contract)"
        )
    touched = [r["_v"] for r in touched_rows]
    # the exact directory name Spark's writer produces for each value:
    # cast-to-string is the writer's own value rendering, and
    # getPartitionPathString applies its Hive escaping — hand-building
    # f"{col}={p}" breaks on strings needing escaping (':', '=', '%')
    touched_dirs = {r["_v"]: r["_s"] for r in touched_rows}
    base = spark.read.parquet(base_dir).filter(
        F.col(partition_col).isin(touched)
    )
    merged = apply_changes(
        base, changes, key_cols, version_col, op_col
    ).localCheckpoint(eager=True)  # merge once: survivors job + write
    survivors = {
        r[0] for r in merged.select(partition_col).distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(base_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # emptied partitions: delete through the Hadoop FileSystem API with
    # Spark's own partition-path escaping, so the cleanup works on any
    # base_dir scheme (HDFS/S3A/local) and on string values needing
    # Hive escaping — a local-only rmtree on a hand-built path silently
    # no-ops there and resurrects deleted rows (ADVICE r8)
    jvm = spark._jvm
    catalog_utils = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    jbase = jvm.org.apache.hadoop.fs.Path(base_dir)
    fs = jbase.getFileSystem(spark._jsc.hadoopConfiguration())
    for p in touched:
        if p not in survivors:
            part = catalog_utils.getPartitionPathString(
                partition_col, touched_dirs[p]
            )
            fs.delete(jvm.org.apache.hadoop.fs.Path(jbase, part), True)
    return touched

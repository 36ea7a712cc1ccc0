"""Driver-checkable roundtrip queries for the interop source/sink tier
(SURVEY §2.1): the reference's TSV formats (S1 corpus / S2 queries / S5
run files), the memmap binary matrix source+sink (S3/S6), and the
deterministic embedder (U1).

Each query *writes* the artifact with the repo's sink, *reads* it back
with the repo's scan, and emits a per-row checksum the DuckDB oracle
recomputes straight from the source parquet — so a driver-green row
proves the full write→read path preserves the data, not just that the
reader parses.

Cross-engine rules (registry docstring): float checksums are summed as
micro-unit BIGINTs (``round(x·10⁶)`` per element, integer sum —
order-free and formatting-free); everything else is pinned BIGINT.

Artifacts land in a fresh ``tempfile.mkdtemp`` per invocation — these
queries run at sf0.01 (tens of KB); the sinks themselves are the
100 TB-shaped parts (executor-side shard writes, no driver merge).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from mevi_spark.embed import embed_text
from mevi_spark.plans.registry import register
from mevi_spark.sources.io import (
    load_table,
    read_corpus_tsv,
    read_queries_dev_tsv,
    read_run_tsv,
    write_run_tsv,
)
from mevi_spark.sources.memmap import read_memmap_matrix, write_memmap_shards


def _tmp(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"mevi_{prefix}_") + "/data"


def _finish(df: DataFrame, path: str) -> DataFrame:
    """Pin the (small) checksum result eagerly, then free the roundtrip
    artifact directory — repeated calls in a long-lived session must
    not accumulate mkdtemp trees (the streaming `_drained` pattern)."""
    import os
    import shutil

    out = df.localCheckpoint(eager=True)
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# S1: corpus TSV write → read → checksum


@register(
    "tsv_corpus_roundtrip",
    oracle=r"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(text, '[\t\n\r]', ' ', 'g') AS text
  FROM documents)
SELECT doc_id,
       strlen(string_split(text, ' ')[1])::BIGINT AS title_len,
       strlen(text)::BIGINT AS content_len
FROM s
""",
)
def tsv_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 (``MEVI/main_utils.py:188-213``): synthesize the reference's
    ``(doc_id, title, content)`` corpus TSV from ``documents``, write it
    with Spark's native sharded CSV sink, scan it back with
    :func:`read_corpus_tsv`, and emit per-row length checksums the
    oracle recomputes from the parquet source.

    TSV contract: fields must be tab/newline-free — the writer quotes a
    multi-line field but the splittable (non-multiLine) reader would
    split the record, so fields are SANITIZED on write (tabs/newlines →
    space; the reference's corpus prep strips them the same way) and
    the oracle applies the identical replacement. Lossless transport of
    arbitrary characters is the JSONL roundtrip's job."""
    docs = load_table(spark, sf_dir, "documents")
    clean = F.regexp_replace("text", r"[\t\n\r]", " ")
    corpus = docs.select(
        "doc_id",
        F.element_at(F.split(clean, " "), 1).alias("title"),
        clean.alias("content"),
    )
    path = _tmp("corpus_tsv")
    corpus.write.mode("overwrite").csv(path, sep="\t")
    back = read_corpus_tsv(spark, path)
    return _finish(
        back.select(
            "doc_id",
            F.length("title").cast("long").alias("title_len"),
            F.length("content").cast("long").alias("content_len"),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# S2: dev-queries TSV (comma-joined positives converter)


@register(
    "tsv_queries_roundtrip",
    oracle="""
SELECT 'q' || doc_id AS query,
       3::BIGINT AS n_ids,
       (3 * doc_id + 3)::BIGINT AS ids_sum
FROM documents WHERE doc_id % 50 = 0
""",
)
def tsv_queries_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (``MEVI/main_utils.py:264-287``): write dev rows
    ``(query, comma-joined doc_ids)``, scan back through
    :func:`read_queries_dev_tsv`'s ``array<long>`` converter
    (the reference's ``comma_split``), checksum the parsed arrays."""
    docs = load_table(spark, sf_dir, "documents")
    dev = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.concat(F.lit("q"), F.col("doc_id")).alias("query"),
        F.concat_ws(
            ",",
            F.col("doc_id"),
            F.col("doc_id") + 1,
            F.col("doc_id") + 2,
        ).alias("doc_ids_csv"),
    )
    path = _tmp("queries_tsv")
    dev.write.mode("overwrite").csv(path, sep="\t")
    back = read_queries_dev_tsv(spark, path)
    return _finish(
        back.select(
            "query",
            F.size("doc_ids").cast("long").alias("n_ids"),
            F.aggregate(
                "doc_ids", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("ids_sum"),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# S5: run-file sink → scan → checksum


@register(
    "tsv_run_roundtrip",
    oracle="""
WITH r AS (
  SELECT 'q' || doc_id AS query,
         list_transform(range(1, 6), i -> doc_id * 10 + i) AS preds,
         list_transform(range(1, 6), i -> ROUND(1.0 / (doc_id + i), 6)) AS scores
  FROM documents WHERE doc_id % 50 = 0)
SELECT query,
       len(preds)::BIGINT AS n_preds,
       list_sum(preds)::BIGINT AS preds_sum,
       list_sum(list_transform(scores,
                x -> CAST(ROUND(x * 1000000) AS BIGINT)))::BIGINT AS scores_sum_e6
FROM r
""",
)
def tsv_run_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 (``MEVI/main_models.py:190-273``, ``MEVI/faiss_search.py:71-77``):
    build a deterministic run table, sink it with :func:`write_run_tsv`
    (one sharded Spark write — the per-rank tmp-file + rank-0 merge
    dance of the reference collapses), scan it back with
    :func:`read_run_tsv`, checksum the parsed pred/score arrays. Score
    doubles survive the text roundtrip exactly (shortest-roundtrip
    formatting), checked via micro-unit integer sums."""
    docs = load_table(spark, sf_dir, "documents")
    run = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.concat(F.lit("q"), F.col("doc_id")).alias("query"),
        F.lit(None).cast("array<array<int>>").alias("clusters"),
        F.transform(
            F.sequence(F.lit(1), F.lit(5)),
            lambda i: F.col("doc_id") * 10 + i,
        ).alias("preds"),
        F.transform(
            F.sequence(F.lit(1), F.lit(5)),
            lambda i: F.round(F.lit(1.0) / (F.col("doc_id") + i), 6),
        ).alias("scores"),
    )
    path = _tmp("run_tsv")
    write_run_tsv(run, path)
    back = read_run_tsv(spark, path)
    return _finish(
        back.select(
            "query",
            F.size("preds").cast("long").alias("n_preds"),
            F.aggregate(
                "preds", F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("preds_sum"),
            F.aggregate(
                "scores",
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.round(x * 1e6).cast("long"),
            ).alias("scores_sum_e6"),
        ),
        path,
    )


# ---------------------------------------------------------------------------
# S3/S6: memmap matrix sink → scan → checksum


@register(
    "memmap_roundtrip",
    oracle="""
SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS row_id,
       list_sum(list_transform(embedding::DOUBLE[],
                x -> CAST(ROUND(x * 1000000) AS BIGINT)))::BIGINT AS vec_sum_e6
FROM embeddings
""",
)
def memmap_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S6 (``MEVI/generate.py:87-113``, ``MemmapList``
    ``MEVI/main_models.py:332-350``): sink the embeddings table to
    per-partition float32 ``.bin`` shards (executor-side writes, path
    order = row order, no rank-0 concat), scan them back through the
    ``binaryFile`` → ``mapInPandas`` reshape, and checksum every vector.
    float32 survives the binary roundtrip bit-exact; ``row_id`` is the
    MemmapList global row numbering (rank of ``vec_id``)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("row_id"), F.col("embedding").alias("vec")
    )
    out_dir = _tmp("memmap")
    write_memmap_shards(emb, out_dir, dtype="float32")
    dim = len(emb.first()["vec"])
    back = read_memmap_matrix(spark, out_dir, dim=dim, dtype="float32")
    return _finish(
        back.select(
            "row_id",
            F.aggregate(
                "vec",
                F.lit(0).cast("long"),
                lambda acc, x: acc + F.round(x.cast("double") * 1e6).cast("long"),
            ).alias("vec_sum_e6"),
        ),
        out_dir,
    )


# ---------------------------------------------------------------------------
# U1: deterministic embedder — determinism + unit-norm contract


@register(
    "embed_determinism",
    oracle="""
SELECT doc_id,
       1::BIGINT AS deterministic,
       CASE WHEN strlen(trim(text, ' ' || chr(9) || chr(10) || chr(13)))
              = 0 THEN 0.0 ELSE 1.0 END AS norm4
FROM documents
""",
)
def embed_determinism(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (``MEVI/document_encoder.py:104-126`` stand-in,
    ``mevi_spark/embed.py``): run the seeded random-projection embedder
    twice independently over the corpus and prove (a) bit-identical
    outputs (same text → same vector, the fixture contract SURVEY §7.1
    relies on) and (b) the L2-normalization invariant ‖v‖ = 1, rounded
    to 4 places to absorb float32 representation error (~1e-7)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    e1 = embed_text(docs, dim=16, seed=7).select(
        "doc_id", F.col("embedding").alias("v1")
    )
    e2 = embed_text(docs, dim=16, seed=7).select(
        "doc_id", F.col("embedding").alias("v2")
    )
    norm_sq = F.aggregate(
        "v1",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return (
        e1.join(e2, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("v1") == F.col("v2"), 1)
            .otherwise(0)
            .cast("long")
            .alias("deterministic"),
            F.round(F.sqrt(norm_sq), 4).alias("norm4"),
        )
    )


# ---------------------------------------------------------------------------
# S1 flavor: JSON-lines interchange (the pipeline exchange format)


@register(
    "jsonl_roundtrip",
    oracle="""
SELECT doc_id, source, md5(text) AS text_md5
FROM documents
""",
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → scan → checksum: the de-facto interchange
    format between corpus-pipeline stages (every row one JSON object,
    shard-parallel on both sides). Written with
    :func:`~mevi_spark.sources.io.write_corpus_jsonl` (Spark's native
    sharded JSON sink), read back with
    :func:`~mevi_spark.sources.io.read_corpus_jsonl`'s EXPLICIT schema
    — inference would be a full extra pass at scale and can mistype
    empty shards. The md5-of-text checksum proves BYTE-exact text
    survival through JSON escaping — the strongest roundtrip check in
    the interop tier (the TSV queries settle for lengths because TSV
    cannot carry tabs); the hostile-character cases (tabs, newlines,
    quotes, unicode) are pinned in ``tests/test_jsonl.py``."""
    from mevi_spark.sources.io import read_corpus_jsonl, write_corpus_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    path = _tmp("jsonl")
    write_corpus_jsonl(docs, path)
    back = read_corpus_jsonl(
        spark, path, "doc_id long, source string, text string"
    )
    return _finish(
        back.select(
            "doc_id",
            "source",
            F.md5("text").alias("text_md5"),
        ),
        path,
    )


@register(
    "orders_merge_upsert",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_totalprice, 'U' AS op, 0 AS v FROM orders),
ch AS (
  SELECT o_orderkey, o_totalprice + 1000.5 AS o_totalprice, 'U' AS op, 2 AS v
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'D', 2
  FROM orders WHERE o_orderkey % 17 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice, 'U', 2
  FROM orders WHERE o_orderkey % 19 = 0),
u AS (SELECT * FROM base UNION ALL SELECT * FROM ch),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderkey
    ORDER BY v DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END) AS rn
  FROM u)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
FROM r WHERE rn = 1 AND op <> 'D'
""",
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (Delta/Iceberg ``MERGE INTO`` semantics as a plain
    composition, ``sources/upsert.py``): a deterministic change batch —
    updates (``%13``), deletes (``%17``), inserts (``%19`` at shifted
    keys) at version 2 — applied to the orders base. Keys hit by both
    an update and a delete at the same version resolve to the delete
    (the conservative rule, exercised by every key divisible by 221).
    One keyed shuffle; the oracle replays the identical merge with a
    window."""
    from mevi_spark.sources.upsert import apply_changes

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    upd = base.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.5).alias("o_totalprice"),
        F.lit("U").alias("_op"),
        F.lit(2).alias("_version"),
    )
    del_ = base.filter(F.col("o_orderkey") % 17 == 0).select(
        "o_orderkey", "o_totalprice",
        F.lit("D").alias("_op"), F.lit(2).alias("_version"),
    )
    ins = base.filter(F.col("o_orderkey") % 19 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
        F.lit("U").alias("_op"), F.lit(2).alias("_version"),
    )
    merged = apply_changes(
        base, upd.unionByName(del_).unionByName(ins), ["o_orderkey"]
    )
    return merged.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )


@register(
    "cdc_partitioned_merge",
    oracle="""
SELECT o_orderkey,
       ROUND(CASE WHEN o_orderkey % 8 = 0 AND o_orderkey % 3 = 0
                  THEN o_totalprice + 1000.5
                  ELSE o_totalprice END, 2) AS total_price,
       CAST(o_orderkey % 8 AS INT) AS bucket
FROM orders
WHERE NOT (o_orderkey % 8 = 1 AND o_orderkey % 5 = 0)
UNION ALL
SELECT o_orderkey + 10000000, ROUND(o_totalprice, 2), CAST(0 AS INT)
FROM orders WHERE o_orderkey % 40 = 0
""",
)
def cdc_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three table-maintenance operators COMPOSED (VERDICT r7
    stretch #8): CDC merge against a partition-pruned base layout,
    then compaction — the full lakehouse maintenance loop on one
    table.

    The orders base is laid out ``partitionBy(bucket = o_orderkey %
    8)``; the change batch touches ONLY buckets 0 and 1 (updates at
    ``%24``, inserts at shifted ``%40`` keys — both bucket 0; deletes
    at ``%8==1 ∧ %5==0`` — bucket 1), so
    :func:`~mevi_spark.sources.upsert.merge_into_partitioned` must
    (1) scan only those two partitions (PartitionFilters — asserted in
    ``tests/test_upsert.py``), (2) merge the batch against that slice,
    (3) dynamic-partition-overwrite exactly those two directories —
    PROVEN here byte-for-byte: every untouched bucket's file listing
    (names, sizes, mtimes) must be identical across the merge, else
    this query raises before the oracle ever runs. Compaction then
    shrinks the layout (strictly fewer data files, asserted like
    ``compaction_roundtrip``) while preserving content — which the
    oracle's closed-form check certifies last."""
    import os

    from mevi_spark.sources.compact import compact_partitioned, data_file_count
    from mevi_spark.sources.upsert import merge_into_partitioned

    path = _tmp("cdcpart")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    base = orders.withColumn(
        "bucket", (F.col("o_orderkey") % 8).cast("int")
    )
    base.repartition(4).write.partitionBy("bucket").parquet(path)

    def listing(untouched_only: bool = True) -> dict[str, tuple]:
        out = {}
        for root, _dirs, files in os.walk(path):
            part = os.path.basename(root)
            if untouched_only and part in ("bucket=0", "bucket=1"):
                continue
            for f in files:
                if f.startswith(("_", ".")) or f.endswith(".crc"):
                    continue
                full = os.path.join(root, f)
                st = os.stat(full)
                out[full] = (st.st_size, st.st_mtime_ns)
        return out

    before = listing()
    bucket = (F.col("o_orderkey") % 8).cast("int")
    upd = orders.filter(
        (F.col("o_orderkey") % 8 == 0) & (F.col("o_orderkey") % 3 == 0)
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.5).alias("o_totalprice"),
        bucket.alias("bucket"),
        F.lit("U").alias("_op"), F.lit(2).cast("long").alias("_version"),
    )
    del_ = orders.filter(
        (F.col("o_orderkey") % 8 == 1) & (F.col("o_orderkey") % 5 == 0)
    ).select(
        "o_orderkey", "o_totalprice", bucket.alias("bucket"),
        F.lit("D").alias("_op"), F.lit(2).cast("long").alias("_version"),
    )
    ins = orders.filter(F.col("o_orderkey") % 40 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_totalprice",
        F.lit(0).cast("int").alias("bucket"),
        F.lit("U").alias("_op"), F.lit(2).cast("long").alias("_version"),
    )
    changes = upd.unionByName(del_).unionByName(ins)
    touched = merge_into_partitioned(
        spark, path, changes, ["o_orderkey"], "bucket"
    )
    if sorted(touched) != [0, 1]:
        raise AssertionError(f"unexpected touched partitions: {touched}")
    after = listing()
    if after != before:
        raise AssertionError(
            "merge rewrote untouched partitions: "
            f"{set(before.items()) ^ set(after.items())}"
        )
    n_before = data_file_count(path)
    n_after = compact_partitioned(spark, path, "bucket")
    if not n_after < n_before:
        raise AssertionError(
            f"compaction did not shrink the layout: {n_before} -> {n_after}"
        )
    out = spark.read.parquet(path).select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.col("bucket").cast("int").alias("bucket"),
    )
    return _finish(out, path)


@register(
    "cdc_time_travel",
    oracle="""
WITH ch AS (
  SELECT o_orderkey, o_totalprice, 'U' AS op, 1 AS ver FROM orders
  UNION ALL
  SELECT o_orderkey, o_totalprice + 1000.5, 'U', 2
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'D', 2
  FROM orders WHERE o_orderkey % 17 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 7.25, 'U', 3
  FROM orders WHERE o_orderkey % 9 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 0.75, 'U', 3
  FROM orders WHERE o_orderkey % 34 = 0 AND o_orderkey % 9 <> 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'D', 4
  FROM orders WHERE o_orderkey % 23 = 0),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY o_orderkey
    ORDER BY ver DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END) AS rn
  FROM ch WHERE ver <= 3)
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
FROM r WHERE rn = 1 AND op <> 'D'
""",
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read (Delta ``VERSION AS OF`` / Iceberg snapshot
    semantics, ``sources/upsert.py::snapshot_asof``) over a 4-version
    CDC log, served through a CHECKPOINT — the way an actual lakehouse
    reader works: materialize the retained-tombstone state at v2 with
    ``apply_changes(keep_version, keep_deletes)``, then replay only the
    v3 tail against it; v4 rows must be version-pruned out.

    The log exercises every resolution rule on the way to ``AS OF 3``:
    v2 updates (``%13``) and deletes (``%17``), v3 updates (``%9`` —
    keys in ``%9 ∩ %17`` resurrect over the v2 tombstone) and explicit
    re-upserts of deleted keys (``%34 ⊂ %17``, minus ``%9`` which
    already resurrects — one upsert per key per version is the
    caller contract), and v4 deletes
    (``%23``) that must NOT appear at as-of 3. The checkpoint+tail
    result is exactly the full-log replay (the module's replay-
    idempotence contract); the oracle replays the whole log closed-form
    with one window."""
    from mevi_spark.sources.upsert import apply_changes, snapshot_asof

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )

    def batch(pred_mod, delta, op, ver):
        src = base.filter(F.col("o_orderkey") % pred_mod == 0)
        return src.select(
            "o_orderkey",
            (F.col("o_totalprice") + delta).alias("o_totalprice"),
            F.lit(op).alias("_op"),
            F.lit(ver).cast("long").alias("_version"),
        )

    v2 = batch(13, 1000.5, "U", 2).unionByName(batch(17, 0.0, "D", 2))
    # the %34 re-upserts exclude %9 keys: those already resurrect via
    # the %9 update, and TWO upserts for one key at one version would
    # violate apply_changes' caller contract (ties are only defined
    # across ops, not within them)
    reups = batch(34, 0.75, "U", 3).filter(F.col("o_orderkey") % 9 != 0)
    tail = batch(9, 7.25, "U", 3).unionByName(reups).unionByName(
        batch(23, 0.0, "D", 4)
    )
    ckpt = apply_changes(
        base,
        v2,
        ["o_orderkey"],
        base_version=1,
        keep_version=True,
        keep_deletes=True,
    )
    snap = snapshot_asof(tail, ["o_orderkey"], 3, checkpoint=ckpt)
    return snap.select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total_price")
    )



# ---------------------------------------------------------------------------
# WebDataset-style tar shards: the multimodal materialization format


@register(
    "wds_shards_roundtrip",
    oracle="""
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
       md5(text) AS payload_md5,
       strlen(text)::BIGINT AS n_bytes,
       ((n_chars % 16 + 4) * 1000000 + (n_chars % 8 + 2) * 1000
        + (doc_id % 7 + 1))::BIGINT AS meta_sum
FROM documents
""",
)
def wds_shards_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset sharded-tar sink → scan → checksum
    (``sources/wds.py``): the multimodal table
    (:func:`~mevi_spark.operators.multimodal.attach_media` — opaque
    binary payload + typed metadata) is written as 8 tar shards with
    the streaming executor-side writer (ONE shard-keyed shuffle, no
    driver merge), scanned back shard-parallel, and checksummed
    per-sample. The oracle recomputes every checksum straight from the
    ``documents`` parquet through ``attach_media``'s documented
    derivations, so a green row proves payload bytes (md5), byte
    counts, AND the json-metadata fields all survived the
    tar-member encode/decode — the full write→read path, not just the
    reader. Payload NULLs normalize to b'' in tar (a tar member cannot
    be NULL); the fixture has none, and the normalization is pinned in
    ``tests/test_wds.py``."""
    from mevi_spark.operators.multimodal import attach_media
    from mevi_spark.sources.wds import read_wds_shards, write_wds_shards

    docs = load_table(spark, sf_dir, "documents")
    path = _tmp("wds")
    # the manifest is the sink's output — materialize it (and thereby
    # the shards) before scanning back
    manifest = write_wds_shards(attach_media(docs), path, n_shards=8)
    n_written = manifest.agg(F.sum("n_samples")).collect()[0][0]
    if n_written != docs.count():
        raise AssertionError(
            f"wds sink wrote {n_written} samples, expected {docs.count()}"
        )
    back = read_wds_shards(spark, path)
    return _finish(
        back.select(
            "doc_id",
            "media_type",
            F.md5("payload").alias("payload_md5"),
            F.length("payload").cast("long").alias("n_bytes"),
            (
                F.col("width").cast("long") * 1000000
                + F.col("height").cast("long") * 1000
                + F.col("n_frames").cast("long")
            ).alias("meta_sum"),
        ),
        path,
    )


_SQL_WDS_SAMPLES = """
SELECT doc_id,
       ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
       md5(text) AS payload_md5,
       strlen(text)::BIGINT AS n_bytes,
       ((n_chars % 16 + 4) * 1000000 + (n_chars % 8 + 2) * 1000
        + (doc_id % 7 + 1))::BIGINT AS meta_sum
FROM documents
"""


@register("wds_shards_append", oracle=_SQL_WDS_SAMPLES)
def wds_shards_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WDS shards maintained INCREMENTALLY (VERDICT r9 next-round #6):
    the multimodal corpus arrives as three doc-id-ordered batches and
    :func:`~mevi_spark.sources.wds.append_wds_shards` lands each as
    NEW immutable tar shards (``shard-b<batch>-<sid>.tar`` — published
    tars are never rewritten, the packed_append discipline), with a
    per-batch manifest. The drained shard set read back through the
    ordinary :func:`read_wds_shards` listing must sample-for-sample
    equal the corpus — the identical checksum oracle as the one-shot
    ``wds_shards_roundtrip``, so the append path proves content
    equality with the one-shot sink. Immutability and replayed-batch
    no-op are pinned byte-level in ``tests/test_wds.py``."""
    from mevi_spark.operators.multimodal import attach_media
    from mevi_spark.sources.wds import append_wds_shards, read_wds_shards

    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id")).first()[0] or 0
    cuts = (int(mx) // 3, 2 * int(mx) // 3)
    path = _tmp("wdsapp")
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter(
            (F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])
        ),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    total = 0
    for i, b in enumerate(batches):
        man = append_wds_shards(
            attach_media(b), path, batch_id=i, shards_per_batch=4
        ).collect()
        total += sum(r.n_samples for r in man)
    if total != docs.count():
        raise AssertionError(
            f"wds append wrote {total} samples, expected {docs.count()}"
        )
    back = read_wds_shards(spark, path)
    return _finish(
        back.select(
            "doc_id",
            "media_type",
            F.md5("payload").alias("payload_md5"),
            F.length("payload").cast("long").alias("n_bytes"),
            (
                F.col("width").cast("long") * 1000000
                + F.col("height").cast("long") * 1000
                + F.col("n_frames").cast("long")
            ).alias("meta_sum"),
        ),
        path,
    )

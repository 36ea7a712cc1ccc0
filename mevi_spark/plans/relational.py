"""Relational operator surface (SURVEY.md §2.1-§2.8) demonstrated on the
driver testdata, each with a DuckDB oracle.

These exercise the generic dataflow the reference hand-rolls in pandas —
scans (S1), projections/filters (P1-P7), equi/semi/anti joins (J1-J9
relational flavors), group-bys (A1-A3, A7-A9), windows (W1-W6), set ops
(§2.7) — expressed declaratively so Catalyst gives pushdown, pruning,
broadcast selection and partial aggregation for free (§4).

Determinism contract: see ``mevi_spark.plans.registry`` module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mevi_spark.functions.agg import exact_sum, scaled_long
from mevi_spark.functions.time import epoch_us
from mevi_spark.plans.registry import register
from mevi_spark.sources.io import load_table


def _dsum(c, scale: int = 6):
    """Order-independent SUM of a double column: exact scaled-long
    accumulate (half-up per row, integer sum — bit-equal to the
    oracles' decimal accumulation, ~2-4× faster; accumulator-width
    tradeoff in :mod:`mevi_spark.functions.agg`), double out."""
    return exact_sum(c, scale)


# ---------------------------------------------------------------------------
# A: aggregations


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + grouped multi-agg (A3's
    partial+final pattern, Spark-native)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            (_dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "order_priority_histogram",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM orders
GROUP BY o_orderpriority
""",
)
def order_priority_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 counting/validation aggregates + distinct agg."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            _dsum("o_totalprice").alias("total_value"),
        )
    )


@register(
    "customer_order_rollup",
    oracle="""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       ARRAY_TO_STRING(LIST_SORT(LIST(o_orderkey)), ',') AS orderkeys_csv
FROM orders
GROUP BY o_custkey
""",
)
def customer_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/P7 shape: group → collect members (the reference's
    defaultdict-append cluster build, ``MEVI/pq.py:200-247``; dev-qrels
    grouping, ``prepare_origin.py:56-68``). Arrays serialize sorted-CSV
    for representation-independent hashing."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("o_orderkey")).cast("array<string>")
            ).alias("orderkeys_csv"),
        )
    )


@register(
    "events_type_stats",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MIN(ts) AS first_ts,
       MAX(ts) AS last_ts
FROM events
GROUP BY event_type
""",
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum("value").alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@register(
    "events_json_extract",
    oracle="""
SELECT CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 analog: parse semi-structured payloads (the reference
    ``eval_list``-parses python-literal strings,
    ``MEVI/evaluate.py:84-88``; here JSON props → key extraction)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), _dsum("value").alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# J: joins


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + global top-k.

    The dimension (filtered customers) broadcasts; the fact-side join is
    the only shuffle. Global top-10 compiles to TakeOrderedAndProject —
    the reference's blocked top-k (W3) done by the engine."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "nation_revenue",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lineitems
FROM region JOIN nation ON n_regionkey = r_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join chain (J1 broadcast-dim pattern).

    region→nation→customer are all broadcast; only orders⋈lineitem
    shuffles. This is the J1 'dict lookup join' of the reference
    (``prepare_origin.py:33-48``) done right at scale."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        cust.join(
            F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
            cust.c_nationkey == nation.n_nationkey,
        )
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8's anti-join flavor (negatives = members minus positives,
    ``MEVI/main_models.py:1841-1866``)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "suppliers_in_region_semi",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE EXISTS (
  SELECT 1 FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE n_nationkey = s_nationkey AND r_name IN ('ASIA', 'EUROPE'))
""",
)
def suppliers_in_region_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7's semi-join flavor (membership test,
    ``MEVI/main_models.py:4061-4077``)."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    nk = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey"
    )
    return sup.join(
        F.broadcast(nk), sup.s_nationkey == nk.n_nationkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# W: windows


@register(
    "topk_orders_per_customer",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders)
WHERE rank <= 3
""",
)
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-group top-k via window (the engine-native form of the
    reference's running top-k)."""
    from mevi_spark.operators.topk import topk_per_group

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return topk_per_group(
        orders, ["o_custkey"], "o_totalprice", 3, tiebreak_cols=["o_orderkey"]
    )


@register(
    "customer_order_running_stats",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
""",
)
def customer_order_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W4 shape: sequence position + running aggregate over an ordered
    per-key frame."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_seq"),
            (
                F.sum(scaled_long("o_totalprice"))
                .over(w.rowsBetween(Window.unboundedPreceding, 0))
                .cast("double")
                / F.lit(1e6)
            ).alias("running_spend"),
        )
    )


@register(
    "sessionize_events",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM seq)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess
GROUP BY user_id, session_idx
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>threshold + running sum — the batch twin
    of streaming ``session_window`` (large-scale pipeline op; no
    reference analog, SURVEY §2.10)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = epoch_us(ev, "ts")
    gap = us - F.lag(us).over(w)
    seq = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = seq.withColumn(
        "session_idx",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# set ops / sampling


@register(
    "brand_set_ops",
    oracle="""
WITH promo AS (SELECT DISTINCT p_brand FROM part WHERE p_type = 'PROMO'),
     large AS (SELECT DISTINCT p_brand FROM part WHERE p_size > 25)
SELECT 'both' AS bucket, p_brand FROM (SELECT p_brand FROM promo INTERSECT SELECT p_brand FROM large)
UNION ALL
SELECT 'promo_only' AS bucket, p_brand FROM (SELECT p_brand FROM promo EXCEPT SELECT p_brand FROM large)
""",
)
def brand_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations (the reference's negative-set intersection /
    difference, ``MEVI/main_models.py:1879-1908``)."""
    part = load_table(spark, sf_dir, "part")
    promo = part.filter(F.col("p_type") == "PROMO").select("p_brand").distinct()
    large = part.filter(F.col("p_size") > 25).select("p_brand").distinct()
    both = promo.intersect(large).select(F.lit("both").alias("bucket"), "p_brand")
    only = promo.exceptAll(large).distinct().select(
        F.lit("promo_only").alias("bucket"), "p_brand"
    )
    return both.unionByName(only)


@register(
    "corpus_sample_remap",
    oracle="""
WITH kept AS (
  SELECT doc_id FROM documents
  WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS INTEGER) AS BIGINT) % 10 < 7
)
SELECT doc_id AS old_id,
       ROW_NUMBER() OVER (ORDER BY doc_id ASC) - 1 AS new_id
FROM kept
""",
)
def corpus_sample_remap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: corpus subsampling + dense id remap
    (``dataprocess/msmarco_passage/sampled_corpus.py:8-60``).

    The reference uses ``random.random() < rate``; we need a seedless
    cross-engine-deterministic filter, so the keep decision hashes the id
    (md5 prefix mod 10). The dense remap is a two-pass pattern over
    VALUE-derived range buckets: ``bucket = (doc_id − min) div width``
    (one stats job for min/max, one count job for per-bucket offsets),
    then ``new_id = offset[bucket] + rank within bucket`` via a window
    partitioned BY BUCKET — parallel, no single-partition global window
    (round-1 straggler finding), no RDD hop (the former ``zipWithIndex``
    left Tungsten and pickled every row through Python — VERDICT r6 #4).
    Buckets derive from the VALUES, not from ``repartitionByRange``:
    the range partitioner's sampled boundaries are seeded by the
    compiled RDD id, so two separately-compiled passes (the offsets
    count and the output) are not guaranteed the same partitioning —
    value-derived buckets make both passes see identical groups by
    construction. Bucket balance follows the id-space density (ids
    here, and in most corpora, are near-dense); a pathological id
    distribution concentrates windows, not correctness."""
    docs = load_table(spark, sf_dir, "documents")
    keep_hash = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast("bigint")
    kept = docs.filter(keep_hash % 10 < 7).select("doc_id")
    mn, mx, n = kept.agg(
        F.min("doc_id"), F.max("doc_id"), F.count("*")
    ).first()
    if not n:
        return spark.createDataFrame([], "old_id long, new_id long")
    nbuckets = max(1, spark.sparkContext.defaultParallelism * 2)
    width = max(1, -(-(int(mx) - int(mn) + 1) // nbuckets))
    bucket = F.expr(f"(doc_id - {int(mn)}L) div {width}L")
    counts = {
        int(r["b"]): int(r["n"])
        for r in kept.groupBy(bucket.alias("b")).agg(
            F.count("*").alias("n")
        ).collect()
    }
    acc = 0
    offset_entries = []
    for b in sorted(counts):
        offset_entries.append((b, acc))
        acc += counts[b]
    offset_map = F.create_map(
        *[F.lit(v).cast("long") for pair in offset_entries for v in pair]
    )
    w = Window.partitionBy("b").orderBy("doc_id")
    return (
        kept.withColumn("b", bucket)
        .select(
            F.col("doc_id").alias("old_id"),
            (
                F.element_at(offset_map, F.col("b"))
                + F.row_number().over(w)
                - 1
            ).cast("long").alias("new_id"),
        )
    )


@register(
    "bucketed_join_rollup",
    oracle="""
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 4)
         AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
)
def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table round trip (the co-located-join layout): write
    orders and customer hash-clustered on custkey into external
    bucketed parquet tables, join through the catalog, roll up per
    market segment.

    The layout decision this exercises — pre-shuffle at WRITE time so
    repeated equi-joins on the key plan with no exchange — is asserted
    as a plan property in ``tests/test_bucketed.py`` (broadcast
    disabled there; at toy SF the optimizer rightly prefers a broadcast
    join, which is also correct over bucketed scans). Spark form of the
    reference pre-sharding its corpus per rank so workers join locally
    (``MEVI/main.py`` rank-sliced corpus files).
    """
    import shutil
    import tempfile
    import uuid as _uuid

    from mevi_spark.sources.bucketed import write_bucketed

    base = tempfile.mkdtemp(prefix="mevi_bucketed_")
    tag = _uuid.uuid4().hex[:8]
    t_o, t_c = f"b_orders_{tag}", f"b_cust_{tag}"
    try:
        write_bucketed(
            load_table(spark, sf_dir, "orders").select(
                "o_custkey", "o_totalprice"
            ),
            t_o, ["o_custkey"], 8, path=f"{base}/orders",
        )
        write_bucketed(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            t_c, ["c_custkey"], 8, path=f"{base}/customer",
        )
        j = spark.table(t_o).join(
            spark.table(t_c), F.col("o_custkey") == F.col("c_custkey")
        )
        out = j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
            F.count("*").alias("n_orders"),
            F.round(exact_sum("o_totalprice"), 4).alias("total_price"),
        )
        # the rollup is segment-count-sized: materialize it eagerly so
        # the bucketed staging (a full copy of both tables) and the
        # uuid catalog entries can be freed before returning — and the
        # cleanup sits in a finally so a failed attempt in a retrying
        # long-lived session cannot accumulate /tmp copies or tables
        out = out.localCheckpoint(eager=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_c}")
        shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "sessionize_events_window",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM seq)
SELECT user_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_idx
""",
)
def sessionize_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via the engine's ``session_window``
    aggregation — the second independent implementation of the batch
    close rule (the lag+running-sum plan is ``sessionize_events``),
    sharing one oracle. ``session_window.end`` is ``last_event + gap``
    by definition, so the last-event bound is ``end − gap``; the start
    IS the first event. Exactly-gap boundary events would differ
    between the two implementations, which the µs-random testdata never
    produces (same caveat as the streaming twin). One shuffle (the
    session-window aggregation), no window-function sorts."""
    ev = load_table(spark, sf_dir, "events")
    win = F.session_window(F.col("ts"), "30 minutes")
    return (
        ev.groupBy(win.alias("_w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.col("_w.start").alias("session_start"),
            F.expr("_w.end - INTERVAL 30 MINUTES").alias("session_end"),
        )
    )


@register(
    "salted_hot_key_rollup",
    oracle="""
SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS hot_key,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
""",
)
def salted_hot_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planned hot-key mitigation (the salting technique of SURVEY §4's
    shuffle notes): a deliberately Zipf-headed key (a third of all users
    collapse onto key 0) is aggregated through the two-phase salted
    rollup — phase 1 spreads key 0 across 16 salted reducers, phase 2
    merges the partials — and must equal the plain group-by, which is
    exactly what the oracle computes. Decimal-stabilized sum (registry
    determinism rule)."""
    from mevi_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 3 == 0, 0)
        .otherwise(F.col("user_id"))
        .alias("hot_key"),
        "value",
    )
    return salted_aggregate(
        ev,
        ["hot_key"],
        {
            "n": (F.count("*"), F.sum("n").cast("long")),
            "sum_value": (
                F.sum(scaled_long("value")),
                (F.sum("sum_value").cast("double") / F.lit(1e6)),
            ),
        },
        salts=16,
    )

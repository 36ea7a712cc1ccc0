"""epoch_us identifier safety and registry window-staleness detection
(ADVICE r5 low items #3 and #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mevi_spark.functions.time import epoch_us
from mevi_spark.plans import registry as REG


def test_epoch_us_quotes_weird_column_names(spark):
    """An NTZ column whose name needs quoting (dots, spaces, hyphens,
    embedded backticks) must resolve as one column reference, not parse
    as an expression."""
    base = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:00:01' AS ts"
    )
    want = 1704067201_000000
    for name in ["event ts", "a.b", "a-b", "a`b"]:
        df = base.select(F.col("ts").alias(name))
        assert dict(df.dtypes)[name] == "timestamp_ntz"
        got = df.select(epoch_us(df, name).alias("us")).first()["us"]
        assert got == want, name


def test_epoch_us_ltz_arm(spark):
    df = spark.sql(
        "SELECT TIMESTAMP '2024-01-01 00:00:01 UTC' AS `t s`"
    )
    got = df.select(epoch_us(df, "t s").alias("us")).first()["us"]
    assert got == 1704067201_000000


R12_NEW = [
    # the 3 round-12-new queries (zero driver evidence): the grouped
    # KMV per-stratum sample's maintenance twin, decontamination
    # served from an incrementally-maintained Bloom blocklist, and
    # curriculum ordering with lazily-served ranks under ingest
    "streaming_grouped_kmv",
    "streaming_bloom_decontaminate",
    "streaming_curriculum",
    # landed later in r12: the token-budget mixture fill (displaces
    # tier-4 heavy_hitters_terms) and the IPF raking weights (displaces
    # tier-4 chunk_dedup_overlap, which keeps standing sf1 scale-tier
    # bench evidence) — rationale per name in plans/registry.py
    "token_budget_mixture",
    "mixture_raking_weights",
]

# the only names allowed to lack both an r11 driver row AND an r12
# window slot (the registry rotation note documents each: three are
# bench-exercised at sf0.1 every round; the 44 r10-green names are
# 2-round-stale and first in line for r13; all re-validated by the
# full local gate every round)
R12_ROTATED_OUT = {
    "coarse_to_fine_retrieval",
    "rq_beam_search",
    "rq_encode_two_level",
    "bpe_roundtrip",
    "cdc_partitioned_merge",
    "cdc_time_travel",
    "chunk_dedup_append",
    "chunk_dedup_reconstruct",
    "compaction_roundtrip",
    "ensemble_hybrid",
    "events_range_pairs",
    "events_rolling_stats",
    "events_type_pivot",
    "events_type_stats",
    "events_value_quantiles",
    "heavy_hitters_terms",
    "chunk_dedup_overlap",
    "memmap_roundtrip",
    "order_priority_histogram",
    "orders_merge_upsert",
    "packed_append",
    "packed_sequences",
    "partition_pruning_stats",
    "pq_adc_topk",
    "pq_encode_reconstruct",
    "pq_ivf_adc_topk",
    "rq_model_roundtrip",
    "rq_reconstruct",
    "salted_hot_key_rollup",
    "sequence_pack",
    "shuffle_blocks_append",
    "sq8_encode_reconstruct",
    "streaming_cdc_apply",
    "streaming_dedup_ingest",
    "streaming_hypertable_refresh",
    "streaming_neardup_ingest",
    "streaming_quantize_index",
    "streaming_sessionize",
    "streaming_sessionize_evict",
    "streaming_sessionize_window",
    "streaming_topk_maintenance",
    "suppliers_in_region_semi",
    "text_lang_id",
    "text_repetition_stats",
    "text_tfidf_topterms",
    "text_token_counts",
    "topk_orders_per_customer",
    "tsv_corpus_roundtrip",
    "wds_shards_append",
}


def test_driver_window_invariants():
    """The driver's correctness evidence covers exactly the first 50
    registered queries, so the priority window must (a) hold exactly 50
    names, (b) name only registered queries, (c) contain every query
    that has never received a driver row (or whose plan changed) —
    this round, the R12_NEW cohort — and (d) every name with no r11
    driver row except the documented rotations (r11-green names are
    1-round-stale and allowed out). A drifted window silently starves
    new queries of evidence."""
    import json
    import os

    REG._ensure_loaded()
    assert len(REG._PRIORITY_ORDER) == 50
    assert len(set(REG._PRIORITY_ORDER)) == 50
    window = list(REG.get_queries())[:50]
    assert set(window) == set(REG._PRIORITY_ORDER)
    missing = [n for n in R12_NEW if n not in window]
    assert not missing, f"zero-evidence queries outside the window: {missing}"
    r11 = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r11.json"
    )
    if os.path.exists(r11):
        with open(r11, encoding="utf-8") as fh:
            r11_names = set(json.load(fh))
        stale = [
            n
            for n in REG.get_queries()
            if n not in r11_names
            and n not in window
            and n not in R12_ROTATED_OUT
            and n not in R12_NEW
        ]
        assert not stale, f"undocumented 2-round-stale evidence: {stale}"
    # every windowed query must also carry an oracle (strict row, not
    # rows-only) unless deliberately registered without one
    no_oracle = [n for n in window if n not in REG.get_oracles()]
    assert not no_oracle, no_oracle


def test_registry_reorders_on_equal_count_swap():
    """Replacing one registered query with another (same total count)
    must still trigger a reorder — the staleness key is the name SET,
    not the count (ADVICE r5 #5)."""
    REG._ensure_loaded()
    REG._reorder_if_stale()
    names = list(REG.QUERIES)
    # a victim outside _PRIORITY_ORDER: removing a priority name is a
    # loud error by design, which is not what this test exercises
    victim = next(
        n for n in reversed(names) if n not in REG._PRIORITY_ORDER
    )
    fn = REG.QUERIES.pop(victim)
    sql = REG.ORACLES.pop(victim, None)
    try:
        REG.QUERIES["zz_swapped_in"] = fn
        REG.ORACLES["zz_swapped_in"] = sql or "SELECT 1 AS one"
        assert len(REG.QUERIES) == len(names)  # equal-count swap
        got = list(REG.get_queries())
        # the swapped-in name must be placed by the (recomputed) order,
        # i.e. a reorder ran: the ordered-key now matches the new set
        assert REG._ORDERED_KEY == frozenset(REG.QUERIES)
        assert "zz_swapped_in" in got and victim not in got
    finally:
        REG.QUERIES.pop("zz_swapped_in", None)
        REG.ORACLES.pop("zz_swapped_in", None)
        REG.QUERIES[victim] = fn
        if sql is not None:
            REG.ORACLES[victim] = sql
        REG._reorder_if_stale()

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


R11_NEW = [
    # the 13 round-11-new queries (zero driver evidence; the
    # incremental-components twin, the certified quantile maintenance,
    # BM25-served-from-state, the range-bucketed curriculum order, the
    # eval-metrics maintenance twin and the canonical view served from
    # maintained labels landed late in the round; the KMV bottom-k
    # distinct sketch, its maintenance twin and the per-stratum
    # grouped sample, the z-order layout maintenance twin and the
    # Bloom-prefilter decontamination landed in the round-11
    # continuation)
    "kmv_shingle_sample",
    "streaming_kmv",
    "grouped_kmv_sample",
    "streaming_zorder",
    "bloom_decontaminate",
    "streaming_components",
    "streaming_quantiles",
    "streaming_lexical_stats",
    "streaming_bm25_serve",
    "curriculum_order",
    "streaming_eval_metrics",
    "streaming_canonicalize",
    "chunk_dedup_overlap_reconstruct",
]

# the only names allowed to lack both an r10 driver row AND an r11
# window slot (the registry rotation note documents each: three are
# bench-exercised at sf0.1 every round; the 30 r9-green names are the
# documented deferral, first in line for r12; all re-validated by the
# full local gate every round)
R11_ROTATED_OUT = {
    "coarse_to_fine_retrieval",
    "rq_beam_search",
    "rq_encode_two_level",
    "augment_spans",
    "beam_constrained",
    "brand_set_ops",
    "code_prefix_members",
    "code_token_arith",
    "corpus_sample_remap",
    "customer_order_rollup",
    "customer_order_running_stats",
    "customers_without_orders",
    "decontaminate_eval",
    "doc2query_expand",
    "doc_fingerprints",
    "domain_mix_sample",
    "embed_determinism",
    "eval_all_codes",
    "events_asof_attribution",
    "events_cohort_retention",
    "events_funnel_stages",
    "events_json_extract",
    "image_resize",
    "media_decode_stats",
    "nation_revenue",
    "pq_ivf_recall_curve",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "rq_assign_topr",
    "sessionize_events",
    "streaming_event_window_counts",
    "text_quality_stats",
    "video_frame_sample",
    # displaced from tier 3 by the late-r11 streaming_components,
    # streaming_quantiles and streaming_bm25_serve
    "multi_assign_recall",
    "events_hypertable_rollup",
    "opq_encode_reconstruct",
    "knn_topk_ip",
    "knn_topk_cosine",
    "ann_lsh_topk",
    # displaced from tier 3 by the r11-continuation kmv_shingle_sample,
    # streaming_kmv, grouped_kmv_sample, streaming_zorder and
    # bloom_decontaminate
    "ensemble_grid",
    "ann_ivf_topk",
    "ensemble_fuse",
    "retrieval_eval_metrics",
    "global_shuffle_blocks",
}


def test_driver_window_invariants():
    """The driver's correctness evidence covers exactly the first 50
    registered queries, so the priority window must (a) hold exactly 50
    names, (b) name only registered queries, (c) contain every query
    that has never received a driver row (or whose plan changed) —
    this round, the R11_NEW cohort — and (d) every name with no r10
    driver row except the documented rotations (r10-green names are
    1-round-stale and allowed out). A drifted window silently starves
    new queries of evidence."""
    import json
    import os

    REG._ensure_loaded()
    assert len(REG._PRIORITY_ORDER) == 50
    assert len(set(REG._PRIORITY_ORDER)) == 50
    window = list(REG.get_queries())[:50]
    assert set(window) == set(REG._PRIORITY_ORDER)
    missing = [n for n in R11_NEW if n not in window]
    assert not missing, f"zero-evidence queries outside the window: {missing}"
    r10 = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r10.json"
    )
    if os.path.exists(r10):
        with open(r10, encoding="utf-8") as fh:
            r10_names = set(json.load(fh))
        stale = [
            n
            for n in REG.get_queries()
            if n not in r10_names
            and n not in window
            and n not in R11_ROTATED_OUT
            and n not in R11_NEW
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

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


# Round-14 policy (changed-plan-first — see plans/registry.py): the 17
# queries whose pinned plan changed in the r13 optimization pass but
# which were outside the r13 driver window MUST hold r14 window slots.
R14_MANDATED = [
    "bloom_decontaminate",
    "decontaminate_eval",
    "chunk_dedup_overlap",
    "chunk_dedup_overlap_reconstruct",
    "curriculum_order",
    "dedup_exact",
    "dedup_ngram_dfcut",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_canonicalize",
    "bm25_search",
    "corpus_prep_pipeline",
    "doc_fingerprints",
    "line_boilerplate_strip",
    "ngram_lm_quality",
    "text_redact_pii",
    "tokenize_padded",
]

R14_ROTATED_OUT = {
    # bench-exercised at sf0.1 every round, never windowed
    "coarse_to_fine_retrieval",
    "rq_beam_search",
    "rq_encode_two_level",
    # r11-green interop roundtrips displaced by the 3 tier-1
    # names not in the r11 cohort; kernels covered in-window by
    # tsv_corpus_roundtrip / wds_shards_append (see registry.py)
    "tsv_queries_roundtrip",
    "tsv_run_roundtrip",
    "wds_shards_roundtrip",
    # the 46 r12-green names — freshest evidence outside the
    # window, rotated out by the changed-plan-first policy
    "ann_ivf_topk",
    "ann_lsh_topk",
    "augment_spans",
    "beam_constrained",
    "brand_set_ops",
    "code_prefix_members",
    "code_token_arith",
    "corpus_sample_remap",
    "customer_order_rollup",
    "customer_order_running_stats",
    "customers_without_orders",
    "dedup_embedding_cosine",
    "doc2query_expand",
    "domain_mix_sample",
    "embed_determinism",
    "ensemble_fuse",
    "ensemble_grid",
    "eval_all_codes",
    "events_asof_attribution",
    "events_cohort_retention",
    "events_funnel_stages",
    "events_hypertable_rollup",
    "events_json_extract",
    "global_shuffle_blocks",
    "image_resize",
    "knn_topk_cosine",
    "knn_topk_ip",
    "media_decode_stats",
    "multi_assign_recall",
    "nation_revenue",
    "opq_encode_reconstruct",
    "pq_ivf_recall_curve",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "retrieval_eval_metrics",
    "rq_assign_topr",
    "semantic_dedup",
    "sessionize_events",
    "streaming_bloom_decontaminate",
    "streaming_curriculum",
    "streaming_event_window_counts",
    "streaming_grouped_kmv",
    "streaming_heavy_hitters",
    "streaming_semdedup",
    "text_quality_stats",
    "video_frame_sample",
}


def test_driver_window_invariants():
    """The driver's correctness evidence covers exactly the first 50
    registered queries, so the priority window must (a) hold exactly 50
    names, (b) name only registered queries, (c) contain every query
    that has never received a driver row (or whose plan changed) —
    this round, the R14_MANDATED cohort — and (d) every name with no
    r13 driver row except the documented rotations (r12-green names
    are the freshest outside the window and allowed out). A drifted
    window silently starves changed queries of evidence."""
    import json
    import os

    REG._ensure_loaded()
    assert len(REG._PRIORITY_ORDER) == 50
    assert len(set(REG._PRIORITY_ORDER)) == 50
    window = list(REG.get_queries())[:50]
    assert set(window) == set(REG._PRIORITY_ORDER)
    missing = [n for n in R14_MANDATED if n not in window]
    assert not missing, f"plan-changed queries outside the window: {missing}"
    r13 = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r13.json"
    )
    if os.path.exists(r13):
        with open(r13, encoding="utf-8") as fh:
            r13_names = set(json.load(fh))
        stale = [
            n
            for n in REG.get_queries()
            if n not in r13_names
            and n not in window
            and n not in R14_ROTATED_OUT
            and n not in R14_MANDATED
        ]
        assert not stale, f"undocumented stale evidence outside the window: {stale}"
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

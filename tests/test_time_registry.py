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


R13_NEW = [
    # the 3 round-13-new queries (zero driver evidence): mixture
    # weights re-raked from maintained cell-count partials, the
    # token-budget fill served from the curriculum store, and the
    # guarded SemDeDup path
    "streaming_raking",
    "streaming_budget_fill",
    # the guarded SemDeDup path gate-pinned against the exact oracle
    "semantic_dedup_banded",
    # r12-green names whose CONTRACT changed in r13 and need driver
    # evidence on the new form: the budget fill's plan moved to the
    # grouped bucketed prefix sum (oracle unchanged); the raking
    # oracle's target cast gained FLOOR to match the kernel's
    # truncation — rationale per name in plans/registry.py
    "token_budget_mixture",
    "mixture_raking_weights",
]

# the only names allowed to lack both an r12 driver row AND an r13
# window slot (the registry rotation note documents each: three are
# bench-exercised at sf0.1 every round; the 50 r11-green names are
# 2-round-stale and first in line for r14; all re-validated by the
# full local gate every round)
R13_ROTATED_OUT = {
    "coarse_to_fine_retrieval",
    # displaced from tier 3 by semantic_dedup_banded; keeps standing
    # sf1 scale-tier bench evidence every round (see registry.py)
    "chunk_dedup_overlap",
    "rq_beam_search",
    "rq_encode_two_level",
    "ann_adc_topk",
    "bloom_decontaminate",
    "bm25_search",
    "bucketed_join_rollup",
    "chunk_dedup_overlap_reconstruct",
    "cluster_projection",
    "complement_qg10",
    "corpus_prep_pipeline",
    "curriculum_order",
    "dataset_split",
    "dedup_canonicalize",
    "dedup_components",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_dfcut",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_query_sets",
    "events_value_winsorize",
    "grouped_kmv_sample",
    "inverse_answer_index",
    "jsonl_roundtrip",
    "kmv_shingle_sample",
    "line_boilerplate_strip",
    "media_meta_stats",
    "negatives_cluster",
    "negatives_notclus",
    "ngram_lm_quality",
    "nq_hit_test",
    "rq_assign_nearest",
    "rq_centroids_label",
    "rq_ema_step",
    "rq_kmeans_invariant",
    "sessionize_events_window",
    "stratified_sample_exact",
    "streaming_bm25_serve",
    "streaming_canonicalize",
    "streaming_components",
    "streaming_eval_metrics",
    "streaming_kmv",
    "streaming_lexical_stats",
    "streaming_quantiles",
    "streaming_zorder",
    "text_redact_pii",
    "tokenize_padded",
    "tsv_queries_roundtrip",
    "tsv_run_roundtrip",
    "wds_shards_roundtrip",
    "weighted_sample_topk",
    "zorder_box_scan",
}


def test_driver_window_invariants():
    """The driver's correctness evidence covers exactly the first 50
    registered queries, so the priority window must (a) hold exactly 50
    names, (b) name only registered queries, (c) contain every query
    that has never received a driver row (or whose plan changed) —
    this round, the R13_NEW cohort — and (d) every name with no r12
    driver row except the documented rotations (r11-green names are
    2-round-stale and allowed out). A drifted window silently starves
    new queries of evidence."""
    import json
    import os

    REG._ensure_loaded()
    assert len(REG._PRIORITY_ORDER) == 50
    assert len(set(REG._PRIORITY_ORDER)) == 50
    window = list(REG.get_queries())[:50]
    assert set(window) == set(REG._PRIORITY_ORDER)
    missing = [n for n in R13_NEW if n not in window]
    assert not missing, f"zero-evidence queries outside the window: {missing}"
    r12 = os.path.join(
        os.path.dirname(__file__), "..", "CORRECTNESS_r12.json"
    )
    if os.path.exists(r12):
        with open(r12, encoding="utf-8") as fh:
            r12_names = set(json.load(fh))
        stale = [
            n
            for n in REG.get_queries()
            if n not in r12_names
            and n not in window
            and n not in R13_ROTATED_OUT
            and n not in R13_NEW
        ]
        assert not stale, f"undocumented 3-round-stale evidence: {stale}"
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

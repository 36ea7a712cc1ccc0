"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the operators that dominate real MEVI workloads (SURVEY
§3): exact ANN top-k, the RQ encode, the beam, coarse-to-fine, ensemble
fusion, metrics, plus the heaviest relational shapes (q1/q3 aggregation
and join) and the pipeline dedup ops when present.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "nation_revenue",
    "sessionize_events",
    "knn_topk_ip",
    "retrieval_eval_metrics",
    "rq_encode_two_level",
    "rq_beam_search",
    "coarse_to_fine_retrieval",
    "ensemble_fuse",
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_quality_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from mevi_spark.plans import registry
    from mevi_spark.session import get_spark

    spark = get_spark("mevi-bench")
    qs = registry.get_queries()

    # warm the JVM + Python-worker/Arrow paths once so timings measure
    # the plan, not init (codegen JIT, parquet footer cache, worker fork)
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    from mevi_spark.plans.retrieval import clear_session_caches

    clear_session_caches(spark)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()

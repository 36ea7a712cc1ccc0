"""Plan-quality sweep over EVERY registered query.

``tests/test_plans.py`` locks the hot-path plan properties as
regressions; this tool audits the WHOLE registry so a scale-killer in a
rarely-benched query can't hide. For each query it builds the DataFrame
(no execution beyond what the query's own construction does) and
inspects the physical plan for:

* ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — unbounded join
  strategies. Queries whose lineage contains a SANCTIONED bounded
  crossJoin (K-row codebook fan-outs, the beam's per-level expansion,
  diagnostic all-code enumeration, grid configs) are listed in
  ``BOUNDED_CROSS_OK`` with the bounding argument;
* Exchange count — informational (shuffles are fine; the count makes
  regressions visible round over round);
* whole-stage codegen presence — informational.

Usage::

    python tools/plan_audit.py [sf_dir]        # default sf0.001
    python tools/plan_audit.py sf_dir name...  # filter by substring

Exit code 1 if any UNsanctioned unbounded join appears.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# lineages where a cross product is BOUNDED by construction: one side is
# a K-row (or K^2 / grid-sized) literal/codebook frame, never corpus²
BOUNDED_CROSS_OK = {
    "rq_beam_search": "per-level beam fan-out vs K-row codebook",
    "beam_constrained": "per-level beam fan-out vs K-row codebook",
    "eval_all_codes": "diagnostic K^M enumeration (documented)",
    "ensemble_grid": "config-grid crossJoin (dozens of rows)",
    "coarse_to_fine_retrieval": "beam fan-out vs K-row codebook upstream",
    "retrieval_eval_metrics": "run derivation shares the beam lineage",
    "ensemble_fuse": "run derivation shares the beam lineage",
    "nq_hit_test": "run derivation shares the beam lineage",
    "doc_query_sets": "run derivation shares the beam lineage",
    "rq_kmeans_invariant": "MLlib KMeans broadcast of K centers",
    "negatives_cluster": "cluster-mate sampling joins the K-row map",
    "negatives_notclus": "pool pre-sampled to O(need) before cross",
    "ann_ivf_topk": "probe vs K-row centroid frame (impl='join' path)",
    "ann_adc_topk": "LUT build vs K-row codebook",
    "cluster_projection": "positional projection vs K-row grid",
    "text_tfidf_topterms": "crossJoin with the SINGLE-ROW corpus count",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]

    from mevi_spark.plans import registry
    from mevi_spark.session import get_spark

    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    qs = registry.get_queries()

    report, bad = [], []
    for name, fn in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            report.append({"query": name, "error": str(exc)[:200]})
            bad.append(name)
            continue
        cart = "CartesianProduct" in plan
        bnlj = "BroadcastNestedLoopJoin" in plan
        entry = {
            "query": name,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "codegen": "WholeStageCodegen" in plan,
            "cartesian": cart,
            "bnlj": bnlj,
        }
        if (cart or bnlj) and name not in BOUNDED_CROSS_OK:
            entry["verdict"] = "UNBOUNDED-JOIN"
            bad.append(name)
        elif cart or bnlj:
            entry["verdict"] = f"bounded: {BOUNDED_CROSS_OK[name]}"
        report.append(entry)

    print(json.dumps(report, indent=1))
    n_flagged = len(bad)
    print(
        f"\n{len(report)} queries audited, {n_flagged} flagged"
        + (f": {bad}" if bad else ""),
        file=sys.stderr,
    )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

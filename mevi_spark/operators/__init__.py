from mevi_spark.operators.metrics import evaluate_run, ranks_of_ground_truth
from mevi_spark.operators.topk import exact_topk_join, topk_per_group

__all__ = [
    "evaluate_run",
    "ranks_of_ground_truth",
    "exact_topk_join",
    "topk_per_group",
]

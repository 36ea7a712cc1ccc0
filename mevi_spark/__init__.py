"""mevi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the MEVI reference (HugoZHL/MEVI,
NeurIPS 2023 "Model-enhanced Vector Index").

Design stance (SURVEY.md §7.1): a library of pure ``DataFrame -> DataFrame``
operators composed into pipelines. Vectors are ``array<float>`` columns,
codes are ``array<int>``, every artifact is a DataFrame persisted as
Parquet. Catalyst does the optimizing; we only add what Spark lacks
(similarity joins, residual quantization, rank-fusion, retrieval metrics,
large-scale dedup / text-analysis operators).
"""

__version__ = "0.1.0"

from mevi_spark.session import get_spark

__all__ = ["get_spark", "__version__"]

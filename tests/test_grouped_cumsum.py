"""grouped_cumsum_with_bounds: exactness vs the naive per-group
window, boundary invariance, and the degenerate shapes."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from mevi_spark.plans.pipeline_ops import grouped_cumsum_with_bounds


def _frame(spark):
    import random

    rng = random.Random(11)
    rows = [
        (i, ["en", "fr", "de"][i % 3], round(rng.random(), 3), rng.randint(1, 50))
        for i in range(200)
    ]
    # planted score ties across groups and within a group
    rows += [(200, "en", 0.5, 7), (201, "en", 0.5, 9), (202, "fr", 0.5, 3)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, score double, n_tok long"
    )


def _naive(df):
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return {
        (r["lang"], r["doc_id"]): r["cum"]
        for r in df.withColumn("cum", F.sum("n_tok").over(w)).collect()
    }


def test_matches_naive_window_and_is_boundary_invariant(spark):
    df = _frame(spark)
    want = _naive(df)
    for bounds in ([0.25, 0.5, 0.75], [0.1], [], [0.5, 0.500001, 0.9]):
        got = {
            (r["lang"], r["doc_id"]): r["cum"]
            for r in grouped_cumsum_with_bounds(
                df, "lang", "score", ["doc_id"], "n_tok", bounds, "cum"
            ).collect()
        }
        assert got == want, bounds


def test_empty_frame(spark):
    df = _frame(spark).filter(F.lit(False))
    out = grouped_cumsum_with_bounds(
        df, "lang", "score", ["doc_id"], "n_tok", [0.5], "cum"
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "score", "n_tok", "cum"]


def test_rejects_fractional_weight(spark):
    import pytest

    df = _frame(spark).withColumn("w", F.col("n_tok").cast("double"))
    with pytest.raises(TypeError):
        grouped_cumsum_with_bounds(
            df, "lang", "score", ["doc_id"], "w", [0.5], "cum"
        )

"""SQ8 scalar quantization — int8-per-dimension embedding compression.

The third member of the vector-compression family next to RQ
(``operators/rq.py``) and ADC (``operators/ann.py``): where RQ stores
M codebook ids per vector, SQ8 stores one byte per dimension, encoded
against per-dimension [min, max] ranges trained over the corpus
(the faiss ``SQ8`` / Lucene int8-HNSW storage format; the reference
keeps raw fp32 memmaps — ``MEVI/tools/build_memmap.py`` — so SQ8 is
the 4× cheaper drop-in for that store).

Scale shape:

* **train** is ONE partial-aggregatable aggregation — ``min(v[i])``,
  ``max(v[i])`` per dimension as plain agg expressions (no explode
  fan-out, no shuffle beyond the single 1-row agg); the result is
  2·dim doubles, driver-bounded.
* **encode / reconstruct** are map-only column expressions over the
  trained ranges inlined as literal arrays — zero joins, zero
  shuffles, whole-stage codegen end to end. At 100 TB the encode is
  embarrassingly parallel over parquet partitions; the int codes
  column would be packed to ``binary`` at write time (1 byte/dim).

Cross-engine determinism: encode/decode arithmetic is plain float64
with the operation order stated in the expressions below and mirrored
by the DuckDB oracle; ``round()`` ties go away from zero in both
engines (Spark HALF_UP on positives; codes are in [0, 255]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mevi_spark.functions.vector import sql_double_array


def sq8_train(
    embeddings: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] over the corpus as ONE aggregation.

    Returns ``(mins, maxs)`` as Python lists (2·dim doubles — the
    bounded driver artifact, same contract as the staged RQ codebook).
    """
    if dim is None:
        probe = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        if probe is None:
            raise ValueError("sq8_train: embeddings frame is empty")
        dim = probe["d"]
    v = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.element_at(v, i + 1)).alias(f"mn{i}"))
        aggs.append(F.max(F.element_at(v, i + 1)).alias(f"mx{i}"))
    row = embeddings.agg(*aggs).first()
    if row["mn0"] is None:
        raise ValueError("sq8_train: embeddings frame is empty")
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _lit_arr(vals: list[float]) -> Column:
    return F.expr(sql_double_array(vals))


def sq8_code_expr(
    val: Column, mn: Column, mx: Column
) -> Column:
    """One component's code: ``least(greatest(round(255*(x-mn)/(mx-mn)),
    0), 255)`` with the degenerate ``mx == mn`` dimension pinned to 0.
    The op order matches the oracle SQL verbatim."""
    q = F.round(F.lit(255.0) * (val - mn) / (mx - mn))
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(F.least(F.greatest(q, F.lit(0.0)), F.lit(255.0)))
        .cast("int")
    )


def sq8_recon_expr(q: Column, mn: Column, mx: Column) -> Column:
    """Dequantized component: ``mn + q*(mx-mn)/255`` (oracle-verbatim
    op order)."""
    return mn + q.cast("double") * (mx - mn) / F.lit(255.0)


def sq8_encode(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    vec_col: str = "embedding",
    out_col: str = "q",
) -> DataFrame:
    """Map-only encode: ``array<int>`` codes (storage layer packs to
    ``binary``; ints keep the column oracle-comparable)."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    v = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(1), F.lit(len(mins)))
    code = F.transform(
        idx,
        lambda i: sq8_code_expr(
            F.element_at(v, i), F.element_at(mn, i), F.element_at(mx, i)
        ),
    )
    return df.withColumn(out_col, code)


def sq8_reconstruct(
    df: DataFrame,
    mins: list[float],
    maxs: list[float],
    code_col: str = "q",
    out_col: str = "rec",
) -> DataFrame:
    """Map-only decode of :func:`sq8_encode`'s codes."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    q = F.col(code_col)
    idx = F.sequence(F.lit(1), F.lit(len(mins)))
    rec = F.transform(
        idx,
        lambda i: sq8_recon_expr(
            F.element_at(q, i), F.element_at(mn, i), F.element_at(mx, i)
        ),
    )
    return df.withColumn(out_col, rec)

"""Product quantization (PQ) — subspace-split vector compression.

The fourth member of the vector-compression family: RQ
(``operators/rq.py``, residual levels over the FULL dimension), SQ8
(``operators/sq.py``, one byte per dimension), ADC scans
(``operators/ann.py``) — and PQ, which splits the dimension into M
independent subspaces and quantizes each against its own K-entry
codebook (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — the codebook layout behind faiss ``IVFxx,PQy``,
the de-facto 100-TB-scale ANN storage format). The reference quantizes
with residual levels only (``MEVI/pq.py:281-305``); PQ is its
orthogonal sibling: M·log2(K) bits per vector, and asymmetric-distance
scoring needs only an M-entry code tuple per document plus a per-query
M×K lookup table — the scan never touches a document vector.

Scale shape:

* **encode** — subvectors join the (M·K)-row codebook BROADCAST, then
  ONE partial-aggregatable argmin shuffle keyed (vec_id, m) whose
  map-side combine reduces to n·M rows (an int code each). Distances
  use the expanded ``‖c‖² − 2·v·c`` form (the ‖v‖² term is constant
  per argmin) with the same left-to-right folds as the DuckDB oracle,
  so assignments match bit-for-bit.
* **ADC batch scan** — the per-query LUT (M·K rounded-e6 partial
  products) is BROADCAST; scoring reads the n·M code rows, never a
  float vector, and partial-aggregates to n·Q scores. The brute-force
  form scores every doc against every query (that is what a batch ADC
  scan IS); at scale it composes with the IVF probe pruning of
  ``operators/ann.py`` exactly as faiss IVF-PQ does.

Cross-engine determinism: LUT partials are rounded to e6 integers
BEFORE the per-(query, doc) sum, so the M-way addition is exact
integer arithmetic in both engines (the run-file ``scores_sum_e6``
trick); ranking ties break on ascending id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mevi_spark.functions.vector import dot


def split_subvectors(
    emb: DataFrame,
    m_subs: int,
    sub_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Long form ``(id_col, m, sub)``: the vector split into ``m_subs``
    contiguous ``sub_dim``-wide slices (map-only)."""
    v = F.col(vec_col).cast("array<double>")
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m_subs - 1)),
        lambda m: F.struct(
            m.cast("int").alias("m"),
            F.slice(v, m * sub_dim + 1, sub_dim).alias("sub"),
        ),
    )
    return emb.select(id_col, F.explode(subs).alias("_s")).select(
        id_col, F.col("_s.m").alias("m"), F.col("_s.sub").alias("sub")
    )


def pq_codebook_from_centroids(
    cents: DataFrame, m_subs: int, sub_dim: int
) -> DataFrame:
    """Slice full-dimension ``(code, centroid)`` rows into the PQ
    codebook ``(m, code, c)`` — M·K rows. Reusing the deterministic
    label-mean centroids (A5) as the per-subspace codebooks keeps the
    whole PQ path closed-form and oracle-checkable; a production build
    would swap in per-subspace k-means (``operators/rq.py``'s trainer
    on each slice) without touching encode/scan."""
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(m_subs - 1)),
        lambda m: F.struct(
            m.cast("int").alias("m"),
            F.slice(F.col("centroid"), m * sub_dim + 1, sub_dim).alias("c"),
        ),
    )
    return cents.select("code", F.explode(subs).alias("_s")).select(
        F.col("_s.m").alias("m"), "code", F.col("_s.c").alias("c")
    )


def pq_encode(
    subvecs: DataFrame, codebook: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Assign each subvector to its nearest codebook entry →
    ``(id_col, m, code, err_e6)`` with ``err_e6`` the rounded-e6
    squared L2 of the subspace residual. One broadcast join + one
    (id, m)-keyed argmin aggregation (module docstring)."""
    d = dot("c", "c") - 2 * dot("sub", "c")
    scored = subvecs.join(F.broadcast(codebook), "m").select(
        id_col,
        "m",
        F.struct(
            d.alias("d"),
            F.col("code").alias("code"),
            # carry ‖v‖² so err = ‖v‖² + d reconstructs post-argmin
            dot("sub", "sub").alias("vv"),
        ).alias("_cand"),
    )
    best = scored.groupBy(id_col, "m").agg(F.min("_cand").alias("_b"))
    return best.select(
        id_col,
        "m",
        F.col("_b.code").alias("code"),
        F.round((F.col("_b.vv") + F.col("_b.d")) * 1e6)
        .cast("long")
        .alias("err_e6"),
    )


def adc_lut(
    queries_sub: DataFrame, codebook: DataFrame, qid_col: str = "qid"
) -> DataFrame:
    """Per-query lookup table ``(qid, m, code, p_e6)`` where ``p_e6``
    is the rounded-e6 inner product of the query subvector with the
    codebook entry — Q·M·K rows, the broadcast side of the scan."""
    return queries_sub.join(F.broadcast(codebook), "m").select(
        qid_col,
        "m",
        "code",
        F.round(dot("sub", "c") * 1e6).cast("long").alias("p_e6"),
    )


def adc_scan_scores(
    codes: DataFrame, lut: DataFrame, id_col: str = "vec_id",
    qid_col: str = "qid",
) -> DataFrame:
    """Batch asymmetric-distance scores ``(qid, id, score_e6)`` from
    code tuples only: join codes to the BROADCAST LUT on (m, code),
    integer-sum the M partials per (query, doc)."""
    return (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy(qid_col, id_col)
        .agg(F.sum("p_e6").alias("score_e6"))
    )

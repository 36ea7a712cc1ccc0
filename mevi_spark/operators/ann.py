"""Approximate nearest-neighbor top-k join (J4 approx — SURVEY §2.3,
§7.3 M5).

The reference does ANN with a faiss ``HNSW256`` inner-product index
(``MEVI/faiss_search.py:13-21``, config ``README.md:109-117``). Spark has
no HNSW; the Spark-native equivalent of an ANN *join* between two large
distributed sides is locality-sensitive-hash bucketing:

1. hash every vector (both sides) into ``bands`` bucket keys, each built
   from ``n_planes/bands`` sign bits of projections onto deterministic
   ±1 hyperplanes (random-hyperplane LSH, collision probability
   ``(1 − θ/π)^bits`` per band);
2. equi-join queries×docs on ``(band, key)`` — a plain shuffle join that
   never broadcasts or collects either side, so BOTH sides scale to
   arbitrary row counts (unlike :func:`~mevi_spark.operators.topk.
   exact_topk_join`, which streams the corpus but chunks query vectors
   through the driver);
3. exact-score the surviving candidate pairs only, then per-query
   window top-k.

Inner-product search is reduced to angular search with the iptol2
augmentation (F6, ``MEVI/pq.py:82-119``): docs get an extra coordinate
``sqrt(Φ − ‖v‖²)`` (Φ ≥ max ‖v‖²), queries get ``0``. Every augmented
doc then has norm ``√Φ``, so angular similarity between augmented
vectors ranks documents exactly as raw inner product does — which is
what lets a cosine-family LSH answer MIPS queries.

Scale notes (100 TB): the only shuffle is the ``(band, key)`` equi-join
(plus the top-k window on candidates); bucket skew is bounded by
``n_planes/bands`` (more bits → smaller buckets → fewer, better
candidates; more bands → higher recall). Φ is a 1-row aggregate, the
single driver-side scalar. AQE's skew-join handles residual hot buckets.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from mevi_spark.functions.vector import (
    cosine,
    dot,
    iptol2_doc,
    iptol2_query,
    sql_double_array,
    sql_ident,
)
from mevi_spark.operators.dedup import _sign_key, deterministic_planes


def _band_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    key_vec: F.Column,
    planes: list[list[int]],
    bands: int,
) -> DataFrame:
    """Explode one side into ``(id, vec, band, key)`` rows — one row per
    band, keyed by that band's sign bits."""
    per_band = len(planes) // bands
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_vec"),
        *[
            _sign_key(
                key_vec, planes[b * per_band : (b + 1) * per_band]
            ).alias(f"_b{b}")
            for b in range(bands)
        ],
    )
    return keyed.select(
        "_id",
        "_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"_b{b}").alias("key")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bk"),
    ).select("_id", "_vec", F.col("_bk.band").alias("_band"), F.col("_bk.key").alias("_key"))


def lsh_topk_join(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    metric: str = "ip",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    doc_id: str = "doc_id",
    doc_vec: str = "doc_vec",
    n_planes: int = 16,
    bands: int = 8,
    phi: float | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Approximate per-query top-k ``(query_id, doc_id, score, rank)``.

    ``metric`` ∈ {'ip', 'cosine'}. For 'ip' the LSH keys are computed on
    iptol2-augmented vectors (see module docstring) while the reported
    score stays the raw inner product; for 'cosine' keys are on the raw
    vectors. ``phi`` overrides the Φ aggregate (pass it when the corpus
    max-norm is known, e.g. unit-normalized embeddings → 1.0).

    Recall is tuned by ``(n_planes, bands)``: ``bands`` keys per vector,
    ``n_planes/bands`` sign bits each. A doc is a candidate if it shares
    ≥ 1 band key with the query — exactly faiss's bucketed-probe shape,
    re-expressed as a relational equi-join Catalyst can shuffle-plan.
    """
    if metric not in ("ip", "cosine"):
        raise ValueError(f"metric must be 'ip' or 'cosine', got {metric!r}")
    if n_planes % bands:
        raise ValueError("n_planes must be divisible by bands")

    # pass dim when known (it is, for any managed corpus) — the probe
    # is one tiny extra job per call otherwise (VERDICT r5 #6)
    if dim is None:
        probe = docs.select(doc_vec).first()
        if probe is None or probe[0] is None:
            raise ValueError(
                "lsh_topk_join: docs is empty (or its first vector is "
                "NULL) and dim was not given — pass dim explicitly"
            )
        dim = len(probe[0])
    if metric == "ip":
        if phi is None:
            phi = docs.agg(
                F.max(dot(doc_vec, doc_vec)).alias("phi")
            ).first()["phi"]
            if phi is None:
                raise ValueError(
                    "lsh_topk_join: cannot derive phi from an empty "
                    "docs frame — pass phi explicitly"
                )
        planes = deterministic_planes(dim + 1, n_planes)
        d_key = iptol2_doc(F.col(doc_vec).cast("array<double>"), F.lit(float(phi)))
        q_key = iptol2_query(F.col(query_vec).cast("array<double>"))
    else:
        planes = deterministic_planes(dim, n_planes)
        d_key = F.col(doc_vec).cast("array<double>")
        q_key = F.col(query_vec).cast("array<double>")

    q_rows = _band_rows(queries, query_id, query_vec, q_key, planes, bands)
    d_rows = _band_rows(docs, doc_id, doc_vec, d_key, planes, bands)

    cand = (
        q_rows.alias("q")
        .join(
            d_rows.alias("d"),
            (F.col("q._band") == F.col("d._band"))
            & (F.col("q._key") == F.col("d._key")),
        )
        .select(
            F.col("q._id").alias(query_id),
            F.col("d._id").alias(doc_id),
            F.col("q._vec").alias("_qv"),
            F.col("d._vec").alias("_dv"),
        )
        .dropDuplicates([query_id, doc_id])
    )

    score = (
        dot("_qv", "_dv") if metric == "ip" else cosine("_qv", "_dv")
    ).alias("score")
    w = Window.partitionBy(query_id).orderBy(
        F.desc("score"), F.asc(doc_id)
    )
    return (
        cand.select(query_id, doc_id, score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def probe_codes_expr(
    entries: list, query_vec: str, nprobe: int, metric: str = "ip"
):
    """Top-``nprobe`` coarse codes per query as ONE map-only literal
    expression (sorted struct array — zero shuffle, the same K·dim ≲
    64k expression-size bound as ``assign_nearest``). Shared by
    ``ivf_topk_join(impl='expr')`` and the PQ-IVF composition
    (``plans/retrieval.py::pq_ivf_adc_topk``). For cosine, centroids
    inline UNIT-normalized: dot(q, cent/‖cent‖) ranks identically to
    cosine(q, cent) (the query norm is constant per query), so the
    probe agrees with the scoring metric."""

    def _probe_vec(cent):
        if metric == "ip":
            return cent
        nrm = math.sqrt(sum(v * v for v in cent)) or 1.0
        return [v / nrm for v in cent]

    # SQL text, one parse — not hundreds of Column-API py4j round
    # trips (see sql_double_array); bit-exact literals
    cents_sql = ",".join(
        f"named_struct('cent',{sql_double_array(_probe_vec(cent))},"
        f"'c',{int(code)}L)"
        for code, cent, _cc in entries
    )
    qv_sql = f"cast({sql_ident(query_vec)} AS array<double>)"
    return F.expr(
        f"transform(slice(sort_array(transform(array({cents_sql}),"
        f" e -> named_struct('ns', -aggregate(zip_with({qv_sql},"
        f" e.cent, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x),"
        f"'c', e.c))), 1, {int(nprobe)}), e -> e.c)"
    )


def ivf_topk_join(
    queries: DataFrame,
    docs: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 3,
    metric: str = "ip",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    doc_id: str = "doc_id",
    doc_vec: str = "doc_vec",
    list_col: str = "code",
    score_col: str = "score",
    impl: str = "expr",
) -> DataFrame:
    """J4 approx, IVF flavor: probe the top-``nprobe`` coarse clusters
    per query, exact-score only their member docs.

    The faiss ``IndexIVF`` search shape the reference's coarse-to-fine
    path generalizes (probe = the M=1 beam, ``MEVI/main_models.py:
    3911-3991``), exposed here as a plain similarity-search operator
    over a pre-clustered corpus:

    * ``docs`` carries its inverted-list assignment in ``list_col`` —
      the IVF list structure IS the cluster-keyed corpus layout, so the
      candidate gather is an equi-join that partition-prunes when the
      corpus is written partitioned by ``list_col`` (same DPP story as
      the fine run);
    * ``impl='expr'`` ranks the K-row ``centroids`` per query as a
      **literal expression** (sorted struct array, map-only, zero
      shuffle — the same inlining as ``assign_nearest``, same K·dim ≲
      64k expression-size bound); ``impl='join'`` is the large-K
      fallback: broadcast crossJoin against the centroid frame + window
      top-``nprobe`` — no driver collect, shuffles the K-fanned query
      side only (queries × K rows, never corpus-sized);
    * per-query work is ``nprobe/K`` of the corpus instead of all of it
      — the scale knob faiss calls ``nprobe``.

    Deterministic: probe ties break on (−score, code); result ties on
    (−score, doc_id).
    """
    from mevi_spark.operators.rq import centroid_entries
    from mevi_spark.operators.topk import topk_per_group

    if metric not in ("ip", "cosine"):
        raise ValueError(f"metric must be 'ip' or 'cosine', got {metric!r}")
    if impl == "join":
        c = F.broadcast(
            centroids.select(F.col("code").alias(list_col), "centroid")
        )
        # probe with the SAME metric as scoring: an ip probe over
        # unnormalized centroids can rank clusters differently from the
        # cosine scoring metric and silently degrade recall
        probe_score = (
            dot(query_vec, "centroid") if metric == "ip"
            else cosine(query_vec, "centroid")
        )
        ranked = topk_per_group(
            queries.select(query_id, query_vec)
            .crossJoin(c)
            .select(
                query_id, query_vec, list_col,
                probe_score.alias("_ps"),
            ),
            [query_id], "_ps", nprobe, [list_col],
        )
        probed = ranked.select(query_id, query_vec, list_col)
    elif impl == "expr":
        entries = centroid_entries(centroids)
        probes = probe_codes_expr(entries, query_vec, nprobe, metric)
        probed = queries.select(
            query_id, query_vec, F.explode(probes).alias(list_col)
        )
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    cands = probed.join(
        docs.select(doc_id, doc_vec, list_col), list_col
    )
    score = {"ip": dot, "cosine": cosine}[metric](query_vec, doc_vec)
    scored = cands.select(query_id, doc_id, score.alias(score_col))
    return topk_per_group(scored, [query_id], score_col, k, [doc_id])


def adc_topk_join(
    queries: DataFrame,
    mapping: DataFrame,
    codebook: DataFrame,
    k: int,
    nprobe: int = 3,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    doc_id: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """IVF-ADC: approximate top-k over a QUANTIZED corpus — the scan
    reads only ``(doc_id, code_0, code_1)``, never a raw vector.

    The asymmetric-distance shape of faiss ``IndexIVFPQ.search`` (the
    quantized tier under the reference's HNSW/IVF configs,
    ``MEVI/faiss_search.py:13-21``; reconstruction scoring is F11,
    ``MEVI/pq.py:281-305``): per query, precompute one K-entry lookup
    table per RQ level — ``LUT_l[c] = <q, centroid_l[c]>`` — then a
    candidate's score is ``LUT_0[code_0] + LUT_1[code_1]`` (the
    inner product against the ADDITIVE reconstruction, decomposed so it
    never touches the doc vector). At 100 TB this is the memory story
    of quantized search: the per-doc payload joins/aggregates at ~2
    longs instead of dim floats, column pruning keeps the embedding
    column out of the scan entirely, and the probe restricts work to
    ``nprobe/K`` of the corpus with the same DPP-prunable ``code_0``
    equi-join as :func:`ivf_topk_join`.

    ``codebook`` is the two-level frame ``(level, code, centroid)``
    (:func:`~mevi_spark.operators.rq.rq_encode_seeded` output). LUTs
    and the probe are built as one SQL-text expression per level from
    the collected K-row codebook. Deterministic: probe ties (−ip,
    code); result ties (−score, doc_id). Score = sequential fold per
    level, added level-major — the same op order as the oracle's
    ``list_dot_product(q, c0) + list_dot_product(q, c1)``.
    """
    from mevi_spark.operators.rq import centroid_entries
    from mevi_spark.operators.topk import topk_per_group

    lvl = [
        centroid_entries(codebook.filter(F.col("level") == i))
        for i in (0, 1)
    ]
    for i, entries in enumerate(lvl):
        codes = [c for c, _, _ in entries]
        if codes != list(range(len(codes))):
            # element_at(LUT, code+1) indexes the LUT positionally;
            # non-dense codebooks would silently mis-score
            raise ValueError(
                f"ADC requires contiguous 0-based codes at level {i}, "
                f"got {codes[:8]}..."
            )
    qv_sql = f"cast({sql_ident(query_vec)} AS array<double>)"

    def _lut_sql(entries):
        dots = ",".join(
            f"aggregate(zip_with({qv_sql}, {sql_double_array(cent)},"
            f" (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            for _code, cent, _cc in entries
        )
        return f"array({dots})"

    probe_structs = ",".join(
        f"named_struct('ns', -element_at(_lut0, {i + 1}), 'c', {int(code)}L)"
        for i, (code, _cent, _cc) in enumerate(lvl[0])
    )
    q = queries.select(
        query_id,
        F.expr(_lut_sql(lvl[0])).alias("_lut0"),
        F.expr(_lut_sql(lvl[1])).alias("_lut1"),
    ).select(
        query_id,
        "_lut0",
        "_lut1",
        F.explode(
            F.expr(
                f"transform(slice(sort_array(array({probe_structs})),"
                f" 1, {int(nprobe)}), e -> e.c)"
            )
        ).alias("code_0"),
    )
    cands = q.join(mapping.select(doc_id, "code_0", "code_1"), "code_0")
    score = F.element_at("_lut0", F.col("code_0").cast("int") + 1) + (
        F.element_at("_lut1", F.col("code_1").cast("int") + 1)
    )
    scored = cands.select(query_id, doc_id, score.alias(score_col))
    return topk_per_group(scored, [query_id], score_col, k, [doc_id])

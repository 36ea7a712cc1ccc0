"""Per-level RQ beam search (U3/W5) — the coarse retrieval step.

Reference: the embedding-space RQ beam at ``MEVI/pq.py:613-713``:

* state per hypothesis: residual ``temp_embed = q − Σ chosen centroids``,
  running ``beam_score`` (init 1.0), code prefix;
* per level ``i``: similarity of the residual to each of the K level-``i``
  centroids (``compute_scores``, ``MEVI/pq.py:124-131``), softmaxed over
  the K codes (``:662``), multiplied into the beam score
  (``rq_topk_score='prod'``, ``:664-666``);
* top ``num_beams`` of the beam×K candidates (``:684-691``), then the
  chosen centroid is subtracted from the residual (``:697-701``; skipped
  at the last level).

Spark restatement: a driver loop of M (=levels, 2-4) iterations; the
beam DataFrame holds ≤ ``num_beams`` rows per query and is joined
against the **K-row** broadcast level codebook — the intermediate is
``num_beams × K`` rows per query. Nothing of size K^M is ever built or
broadcast (SURVEY §7.5.3 forbids materializing the flat-code table; the
round-1 flat centroid scan was exactly that mistake).

The softmax per hypothesis is two window passes (max, then sum of
exp-shifted) over the (query, prefix) partition — all JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from mevi_spark.functions.vector import (
    code_flat,
    dot,
    neg_l2_score,
    sql_json_literal,
)
from mevi_spark.operators.topk import topk_per_group

_METRICS = {"ip": dot, "neg_l2": neg_l2_score}


def rq_beam_search(
    queries: DataFrame,
    codebook: DataFrame | None,
    levels: int,
    num_beams: int,
    k_per_level: int,
    metric: str = "ip",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    valid_codes: DataFrame | None = None,
    entries_by_level: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """U3: top-``num_beams`` RQ codes per query with beam probabilities.

    ``codebook``: ``(level, code, centroid)`` — M×K rows, always
    broadcast. Returns ``(query_id, code: array<int>, code_flat,
    beam_score, beam_rank)`` with rank 1..num_beams per query,
    deterministic tie-break on the flattened prefix index (the order of
    ``torch.topk`` over the beam×K flat dimension, ``MEVI/pq.py:684``).

    ``valid_codes`` is the U4 tree constraint: ``(level, parent_flat,
    code)`` rows enumerating the decode trie's edges (``parent_flat`` =
    the radix-K flat index of the prefix, 0 for the empty prefix).
    Matching the reference's trie mask (``MEVI/transformers/
    generation_utils.py:803-819``), invalid candidates are dropped
    AFTER the per-hypothesis softmax — probabilities are computed over
    all K codes, not renormalized over the valid set (the mask adds
    −inf to already-log_softmaxed scores). ``None`` = every code valid
    at every level (the RQ "share_sons" tree,
    ``MEVI/main_models.py:1700-1706``).

    ``entries_by_level`` supplies the already-collected codebook —
    ``{level: [(code, centroid), ...]}`` — so callers holding the
    process-cached entries (``plans/retrieval.py::_chain_state``) skip
    the K-row collect job this function otherwise runs (``codebook``
    may then be ``None`` — the frame is not touched at all, not even
    its scan's file-listing job); the literal expressions built from
    either source are identical.
    """
    if metric not in _METRICS:
        raise ValueError(f"unknown metric: {metric!r}")
    # Collect the codebook once and inline each level as literal arrays
    # (code-ascending): the codebook is M×K rows — broadcast-sized by
    # contract — and the literal form turns the per-hypothesis softmax
    # into map-side array expressions. The former shape (broadcast
    # crossJoin + two window passes per level) paid 2 exchanges per
    # level just to aggregate over the K codes of each hypothesis; here
    # scores/softmax/normalization happen inside the row and the only
    # shuffle per level is the per-query top-``num_beams`` window. The
    # float ops are the same sequences (zip_with product fold for the
    # score, exp-shifted-by-max softmax); the denominator folds the K
    # exps left-to-right in code order — a deterministic order where
    # the window SUM had an engine-chosen one.
    if entries_by_level is not None:
        by_level = entries_by_level
    else:
        if codebook is None:
            raise ValueError("need codebook rows or entries_by_level")
        by_level = {}
        for r in codebook.select("level", "code", "centroid").collect():
            by_level.setdefault(int(r["level"]), []).append(
                (int(r["code"]), [float(v) for v in r["centroid"]])
            )

    beam = queries.select(
        F.col(query_id).alias("query_id"),
        F.array().cast("array<int>").alias("prefix"),
        F.lit(1.0).alias("beam_score"),
        F.col(query_vec).cast("array<double>").alias("resid"),
        F.lit(1).alias("beam_rank"),  # the root hypothesis's position
    )
    for lvl in range(levels):
        entries = sorted(by_level.get(lvl, []))
        if not entries:
            raise ValueError(f"codebook has no level-{lvl} rows")
        # one constant array<struct<code,cent>> per level, staged as a
        # real column so (a) CollapseProject keeps each non-cheap array
        # expression single-execution (shingle_frame discipline) and
        # (b) via the from_json form the constant is a 2-node tree at
        # analysis time — the ``array(named_struct(...))`` text form
        # made every later plan-construction op re-pay ~15 ms of
        # analysis over the K·dim literal subtree (see
        # :func:`mevi_spark.functions.vector.sql_json_literal`).
        ent_sql = sql_json_literal(
            [{"code": c, "cent": v} for c, v in entries],
            "array<struct<code:int,cent:array<double>>>",
        )
        if metric == "ip":
            body = (
                "aggregate(zip_with(cast(resid AS array<double>), e.cent,"
                " (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
            )
        else:  # neg_l2
            body = (
                "-aggregate(zip_with(cast(resid AS array<double>), e.cent,"
                " (x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x)"
            )
        # every stage is ONE selectExpr of SQL text: the Column-API form
        # of this loop cost ~1,700 py4j round trips per build (~0.6 s of
        # socket latency at 2 levels — profiled), the text form a few
        # dozen. Expressions are the identical float-op sequences.
        keep = ["query_id", "prefix", "beam_score", "resid", "beam_rank"]
        cand = (
            beam.selectExpr(*keep, f"{ent_sql} AS _ent")
            .selectExpr("*", f"transform(_ent, e -> {body}) AS _raw")
            .selectExpr(
                "*",
                "transform(_raw, v -> exp(v - array_max(_raw))) AS _ex",
            )
            .selectExpr(
                *keep,
                "_ent",
                "aggregate(_ex, 0.0D, (acc, x) -> acc + x) AS _den",
                "posexplode(_ex) AS (_idx, _e)",
            )
            .selectExpr(
                *keep,
                "element_at(_ent, _idx + 1).code AS _code",
                "element_at(_ent, _idx + 1).cent AS _cent",
                "_e / _den AS _p",
            )
            .selectExpr(
                "query_id",
                "prefix",
                "resid",
                "beam_rank",
                "_code",
                "_cent",
                "beam_score * _p AS beam_score",
            )
        )
        flat_sql = (
            f"aggregate(prefix, 0L, (acc, c) -> acc * {k_per_level}L + c)"
        )
        if valid_codes is not None:
            valid = F.broadcast(
                valid_codes.filter(F.col("level") == lvl).select(
                    F.col("parent_flat").alias("_pflat"),
                    F.col("code").alias("_code"),
                )
            )
            cand = cand.selectExpr("*", f"{flat_sql} AS _pflat").join(
                valid, ["_pflat", "_code"], "left_semi"
            )
        # top num_beams over beam×K; tie-break = the flattened
        # candidate index of the beam×K score tensor the reference
        # ranks (hypothesis POSITION in the previous beam × K + code —
        # torch.topk's flat dim, MEVI/pq.py:684; the hypothesis's
        # prefix VALUE is not that index and ordered ties differently)
        resid_sql = (
            "zip_with(resid, _cent, (a, b) -> a - b)"
            if lvl < levels - 1
            else "resid"
        )
        beam = (
            cand.selectExpr(
                "*",
                f"row_number() OVER (PARTITION BY query_id"
                f" ORDER BY beam_score DESC,"
                f" (beam_rank - 1) * {k_per_level}L + _code ASC)"
                f" AS _new_rank",
            )
            .filter(F.col("_new_rank") <= num_beams)
            .selectExpr(
                "query_id",
                "concat(prefix, array(cast(_code AS int))) AS prefix",
                "beam_score",
                f"{resid_sql} AS resid",
                "_new_rank AS beam_rank",
            )
        )
    return beam.select(
        "query_id",
        F.col("prefix").alias("code"),
        code_flat("prefix", k_per_level).alias("code_flat"),
        "beam_score",
        "beam_rank",
    )


def enumerate_all_codes(
    queries: DataFrame,
    codebook: DataFrame,
    levels: int,
    k_per_level: int,
    topk: int,
    metric: str = "ip",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """U5: brute-force level-wise enumeration of ALL K^M code sequences
    per query — the beam with pruning turned off.

    Reference: ``_generate_all`` (``MEVI/transformers/generation_utils.py:
    1013-1100``): every level expands every surviving hypothesis by every
    code, the per-level log-softmax scores accumulate by addition, and no
    hypothesis is dropped until the consumer's blocked running top-k
    (``eval_all_documents``, ``MEVI/main_models.py:3818-3876``). Here the
    accumulation is the product of per-hypothesis softmax probabilities —
    the same quantity in linear space.

    Scale note: the intermediate is |queries| × K^level rows — this is
    the reference's *diagnostic* mode (it batches the blowup at
    ``local_batch_size=128``), not the retrieval path; the beam is.
    Spark-side the expansion is a crossJoin against the broadcast K-row
    level codebook, so the K^M rows are distributed, never collected,
    and the final per-query top-k is a window over them. Use only for
    small K^M (bounded cluster spaces), as the reference does.

    Returns ``(query_id, code, code_flat, score, rank)``, rank 1..topk,
    deterministic tie-break on the flat code index.
    """
    score_fn = _METRICS[metric]
    state = queries.select(
        F.col(query_id).alias("query_id"),
        F.array().cast("array<int>").alias("prefix"),
        F.lit(1.0).alias("score"),
        F.col(query_vec).cast("array<double>").alias("resid"),
    )
    for lvl in range(levels):
        cb = F.broadcast(
            codebook.filter(F.col("level") == lvl).select(
                F.col("code").alias("_code"), F.col("centroid").alias("_cent")
            )
        )
        cand = state.crossJoin(cb).withColumn("_raw", score_fn("resid", "_cent"))
        hyp = Window.partitionBy("query_id", "prefix")
        shifted = F.exp(F.col("_raw") - F.max("_raw").over(hyp))
        cand = cand.withColumn("score", F.col("score") * shifted / F.sum(shifted).over(hyp))
        new_prefix = F.concat("prefix", F.array(F.col("_code")))
        if lvl < levels - 1:
            resid = F.zip_with("resid", "_cent", lambda a, b: a - b)
        else:
            resid = F.col("resid")
        state = cand.select(
            "query_id",
            new_prefix.alias("prefix"),
            "score",
            resid.alias("resid"),
        )
    ranked = topk_per_group(
        state.withColumn("_flat", code_flat("prefix", k_per_level)),
        ["query_id"], "score", topk, ["_flat"], rank_col="rank",
    )
    return ranked.select(
        "query_id",
        F.col("prefix").alias("code"),
        F.col("_flat").alias("code_flat"),
        "score",
        "rank",
    )

"""Top-k similarity join (J4) and per-group top-k (W3).

The reference's two physical strategies:

* faiss ANN search, top-1000 by inner product (``MEVI/faiss_search.py:13-21``)
* blocked running top-k — keep a running top-``pool_size`` while scanning
  doc blocks so all scores are never materialized
  (``MEVI/main_models.py:3818-3876, 3919-3989``)

Two Spark implementations, chosen by ``impl``:

``sql``
    Broadcast the query side, score with a JVM column expression
    (whole-stage codegen), per-query window top-k. Zero Python; the plan
    a SQL user would write. Shuffles the full (queries × docs) score
    relation, so it is the right choice when that product is modest
    (small query batches, pre-pruned candidate sets — e.g. the fine
    re-rank after coarse pruning).

``blocked``
    The reference's W3 reborn: broadcast the query *matrix*, stream doc
    partitions through an Arrow-batched ``mapInPandas`` that keeps a
    running top-k per query (NumPy matmul + argpartition per batch), then
    a final per-query window over the ≤ k·P survivors. The corpus is
    **never shuffled** — only (n_queries × k × n_partitions) candidate
    rows move. This is the 100 TB path: doc partitions stream from
    parquet, nothing is materialized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from mevi_spark.functions import vector as V

_SCORES = {
    "ip": V.dot,
    "cosine": V.cosine,
    "neg_l2": V.neg_l2_score,
}


def score_expr(metric: str, a: Column | str, b: Column | str) -> Column:
    """F5: compute_scores — 'ip' | 'cosine' | 'neg_l2'
    (``MEVI/pq.py:124-131``)."""
    return _SCORES[metric](a, b)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """W3/W2: per-group top-k with deterministic tie-break.

    Ranks descending by ``order_col``; ties broken ascending by
    ``tiebreak_cols`` so results are reproducible across engines (the
    float-parity discipline of SURVEY §7.5.2).
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def exact_topk_join(
    queries: DataFrame,
    docs: DataFrame,
    k: int,
    metric: str = "ip",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    doc_id: str = "doc_id",
    doc_vec: str = "doc_vec",
    score_col: str = "score",
    impl: str = "blocked",
    query_chunk: int = 65536,
) -> DataFrame:
    """J4 exact path: brute-force top-k similarity join.

    Returns ``(query_id, doc_id, score, rank)`` with rank 1..k per query,
    deterministic tie-break on (−score, doc_id).

    The ``blocked`` impl pulls query vectors to the driver in chunks of
    ``query_chunk`` (never the whole side at once — round-1's driver-OOM
    finding) and broadcasts one chunk's matrix at a time; each chunk
    streams the corpus once. This is the right shape for batch-sized
    query sides (the MEVI eval shape: ~10³-10⁴ queries against a large
    corpus). For LARGE query sides — each ``query_chunk`` rows cost one
    full corpus pass — use the fully-distributed indexes instead:
    :func:`mevi_spark.operators.ann.ivf_topk_join` when the corpus
    carries a cluster assignment (probes ``nprobe/K`` of the corpus per
    query), else :func:`mevi_spark.operators.ann.lsh_topk_join` (banded
    equi-join, large×large). :func:`topk_join` dispatches among the
    three by query-side size.
    """
    if impl == "sql":
        q = queries.select(query_id, query_vec)
        d = docs.select(doc_id, doc_vec)
        scored = F.broadcast(q).crossJoin(d).select(
            query_id,
            doc_id,
            score_expr(metric, query_vec, doc_vec).alias(score_col),
        )
        return topk_per_group(scored, [query_id], score_col, k, [doc_id])
    if impl != "blocked":
        raise ValueError(f"unknown impl: {impl!r}")

    # -- blocked running top-k (W3), the scale path --------------------
    # the Arrow kernel's output schema and np.int64 casts require
    # integral ids — fail HERE with guidance instead of as a cast error
    # inside executor tasks (impl='sql' takes any id type)
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    _ints = (ByteType, ShortType, IntegerType, LongType)
    for side, df_, col_ in (("queries", queries, query_id),
                            ("docs", docs, doc_id)):
        if not isinstance(df_.schema[col_].dataType, _ints):
            raise TypeError(
                f"exact_topk_join(impl='blocked') needs an integral "
                f"{side} id; {col_} is "
                f"{df_.schema[col_].dataType.simpleString()} — use "
                f"impl='sql' for non-integer ids"
            )
    spark = docs.sparkSession
    out_schema = f"{query_id} long, {doc_id} long, {score_col} double"

    def chunk_candidates(q_ids: np.ndarray, q_mat: np.ndarray) -> DataFrame:
        if metric == "cosine":
            norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
            q_mat = q_mat / np.where(norms == 0, 1.0, norms)
        bc = spark.sparkContext.broadcast((q_ids, q_mat, metric, k))
        return docs.select(doc_id, doc_vec).mapInPandas(
            _make_block_topk(bc, query_id, doc_id, score_col), out_schema
        )

    # iterate the query side in driver-bounded chunks. Probe with a
    # LIMIT-ed collect first: a side that fits one chunk (the common
    # eval shape) arrives in ONE job instead of toLocalIterator's
    # job-per-partition drip (measured: 3 jobs → 1 at sf0.1). The
    # probe's limit is chunk+1, so the driver never holds more than one
    # chunk either way; only when the probe overflows does the
    # iterator path re-scan the side.
    parts: list[DataFrame] = []
    q_side = queries.select(query_id, query_vec)
    probe = q_side.limit(query_chunk + 1).collect()
    if len(probe) <= query_chunk:
        if probe:
            parts.append(
                chunk_candidates(
                    np.array([r[0] for r in probe]),
                    np.array([r[1] for r in probe], dtype=np.float64),
                )
            )
    else:
        buf_ids: list = []
        buf_vecs: list = []
        for row in q_side.toLocalIterator(prefetchPartitions=True):
            buf_ids.append(row[0])
            buf_vecs.append(row[1])
            if len(buf_ids) >= query_chunk:
                parts.append(
                    chunk_candidates(
                        np.array(buf_ids), np.array(buf_vecs, dtype=np.float64)
                    )
                )
                buf_ids, buf_vecs = [], []
        if buf_ids:
            parts.append(
                chunk_candidates(
                    np.array(buf_ids), np.array(buf_vecs, dtype=np.float64)
                )
            )
    if not parts:
        return spark.createDataFrame(
            [], f"{query_id} long, {doc_id} long, {score_col} double, rank int"
        )
    candidates = parts[0]
    for p in parts[1:]:
        candidates = candidates.unionByName(p)
    return topk_per_group(candidates, [query_id], score_col, k, [doc_id])


#: above this many query rows, the blocked exact join's driver-mediated
#: chunking (one corpus pass per 65k-row chunk) stops being the right
#: physical shape and auto-dispatch switches to a distributed index
EXACT_QUERY_LIMIT = 262_144


def topk_join(
    queries: DataFrame,
    docs: DataFrame,
    k: int,
    metric: str = "ip",
    strategy: str = "auto",
    centroids: DataFrame | None = None,
    query_count: int | None = None,
    exact_query_limit: int = EXACT_QUERY_LIMIT,
    **kwargs,
) -> DataFrame:
    """J4 strategy dispatcher over the three similarity-join physical
    shapes (VERDICT r5 #5):

    * ``'exact'`` — :func:`exact_topk_join`, blocked running top-k;
      exact, corpus never shuffled, query side driver-chunked.
    * ``'ivf'`` — :func:`mevi_spark.operators.ann.ivf_topk_join`;
      needs ``centroids`` and a ``code`` list assignment on ``docs``;
      probes ``nprobe/K`` of the corpus per query.
    * ``'lsh'`` — :func:`mevi_spark.operators.ann.lsh_topk_join`;
      banded equi-join, the large×large fallback with no index
      prerequisite.

    A fourth strategy lives outside this dispatcher because its corpus
    input is a QUANTIZED mapping, not raw vectors:
    :func:`mevi_spark.operators.ann.adc_topk_join` (IVF-ADC — per-query
    lookup tables against the additive RQ reconstruction; the scan
    never reads a vector column).

    ``'auto'`` picks by query-side size: exact up to
    ``exact_query_limit`` rows (each 65k-chunk costs one corpus pass —
    fine for batch-sized eval query sets, wrong past a few chunks),
    then IVF when ``centroids`` is given, else LSH. Pass
    ``query_count`` when the size is already known to skip the count
    job (at scale, prefer passing it — the count is one scan of the
    query side).

    Extra ``kwargs`` flow to the chosen implementation. Under
    ``'auto'`` the strategy is DATA-dependent, so kwargs are filtered
    to what the resolved backend accepts — an unconditional
    pass-through would make e.g. ``nprobe=5`` work while the query
    side is large (ivf) and raise ``TypeError`` once it shrinks below
    the exact limit; a kwarg NO strategy accepts is still an immediate
    error. With an EXPLICIT strategy nothing is filtered: a kwarg that
    strategy doesn't accept is a caller bug and raises as usual.
    """
    import inspect

    from mevi_spark.operators import ann

    impls = {
        "exact": exact_topk_join,
        "ivf": ann.ivf_topk_join,
        "lsh": ann.lsh_topk_join,
    }

    def _sig(fn):
        params = inspect.signature(fn).parameters
        var_kw = any(
            p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
        )
        return set(params), var_kw

    # parameters this dispatcher binds itself — a caller re-supplying
    # one as a kwarg (e.g. a stray ``docs=``) must fail the early
    # unknown-kwarg check, not surface later as a confusing
    # duplicate-argument TypeError (ADVICE r6)
    _bound = {
        "queries", "docs", "centroids", "k", "metric",
        "query_count", "strategy", "exact_query_limit",
    }
    sigs = {name: _sig(fn) for name, fn in impls.items()}
    known = set().union(*(names for names, _ in sigs.values())) - _bound
    if not any(var_kw for _, var_kw in sigs.values()):
        unknown = set(kwargs) - known
        if unknown:
            raise TypeError(
                f"topk_join got unknown kwargs: {sorted(unknown)}"
            )

    was_auto = strategy == "auto"
    if was_auto:
        n = query_count if query_count is not None else queries.count()
        if n <= exact_query_limit:
            strategy = "exact"
        elif metric not in ("ip", "cosine"):
            # the index backends only speak ip/cosine — a large query
            # side with e.g. neg_l2 must stay on the exact path (slow
            # but correct) rather than surface an opaque ValueError
            # from a backend the caller never chose
            import warnings

            warnings.warn(
                f"topk_join(auto): metric {metric!r} has no index "
                f"backend; staying exact despite {n} queries",
                stacklevel=2,
            )
            strategy = "exact"
        elif centroids is not None:
            strategy = "ivf"
        else:
            strategy = "lsh"
    if strategy not in impls:
        raise ValueError(f"unknown strategy: {strategy!r}")

    def _accepted(fn):
        if not was_auto:
            return dict(kwargs)  # explicit strategy: bad kwargs raise
        names, var_kw = _sig(fn)
        if var_kw:
            return dict(kwargs)
        taken = {k_: v for k_, v in kwargs.items() if k_ in names}
        dropped = sorted(set(kwargs) - set(taken))
        if dropped:
            # a kwarg valid for SOME strategy but not the resolved one
            # (e.g. nprobe when auto picked exact) is silently
            # inapplicable by design — but signal it once so tuning
            # knobs never no-op invisibly (ADVICE r6)
            import warnings

            warnings.warn(
                f"topk_join(auto) resolved to {strategy!r}; "
                f"inapplicable kwargs ignored: {dropped}",
                stacklevel=3,
            )
        return taken

    if strategy == "exact":
        return exact_topk_join(queries, docs, k, metric, **_accepted(exact_topk_join))
    if strategy == "ivf":
        if centroids is None:
            raise ValueError("strategy='ivf' requires centroids")
        return ann.ivf_topk_join(
            queries, docs, centroids, k, metric=metric,
            **_accepted(ann.ivf_topk_join),
        )
    return ann.lsh_topk_join(
        queries, docs, k, metric=metric, **_accepted(ann.lsh_topk_join)
    )


def _make_block_topk(bc, query_id: str, doc_id: str, score_col: str):
    """Build the per-partition running-top-k kernel (torch.topk analog,
    ``MEVI/main_models.py:3855-3876``) over one broadcast query chunk."""

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, met, kk = bc.value
        nq = len(ids)
        # running pools per partition: scores (nq, pool), doc ids (nq, pool)
        top_s = np.full((nq, 0), -np.inf)
        top_d = np.full((nq, 0), -1, dtype=np.int64)
        for pdf in batches:
            d_ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            d_mat = np.array(list(pdf.iloc[:, 1]), dtype=np.float64)
            if met == "ip":
                s = mat @ d_mat.T
            elif met == "cosine":
                dn = np.linalg.norm(d_mat, axis=1, keepdims=True)
                s = mat @ (d_mat / np.where(dn == 0, 1.0, dn)).T
            elif met == "neg_l2":
                s = -(
                    (mat * mat).sum(1)[:, None]
                    - 2.0 * (mat @ d_mat.T)
                    + (d_mat * d_mat).sum(1)[None, :]
                )
            else:
                raise ValueError(met)
            # concat pools with this block, re-prune to k (torch.topk analog,
            # MEVI/main_models.py:3855-3876)
            all_s = np.concatenate([top_s, s], axis=1)
            all_d = np.concatenate([top_d, np.broadcast_to(d_ids, (nq, len(d_ids)))], axis=1)
            if all_s.shape[1] > kk:
                # deterministic: order by (-score, doc_id)
                order = np.lexsort((all_d, -all_s), axis=1)[:, :kk]
                top_s = np.take_along_axis(all_s, order, axis=1)
                top_d = np.take_along_axis(all_d, order, axis=1)
            else:
                top_s, top_d = all_s, all_d
        if top_s.shape[1]:
            n = top_s.shape[1]
            yield pd.DataFrame(
                {
                    query_id: np.repeat(ids, n),
                    doc_id: top_d.ravel(),
                    score_col: top_s.ravel(),
                }
            )

    return block_topk

"""Beam search (U3/W5) and ensemble fusion (J6/W6/F9) vs reference-loop
oracles in NumPy / plain Python."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mevi_spark.operators.beam import enumerate_all_codes, rq_beam_search
from mevi_spark.operators.ensemble import fuse_runs, merge_runs
from mevi_spark.operators.rq import rq_encode_seeded


def _np_beam(q, codebook, levels, num_beams, k):
    """The reference loop of MEVI/pq.py:646-707 (ip metric, prod score):
    returns [(code_tuple, score)] sorted by (-score, flat_index)."""
    beams = [((), 1.0, q.copy())]
    for lvl in range(levels):
        cands = []
        for prefix, score, resid in beams:
            raw = np.array(
                [resid @ codebook[(lvl, c)] for c in range(k)]
            )
            p = np.exp(raw - raw.max())
            p = p / p.sum()
            for c in range(k):
                flat = 0
                for d in prefix:
                    flat = flat * k + d
                flat = flat * k + c
                cands.append((prefix + (c,), score * p[c], resid, flat))
        cands.sort(key=lambda t: (-t[1], t[3]))
        kept = cands[:num_beams]
        beams = []
        for prefix, score, resid, _ in kept:
            nr = (
                resid - codebook[(lvl, prefix[-1])]
                if lvl < levels - 1
                else resid
            )
            beams.append((prefix, score, nr))
    return [(p, s) for p, s, _ in beams]


def test_beam_matches_numpy_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        "label",
    )
    _, codebook = rq_encode_seeded(
        df, seed_code="label", id_col="id", vec_col="vector", levels=2
    )
    cb = {
        (r.level, r.code): np.array(r.centroid) for r in codebook.collect()
    }
    k = len({c for (l, c) in cb if l == 0})

    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = rq_beam_search(
        queries, codebook, levels=2, num_beams=4, k_per_level=k, metric="ip"
    ).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)

    qvecs = {r.query_id: np.array(r.query_vec, dtype=np.float64)
             for r in queries.collect()}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.beam_rank)
        expect = _np_beam(qvecs[qid], cb, levels=2, num_beams=4, k=k)
        assert [tuple(r.code) for r in rows] == [p for p, _ in expect]
        for r, (_, s) in zip(rows, expect):
            assert abs(r.beam_score - s) < 1e-9


def test_full_width_beam_equals_exhaustive(spark, sf_dir):
    """A beam as wide as the whole level-0 fan-out prunes nothing, so it
    must return exactly the exhaustive enumeration's top-k (U5 vs U3
    consistency — ``_generate_all`` is the beam with the mask off)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vector"),
        "label",
    )
    _, codebook = rq_encode_seeded(
        df, seed_code="label", id_col="id", vec_col="vector", levels=2
    )
    k = codebook.filter(F.col("level") == 0).count()
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    topk = 4
    beam = rq_beam_search(
        queries, codebook, levels=2, num_beams=k * k, k_per_level=k
    )
    beam_top = {
        (r.query_id, r.beam_rank): (r.code_flat, r.beam_score)
        for r in beam.filter(F.col("beam_rank") <= topk).collect()
    }
    exhaustive = enumerate_all_codes(
        queries, codebook, levels=2, k_per_level=k, topk=topk
    )
    exh_top = {
        (r.query_id, r.rank): (r.code_flat, r.score)
        for r in exhaustive.collect()
    }
    assert set(beam_top) == set(exh_top)
    for key, (flat, score) in exh_top.items():
        bflat, bscore = beam_top[key]
        assert bflat == flat
        assert abs(bscore - score) < 1e-9


def _py_fuse(apreds, fpreds, cranks, n_clusters, alpha, beta, gamma):
    """MEVI/ensemble_marco.py:224-240 verbatim semantics."""
    scores: dict[int, float] = {}
    for doc, s in apreds + fpreds:  # dict overwrite: last wins
        scores[doc] = s
    fused = {}
    for doc, s in scores.items():
        crank = cranks.get(doc)
        absent = crank is None
        c = n_clusters if absent else crank
        v = s + alpha / (beta * c + 1.0)
        if absent:
            v *= 1.0 - gamma * alpha
        fused[doc] = v
    return fused


def test_fuse_runs_matches_reference_loop(spark):
    alpha, beta, gamma = 0.6, 0.03, 0.02
    ann = [(1, 10, 5.0, 1), (1, 11, 4.0, 2), (1, 12, 3.0, 3)]
    fine = [(1, 11, 9.0, 1), (1, 13, 8.0, 2)]
    mapping = [(10, 100), (11, 100), (12, 200), (13, 300)]
    coarse = [(1, 100, 1), (1, 300, 2)]  # cluster 200 absent

    ann_df = spark.createDataFrame(
        ann, "query_id long, doc_id long, score double, rank int"
    )
    fine_df = spark.createDataFrame(
        fine, "query_id long, doc_id long, score double, rank int"
    )
    map_df = spark.createDataFrame(mapping, "doc_id long, code_flat long")
    coarse_df = spark.createDataFrame(
        coarse, "query_id long, code_flat long, coarse_rank int"
    )

    got = {
        r.doc_id: r.fused_score
        for r in fuse_runs(
            ann_df, coarse_df, map_df, k=10, fine_run=fine_df,
            alpha=alpha, beta=beta, gamma=gamma,
        ).collect()
    }

    cranks = {10: 0, 11: 0, 13: 1}  # 0-based rank of doc's cluster
    expect = _py_fuse(
        [(d, s) for (_, d, s, _) in ann],
        [(d, s) for (_, d, s, _) in fine],
        cranks, n_clusters=2, alpha=alpha, beta=beta, gamma=gamma,
    )
    assert set(got) == set(expect)
    for d in expect:
        assert abs(got[d] - expect[d]) < 1e-12, d


def test_merge_runs_last_wins(spark):
    # doc 11 in both runs → fine wins; doc 10 duplicated in ann → the
    # worse-ranked (later parse order) row wins
    ann = [(1, 10, 5.0, 1), (1, 10, 2.5, 7), (1, 11, 4.0, 2)]
    fine = [(1, 11, 9.0, 1)]
    a = spark.createDataFrame(
        ann, "query_id long, doc_id long, score double, rank int"
    )
    f = spark.createDataFrame(
        fine, "query_id long, doc_id long, score double, rank int"
    )
    got = {(r.doc_id): (r.score, r.rank) for r in merge_runs(a, f).collect()}
    assert got[10] == (2.5, 7)
    assert got[11] == (9.0, 1)

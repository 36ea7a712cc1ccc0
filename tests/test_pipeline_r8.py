"""Round-8 late additions: exact stratified sampling and bigram-LM
quality scoring.

Each test recomputes the expected result in plain Python from the same
inputs — independent of both the Spark plan under test and the DuckDB
oracle the driver gate uses.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from mevi_spark.plans.pipeline_ops import (
    _STRAT_N,
    ngram_lm_quality,
    stratified_sample_exact,
)
from mevi_spark.sources.io import load_table


def _h60(seed: str, val: str) -> int:
    return int(hashlib.md5(f"{seed}|{val}".encode()).hexdigest()[:15], 16)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    return t.split(" ")


def test_stratified_quota_and_selection(spark, sf_dir):
    docs = [
        (r.doc_id, r.source, r.lang)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "lang")
        .collect()
    ]
    strata: dict[tuple, list[int]] = {}
    for doc_id, source, lang in docs:
        strata.setdefault((source, lang), []).append(doc_id)
    expected = {}
    for key, ids in strata.items():
        ids.sort(key=lambda d: (_h60("strat", str(d)), d))
        for rn, d in enumerate(ids[:_STRAT_N], start=1):
            expected[d] = (key, rn)

    got = {
        r.doc_id: ((r.source, r.lang), r.rn)
        for r in stratified_sample_exact(spark, sf_dir).collect()
    }
    assert got == expected
    # every stratum's count is min(N, |stratum|)
    per = Counter(k for (k, _) in got.values())
    for key, ids in strata.items():
        assert per[key] == min(_STRAT_N, len(ids))


def test_stratified_growth_stability(spark, sf_dir):
    """Removing never-selected rows must not change the selection —
    the hash-rank contract that makes the sample stable under corpus
    growth (same discipline as dataset_split/domain_mix_sample)."""
    full = stratified_sample_exact(spark, sf_dir)
    selected = {r.doc_id for r in full.collect()}

    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window, functions as F
    from mevi_spark.functions import text_analysis as TA

    # drop half the non-selected docs, recompute on the shrunk corpus
    sel_ids = sorted(selected)
    shrunk = docs.filter(
        F.col("doc_id").isin(sel_ids) | (F.col("doc_id") % 2 == 0)
    )
    w = Window.partitionBy("source", "lang").orderBy(
        TA.hash60(F.col("doc_id").cast("string"), seed="strat").asc(),
        F.col("doc_id").asc(),
    )
    again = (
        shrunk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_N)
        .select("doc_id")
    )
    assert {r.doc_id for r in again.collect()} >= selected


def test_ngram_lm_matches_bruteforce(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r.doc_id: _norm_tokens(r.text) for r in rows}
    c2: Counter = Counter()
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c2[f"{a} {b}"] += 1
    c1: Counter = Counter()
    for bg, n in c2.items():
        c1[bg.split(" ")[0]] += n
    v = len(vocab)
    logp = {
        bg: round(math.log((n + 1.0) / (c1[bg.split(' ')[0]] + v)), 6)
        for bg, n in c2.items()
    }
    expected = {}
    for doc_id, t in toks.items():
        bgs = [f"{a} {b}" for a, b in zip(t, t[1:])]
        if not bgs:
            expected[doc_id] = (0, None)
            continue
        # decimal-stabilized: sum exact micro-units, divide, round
        total = sum(round(logp[bg] * 1e6) for bg in bgs)
        expected[doc_id] = (
            len(bgs),
            round(total / 1e6 / len(bgs), 6),
        )

    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in ngram_lm_quality(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d][0] == expected[d][0], d
        if expected[d][1] is None:
            assert got[d][1] is None, d
        else:
            assert got[d][1] == pytest.approx(expected[d][1], abs=2e-6), d


def test_ngram_lm_scores_are_negative_logprobs(spark, sf_dir):
    out = ngram_lm_quality(spark, sf_dir).collect()
    assert all(r.lm_score < 0 for r in out if r.n_bigrams > 0)
    # repeated text scores higher (less surprising) than unique text:
    # the synthetic corpus has shared phrases, so scores must spread
    scores = [r.lm_score for r in out if r.n_bigrams > 0]
    assert max(scores) - min(scores) > 0.1


def test_weighted_sample_matches_bruteforce(spark, sf_dir):
    import math

    from mevi_spark.plans.pipeline_ops import _WSAMP_K, weighted_sample_topk

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in rows:
        w = max(r.n_chars, 1)
        u = (_h60("wsamp", str(r.doc_id)) + 1) / 2**60
        keyed.append((round(-math.log(u) / w, 6), r.doc_id, w))
    keyed.sort()
    expected = {
        d: (w, k, i + 1) for i, (k, d, w) in enumerate(keyed[:_WSAMP_K])
    }

    got = {
        r.doc_id: (r.w, r.key, r.rn)
        for r in weighted_sample_topk(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for d, (w, k, rn) in expected.items():
        assert got[d][0] == w and got[d][2] == rn, d
        assert got[d][1] == pytest.approx(k, abs=2e-6), d


def test_weighted_sample_prefers_heavy_docs(spark, sf_dir):
    """The E-S property that makes it a WEIGHTED sample: selection is
    biased toward large weights (here doc length)."""
    from mevi_spark.plans.pipeline_ops import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    med = sorted(r.n_chars for r in docs.collect())
    med = med[len(med) // 2]
    sel = weighted_sample_topk(spark, sf_dir).collect()
    heavy = sum(1 for r in sel if r.w > med)
    assert heavy > len(sel) * 0.6, (heavy, len(sel))

"""Round-7 pipeline queries: TF-IDF top-terms, grouped quantiles,
duplicate-cluster canonicalization.

Each test recomputes the expected result in plain Python/numpy from
the same inputs — independent of both the Spark plan under test and
the DuckDB oracle the driver gate uses.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mevi_spark.plans import pipeline_ops as P
from mevi_spark.plans.pipeline_ops import (
    dedup_canonicalize,
    events_value_quantiles,
    text_tfidf_topterms,
)
from mevi_spark.functions.text import normalize_text, tokens
from mevi_spark.sources.io import load_table


def _doc_tokens(spark, sf_dir) -> dict[int, list[str]]:
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens(normalize_text("text")).alias("t"))
        .collect()
    )
    return {r.doc_id: list(r.t) for r in rows}


def test_tfidf_matches_python_recompute(spark, sf_dir):
    toks = _doc_tokens(spark, sf_dir)
    n_docs = len(toks)
    df_count: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df_count[term] = df_count.get(term, 0) + 1

    expected: dict[int, list[tuple[str, float]]] = {}
    for doc_id, t in toks.items():
        tf: dict[str, int] = {}
        for term in t:
            tf[term] = tf.get(term, 0) + 1
        scored = [
            (term, c * (math.log((n_docs + 1) / (df_count[term] + 1)) + 1.0))
            for term, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        expected[doc_id] = scored[:5]

    got = text_tfidf_topterms(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(expected)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert [r.term for r in rows] == [t for t, _ in expected[doc_id]]
        for r, (_, s) in zip(rows, expected[doc_id]):
            assert r.tfidf == pytest.approx(round(s, 6), abs=1e-6)


def test_quantiles_match_numpy_linear_interpolation(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    got = {
        (r.event_type, r.p): (r.v, r.n)
        for r in events_value_quantiles(spark, sf_dir).collect()
    }
    probs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    keys = set()
    for etype, grp in ev.groupby("event_type"):
        vals = grp["value"].to_numpy(dtype=float)
        for label, q in probs.items():
            want = float(np.percentile(vals, q * 100, method="linear"))
            v, n = got[(etype, label)]
            keys.add((etype, label))
            assert n == len(vals)
            assert v == pytest.approx(round(want, 6), abs=1e-6)
    assert keys == set(got)  # no extra groups/labels


def test_canonicalize_picks_longest_doc_per_component(spark, sf_dir):
    corpus = P._corpus(spark, sf_dir)
    n_t = {
        r.doc_id: r.n
        for r in corpus.select(
            "doc_id", F.size(tokens(normalize_text("text"))).alias("n")
        ).collect()
    }

    got = dedup_canonicalize(spark, sf_dir).collect()
    # every corpus doc appears exactly once
    assert sorted(r.doc_id for r in got) == sorted(n_t)

    by_comp: dict[int, list] = {}
    for r in got:
        by_comp.setdefault(r.component, []).append(r)
    multi = 0
    for comp, rows in by_comp.items():
        canon = {r.canonical_id for r in rows}
        assert len(canon) == 1  # one survivor per component
        cid = canon.pop()
        # survivor is the member with max tokens, ties to smallest id
        want = min(rows, key=lambda r: (-n_t[r.doc_id], r.doc_id)).doc_id
        assert cid == want
        for r in rows:
            assert r.keep == (r.doc_id == cid)
        if len(rows) > 1:
            multi += 1
    # the planted near-dups must actually form multi-doc clusters
    assert multi > 0

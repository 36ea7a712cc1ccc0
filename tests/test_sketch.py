"""Misra-Gries heavy hitters: candidate completeness (no false
negatives above N/(capacity+1)), bounded summary size, and exactness
of the two-pass construction against a plain Counter."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from mevi_spark.operators.sketch import heavy_hitters, misra_gries_candidates

_N_PARTS = 5


def _skewed_terms() -> list[str]:
    """Deterministic skewed stream: 5 heavy terms over a 400-term
    tail, shuffled so partitions see interleaved (not sorted) data —
    the adversarial layout for a per-partition summary."""
    data: list[str] = []
    for i in range(5):
        data += [f"h{i}"] * (150 + 60 * i)
    for j in range(400):
        data += [f"t{j}"] * (1 + j % 3)
    random.Random(7).shuffle(data)
    return data


@pytest.fixture(scope="module")
def terms_df(spark):
    data = _skewed_terms()
    return (
        spark.createDataFrame([(t,) for t in data], "term string")
        .repartition(_N_PARTS)
        .cache()
    ), Counter(data)


def test_mg_candidates_complete_and_bounded(terms_df):
    df, cnt = terms_df
    n = sum(cnt.values())
    cap = 32
    cands = {
        r.term for r in misra_gries_candidates(df, "term", cap).collect()
    }
    must = {t for t, c in cnt.items() if c > n / (cap + 1)}
    assert must <= cands, must - cands
    # summary size is bounded by capacity × partitions, never the
    # vocabulary (405 distinct terms here)
    assert len(cands) <= cap * _N_PARTS
    assert len(cands) < len(cnt)


def test_heavy_hitters_exact(terms_df):
    df, cnt = terms_df
    n = sum(cnt.values())
    got = {
        (r.term, r.cnt)
        for r in heavy_hitters(df, "term", 1, 50).collect()
    }
    thresh = math.ceil(n / 50)
    want = {(t, c) for t, c in cnt.items() if c >= thresh}
    assert got == want


def test_heavy_hitters_rejects_insufficient_capacity(terms_df):
    df, _ = terms_df
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 1, 50, capacity=10)


def test_capacity_boundary_is_strict(spark):
    """(capacity+1)·num == den is NOT sufficient (an item exactly on
    the threshold can sit exactly on MG's loss boundary) — the
    validator must reject it; capacity = den//num is the minimum."""
    df = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "term string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "term", 1, 4, capacity=3)
    got = {(r.term, r.cnt) for r in heavy_hitters(df, "term", 1, 4).collect()}
    assert got == {("a", 1), ("b", 1), ("c", 1), ("d", 1)}

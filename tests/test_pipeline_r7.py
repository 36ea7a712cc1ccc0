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


def _shingles(t: list[str], n: int) -> set[str]:
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


def test_decontaminate_flags_planted_copies(spark, sf_dir):
    from mevi_spark.plans.pipeline_ops import decontaminate_eval

    toks = _doc_tokens(spark, sf_dir)  # base documents only
    ev_grams: set[str] = set()
    for doc_id, t in toks.items():
        if doc_id % 7 == 0:  # exact copy at +100000
            ev_grams |= _shingles(t, 5)
        if doc_id % 5 == 0:  # near copy (first token dropped) at +200000
            ev_grams |= _shingles(t[1:], 5)

    got = {r.doc_id: r for r in decontaminate_eval(spark, sf_dir).collect()}
    assert set(got) == set(toks)  # train side = every original doc
    flagged = 0
    for doc_id, t in toks.items():
        want = len(_shingles(t, 5) & ev_grams)
        assert got[doc_id].n_overlap == want, doc_id
        assert got[doc_id].contaminated == (want > 0)
        flagged += want > 0
    # the planted copies must actually contaminate their originals
    assert flagged >= sum(1 for d in toks if d % 7 == 0 and len(toks[d]) >= 5)


def test_repetition_stats_flag_doubled_docs(spark, sf_dir):
    from mevi_spark.plans.pipeline_ops import text_repetition_stats

    toks = _doc_tokens(spark, sf_dir)
    got = {r.doc_id: r for r in text_repetition_stats(spark, sf_dir).collect()}
    assert set(got) == set(toks) | {
        d + 300000 for d in toks if d % 11 == 0
    }

    def expect(t: list[str]):
        bi = [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        dup_w = 0.0 if not t else 1.0 - len(set(t)) / len(t)
        dup_b = 0.0 if not bi else 1.0 - len(set(bi)) / len(bi)
        top_b = 0.0 if not bi else max(bi.count(g) for g in set(bi)) / len(bi)
        return dup_w, dup_b, top_b

    for doc_id, t in toks.items():
        for did, tt in ((doc_id, t), (doc_id + 300000, t + t)):
            if did >= 300000 and doc_id % 11 != 0:
                continue
            dup_w, dup_b, top_b = expect(tt)
            r = got[did]
            assert r.n_tok == len(tt)
            assert r.dup_word_frac == pytest.approx(round(dup_w, 6), abs=1e-6)
            assert r.dup_bigram_frac == pytest.approx(round(dup_b, 6), abs=1e-6)
            assert r.top_bigram_frac == pytest.approx(round(top_b, 6), abs=1e-6)
            assert r.repetitive == (dup_b > 0.2 or top_b > 0.1)
    # every doubled doc with enough tokens must flag
    doubled = [d + 300000 for d in toks if d % 11 == 0 and len(toks[d]) >= 2]
    assert doubled and all(got[d].repetitive for d in doubled)


def test_round7_plan_shapes(spark, sf_dir):
    """Lock the docstring claims: repetition stats shuffles at most
    once — the opt-in ``spread_small_scan`` round-robin exchange that
    widens the tiny fixture scan (identity at production listing
    widths) — and never by key; decontamination joins only by
    broadcast hash."""
    from mevi_spark.plans.pipeline_ops import (
        decontaminate_eval,
        text_repetition_stats,
    )

    rep = (
        text_repetition_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The ONLY allowed exchange is the spread's round-robin one: no
    # hash/range partitioning (no keyed shuffle), and at most one
    # Exchange node total.
    assert rep.count("Exchange") <= 1
    assert "hashpartitioning" not in rep and "rangepartitioning" not in rep

    dec = (
        decontaminate_eval(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in dec and "BroadcastHashJoin" in dec


def test_bm25_query_side_broadcast_is_pinned(spark, sf_dir):
    """VERDICT r7 "what's wrong" #2: the q⋈tf edge must be a broadcast
    hash join BY HINT, not by planner stats — at corpus scale a stats
    misestimate would shuffle the postings table on `term`. The hint
    survives into the optimized plan as ResolvedHint/broadcast on the
    query side; executed-plan check: at least one BroadcastHashJoin and
    no shuffle(term) sort-merge join on the contribution path."""
    from mevi_spark.plans.pipeline_ops import bm25_search

    df = bm25_search(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed
    # the broadcast must be the HINTED query side, visible pre-stats
    assert "broadcast" in optimized.lower()
    assert "SortMergeJoin" not in executed


def test_domain_mix_rates_and_determinism(spark, sf_dir):
    import hashlib

    from mevi_spark.plans.pipeline_ops import domain_mix_sample

    def h60(seed: str, v: str) -> int:
        return int(hashlib.md5(f"{seed}|{v}".encode()).hexdigest()[:15], 16)

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    expected = {}
    for r in docs.itertuples():
        rate = 100 + h60("rate", r.source) % 800
        if h60("mix", str(r.doc_id)) % 1000 < rate:
            expected[r.doc_id] = (r.source, rate)

    got = {
        r.doc_id: (r.source, r.rate_permille)
        for r in domain_mix_sample(spark, sf_dir).collect()
    }
    assert got == expected
    # two runs are identical (the reproducibility contract)
    again = {
        r.doc_id: (r.source, r.rate_permille)
        for r in domain_mix_sample(spark, sf_dir).collect()
    }
    assert again == got


def test_sequence_pack_is_gapless_concat_and_chunk(spark, sf_dir):
    from mevi_spark.plans.pipeline_ops import _SEQ_LEN, sequence_pack

    toks = _doc_tokens(spark, sf_dir)
    got = {r.doc_id: r for r in sequence_pack(spark, sf_dir).collect()}
    nonempty = {d: t for d, t in toks.items() if t}
    assert set(got) == set(nonempty)

    cum = 0
    for doc_id in sorted(nonempty):
        n = len(nonempty[doc_id])
        r = got[doc_id]
        assert r.n_tok == n
        assert r.start_seq == cum // _SEQ_LEN
        assert r.seq_offset == cum % _SEQ_LEN
        assert r.end_seq == (cum + n - 1) // _SEQ_LEN
        cum += n
    # chunking is gapless: total sequences cover exactly cum tokens
    assert max(r.end_seq for r in got.values()) == (cum - 1) // _SEQ_LEN


def test_approx_quantiles_track_exact(spark, sf_dir):
    """The documented 100 TB path for corpus-wide quantiles
    (approx_percentile, mergeable t-digest partials) stays within
    tolerance of the exact grouped percentiles the registered query
    computes."""
    from pyspark.sql import functions as F

    from mevi_spark.plans.pipeline_ops import events_value_quantiles
    from mevi_spark.sources.io import load_table

    exact = {
        (r.event_type, r.p): r.v
        for r in events_value_quantiles(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)"
        ).alias("qs")
    ).collect()
    spread = (
        ev.agg(F.max("value") - F.min("value")).first()[0]
    )
    for r in approx:
        for label, got in zip(("p25", "p50", "p75", "p95"), r.qs):
            want = exact[(r.event_type, label)]
            assert abs(got - want) <= 0.02 * spread, (r.event_type, label)


def test_bm25_matches_python_recompute(spark, sf_dir):
    from mevi_spark.plans.pipeline_ops import bm25_search

    toks = _doc_tokens(spark, sf_dir)
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1

    def scaled(x):  # the scaled-long/decimal(18,6) accumulation
        return int(abs(x) * 1e6 + 0.5) * (1 if x >= 0 else -1)

    expected = {}
    for qid, qt in toks.items():
        if qid % 50 != 0:
            continue
        qterms = set(qt[:5])
        scores: dict[int, int] = {}
        for doc_id, t in toks.items():
            s = 0
            for term in qterms:
                tf = t.count(term)
                if tf == 0:
                    continue
                idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
                c = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * len(t) / avgdl))
                s += scaled(c)
            if s:
                scores[doc_id] = round(s / 1e6, 6)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        expected[qid] = [(d, s, r + 1) for r, (d, s) in enumerate(top)]

    got: dict[int, list] = {}
    for r in bm25_search(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.score, r.rnk))
    for qid in got:
        got[qid].sort(key=lambda x: x[2])
    assert got == expected  # exact equality incl. scores and ranks
    # (no self-retrieval assertion: the synthetic corpus's first-five-
    # token queries are common words, so the source doc has no BM25
    # advantage — measured 1/10 self-in-top5 at sf0.001)

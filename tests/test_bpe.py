"""BPE trainer/encoder against an independent reference
implementation, lossless roundtrip, and compression monotonicity."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from mevi_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    train_merges,
    word_frequencies,
)

_CORPUS = (
    "low low low low low lower lower newest newest newest newest "
    "newest newest widest widest widest new new news"
).split()


def _ref_train(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent reference: re-derives every word's symbol sequence
    from scratch each round by replaying the merges so far (different
    code path from the incremental trainer)."""
    freqs = Counter(words)
    merges: list[tuple[str, str]] = []

    def segment(w: str) -> list[str]:
        syms = list(w) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in freqs.items():
            syms = segment(w)
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        merges.append(min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0])
    return merges


def test_trainer_matches_independent_reference():
    freqs = sorted(Counter(_CORPUS).items())
    assert train_merges(freqs, 12) == _ref_train(_CORPUS, 12)


def test_greedy_encoder_equals_merge_replay():
    """The rank-greedy encoder must segment exactly like replaying the
    merges in training order (the standard equivalence every BPE
    implementation relies on)."""
    merges = _ref_train(_CORPUS, 12)
    ranks = {p: i for i, p in enumerate(merges)}

    def replay(w: str) -> list[str]:
        syms = list(w) + [EOW]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w in set(_CORPUS) | {"lowest", "widow", "x", "newestest"}:
        assert encode_word(w, ranks) == replay(w), w


def test_roundtrip_and_compression(spark):
    rows = [(i, " ".join(_CORPUS[i % 5 :] + _CORPUS[: i % 5]))
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = docs.select("doc_id", F.split("text", " ").alias("_toks"))
    stream = t.select(F.explode("_toks").alias("term"))
    freqs = word_frequencies(stream, min_freq=1)

    def n_tokens(n_merges: int) -> dict[int, int]:
        merges = train_merges(freqs, n_merges)
        enc = bpe_encode(t, merges)
        got = {r.doc_id: r for r in enc.collect()}
        # lossless: concat → replace EOW → rtrim reproduces the text
        for i, text in rows:
            detok = "".join(got[i].tokens).replace(EOW, " ").rstrip()
            assert detok == text, i
        return {i: len(r.tokens) for i, r in got.items()}

    few, many = n_tokens(3), n_tokens(20)
    assert all(many[i] <= few[i] for i in few)
    assert sum(many.values()) < sum(few.values())


def test_vocab_cap_noop_when_not_binding_and_deterministic_when_it_does(
    spark,
):
    """The vocab_cap scale bound (VERDICT r8 "what's wrong" #2): when
    the cap exceeds the vocabulary it must not change the artifact or
    the trained merges; when it binds it keeps exactly the top-N by
    (count DESC, word ASC)."""
    docs = spark.createDataFrame(
        [(0, " ".join(_CORPUS))], "doc_id long, text string"
    )
    stream = docs.select(
        F.explode(F.split("text", " ")).alias("term")
    )
    # the largest admissible cap (the TakeOrdered allocation bound) and
    # a mid-size cap must both be no-ops here; the default cap matches
    uncapped = word_frequencies(stream, min_freq=1, vocab_cap=1 << 26)
    small = word_frequencies(stream, min_freq=1, vocab_cap=10_000)
    capped = word_frequencies(stream, min_freq=1)  # default cap, not binding
    assert capped == uncapped == small
    assert train_merges(capped, 12) == train_merges(uncapped, 12)
    # binding cap: exactly the top-2 by (count desc, term asc)
    top2 = word_frequencies(stream, min_freq=1, vocab_cap=2)
    by_rank = sorted(uncapped, key=lambda wc: (-wc[1], wc[0]))[:2]
    assert top2 == sorted(by_rank)
    # a cap past the allocation bound is REJECTED, never silently
    # un-capped (review r9: 2^26 < cap < vocab would collect the whole
    # vocabulary — the exact OOM the cap exists to prevent)
    import pytest

    with pytest.raises(ValueError, match="vocab_cap"):
        word_frequencies(stream, min_freq=1, vocab_cap=(1 << 26) + 1)

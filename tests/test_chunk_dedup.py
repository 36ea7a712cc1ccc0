"""Overlapping-grid exact-substring dedup (round 10).

Pins the exact failure mode the overlap pass exists to close: a
literal repeat shifted by w/2 words escapes the single aligned grid
(Lee et al. ACL 2022 §4's motivation for suffix arrays) and is caught
by pooling the offset-0 and offset-w/2 grids.
"""

from __future__ import annotations

from mevi_spark.plans.pipeline_ops import (
    chunk_cut_positions,
    chunk_dedup_overlap,
)


def _frame(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )


# doc 1: 16 unique words; doc 2: the SAME 16 words behind a 4-word
# prefix — every repeated word sits at offset 4 relative to its
# original, so no offset-0 grid chunk of doc 2 equals any of doc 1's.
_W1 = " ".join(f"w{i}" for i in range(16))
_SHIFTED = {1: _W1, 2: "p0 p1 p2 p3 " + _W1}


def test_aligned_grid_provably_misses_halfshifted_repeat(spark):
    cuts = chunk_cut_positions(
        _frame(spark, _SHIFTED), w_words=8, offsets=(0,)
    ).collect()
    assert cuts == []  # the base pass finds NOTHING to cut


def test_overlap_grid_catches_halfshifted_repeat(spark):
    cuts = sorted(
        (r.doc_id, r.start)
        for r in chunk_cut_positions(
            _frame(spark, _SHIFTED), w_words=8, offsets=(0, 4)
        ).collect()
    )
    # doc 2's offset-4 grid chunks [4,12) and [12,20) are w0..w7 and
    # w8..w15 — exactly doc 1's offset-0 chunks; its offset-0 chunk
    # [8,16)=w4..w11 and partial [16,20)=w12..w15 match doc 1's OWN
    # offset-4 grid chunks. Every repeated chunk of doc 2 is cut —
    # the full shifted body, not just the phase-matched half.
    assert cuts == [(2, 4), (2, 8), (2, 12), (2, 16)]


def test_aligned_repeat_still_cut_in_pool(spark):
    # a verbatim copy (offset difference 0) is cut by the pooled pass
    # at both of ITS grids' positions — coverage is a superset of the
    # aligned pass, never a replacement that loses it
    texts = {1: _W1, 2: _W1}
    cuts = sorted(
        (r.doc_id, r.start)
        for r in chunk_cut_positions(
            _frame(spark, texts), w_words=8, offsets=(0, 4)
        ).collect()
    )
    # doc 2 offset-0 chunks at 0 and 8 duplicate doc 1's; the offset-4
    # chunks at 4 and 12 duplicate doc 1's OWN offset-4 chunks
    assert cuts == [(2, 0), (2, 4), (2, 8), (2, 12)]


def test_registered_query_runs(spark, sf_dir):
    out = chunk_dedup_overlap(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    by_id = {r.doc_id: r for r in rows}
    # every shifted plant (+200000) must have cuts: its entire body is
    # a half-shifted repeat of the original
    planted = [r for i, r in by_id.items() if i >= 200000]
    assert planted and all(r.n_cut > 0 for r in planted)
    # originals that are nobody's first occurrence... originals come
    # first in (doc_id, start) order, so they are never cut unless the
    # corpus itself repeats; spot-check columns exist and are sane
    assert all(0 <= r.n_cut <= r.n_chunks for r in rows)


def test_rebuild_covered_words_drops_exact_span_union(spark):
    """Word-level rebuild: exactly the words inside the union of cut
    spans drop, in-order survivors rebuild the text."""
    import hashlib

    import pyspark.sql.functions as F
    from mevi_spark.plans.pipeline_ops import rebuild_covered_words

    texts = {1: _W1, 2: "p0 p1 p2 p3 " + _W1}
    docs = _frame(spark, texts)
    cuts = chunk_cut_positions(docs, w_words=8, offsets=(0, 4))
    out = {r.doc_id: r for r in rebuild_covered_words(
        docs, cuts, w_words=8
    ).collect()}
    # doc 1 is every chunk's first occurrence: untouched
    assert out[1].n_words == 16 and out[1].n_kept_words == 16
    assert out[1].rebuilt_md5 == hashlib.md5(_W1.encode()).hexdigest()
    # doc 2: the half-offset grid cuts at starts 4 and 12 → spans
    # [4,12) and [12,20) clip to words 4..19 = w0..w15; the 4-word
    # prefix survives
    assert out[2].n_words == 20 and out[2].n_kept_words == 4
    assert out[2].rebuilt_md5 == hashlib.md5(b"p0 p1 p2 p3").hexdigest()


def test_rebuild_covered_words_overlapping_spans_union(spark):
    """Overlapping spans from the two grids union (a word covered twice
    drops once); a doc with no cuts passes through bit-identical."""
    import hashlib

    from mevi_spark.plans.pipeline_ops import rebuild_covered_words

    docs = _frame(spark, {7: "a b c d e f g h i j"})
    cuts = spark.createDataFrame(
        [(7, 2), (7, 4)], "doc_id long, start int"
    )
    out = {r.doc_id: r for r in rebuild_covered_words(
        docs, cuts, w_words=4
    ).collect()}
    # spans [2,6) ∪ [4,8) cover words c..h → keep a b i j
    assert out[7].n_kept_words == 4
    assert out[7].rebuilt_md5 == hashlib.md5(b"a b i j").hexdigest()

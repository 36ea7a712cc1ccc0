"""Round-9 pipeline queries: chunk-level exact-substring dedup with
document reconstruction, and the deterministic global-shuffle
training-block materialization.

Each test recomputes the expected result in plain Python from the same
inputs — independent of both the Spark plan and the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

from mevi_spark.plans.pipeline_ops import (
    chunk_dedup_reconstruct,
    global_shuffle_blocks,
)
from mevi_spark.sources.io import load_table


def _python_chunk_dedup(texts: dict[int, str], w: int = 8):
    """Reference implementation: global (doc_id, idx)-ordered first
    occurrence of each w-word chunk survives."""
    chunks: dict[int, list[str]] = {}
    for doc_id, text in texts.items():
        words = text.split(" ")
        n = math.ceil(len(words) / w)
        chunks[doc_id] = [
            " ".join(words[i * w : (i + 1) * w]) for i in range(n)
        ]
    seen: set[str] = set()
    kept: dict[int, list[str]] = {}
    for doc_id in sorted(chunks):
        kept[doc_id] = []
        for c in chunks[doc_id]:
            if c not in seen:
                seen.add(c)
                kept[doc_id].append(c)
    return {
        doc_id: (
            len(chunks[doc_id]),
            len(kept[doc_id]),
            hashlib.md5(" ".join(kept[doc_id]).encode()).hexdigest(),
        )
        for doc_id in chunks
    }


def test_chunk_dedup_matches_python_recompute(spark, sf_dir):
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    expect = _python_chunk_dedup(texts)
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.rebuilt_md5)
        for r in chunk_dedup_reconstruct(spark, sf_dir).collect()
    }
    assert got == expect


def test_chunk_dedup_drops_planted_repeat(spark):
    """A chunk repeated verbatim across docs survives only at its first
    (doc_id, idx); a doc that is ALL repeats rebuilds to the empty
    string (visible, not dropped)."""
    base = " ".join(f"w{i}" for i in range(8))  # one exact 8-word chunk
    tail = " ".join(f"t{i}" for i in range(8))
    rows = [
        (1, base + " " + tail),  # owns both chunks
        (2, base),  # fully deduplicated
        (3, tail + " unique trailing words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import mevi_spark.plans.pipeline_ops as P
    from unittest import mock

    with mock.patch.object(P, "load_table", lambda s, d, n: df):
        out = {
            r.doc_id: (r.n_chunks, r.n_kept, r.rebuilt_md5)
            for r in chunk_dedup_reconstruct(spark, "ignored").collect()
        }
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert out[1] == (
        2,
        2,
        hashlib.md5((base + " " + tail).encode()).hexdigest(),
    )
    assert out[2] == (1, 0, empty_md5)
    # doc 3's first chunk repeats doc 1's second chunk -> cut
    kept3 = "unique trailing words here"
    assert out[3] == (2, 1, hashlib.md5(kept3.encode()).hexdigest())


def test_global_shuffle_blocks_is_a_permutation(spark, sf_dir):
    """Every doc appears once; positions tile fixed-size blocks exactly
    (all blocks full at 64 except the last); the order is deterministic
    across invocations."""
    rows = global_shuffle_blocks(spark, sf_dir).collect()
    n = (
        load_table(spark, sf_dir, "documents").count()
    )
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    pos = sorted(r.block_id * 64 + r.pos_in_block for r in rows)
    assert pos == list(range(n))  # gapless global permutation
    sizes: dict[int, int] = {}
    for r in rows:
        sizes[r.block_id] = sizes.get(r.block_id, 0) + 1
    last = max(sizes)
    assert all(v == 64 for b, v in sizes.items() if b != last)
    # deterministic replay: same mapping both times
    again = {
        r.doc_id: (r.block_id, r.pos_in_block)
        for r in global_shuffle_blocks(spark, sf_dir).collect()
    }
    assert again == {r.doc_id: (r.block_id, r.pos_in_block) for r in rows}


def _py_order(ids, n_buckets=32):
    import hashlib

    def h(i):
        return int(
            hashlib.md5(f"shuf|{i}".encode()).hexdigest()[:15], 16
        )

    return sorted(ids, key=lambda i: (h(i) % n_buckets, h(i), i))


def test_shuffle_blocks_append_history_immutable(spark):
    """Appending a batch never changes a prior row's assignment; the
    new batch fills the trailing partial block first, then continues."""
    import shutil
    import tempfile

    from mevi_spark.plans.pipeline_ops import (
        append_shuffle_blocks,
        read_shuffle_state,
    )

    b1 = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    b2 = spark.createDataFrame([(i,) for i in range(10, 16)], "doc_id long")
    base = tempfile.mkdtemp(prefix="mevi_shuf_t_")
    try:
        append_shuffle_blocks(spark, f"{base}/s", b1, 0, block=8)
        first = {
            r.doc_id: (r.block_id, r.pos_in_block)
            for r in read_shuffle_state(spark, f"{base}/s").collect()
        }
        append_shuffle_blocks(spark, f"{base}/s", b2, 1, block=8)
        both = {
            r.doc_id: (r.block_id, r.pos_in_block)
            for r in read_shuffle_state(spark, f"{base}/s").collect()
        }
        for i in range(10):
            assert both[i] == first[i]  # history immutable
        # batch 2 occupies positions 10..15: fills block 1 (pos 10-15)
        order2 = _py_order(range(10, 16))
        for rank, doc in enumerate(order2):
            pos = 10 + rank
            assert both[doc] == (pos // 8, pos % 8), doc
        # replay of batch 1 is a no-op (identical rows)
        append_shuffle_blocks(spark, f"{base}/s", b2, 1, block=8)
        again = {
            r.doc_id: (r.block_id, r.pos_in_block)
            for r in read_shuffle_state(spark, f"{base}/s").collect()
        }
        assert again == both
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_shuffle_blocks_streaming_wrapper(spark):
    """The foreachBatch wrapper drained over sliced input equals the
    direct append calls over the same slices."""
    import shutil
    import tempfile

    from mevi_spark.plans.pipeline_ops import (
        append_shuffle_blocks,
        read_shuffle_state,
    )
    from mevi_spark.streaming.incremental import incremental_shuffle_blocks

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    base = tempfile.mkdtemp(prefix="mevi_shuf_s_")
    try:
        for i, pred in enumerate(("doc_id < 20", "doc_id >= 20")):
            df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
                f"{base}/in/s{i:02d}"
            )
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in/s*")
        )
        q = incremental_shuffle_blocks(stream, f"{base}/out", f"{base}/ckpt")
        q.awaitTermination()
        for i, pred in enumerate(("doc_id < 20", "doc_id >= 20")):
            append_shuffle_blocks(
                spark, f"{base}/direct", df.filter(pred), i
            )
        got = sorted(
            (r.doc_id, r.block_id, r.pos_in_block)
            for r in read_shuffle_state(spark, f"{base}/out").collect()
        )
        want = sorted(
            (r.doc_id, r.block_id, r.pos_in_block)
            for r in read_shuffle_state(spark, f"{base}/direct").collect()
        )
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_token_budget_mixture_respects_allocations(spark):
    """Budget-fill invariants: per-domain token totals stay within the
    allocation, the selection is the greedy quality-order prefix (the
    next-best unselected doc would overflow), and token counts agree
    with the staged tokenization."""
    from mevi_spark.plans.pipeline_ops import (
        _MIX_ALLOCS,
        token_budget_mixture,
    )

    sf = "/root/testdata/sf0.001"
    rows = token_budget_mixture(spark, sf).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, sel in by_lang.items():
        alloc = _MIX_ALLOCS[lang]
        total = sum(r["n_tok"] for r in sel)
        assert total <= alloc, (lang, total, alloc)
        # cum_tok is the running sum in (score, doc_id) order
        sel.sort(key=lambda r: (r["score"], r["doc_id"]))
        run = 0
        for r in sel:
            run += r["n_tok"]
            assert r["cum_tok"] == run, (lang, r)
    # greedy-prefix: re-derive the full per-lang ordering and check the
    # selected set is exactly the maximal allocation-bounded prefix
    from pyspark.sql import functions as F

    from mevi_spark.functions.text import normalize_text, tokens
    from mevi_spark.functions import text_analysis as TA
    from mevi_spark.sources.io import load_table

    staged = load_table(spark, sf, "documents").select(
        "doc_id", "lang", tokens(normalize_text("text")).alias("_toks")
    )
    allrows = staged.select(
        "doc_id",
        "lang",
        F.round(TA.stopword_ratio("_toks", toks=F.col("_toks")), 6).alias(
            "score"
        ),
        F.size("_toks").cast("long").alias("n_tok"),
    ).collect()
    per_lang = {}
    for r in allrows:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, docs in per_lang.items():
        docs.sort(key=lambda r: (r["score"], r["doc_id"]))
        want, run = set(), 0
        for r in docs:
            if run + r["n_tok"] > _MIX_ALLOCS[lang]:
                break
            run += r["n_tok"]
            want.add(r["doc_id"])
        got = {r["doc_id"] for r in by_lang.get(lang, [])}
        assert got == want, lang

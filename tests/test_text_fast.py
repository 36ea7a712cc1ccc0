"""The fused tokenizer (``norm_tokens`` / ``norm_text``) must be
bit-identical to the composition it replaces
(``tokens(normalize_text(c))`` / ``normalize_text(c)``): every dedup,
quality, curriculum and lexical operator now routes through the fused
form, and the DuckDB oracles still encode the composed chain — any
divergence is a silent correctness break, not a perf bug."""

from __future__ import annotations

from pyspark.sql import functions as F

from mevi_spark.functions.text import (
    norm_text,
    norm_tokens,
    normalize_text,
    tokens,
)

# Adversarial inputs: empties, pure-delimiter strings, leading/trailing
# delimiters, every whitespace class, unicode letters (outside [a-z]
# both before and after lower()), digits, long runs, NULL.
EDGES = [
    "",
    "   ",
    "...",
    "a",
    " a ",
    "A.b,C",
    "tab\there",
    "nl\nline",
    "cr\rline",
    "\x0b\x0c mixed \t\n",
    "héllo wörld",
    "ÉCLAIR Über",
    "中文 text",
    "a1b2",
    "--a--",
    "\t\n ",
    "ALL CAPS!!",
    "x" * 5000,
    "a b",
    "e  f",
    "1,234.56",
    "end.",
    ".start",
    "a-b_c'd\"e",
    None,
]


def _mismatches(df, a, b):
    return df.filter(
        ~((a.isNull() & b.isNull()) | (a == b))
    ).count()


def test_norm_tokens_equals_composition_on_edges(spark):
    df = spark.createDataFrame([(x,) for x in EDGES], "text string")
    out = df.select(
        tokens(normalize_text("text")).alias("a"),
        norm_tokens("text").alias("b"),
    )
    assert _mismatches(out, F.col("a"), F.col("b")) == 0


def test_norm_text_equals_normalize_text_on_edges(spark):
    df = spark.createDataFrame([(x,) for x in EDGES], "text string")
    out = df.select(
        normalize_text("text").alias("a"),
        norm_text("text").alias("b"),
    )
    assert _mismatches(out, F.col("a"), F.col("b")) == 0


def test_fused_forms_on_fixture_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = docs.select(
        tokens(normalize_text("text")).alias("ta"),
        norm_tokens("text").alias("tb"),
        normalize_text("text").alias("na"),
        norm_text("text").alias("nb"),
    )
    bad = out.filter(
        (F.col("ta") != F.col("tb")) | (F.col("na") != F.col("nb"))
    ).count()
    assert bad == 0

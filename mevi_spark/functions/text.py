"""Text scalar functions — tokenization, normalization, shingling.

These back both the reference-parity surface (P1/P3/F1/F3 text prep —
``MEVI/main_utils.py:199-212``, ``MEVI/main_models.py:437-443``) and the
large-scale pipeline operators (dedup, language-ID, quality scoring).

Everything is a pure column expression; tokenization at 100 TB must not
round-trip through Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def clean_text(c: Column | str) -> Column:
    """P3: strip newlines / backquotes / quotes
    (``MEVI/main_models.py:437-443``)."""
    return F.trim(F.regexp_replace(_c(c), r"[\n`'\"]+", " "))


def title_content(title: Column | str, content: Column | str, style: str = "ance") -> Column:
    """P1: document text projection.

    ``ance`` → ``'Title: ' + title + ' Text: ' + content``
    (``MEVI/main_utils.py:199-212``); ``sep`` → ``title + ' [SEP] ' + content``
    (``prepare_passage_tokenized.py:63-70``).
    """
    t, c = _c(title), _c(content)
    if style == "ance":
        return F.concat(F.lit("Title: "), t, F.lit(" Text: "), c)
    return F.concat(t, F.lit(" [SEP] "), c)


def normalize_text(c: Column | str) -> Column:
    """Lowercase, strip punctuation, collapse whitespace — the canonical
    form used by fingerprinting and near-dup shingling."""
    x = F.lower(_c(c))
    x = F.regexp_replace(x, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization → ``array<string>`` (empty string → [])."""
    t = F.trim(_c(c))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """n-gram *word* shingles of the normalized text → ``array<string>``
    (distinct). The unit of MinHash / Jaccard dedup."""
    toks = tokens(normalize_text(c))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, so short docs must
    # short-circuit to an empty set before the sequence is evaluated
    return F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        )
    )


def char_ngrams(c: Column | str, n: int = 3) -> Column:
    """Character n-grams of the normalized text → ``array<string>``
    (distinct). Used by the language-ID heuristic."""
    x = normalize_text(c)
    ln = F.length(x)
    idx = F.sequence(F.lit(1), ln - (n - 1))
    return F.when(ln < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, lambda i: F.substring(x, i, n)))
    )
